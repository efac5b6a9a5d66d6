"""Field image/raw dumps (reference pict/util/output.py:412-1111)."""

import numpy as np
import pytest

from fluidgym_tpu.utils import field_io


def test_save_field_png_and_npz(tmp_path):
    rng = np.random.default_rng(0)
    f2d = rng.normal(size=(6, 8))
    p = field_io.save_field_png(f2d, tmp_path / "f")
    assert p.exists() and p.suffix == ".png"
    import matplotlib.image as mpimg

    img = mpimg.imread(p)
    assert img.shape[:2] == (6, 8)

    p2 = field_io.save_fields_npz({"a": f2d}, tmp_path / "raw")
    back = np.load(p2)
    np.testing.assert_allclose(back["a"], f2d.astype(np.float32))


def test_save_field_images_2d_channels(tmp_path):
    rng = np.random.default_rng(1)
    fields = {"velocity": rng.normal(size=(2, 6, 8)),
              "pressure": rng.normal(size=(6, 8))}
    paths = field_io.save_field_images(fields, tmp_path, prefix="t")
    names = sorted(p.name for p in paths)
    assert "t_velocity0.png" in names
    assert "t_velocity1.png" in names
    assert "t_pressure.png" in names
    assert "t_raw.npz" in names
    raw = np.load(tmp_path / "t_raw.npz")
    assert set(raw.files) == {"velocity0", "velocity1", "pressure"}


def test_save_field_images_3d_midslices(tmp_path):
    f = np.random.default_rng(2).normal(size=(4, 6, 8))
    paths = field_io.save_field_images({"q": f}, tmp_path, prefix="v")
    names = {p.name for p in paths}
    assert {"v_q_xy.png", "v_q_xz.png", "v_q_yz.png", "v_raw.npz"} <= names


def test_env_save_field_images(tmp_path):
    import fluidgym_tpu

    env = fluidgym_tpu.make(
        "RBC2D-easy-v0", n_heaters=4, resolution=4, episode_length=3,
        step_length=0.1, dt=0.05, load_initial_domain=False,
        load_domain_statistics=False, randomize_initial_state=False)
    env.reset(seed=0)
    paths = env.save_field_images(tmp_path)
    names = {p.name for p in paths}
    assert any("velocity0" in n for n in names)
    assert any("temperature" in n for n in names)
    assert any(n.endswith("_raw.npz") for n in names)
    raw = np.load([p for p in paths if p.suffix == ".npz"][0])
    # temperature on the render grid, finite, within plate bounds
    T = raw["temperature"]
    assert np.isfinite(T).all() and T.min() >= -0.01 and T.max() <= 1.76
