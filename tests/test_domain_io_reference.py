"""Loading domains stored in the REFERENCE on-disk layout (PICT
save_domain, /root/reference/src/fluidgym/simulation/pict/util/domain_io.py:
64-182), so published FluidGym HuggingFace datasets are usable directly.

The fixtures are synthesized here to the documented layout: flat npz keyed
"0".."n" with shared-tensor dedup, JSON holding slot indices, NCDHW tensors
with a leading batch dim, boundaries per face in -x,+x,-y,+y order."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from fluidgym_tpu.core import domain_io
from fluidgym_tpu.core.domain import BCType, BoundKind, DomainBuilder
from fluidgym_tpu.solver.piso import SimConfig, piso_substep


def _write_reference_file(path, meta, arrays):
    np.savez_compressed(path.with_suffix(".npz"),
                        **{str(i): a for i, a in enumerate(arrays)})
    meta = dict(meta)
    meta["data_info"] = {
        str(i): {"shape": list(a.shape), "dtype": "float32", "device": "cuda"}
        for i, a in enumerate(arrays)
    }
    with open(path.with_suffix(".json"), "w") as fh:
        json.dump(meta, fh)


def _rbc_like_reference_domain(tmp_path):
    """Single block, periodic x, FIXED hot/cold plates with a varying bottom
    scalar -- the RBC layout in reference format."""
    ny, nx = 6, 8
    rng = np.random.default_rng(0)
    vel = rng.normal(size=(1, 2, ny, nx)).astype(np.float32) * 0.01
    pres = np.zeros((1, 1, ny, nx), np.float32)
    scal = rng.uniform(size=(1, 1, ny, nx)).astype(np.float32)
    xs = np.linspace(0.0, 2.0, nx + 1)
    ys = np.linspace(-0.5, 0.5, ny + 1)
    coords = np.stack(np.meshgrid(xs, ys, indexing="xy"), 0)[None].astype(np.float32)
    visc = np.asarray([0.05], np.float32)
    kappa = np.asarray([0.02], np.float32)
    zero_v = np.zeros((1, 2, 1, 1), np.float32)
    hot = (1.0 + 0.1 * np.sin(np.linspace(0, np.pi, nx))).astype(np.float32)
    hot = hot.reshape(1, 1, 1, nx)
    cold = np.zeros((1, 1, 1, 1), np.float32)

    arrays = [visc, kappa, vel, pres, scal, coords, zero_v, hot, cold]
    meta = {
        "name": "rbc_ref",
        "spatialDims": 2,
        "viscosity": "0",
        "passiveScalarChannels": 1,
        "passiveScalarViscosity": "1",
        "blocks": [{
            "name": "b0",
            "velocity": "2",
            "pressure": "3",
            "scalar": "4",
            "vertexCoordinates": "5",
            "boundaries": [
                {"type": "PERIODIC"},
                {"type": "PERIODIC"},
                {"type": "FIXED", "velocityType": "DIRICHLET",
                 "passiveScalarType": ["DIRICHLET"],
                 "velocity": "6", "scalar": "7"},
                {"type": "FIXED", "velocityType": "DIRICHLET",
                 "passiveScalarType": ["DIRICHLET"],
                 "velocity": "6", "scalar": "8"},
            ],
        }],
    }
    path = tmp_path / "rbc_ref_domain"
    _write_reference_file(path, meta, arrays)
    return path, vel, scal, hot


def test_reference_format_single_block(tmp_path):
    path, vel, scal, hot = _rbc_like_reference_domain(tmp_path)
    topo, geoms, state = domain_io.load_domain(path, dtype=jnp.float32)

    assert topo.ndims == 2 and topo.scalar_channels == 1
    blk_t = topo.blocks[0]
    assert blk_t.shape == (6, 8)
    assert blk_t.faces[0].kind == BoundKind.PERIODIC
    assert blk_t.faces[2].kind == BoundKind.FIXED
    assert blk_t.faces[2].scalar_types == (BCType.DIRICHLET,)
    np.testing.assert_allclose(np.asarray(state.blocks[0].velocity), vel[0],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(state.blocks[0].scalar), scal[0],
                               atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(state.blocks[0].faces[2].scalar), hot[0], atol=1e-6)
    assert float(state.viscosity) == pytest.approx(0.05)
    np.testing.assert_allclose(np.asarray(state.scalar_diffusivity), [0.02])

    # the loaded domain must be SIMULATABLE, not just parseable
    cfg = SimConfig(dt=0.01, pressure_tol=1e-5)
    state2 = piso_substep(state, geoms, topo, cfg,
                          jnp.asarray(0.01, jnp.float32))
    assert np.isfinite(np.asarray(state2.blocks[0].velocity)).all()


def test_reference_format_connected_blocks(tmp_path):
    """Two connected blocks: the reference's raw ConnectedBoundary axis table
    must transfer verbatim into FaceSpec.axes (same encoding)."""
    # build the expected topology natively to obtain the correct axis tables
    dom = DomainBuilder(ndims=2, viscosity=0.1, name="pair")
    ys = np.linspace(0.0, 1.0, 5)
    xa = np.linspace(0.0, 1.0, 5)
    xb = np.linspace(1.0, 2.0, 5)
    ca = np.stack(np.meshgrid(xa, ys, indexing="xy"), 0)
    cb = np.stack(np.meshgrid(xb, ys, indexing="xy"), 0)
    b0 = dom.create_block(ca, name="left")
    b1 = dom.create_block(cb, name="right")
    dom.connect_blocks(0, "+x", 1, "-x")
    b0.close_boundary("-x")
    b0.close_boundary("-y"); b0.close_boundary("+y")
    b1.close_boundary("+x")
    b1.close_boundary("-y"); b1.close_boundary("+y")
    topo_native, _, _ = dom.build()

    rng = np.random.default_rng(1)
    zero_v = np.zeros((1, 2, 1, 1), np.float32)
    arrays = [np.asarray([0.1], np.float32),
              rng.normal(size=(1, 2, 4, 4)).astype(np.float32),
              np.zeros((1, 1, 4, 4), np.float32),
              ca[None].astype(np.float32), cb[None].astype(np.float32),
              zero_v]

    def bounds(conn_face, conn_axes, fixed_faces):
        out = []
        for f in range(4):
            if f == conn_face:
                out.append({"type": "CONNECTED", "connectedBlock":
                            fixed_faces, "axes": list(conn_axes)})
            else:
                out.append({"type": "FIXED", "velocityType": "DIRICHLET",
                            "velocity": "5"})
        return out

    meta = {
        "name": "pair", "spatialDims": 2, "viscosity": "0",
        "passiveScalarChannels": 0,
        "blocks": [
            {"name": "left", "velocity": "1", "pressure": "2",
             "vertexCoordinates": "3",
             "boundaries": bounds(1, topo_native.blocks[0].faces[1].axes, 1)},
            {"name": "right", "velocity": "1", "pressure": "2",
             "vertexCoordinates": "4",
             "boundaries": bounds(0, topo_native.blocks[1].faces[0].axes, 0)},
        ],
    }
    path = tmp_path / "pair_ref_domain"
    _write_reference_file(path, meta, arrays)

    topo, geoms, state = domain_io.load_domain(path, dtype=jnp.float32)
    assert topo.blocks[0].faces[1] == topo_native.blocks[0].faces[1]
    assert topo.blocks[1].faces[0] == topo_native.blocks[1].faces[0]
    # shared-tensor dedup: both blocks point at npz slot "1"
    np.testing.assert_allclose(np.asarray(state.blocks[0].velocity),
                               np.asarray(state.blocks[1].velocity))

    cfg = SimConfig(dt=0.01, pressure_tol=1e-5, advect_passive_scalar=False)
    state2 = piso_substep(state, geoms, topo, cfg,
                          jnp.asarray(0.01, jnp.float32))
    for b in range(2):
        assert np.isfinite(np.asarray(state2.blocks[b].velocity)).all()


def test_reference_format_transform_only_rejected(tmp_path):
    arrays = [np.asarray([0.1], np.float32),
              np.zeros((1, 2, 4, 4), np.float32),
              np.zeros((1, 1, 4, 4), np.float32),
              np.zeros((1, 4, 4, 3, 2), np.float32)]
    meta = {
        "name": "t", "spatialDims": 2, "viscosity": "0",
        "passiveScalarChannels": 0,
        "blocks": [{"name": "b", "velocity": "1", "pressure": "2",
                    "transform": "3", "boundaries": [
                        {"type": "PERIODIC"}] * 4}],
    }
    path = tmp_path / "transform_only"
    _write_reference_file(path, meta, arrays)
    with pytest.raises(NotImplementedError, match="vertexCoordinates"):
        domain_io.load_domain(path)
