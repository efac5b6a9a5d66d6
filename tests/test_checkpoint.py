"""Orbax checkpointing of env state (SURVEY §5 checkpoint/resume: "pytree
state is trivially checkpointable (orbax)" — prove it: the DomainState
pytree round-trips through orbax and restores bit-exact env behavior)."""

import dataclasses

import jax
import numpy as np
import pytest

import fluidgym_tpu

KW = dict(load_initial_domain=False, load_domain_statistics=False,
          randomize_initial_state=False, n_heaters=4, resolution=4,
          episode_length=10, step_length=0.1, dt=0.05, local_obs_window=3)


def test_orbax_domain_state_roundtrip(tmp_path):
    ocp = pytest.importorskip("orbax.checkpoint")

    env = fluidgym_tpu.make("RBC2D-easy-v0", **KW)
    env.reset(seed=7)
    a = env.sample_action()
    env.step(a)
    s = env.get_state()

    ckpt = ocp.PyTreeCheckpointer()
    ckpt.save(tmp_path / "domain", jax.device_get(s.domain))
    restored = ckpt.restore(tmp_path / "domain", item=jax.device_get(s.domain))
    chex_equal = jax.tree.map(
        lambda x, y: np.array_equal(np.asarray(x), np.asarray(y)),
        s.domain, restored)
    assert all(jax.tree.leaves(chex_equal))

    # restoring through set_state reproduces the exact next step
    a2 = env.sample_action()
    env.set_state(s)
    _, r1, _, _, i1 = env.step(a2)
    env.set_state(dataclasses.replace(s, domain=restored))
    _, r2, _, _, i2 = env.step(a2)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    np.testing.assert_array_equal(np.asarray(i1["nusselt"]),
                                  np.asarray(i2["nusselt"]))
