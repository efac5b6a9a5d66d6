"""Pallas stencil kernel tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluidgym_tpu.ops import stencil_pallas as sp


@pytest.fixture(autouse=True)
def _interpret():
    sp.set_pallas_interpret(True)
    yield
    sp.set_pallas_interpret(False)


def _ref(d, o, x, h):
    nbr_xm = jnp.concatenate([h[0], x[:, :-1]], axis=1)
    nbr_xp = jnp.concatenate([x[:, 1:], h[1]], axis=1)
    nbr_ym = jnp.concatenate([h[2], x[:-1, :]], axis=0)
    nbr_yp = jnp.concatenate([x[1:, :], h[3]], axis=0)
    return d * x + o[0] * nbr_xm + o[1] * nbr_xp + o[2] * nbr_ym + o[3] * nbr_yp


def _data(ny=9, nx=13, seed=0):
    rng = np.random.default_rng(seed)
    d = jnp.asarray(rng.normal(size=(ny, nx)), jnp.float32)
    o = jnp.asarray(rng.normal(size=(4, ny, nx)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(ny, nx)), jnp.float32)
    h = tuple(jnp.asarray(rng.normal(size=s), jnp.float32)
              for s in ((ny, 1), (ny, 1), (1, nx), (1, nx)))
    return d, o, x, h


def test_pallas_stencil_matches_xla():
    d, o, x, h = _data()
    y = sp.stencil_apply_pallas(d, o, x, h)
    np.testing.assert_allclose(np.asarray(y), np.asarray(_ref(d, o, x, h)),
                               atol=1e-5)


def test_pallas_stencil_vjp_matches_xla():
    d, o, x, h = _data(seed=1)

    def loss(fn):
        return lambda dd, oo, xx, hh: jnp.sum(fn(dd, oo, xx, hh) ** 2)

    g1 = jax.grad(loss(sp.stencil_apply_pallas), argnums=(0, 1, 2, 3))(d, o, x, h)
    g2 = jax.grad(loss(_ref), argnums=(0, 1, 2, 3))(d, o, x, h)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_pallas_domain_apply_matches_reference():
    """Enabled-path equivalence on a real multi-block domain (cylinder)."""
    import fluidgym_tpu
    from fluidgym_tpu.solver import stencil as st

    env = fluidgym_tpu.make(
        "CylinderJet2D-easy-v0", resolution=16, load_initial_domain=False,
        load_domain_statistics=False, randomize_initial_state=False,
        episode_length=2, step_length=0.02, dt=0.01)
    env.reset(seed=0)
    adiags = tuple(jnp.ones_like(g.det) for g in env._geoms)
    p_ops = st.build_pressure_ops(adiags, env._geoms, env._topo)
    rng = np.random.default_rng(0)
    xs = tuple(jnp.asarray(rng.normal(size=b.pressure.shape), jnp.float32)
               for b in env._state.blocks)
    ref = st.domain_apply(p_ops, xs, env._topo)
    sp.set_pallas_stencil(True)
    try:
        out = st.domain_apply(p_ops, xs, env._topo)
    finally:
        sp.set_pallas_stencil(False)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                                   rtol=1e-5)
