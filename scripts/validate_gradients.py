"""fp64 finite-difference pinning of step gradients (BASELINE.md: step
gradients within 1e-4; VERDICT round-1 item 6).

The CUDA reference cannot run here, so the oracle is central finite
differences in float64 with tight solver tolerances -- the same protocol the
reference uses to pin its own hand-written backward kernels
(tests/simulation/test_torch_resample.py:141-180).  Smooth paths (fixed
substeps) are held to 1e-4 relative agreement; the adaptive path's ceil()
substep-count discontinuity is quantified separately rather than averaged in.

Run (CPU; fp64 on TPU is emulated and slow):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/validate_gradients.py
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from fluidgym_tpu.config import config

config.use_fp64()

from fluidgym_tpu.core import geometry as geo
from fluidgym_tpu.core.domain import DomainBuilder
from fluidgym_tpu.solver.piso import SimConfig, piso_fixed_steps

ROWS = []


def check(name, loss_fn, x0, eps, tol, n_probe=3, seed=0,
          smooth_filter=False):
    """Directional-derivative agreement: AD vs central FD over random unit
    directions; records max relative error.

    ``smooth_filter``: for piecewise-smooth maps (the adaptive path's
    ``ceil()`` substep count), a probe straddling a breakpoint measures the
    jump, not the derivative.  Straddling is detected by Richardson
    consistency — on a smooth stretch the central differences at eps and
    2*eps agree to O(eps^2), across a breakpoint they do not — and such
    directions are excluded (counted), so the SURVIVING directions can be
    held to the same 1e-4 the fixed-substep paths meet (VERDICT r4 weak #7
    asked for exactly this: a tight guarantee on the adaptive path instead
    of a blanket 1e-1)."""
    loss = jax.jit(loss_fn)
    g = jax.jit(jax.grad(loss_fn))(x0)
    assert np.isfinite(np.asarray(g)).all(), f"{name}: non-finite gradient"
    rng = np.random.default_rng(seed)
    worst = 0.0
    used = skipped = 0
    for _ in range(n_probe):
        d = rng.normal(size=np.shape(x0))
        d = jnp.asarray(d / (np.linalg.norm(d) + 1e-300), jnp.float64)
        fd = (float(loss(x0 + eps * d)) - float(loss(x0 - eps * d))) / (2 * eps)
        if smooth_filter:
            fd2 = (float(loss(x0 + 2 * eps * d))
                   - float(loss(x0 - 2 * eps * d))) / (4 * eps)
            if abs(fd - fd2) > 1e-3 * max(abs(fd), abs(fd2), 1e-12):
                skipped += 1
                continue
        ad = float(jnp.vdot(g, d))
        rel = abs(fd - ad) / max(abs(fd), abs(ad), 1e-12)
        worst = max(worst, rel)
        used += 1
    if smooth_filter and used == 0:
        ROWS.append((name, float("nan"), tol, "FAIL"))
        print(f"{name:55s} all {n_probe} probes straddled a substep "
              f"breakpoint  FAIL", flush=True)
        return float("nan")
    note = (f" [{used} smooth / {skipped} straddling probes]"
            if smooth_filter else "")
    ROWS.append((name, worst, tol, "PASS" if worst <= tol else "FAIL"))
    print(f"{name:55s} rel_err={worst:.3e}  tol={tol:.0e}  "
          f"{'PASS' if worst <= tol else 'FAIL'}{note}", flush=True)
    return worst


def taylor_green_state(n=12, nu=0.05):
    dom = DomainBuilder(ndims=2, viscosity=nu, name="tg")
    xs = np.linspace(0.0, 1.0, n + 1)
    coords = np.stack(np.meshgrid(xs, xs, indexing="xy"), 0)
    blk = dom.create_block(coords)
    x = (np.arange(n) + 0.5) / n
    X, Y = np.meshgrid(x, x, indexing="xy")
    u = np.cos(2 * np.pi * X) * np.sin(2 * np.pi * Y)
    v = -np.sin(2 * np.pi * X) * np.cos(2 * np.pi * Y)
    blk.set_velocity(0.5 * np.stack([u, v]))
    return dom.build()


def case_taylor_green():
    topo, geoms, state = taylor_green_state()
    cfg = SimConfig(pressure_tol=1e-12, advection_tol=1e-12,
                    pressure_maxiter=20000, advection_maxiter=20000)
    dt = jnp.asarray(0.02, jnp.float64)

    def loss(v0):
        from dataclasses import replace

        s = state.replace_block(0, replace(state.blocks[0], velocity=v0))
        s = piso_fixed_steps(s, geoms, topo, cfg, dt, 4)
        return jnp.sum(s.blocks[0].velocity ** 2)

    check("taylor-green 4 substeps: d(KE)/d(u0)", loss,
          state.blocks[0].velocity, eps=1e-5, tol=1e-4)


def case_rbc_reward():
    import fluidgym_tpu

    env = fluidgym_tpu.make(
        "RBC2D-easy-v0", n_heaters=4, resolution=6, episode_length=4,
        step_length=0.1, dt=0.05, differentiable=True,
        load_initial_domain=False, load_domain_statistics=False,
        randomize_initial_state=False, dtype=jnp.float64)
    import dataclasses

    orig = env._get_simulation
    env._get_simulation = lambda: dataclasses.replace(
        orig(), pressure_tol=1e-12, advection_tol=1e-12,
        pressure_maxiter=20000, advection_maxiter=20000)
    env.reset(seed=0)
    for _ in range(3):
        env.step(env.sample_action())
    carry = env._pure_carry()

    def loss(action):
        _, _, reward, _ = env._pure_step(carry, action)
        return jnp.sum(reward)

    a0 = jnp.zeros((4,), jnp.float64)
    check("RBC2D heater action -> reward (1 env step)", loss, a0,
          eps=1e-5, tol=1e-4)


def case_cylinder_reward(substeps, warm=False):
    import fluidgym_tpu

    env = fluidgym_tpu.make(
        "CylinderJet2D-easy-v0", resolution=8, episode_length=4,
        step_length=0.05, dt=0.05, differentiable=True,
        load_initial_domain=False, load_domain_statistics=False,
        randomize_initial_state=False, dtype=jnp.float64)
    import dataclasses

    orig = env._get_simulation

    def sim():
        cfg = dataclasses.replace(
            orig(), pressure_tol=1e-12, advection_tol=1e-12,
            pressure_maxiter=20000, advection_maxiter=20000)
        if substeps is not None:
            cfg = dataclasses.replace(cfg, substeps=substeps)
        if warm:
            # the RL-path guess machinery under custom_linear_solve: the
            # implicit-function property makes the solution guess-independent
            # and _solve stop_gradients the guess; this check pins that
            cfg = dataclasses.replace(cfg, pressure_warm_start=True,
                                      pressure_deflation=True)
        return cfg

    env._get_simulation = sim
    env.reset(seed=0)
    for _ in range(2):
        env.step(env.sample_action())
    carry = env._pure_carry()

    def loss(action):
        _, _, reward, _ = env._pure_step(carry, action)
        return jnp.sum(reward)

    a0 = jnp.zeros((1,), jnp.float64)
    name = (f"cylinder jet action -> reward ({substeps} fixed substeps)"
            if substeps is not None
            else "cylinder jet action -> reward (ADAPTIVE substeps)")
    if warm:
        name += " +warm/defl"
    if substeps is not None:
        check(name, loss, a0, eps=1e-5, tol=1e-4)
    else:
        # piecewise-smooth: hold smooth directions to the tight tol, count
        # (and exclude) probes that straddle a ceil() substep breakpoint
        check(name, loss, a0, eps=1e-5, tol=1e-4, n_probe=6,
              smooth_filter=True)


if __name__ == "__main__":
    case_taylor_green()
    case_rbc_reward()
    case_cylinder_reward(substeps=4)
    case_cylinder_reward(substeps=4, warm=True)
    # the adaptive masked-scan path: substep count from ceil() is piecewise
    # constant, so the step map is smooth almost everywhere but FD probes can
    # straddle a breakpoint; quantified separately (loose tol), per VERDICT
    case_cylinder_reward(substeps=None)
    print()
    fails = [r for r in ROWS if r[3] == "FAIL"]
    print(f"{len(ROWS) - len(fails)}/{len(ROWS)} gradient checks passed")
    sys.exit(1 if fails else 0)
