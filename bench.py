"""Benchmark: batched 2D cylinder env steps/sec on TPU at the 256^2-class grid.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

North star (BASELINE.md): ">=50x CPU-reference env steps/sec on 2D cylinder
at 256^2, batch 64" plus a grad-through-rollout timing.  Measured here as:

* headline -- full-fidelity CylinderJet2D physics (5-block curvilinear O-grid
  + wake, adaptive PISO with 2 pressure corrections, non-orthogonal deferred
  corrections, convective outflow) at angular resolution 56 (~70.7k cells;
  256^2 = 65.5k), batch 64 via vmap on one TPU chip, measured at DEVELOPED
  flow loaded from ``bench_assets/cyl2d_res56_developed`` (t~=25, past
  shedding onset);
* ``vs_baseline`` -- the CUDA/torch reference cannot run here, so the
  denominator is this framework's own single-env CPU throughput at
  REFERENCE-PARITY solver settings (cold-started pressure solves), measured
  at the SAME developed state from the same asset file, times 50.
  vs_baseline >= 1.0 means the 50x target is met.  Numerator and denominator
  share state and physics settings; only device and batching differ.
* ``extra`` -- the round-1 flagship row (res 24, ~14k cells) for continuity,
  the north star's gradient metric (seconds per differentiable env step:
  value+grad of mean reward w.r.t. actions, batch 8, and its ratio to the
  forward-only step), and one batched-throughput row per remaining family
  (RBC2D / TCFSmall3D / Airfoil2D at their bundled developed datasets) so
  every family is regression-tracked, not just cylinder.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
BATCH = 64
N_MEASURE = 10
N_WARM = 5
GRAD_BATCH = 8
ENV_KW = dict(
    load_initial_domain=False,
    load_domain_statistics=False,
    randomize_initial_state=False,
    episode_length=10**9,
)


def _make_env(resolution, reference_parity=False, differentiable=False):
    import fluidgym_tpu

    env = fluidgym_tpu.make("CylinderJet2D-easy-v0", resolution=resolution,
                            differentiable=differentiable, **ENV_KW)
    if reference_parity:
        # cold-started pressure solves (the reference's default behavior);
        # disables this framework's warm-start/deflation optimizations so
        # improving them never inflates the baseline denominator
        import dataclasses

        orig = env._get_simulation
        env._get_simulation = lambda: dataclasses.replace(
            orig(), pressure_warm_start=False, pressure_deflation=False)
    env.reset(seed=0)
    _load_developed(env, resolution)
    return env


def _load_developed(env, resolution) -> None:
    """Replace the env state with the precomputed developed-flow snapshot
    (scripts/make_bench_assets.py).  Topology must match exactly."""
    from fluidgym_tpu.core.domain_io import load_domain

    path = REPO / "bench_assets" / f"cyl2d_res{resolution}_developed"
    topo, _geoms, state = load_domain(path, dtype=env._dtype)
    assert topo == env._topo, "bench asset topology mismatch; regenerate assets"
    env._state = state


def _batched(env, batch):
    import jax
    import jax.numpy as jnp

    carry = env._pure_carry()
    bcarry = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (batch,) + a.shape), carry)
    bact = jnp.zeros((batch, 1), jnp.float32)
    fn = jax.jit(jax.vmap(env._pure_step))
    return fn, bcarry, bact


def _time_steps(fn, carry, action, warm, iters):
    import jax

    for _ in range(warm + 1):  # +1 compile
        carry, *_ = fn(carry, action)
    jax.block_until_ready(jax.tree.leaves(carry)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        carry, *_ = fn(carry, action)
    jax.block_until_ready(jax.tree.leaves(carry)[0])
    return (time.perf_counter() - t0) / iters


#: TPU v5e ("v5 lite") peak HBM bandwidth -- the efficiency denominator for
#: this memory-bound stencil/CG workload (MXU FLOPs are not the bottleneck)
_HBM_PEAK_BYTES_PER_S = 819e9


def _tpu_batched_sps(resolution, batch=BATCH, want_cost=False):
    env = _make_env(resolution)
    fn, bcarry, bact = _batched(env, batch)
    dt = _time_steps(fn, bcarry, bact, N_WARM, N_MEASURE)
    if not want_cost:
        return batch / dt
    # HBM efficiency from XLA's own cost model: bytes the compiled program
    # accesses per batched step vs what peak bandwidth could move in the
    # measured wall time.  Survives hardware changes (VERDICT r3 #8).
    cost = None
    try:
        ca = fn.lower(bcarry, bact).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        by = float(ca["bytes accessed"])
        cost = {
            "hbm_bytes_accessed_per_batched_step": by,
            "hbm_bandwidth_utilization": by / dt / _HBM_PEAK_BYTES_PER_S,
            "flops_per_batched_step": float(ca.get("flops", float("nan"))),
        }
    except Exception as e:  # cost model optional on experimental plugins
        sys.stderr.write(f"cost analysis unavailable: {e!r}\n")
    return batch / dt, cost


def _grad_metrics(resolution=24, batch=GRAD_BATCH):
    """Seconds per grad-through-env-step (d mean(reward) / d actions) and the
    backward:forward ratio -- the BASELINE.md grad-through-rollout metric."""
    import jax
    import jax.numpy as jnp

    env = _make_env(resolution, differentiable=True)
    carry = env._pure_carry()
    bcarry = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (batch,) + a.shape), carry)
    bact = jnp.zeros((batch, 1), jnp.float32)

    def mean_reward(actions, c):
        _, _, rewards, _ = jax.vmap(env._pure_step)(c, actions)
        return jnp.mean(rewards)

    fwd = jax.jit(mean_reward)
    vag = jax.jit(jax.value_and_grad(mean_reward))

    for _ in range(2):
        r = fwd(bact, bcarry)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(3):
        r = fwd(bact, bcarry)
    jax.block_until_ready(r)
    t_fwd = (time.perf_counter() - t0) / 3

    for _ in range(2):
        val, g = vag(bact, bcarry)
    jax.block_until_ready(g)
    t0 = time.perf_counter()
    for _ in range(3):
        val, g = vag(bact, bcarry)
    jax.block_until_ready(g)
    t_grad = (time.perf_counter() - t0) / 3
    assert bool(jnp.isfinite(g).all()), "non-finite action gradient"
    return t_grad, t_grad / t_fwd


def _family_sps(env_id, batch, n_warm=2, n_measure=5, **kw) -> float:
    """Batched env-steps/s for one registered id at its bundled developed
    dataset (default kwargs: load_initial_domain=True), covering the three
    non-cylinder families so every family's throughput is regression-tracked
    (VERDICT r2 weak #4)."""
    import jax
    import jax.numpy as jnp

    import fluidgym_tpu

    env = fluidgym_tpu.make(env_id, episode_length=10**9,
                            randomize_initial_state=False, **kw)
    env.reset(seed=0)
    carry = env._pure_carry()
    bcarry = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (batch,) + a.shape), carry)
    act_shape = tuple(env.action_space.shape)
    if env.use_marl:
        act_shape = (env.n_agents,) + act_shape
        step = env._pure_step_marl
    else:
        step = env._pure_step
    bact = jnp.zeros((batch,) + act_shape, jnp.float32)
    fn = jax.jit(jax.vmap(step))
    dt = _time_steps(fn, bcarry, bact, n_warm, n_measure)
    return batch / dt


def _cpu_single_env_sps(resolution) -> float:
    """Single-env CPU throughput at the SAME developed state, reference-parity
    settings, in a subprocess on the host CPU backend."""
    code = rf"""
import json, time
import jax
jax.config.update("jax_platforms", "cpu")
import bench
env = bench._make_env({resolution}, reference_parity=True)
fn, c, a = bench._batched(env, 1)
dt = bench._time_steps(fn, c, a, warm=1, iters=2)
print(json.dumps({{"dt": dt}}))
"""
    full_env = dict(os.environ)
    full_env.update({
        "PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": str(REPO) + os.pathsep + full_env.get("PYTHONPATH", ""),
    })
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, env=full_env, timeout=5400, cwd=str(REPO))
    for line in out.stdout.splitlines()[::-1]:
        try:
            return 1.0 / json.loads(line)["dt"]
        except Exception:
            continue
    sys.stderr.write(out.stderr[-2000:])
    return float("nan")


def main() -> None:
    # persistent compilation cache: configured machine-keyed by the package
    # import (fluidgym_tpu/__init__.py)
    sps_256, hbm_cost = _tpu_batched_sps(56, want_cost=True)
    sps_24 = _tpu_batched_sps(24)
    try:
        grad_s, grad_ratio = _grad_metrics()
    except Exception:
        grad_s, grad_ratio = float("nan"), float("nan")
    try:
        cpu_sps = _cpu_single_env_sps(56)
        vs_baseline = sps_256 / (50.0 * cpu_sps)
    except Exception:
        cpu_sps, vs_baseline = float("nan"), float("nan")

    family_rows = {}
    for key, env_id, batch, kw in (
        ("rbc2d_easy_batch64_env_steps_per_sec", "RBC2D-easy-v0", 64, {}),
        ("tcf_small3d_easy_batch4_env_steps_per_sec",
         "TCFSmall3D-bottom-easy-v0", 4, {"use_marl": False}),
        ("airfoil2d_easy_batch8_env_steps_per_sec", "Airfoil2D-easy-v0", 8,
         {}),
    ):
        try:
            family_rows[key] = round(float(_family_sps(env_id, batch, **kw)), 3)
        except Exception as e:  # a family regression must not sink the bench
            family_rows[key] = None
            sys.stderr.write(f"family bench {env_id} failed: {e!r}\n")

    print(json.dumps({
        "metric": "cylinder2d_256sq_env_steps_per_sec_batch64",
        "value": round(float(sps_256), 3),
        "unit": "env_steps/s",
        "vs_baseline": round(float(vs_baseline), 3),
        "extra": {
            "grid_cells_256sq_row": 70672,
            "res24_batch64_env_steps_per_sec": round(float(sps_24), 3),
            "cpu_single_env_steps_per_sec_res56": round(float(cpu_sps), 5),
            "grad_step_seconds_batch8_res24": round(float(grad_s), 4),
            "grad_over_forward_ratio": round(float(grad_ratio), 3),
            **({k: (round(v, 4) if k.startswith("hbm_bandwidth") else v)
                for k, v in hbm_cost.items()} if hbm_cost else {}),
            **family_rows,
        },
    }))


_CHAIN_PID_FILES = ("/tmp/r4.pid", "/tmp/r3d.pid", "/tmp/tpu_step.pid",
                    "/tmp/repair.pid", "/tmp/bench_warm.pid")


def _yield_tpu_from_chain() -> bool:
    """If this repo's own dataset/validation chain (scripts/run_r3d_chain.sh)
    still holds the single-tenant TPU when the driver runs the bench,
    terminate it via its advertised pid files — by pid only, never by
    name/pattern.  Everything the chain runs is resumable + skip-existing,
    so the only cost is one truncated item.  Returns True if anything was
    signalled (the stale grant then needs ~60-90 s to clear)."""
    import signal

    signalled = False
    for pf in _CHAIN_PID_FILES:
        path = Path(pf)
        if not path.exists():
            continue
        try:
            root = int(path.read_text().strip())
        except ValueError:
            path.unlink(missing_ok=True)
            continue
        # stale-pid guard: only signal processes that look like the chain
        # (bash/timeout/python); a recycled pid from a dead chain shell must
        # not take down an unrelated tree
        out = subprocess.run(["ps", "-o", "comm=", "-p", str(root)],
                             capture_output=True, text=True)
        comm = out.stdout.strip()
        if comm not in ("bash", "timeout", "python", "python3"):
            path.unlink(missing_ok=True)
            continue
        victims, frontier = [], [root]
        while frontier:  # collect the whole tree before signalling
            p = frontier.pop()
            victims.append(p)
            out = subprocess.run(["ps", "-o", "pid=", "--ppid", str(p)],
                                 capture_output=True, text=True)
            frontier.extend(int(x) for x in out.stdout.split())
        for p in victims:  # parents first: no follow-up item is spawned
            try:
                os.kill(p, signal.SIGTERM)
                signalled = True
            except (ProcessLookupError, PermissionError):
                pass
        path.unlink(missing_ok=True)  # never re-kill a recycled pid later
    return signalled


def _probe_device() -> None:
    """Fail fast (exit 2, one JSON error line) when the TPU tunnel is dead:
    an unreachable device makes the first jax call hang FOREVER, which would
    wedge the whole driver run.  The probe runs in a subprocess so the
    timeout actually fires.  A failed first probe reclaims the chip from the
    (resumable) background chain and retries once before giving up."""
    code = ("import jax, jax.numpy as jnp;"
            "print(float(jax.jit(lambda a: a.sum())(jnp.ones((8, 8)))))")
    err = "unknown"
    for attempt in range(2):
        try:
            subprocess.run([sys.executable, "-c", code], timeout=600,
                           check=True, capture_output=True)
            return
        except (subprocess.TimeoutExpired,
                subprocess.CalledProcessError) as e:
            err = type(e).__name__
            if attempt == 0 and _yield_tpu_from_chain():
                time.sleep(120)  # let the killed holder's grant clear
                continue
            break
    print(json.dumps({
        "metric": "cylinder2d_256sq_env_steps_per_sec_batch64",
        "value": None, "unit": "env_steps/s", "vs_baseline": None,
        "error": f"device probe failed: {err}",
    }))
    sys.exit(2)


if __name__ == "__main__":
    _probe_device()
    main()
