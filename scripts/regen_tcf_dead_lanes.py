"""Regenerate relaminarized TCF dataset lanes with fresh seeds.

Round-5 finding: the TCFSmall-easy (Re_tau 180) idx-00 lane DECAYED to a
near-laminar state during its burn-in (v'/u_tau < 0.01 in the bundled
train_00/val_00/test_00 snapshots, wall stress ~0.4x nominal), which is
why opposition control measured null on it — the minimal-box Re180
channel laminarizes intermittently and a decayed deterministic replay
never recovers.  This script finds dead lanes by inspecting the bundled
snapshots (v'/u_tau < 0.15), re-burns each with a DIFFERENT seed (the
original seed deterministically reproduces the decay), gates the save on
a healthy turbulence ratio (retrying with another seed), re-records the
three per-mode episodes from the fresh snapshots, repools statistics,
and refreshes the bundle.

Run (TPU): PYTHONPATH=/root/repo python -u scripts/regen_tcf_dead_lanes.py \
    [--env-id TCFSmall3D-bottom-easy-v0] [--episode-steps 100]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

import _heartbeat  # noqa: E402

_heartbeat.start()

from generate_datasets import bundle, log  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--env-id", default="TCFSmall3D-bottom-easy-v0")
    ap.add_argument("--episode-steps", type=int, default=100)
    ap.add_argument("--gate", type=float, default=0.2)
    ap.add_argument("--max-attempts", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import fluidgym_tpu
    from fluidgym_tpu.envs.fluid_env import MODE_SEEDS
    from fluidgym_tpu.types import EnvMode
    from fluidgym_tpu.utils import data_utils

    env = fluidgym_tpu.make(args.env_id, load_initial_domain=False,
                            load_domain_statistics=False, use_marl=False)
    env._load_domain_on_reset = False
    env._enable_actions = False
    env.reset(seed=0)

    # find dead lanes by their TRAIN snapshots (val/test derive from the
    # same burn-in lane in the TCF protocol)
    dead = []
    idx = 0
    while True:
        try:
            env.load_initial_domain(EnvMode.TRAIN, idx)
        except FileNotFoundError:
            break
        ratio = env.snapshot_turbulence_ratio()
        log(f"train_{idx:02d}: v'/u_tau = {ratio:.3f}"
            + ("  <-- DEAD" if ratio < 0.15 else ""))
        if ratio < 0.15:
            dead.append(idx)
        idx += 1
    if not dead:
        log("no dead lanes; nothing to do")
        return

    base = env._initial_domain_steps
    extra = max(1, int(base * 0.1))
    step_fn = jax.jit(jax.vmap(env._pure_step))
    bact = jnp.broadcast_to(env._zero_action,
                            (1,) + env._zero_action.shape)

    for lane_idx in dead:
        for attempt in range(args.max_attempts):
            seed = MODE_SEEDS[EnvMode.TRAIN] + lane_idx + 1000 * (attempt + 1)
            env.mode = EnvMode.TRAIN
            env.reset(seed=seed, randomize=False)
            env.seed(seed)
            steps = int(round(base))
            jitter = int(round(steps * 0.15))
            if jitter:
                steps = int(steps + env._np_rng.integers(-jitter, jitter + 1))
            events = [(steps, EnvMode.TRAIN), (steps + extra, EnvMode.VAL),
                      (steps + 2 * extra, EnvMode.TEST)]
            horizon = events[-1][0]
            log(f"lane {lane_idx} attempt {attempt}: seed {seed}, "
                f"horizon {horizon}")
            bcarry = jax.tree.map(lambda a: a[None], env._pure_carry())
            t0 = time.perf_counter()
            ok = True
            ev = list(events)
            for t in range(1, horizon + 1):
                bcarry, *_ = step_fn(bcarry, bact)
                while ev and ev[0][0] == t:
                    _, mode = ev.pop(0)
                    lane_carry = jax.device_get(
                        jax.tree.map(lambda a: a[0], bcarry))
                    finite = all(np.isfinite(x).all()
                                 for x in jax.tree.leaves(lane_carry))
                    env._set_pure_carry(lane_carry)
                    ratio = env.snapshot_turbulence_ratio()
                    if not finite or ratio < args.gate:
                        log(f"  !!! {mode.value}_{lane_idx:02d} at t={t}: "
                            f"v'/u_tau {ratio:.3f} "
                            f"{'NONFINITE' if not finite else '< gate'}; "
                            f"retrying lane with a new seed")
                        ok = False
                        break
                    env._save_initial_domain(mode, lane_idx)
                    log(f"  saved {mode.value}_{lane_idx:02d} at t={t} "
                        f"(v'/u_tau {ratio:.3f})")
                if not ok:
                    break
                if t % 2000 == 0:
                    jax.block_until_ready(jax.tree.leaves(bcarry)[0])
                    log(f"  t={t}/{horizon} "
                        f"({t / (time.perf_counter() - t0):.1f} steps/s)")
            if ok:
                break
        else:
            log(f"!!! lane {lane_idx}: all {args.max_attempts} attempts "
                f"decayed; keeping the old snapshots")
            continue

        # re-record the three per-mode episodes from the fresh snapshots
        for mode in MODE_SEEDS:
            env.mode = mode
            env.load_initial_domain(mode, lane_idx, user_only=True)
            env.seed(MODE_SEEDS[mode] + lane_idx)
            bcarry = jax.tree.map(lambda a: a[None], env._pure_carry())
            rows = []
            for t in range(args.episode_steps):
                bcarry, _, _, info = step_fn(bcarry, bact)
                host = jax.device_get(
                    {k: v for k, v in info.items()
                     if hasattr(v, "size") and v.size == 1})
                rows.append({k: float(np.asarray(v).reshape(-1)[0])
                             for k, v in host.items()})
            violations = env.episode_sanity_violations(rows)
            if violations:
                log(f"  !!! re-recorded {mode.value}_{lane_idx:02d} fails "
                    f"sanity: {'; '.join(violations)} (shipping anyway — "
                    f"strictly fresher than the laminar trace)")
            data_utils.save_uncontrolled_episode(
                env.initial_domain_id, mode.value, lane_idx, rows)
            log(f"  re-recorded episode {mode.value}_{lane_idx:02d} "
                f"(tau_b mean {np.mean([r['wall_stress_bottom'] for r in rows]):.3g})")

    # repool statistics over ALL episodes on disk and refresh the bundle
    all_rows = []
    for mode in MODE_SEEDS:
        for i in range(idx):
            try:
                all_rows.extend(
                    {k: float(v) for k, v in r.items()}
                    for r in data_utils.load_uncontrolled_episode(
                        env.initial_domain_id, mode.value, i))
            except FileNotFoundError:
                pass
    env._save_domain_statistics(env._pool_statistics_rows(all_rows))
    log("repooled domain_statistics.json")
    bundle(env)
    log("regen_tcf_dead_lanes complete")


if __name__ == "__main__":
    main()
