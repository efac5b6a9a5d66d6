"""Classical opposition control on the turbulent channel (real TPU).

Records the first TCF control result: the Choi, Moin & Kim (1994) opposition
controller — wall-normal blowing/suction opposing the wall-normal velocity
measured at a detection plane near y+ = 15 — applied through the SAME
per-(x,z)-tile zero-net-mass-flux action interface an RL agent uses
(reference action path: /root/reference/src/fluidgym/envs/tcf/tcf_env.py:
521-554; episode archival :1017-1062).  Literature at Re_tau ~ 180 reports
~20-25% skin-friction drag reduction for v_wall = -v(y+ ~ 10-15).

The controller needs no training: a_tile = -<u_y'(x, y_det, z)>_tile /
u_tau, clipped to the action box.  The env re-centers (zero net flux) and
scales by u_tau, so the applied wall velocity is ~ -u_y' at the detection
plane, amplitude-capped at u_tau.

Protocol: from the same bundled developed snapshot, march (a) uncontrolled
and (b) opposition-controlled episodes; compare mean bottom-wall stress
over the measurement window (after a settling window).  Each episode is
archived next to the dataset via save_opposition_control_episode so learned
policies can be compared per snapshot (reference tcf_env.py:1017-1062).

Run (TPU): PYTHONPATH=/root/repo python -u scripts/opposition_control_tpu.py \
    [--env-id TCFSmall3D-bottom-easy-v0] [--steps 200] [--settle 50]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

import _heartbeat  # noqa: E402

_heartbeat.start()

import numpy as np


def log(msg: str) -> None:
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def run_episode(env, steps: int, gain: float, label: str, idx: int = 0):
    """March one episode; gain=0 -> uncontrolled.  Returns per-step rows."""
    obs, _ = env.reset(seed=7)
    if idx:
        # explicit snapshot choice: idx 0 of the Re180 dataset is a
        # relaminarized lane (VALIDATION round 5) on which opposition is
        # vacuously null — drive a turbulent snapshot instead
        from fluidgym_tpu.envs.fluid_env import MODE_SEEDS

        env.load_initial_domain(env.mode, idx)
        env.seed(MODE_SEEDS[env.mode] + idx)
        env._apply_action(env._zero_action)
        obs = env._get_global_obs()
    if hasattr(env, "snapshot_turbulence_ratio"):
        log(f"  {label}: snapshot idx {idx} v'/u_tau = "
            f"{env.snapshot_turbulence_ratio():.3f}")
    rows = []
    a_shape = env.action_space.shape  # (n_agents, 1)
    nx, nz = env._n_actors_x, env._n_actors_z
    ts = env._actor_size
    u_wall = float(env._u_wall)
    t0 = time.perf_counter()
    for t in range(steps):
        if gain == 0.0:
            a = np.zeros(a_shape, np.float32)
        else:
            uy = np.asarray(obs["velocity"])[1]            # (z, x) u_y' slice
            # tile-mean pool to the actor grid: (n_z, n_x) -> (n_x, n_z)
            pooled = uy.reshape(nz, ts, nx, ts).mean(axis=(1, 3)).T
            a = (-gain * pooled / u_wall).clip(-1.0, 1.0)
            a = a.reshape(a_shape).astype(np.float32)
        obs, r, te, tr, info = env.step(a)
        rows.append({
            "step": t,
            "reward": float(np.asarray(r).reshape(-1)[0]),
            "wall_stress_bottom": float(np.asarray(info["wall_stress_bottom"])),
            "wall_stress_top": float(np.asarray(info["wall_stress_top"])),
            "wall_stress": float(np.asarray(info["wall_stress"])),
            "action_rms": float(np.sqrt(np.mean(a ** 2))),
        })
        if (t + 1) % 10 == 0:
            rate = (t + 1) / (time.perf_counter() - t0)
            log(f"  {label} t={t + 1}/{steps} "
                f"tau_b={rows[-1]['wall_stress_bottom']:.5g} "
                f"({rate:.2f} steps/s)")
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--env-id", default="TCFSmall3D-bottom-easy-v0")
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--settle", type=int, default=50)
    ap.add_argument("--gains", type=float, nargs="*", default=[1.0])
    ap.add_argument("--idx", type=int, default=1,
                    help="snapshot index (0 is a relaminarized lane in the "
                         "bundled Re180 set; 1/2 are turbulent)")
    ap.add_argument("--out", default="bench_assets/control/opposition_tcf.json")
    args = ap.parse_args()

    import fluidgym_tpu
    from fluidgym_tpu.types import EnvMode

    env = fluidgym_tpu.make(args.env_id, use_marl=False,
                            randomize_initial_state=False,
                            episode_length=10 ** 9)
    env.test()
    log(f"{args.env_id}: {env._n_actors_x}x{env._n_actors_z} actors, "
        f"u_wall={float(env._u_wall):.4g}, tau_ref={float(env.tau_ref):.5g}")

    def window_mean(rows, key):
        v = [r[key] for r in rows[args.settle:]]
        return float(np.mean(v)), float(np.std(v))

    results = {"env_id": args.env_id, "steps": args.steps,
               "settle": args.settle, "tau_ref": float(env.tau_ref),
               "snapshot_idx": args.idx,
               "controller": "opposition (Choi et al. 1994), v_wall = "
                             "-gain*uy'(y+=15), capped at u_tau"}
    rows_un = run_episode(env, args.steps, 0.0, "uncontrolled", idx=args.idx)
    m, s = window_mean(rows_un, "wall_stress_bottom")
    results["uncontrolled"] = {"tau_bottom_mean": m, "tau_bottom_std": s}
    log(f"uncontrolled tau_bottom={m:.6g} +- {s:.2g}")

    best = None
    for gain in args.gains:
        rows_op = run_episode(env, args.steps, gain, f"opposition g={gain}", idx=args.idx)
        mo, so = window_mean(rows_op, "wall_stress_bottom")
        red = 100.0 * (1.0 - mo / m)
        log(f"gain={gain}: tau_bottom={mo:.6g} +- {so:.2g} "
            f"-> reduction {red:+.1f}%")
        entry = {"gain": gain, "tau_bottom_mean": mo, "tau_bottom_std": so,
                 "reduction_pct": red,
                 "action_rms_mean": float(np.mean(
                     [r["action_rms"] for r in rows_op[args.settle:]]))}
        results.setdefault("opposition", []).append(entry)
        if best is None or red > best[0]:
            best = (red, gain, rows_op)
        try:
            env.save_opposition_control_episode(args.idx, EnvMode.TEST, rows_op)
        except Exception as e:  # archival must not kill the result
            log(f"archival failed: {e}")

    results["best_reduction_pct"] = best[0]
    results["best_gain"] = best[1]
    out = REPO / args.out
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(results, indent=1))
    print(json.dumps({k: v for k, v in results.items()
                      if k not in ()}), flush=True)


if __name__ == "__main__":
    main()
