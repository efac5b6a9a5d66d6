"""Evolution-strategy control search on the cylinder (real TPU).

PPO converged to a do-nothing policy on CylinderJet2D-easy (artifact
``bench_assets/control/ppo_cylinder_easy.json``: eval drag == uncontrolled
3.269) and every BPTT/DPC attempt degraded drag (limit-cycle adjoint
pathology, ``dpc_cylinder_attempts.md``).  Both failures share a cause: the
do-nothing point is a strong local optimum under noisy exploration, while
the known-good controllers at Re~100 live in a tiny, smooth family --
steady base bleed and harmonic jet forcing near the shedding frequency
(Rabault et al. 2019 end up with a small quasi-periodic jet).  So search
that family directly:

* phase 0 -- constant base-bleed scan: one candidate ``c`` per batched
  lane, a single device program evaluates the whole scan.  The zero lane
  doubles as the uncontrolled baseline and its lift series gives the
  shedding frequency by FFT.
* phase 1 -- antithetic rank-based ES over ``(c, A, omega, phi)`` with
  ``a_t = clip(c + A*sin(omega*t + phi))``, all lanes starting from the
  SAME developed snapshot (common-state evaluation: fitness differences
  are purely parametric).
* final -- best params vs zero action re-evaluated over a longer horizon;
  one JSON artifact line.

The reference exposes the same batched-search workflow through its SB3
vec-env path (reference README.md:50-58 PPO/SAC baselines); ES itself
mirrors ``examples/training_es.py``.

Run (TPU): PYTHONPATH=/root/repo python -u scripts/train_es_tpu.py \
               [--env-id CylinderJet2D-easy-v0] [--pop 32] [--gens 8]
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

import jax
import jax.numpy as jnp
import numpy as np

from fluidgym_tpu.parallel import BatchedFluidEnv

LO = np.array([-1.0, 0.0, 0.02, 0.0], np.float32)      # c, A, omega, phi
HI = np.array([1.0, 1.0, 1.8, 2 * np.pi], np.float32)
SIGMA0 = np.array([0.12, 0.12, 0.08, 0.7], np.float32)


def log(msg: str) -> None:
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def rollout(benv, base_state, params, steps, act_shape, collect=()):
    """Run ``steps`` env-steps with per-lane harmonic actions; returns
    (per-lane mean reward over the last half, collected info series)."""
    n = params.shape[0]
    benv._bstate = jax.tree.map(
        lambda x: jnp.repeat(x[:1], n, axis=0), base_state)
    benv._step_counts = np.zeros(n, np.int64)
    c, amp, om, ph = (params[:, i] for i in range(4))
    rews = np.zeros((steps, n), np.float32)
    series = {k: [] for k in collect}
    for t in range(steps):
        a = np.clip(c + amp * np.sin(om * t + ph), -1.0, 1.0)
        a = np.broadcast_to(a.reshape((n,) + (1,) * len(act_shape)),
                            (n,) + act_shape).astype(np.float32)
        _, rew, term, trunc, info = benv.step(a)
        rews[t] = np.asarray(rew, np.float32).reshape(n, -1).mean(axis=1)
        for k in collect:
            if k in info:
                series[k].append(np.asarray(info[k], np.float32)
                                 .reshape(n, -1).mean(axis=1))
    fit = rews[steps // 2:].mean(axis=0)
    return fit, rews, {k: np.stack(v) for k, v in series.items() if v}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--env-id", default="CylinderJet2D-easy-v0")
    ap.add_argument("--pop", type=int, default=32)
    ap.add_argument("--gens", type=int, default=8)
    ap.add_argument("--horizon", type=int, default=150)
    ap.add_argument("--eval-steps", type=int, default=200)
    ap.add_argument("--minutes", type=float, default=40.0)
    ap.add_argument("--dev", action="store_true")
    args = ap.parse_args()
    t_start = time.time()

    kw = {}
    if args.dev:
        kw = dict(load_initial_domain=False, load_domain_statistics=False)
    benv = BatchedFluidEnv(args.env_id, n_envs=args.pop,
                           randomize_initial_state=False,
                           episode_length=10 ** 9, **kw)
    benv.reset(seed=0)
    base_state = jax.tree.map(lambda x: x[:1], benv._bstate)
    act_shape = tuple(benv.action_space.shape)
    metric = "drag" if "drag" in getattr(benv.env, "_metrics", []) else (
        getattr(benv.env, "_metrics", ["reward"]) or ["reward"])[0]
    pop, rng = args.pop, np.random.default_rng(0)

    # ---- phase 0: constant base-bleed scan (zero lane = baseline) ------
    cs = np.linspace(-0.8, 0.8, pop).astype(np.float32)
    zero_lane = pop // 2
    cs[zero_lane] = 0.0
    p0 = np.stack([cs, np.zeros(pop, np.float32),
                   np.full(pop, 0.1, np.float32),
                   np.zeros(pop, np.float32)], axis=1)
    fit0, _, series = rollout(benv, base_state, p0, args.horizon,
                              act_shape, collect=("lift", metric))
    best0 = int(np.argmax(fit0))
    base_fit = float(fit0[zero_lane])
    log(f"phase0: best c={cs[best0]:+.3f} fit={fit0[best0]:.4f} "
        f"(uncontrolled fit {base_fit:.4f})")

    # shedding frequency from the uncontrolled lane's lift trace (fall
    # back to the metric series for families without a lift force)
    osc_key = "lift" if "lift" in series else metric
    lift = series[osc_key][args.horizon // 2:, zero_lane]
    lift = lift - lift.mean()
    freqs = np.fft.rfftfreq(lift.size)
    spec = np.abs(np.fft.rfft(lift))
    spec[0] = 0.0  # exclude DC/drift
    omega_shed = float(2 * np.pi * freqs[int(np.argmax(spec))])
    log(f"shedding omega ~= {omega_shed:.3f} rad/step "
        f"(period {2 * np.pi / max(omega_shed, 1e-6):.1f} steps)")

    # ---- phase 1: antithetic rank-based ES over (c, A, omega, phi) -----
    mean = np.array([cs[best0], 0.15,
                     np.clip(omega_shed, LO[2], HI[2]), 0.0], np.float32)
    sigma = SIGMA0.copy()
    best = (float(fit0[best0]), p0[best0].copy())
    trace = [{"gen": -1, "mean_fit": float(fit0.mean()),
              "best_fit": best[0], "uncontrolled_fit": base_fit}]
    for gen in range(args.gens):
        if (time.time() - t_start) / 60 > args.minutes:
            log("minutes budget reached")
            break
        eps = rng.normal(size=(pop // 2, 4)).astype(np.float32)
        eps[0] = 0.0  # elite pair: both lanes evaluate the unperturbed mean
        eps = np.concatenate([eps, -eps], axis=0)
        cand = np.clip(mean[None] + sigma[None] * eps, LO[None], HI[None])
        fit, _, _ = rollout(benv, base_state, cand, args.horizon, act_shape)
        order = np.argsort(fit)
        ranks = np.empty(pop, np.float32)
        ranks[order] = np.linspace(-0.5, 0.5, pop)
        grad = (ranks[:, None] * eps).sum(axis=0) / (pop / 2)
        mean = np.clip(mean + 0.6 * sigma * grad, LO, HI)
        sigma = np.maximum(sigma * 0.93, SIGMA0 * 0.25)
        gi = int(np.argmax(fit))
        if float(fit[gi]) > best[0]:
            best = (float(fit[gi]), cand[gi].copy())
        trace.append({"gen": gen, "mean_fit": float(fit.mean()),
                      "best_fit": float(fit[gi])})
        log(f"gen {gen}: mean fit {fit.mean():.4f} best {fit[gi]:.4f} "
            f"mean-params c={mean[0]:+.3f} A={mean[1]:.3f} "
            f"om={mean[2]:.3f} ph={mean[3]:.2f}")

    # ---- final eval: best params vs zero action, longer horizon --------
    pb = np.broadcast_to(best[1][None], (pop, 4)).copy()
    fit_b, rews_b, ser_b = rollout(benv, base_state, pb, args.eval_steps,
                                   act_shape, collect=(metric,))
    pz = np.zeros((pop, 4), np.float32)
    fit_z, rews_z, ser_z = rollout(benv, base_state, pz, args.eval_steps,
                                   act_shape, collect=(metric,))
    half = args.eval_steps // 2
    pol_m = float(ser_b[metric][half:].mean())
    unc_m = float(ser_z[metric][half:].mean())
    result = {
        "algo": "ES",
        "env_id": args.env_id,
        "pop": pop,
        "generations": len(trace) - 1,
        "horizon": args.horizon,
        "eval_steps": args.eval_steps,
        "wall_minutes": (time.time() - t_start) / 60,
        "omega_shed": omega_shed,
        "best_params": {"c": float(best[1][0]), "A": float(best[1][1]),
                        "omega": float(best[1][2]), "phi": float(best[1][3])},
        "eval_policy_mean_reward": float(rews_b[half:].mean()),
        "eval_uncontrolled_mean_reward": float(rews_z[half:].mean()),
        f"eval_policy_mean_{metric}": pol_m,
        f"eval_uncontrolled_mean_{metric}": unc_m,
        f"{metric}_change_pct": 100.0 * (pol_m - unc_m) / abs(unc_m)
        if unc_m else 0.0,
        "trace": trace,
    }
    print(json.dumps(result), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
