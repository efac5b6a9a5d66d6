"""On-device PPO training demonstration on RBC heater control (real TPU).

The reference's headline use case is RL training on its envs (SB3 PPO, one
CUDA env, CPU policy updates -- README.md:58).  Here the whole loop is
TPU-native: 64 vmapped envs step as one device program (BatchedFluidEnv),
and the PPO update is a jitted optax step.  Start states come from the
bundled developed-convection datasets with randomization; rewards are
statistics-normalized (nu_ref - Nu), so mean reward > 0 means the policy
suppresses convection below the uncontrolled baseline.

Run (TPU):  PYTHONPATH=/root/repo python -u scripts/train_ppo_tpu.py \
                [--iters 60] [--minutes 25] [--n-envs 64]
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
import optax

from fluidgym_tpu.parallel import BatchedFluidEnv

ROLLOUT_STEPS = 32
PPO_EPOCHS = 4
MINIBATCHES = 4
CLIP = 0.2
GAMMA = 0.99
LAM = 0.95
LR = 3e-4
HIDDEN = 128


def flat_obs(obs, n_envs):
    parts = [jnp.asarray(obs[k]).reshape(n_envs, -1)
             for k in sorted(obs)]
    return jnp.concatenate(parts, axis=1)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--env-id", default="RBC2D-easy-v0")
    ap.add_argument("--n-envs", type=int, default=64)
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--minutes", type=float, default=25.0,
                    help="wall-clock budget; stops early when exceeded")
    ap.add_argument("--eval-steps", type=int, default=60,
                    help="final controlled-vs-uncontrolled eval horizon")
    ap.add_argument("--marl", action="store_true",
                    help="multi-agent mode: parameter-shared policy over "
                         "agents-as-envs (MA-PPO)")
    ap.add_argument("--dev", action="store_true",
                    help="tiny CPU smoke-test configuration")
    ap.add_argument("--init-log-std", type=float, default=-0.7,
                    help="initial policy log-std; the cylinder retry uses "
                         "-2.3 (sigma~0.1): the round-4 do-nothing optimum "
                         "came from costly exploration noise")
    ap.add_argument("--ent-coef", type=float, default=1e-3)
    ap.add_argument("--lr", type=float, default=LR)
    args = ap.parse_args()

    kw = {}
    if args.dev:
        kw = dict(n_heaters=4, resolution=4, load_initial_domain=False,
                  load_domain_statistics=False, randomize_initial_state=False,
                  step_length=0.1, dt=0.05, episode_length=8)
    if args.marl:
        kw["use_marl"] = True
    benv = BatchedFluidEnv(args.env_id, n_envs=args.n_envs, **kw)
    # MARL trains one parameter-shared policy over agents-as-envs (the
    # reference's MA-PPO setting): every vec slot is one agent's local view
    n_envs = args.n_envs * (benv.n_agents if benv.use_marl else 1)
    obs, _ = benv.reset(seed=0)
    x = flat_obs(obs, n_envs)
    obs_dim = int(x.shape[1])
    act_dim = int(np.prod(benv.action_space.shape))
    print(f"obs_dim={obs_dim} act_dim={act_dim} slots={n_envs} "
          f"marl={benv.use_marl}", flush=True)

    def init_params(key):
        k1, k2, k3 = jax.random.split(key, 3)
        s = lambda k, i, o, g=1.0: jax.random.normal(k, (i, o)) * g * (2.0 / i) ** 0.5
        return {
            "w1": s(k1, obs_dim, HIDDEN), "b1": jnp.zeros(HIDDEN),
            "wp": s(k2, HIDDEN, act_dim, 0.01), "bp": jnp.zeros(act_dim),
            "wv": s(k3, HIDDEN, 1, 0.1), "bv": jnp.zeros(1),
            "log_std": jnp.full((act_dim,), args.init_log_std),
        }

    def forward(p, x):
        h = jnp.tanh(x @ p["w1"] + p["b1"])
        return jnp.tanh(h @ p["wp"] + p["bp"]), p["log_std"], (h @ p["wv"] + p["bv"])[..., 0]

    def logp_gaussian(mean, log_std, a):
        var = jnp.exp(2 * log_std)
        return jnp.sum(-0.5 * ((a - mean) ** 2 / var + 2 * log_std
                               + jnp.log(2 * jnp.pi)), axis=-1)

    @jax.jit
    def act(p, x, key):
        mean, log_std, v = forward(p, x)
        a = mean + jnp.exp(log_std) * jax.random.normal(key, mean.shape)
        return a, logp_gaussian(mean, log_std, a), v

    @jax.jit
    def value_of(p, x):
        return forward(p, x)[2]

    opt = optax.adam(args.lr)

    @jax.jit
    def ppo_update(p, opt_state, batch):
        def loss_fn(pp):
            mean, log_std, v = forward(pp, batch["obs"])
            logp = logp_gaussian(mean, log_std, batch["act"])
            ratio = jnp.exp(logp - batch["logp"])
            adv = batch["adv"]
            pg = -jnp.minimum(ratio * adv,
                              jnp.clip(ratio, 1 - CLIP, 1 + CLIP) * adv).mean()
            vloss = jnp.mean((v - batch["ret"]) ** 2)
            ent = jnp.sum(log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e))
            return pg + 0.5 * vloss - args.ent_coef * ent, pg
        (_, pg), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
        # one bad minibatch (ratio overflow on an outlier transition) must
        # not NaN the params forever: skip non-finite gradients
        ok = jnp.all(jnp.asarray([jnp.isfinite(x).all()
                                  for x in jax.tree.leaves(g)]))
        g = jax.tree.map(lambda x: jnp.where(ok, x, 0.0), g)
        upd, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(p, upd), opt_state, pg

    key = jax.random.PRNGKey(0)
    params = init_params(key)
    opt_state = opt.init(params)
    rew_trace = []
    t0 = time.time()
    env_steps = 0

    for it in range(args.iters):
        if (time.time() - t0) / 60.0 > args.minutes:
            print(f"wall budget reached at iter {it}", flush=True)
            break
        buf = {k: [] for k in ("obs", "act", "logp", "rew", "val")}
        dones_l, terms_l, vfins_l = [], [], []
        na = benv.n_agents if benv.use_marl else 1
        for _ in range(ROLLOUT_STEPS):
            key, sub = jax.random.split(key)
            a, logp, v = act(params, x, sub)
            a_env = jnp.clip(a, -1, 1).reshape(
                (n_envs,) + tuple(benv.action_space.shape))
            obs, rew, term, trunc, info = benv.step(a_env)
            for k, val in zip(buf, (x, a, logp, jnp.asarray(rew), v)):
                buf[k].append(val)
            # auto-reset boundary accounting: GAE must not leak across
            # episodes -- truncated slots bootstrap from the TRUE final
            # obs (info["final_observation"]), diverged (terminated) slots
            # do not bootstrap, and the advantage carry resets at any done
            done = np.asarray(term) | np.asarray(trunc)
            dones_l.append(np.repeat(done, na))
            terms_l.append(np.repeat(np.asarray(term), na))
            vfin = np.zeros(n_envs, np.float32)
            if done.any() and "final_observation" in info:
                fin = flat_obs(info["final_observation"],
                               int(done.sum()) * na)
                vfin[np.repeat(done, na)] = np.asarray(
                    value_of(params, fin))
            vfins_l.append(vfin)
            x = flat_obs(obs, n_envs)
        env_steps += ROLLOUT_STEPS * n_envs
        _, _, last_v = act(params, x, key)

        rews = jnp.stack(buf["rew"]).astype(jnp.float32)
        vals = jnp.stack(buf["val"] + [last_v])
        adv = np.zeros(rews.shape, np.float32)
        gae = np.zeros(n_envs, np.float32)
        rews_h, vals_h = np.asarray(rews), np.asarray(vals)
        dones_h, terms_h = np.stack(dones_l), np.stack(terms_l)
        vfins_h = np.stack(vfins_l)
        for t in reversed(range(rews.shape[0])):
            vnext = np.where(dones_h[t], vfins_h[t], vals_h[t + 1])
            vnext = np.where(terms_h[t], 0.0, vnext)
            delta = rews_h[t] + GAMMA * vnext - vals_h[t]
            gae = delta + GAMMA * LAM * np.where(dones_h[t], 0.0, gae)
            adv[t] = gae
        ret = adv + vals_h[:-1]
        advn = (adv - adv.mean()) / (adv.std() + 1e-8)

        flat = {
            "obs": jnp.concatenate(buf["obs"]),
            "act": jnp.concatenate(buf["act"]),
            "logp": jnp.concatenate(buf["logp"]),
            "adv": jnp.asarray(advn.reshape(-1)),
            "ret": jnp.asarray(ret.reshape(-1)),
        }
        n = flat["obs"].shape[0]
        mb = n // MINIBATCHES
        for _ in range(PPO_EPOCHS):
            key, sub = jax.random.split(key)
            perm = jax.random.permutation(sub, n)
            for m in range(MINIBATCHES):
                idx = perm[m * mb:(m + 1) * mb]
                batch = {k: v[idx] for k, v in flat.items()}
                params, opt_state, pg = ppo_update(params, opt_state, batch)

        r_mean = float(rews.mean())
        rew_trace.append(r_mean)
        p_ok = bool(np.all([np.isfinite(np.asarray(x)).all()
                            for x in jax.tree.leaves(params)]))
        print(f"iter {it}: mean_reward={r_mean:+.5f} "
              f"env_steps={env_steps} "
              f"({env_steps / (time.time() - t0):.0f} env-steps/s)"
              + ("" if p_ok else " PARAMS_NONFINITE"), flush=True)

    train_minutes = (time.time() - t0) / 60.0

    # final controlled-vs-uncontrolled eval: deterministic (mean-action)
    # policy and the zero-action baseline from the SAME fresh resets
    metric = benv.env.metrics[0] if benv.env.metrics else None
    obs, _ = benv.reset(seed=10_000)
    x = flat_obs(obs, n_envs)

    def run_eval(policy_fn, steps):
        nonlocal obs, x
        rs, ms = [], []
        for _ in range(steps):
            a_env = policy_fn(x).reshape(
                (n_envs,) + tuple(benv.action_space.shape))
            obs, rew, term, trunc, info = benv.step(a_env)
            rs.append(np.asarray(rew))
            if metric is not None:
                ms.append(np.asarray(info[metric]))
            x = flat_obs(obs, n_envs)
        return (float(np.mean(rs)),
                float(np.mean(ms)) if ms else None)

    @jax.jit
    def det_action(x):
        mean, _, _ = forward(params, x)
        return jnp.clip(mean, -1, 1)

    eval_steps = args.eval_steps
    pol_rew, pol_metric = run_eval(det_action, eval_steps)
    obs, _ = benv.reset(seed=10_000)
    x = flat_obs(obs, n_envs)
    zero = jnp.zeros((n_envs, act_dim), jnp.float32)
    base_rew, base_metric = run_eval(lambda _x: zero, eval_steps)

    k = max(3, len(rew_trace) // 5)
    result = {
        "algo": "MA-PPO" if benv.use_marl else "PPO",
        "env_id": args.env_id,
        "n_envs": n_envs,
        "iterations": len(rew_trace),
        "env_steps": env_steps,
        "wall_minutes": train_minutes,
        "reward_first_k": float(np.mean(rew_trace[:k])) if rew_trace else None,
        "reward_last_k": float(np.mean(rew_trace[-k:])) if rew_trace else None,
        "eval_steps": eval_steps,
        "eval_policy_mean_reward": pol_rew,
        "eval_uncontrolled_mean_reward": base_rew,
        "improvement": pol_rew - base_rew,
        "reward_trace": rew_trace,
    }
    if metric is not None:
        result[f"eval_policy_mean_{metric}"] = pol_metric
        result[f"eval_uncontrolled_mean_{metric}"] = base_metric
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
