"""On-device SAC / MA-SAC training demonstration (real TPU).

Completes the reference's RL-baseline roster (PPO, SAC, MA-PPO, MA-SAC,
DPC -- /root/reference/README.md:58, docs/landing_page/index.html:405) on
this framework's batched envs.  Like scripts/train_ppo_tpu.py, the whole
environment side is one device program: 16-64 vmapped envs step in
lockstep through BatchedFluidEnv, while the SAC updates (twin soft
Q-critics, squashed-Gaussian actor, automatic temperature tuning) run as
jitted optax steps.  The replay buffer stays on host (numpy ring buffer)
-- at 1536-dim observations a 100k-transition buffer would cost >1 GiB of
HBM for no compute benefit; only the sampled minibatch crosses to the
device each update.

MA-SAC (--marl) uses the reference's agents-as-envs trick
(/root/reference/src/fluidgym/integration/sb3/vec_env.py:26-37): one
parameter-shared actor/critic trains over every agent's local view.

Run (TPU):  PYTHONPATH=/root/repo python -u scripts/train_sac_tpu.py \
                [--iters 60] [--minutes 25] [--n-envs 16] [--marl]
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

ROLLOUT_STEPS = 16          # env steps collected per iteration
UPDATES_PER_ITER = 64       # gradient steps per iteration
BATCH = 256
GAMMA = 0.99
TAU = 0.005                 # polyak target-smoothing coefficient
LR = 3e-4
HIDDEN = 128
WARMUP_STEPS = 4            # uniform-random env steps before training


def flat_obs(obs, n_envs):
    parts = [jnp.asarray(obs[k]).reshape(n_envs, -1) for k in sorted(obs)]
    return jnp.concatenate(parts, axis=1)


class ReplayBuffer:
    """Host-side ring buffer of (obs, act, rew, next_obs, nonterminal).

    ``nobs`` is always the TRUE successor observation of ``obs`` (the
    auto-reset boundary splice happens at collection time from
    ``info["final_observation"]``), and ``mask`` is 0 only for genuinely
    terminated (diverged) lanes, so truncated episodes still bootstrap from
    their real final state (partial-episode bootstrapping for a continuing
    control task)."""

    def __init__(self, capacity, obs_dim, act_dim):
        self.capacity = capacity
        self.obs = np.zeros((capacity, obs_dim), np.float32)
        self.act = np.zeros((capacity, act_dim), np.float32)
        self.rew = np.zeros((capacity,), np.float32)
        self.nobs = np.zeros((capacity, obs_dim), np.float32)
        self.mask = np.ones((capacity,), np.float32)
        self.ptr = 0
        self.size = 0

    def add_batch(self, obs, act, rew, nobs, mask):
        n = obs.shape[0]
        idx = (self.ptr + np.arange(n)) % self.capacity
        self.obs[idx] = obs
        self.act[idx] = act
        self.rew[idx] = rew
        self.nobs[idx] = nobs
        self.mask[idx] = mask
        self.ptr = int((self.ptr + n) % self.capacity)
        self.size = int(min(self.size + n, self.capacity))

    def sample(self, rng, batch):
        idx = rng.integers(0, self.size, size=batch)
        return {
            "obs": jnp.asarray(self.obs[idx]),
            "act": jnp.asarray(self.act[idx]),
            "rew": jnp.asarray(self.rew[idx]),
            "nobs": jnp.asarray(self.nobs[idx]),
            "mask": jnp.asarray(self.mask[idx]),
        }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--env-id", default="RBC2D-easy-v0")
    ap.add_argument("--n-envs", type=int, default=16)
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--minutes", type=float, default=25.0,
                    help="wall-clock budget; stops early when exceeded")
    ap.add_argument("--eval-steps", type=int, default=60)
    ap.add_argument("--buffer", type=int, default=100_000)
    ap.add_argument("--marl", action="store_true",
                    help="MA-SAC: parameter-shared policy over agents-as-envs")
    ap.add_argument("--dev", action="store_true",
                    help="tiny CPU smoke-test configuration")
    args = ap.parse_args()

    kw = {}
    updates_per_iter = UPDATES_PER_ITER
    rollout_steps = ROLLOUT_STEPS
    if args.dev:
        kw = dict(n_heaters=4, resolution=4, load_initial_domain=False,
                  load_domain_statistics=False, randomize_initial_state=False,
                  step_length=0.1, dt=0.05, episode_length=8)
        updates_per_iter = 4
        rollout_steps = 4
    if args.marl:
        kw["use_marl"] = True
    benv = BatchedFluidEnv(args.env_id, n_envs=args.n_envs, **kw)
    n_envs = args.n_envs * (benv.n_agents if benv.use_marl else 1)
    obs, _ = benv.reset(seed=0)
    x = flat_obs(obs, n_envs)
    obs_dim = int(x.shape[1])
    act_dim = int(np.prod(benv.action_space.shape))
    print(f"obs_dim={obs_dim} act_dim={act_dim} slots={n_envs} "
          f"marl={benv.use_marl}", flush=True)

    def dense(key, i, o, gain=1.0):
        return jax.random.normal(key, (i, o)) * gain * (2.0 / i) ** 0.5

    def init_actor(key):
        k1, k2 = jax.random.split(key)
        return {"w1": dense(k1, obs_dim, HIDDEN), "b1": jnp.zeros(HIDDEN),
                "wo": dense(k2, HIDDEN, 2 * act_dim, 0.01),
                "bo": jnp.zeros(2 * act_dim)}

    def init_critic(key):
        k1, k2 = jax.random.split(key)
        return {"w1": dense(k1, obs_dim + act_dim, HIDDEN),
                "b1": jnp.zeros(HIDDEN),
                "wo": dense(k2, HIDDEN, 1, 0.1), "bo": jnp.zeros(1)}

    LOG_STD_MIN, LOG_STD_MAX = -8.0, 2.0

    def actor_dist(p, x):
        h = jnp.tanh(x @ p["w1"] + p["b1"])
        out = h @ p["wo"] + p["bo"]
        mean, log_std = out[..., :act_dim], out[..., act_dim:]
        return mean, jnp.clip(log_std, LOG_STD_MIN, LOG_STD_MAX)

    def sample_action(p, x, key):
        """Squashed Gaussian: a = tanh(u), u ~ N(mean, std); returns logp."""
        mean, log_std = actor_dist(p, x)
        std = jnp.exp(log_std)
        u = mean + std * jax.random.normal(key, mean.shape)
        a = jnp.tanh(u)
        logp_u = jnp.sum(-0.5 * (((u - mean) / std) ** 2 + 2 * log_std
                                 + jnp.log(2 * jnp.pi)), axis=-1)
        # change-of-variables correction for tanh squashing
        logp = logp_u - jnp.sum(2.0 * (jnp.log(2.0) - u - jax.nn.softplus(-2.0 * u)),
                                axis=-1)
        return a, logp

    def q_value(p, x, a):
        h = jnp.tanh(jnp.concatenate([x, a], axis=-1) @ p["w1"] + p["b1"])
        return (h @ p["wo"] + p["bo"])[..., 0]

    key = jax.random.PRNGKey(0)
    k_a, k_q1, k_q2, key = jax.random.split(key, 4)
    params = {
        "actor": init_actor(k_a),
        "q1": init_critic(k_q1), "q2": init_critic(k_q2),
        "log_alpha": jnp.zeros(()),
    }
    targets = {"q1": params["q1"], "q2": params["q2"]}
    target_entropy = -float(act_dim)

    opt = optax.adam(LR)
    opt_state = opt.init(params)

    @jax.jit
    def sac_update(params, targets, opt_state, batch, key):
        def loss_fn(p):
            # critic targets from the frozen networks
            a_next, logp_next = sample_action(p["actor"], batch["nobs"], key)
            alpha = jnp.exp(p["log_alpha"])
            q_next = jnp.minimum(q_value(targets["q1"], batch["nobs"], a_next),
                                 q_value(targets["q2"], batch["nobs"], a_next))
            # nobs is the true successor (auto-reset boundaries spliced out
            # at collection); mask zeroes bootstrapping only for diverged
            # (terminated) lanes
            y = jax.lax.stop_gradient(
                batch["rew"]
                + GAMMA * batch["mask"] * (q_next - alpha * logp_next))
            q1 = q_value(p["q1"], batch["obs"], batch["act"])
            q2 = q_value(p["q2"], batch["obs"], batch["act"])
            critic_loss = jnp.mean((q1 - y) ** 2) + jnp.mean((q2 - y) ** 2)

            # actor: maximize soft value under the CURRENT critics
            a_pi, logp_pi = sample_action(p["actor"], batch["obs"], key)
            q_pi = jnp.minimum(
                q_value(jax.lax.stop_gradient(p["q1"]), batch["obs"], a_pi),
                q_value(jax.lax.stop_gradient(p["q2"]), batch["obs"], a_pi))
            actor_loss = jnp.mean(jax.lax.stop_gradient(alpha) * logp_pi - q_pi)

            # automatic temperature tuning toward the entropy target
            alpha_loss = -jnp.mean(
                p["log_alpha"]
                * jax.lax.stop_gradient(logp_pi + target_entropy))
            return critic_loss + actor_loss + alpha_loss, (critic_loss, logp_pi)

        (_, (closs, logp_pi)), g = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        # one bad batch must not NaN the params forever: skip non-finite grads
        ok = jnp.all(jnp.asarray([jnp.isfinite(x).all()
                                  for x in jax.tree.leaves(g)]))
        g = jax.tree.map(lambda x: jnp.where(ok, x, 0.0), g)
        upd, opt_state = opt.update(g, opt_state)
        params = optax.apply_updates(params, upd)
        targets = jax.tree.map(lambda t, s: (1 - TAU) * t + TAU * s,
                               targets, {"q1": params["q1"], "q2": params["q2"]})
        return params, targets, opt_state, closs, -jnp.mean(logp_pi)

    @jax.jit
    def explore(p, x, key):
        a, _ = sample_action(p, x, key)
        return a

    buf = ReplayBuffer(args.buffer, obs_dim, act_dim)
    rng = np.random.default_rng(0)
    rew_trace = []
    t0 = time.time()
    env_steps = 0

    def env_action(a):
        return jnp.asarray(a).reshape((n_envs,) + tuple(benv.action_space.shape))

    for it in range(args.iters):
        if (time.time() - t0) / 60.0 > args.minutes:
            print(f"wall budget reached at iter {it}", flush=True)
            break
        # ---- collect ----
        it_rews = []
        for _ in range(rollout_steps):
            key, sub = jax.random.split(key)
            if it == 0 and env_steps < WARMUP_STEPS * n_envs:
                a = jax.random.uniform(sub, (n_envs, act_dim),
                                       minval=-1.0, maxval=1.0)
            else:
                a = explore(params["actor"], x, sub)
            obs, rew, term, trunc, info = benv.step(env_action(a))
            nx = flat_obs(obs, n_envs)
            # auto-reset splices fresh episodes into done rows of `obs`;
            # the stored transition must use the OLD episode's true final
            # obs (info["final_observation"]) so TD targets never bootstrap
            # across episode boundaries
            na = benv.n_agents if benv.use_marl else 1
            done = (np.asarray(term) | np.asarray(trunc)).astype(bool)
            store_nx = np.asarray(nx).copy()
            if done.any() and "final_observation" in info:
                fin = flat_obs(info["final_observation"],
                               int(done.sum()) * na)
                store_nx[np.repeat(done, na)] = np.asarray(fin)
            # bootstrap through truncation (continuing task), not divergence
            mask = np.repeat(~np.asarray(term), na).astype(np.float32)
            buf.add_batch(np.asarray(x), np.asarray(a),
                          np.asarray(rew, np.float32).reshape(-1),
                          store_nx, mask)
            it_rews.append(np.asarray(rew))
            x = nx
            env_steps += n_envs
        # ---- update ----
        closs = ent = None
        for _ in range(updates_per_iter):
            key, sub = jax.random.split(key)
            batch = buf.sample(rng, min(BATCH, buf.size))
            params, targets, opt_state, closs, ent = sac_update(
                params, targets, opt_state, batch, sub)
        r_mean = float(np.mean(it_rews))
        rew_trace.append(r_mean)
        print(f"iter {it}: mean_reward={r_mean:+.5f} "
              f"critic_loss={float(closs):.4f} entropy={float(ent):+.2f} "
              f"alpha={float(jnp.exp(params['log_alpha'])):.4f} "
              f"env_steps={env_steps} "
              f"({env_steps / (time.time() - t0):.0f} env-steps/s)", flush=True)

    train_minutes = (time.time() - t0) / 60.0

    # final controlled-vs-uncontrolled eval from the SAME fresh resets
    metric = benv.env.metrics[0] if benv.env.metrics else None
    obs, _ = benv.reset(seed=10_000)
    x = flat_obs(obs, n_envs)

    def run_eval(policy_fn, steps):
        nonlocal obs, x
        rs, ms = [], []
        for _ in range(steps):
            obs, rew, term, trunc, info = benv.step(env_action(policy_fn(x)))
            rs.append(np.asarray(rew))
            if metric is not None:
                ms.append(np.asarray(info[metric]))
            x = flat_obs(obs, n_envs)
        return (float(np.mean(rs)), float(np.mean(ms)) if ms else None)

    @jax.jit
    def det_action(x):
        mean, _ = actor_dist(params["actor"], x)
        return jnp.tanh(mean)

    pol_rew, pol_metric = run_eval(det_action, args.eval_steps)
    obs, _ = benv.reset(seed=10_000)
    x = flat_obs(obs, n_envs)
    zero = jnp.zeros((n_envs, act_dim), jnp.float32)
    base_rew, base_metric = run_eval(lambda _x: zero, args.eval_steps)

    k = max(3, len(rew_trace) // 5)
    result = {
        "algo": "MA-SAC" if args.marl else "SAC",
        "env_id": args.env_id,
        "n_envs": n_envs,
        "iterations": len(rew_trace),
        "env_steps": env_steps,
        "wall_minutes": train_minutes,
        "reward_first_k": float(np.mean(rew_trace[:k])) if rew_trace else None,
        "reward_last_k": float(np.mean(rew_trace[-k:])) if rew_trace else None,
        "eval_steps": args.eval_steps,
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
