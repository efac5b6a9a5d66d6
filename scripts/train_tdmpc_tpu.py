"""On-device TD-MPC baseline (real TPU).

The reference's baseline set is PPO, SAC, MA-PPO, MA-SAC, DPC and TD-MPC
(docs/landing_page/index.html:405); this is the sixth.  TD-MPC (Hansen et
al. 2022) learns a LATENT dynamics model (encoder + latent transition +
reward head + value head) and plans each action with MPPI rollouts of that
model, bootstrapping the tail with a learned Q-function.  Everything here
is TPU-native: the 64 vmapped envs step as one device program
(BatchedFluidEnv), the MPPI planner is one jitted program vmapped over
lanes, and the model update is a jitted optax step over H-step segments.

Run (TPU):  PYTHONPATH=/root/repo python -u scripts/train_tdmpc_tpu.py \
                [--iters 60] [--minutes 40] [--n-envs 32]
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

LATENT = 64
HIDDEN = 128
HORIZON = 5            # latent rollout length for both planning and training
GAMMA = 0.99
TAU = 0.01             # target-net polyak rate
LR = 3e-4
BATCH = 256            # H-step segments per update
ROLLOUT_STEPS = 32     # env steps collected per iteration
UPDATES_PER_ITER = 32
WARMUP_STEPS = 16      # random-action steps before planning kicks in
# MPPI planner
N_SAMPLES = 256
N_ELITES = 32
PLAN_ITERS = 3
PLAN_STD = 0.5
MIN_STD = 0.05
TEMPERATURE = 0.5
# loss weights (TD-MPC uses rho-discounted per-step terms)
RHO = 0.7
W_CONSISTENCY = 2.0
W_REWARD = 0.5
W_VALUE = 0.1


def flat_obs(obs, n_envs):
    parts = [jnp.asarray(obs[k]).reshape(n_envs, -1) for k in sorted(obs)]
    return jnp.concatenate(parts, axis=1)


class SegmentBuffer:
    """Host-side ring buffer laid out as (time, lane, ...) so H-step
    segments can be sampled without reassembling episodes.  ``valid`` marks
    rows whose NEXT state continues the same episode (False at auto-reset
    boundaries and for diverged lanes), so sampled segments never straddle
    an episode boundary."""

    def __init__(self, capacity_t, n_envs, obs_dim, act_dim):
        self.T = capacity_t
        self.obs = np.zeros((capacity_t, n_envs, obs_dim), np.float32)
        self.act = np.zeros((capacity_t, n_envs, act_dim), np.float32)
        self.rew = np.zeros((capacity_t, n_envs), np.float32)
        self.cont = np.zeros((capacity_t, n_envs), bool)
        self.ptr = 0
        self.filled = 0

    def add(self, obs, act, rew, cont):
        self.obs[self.ptr] = obs
        self.act[self.ptr] = act
        self.rew[self.ptr] = rew
        self.cont[self.ptr] = cont
        self.ptr = (self.ptr + 1) % self.T
        self.filled = min(self.filled + 1, self.T)

    def sample_segments(self, rng, batch, horizon):
        """(obs[B,H+1,D], act[B,H,A], rew[B,H]) with no boundary inside."""
        assert self.filled > horizon + 1
        hi = self.filled - horizon - 1
        n_envs = self.obs.shape[1]
        # rejection-sample starts whose H rows are all episode-continuous
        outs = []
        need = batch
        for _ in range(20):
            t0 = rng.integers(0, hi, size=need * 2)
            lane = rng.integers(0, n_envs, size=need * 2)
            if self.ptr and self.filled == self.T:
                # avoid windows crossing the ring write head
                bad_zone = (t0 <= self.ptr - 1) & (t0 + horizon >= self.ptr)
                t0, lane = t0[~bad_zone], lane[~bad_zone]
            windows = np.stack([self.cont[t0 + i, lane]
                                for i in range(horizon)], 1)
            ok = windows.all(axis=1)
            t0, lane = t0[ok][:need], lane[ok][:need]
            outs.append((t0, lane))
            need -= len(t0)
            if need <= 0:
                break
        t0 = np.concatenate([o[0] for o in outs])
        lane = np.concatenate([o[1] for o in outs])
        obs = np.stack([self.obs[t0 + i, lane] for i in range(horizon + 1)], 1)
        act = np.stack([self.act[t0 + i, lane] for i in range(horizon)], 1)
        rew = np.stack([self.rew[t0 + i, lane] for i in range(horizon)], 1)
        return {"obs": jnp.asarray(obs), "act": jnp.asarray(act),
                "rew": jnp.asarray(rew)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--env-id", default="RBC2D-easy-v0")
    ap.add_argument("--n-envs", type=int, default=32)
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--minutes", type=float, default=40.0)
    ap.add_argument("--eval-steps", type=int, default=60)
    ap.add_argument("--dev", action="store_true",
                    help="tiny CPU smoke-test configuration")
    args = ap.parse_args()

    kw = {}
    rollout_steps, updates, n_samples = ROLLOUT_STEPS, UPDATES_PER_ITER, N_SAMPLES
    if args.dev:
        kw = dict(n_heaters=4, resolution=4, load_initial_domain=False,
                  load_domain_statistics=False, randomize_initial_state=False,
                  step_length=0.1, dt=0.05, episode_length=8)
        rollout_steps, updates, n_samples = 8, 2, 16
    benv = BatchedFluidEnv(args.env_id, n_envs=args.n_envs, **kw)
    n_envs = args.n_envs
    obs, _ = benv.reset(seed=0)
    x = flat_obs(obs, n_envs)
    obs_dim = int(x.shape[1])
    act_dim = int(np.prod(benv.action_space.shape))
    print(f"obs_dim={obs_dim} act_dim={act_dim} n_envs={n_envs}", flush=True)

    def dense(key, i, o, gain=1.0):
        return jax.random.normal(key, (i, o)) * gain * (2.0 / i) ** 0.5

    def mlp_init(key, sizes, gain_last=1.0):
        ks = jax.random.split(key, len(sizes) - 1)
        return [{"w": dense(k, a, b, gain_last if j == len(sizes) - 2 else 1.0),
                 "b": jnp.zeros(b)}
                for j, (k, a, b) in enumerate(zip(ks, sizes[:-1], sizes[1:]))]

    def mlp(layers, x):
        for lyr in layers[:-1]:
            x = jnp.tanh(x @ lyr["w"] + lyr["b"])
        return x @ layers[-1]["w"] + layers[-1]["b"]

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 7)
    key = ks[6]
    params = {
        "enc": mlp_init(ks[0], (obs_dim, HIDDEN, LATENT)),
        "dyn": mlp_init(ks[1], (LATENT + act_dim, HIDDEN, LATENT)),
        "rew": mlp_init(ks[2], (LATENT + act_dim, HIDDEN, 1), 0.1),
        "q1": mlp_init(ks[3], (LATENT + act_dim, HIDDEN, 1), 0.1),
        "q2": mlp_init(ks[4], (LATENT + act_dim, HIDDEN, 1), 0.1),
        "pi": mlp_init(ks[5], (LATENT, HIDDEN, act_dim), 0.01),
    }
    targets = {"q1": params["q1"], "q2": params["q2"]}

    def encode(p, x):
        return mlp(p["enc"], x)

    def next_latent(p, z, a):
        # residual latent dynamics keep the fixed point well-conditioned
        return z + mlp(p["dyn"], jnp.concatenate([z, a], -1))

    def reward_pred(p, z, a):
        return mlp(p["rew"], jnp.concatenate([z, a], -1))[..., 0]

    def q_min(p, z, a):
        za = jnp.concatenate([z, a], -1)
        return jnp.minimum(mlp(p["q1"], za)[..., 0], mlp(p["q2"], za)[..., 0])

    def policy(p, z):
        return jnp.tanh(mlp(p["pi"], z))

    def terminal_value(p, z):
        return q_min(p, z, policy(p, z))

    # ---- MPPI planner (one lane; vmapped over the batch) ----
    def plan_one(p, z0, key, prev_mean):
        def rollout_score(z0, acts):  # acts (H, A)
            def step(carry, a):
                z, disc, total = carry
                r = reward_pred(p, z, a)
                z2 = next_latent(p, z, a)
                return (z2, disc * GAMMA, total + disc * r), None
            (zH, disc, total), _ = jax.lax.scan(
                step, (z0, 1.0, 0.0), acts)
            return total + disc * terminal_value(p, zH)

        def mppi_iter(carry, k):
            mean, std = carry
            eps = jax.random.normal(k, (n_samples, HORIZON, act_dim))
            acts = jnp.clip(mean[None] + std[None] * eps, -1.0, 1.0)
            # seed the pool with the policy prior's rollout
            scores = jax.vmap(lambda a: rollout_score(z0, a))(acts)
            elite_idx = jnp.argsort(scores)[-N_ELITES:]
            elite = acts[elite_idx]
            w = jax.nn.softmax(scores[elite_idx] / TEMPERATURE)
            mean = jnp.einsum("e,eha->ha", w, elite)
            std = jnp.sqrt(
                jnp.einsum("e,eha->ha", w, (elite - mean[None]) ** 2))
            std = jnp.clip(std, MIN_STD, PLAN_STD)
            return (mean, std), None

        keys = jax.random.split(key, PLAN_ITERS)
        (mean, _), _ = jax.lax.scan(
            mppi_iter, (prev_mean, jnp.full((HORIZON, act_dim), PLAN_STD)),
            keys)
        return mean

    @jax.jit
    def plan_actions(p, x, key, prev_means):
        z = encode(p, x)
        keys = jax.random.split(key, x.shape[0])
        means = jax.vmap(lambda z0, k, m: plan_one(p, z0, k, m))(
            z, keys, prev_means)
        # receding horizon: execute the first action, warm-start the rest
        nxt = jnp.concatenate(
            [means[:, 1:], jnp.zeros_like(means[:, :1])], axis=1)
        return means[:, 0], nxt

    opt = optax.adam(LR)
    opt_state = opt.init(params)

    @jax.jit
    def tdmpc_update(params, targets, opt_state, batch, key):
        def loss_fn(p):
            B = batch["obs"].shape[0]
            z_enc = jax.vmap(lambda o: encode(p, o))(batch["obs"])  # (B,H+1,L)
            # TD targets per step from the frozen critics
            a_next = policy(p, z_enc[:, 1:])            # (B,H,A)
            q_next = jnp.minimum(
                mlp(targets["q1"],
                    jnp.concatenate([z_enc[:, 1:], a_next], -1))[..., 0],
                mlp(targets["q2"],
                    jnp.concatenate([z_enc[:, 1:], a_next], -1))[..., 0])
            td_target = jax.lax.stop_gradient(
                batch["rew"] + GAMMA * q_next)            # (B,H)

            def latent_rollout(z0, acts):
                def step(z, a):
                    z2 = next_latent(p, z, a)
                    return z2, (z, z2)
                _, (zs, zs_next) = jax.lax.scan(step, z0, acts)
                return zs, zs_next  # latents before / after each action

            zs, z_next_hat = jax.vmap(latent_rollout)(
                z_enc[:, 0], batch["act"])              # (B,H,L) each
            za = jnp.concatenate([zs, batch["act"]], -1)
            r_hat = mlp(p["rew"], za)[..., 0]
            q1 = mlp(p["q1"], za)[..., 0]
            q2 = mlp(p["q2"], za)[..., 0]

            rho = RHO ** jnp.arange(HORIZON)
            consistency = jnp.mean(
                rho * jnp.mean(
                    (z_next_hat
                     - jax.lax.stop_gradient(z_enc[:, 1:])) ** 2, -1))
            reward_loss = jnp.mean(rho * (r_hat - batch["rew"]) ** 2)
            value_loss = jnp.mean(
                rho * ((q1 - td_target) ** 2 + (q2 - td_target) ** 2))
            # policy prior: maximize Q at the ENCODED states (first-step
            # latents are exact there)
            a_pi = policy(p, jax.lax.stop_gradient(z_enc[:, :-1]))
            q_pi = q_min(  # frozen critics: only the policy head learns here
                jax.lax.stop_gradient({"q1": p["q1"], "q2": p["q2"]}),
                jax.lax.stop_gradient(z_enc[:, :-1]), a_pi)
            pi_loss = -jnp.mean(rho * q_pi)
            total = (W_CONSISTENCY * consistency + W_REWARD * reward_loss
                     + W_VALUE * value_loss + pi_loss)
            return total, (consistency, reward_loss, value_loss)

        (_, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        # one bad batch must not NaN the params forever: skip non-finite grads
        ok = jnp.all(jnp.asarray([jnp.isfinite(x).all()
                                  for x in jax.tree.leaves(g)]))
        g = jax.tree.map(lambda x: jnp.where(ok, x, 0.0), g)
        upd, opt_state = opt.update(g, opt_state)
        params = optax.apply_updates(params, upd)
        targets = jax.tree.map(lambda t, s: (1 - TAU) * t + TAU * s, targets,
                               {"q1": params["q1"], "q2": params["q2"]})
        return params, targets, opt_state, aux

    buf = SegmentBuffer(4096, n_envs, obs_dim, act_dim)
    rng = np.random.default_rng(0)
    rew_trace = []
    t0 = time.time()
    env_steps = 0
    plan_means = jnp.zeros((n_envs, HORIZON, act_dim))

    def env_action(a):
        return jnp.asarray(a).reshape((n_envs,) + tuple(benv.action_space.shape))

    for it in range(args.iters):
        if (time.time() - t0) / 60.0 > args.minutes:
            print(f"wall budget reached at iter {it}", flush=True)
            break
        it_rews = []
        for _ in range(rollout_steps):
            key, sub = jax.random.split(key)
            if buf.filled < WARMUP_STEPS:
                a = jax.random.uniform(sub, (n_envs, act_dim), minval=-1.0,
                                       maxval=1.0)
            else:
                a, plan_means = plan_actions(params, x, sub, plan_means)
                a = jnp.clip(a, -1.0, 1.0)
            obs, rew, term, trunc, info = benv.step(env_action(a))
            done = np.asarray(term) | np.asarray(trunc)
            buf.add(np.asarray(x), np.asarray(a),
                    np.asarray(rew, np.float32).reshape(-1), ~done)
            if done.any():  # fresh episodes must not inherit stale plans
                plan_means = plan_means.at[jnp.asarray(
                    np.nonzero(done)[0])].set(0.0)
            it_rews.append(np.asarray(rew))
            x = flat_obs(obs, n_envs)
            env_steps += n_envs
        if buf.filled > HORIZON + 2:
            for _ in range(updates):
                key, sub = jax.random.split(key)
                batch = buf.sample_segments(rng, BATCH, HORIZON)
                params, targets, opt_state, aux = tdmpc_update(
                    params, targets, opt_state, batch, sub)
        r_mean = float(np.mean(it_rews))
        rew_trace.append(r_mean)
        msg = ""
        if buf.filled > HORIZON + 2:
            msg = (f" consistency={float(aux[0]):.4f}"
                   f" reward_mse={float(aux[1]):.4f}"
                   f" value_mse={float(aux[2]):.4f}")
        print(f"iter {it}: mean_reward={r_mean:+.5f}{msg} "
              f"env_steps={env_steps} "
              f"({env_steps / (time.time() - t0):.0f} env-steps/s)",
              flush=True)

    train_minutes = (time.time() - t0) / 60.0

    # final eval: MPC policy (planner, deterministic key) vs zero action
    metric = benv.env.metrics[0] if benv.env.metrics else None
    obs, _ = benv.reset(seed=10_000)
    x = flat_obs(obs, n_envs)

    def run_eval(policy_fn, steps):
        nonlocal obs, x, plan_means
        plan_means = jnp.zeros_like(plan_means)
        rs, ms = [], []
        for i in range(steps):
            a = policy_fn(x, i)
            obs, rew, term, trunc, info = benv.step(env_action(a))
            rs.append(np.asarray(rew))
            if metric is not None:
                ms.append(np.asarray(info[metric]))
            x = flat_obs(obs, n_envs)
        return (float(np.mean(rs)), float(np.mean(ms)) if ms else None)

    def mpc_policy(x, i):
        nonlocal plan_means
        a, plan_means = plan_actions(
            params, x, jax.random.PRNGKey(i), plan_means)
        return jnp.clip(a, -1.0, 1.0)

    pol_rew, pol_metric = run_eval(mpc_policy, args.eval_steps)
    obs, _ = benv.reset(seed=10_000)
    x = flat_obs(obs, n_envs)
    zero = jnp.zeros((n_envs, act_dim), jnp.float32)
    base_rew, base_metric = run_eval(lambda _x, _i: zero, args.eval_steps)

    k = max(3, len(rew_trace) // 5)
    result = {
        "algo": "TD-MPC",
        "env_id": args.env_id,
        "n_envs": n_envs,
        "iterations": len(rew_trace),
        "env_steps": env_steps,
        "wall_minutes": train_minutes,
        "horizon": HORIZON,
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
