"""Differentiable-physics control (DPC) on the real TPU.

Two modes, both differentiating end-to-end through the solver (implicit-
function solve VJPs; the reference demonstrates the same mechanism through
its CUDA autograd backend, examples/interfaces/gradient_based_methods.py,
and reports DPC training "with a significant reduction in training time"
vs RL):

* ``--mode open``   — optimize an open-loop action schedule on one start
  state by direct gradient descent on the mean reward over the horizon.
* ``--mode policy`` — train a closed-loop MLP policy by truncated BPTT
  through batched rollouts, then evaluate it closed-loop on a HELD-OUT
  start state over a longer horizon against the zero-action baseline.

  Policy mode uses *persistent* truncated BPTT: each training lane's state
  carries over between optimizer iterations (with stop_gradient at the
  truncation boundary) and one lane is re-seeded to its initial state per
  iteration, so the training distribution covers both the reset transient
  and the long-horizon states the policy actually visits closed-loop —
  without this, short-horizon BPTT from fixed reset states overfits a
  10-step window and degrades held-out long rollouts.  Each env step in
  the scan is rematerialized (``jax.checkpoint``) so the backward pass
  recomputes solver internals instead of storing them, keeping HBM flat
  in the horizon length.

Run (TPU):  PYTHONPATH=/root/repo:/root/.axon_site python -u \
                scripts/control_dpc_tpu.py --mode policy [--iters 40]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np
import optax

import fluidgym_tpu

HIDDEN = 64


def flat_obs(obs: dict) -> jnp.ndarray:
    return jnp.concatenate([jnp.ravel(obs[k]) for k in sorted(obs)])


def make_env(args):
    kw = dict(differentiable=True, episode_length=10**9)
    if args.dev:
        kw.update(n_heaters=4, resolution=4, load_initial_domain=False,
                  load_domain_statistics=False, randomize_initial_state=False,
                  step_length=0.1, dt=0.05)
    return fluidgym_tpu.make(args.env_id, **kw)


def run_open_loop(env, args) -> dict:
    env.reset(seed=0)
    carry0 = jax.tree.map(jax.lax.stop_gradient, env._pure_carry())
    act_shape = tuple(env.action_space.shape)
    metric = env.metrics[0]
    H = args.horizon

    def rollout(schedule, carry):
        def body(c, a):
            c, _obs, r, info = env._pure_step(c, a)
            return c, (r, info[metric])
        _, (rs, ms) = jax.lax.scan(body, carry, schedule)
        return jnp.mean(rs), jnp.mean(ms)

    grad_fn = jax.jit(jax.value_and_grad(
        lambda s: rollout(s, carry0), has_aux=True))

    schedule = jnp.zeros((H,) + act_shape, jnp.float32)
    (zero_rew, zero_metric), _ = grad_fn(schedule)
    print(f"uncontrolled: mean_reward={float(zero_rew):+.5f} "
          f"mean_{metric}={float(zero_metric):.5f}", flush=True)

    opt = optax.adam(args.lr)
    opt_state = opt.init(schedule)
    trace = []
    t0 = time.time()
    final_metric = float(zero_metric)
    for it in range(args.iters):
        (rew, m), g = grad_fn(schedule)
        upd, opt_state = opt.update(jax.tree.map(lambda x: -x, g), opt_state)
        schedule = jnp.clip(optax.apply_updates(schedule, upd), -1.0, 1.0)
        trace.append(float(rew))
        final_metric = float(m)
        print(f"iter {it}: mean_reward={float(rew):+.5f} "
              f"mean_{metric}={float(m):.5f} ({time.time() - t0:.0f}s)",
              flush=True)

    return {
        "mode": "open",
        "horizon": H,
        "iterations": args.iters,
        "wall_minutes": (time.time() - t0) / 60.0,
        "uncontrolled_mean_reward": float(zero_rew),
        f"uncontrolled_mean_{metric}": float(zero_metric),
        "optimized_mean_reward": trace[-1],
        f"optimized_mean_{metric}": final_metric,
        "improvement": trace[-1] - float(zero_rew),
        "trace": trace,
    }


def run_policy_bptt(env, args) -> dict:
    """Closed-loop DPC: MLP policy trained by gradients through rollouts."""
    metric = env.metrics[0]
    act_shape = tuple(env.action_space.shape)
    act_dim = int(np.prod(act_shape))
    zero_a = jnp.zeros(act_shape, jnp.float32)

    def collect_carry(seed):
        env.reset(seed=seed)
        return jax.tree.map(jax.lax.stop_gradient, env._pure_carry())

    train_carries = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[collect_carry(s) for s in range(args.n_starts)])
    eval_carry = collect_carry(1000 + args.n_starts)

    # one zero-action step produces the first observation generically
    # (works for envs whose carry is not just the domain state)
    def with_obs(carry):
        c, obs, _r, _ = env._pure_step(carry, zero_a)
        return c, flat_obs(obs)

    obs_dim = int(with_obs(eval_carry)[1].shape[0])

    def init_params(key):
        k1, _ = jax.random.split(key)
        lim1 = (6.0 / (obs_dim + HIDDEN)) ** 0.5
        return {
            "w1": jax.random.uniform(k1, (obs_dim, HIDDEN), minval=-lim1,
                                     maxval=lim1),
            "b1": jnp.zeros(HIDDEN),
            # zero output layer: the initial policy IS the zero-action
            # baseline, so training ascends locally from the uncontrolled
            # flow instead of first wrecking the persistent lane states
            # with random jets (which the lift penalty punishes for many
            # iterations on the cylinder)
            "w2": jnp.zeros((HIDDEN, act_dim)),
            "b2": jnp.zeros(act_dim),
        }

    def policy(p, x):
        h = jnp.tanh(x @ p["w1"] + p["b1"])
        return jnp.tanh(h @ p["w2"] + p["b2"]).reshape(act_shape)

    def rollout(p, carry, steps):
        # remat each step: backward recomputes the PISO solve instead of
        # storing its intermediates -> HBM is O(1) in the horizon length
        @jax.checkpoint
        def body(cx, _):
            c, x = cx
            a = policy(p, x)
            c, obs, r, info = env._pure_step(c, a)
            return (c, flat_obs(obs)), (r, info[metric])
        cx = with_obs(carry)
        (c_fin, _), (rs, ms) = jax.lax.scan(body, cx, None, length=steps)
        return jnp.mean(rs), jnp.mean(ms), c_fin

    def loss_fn(p, carries):
        rews, ms, c_fin = jax.vmap(
            lambda c: rollout(p, c, args.horizon))(carries)
        return -jnp.mean(rews), (jnp.mean(ms), c_fin)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))

    @jax.jit
    def eval_policy(p):
        r, m, _ = rollout(p, eval_carry, args.eval_steps)
        return r, m

    @jax.jit
    def reseed_lane(carries, lane):
        """Reset one training lane to its initial start state."""
        return jax.tree.map(
            lambda buf, init: buf.at[lane].set(init[lane]),
            carries, train_carries)

    @jax.jit
    def eval_zero():
        def body(c, _):
            c, _obs, r, info = env._pure_step(c, zero_a)
            return c, (r, info[metric])
        _, (rs, ms) = jax.lax.scan(body, eval_carry, None,
                                   length=args.eval_steps)
        return jnp.mean(rs), jnp.mean(ms)

    base_rew, base_metric = (float(x) for x in eval_zero())
    print(f"held-out uncontrolled ({args.eval_steps} steps): "
          f"mean_reward={base_rew:+.5f} mean_{metric}={base_metric:.5f}",
          flush=True)

    params = init_params(jax.random.PRNGKey(args.seed))
    # clip BPTT gradients: through convectively-unstable flows (cylinder
    # wake) the rollout Jacobian grows exponentially in the horizon, and
    # un-clipped Adam steps destabilize the policy (observed: drag 3.27 ->
    # 4.2 within 8 iterations); diffusive flows (RBC) train fine either way
    opt = optax.chain(optax.clip_by_global_norm(args.clip), optax.adam(args.lr))
    opt_state = opt.init(params)
    trace, eval_trace = [], []
    carries = train_carries
    t0 = time.time()
    for it in range(args.iters):
        (loss, (m, c_fin)), g = grad_fn(params, carries)
        upd, opt_state = opt.update(g, opt_state)
        params = optax.apply_updates(params, upd)
        if not args.no_persist:
            # persistent truncated BPTT: next window continues from where
            # this one ended (truncation boundary = stop_gradient), with a
            # round-robin re-seed so the reset transient stays in
            # distribution
            carries = jax.tree.map(jax.lax.stop_gradient, c_fin)
            carries = reseed_lane(carries, it % args.n_starts)
        trace.append(-float(loss))
        msg = (f"iter {it}: train_mean_reward={-float(loss):+.5f} "
               f"mean_{metric}={float(m):.5f}")
        if args.eval_every and (it + 1) % args.eval_every == 0:
            er, em = (float(x) for x in eval_policy(params))
            eval_trace.append({"iter": it, "reward": er, metric: em})
            msg += f" heldout_reward={er:+.5f} heldout_{metric}={em:.5f}"
        print(f"{msg} ({time.time() - t0:.0f}s)", flush=True)
    train_minutes = (time.time() - t0) / 60.0

    pol_rew, pol_metric = (float(x) for x in eval_policy(params))
    print(f"held-out policy ({args.eval_steps} steps): "
          f"mean_reward={pol_rew:+.5f} mean_{metric}={pol_metric:.5f}",
          flush=True)

    return {
        "mode": "policy",
        "horizon": args.horizon,
        "n_starts": args.n_starts,
        "iterations": args.iters,
        "train_wall_minutes": train_minutes,
        "eval_steps": args.eval_steps,
        "heldout_uncontrolled_mean_reward": base_rew,
        f"heldout_uncontrolled_mean_{metric}": base_metric,
        "heldout_policy_mean_reward": pol_rew,
        f"heldout_policy_mean_{metric}": pol_metric,
        "improvement": pol_rew - base_rew,
        "persistent_bptt": not args.no_persist,
        "train_trace": trace,
        "eval_trace": eval_trace,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--env-id", default="RBC2D-easy-v0")
    ap.add_argument("--mode", choices=("open", "policy"), default="open")
    ap.add_argument("--horizon", type=int, default=10)
    ap.add_argument("--iters", type=int, default=25)
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--n-starts", type=int, default=4,
                    help="policy mode: batched training start states")
    ap.add_argument("--eval-steps", type=int, default=60,
                    help="policy mode: held-out closed-loop eval horizon")
    ap.add_argument("--eval-every", type=int, default=0,
                    help="policy mode: held-out eval cadence during "
                         "training (0 = final only)")
    ap.add_argument("--clip", type=float, default=1.0,
                    help="policy mode: global-norm gradient clip")
    ap.add_argument("--no-persist", action="store_true",
                    help="policy mode: disable persistent truncated BPTT "
                         "(train every window from the fixed reset states)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--dev", action="store_true",
                    help="tiny CPU smoke-test configuration")
    args = ap.parse_args()

    env = make_env(args)
    run = run_policy_bptt if args.mode == "policy" else run_open_loop
    result = {"env_id": args.env_id, **run(env, args)}
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
