"""Tiny evolution-strategies training loop on the batched env.

Demonstrates the intended TPU training workflow end to end: a population of
linear policies evaluated in one vmapped device step per env-step via
``BatchedFluidEnv`` (no per-env processes), antithetic ES gradient estimate,
and a measurable reward improvement on RBC heater control within a few
generations.
"""

import numpy as np

from fluidgym_tpu.parallel import BatchedFluidEnv

N_ENVS = 8          # population size (antithetic pairs)
GENERATIONS = 4
EP_STEPS = 4
SIGMA = 0.1
LR = 0.5

benv = BatchedFluidEnv("RBC2D-easy-v0", n_envs=N_ENVS,
                       load_initial_domain=False, load_domain_statistics=False,
                       randomize_initial_state=False, episode_length=EP_STEPS)
obs, _ = benv.reset(seed=0)
obs_dim = int(np.prod(obs["temperature"].shape[1:]))
act_dim = int(np.prod(benv.action_space.shape))
rng = np.random.default_rng(0)
theta = np.zeros((obs_dim, act_dim), np.float32)


def flat_obs(o):
    return np.asarray(o["temperature"]).reshape(N_ENVS, -1)


for gen in range(GENERATIONS):
    eps = rng.normal(size=(N_ENVS // 2, obs_dim, act_dim)).astype(np.float32)
    perturb = np.concatenate([eps, -eps], axis=0)  # antithetic
    thetas = theta[None] + SIGMA * perturb

    obs, _ = benv.reset(seed=0)
    returns = np.zeros(N_ENVS, np.float32)
    for _ in range(EP_STEPS):
        x = flat_obs(obs)
        actions = np.einsum("ni,nia->na", x, thetas).reshape(
            (N_ENVS,) + tuple(benv.action_space.shape))
        actions = np.clip(actions, -1.0, 1.0)
        obs, rewards, term, trunc, info = benv.step(actions)
        returns += np.asarray(rewards)

    adv = (returns - returns.mean()) / (returns.std() + 1e-8)
    grad = np.einsum("n,nia->ia", adv, perturb) / (N_ENVS * SIGMA)
    theta = theta + LR * grad
    print(f"gen {gen}: mean return {returns.mean():.4f} "
          f"best {returns.max():.4f}")
