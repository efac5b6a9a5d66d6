"""MA-PPO (shared policy) on a MARL env, updates fully on-device.

The reference trains MA-PPO/MA-SAC through its SB3 agents-as-envs
pseudo-vectorization (each agent becomes one SB3 env row).  Here the same
trick runs on-device: ``BatchedFluidEnv`` with ``use_marl=True`` exposes
``n_envs * n_agents`` observation/action rows that share one policy, and
one vmapped device step advances every env.  Per-agent rewards come from
the env's local reward decomposition; ``global_reward`` stays in info.

Scaled-down RBC heater control (each heater is an agent observing a local
window) so the script runs in minutes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fluidgym_tpu.parallel import BatchedFluidEnv

N_ENVS = 4
ROLLOUT_STEPS = 8
ITERATIONS = 3
PPO_EPOCHS = 4
CLIP = 0.2
GAMMA = 0.99
LAM = 0.95
LR = 3e-4
HIDDEN = 64

benv = BatchedFluidEnv(
    "RBC2D-easy-v0", n_envs=N_ENVS, use_marl=True, n_heaters=4, resolution=6,
    local_obs_window=3, load_initial_domain=False,
    load_domain_statistics=False, randomize_initial_state=False,
    episode_length=10**9, step_length=0.5,
)
obs, _ = benv.reset(seed=0)
N_AGENTS = benv.n_agents
ROWS = N_ENVS * N_AGENTS
obs_dim = int(np.prod(obs["temperature"].shape[1:]))
act_dim = int(np.prod(benv.action_space.shape))
print(f"{N_AGENTS} agents x {N_ENVS} envs = {ROWS} policy rows, "
      f"obs_dim={obs_dim}, act_dim={act_dim}")


def init_params(key):
    k1, k2, k3 = jax.random.split(key, 3)
    s = lambda k, i, o: jax.random.normal(k, (i, o)) * (2.0 / i) ** 0.5
    return {
        "w1": s(k1, obs_dim, HIDDEN), "b1": jnp.zeros(HIDDEN),
        "wp": s(k2, HIDDEN, act_dim) * 0.01, "bp": jnp.zeros(act_dim),
        "wv": s(k3, HIDDEN, 1) * 0.01, "bv": jnp.zeros(1),
        "log_std": jnp.full((act_dim,), -0.5),
    }


def forward(params, x):
    h = jnp.tanh(x @ params["w1"] + params["b1"])
    mean = jnp.tanh(h @ params["wp"] + params["bp"])
    value = (h @ params["wv"] + params["bv"])[..., 0]
    return mean, params["log_std"], value


def logp_gaussian(mean, log_std, a):
    var = jnp.exp(2 * log_std)
    return jnp.sum(-0.5 * ((a - mean) ** 2 / var + 2 * log_std
                           + jnp.log(2 * jnp.pi)), axis=-1)


@jax.jit
def act(params, x, key):
    mean, log_std, value = forward(params, x)
    a = mean + jnp.exp(log_std) * jax.random.normal(key, mean.shape)
    return a, logp_gaussian(mean, log_std, a), value


@jax.jit
def ppo_update(params, opt_state, batch):
    def loss_fn(p):
        mean, log_std, value = forward(p, batch["obs"])
        logp = logp_gaussian(mean, log_std, batch["act"])
        ratio = jnp.exp(logp - batch["logp"])
        adv = batch["adv"]
        pg = -jnp.minimum(ratio * adv,
                          jnp.clip(ratio, 1 - CLIP, 1 + CLIP) * adv).mean()
        vloss = jnp.mean((value - batch["ret"]) ** 2)
        return pg + 0.5 * vloss, (pg, vloss)

    (loss, (pg, vloss)), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, opt_state = opt.update(g, opt_state)
    return optax.apply_updates(params, updates), opt_state, pg, vloss


def flat_obs(o):
    return jnp.asarray(o["temperature"]).reshape(ROWS, -1)


opt = optax.adam(LR)
key = jax.random.PRNGKey(0)
params = init_params(key)
opt_state = opt.init(params)

for it in range(ITERATIONS):
    buf = {k: [] for k in ("obs", "act", "logp", "rew", "val")}
    obs, _ = benv.reset(seed=it)
    x = flat_obs(obs)
    for t in range(ROLLOUT_STEPS):
        key, sub = jax.random.split(key)
        a, logp, v = act(params, x, sub)
        a_env = jnp.clip(a, -1, 1).reshape(
            (ROWS,) + tuple(benv.action_space.shape))
        obs, rew, term, trunc, info = benv.step(a_env)   # rew: per-agent rows
        for k, val in zip(buf, (x, a, logp,
                                jnp.asarray(rew).reshape(ROWS), v)):
            buf[k].append(val)
        x = flat_obs(obs)
    _, _, last_v = act(params, x, key)

    rews = jnp.stack(buf["rew"])          # (T, ROWS)
    vals = jnp.stack(buf["val"] + [last_v])
    adv = jnp.zeros_like(rews)
    gae = jnp.zeros(ROWS)
    for t in reversed(range(ROLLOUT_STEPS)):
        delta = rews[t] + GAMMA * vals[t + 1] - vals[t]
        gae = delta + GAMMA * LAM * gae
        adv = adv.at[t].set(gae)
    ret = adv + vals[:-1]
    adv = (adv - adv.mean()) / (adv.std() + 1e-8)

    batch = {
        "obs": jnp.concatenate(buf["obs"]),
        "act": jnp.concatenate(buf["act"]),
        "logp": jnp.concatenate(buf["logp"]),
        "adv": adv.reshape(-1),
        "ret": ret.reshape(-1),
    }
    for _ in range(PPO_EPOCHS):
        params, opt_state, pg, vloss = ppo_update(params, opt_state, batch)
    gr = info.get("global_reward")
    gr_s = f" global_reward={float(np.asarray(gr).mean()):+.4f}" \
        if gr is not None else ""
    print(f"iter {it}: mean_agent_reward={float(rews.mean()):+.4f}"
          f"{gr_s} pg_loss={float(pg):+.4f} v_loss={float(vloss):.4f}")

print("done")
