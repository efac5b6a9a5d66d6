"""SAC on the batched env, critic/actor updates fully on-device.

The reference reports SAC learning curves trained through its SB3
integration (one CUDA env, CPU policy updates).  Here rollouts come from
``BatchedFluidEnv`` (one vmapped device step for all envs) and the SAC
update — twin soft Q critics, tanh-Gaussian actor, automatic entropy
temperature — is a single jitted optax step over a device-resident replay
buffer.

Scaled-down RBC heater control so the script runs in minutes; raise
N_ENVS / STEPS / BUFFER for real training.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fluidgym_tpu.parallel import BatchedFluidEnv

N_ENVS = 8
STEPS = 24            # env steps collected (x N_ENVS transitions)
WARMUP = 8            # random-action steps before learning
BATCH = 64
BUFFER = 4096
HIDDEN = 64
GAMMA = 0.99
TAU = 0.01
LR = 3e-4

benv = BatchedFluidEnv(
    "RBC2D-easy-v0", n_envs=N_ENVS, n_heaters=4, resolution=6,
    local_obs_window=3, load_initial_domain=False,
    load_domain_statistics=False, randomize_initial_state=False,
    episode_length=10**9, step_length=0.5,
)
obs, _ = benv.reset(seed=0)
obs_dim = int(np.prod(obs["temperature"].shape[1:]))
act_dim = int(np.prod(benv.action_space.shape))
target_entropy = -float(act_dim)


def mlp_init(key, sizes):
    params = []
    for i, (m, n) in enumerate(zip(sizes[:-1], sizes[1:])):
        key, sub = jax.random.split(key)
        params.append((jax.random.normal(sub, (m, n)) * (2.0 / m) ** 0.5,
                       jnp.zeros(n)))
    return params


def mlp(params, x):
    for w, b in params[:-1]:
        x = jnp.tanh(x @ w + b)
    w, b = params[-1]
    return x @ w + b


def init_state(key):
    ka, k1, k2 = jax.random.split(key, 3)
    actor = mlp_init(ka, (obs_dim, HIDDEN, HIDDEN, 2 * act_dim))
    q1 = mlp_init(k1, (obs_dim + act_dim, HIDDEN, HIDDEN, 1))
    q2 = mlp_init(k2, (obs_dim + act_dim, HIDDEN, HIDDEN, 1))
    return {"actor": actor, "q1": q1, "q2": q2,
            "q1_t": jax.tree.map(jnp.copy, q1),
            "q2_t": jax.tree.map(jnp.copy, q2),
            "log_alpha": jnp.zeros(())}


def sample_action(actor, x, key):
    out = mlp(actor, x)
    mean, log_std = out[..., :act_dim], out[..., act_dim:]
    log_std = jnp.clip(log_std, -5.0, 2.0)
    eps = jax.random.normal(key, mean.shape)
    pre = mean + jnp.exp(log_std) * eps
    a = jnp.tanh(pre)
    # log prob with tanh change of variables
    logp = jnp.sum(-0.5 * (eps**2 + 2 * log_std + jnp.log(2 * jnp.pi))
                   - jnp.log(1 - a**2 + 1e-6), axis=-1)
    return a, logp


def q_val(q, x, a):
    return mlp(q, jnp.concatenate([x, a], axis=-1))[..., 0]


opt = optax.adam(LR)


@jax.jit
def sac_update(state, opts, batch, key):
    k1, k2 = jax.random.split(key)
    alpha = jnp.exp(state["log_alpha"])

    a_next, logp_next = sample_action(state["actor"], batch["next_obs"], k1)
    q_next = jnp.minimum(q_val(state["q1_t"], batch["next_obs"], a_next),
                         q_val(state["q2_t"], batch["next_obs"], a_next))
    target = batch["rew"] + GAMMA * (q_next - alpha * logp_next)
    target = jax.lax.stop_gradient(target)

    def critic_loss(q1, q2):
        l1 = jnp.mean((q_val(q1, batch["obs"], batch["act"]) - target) ** 2)
        l2 = jnp.mean((q_val(q2, batch["obs"], batch["act"]) - target) ** 2)
        return l1 + l2

    closs, gq = jax.value_and_grad(critic_loss, argnums=(0, 1))(
        state["q1"], state["q2"])
    for name, g in zip(("q1", "q2"), gq):
        upd, opts[name] = opt.update(g, opts[name])
        state[name] = optax.apply_updates(state[name], upd)

    def actor_loss(actor):
        a, logp = sample_action(actor, batch["obs"], k2)
        q = jnp.minimum(q_val(state["q1"], batch["obs"], a),
                        q_val(state["q2"], batch["obs"], a))
        return jnp.mean(alpha * logp - q), logp

    (aloss, logp), ga = jax.value_and_grad(actor_loss, has_aux=True)(
        state["actor"])
    upd, opts["actor"] = opt.update(ga, opts["actor"])
    state["actor"] = optax.apply_updates(state["actor"], upd)

    def alpha_loss(log_alpha):
        return -jnp.mean(jnp.exp(log_alpha)
                         * jax.lax.stop_gradient(logp + target_entropy))

    lloss, gl = jax.value_and_grad(alpha_loss)(state["log_alpha"])
    upd, opts["alpha"] = opt.update(gl, opts["alpha"])
    state["log_alpha"] = optax.apply_updates(state["log_alpha"], upd)

    for name in ("q1", "q2"):
        state[name + "_t"] = jax.tree.map(
            lambda t, s: (1 - TAU) * t + TAU * s,
            state[name + "_t"], state[name])
    return state, opts, closs, aloss


def flat_obs(o):
    return jnp.asarray(o["temperature"]).reshape(N_ENVS, -1)


key = jax.random.PRNGKey(0)
state = init_state(key)
opts = {n: opt.init(state[n]) for n in ("actor", "q1", "q2")}
opts["alpha"] = opt.init(state["log_alpha"])

# device-resident ring buffer
buf = {
    "obs": jnp.zeros((BUFFER, obs_dim)),
    "act": jnp.zeros((BUFFER, act_dim)),
    "rew": jnp.zeros((BUFFER,)),
    "next_obs": jnp.zeros((BUFFER, obs_dim)),
}
n_in_buf = 0

x = flat_obs(obs)
for t in range(STEPS):
    key, ka, kb = jax.random.split(key, 3)
    if t < WARMUP:
        a = jax.random.uniform(ka, (N_ENVS, act_dim), minval=-1, maxval=1)
    else:
        a, _ = sample_action(state["actor"], x, ka)
    a_env = a.reshape((N_ENVS,) + tuple(benv.action_space.shape))
    obs, rew, term, trunc, info = benv.step(a_env)
    x_next = flat_obs(obs)
    idx = (jnp.arange(N_ENVS) + t * N_ENVS) % BUFFER
    for k, v in (("obs", x), ("act", a), ("rew", jnp.asarray(rew)),
                 ("next_obs", x_next)):
        buf[k] = buf[k].at[idx].set(v)
    n_in_buf = min(n_in_buf + N_ENVS, BUFFER)
    x = x_next

    if t >= WARMUP:
        sel = jax.random.randint(kb, (BATCH,), 0, n_in_buf)
        batch = {k: v[sel] for k, v in buf.items()}
        key, ku = jax.random.split(key)
        state, opts, closs, aloss = sac_update(state, opts, batch, ku)
        if (t + 1) % 4 == 0:
            print(f"step {t + 1}: mean_reward={float(jnp.mean(rew)):+.4f} "
                  f"q_loss={float(closs):.4f} pi_loss={float(aloss):+.4f} "
                  f"alpha={float(jnp.exp(state['log_alpha'])):.3f}")

print("done")
