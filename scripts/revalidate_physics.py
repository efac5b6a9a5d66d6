"""Re-validate TCF statistics and cylinder resolution convergence under the
current solver defaults (warm-started deflation-corrected pressure solves).

Runs serially on the TPU; prints one summary line per study.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


import fluidgym_tpu

KW = dict(load_initial_domain=False, load_domain_statistics=False,
          randomize_initial_state=False, episode_length=10**9)


def tcf_study():
    env = fluidgym_tpu.make("TCFSmall3D-bottom-easy-v0", use_marl=False, **KW)
    env.reset(seed=0)
    fn = jax.jit(env._pure_step)
    state = env._state
    action = jnp.zeros_like(env._zero_action)
    t0 = time.time()
    # burn-in 500 steps (t = 300), then accumulate wall-normal profiles
    for i in range(500):
        state, *_ = fn(state, action)
    jax.block_until_ready(state)
    print(f"tcf burn-in done {time.time()-t0:.0f}s", flush=True)

    geoms = env._geoms
    n_stat = 1000
    up2_sum = None
    u_sum = None
    tau_sum = 0.0
    for i in range(n_stat):
        state, *rest = fn(state, action)
        if i % 10 == 9:
            u = state.blocks[0].velocity[0]      # (z, y, x) streamwise
            u_prof = u.mean(axis=(0, 2))         # (y,)
            u2_prof = (u * u).mean(axis=(0, 2))
            u_sum = u_prof if u_sum is None else u_sum + u_prof
            up2_sum = u2_prof if up2_sum is None else up2_sum + u2_prof
            tau_sum += float(np.asarray(rest[-1]["wall_stress_bottom"]).reshape(-1)[0])
    n_s = n_stat // 10
    u_mean = np.asarray(u_sum) / n_s
    u2_mean = np.asarray(up2_sum) / n_s
    up = np.sqrt(np.maximum(u2_mean - u_mean ** 2, 0.0))
    tau = tau_sum / n_s
    u_tau = np.sqrt(abs(tau))
    # wall-normal coords
    yc = np.asarray(geoms[0].centers[1]).mean(axis=(0, 2))
    nu = float(np.asarray(state.viscosity))
    re_tau = u_tau * 1.0 / nu
    print(f"TCF: u_tau={u_tau:.4f} Re_tau={re_tau:.0f} "
          f"u'+max={up.max()/max(u_tau,1e-12):.2f} "
          f"U+cl={u_mean[len(u_mean)//2]/max(u_tau,1e-12):.1f} "
          f"(DNS Re180: u'+~2.7, U+cl~18.3)", flush=True)


def cylinder_res(res, n_steps=2000):
    env = fluidgym_tpu.make("CylinderJet2D-easy-v0", resolution=res,
                            step_length=0.05, **KW)
    env.reset(seed=0)
    fn = jax.jit(env._pure_step)
    state = (env._state, env._last_control)
    action = jnp.zeros((1,), jnp.float32)
    drags = np.zeros(n_steps); lifts = np.zeros(n_steps)
    t0 = time.time()
    for i in range(n_steps):
        state, obs, rew, info = fn(state, action)
        drags[i] = float(np.asarray(info["drag"]).reshape(()))
        lifts[i] = float(np.asarray(info["lift"]).reshape(()))
        if not np.isfinite(drags[i]):
            print(f"res={res}: DIVERGED at {i}", flush=True)
            return
    sl = slice(n_steps // 2, n_steps)
    cl = lifts[sl]; cd = drags[sl]
    f = np.fft.rfftfreq(len(cl), d=0.05)
    P = np.abs(np.fft.rfft(cl - cl.mean())) ** 2
    St = f[1:][np.argmax(P[1:])]
    print(f"cylinder res={res}: cd={cd.mean():.3f} "
          f"[{cd.min():.3f},{cd.max():.3f}] cl_rms={np.sqrt((cl**2).mean()):.3f} "
          f"St={St:.3f} ({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    tcf_study()
    cylinder_res(32)
    cylinder_res(48)
