"""Long-horizon physics check of pressure warm-start on the cylinder:
mean drag, lift rms, Strouhal over t in [50, 100] (cold-start reference:
cd 3.245, cl_rms 0.83, St 0.27 at resolution 24 -- VALIDATION.md)."""

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


import fluidgym_tpu

ENV_KW = dict(
    load_initial_domain=False,
    load_domain_statistics=False,
    randomize_initial_state=False,
    episode_length=10**9,
)

WARM = (sys.argv[1] if len(sys.argv) > 1 else "warm")
if WARM == "cold": WARM = False
TOL = float(sys.argv[2]) if len(sys.argv) > 2 else None


def main():
    env = fluidgym_tpu.make("CylinderJet2D-easy-v0", step_length=0.05, **ENV_KW)
    orig = env._get_simulation
    over = dict(pressure_warm_start=(WARM is not False),
            pressure_deflation=(WARM == "warmdefl"))
    if TOL is not None:
        over["pressure_tol"] = TOL
    env._get_simulation = lambda: dataclasses.replace(orig(), **over)
    env.reset(seed=0)
    fn = jax.jit(env._pure_step)
    state = (env._state, env._last_control)
    action = jnp.zeros((1,), jnp.float32)
    N = 2000
    drags = np.zeros(N)
    lifts = np.zeros(N)
    t0 = time.time()
    for i in range(N):
        state, obs, rew, info = fn(state, action)
        drags[i] = float(np.asarray(info["drag"]))
        lifts[i] = float(np.asarray(info["lift"]))
        if i % 200 == 199:
            print(f"step={i+1} t={(i+1)*0.05:.0f} cd={drags[i]:.4f} "
                  f"cl={lifts[i]:.4f} ({time.time()-t0:.0f}s)", flush=True)
            if not np.isfinite(drags[i]):
                print("DIVERGED", flush=True)
                return
    sl = slice(1000, 2000)  # t in [50, 100]
    cd = drags[sl]
    cl = lifts[sl]
    f = np.fft.rfftfreq(1000, d=0.05)
    P = np.abs(np.fft.rfft(cl - cl.mean())) ** 2
    St = f[1:][np.argmax(P[1:])]
    print(f"warm={WARM} tol={TOL}: cd_mean={cd.mean():.4f} "
          f"cd_range=[{cd.min():.3f},{cd.max():.3f}] "
          f"cl_rms={np.sqrt((cl**2).mean()):.3f} St={St:.3f}", flush=True)


if __name__ == "__main__":
    main()
