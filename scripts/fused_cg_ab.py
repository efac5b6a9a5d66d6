"""A/B the fused whole-solve CG kernel vs the XLA loop on the real TPU.

Measures batched RBC2D env-steps/s and state agreement after 20 steps.
Run: PYTHONPATH=/root/repo python scripts/fused_cg_ab.py
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


import fluidgym_tpu
from fluidgym_tpu.ops import cg_pallas

BATCH = 32


def run(enabled, steps=20):
    cg_pallas.set_fused_cg(enabled)
    env = fluidgym_tpu.make("RBC2D-easy-v0", load_initial_domain=True,
                            episode_length=10**9)
    env.reset(seed=0)
    carry = env._pure_carry()
    bcarry = jax.tree.map(lambda a: jnp.broadcast_to(a, (BATCH,) + a.shape), carry)
    nact = env.action_space.shape[0]
    bact = jnp.zeros((BATCH, nact), jnp.float32)
    fn = jax.jit(jax.vmap(env._pure_step))
    carry2, obs, rew, info = fn(bcarry, bact)  # compile
    jax.block_until_ready(rew)
    t0 = time.perf_counter()
    c = bcarry
    for _ in range(steps):
        c, obs, rew, info = fn(c, bact)
    jax.block_until_ready(rew)
    dt = (time.perf_counter() - t0) / steps
    return c, float(jnp.mean(rew)), BATCH / dt


c_off, rew_off, sps_off = run(False)
c_on, rew_on, sps_on = run(True)
diffs = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), c_off, c_on)
maxdiff = max(jax.tree.leaves(diffs) or [0.0])
print(json.dumps({"sps_xla": round(sps_off, 2), "sps_fused": round(sps_on, 2),
                  "speedup": round(sps_on / sps_off, 3),
                  "mean_rew_xla": rew_off, "mean_rew_fused": rew_on,
                  "max_state_diff": maxdiff}))
