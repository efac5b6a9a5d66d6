"""Batch-size scaling curve at developed flow (VERDICT round-1 weak #2).

Round-1 measured 461 env-steps/s @128 -> 277 @256 -> 219 @512 (lockstep CG
paid max-over-envs iterations).  Round 2 added per-lane freeze masking in
linsolve.cg; this records the curve after the fix.

Run (TPU): PYTHONPATH=/root/repo python -u scripts/batch_curve.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

import fluidgym_tpu
from fluidgym_tpu.core.domain_io import load_domain

KW = dict(load_initial_domain=False, load_domain_statistics=False,
          randomize_initial_state=False, episode_length=10**9)
RES = 24
BATCHES = (64, 128, 256, 512)
N_MEASURE = 8


def main() -> None:
    env = fluidgym_tpu.make("CylinderJet2D-easy-v0", resolution=RES, **KW)
    env.reset(seed=0)
    topo, _g, state = load_domain(
        REPO / "bench_assets" / f"cyl2d_res{RES}_developed", dtype=env._dtype)
    assert topo == env._topo
    env._state = state
    carry = env._pure_carry()
    step = jax.vmap(env._pure_step)
    fn = jax.jit(step)

    rows = {}
    for batch in BATCHES:
        bcarry = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (batch,) + a.shape), carry)
        # decorrelate the lanes: different random actions for a few steps so
        # the per-lane iteration counts genuinely differ (the round-1 curve's
        # regime), then measure with zero actions
        rng = np.random.default_rng(0)
        c = bcarry
        for _ in range(4):
            a = jnp.asarray(rng.uniform(-1, 1, (batch, 1)), jnp.float32)
            c, *_ = fn(c, a)
        a0 = jnp.zeros((batch, 1), jnp.float32)
        c, *_ = fn(c, a0)
        jax.block_until_ready(jax.tree.leaves(c)[0])
        t0 = time.perf_counter()
        for _ in range(N_MEASURE):
            c, *_ = fn(c, a0)
        jax.block_until_ready(jax.tree.leaves(c)[0])
        dt = (time.perf_counter() - t0) / N_MEASURE
        rows[batch] = round(batch / dt, 2)
        print(f"batch {batch}: {rows[batch]} env-steps/s", flush=True)

    # chunked lockstep (BatchedFluidEnv lockstep_chunk): independent groups
    # of 128 inside one scanned program -- each group waits only for its own
    # worst lane
    chunk_rows = {}
    for batch in (b for b in BATCHES if b > 128):
        n_chunks = batch // 128
        vstep = jax.vmap(env._pure_step)

        def chunked(bstate, actions):
            split = lambda x: x.reshape((n_chunks, 128) + x.shape[1:])
            merge = lambda x: x.reshape((batch,) + x.shape[2:])
            xs = (jax.tree.map(split, bstate), jax.tree.map(split, actions))
            _, out = jax.lax.scan(lambda _, sa: (None, vstep(*sa)), None, xs)
            return jax.tree.map(merge, out)

        cfn = jax.jit(chunked)
        bcarry = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (batch,) + a.shape), carry)
        rng = np.random.default_rng(0)
        c = bcarry
        for _ in range(4):
            a = jnp.asarray(rng.uniform(-1, 1, (batch, 1)), jnp.float32)
            c, *_ = cfn(c, a)
        a0 = jnp.zeros((batch, 1), jnp.float32)
        c, *_ = cfn(c, a0)
        jax.block_until_ready(jax.tree.leaves(c)[0])
        t0 = time.perf_counter()
        for _ in range(N_MEASURE):
            c, *_ = cfn(c, a0)
        jax.block_until_ready(jax.tree.leaves(c)[0])
        dt = (time.perf_counter() - t0) / N_MEASURE
        chunk_rows[batch] = round(batch / dt, 2)
        print(f"batch {batch} (chunk 128): {chunk_rows[batch]} env-steps/s",
              flush=True)

    per_env = {b: round(v / b, 3) for b, v in rows.items()}
    print(json.dumps({"env_steps_per_sec": rows,
                      "per_env_steps_per_sec": per_env,
                      "chunk128_env_steps_per_sec": chunk_rows}))


if __name__ == "__main__":
    main()
