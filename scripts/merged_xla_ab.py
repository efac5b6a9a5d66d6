"""A/B the merged-frame XLA solve routing on the airfoil (real TPU).

The airfoil C-grid's flip-seam plan is declined by the resident Pallas
kernels (auto mode) and its lane is too big for multi-lane VMEM chunks, so
its production solves run the blockwise XLA path: 6 small blocks with
transposed halo exchanges per matvec.  block_merge.set_merged_xla_solves
reroutes those solves through the merged super-block frame (3 contiguous
roll-stencils + static slab fixups) -- identical iterates (the merge is an
exact permutation, pinned in tests/test_block_merge.py), different op
shape.  This measures whether the larger fused ops win on hardware.

Run (TPU): PYTHONPATH=/root/repo python -u scripts/merged_xla_ab.py
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import _heartbeat  # noqa: E402

_heartbeat.start()

import jax
import numpy as np

import fluidgym_tpu
from fluidgym_tpu.solver import block_merge

BATCH = 8
N_WARM = 2
N_MEASURE = 6


def measure(env_id: str, merged_xla) -> dict:
    import jax.numpy as jnp

    block_merge.set_merged_xla_solves(merged_xla)
    env = fluidgym_tpu.make(env_id, load_initial_domain=True,
                            load_domain_statistics=False,
                            randomize_initial_state=False,
                            episode_length=10**9)
    env.reset(seed=0)
    carry = env._pure_carry()
    bcarry = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (BATCH,) + a.shape), carry)
    bact = jnp.zeros((BATCH,) + tuple(env.action_space.shape), jnp.float32)
    fn = jax.jit(jax.vmap(env._pure_step))

    infos = []
    for _ in range(N_WARM + 1):
        bcarry, _, _, info = fn(bcarry, bact)
    jax.block_until_ready(jax.tree.leaves(bcarry)[0])
    t0 = time.perf_counter()
    for _ in range(N_MEASURE):
        bcarry, _, rew, info = fn(bcarry, bact)
        infos.append(info)
    jax.block_until_ready(jax.tree.leaves(bcarry)[0])
    dt = (time.perf_counter() - t0) / N_MEASURE

    conv = float(np.mean([np.asarray(i["pressure_converged"], np.float32)
                          for i in infos]))
    worst = float(np.max([np.asarray(i["pressure_residual"]).max()
                          for i in infos]))
    drag = float(np.mean([np.asarray(i["drag"]).mean() for i in infos]))
    return {
        "variant": f"merged_xla={merged_xla}",
        "s_per_step": dt,
        "env_steps_per_sec": BATCH / dt,
        "converged_frac": conv,
        "worst_residual": worst,
        "mean_drag": drag,
    }


def main() -> int:
    env_id = sys.argv[1] if len(sys.argv) > 1 else "Airfoil2D-easy-v0"
    rows = []
    for mode in (False, "auto"):
        r = measure(env_id, mode)
        rows.append(r)
        print(json.dumps({"env_id": env_id, **r}), flush=True)
    speedup = rows[0]["s_per_step"] / rows[1]["s_per_step"]
    print(json.dumps({"env_id": env_id, "merged_xla_speedup": speedup,
                      "drag_rel_diff": abs(rows[1]["mean_drag"]
                                           - rows[0]["mean_drag"])
                      / max(abs(rows[0]["mean_drag"]), 1e-9)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
