"""FD-vs-AD check of the multi-step cylinder rollout gradient.

Context: closed-loop DPC on CylinderJet2D degrades monotonically
(VALIDATION round 3, honest negative).  This isolates whether the
*gradient itself* is wrong (a VJP bug) or the optimization landscape is
(limit-cycle BPTT pathology): compare the AD gradient of the mean reward
over an H-step rollout at CONSTANT action against central finite
differences, component by component.

Run (CPU ok):  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
               python -u scripts/cyl_grad_fd_check.py --horizon 5
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

import fluidgym_tpu


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env-id", default="CylinderJet2D-easy-v0")
    ap.add_argument("--horizon", type=int, default=5)
    ap.add_argument("--eps", type=float, default=2e-3)
    ap.add_argument("--components", type=int, default=2)
    args = ap.parse_args()

    env = fluidgym_tpu.make(args.env_id, differentiable=True,
                            episode_length=10**9)
    env.reset(seed=0)
    carry0 = jax.tree.map(jax.lax.stop_gradient, env._pure_carry())
    act_shape = tuple(env.action_space.shape)

    def rollout(a):
        def body(c, _):
            c, _obs, r, _info = env._pure_step(c, a)
            return c, r
        _, rs = jax.lax.scan(body, carry0, None, length=args.horizon)
        return jnp.mean(rs)

    val_grad = jax.jit(jax.value_and_grad(rollout))
    a0 = jnp.zeros(act_shape, jnp.float32)
    r0, g = val_grad(a0)
    print(f"R(0) = {float(r0):+.6f}   AD grad = {np.asarray(g).ravel()}",
          flush=True)

    roll_j = jax.jit(rollout)
    for i in range(min(args.components, int(np.prod(act_shape)))):
        e = np.zeros(act_shape, np.float32).ravel()
        e[i] = args.eps
        e = e.reshape(act_shape)
        rp = float(roll_j(a0 + e))
        rm = float(roll_j(a0 - e))
        fd = (rp - rm) / (2 * args.eps)
        ad = float(np.asarray(g).ravel()[i])
        rel = abs(fd - ad) / max(abs(fd), abs(ad), 1e-12)
        print(f"component {i}: AD={ad:+.6f} FD={fd:+.6f} "
              f"rel_diff={rel:.3f}", flush=True)


if __name__ == "__main__":
    main()
