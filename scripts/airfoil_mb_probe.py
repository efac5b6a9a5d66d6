"""Small-batch airfoil merged-kernel validation on the TPU (batch 8, from
the bundled easy initial domain): correctness (drag parity + convergence)
and per-step time, merged kernel OFF vs ON (flip-seam plan forced)."""
import json, sys, time
from pathlib import Path
REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
import jax, jax.numpy as jnp, numpy as np
import fluidgym_tpu
from fluidgym_tpu.ops import cg_pallas_mb

BATCH = 8
N = 4

def measure(force_mb: bool) -> dict:
    cg_pallas_mb.set_fused_cg_mb(True if force_mb else False)
    env = fluidgym_tpu.make("Airfoil2D-easy-v0", load_initial_domain=True,
                            load_domain_statistics=False,
                            randomize_initial_state=False,
                            episode_length=10**9)
    env.reset(seed=0)
    carry = env._pure_carry()
    fn = jax.jit(jax.vmap(env._pure_step))
    bcarry = jax.tree.map(lambda a: jnp.broadcast_to(a, (BATCH,) + a.shape), carry)
    n_act = int(np.prod(env.action_space.shape)) or 1
    a0 = jnp.zeros((BATCH, n_act), jnp.float32)
    c, *_ = fn(bcarry, a0)
    jax.block_until_ready(jax.tree.leaves(c)[0])
    t0 = time.perf_counter()
    for _ in range(N):
        c, _o, _r, info = fn(c, a0)
    jax.block_until_ready(jax.tree.leaves(c)[0])
    dt = (time.perf_counter() - t0) / N
    return {"sec_per_batched_step": round(dt, 3),
            "drag_mean": round(float(np.asarray(info["drag"]).mean()), 5),
            "pressure_iters": round(float(jnp.mean(info["pressure_iterations"])), 1),
            "all_converged": bool(jnp.all(info["pressure_converged"]))}

out = {}
for name, f in [("xla", False), ("merged", True)]:
    try:
        out[name] = measure(f)
    except Exception as e:
        out[name] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
    print(name, out[name], flush=True)
cg_pallas_mb.set_fused_cg_mb("auto")
if "sec_per_batched_step" in out.get("xla", {}) and "sec_per_batched_step" in out.get("merged", {}):
    out["speedup"] = round(out["xla"]["sec_per_batched_step"] / out["merged"]["sec_per_batched_step"], 3)
    out["drag_rel_diff"] = round(abs(out["merged"]["drag_mean"] - out["xla"]["drag_mean"]) /
                                 max(abs(out["xla"]["drag_mean"]), 1e-9), 5)
print(json.dumps(out))
