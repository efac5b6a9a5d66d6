"""FluidGym-TPU: a TPU-native, fully differentiable benchmark suite for
reinforcement learning in active flow control.

Built from scratch in JAX (jit/vmap/pjit + Pallas) with the capabilities of
the reference FluidGym framework: an embedded incompressible Navier-Stokes
PISO solver, Gymnasium-style environments across four physics families
(cylinder wake, airfoil, Rayleigh-Benard convection, turbulent channel flow),
SARL and MARL modes, wrapper/integration layers, batched envs via vmap and
device meshes, and end-to-end reverse-mode differentiability through the
solver.

Public API mirrors the reference: ``fluidgym_tpu.make(id, **kwargs)`` plus the
``config`` singleton.
"""

import os as _os

import jax as _jax

# Persistent compilation cache: PISO-step compilations are expensive (minutes)
# and identical across processes; opt out with FLUIDGYM_TPU_NO_COMPILE_CACHE.


def _default_compile_cache_dir() -> str:
    """Cache dir keyed on the host CPU feature set: /tmp can outlive the
    machine (containers migrate between hosts), and XLA:CPU AOT executables
    compiled for another host's vector extensions load with SIGILL-risk
    warnings -- a fresh keyed dir instead of a poisoned shared one."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    import hashlib

                    key = hashlib.sha1(line.encode()).hexdigest()[:10]
                    return f"/tmp/fluidgym_tpu_jax_cache_{key}"
    except OSError:
        pass
    return "/tmp/fluidgym_tpu_jax_cache"


if not _os.environ.get("FLUIDGYM_TPU_NO_COMPILE_CACHE"):
    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get("FLUIDGYM_TPU_COMPILE_CACHE",
                        _default_compile_cache_dir()),
    )
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# Full fp32 for dot/einsum: on TPU the default matmul precision truncates
# fp32 operands to bfloat16, which destabilizes the Krylov inner products and
# metric-tensor contractions (NaN blow-ups at developed flow).  The solver's
# einsums are a negligible share of its FLOPs, so this costs nothing.
_jax.config.update("jax_default_matmul_precision", "highest")

from fluidgym_tpu.config import config
from fluidgym_tpu.registry import make, register, registry

# Environment registration (populates the registry with env ids).
from fluidgym_tpu import envs as _envs  # noqa: E402,F401

__all__ = ["config", "make", "register", "registry"]
__version__ = "0.1.0"
