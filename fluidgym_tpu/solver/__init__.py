"""Incompressible Navier-Stokes PISO solver: stencil ops, Krylov solvers,
time integration."""

from fluidgym_tpu.solver import linsolve, stencil
from fluidgym_tpu.solver.piso import (
    ADAPTIVE,
    Hooks,
    SimConfig,
    make_divergence_free,
    piso_adaptive_step,
    piso_fixed_steps,
    piso_substep,
    single_step,
)

__all__ = [
    "linsolve",
    "stencil",
    "ADAPTIVE",
    "Hooks",
    "SimConfig",
    "make_divergence_free",
    "piso_adaptive_step",
    "piso_fixed_steps",
    "piso_substep",
    "single_step",
]
