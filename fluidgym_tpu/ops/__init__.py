"""Pallas TPU kernels for hot solver ops."""

from fluidgym_tpu.ops.stencil_pallas import (
    pallas_stencil_available,
    set_pallas_stencil,
    stencil_apply_pallas,
)

__all__ = ["stencil_apply_pallas", "set_pallas_stencil",
           "pallas_stencil_available"]
