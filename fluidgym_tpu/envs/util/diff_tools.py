"""Utilities for differentiating through the full environment state.

JAX re-expression of the reference ``envs/util/diff_tools.py:8-59``: the
reference mutates torch tensors in place and marks them as autograd leaves;
here states are immutable pytrees, so the same workflow is expressed as pure
functions -- extract the differentiable sub-state, flatten it, and compute
VJPs with ``jax.vjp`` against the env's pure step.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from fluidgym_tpu.core.domain import DomainState

Array = jax.Array

__all__ = ["get_state_arrays", "get_flat_state", "replace_state_arrays",
           "state_vjp"]


def get_state_arrays(state: DomainState) -> list[Array]:
    """The differentiable state arrays of every block: velocity, plus the
    passive scalar if present (reference _get_state_tensors, :8-22)."""
    arrays = []
    for blk in state.blocks:
        arrays.append(blk.velocity)
        if blk.scalar is not None:
            arrays.append(blk.scalar)
    return arrays


def get_flat_state(state_or_env) -> Array:
    """The differentiable state as one flat vector (reference :25-41)."""
    state = getattr(state_or_env, "_state", state_or_env)
    return jnp.concatenate([a.reshape(-1) for a in get_state_arrays(state)])


def replace_state_arrays(state: DomainState, arrays: list[Array]) -> DomainState:
    """Inverse of :func:`get_state_arrays` -- rebuild a DomainState with the
    given velocity/scalar arrays (the JAX analog of the reference's in-place
    ``mark_state_differentiable``)."""
    from dataclasses import replace

    it = iter(arrays)
    for b, blk in enumerate(state.blocks):
        vel = next(it)
        if blk.scalar is not None:
            state = state.replace_block(
                b, replace(blk, velocity=vel, scalar=next(it)))
        else:
            state = state.replace_block(b, replace(blk, velocity=vel))
    return state


def state_vjp(
    step_fn: Callable[[DomainState], Any],
    state: DomainState,
    cotangent: Any = None,
):
    """VJP of ``step_fn`` w.r.t. the differentiable state arrays.

    ``step_fn(state) -> output`` is any pure function of a DomainState (e.g.
    a closed-over ``piso_fixed_steps`` rollout or an env's ``_pure_step``).
    Returns ``(output, grads)`` where ``grads`` is a list matching
    :func:`get_state_arrays`.  ``cotangent`` defaults to all-ones over the
    output (reference state_vjp semantics, examples/compute_state_vjp).
    """
    arrays = get_state_arrays(state)

    def wrapped(arrs):
        return step_fn(replace_state_arrays(state, arrs))

    out, vjp_fn = jax.vjp(wrapped, arrays)
    if cotangent is None:
        cotangent = jax.tree.map(jnp.ones_like, out)
    (grads,) = vjp_fn(cotangent)
    return out, grads
