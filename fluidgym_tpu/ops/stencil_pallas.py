"""Pallas TPU kernel: fused multi-face stencil apply.

The Krylov hot loop is ``y = diag*x + sum_f off[f] * nbr_f(x)`` where
``nbr_f`` is the f-shifted field with the boundary layer replaced by halo
values (solver/stencil.py domain_apply).  XLA materializes each shifted
operand; this kernel performs the whole apply in one VMEM pass: the block
(plus the 2*nd halo layers, passed as separate inputs) is loaded once and
every face term is accumulated in registers.  Measured on a v5e chip:
1.3x single-block, 1.7x vmapped batch-64 over the fused XLA path, bit-exact.

2D single-tile version (one grid step; block sizes here are 24x37..48x805
cells = far below VMEM).  The backward pass is expressed with plain XLA ops
via ``jax.custom_vjp`` so the differentiable solver path (implicit-function
VJPs through the matvec) works unchanged.  Auto-enabled when the backend
compiles Pallas (TPU); CPU and 3D blocks fall back to the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array

_MODE = False  # "auto" | True | False


def set_pallas_stencil(enabled) -> None:
    """True/False to force, "auto" = use when the backend supports Pallas.

    Default OFF: the fused kernel is 1.3-1.7x faster than XLA on standalone
    stencil applies (measured on v5e), but inside the fully fused PISO step
    XLA already folds the matvec into its neighbors, so end-to-end env-step
    times are identical -- and pallas_call inside the vmapped scan/while_loop
    program occasionally trips the remote TPU compiler. Opt in for custom
    kernels built on top of this apply."""
    global _MODE
    _MODE = enabled


def pallas_stencil_enabled() -> bool:
    if _MODE == "auto":
        return pallas_stencil_available()
    return bool(_MODE)


@functools.cache
def pallas_stencil_available() -> bool:
    """True if a trivial Pallas kernel compiles on the current backend
    (retried once: remote TPU compiles can fail transiently).

    The probe runs inside ``ensure_compile_time_eval``: the first call often
    happens while TRACING a jitted step, where an un-forced ``pallas_call``
    would silently become (dead) equations in the enclosing trace and crash
    CPU lowering later; forcing eager evaluation makes the probe raise (and
    be caught) here instead."""
    for _ in range(2):
        try:
            from jax.experimental import pallas as pl

            def k(x_ref, o_ref):
                o_ref[...] = x_ref[...] * 2.0

            with jax.ensure_compile_time_eval():
                x = jnp.ones((8, 128), jnp.float32)
                out = pl.pallas_call(
                    k, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(x)
                if bool(jnp.allclose(out, 2.0)):
                    return True
        except Exception:
            continue
    return False


def _kernel_2d(diag_ref, off_ref, x_ref, hxm_ref, hxp_ref, hym_ref, hyp_ref,
               out_ref):
    """y = diag*x + off[0]*nbr(-x) + off[1]*nbr(+x) + off[2]*nbr(-y)
    + off[3]*nbr(+y); halos replace the wrapped layer of each shift."""
    x = x_ref[...]
    nbr_xm = jnp.concatenate([hxm_ref[...], x[:, :-1]], axis=1)
    nbr_xp = jnp.concatenate([x[:, 1:], hxp_ref[...]], axis=1)
    nbr_ym = jnp.concatenate([hym_ref[...], x[:-1, :]], axis=0)
    nbr_yp = jnp.concatenate([x[1:, :], hyp_ref[...]], axis=0)
    out_ref[...] = (
        diag_ref[...] * x
        + off_ref[0] * nbr_xm
        + off_ref[1] * nbr_xp
        + off_ref[2] * nbr_ym
        + off_ref[3] * nbr_yp
    )


# interpret mode (CPU emulation, for tests); module-level because custom_vjp
# must see a fixed primal signature
_INTERPRET = False


def set_pallas_interpret(interpret: bool) -> None:
    global _INTERPRET
    _INTERPRET = bool(interpret)


def _apply_fwd_pallas(diag, off, x, halos):
    from jax.experimental import pallas as pl

    return pl.pallas_call(
        _kernel_2d,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=_INTERPRET,
    )(diag, off, x, *halos)


@jax.custom_vjp
def stencil_apply_pallas(diag: Array, off: Array, x: Array,
                         halos: tuple[Array, Array, Array, Array]) -> Array:
    """Fused 2D stencil apply.  ``halos = (h_xm, h_xp, h_ym, h_yp)`` are the
    boundary-neighbor layers (shapes (ny,1), (ny,1), (1,nx), (1,nx))."""
    return _apply_fwd_pallas(diag, off, x, halos)


def _fwd(diag, off, x, halos):
    return _apply_fwd_pallas(diag, off, x, halos), (diag, off, x, halos)


def _bwd(res, g):
    diag, off, x, halos = res
    # cotangents of the bilinear map y = diag*x + sum_f off[f] * nbr_f
    nbr_xm = jnp.concatenate([halos[0], x[:, :-1]], axis=1)
    nbr_xp = jnp.concatenate([x[:, 1:], halos[1]], axis=1)
    nbr_ym = jnp.concatenate([halos[2], x[:-1, :]], axis=0)
    nbr_yp = jnp.concatenate([x[1:, :], halos[3]], axis=0)
    d_diag = g * x
    d_off = jnp.stack([g * nbr_xm, g * nbr_xp, g * nbr_ym, g * nbr_yp])

    t0, t1, t2, t3 = off[0] * g, off[1] * g, off[2] * g, off[3] * g
    d_x = diag * g
    d_x = d_x.at[:, :-1].add(t0[:, 1:])
    d_x = d_x.at[:, 1:].add(t1[:, :-1])
    d_x = d_x.at[:-1, :].add(t2[1:, :])
    d_x = d_x.at[1:, :].add(t3[:-1, :])
    d_halos = (t0[:, :1], t1[:, -1:], t2[:1, :], t3[-1:, :])
    return d_diag, d_off, d_x, d_halos


stencil_apply_pallas.defvjp(_fwd, _bwd)
