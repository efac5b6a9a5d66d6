"""Batch-resident fused CG: the entire lockstep Krylov loop in one Pallas call.

The XLA pressure solve streams every live field through HBM once per CG
iteration (matvec input/output, axpys, residuals) and pays a dispatch round
per iteration.  For domains whose batch of solves fits VMEM (~16 MB per
core -- all RBC2D configs at RL batch sizes, small single-block 3D grids),
this kernel keeps x, r, p and the stencil coefficients for every lane
RESIDENT in VMEM for the whole solve: HBM traffic drops from
O(iterations x fields) to O(fields), the per-iteration dispatch disappears,
and the dot products never leave the chip.

Batching is first-class, not vmap-derived: ``jax.vmap`` of a ``pallas_call``
turns the batch axis into a sequential grid (one lane at a time -- measured
0.56x the XLA loop on RBC2D batch 32, where a single 6k-cell lane leaves the
VPU idle).  ``fused_cg`` therefore carries a ``jax.custom_batching.custom_vmap``
rule that maps the batch axis onto an in-kernel LANE axis: all lanes iterate
in lockstep with per-lane freeze masking, exactly the semantics of the
vmapped XLA loop in ``solver/linsolve.cg``.  Batches beyond the VMEM budget
are split into resident chunks solved sequentially.

This is the TPU answer to the reference's fused CUDA CG
(``/root/reference/src/fluidgym/simulation/extensions/cg_solver_kernel.cu``):
same role (the dominant cost of every PISO substep), different fusion axis --
the CUDA kernel fuses within one iteration, this kernel fuses across
ITERATIONS and LANES.

Semantics match ``solver/linsolve.cg``: NORM2_NORMALIZED convergence
(RMSE(r) <= tol), optional Jacobi preconditioning, optional warm start,
stall-patience early exit with per-lane best-iterate tracking, true-residual
refresh every 100 iterations, per-lane freeze once converged/stalled.
Eligibility is decided by the caller (single block, no CONNECTED faces, VMEM
budget); under ``lax.custom_linear_solve`` the kernel is a black-box solver,
so the implicit-function VJP is unaffected.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fluidgym_tpu.solver.linsolve import SolveInfo

Array = jax.Array

__all__ = ["fused_cg_eligible", "fused_cg", "set_fused_cg",
           "fused_cg_enabled"]

_MODE = "auto"  # "auto" | True | False


def set_fused_cg(enabled) -> None:
    """True/False to force, "auto" (default) = use when the backend compiles
    Pallas (TPU; the CPU backend runs kernels only in interpret mode, far
    slower than the XLA loop)."""
    global _MODE
    _MODE = enabled


def fused_cg_enabled() -> bool:
    import os

    env = os.environ.get("FLUIDGYM_TPU_FUSED_CG", "").strip().lower()
    if env in ("0", "false", "off"):
        return False
    if env in ("1", "true", "on"):
        return True
    if _MODE == "auto":
        from fluidgym_tpu.ops.stencil_pallas import pallas_stencil_available

        return pallas_stencil_available()
    return bool(_MODE)

#: VMEM budget for residency: per-lane fields (diag, off, b, x0, x, r, p,
#: best_x), with headroom under the ~16MB/core VMEM for Mosaic temporaries.
_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def _padded_cells(shape: tuple[int, ...]) -> int:
    """(8, 128) tile padding on the two minor dims is real VMEM occupancy."""
    padded = list(shape)
    padded[-1] = -(-padded[-1] // 128) * 128
    if len(padded) >= 2:
        padded[-2] = -(-padded[-2] // 8) * 8
    return int(np.prod(padded))


def _lane_bytes(shape: tuple[int, ...], ndims: int, dtype) -> int:
    cells = _padded_cells(shape)
    # diag, off, b, x0, x, r, p, best + ~5 Mosaic expression temporaries
    # (calibrated against the compiler's scoped-vmem accounting: a 32-lane
    # 61x96 fp32 solve allocates 16.93M ~= 16 lane-fields of 32 KB x 32)
    n_arrays = 12 + 2 * ndims
    return cells * jnp.dtype(dtype).itemsize * n_arrays


def _max_lanes(shape: tuple[int, ...], ndims: int, dtype) -> int:
    n = max(1, _VMEM_BUDGET_BYTES // _lane_bytes(shape, ndims, dtype))
    return (n // 8) * 8 if n >= 8 else n  # sublane-aligned chunks


def fused_cg_eligible(shape: tuple[int, ...], ndims: int, dtype) -> bool:
    """Is this block a good fit for the resident kernel?  (At least one lane
    must fit VMEM; larger batches are chunked.)"""
    if ndims not in (2, 3):
        return False
    if shape[-1] < 64 or (len(shape) >= 2 and shape[-2] < 8):
        # far smaller than one (8, 128) fp32 tile in the lane/sublane dims:
        # relayout padding wastes most of the VPU; XLA handles tiny grids fine
        return False
    return _lane_bytes(shape, ndims, dtype) <= _VMEM_BUDGET_BYTES


def _matvec(diag, offs, x, ndims: int):
    """(A x) = diag*x + sum_f off_f * nbr_f(x) over (lanes, *spatial) arrays:
    rolls are exact for interior and PERIODIC neighbors; FIXED faces carry
    off=0 so the wrapped values are masked (stencil.py:121-126 semantics)."""
    y = diag * x
    for f in range(2 * ndims):
        d = f // 2
        ax = x.ndim - 1 - d  # spatial axis d is minor-to-major (stencil._axis)
        # pltpu.roll requires a non-negative shift: -1 == size-1 (circular)
        shift = 1 if f % 2 == 0 else x.shape[ax] - 1
        y = y + offs[f] * pltpu.roll(x, shift, axis=ax)
    return y


def _lane_sum(a):
    """Per-lane inner-product accumulator: reduce all but the lane axis,
    keeping singleton dims so results broadcast back over the lane fields.
    Reduced one axis at a time: Mosaic's layout inference aborts on the
    rank-preserving multi-axis keepdims reduction (it emits a size-1-per-lane
    reshape), while chained single-axis keepdims reductions lower cleanly."""
    for ax in range(a.ndim - 1, 0, -1):
        a = jnp.sum(a, axis=ax, keepdims=True)
    return a


def _kernel(*refs, ndims: int, tol2_sum: float, maxiter: int,
            stall_iters: int, precondition: bool, return_best: bool,
            warm_start: bool):
    nf = 2 * ndims
    b_ref, diag_ref = refs[0], refs[1]
    off_refs = refs[2:2 + nf]
    x0_ref = refs[2 + nf]
    x_out_ref, iters_ref, rs_ref = refs[3 + nf:6 + nf]
    r_ref, p_ref, best_ref = refs[6 + nf:9 + nf]

    dt = b_ref.dtype
    diag = diag_ref[:]
    offs = [o[:] for o in off_refs]
    b = b_ref[:]
    tiny = jnp.asarray(1e-30, dt)
    inv_diag = jnp.asarray(1.0, dt) / diag if precondition else None

    if warm_start:
        x0 = x0_ref[:]
        r = b - _matvec(diag, offs, x0, ndims)
        x_out_ref[:] = x0
    else:
        r = b
        x_out_ref[:] = jnp.zeros_like(b)
    z = inv_diag * r if precondition else r
    r_ref[:] = r
    p_ref[:] = z
    best_ref[:] = x_out_ref[:]
    rz0 = _lane_sum(r * z).astype(dt)    # (lanes, 1[, 1])
    rs0 = _lane_sum(r * r).astype(dt)

    tol2 = jnp.asarray(tol2_sum, dt)
    zero = jnp.asarray(0, dt)

    def cond(carry):
        it, rz, rs, best_rs, best_it = carry
        active = jnp.logical_and(rs > tol2, it - best_it < stall_iters)
        return jnp.logical_and(it < maxiter, jnp.any(active))

    def body(carry):
        it, rz, rs, best_rs, best_it = carry
        x = x_out_ref[:]
        p = p_ref[:]
        # per-lane freeze (linsolve.cg lockstep semantics): converged or
        # stalled lanes take zero-length steps and stop best-tracking
        done = jnp.logical_or(rs <= tol2, it - best_it >= stall_iters)
        recompute = (it + 1) % 100 == 0
        # one matvec per iteration: A@p normally, A@x on the maintenance
        # iteration that refreshes the true residual (see linsolve.cg)
        Av = _matvec(diag, offs, jnp.where(recompute, x, p), ndims)
        denom = _lane_sum(p * Av).astype(dt)
        alpha = jnp.where(
            jnp.logical_or(done, recompute), zero,
            rz / jnp.where(jnp.abs(denom) < tiny, tiny, denom))
        x = x + alpha * p
        x_out_ref[:] = x
        r = jnp.where(recompute, b - Av, r_ref[:] - alpha * Av)
        r_ref[:] = r
        z = inv_diag * r if precondition else r
        rz_new = _lane_sum(r * z).astype(dt)
        rs_new = _lane_sum(r * r).astype(dt)
        beta = jnp.where(
            done, zero, rz_new / jnp.where(jnp.abs(rz) < tiny, tiny, rz))
        p_ref[:] = z + beta * p
        better = jnp.logical_and(rs_new < best_rs, jnp.logical_not(done))
        if return_best:
            best_ref[:] = jnp.where(better, x, best_ref[:])
        best_rs = jnp.where(better, rs_new, best_rs)
        best_it = jnp.where(better, it + 1, best_it)
        return it + 1, rz_new, rs_new, best_rs, best_it

    it0 = jnp.asarray(0, jnp.int32)
    best_it0 = jnp.zeros_like(rz0, jnp.int32)
    it, rz, rs, best_rs, _ = jax.lax.while_loop(
        cond, body, (it0, rz0, rs0, rs0, best_it0))

    converged = rs <= tol2
    if return_best:
        x_out_ref[:] = jnp.where(converged, x_out_ref[:], best_ref[:])
        rs = jnp.where(converged, rs, best_rs)
    # stats are written as full lane-shaped fields: same-rank broadcasts only
    # (Mosaic's layout inference aborts on rank-changing reshapes of small
    # vectors); the caller reads one element per lane outside the kernel
    iters_ref[:] = jnp.broadcast_to(
        jnp.full_like(rs, it, dtype=jnp.int32), b.shape)
    rs_ref[:] = jnp.broadcast_to(rs, b.shape)


@functools.lru_cache(maxsize=None)
def _lane_solver(ndims: int, tol2_sum: float, maxiter: int, stall_iters: int,
                 precondition: bool, return_best: bool, warm_start: bool,
                 interpret: bool):
    """The (lanes, *spatial) lockstep solver with a custom_vmap rule that
    folds an outer vmap axis into the lane axis (instead of the default
    sequential-grid batching of pallas_call)."""
    nf = 2 * ndims

    def call_kernel(diag, offs, b, x0):
        lanes = b.shape[0]
        kernel = functools.partial(
            _kernel, ndims=ndims, tol2_sum=tol2_sum, maxiter=maxiter,
            stall_iters=stall_iters, precondition=precondition,
            return_best=return_best, warm_start=warm_start)
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct(b.shape, b.dtype),
                jax.ShapeDtypeStruct(b.shape, jnp.int32),
                jax.ShapeDtypeStruct(b.shape, b.dtype),
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (3 + nf),
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM(b.shape, b.dtype),  # r
                pltpu.VMEM(b.shape, b.dtype),  # p
                pltpu.VMEM(b.shape, b.dtype),  # best_x
            ],
            interpret=interpret,
        )(b, diag, *offs, x0)

    def xla_loop_lanes(diag, offs, b, x0):
        """Fallback when VMEM holds too few lanes for residency to win
        (lane serialization measured 0.56x the XLA loop): the plain
        lockstep XLA CG, reconstructed from the same roll-form operator."""
        from fluidgym_tpu.solver import linsolve

        def one(diag1, offs1, b1, x01):
            def mv(v):
                y = diag1 * v
                for f in range(nf):
                    d = f // 2
                    ax = v.ndim - 1 - d
                    shift = 1 if f % 2 == 0 else -1
                    y = y + offs1[f] * jnp.roll(v, shift, axis=ax)
                return y

            precond = (lambda r: r / diag1) if precondition else None
            tol = float(np.sqrt(tol2_sum / b1.size))
            x, info = linsolve.cg(
                mv, b1, x0=x01 if warm_start else None, tol=tol,
                maxiter=maxiter, return_best=return_best, precond=precond,
                stall_iters=stall_iters)
            rs = (info.residual.astype(b1.dtype) ** 2) * b1.size
            return x, info.iterations, rs

        x, iters, rs = jax.vmap(one)(diag, jnp.stack(offs, 1), b, x0)
        # match the kernel's full-shape stat outputs
        expand = lambda a: a.reshape((a.shape[0],) + (1,) * (b.ndim - 1))
        return (x, jnp.broadcast_to(expand(iters), b.shape).astype(jnp.int32),
                jnp.broadcast_to(expand(rs), b.shape))

    def solve_lanes(diag, offs, b, x0):
        """Chunk lanes so every kernel call stays within the VMEM budget;
        chunks solve sequentially (lax.map), lanes within a chunk lockstep.
        Sub-8-lane chunks are allowed when the per-lane working set is big
        enough to keep the VPU busy on its own (the 8-lane floor exists for
        the tiny-lane regime where serialization measured 0.56x; the merged
        kernel's 2-lane res-56 chunks measured 8.3x -- cg_pallas_mb)."""
        lanes = b.shape[0]
        spatial = b.shape[1:]
        chunk = min(lanes, _max_lanes(spatial, ndims, b.dtype))
        big_lane = _padded_cells(spatial) >= 16384
        if lanes > 1 and chunk < min(lanes, 8) and not big_lane:
            return xla_loop_lanes(diag, offs, b, x0)
        if chunk >= lanes:
            return call_kernel(diag, offs, b, x0)
        n_chunks = -(-lanes // chunk)
        pad = n_chunks * chunk - lanes

        def pad_lanes(a):
            # zero-RHS pad lanes converge instantly and stay frozen
            return jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)

        def chunked(a):
            a = pad_lanes(a) if pad else a
            return a.reshape((n_chunks, chunk) + a.shape[1:])

        args = (chunked(diag), tuple(chunked(o) for o in offs),
                chunked(b), chunked(x0))
        # diag pad lanes would divide by zero under Jacobi; use ones
        if precondition:
            ones_fix = args[0]
            if pad:
                ones_fix = ones_fix.at[-1, chunk - pad:].set(1.0)
            args = (ones_fix,) + args[1:]
        xs, iters, rss = jax.lax.map(
            lambda a: call_kernel(a[0], a[1], a[2], a[3]), args)
        unchunk = lambda a: a.reshape((n_chunks * chunk,) + a.shape[2:])[:lanes]
        return unchunk(xs), unchunk(iters), unchunk(rss)

    def _lane_stat(a):
        # one element per lane (stat fields are lane-constant), in XLA-land
        return a.reshape(a.shape[0], -1)[:, 0]

    @jax.custom_batching.custom_vmap
    def solve(diag, *offs_b_x0):
        offs = offs_b_x0[:nf]
        b, x0 = offs_b_x0[nf], offs_b_x0[nf + 1]
        x, iters, rs = call_kernel(diag[None], [o[None] for o in offs],
                                   b[None], x0[None])
        return x[0], _lane_stat(iters)[0], _lane_stat(rs)[0]

    @solve.def_vmap
    def _vmap_rule(axis_size, in_batched, diag, *offs_b_x0):
        offs = list(offs_b_x0[:nf])
        b, x0 = offs_b_x0[nf], offs_b_x0[nf + 1]
        batched = list(in_batched)

        def bcast(a, is_b):
            return a if is_b else jnp.broadcast_to(a, (axis_size,) + a.shape)

        diag = bcast(diag, batched[0])
        offs = [bcast(o, f) for o, f in zip(offs, batched[1:1 + nf])]
        b = bcast(b, batched[1 + nf])
        x0 = bcast(x0, batched[2 + nf])
        x, iters, rs = solve_lanes(diag, offs, b, x0)
        return (x, _lane_stat(iters), _lane_stat(rs)), (True, True, True)

    return solve


def fused_cg(
    diag: Array,
    off: Array,
    b: Array,
    x0: Array | None = None,
    *,
    ndims: int,
    tol: float,
    maxiter: int = 5000,
    stall_iters: int = 250,
    precondition: bool = True,
    return_best: bool = True,
    interpret: bool = False,
) -> tuple[Array, SolveInfo]:
    """Whole-solve lockstep CG on a single-block stencil operator.  ``off``
    has the StencilOp layout ``(2*ndims, *spatial)``.  Returns
    ``(x, SolveInfo)`` with linsolve.cg semantics.  Safe under one level of
    ``jax.vmap`` (batch lanes solve in lockstep inside one kernel)."""
    dt = b.dtype
    n = b.size
    tol2_sum = float(tol) * float(tol) * n
    warm = x0 is not None
    x0_in = b if x0 is None else x0  # placeholder input when cold
    if not interpret and jax.default_backend() == "cpu":
        # the CPU backend only runs Pallas in interpret mode; honor a forced
        # set_fused_cg(True) there instead of failing at lowering
        interpret = True

    solve = _lane_solver(ndims, tol2_sum, int(maxiter), int(stall_iters),
                         bool(precondition), bool(return_best), warm,
                         bool(interpret))
    offs = tuple(off[f] for f in range(2 * ndims))
    x, iters, rs = solve(diag, *offs, b, x0_in)

    # all-zero RHS -> zero solution (linsolve.cg parity)
    b_zero = jnp.all(b == 0)
    x = jnp.where(b_zero, jnp.zeros_like(x), x)
    converged = jnp.logical_or(rs <= jnp.asarray(tol2_sum, dt), b_zero)
    info = SolveInfo(converged=converged, iterations=iters,
                     residual=jnp.sqrt(rs / n))
    return x, info
