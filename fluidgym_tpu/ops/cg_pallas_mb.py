"""Batch-resident fused CG over MERGED multi-block domains.

``ops/cg_pallas.py`` keeps a whole lockstep batch of single-block pressure
solves resident in VMEM.  Multi-block O-grids (the flagship cylinder envs)
could not use it: their CONNECTED seams need transposed halo gathers that a
roll-form kernel cannot express.  ``solver/block_merge.merge_plan``
removes that obstacle: it rewrites the topology into a few axis-aligned
super-blocks (cylinder = closed annulus + wake) whose operator is an exact
permutation ``P A P^T`` of the original -- in-super-block coupling becomes
plain rolls (ring closures wrap), and the few residual seams become STATIC
windowed slab corrections.

This kernel is the resident solver for that merged form: every super-block
field (x, r, p, coefficients) of every lane lives in VMEM for the entire
Krylov loop; the matvec is per-super-block rolls plus ``plan.fixups``
seam corrections (static slices -- no gathers, no transposes); the dot
products reduce jointly across super-blocks and never leave the chip.

Batching follows cg_pallas: a ``jax.custom_batching.custom_vmap`` rule folds
the env batch onto an in-kernel lane axis (vmap of a pallas_call would
serialize lanes), chunked to the VMEM budget.  Unlike the single-block
kernel, chunks SMALLER than 8 lanes are allowed when the per-lane working
set is large (a 70k-cell lane saturates the VPU on its own -- the 8-lane
floor exists for the tiny-lane regime where serialization measured 0.56x).

Semantics match ``solver/linsolve.cg`` exactly (NORM2_NORMALIZED over the
TOTAL cell count, Jacobi preconditioning, warm start, stall patience,
per-lane freeze, true-residual refresh, return-best).  Reference analogue:
the fused CUDA CG in
``/root/reference/src/fluidgym/simulation/extensions/cg_solver_kernel.cu``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jax import lax

from fluidgym_tpu.ops.cg_pallas import (_VMEM_BUDGET_BYTES, _lane_sum,
                                        _padded_cells)
from fluidgym_tpu.solver.block_merge import (MergePlan, _array_axis,
                                             _face_slab_idx)
from fluidgym_tpu.solver.linsolve import SolveInfo

Array = jax.Array

__all__ = ["fused_cg_mb_eligible", "fused_cg_mb", "set_fused_cg_mb",
           "fused_cg_mb_enabled", "fused_bicg_mb_eligible",
           "fused_bicgstab_mb", "set_fused_bicg_mb",
           "fused_bicg_mb_enabled"]

#: "auto" = identity-seam plans only (cylinder O-grids; measured 8.3x at the
#: res-56 flagship, scripts/merged_cg_ab.py).  True = also flip-seam plans
#: (airfoil C-grids -- semantics pinned in interpret mode; enable after the
#: hardware A/B).  False = off.
_MB_MODE = "auto"


def set_fused_cg_mb(enabled) -> None:
    """True/False/"auto": routing mode for merged multi-block pressure solves
    (solver/piso._fused_cg_mb_plan consults this; "auto" restricts to
    identity-seam plans).  Any other value is rejected -- a falsy non-False
    value (0, None, "") must not silently mean "all plans"."""
    global _MB_MODE
    if enabled not in (True, False, "auto"):
        raise ValueError(
            f"set_fused_cg_mb expects True, False, or 'auto'; got {enabled!r}")
    _MB_MODE = enabled


def fused_cg_mb_enabled():
    """False, True (all plans), or "auto" (identity-seam plans only)."""
    import os

    env = os.environ.get("FLUIDGYM_TPU_FUSED_CG_MB", "").strip().lower()
    if env in ("0", "false", "off"):
        return False
    if env in ("1", "true", "on"):
        return True
    return _MB_MODE

#: Routing mode for the merged BiCGStab kernel (advection/scalar solves and
#: the full non-orthogonal pressure mode).  Semantics pinned in interpret
#: mode (tests/test_cg_pallas_mb.py); default "auto" (identity-seam plans)
#: after the hardware A/B validated lowering and won end-to-end on both
#: flagship grids (scripts/fused_bicg_ab.py, 2026-08-18: res 24 1.28x with
#: bit-equal drag, res 56 1.10x at cd rel. diff 1.3e-4; all solves
#: converged on both paths).
_MB_BICG_MODE = "auto"


def set_fused_bicg_mb(enabled) -> None:
    """True/False/"auto": routing mode for merged BiCGStab solves ("auto"
    restricts to identity-seam plans, like set_fused_cg_mb)."""
    global _MB_BICG_MODE
    if enabled not in (True, False, "auto"):
        raise ValueError(
            f"set_fused_bicg_mb expects True, False, or 'auto'; "
            f"got {enabled!r}")
    _MB_BICG_MODE = enabled


def fused_bicg_mb_enabled():
    """False, True (all plans), or "auto" (identity-seam plans only)."""
    import os

    env = os.environ.get("FLUIDGYM_TPU_FUSED_BICG_MB", "").strip().lower()
    if env in ("0", "false", "off"):
        return False
    if env in ("1", "true", "on"):
        return True
    if env == "auto":
        return "auto"
    return _MB_BICG_MODE


#: Minimum total (padded) cells per lane for sub-8-lane chunks: one big lane
#: keeps the VPU busy by itself, so residency wins even without lane packing.
_BIG_LANE_CELLS = 16384


def _sb_array_shape(plan: MergePlan, s: int) -> tuple[int, ...]:
    """Array shape of super-block ``s`` (axes ordered major..minor = axis0
    minor, matching block_merge.pack_fields)."""
    nd = plan.ndims
    return tuple(plan.superblocks[s].shape[D] for D in range(nd - 1, -1, -1))


def _lane_bytes(plan: MergePlan, dtype, algo: str = "cg") -> int:
    # per super-block residents, CG: b, diag, 2*nd offs, x0, x, r, p, best,
    # Av + Mosaic expression temporaries (the materialized Av scratch
    # replaces one of cg_pallas's five calibrated temporaries, so the total
    # matches).  BiCGStab adds the shadow residual r_hat and a second
    # matvec scratch t.
    n_arrays = (12 if algo == "cg" else 14) + 2 * plan.ndims
    cells = sum(_padded_cells(_sb_array_shape(plan, s))
                for s in range(len(plan.superblocks)))
    return cells * jnp.dtype(dtype).itemsize * n_arrays


def _max_lanes(plan: MergePlan, dtype, algo: str = "cg") -> int:
    n = max(1, _VMEM_BUDGET_BYTES // _lane_bytes(plan, dtype, algo))
    return (n // 8) * 8 if n >= 8 else n


def _mb_eligible(plan: MergePlan | None, dtype, algo: str) -> bool:
    """One lane must fit VMEM, and lanes must either chunk by >=8 or be
    individually big enough to keep the VPU busy."""
    if plan is None or plan.ndims not in (2, 3):
        return False
    if plan.ndims == 3 and not plan.identity_seams:
        # the in-kernel flip (reversal matmul) is 2D-only: for 3D slabs
        # jnp.dot would contract the wrong axis
        return False
    # tile padding burns VPU work: bound the AGGREGATE waste instead of
    # rejecting per-array minor widths (the cylinder ring packs as (96, 37)
    # -> (96, 128), a 3.5x pad on the SMALLER of its two arrays, but only
    # 1.6x overall -- still far cheaper than per-iteration HBM streaming)
    padded = sum(_padded_cells(_sb_array_shape(plan, s))
                 for s in range(len(plan.superblocks)))
    live = sum(int(np.prod(_sb_array_shape(plan, s)))
               for s in range(len(plan.superblocks)))
    if padded > 3 * live:
        return False
    if _lane_bytes(plan, dtype, algo) > _VMEM_BUDGET_BYTES:
        return False
    if _max_lanes(plan, dtype, algo) < 8:
        return padded >= _BIG_LANE_CELLS
    return True


def fused_cg_mb_eligible(plan: MergePlan | None, dtype) -> bool:
    return _mb_eligible(plan, dtype, "cg")


def fused_bicg_mb_eligible(plan: MergePlan | None, dtype) -> bool:
    return _mb_eligible(plan, dtype, "bicgstab")


def _flip_sizes(plan: MergePlan) -> tuple[int, ...]:
    """Unique tangential extents needing a reversal matrix (Mosaic has no
    `rev` lowering; flips become anti-diagonal matmuls on the slabs)."""
    sizes = set()
    for fx in plan.fixups:
        for K in range(plan.ndims):
            if fx.flip[K]:
                sizes.add(fx.src_window[K][1] - fx.src_window[K][0])
    return tuple(sorted(sizes))


def _slab(plan: MergePlan, s: int, face: int, window) -> tuple:
    """Static index tuple (with a leading lane axis) of a face slab."""
    idx = _face_slab_idx(plan.ndims, face, window,
                         plan.superblocks[s].shape)
    return (slice(None),) + idx


def _mb_matvec_into(out_refs, plan: MergePlan, diags, offs, xs,
                    flip_mats=None):
    """Merged matvec WRITTEN INTO scratch refs: per-super-block roll stencil,
    then static seam-fixup corrections as ref slab read-modify-writes (Mosaic
    lowers neither scatter-add nor dynamic_update_slice on values, but ref
    stores with constant slices lower fine).  Mirrors
    block_merge.merged_apply, which is verified against stencil.domain_apply
    at plan build time.  Returns the matvec values re-read from the refs."""
    nd = plan.ndims
    nf = 2 * nd
    for s in range(len(plan.superblocks)):
        x = xs[s]
        y = diags[s] * x
        for f in range(nf):
            d = f // 2
            ax = x.ndim - 1 - d
            shift = 1 if f % 2 == 0 else x.shape[ax] - 1
            y = y + offs[s][f] * pltpu.roll(x, shift, axis=ax)
        out_refs[s][:] = y
    for fx in plan.fixups:
        slab = _slab(plan, fx.sb, fx.face, fx.window)
        src_slab = _slab(plan, fx.src_sb, fx.src_face, fx.src_window)
        wrap_slab = _slab(plan, fx.sb, fx.face ^ 1, fx.window)
        src = xs[fx.src_sb][src_slab]
        lanes = src.shape[0]
        for K in range(nd):
            if fx.flip[K]:
                # Mosaic has no `rev` lowering: reverse via a static
                # anti-diagonal permutation matmul on the (tiny) slab
                # (pallas kernels cannot capture array constants, so the
                # reversal matrices arrive as inputs via ``flip_mats``)
                ax = 1 + _array_axis(nd, K)
                n_ax = src.shape[ax]
                J = flip_mats[n_ax]
                rows = []
                for l in range(lanes):
                    sl = src[l]                       # 2D slab
                    if ax == 1:
                        rows.append(jnp.dot(J, sl,
                                    precision=lax.Precision.HIGHEST))
                    else:
                        rows.append(jnp.dot(sl, J,
                                    precision=lax.Precision.HIGHEST))
                src = jnp.stack(rows, axis=0)
        delta = offs[fx.sb][fx.face][slab] * (src - xs[fx.sb][wrap_slab])
        out_refs[fx.sb][slab] = out_refs[fx.sb][slab] + delta
    return [r[:] for r in out_refs]


def _np_roll_matvec(plan: MergePlan, diags, offs, xs):
    """XLA-land twin of _mb_matvec (jnp.roll instead of pltpu.roll) for the
    small-lane fallback loop."""
    nd = plan.ndims
    nf = 2 * nd
    ys = []
    for s in range(len(plan.superblocks)):
        x = xs[s]
        y = diags[s] * x
        for f in range(nf):
            d = f // 2
            ax = x.ndim - 1 - d
            y = y + offs[s][f] * jnp.roll(x, 1 if f % 2 == 0 else -1, axis=ax)
        ys.append(y)
    for fx in plan.fixups:
        # lane axis absent on this path (per-lane vmap)
        slab = _face_slab_idx(nd, fx.face, fx.window,
                              plan.superblocks[fx.sb].shape)
        src_slab = _face_slab_idx(nd, fx.src_face, fx.src_window,
                                  plan.superblocks[fx.src_sb].shape)
        wrap_slab = _face_slab_idx(nd, fx.face ^ 1, fx.window,
                                   plan.superblocks[fx.sb].shape)
        src = xs[fx.src_sb][src_slab]
        for K in range(nd):
            if fx.flip[K]:
                src = jnp.flip(src, axis=_array_axis(nd, K))
        delta = offs[fx.sb][fx.face][slab] * (src - xs[fx.sb][wrap_slab])
        ys[fx.sb] = ys[fx.sb].at[slab].add(delta)
    return ys


def _kernel(plan: MergePlan, *refs, tol2_sum: float, maxiter: int,
            stall_iters: int, precondition: bool, return_best: bool,
            warm_start: bool, coarse=None):
    """All refs carry a leading lane axis (except the strip restriction
    matrices, which are lane-shared).  Ref layout per super-block s:
    inputs  [b_s, diag_s, off_s(2*nd refs), x0_s], then (with ``coarse``, a
    StripPlan) [Einv, P_space0, P_space1, ...], then outputs
    [x_s...]*S + [iters, rs], then scratch [r_s, p_s, best_s, Av_s]*S
    (+ [rc] with coarse)."""
    nd = plan.ndims
    nf = 2 * nd
    S = len(plan.superblocks)
    per_in = 3 + nf
    b_refs = [refs[s * per_in] for s in range(S)]
    diag_refs = [refs[s * per_in + 1] for s in range(S)]
    off_refs = [refs[s * per_in + 2:s * per_in + 2 + nf] for s in range(S)]
    x0_refs = [refs[s * per_in + 2 + nf] for s in range(S)]
    base = S * per_in
    n_coarse = 0 if coarse is None else 1 + len(coarse.spaces)
    if coarse is not None:
        einv_ref = refs[base]
        P_refs = list(refs[base + 1:base + n_coarse])
    base += n_coarse
    flip_sizes = _flip_sizes(plan)
    flip_mats = {n: refs[base + i][:] for i, n in enumerate(flip_sizes)}
    base += len(flip_sizes)
    x_out = list(refs[base:base + S])
    iters_ref, rs_ref = refs[base + S], refs[base + S + 1]
    scr = refs[base + S + 2:]
    r_refs = list(scr[0:S])
    p_refs = list(scr[S:2 * S])
    best_refs = list(scr[2 * S:3 * S])
    av_refs = list(scr[3 * S:4 * S])
    if coarse is not None:
        rc_ref = scr[4 * S]

    dt = b_refs[0].dtype
    diags = [d[:] for d in diag_refs]
    offs = [[o[:] for o in off_refs[s]] for s in range(S)]
    bs = [b[:] for b in b_refs]
    tiny = jnp.asarray(1e-30, dt)
    inv_diags = ([jnp.asarray(1.0, dt) / d for d in diags]
                 if precondition else None)
    lanes = bs[0].shape[0]

    def apply_precond(rs_fields):
        """z = D^-1 r (+ strip-coarse correction W Einv W^T r): small
        per-lane dots and keepdims sums only -- no reshapes (Mosaic)."""
        zs = ([iv * r for iv, r in zip(inv_diags, rs_fields)]
              if precondition else list(rs_fields))
        if coarse is None:
            return zs
        for l in range(lanes):
            for sp_i, space in enumerate(coarse.spaces):
                r = rs_fields[space.sb][l]
                P = P_refs[sp_i][:]
                if space.axis == 0:
                    t = jnp.sum(r, axis=1, keepdims=True)          # (H,1)
                    c = jnp.dot(P, t, precision=lax.Precision.HIGHEST)
                else:
                    t = jnp.sum(r, axis=0, keepdims=True)          # (1,W)
                    c = lax.dot_general(P, t, (((1,), (1,)), ((), ())),
                                        precision=lax.Precision.HIGHEST)
                rc_ref[l, space.offset:space.offset + space.n, :] = c
        rc = rc_ref[:]
        einv = einv_ref[:]
        backs = {s_i: [] for s_i in range(S)}
        for l in range(lanes):
            xc = jnp.dot(einv[l], rc[l], precision=lax.Precision.HIGHEST)
            per_sb = {}
            for sp_i, space in enumerate(coarse.spaces):
                P = P_refs[sp_i][:]
                seg = xc[space.offset:space.offset + space.n, :]    # (n,1)
                back = lax.dot_general(P, seg, (((0,), (0,)), ((), ())),
                                       precision=lax.Precision.HIGHEST)
                if space.axis != 0:
                    back = jnp.transpose(back)                      # (1,W)
                per_sb[space.sb] = back
            for s_i in range(S):
                backs[s_i].append(per_sb.get(s_i))
        for s_i in range(S):
            if backs[s_i][0] is not None:
                corr = jnp.stack(backs[s_i], axis=0)   # (lanes,H,1)/(lanes,1,W)
                zs[s_i] = zs[s_i] + corr
        return zs

    def joint(parts):
        out = parts[0]
        for pp in parts[1:]:
            out = out + pp
        return out

    if warm_start:
        x0s = [x[:] for x in x0_refs]
        Ax0 = _mb_matvec_into(av_refs, plan, diags, offs, x0s,
                              flip_mats=flip_mats)
        rs_f = [b - a for b, a in zip(bs, Ax0)]
        for s in range(S):
            x_out[s][:] = x0s[s]
    else:
        rs_f = bs
        for s in range(S):
            x_out[s][:] = jnp.zeros_like(bs[s])
    zs = apply_precond(rs_f)
    for s in range(S):
        r_refs[s][:] = rs_f[s]
        p_refs[s][:] = zs[s]
        best_refs[s][:] = x_out[s][:]
    rz0 = joint([_lane_sum(r * z) for r, z in zip(rs_f, zs)]).astype(dt)
    rs0 = joint([_lane_sum(r * r) for r in rs_f]).astype(dt)

    tol2 = jnp.asarray(tol2_sum, dt)
    zero = jnp.asarray(0, dt)

    def cond(carry):
        it, rz, rsum, best_rs, best_it = carry
        active = jnp.logical_and(rsum > tol2, it - best_it < stall_iters)
        return jnp.logical_and(it < maxiter, jnp.any(active))

    def body(carry):
        it, rz, rsum, best_rs, best_it = carry
        xs = [x[:] for x in x_out]
        ps = [p[:] for p in p_refs]
        done = jnp.logical_or(rsum <= tol2, it - best_it >= stall_iters)
        recompute = (it + 1) % 100 == 0
        # one matvec per iteration: A@p normally, A@x on the maintenance
        # iteration that refreshes the true residual (linsolve.cg parity)
        Av = _mb_matvec_into(av_refs, plan, diags, offs,
                              [jnp.where(recompute, x, p)
                               for x, p in zip(xs, ps)],
                              flip_mats=flip_mats)
        denom = joint([_lane_sum(p * a)
                       for p, a in zip(ps, Av)]).astype(dt)
        alpha = jnp.where(
            jnp.logical_or(done, recompute), zero,
            rz / jnp.where(jnp.abs(denom) < tiny, tiny, denom))
        xs = [x + alpha * p for x, p in zip(xs, ps)]
        for s in range(S):
            x_out[s][:] = xs[s]
        rs_new_f = [jnp.where(recompute, b - a, r[:] - alpha * a)
                    for b, a, r in zip(bs, Av, r_refs)]
        for s in range(S):
            r_refs[s][:] = rs_new_f[s]
        zs = apply_precond(rs_new_f)
        rz_new = joint([_lane_sum(r * z)
                        for r, z in zip(rs_new_f, zs)]).astype(dt)
        rsum_new = joint([_lane_sum(r * r) for r in rs_new_f]).astype(dt)
        beta = jnp.where(
            done, zero, rz_new / jnp.where(jnp.abs(rz) < tiny, tiny, rz))
        for s in range(S):
            p_refs[s][:] = zs[s] + beta * ps[s]
        better = jnp.logical_and(rsum_new < best_rs, jnp.logical_not(done))
        if return_best:
            for s in range(S):
                best_refs[s][:] = jnp.where(better, xs[s], best_refs[s][:])
        best_rs = jnp.where(better, rsum_new, best_rs)
        best_it = jnp.where(better, it + 1, best_it)
        return it + 1, rz_new, rsum_new, best_rs, best_it

    it0 = jnp.asarray(0, jnp.int32)
    best_it0 = jnp.zeros_like(rz0, jnp.int32)
    it, rz, rsum, best_rs, _ = jax.lax.while_loop(
        cond, body, (it0, rz0, rs0, rs0, best_it0))

    converged = rsum <= tol2
    if return_best:
        for s in range(S):
            x_out[s][:] = jnp.where(converged, x_out[s][:], best_refs[s][:])
        rsum = jnp.where(converged, rsum, best_rs)
    iters_ref[:] = jnp.broadcast_to(
        jnp.full_like(rsum, it, dtype=jnp.int32), bs[0].shape)
    rs_ref[:] = jnp.broadcast_to(rsum, bs[0].shape)


def _kernel_bicg(plan: MergePlan, *refs, tol2_sum: float, maxiter: int,
                 stall_iters: int, precondition: bool, return_best: bool,
                 warm_start: bool):
    """Right-preconditioned BiCGStab twin of ``_kernel`` (for the
    non-symmetric advection/scalar systems and the full non-orthogonal
    pressure mode).  Semantics match ``linsolve.bicgstab``: per-lane freeze,
    stall patience, return-best, Jacobi RIGHT preconditioning (r stays the
    TRUE residual, so the stopping criterion is unchanged).

    Ref layout per super-block s: inputs [b_s, diag_s, off_s(2*nd), x0_s],
    then flip matrices, then outputs [x_s]*S + [iters, rs], then scratch
    [r_s, rhat_s, p_s, v_s, t_s, best_s]*S."""
    nd = plan.ndims
    nf = 2 * nd
    S = len(plan.superblocks)
    per_in = 3 + nf
    b_refs = [refs[s * per_in] for s in range(S)]
    diag_refs = [refs[s * per_in + 1] for s in range(S)]
    off_refs = [refs[s * per_in + 2:s * per_in + 2 + nf] for s in range(S)]
    x0_refs = [refs[s * per_in + 2 + nf] for s in range(S)]
    base = S * per_in
    flip_sizes = _flip_sizes(plan)
    flip_mats = {n: refs[base + i][:] for i, n in enumerate(flip_sizes)}
    base += len(flip_sizes)
    x_out = list(refs[base:base + S])
    iters_ref, rs_ref = refs[base + S], refs[base + S + 1]
    scr = refs[base + S + 2:]
    r_refs = list(scr[0:S])
    rhat_refs = list(scr[S:2 * S])
    p_refs = list(scr[2 * S:3 * S])
    v_refs = list(scr[3 * S:4 * S])
    t_refs = list(scr[4 * S:5 * S])
    best_refs = list(scr[5 * S:6 * S])

    dt = b_refs[0].dtype
    diags = [d[:] for d in diag_refs]
    offs = [[o[:] for o in off_refs[s]] for s in range(S)]
    bs = [b[:] for b in b_refs]
    tiny = jnp.asarray(1e-30, dt)
    inv_diags = ([jnp.asarray(1.0, dt) / d for d in diags]
                 if precondition else None)

    def precond(fields):
        if inv_diags is None:
            return list(fields)
        return [iv * f for iv, f in zip(inv_diags, fields)]

    def joint(parts):
        out = parts[0]
        for pp in parts[1:]:
            out = out + pp
        return out

    if warm_start:
        x0s = [x[:] for x in x0_refs]
        Ax0 = _mb_matvec_into(v_refs, plan, diags, offs, x0s,
                              flip_mats=flip_mats)
        rs_f = [b - a for b, a in zip(bs, Ax0)]
        for s in range(S):
            x_out[s][:] = x0s[s]
    else:
        rs_f = bs
        for s in range(S):
            x_out[s][:] = jnp.zeros_like(bs[s])
    for s in range(S):
        r_refs[s][:] = rs_f[s]
        rhat_refs[s][:] = rs_f[s]
        p_refs[s][:] = rs_f[s]
        best_refs[s][:] = x_out[s][:]
    rho0 = joint([_lane_sum(r * r) for r in rs_f]).astype(dt)  # <r_hat, r>
    rs0 = rho0  # <r, r> == rho at init (r_hat = r)

    tol2 = jnp.asarray(tol2_sum, dt)
    zero = jnp.asarray(0, dt)

    def guard(x):
        return jnp.where(jnp.abs(x) < tiny, tiny, x)

    def cond(carry):
        it, rho, rsum, best_rs, best_it = carry
        active = jnp.logical_and(rsum > tol2, it - best_it < stall_iters)
        return jnp.logical_and(it < maxiter, jnp.any(active))

    def body(carry):
        it, rho, rsum, best_rs, best_it = carry
        done = jnp.logical_or(rsum <= tol2, it - best_it >= stall_iters)
        not_done = jnp.logical_not(done)
        xs = [x[:] for x in x_out]
        ps = [p[:] for p in p_refs]
        rhats = [rh[:] for rh in rhat_refs]
        rrs = [r[:] for r in r_refs]
        p_hat = precond(ps)
        vs = _mb_matvec_into(v_refs, plan, diags, offs, p_hat,
                             flip_mats=flip_mats)
        denom = joint([_lane_sum(rh * v)
                       for rh, v in zip(rhats, vs)]).astype(dt)
        alpha = jnp.where(done, zero, rho / guard(denom))
        ss = [r - alpha * v for r, v in zip(rrs, vs)]
        s_hat = precond(ss)
        ts = _mb_matvec_into(t_refs, plan, diags, offs, s_hat,
                             flip_mats=flip_mats)
        tt = joint([_lane_sum(t * t) for t in ts]).astype(dt)
        ts_dot = joint([_lane_sum(t * s) for t, s in zip(ts, ss)]).astype(dt)
        omega = jnp.where(done, zero, ts_dot / guard(tt))
        xs = [x + alpha * ph + omega * sh
              for x, ph, sh in zip(xs, p_hat, s_hat)]
        r_new = [s - omega * t for s, t in zip(ss, ts)]
        for s_i in range(S):
            x_out[s_i][:] = xs[s_i]
            r_refs[s_i][:] = r_new[s_i]
        rho_new = jnp.where(done, rho, joint(
            [_lane_sum(rh * r) for rh, r in zip(rhats, r_new)]).astype(dt))
        beta = jnp.where(
            done, zero, (rho_new / guard(rho)) * (alpha / guard(omega)))
        for s_i in range(S):
            p_refs[s_i][:] = (r_new[s_i]
                              + beta * (ps[s_i] - omega * vs[s_i]))
        rs_new = jnp.where(done, rsum, joint(
            [_lane_sum(r * r) for r in r_new]).astype(dt))
        better = jnp.logical_and(rs_new < best_rs, not_done)
        if return_best:
            for s_i in range(S):
                best_refs[s_i][:] = jnp.where(better, xs[s_i],
                                              best_refs[s_i][:])
        best_rs = jnp.where(better, rs_new, best_rs)
        best_it = jnp.where(better, it + 1, best_it)
        return it + 1, rho_new, rs_new, best_rs, best_it

    it0 = jnp.asarray(0, jnp.int32)
    best_it0 = jnp.zeros_like(rho0, jnp.int32)
    it, rho, rsum, best_rs, _ = jax.lax.while_loop(
        cond, body, (it0, rho0, rs0, rs0, best_it0))

    converged = rsum <= tol2
    if return_best:
        for s in range(S):
            x_out[s][:] = jnp.where(converged, x_out[s][:], best_refs[s][:])
        rsum = jnp.where(converged, rsum, best_rs)
    iters_ref[:] = jnp.broadcast_to(
        jnp.full_like(rsum, it, dtype=jnp.int32), bs[0].shape)
    rs_ref[:] = jnp.broadcast_to(rsum, bs[0].shape)


@functools.lru_cache(maxsize=None)
def _lane_solver(plan: MergePlan, tol2_sum: float, maxiter: int,
                 stall_iters: int, precondition: bool, return_best: bool,
                 warm_start: bool, interpret: bool, coarse=None,
                 algo: str = "cg", lane_leading: bool = False):
    """(lanes, *spatial)-per-super-block lockstep solver with the custom_vmap
    lane-folding rule (cg_pallas._lane_solver generalized to S arrays).

    Flat argument convention (custom_vmap needs positional arrays):
    ``solve(*args)`` with args = [b_s, diag_s, off_s0..off_s{nf-1}, x0_s]
    repeated for each super-block s.

    ``algo``: "cg" (the SPD pressure kernel) or "bicgstab" (non-symmetric
    advection/scalar systems; no coarse support).  ``lane_leading``: every
    arg already carries an explicit leading lane axis (the BiCGStab caller
    folds solve COMPONENTS onto it); the base case then runs the kernel on
    those lanes directly and the vmap rule flattens (batch, comps, ...) ->
    (batch*comps, ...) lanes."""
    nd = plan.ndims
    nf = 2 * nd
    S = len(plan.superblocks)
    per = 3 + nf
    assert algo in ("cg", "bicgstab")
    assert coarse is None or algo == "cg"

    def _split(args):
        bs = [args[s * per] for s in range(S)]
        diags = [args[s * per + 1] for s in range(S)]
        offs = [list(args[s * per + 2:s * per + 2 + nf]) for s in range(S)]
        x0s = [args[s * per + 2 + nf] for s in range(S)]
        return bs, diags, offs, x0s

    def call_kernel(args):
        # with coarse, args = [per-sb inputs...] + [Einv (lanes,K,K)]; the
        # lane-shared strip restriction matrices are appended here (static)
        bs, diags, offs, x0s = _split(args)
        if algo == "cg":
            kernel = functools.partial(
                _kernel, plan, tol2_sum=tol2_sum, maxiter=maxiter,
                stall_iters=stall_iters, precondition=precondition,
                return_best=return_best, warm_start=warm_start,
                coarse=coarse)
        else:
            kernel = functools.partial(
                _kernel_bicg, plan, tol2_sum=tol2_sum, maxiter=maxiter,
                stall_iters=stall_iters, precondition=precondition,
                return_best=return_best, warm_start=warm_start)
        operands = list(args)
        if coarse is not None:
            from fluidgym_tpu.solver.coarse_strips import restriction_matrices
            operands += [jnp.asarray(P)
                         for P in restriction_matrices(plan, coarse)]
        operands += [jnp.asarray(np.eye(n, dtype=np.float32)[::-1].copy())
                     for n in _flip_sizes(plan)]
        out_shape = tuple(
            jax.ShapeDtypeStruct(b.shape, b.dtype) for b in bs
        ) + (
            jax.ShapeDtypeStruct(bs[0].shape, jnp.int32),
            jax.ShapeDtypeStruct(bs[0].shape, bs[0].dtype),
        )
        scratch = ([pltpu.VMEM(b.shape, b.dtype) for b in bs]
                   * (4 if algo == "cg" else 6))
        if coarse is not None:
            lanes = bs[0].shape[0]
            scratch = scratch + [
                pltpu.VMEM((lanes, coarse.K, 1), bs[0].dtype)]
        outs = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(operands),
            out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                            for _ in range(S + 2)),
            scratch_shapes=scratch,
            interpret=interpret,
        )(*operands)
        return list(outs[:S]), outs[S], outs[S + 1]

    def xla_loop_lanes(args):
        """Small-lane fallback: vmapped XLA CG over the merged roll+fixup
        operator (same operator, per-iteration HBM streaming; the same
        Jacobi(+strip-coarse) preconditioner as the kernel path)."""
        from fluidgym_tpu.solver import linsolve

        n_total = sum(int(np.prod(_sb_array_shape(plan, s)))
                      for s in range(S))
        tol = float(np.sqrt(tol2_sum / n_total))

        def one(*args1):
            bs, diags, offs, x0s = _split(args1)
            einv_l = args1[S * per] if coarse is not None else None

            def mv(xs):
                return tuple(_np_roll_matvec(plan, diags, offs, list(xs)))

            precond = None
            if precondition and coarse is not None:
                from fluidgym_tpu.solver import coarse_strips as cs

                def precond(rr):
                    z = tuple(r / d for r, d in zip(rr, diags))
                    xc = jnp.dot(einv_l, cs.restrict(plan, coarse, rr),
                                 precision=lax.Precision.HIGHEST)
                    zc = cs.prolong(plan, coarse, xc)
                    return tuple(zz + cc for zz, cc in zip(z, zc))
            elif precondition:
                precond = (lambda rr: tuple(r / d
                                            for r, d in zip(rr, diags)))
            if algo == "cg":
                x, info = linsolve.cg(
                    mv, tuple(bs), x0=tuple(x0s) if warm_start else None,
                    tol=tol, maxiter=maxiter, return_best=return_best,
                    precond=precond, stall_iters=stall_iters)
            else:
                x, info = linsolve.bicgstab(
                    mv, tuple(bs), x0=tuple(x0s) if warm_start else None,
                    tol=tol, maxiter=maxiter, return_best=return_best,
                    precond=precond, stall_iters=stall_iters)
            rs = (info.residual.astype(bs[0].dtype) ** 2) * n_total
            return tuple(x) + (info.iterations, rs)

        outs = jax.vmap(one)(*args)
        xs = list(outs[:S])
        iters, rs = outs[S], outs[S + 1]
        expand = lambda a: a.reshape((a.shape[0],) + (1,) * nd)
        full = lambda a, ref: jnp.broadcast_to(expand(a), ref.shape)
        return (xs, full(iters, xs[0]).astype(jnp.int32), full(rs, xs[0]))

    def solve_lanes(args):
        lanes = args[0].shape[0]
        dtype = args[0].dtype
        chunk = min(lanes, _max_lanes(plan, dtype, algo))
        total_cells = sum(_padded_cells(_sb_array_shape(plan, s))
                          for s in range(S))
        if (chunk < min(lanes, 8)) and total_cells < _BIG_LANE_CELLS:
            return xla_loop_lanes(args)
        if chunk >= lanes:
            return call_kernel(args)
        n_chunks = -(-lanes // chunk)
        pad = n_chunks * chunk - lanes

        def chunked(a, is_diag):
            if pad:
                fill = jnp.ones if (is_diag and precondition) else jnp.zeros
                a = jnp.concatenate(
                    [a, fill((pad,) + a.shape[1:], a.dtype)], axis=0)
            return a.reshape((n_chunks, chunk) + a.shape[1:])

        cargs = tuple(chunked(a, i % per == 1)
                      for i, a in enumerate(args))

        def one_chunk(aa):
            xs, iters, rs = call_kernel(list(aa))
            return tuple(xs) + (iters, rs)

        outs = jax.lax.map(one_chunk, cargs)
        unchunk = lambda a: a.reshape(
            (n_chunks * chunk,) + a.shape[2:])[:lanes]
        xs = [unchunk(o) for o in outs[:S]]
        return xs, unchunk(outs[S]), unchunk(outs[S + 1])

    def _lane_stat(a):
        return a.reshape(a.shape[0], -1)[:, 0]

    @jax.custom_batching.custom_vmap
    def solve(*args):
        if lane_leading:
            # args already carry a (component) lane axis; keep it in the
            # outputs so the caller reduces over components itself
            xs, iters, rs = solve_lanes(list(args))
            return tuple(xs) + (_lane_stat(iters), _lane_stat(rs))
        xs, iters, rs = call_kernel([a[None] for a in args])
        return (tuple(x[0] for x in xs)
                + (_lane_stat(iters)[0], _lane_stat(rs)[0]))

    @solve.def_vmap
    def _vmap_rule(axis_size, in_batched, *args):
        def bcast(a, is_b):
            return a if is_b else jnp.broadcast_to(a, (axis_size,) + a.shape)

        args = [bcast(a, f) for a, f in zip(args, in_batched)]
        if lane_leading:
            # (batch, comps, *spatial) -> (batch*comps, *spatial) lanes
            comps = args[0].shape[1]
            flat = [a.reshape((axis_size * comps,) + a.shape[2:])
                    for a in args]
            xs, iters, rs = solve_lanes(flat)
            xs = [x.reshape((axis_size, comps) + x.shape[1:]) for x in xs]
            out = (tuple(xs)
                   + (_lane_stat(iters).reshape(axis_size, comps),
                      _lane_stat(rs).reshape(axis_size, comps)))
            return out, tuple(True for _ in out)
        xs, iters, rs = solve_lanes(args)
        out = tuple(xs) + (_lane_stat(iters), _lane_stat(rs))
        return out, tuple(True for _ in out)

    return solve


def fused_cg_mb(
    plan: MergePlan,
    diags,
    offs,
    bs,
    x0s=None,
    *,
    tol: float,
    maxiter: int = 5000,
    stall_iters: int = 250,
    precondition: bool = True,
    return_best: bool = True,
    coarse_strips: bool = False,
    interpret: bool = False,
) -> tuple[tuple[Array, ...], SolveInfo]:
    """Whole-solve lockstep CG on a merged multi-block stencil operator.

    ``diags``/``offs``/``bs``/``x0s`` are per-super-block tuples in
    ``block_merge.pack_ops`` / ``pack_fields`` layout (``offs[s]`` has
    shape ``(2*ndims, *spatial_s)``).  Returns ``(xs, SolveInfo)`` with
    linsolve.cg semantics.  Safe under one level of ``jax.vmap``.
    """
    S = len(plan.superblocks)
    dt = bs[0].dtype
    n = sum(b.size for b in bs)
    tol2_sum = float(tol) * float(tol) * n
    warm = x0s is not None
    x0s_in = list(bs) if x0s is None else list(x0s)
    if not interpret and jax.default_backend() == "cpu":
        interpret = True

    sp = None
    if coarse_strips:
        from fluidgym_tpu.solver.coarse_strips import (coarse_inverse,
                                                       strip_plan)
        sp = strip_plan(plan)
    solver = _lane_solver(plan, tol2_sum, int(maxiter), int(stall_iters),
                          bool(precondition), bool(return_best), warm,
                          bool(interpret), sp)
    nf = 2 * plan.ndims
    args = []
    for s in range(S):
        args.append(bs[s])
        args.append(diags[s])
        args.extend(offs[s][f] for f in range(nf))
        args.append(x0s_in[s])
    if sp is not None:
        merged_ops = tuple((diags[s], offs[s]) for s in range(S))
        # stop_gradient: the preconditioner setup must not enter backward
        # graphs (guess-like by the implicit-function property)
        args.append(jax.lax.stop_gradient(
            coarse_inverse(plan, sp, merged_ops)))
    outs = solver(*args)
    xs, iters, rs = list(outs[:S]), outs[S], outs[S + 1]

    b_zero = jnp.all(jnp.stack([jnp.all(b == 0) for b in bs]))
    xs = tuple(jnp.where(b_zero, jnp.zeros_like(x), x) for x in xs)
    converged = jnp.logical_or(rs <= jnp.asarray(tol2_sum, dt), b_zero)
    info = SolveInfo(converged=converged, iterations=iters,
                     residual=jnp.sqrt(rs / n))
    return xs, info


def fused_bicgstab_mb(
    plan: MergePlan,
    diags,
    offs,
    bs,
    x0s=None,
    *,
    tol: float,
    maxiter: int = 5000,
    stall_iters: int = 250,
    precondition: bool = True,
    return_best: bool = True,
    interpret: bool = False,
) -> tuple[tuple[Array, ...], SolveInfo]:
    """Whole-solve lockstep BiCGStab on a merged multi-block stencil
    operator (the non-symmetric advection/scalar systems; also serves the
    full non-orthogonal pressure mode when its cross terms are folded into
    the stencil).

    ``bs``/``x0s`` are per-super-block arrays with a leading solve-COMPONENT
    axis ``(C, *spatial)`` -- the joint velocity solve's components (C=1
    for scalar channels).  Components share the operator (``diags``/``offs``
    are spatial-only and broadcast) and run as independent kernel lanes
    with a PER-COMPONENT NORM2_NORMALIZED stopping criterion -- the
    reference's per-RHS convergence (bicgstab_solver_kernel.cu), tighter
    than linsolve.bicgstab's joint criterion.  Under ``jax.vmap`` the env
    batch folds onto the same lane axis (batch*C lanes).

    Returns ``(xs, SolveInfo)`` with ``xs`` per-super-block ``(C,
    *spatial)`` and the info aggregated over components (converged = all,
    iterations = max, residual = joint RMSE)."""
    S = len(plan.superblocks)
    dt = bs[0].dtype
    C = bs[0].shape[0]
    n_lane = sum(int(np.prod(b.shape[1:])) for b in bs)
    tol2_sum = float(tol) * float(tol) * n_lane
    warm = x0s is not None
    x0s_in = list(bs) if x0s is None else list(x0s)
    if not interpret and jax.default_backend() == "cpu":
        interpret = True

    solver = _lane_solver(plan, tol2_sum, int(maxiter), int(stall_iters),
                          bool(precondition), bool(return_best), warm,
                          bool(interpret), None, "bicgstab", True)
    nf = 2 * plan.ndims

    def comp_bcast(a):
        return jnp.broadcast_to(a[None], (C,) + a.shape)

    args = []
    for s in range(S):
        args.append(bs[s])
        args.append(comp_bcast(diags[s]))
        args.extend(comp_bcast(offs[s][f]) for f in range(nf))
        args.append(x0s_in[s])
    outs = solver(*args)
    xs, iters, rs = list(outs[:S]), outs[S], outs[S + 1]

    b_zero = jnp.all(jnp.stack([jnp.all(b == 0) for b in bs]))
    xs = tuple(jnp.where(b_zero, jnp.zeros_like(x), x) for x in xs)
    conv_c = rs <= jnp.asarray(tol2_sum, dt)
    converged = jnp.logical_or(jnp.all(conv_c, axis=0), b_zero)
    info = SolveInfo(
        converged=converged,
        iterations=jnp.max(iters, axis=0),
        residual=jnp.sqrt(jnp.sum(rs, axis=0) / (n_lane * C)),
    )
    return xs, info
