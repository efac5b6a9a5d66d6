"""Two-level strip-aggregation coarse space for merged pressure solves.

The slow CG modes of the elongated cylinder/airfoil pressure systems are
smooth along the LONG axis of each super-block (the wake's downstream
direction, the annulus' angular direction): condition grows as (L/h)^2.
This module builds, per super-block, a piecewise-constant STRIP basis
partitioning that long axis, and assembles the exact Galerkin coarse matrix
``E = W^T A W`` of the merged operator (rolls + seam fixups) in closed form
-- 1D coefficient reductions for the in-space band, small static scatters
for the seam couplings -- so no fine-grid matvecs are spent on setup.

The preconditioner ``z = D^{-1} r + W (E + eps I)^{-1} W^T r`` (additive
Jacobi + coarse correction; SPD since A is SPSD) is applied INSIDE the
batch-resident kernel (ops/cg_pallas_mb.py): restriction/prolongation are
small matmuls and keepdims reductions, the coarse solve is one dense
(K, K) x (K, 1) product with the precomputed inverse -- all Mosaic-lowerable
(the 2D-patch alternative needs an in-kernel flatten, which Mosaic rejects).

Measured on the res-56 cylinder operator (CPU prototype, tol 1e-5): cold
192 -> 149 iterations, warm-started 39 -> 19.  Strips were chosen over 2D
patches (warm 17) because they need no in-kernel reshape.

Reference analogue: none -- the reference's CUDA CG is Jacobi-only
(cg_solver_kernel.cu); this is TPU headroom, not parity.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from fluidgym_tpu.core.domain import face_axis
from fluidgym_tpu.solver.block_merge import MergePlan, _face_slab_idx

__all__ = ["StripPlan", "strip_plan", "assemble_E", "coarse_inverse",
           "restrict", "prolong"]


@dataclass(frozen=True)
class StripSpace:
    sb: int
    axis: int      # ARRAY axis of the sb field that the strips partition
    width: int     # strip width (last strip may be short)
    n: int         # number of strips
    offset: int    # offset of this space in the concatenated coarse vector


@dataclass(frozen=True)
class StripPlan:
    K: int
    spaces: tuple[StripSpace, ...]

    def space_of(self, sb: int) -> StripSpace | None:
        for sp in self.spaces:
            if sp.sb == sb:
                return sp
        return None


def _sb_array_shapes(plan: MergePlan):
    nd = plan.ndims
    return [tuple(sb.shape[D] for D in range(nd - 1, -1, -1))
            for sb in plan.superblocks]


@functools.lru_cache(maxsize=None)
def strip_plan(plan: MergePlan, width: int = 16) -> StripPlan | None:
    """One strip space per 2D super-block, partitioning its LONGEST array
    axis.  Returns None for 3D plans (the resident kernel rejects them on
    VMEM grounds anyway)."""
    if plan.ndims != 2:
        return None
    spaces = []
    off = 0
    for s, shape in enumerate(_sb_array_shapes(plan)):
        axis = 0 if shape[0] >= shape[1] else 1
        dim = shape[axis]
        n = -(-dim // width)
        if n < 2:
            continue
        spaces.append(StripSpace(sb=s, axis=axis, width=width, n=n,
                                 offset=off))
        off += n
    if not spaces:
        return None
    return StripPlan(K=off, spaces=tuple(spaces))


@functools.lru_cache(maxsize=None)
def _restriction_matrix(dim: int, width: int, n: int):
    P = np.zeros((n, dim), np.float32)
    for i in range(n):
        P[i, i * width:(i + 1) * width] = 1.0
    return P


def restriction_matrices(plan: MergePlan, sp: StripPlan):
    """Static (n, dim) indicator matrices per space (numpy fp32)."""
    shapes = _sb_array_shapes(plan)
    return [
        _restriction_matrix(shapes[s.sb][s.axis], s.width, s.n)
        for s in sp.spaces
    ]


# ---------------------------------------------------------------------------
# restriction / prolongation (jnp; used by tests and the XLA fallback --
# the kernel re-implements them with lane-unrolled dots)
# ---------------------------------------------------------------------------

def restrict(plan: MergePlan, sp: StripPlan, rs):
    """(K,) coarse vector = W^T r for per-sb fields ``rs``."""
    Ps = restriction_matrices(plan, sp)
    segs = []
    for s, P in zip(sp.spaces, Ps):
        r = rs[s.sb]
        t = r.sum(axis=1 - s.axis)      # reduce the other array axis
        segs.append(jnp.asarray(P) @ t)
    return jnp.concatenate(segs)


def prolong(plan: MergePlan, sp: StripPlan, xc):
    """Per-sb fields = W xc."""
    Ps = restriction_matrices(plan, sp)
    shapes = _sb_array_shapes(plan)
    outs = [jnp.zeros(sh, xc.dtype) for sh in shapes]
    for s, P in zip(sp.spaces, Ps):
        seg = jnp.asarray(P).T @ xc[s.offset:s.offset + s.n]   # (dim,)
        outs[s.sb] = outs[s.sb] + (seg[:, None] if s.axis == 0
                                   else seg[None, :])
    return tuple(outs)


# ---------------------------------------------------------------------------
# exact Galerkin coarse matrix E = W^T A W of the merged operator
# ---------------------------------------------------------------------------

def _seam_pairs(plan: MergePlan, sp: StripPlan):
    """Static (rows, cols, picks) index lists for every fixup's contribution
    to E: fixup cell i couples strip ``rows[i]`` (target side) to strip
    ``cols[i]`` (source side), REPLACING the roll-wrapped coupling to strip
    ``wraps[i]`` -- merged_apply computes off*(src - wrapped) on the slab.
    Returns per-fixup (slab_idx, rows, cols, wraps) with slab_idx the static
    nd-index tuple of the slab inside the target sb."""
    nd = plan.ndims
    shapes = _sb_array_shapes(plan)
    out = []
    for fx in plan.fixups:
        su = sp.space_of(fx.sb)
        sv = sp.space_of(fx.src_sb)
        slab = _face_slab_idx(nd, fx.face, fx.window, plan.superblocks[fx.sb].shape)
        src_slab = _face_slab_idx(nd, fx.src_face, fx.src_window,
                                  plan.superblocks[fx.src_sb].shape)
        wrap_slab = _face_slab_idx(nd, fx.face ^ 1, fx.window,
                                   plan.superblocks[fx.sb].shape)
        # enumerate slab cell coordinates (static numpy)
        tgt_idx = np.stack(np.meshgrid(
            *[np.arange(sl.start, sl.stop) for sl in slab], indexing="ij"),
            axis=-1).reshape(-1, nd)
        # source enumeration aligned with the target's: merged_apply reads
        # the src slab, flips it along flipped array axes, and adds it
        # elementwise onto the target slab -- flip the coordinate grids the
        # same way before flattening
        src_grids = np.meshgrid(
            *[np.arange(sl.start, sl.stop) for sl in src_slab], indexing="ij")
        for K_ax in range(nd):
            if fx.flip[K_ax]:
                arr_ax = nd - 1 - K_ax
                src_grids = [np.flip(g, axis=arr_ax) for g in src_grids]
        src_idx = np.stack(src_grids, axis=-1).reshape(-1, nd)
        wrap_idx = np.stack(np.meshgrid(
            *[np.arange(sl.start, sl.stop) for sl in wrap_slab], indexing="ij"),
            axis=-1).reshape(-1, nd)
        rows = (np.zeros(len(tgt_idx), np.int64) if su is None else
                su.offset + np.minimum(tgt_idx[:, su.axis] // su.width,
                                       su.n - 1))
        cols = (np.zeros(len(src_idx), np.int64) if sv is None else
                sv.offset + np.minimum(src_idx[:, sv.axis] // sv.width,
                                       sv.n - 1))
        wraps = (np.zeros(len(wrap_idx), np.int64) if su is None else
                 su.offset + np.minimum(wrap_idx[:, su.axis] // su.width,
                                        su.n - 1))
        out.append((slab, su is not None, sv is not None, rows, cols, wraps))
    return out


def assemble_E(plan: MergePlan, sp: StripPlan, merged_ops):
    """Exact dense ``E = W^T A W`` (K, K) from the merged (diag, off) pairs.

    In-space band terms come from 1D reductions of the coefficient fields;
    seam fixups contribute small static-indexed scatters.  Differentiable
    and vmap-safe (everything is jnp on the per-lane coefficients).

    NOTE full-fp32 matmul precision is forced throughout: on TPU the default
    bf16-multiply matmul puts ~1e-2 relative error into E, and the
    regularized inverse amplifies it into preconditioner noise that STALLS
    CG (measured: no iteration cut + lost convergence at the res-56
    flagship; exact on CPU)."""
    Ps = restriction_matrices(plan, sp)
    dt = merged_ops[0][0].dtype
    K = sp.K
    E = jnp.zeros((K, K), dt)
    nd = plan.ndims
    for s, Pnp in zip(sp.spaces, Ps):
        diag, off = merged_ops[s.sb]
        a = s.axis                      # strip axis (array axis)
        o = 1 - a                       # reduced axis
        # faces whose roll moves along the STRIP axis shift the strip id;
        # all others keep it.  array axis of face f is (nd-1) - f//2.
        shift_faces = [f for f in range(2 * nd) if (nd - 1 - f // 2) == a]
        keep_faces = [f for f in range(2 * nd) if (nd - 1 - f // 2) != a]
        m_keep = diag.sum(axis=o)
        for f in keep_faces:
            m_keep = m_keep + off[f].sum(axis=o)
        P = jnp.asarray(Pnp)
        Eb = jnp.dot(P * m_keep[None, :], P.T,
                     precision=jax.lax.Precision.HIGHEST)
        for f in shift_faces:
            m = off[f].sum(axis=o)
            # roll +1 (f even) reads index i-1: cell i couples to i-1, so
            # the source indicator is P shifted by +1: P_src[b,h] = P[b,h-1]
            shift = 1 if f % 2 == 0 else -1
            P_src = jnp.asarray(np.roll(Pnp, shift, axis=1))
            Eb = Eb + jnp.dot(P * m[None, :], P_src.T,
                              precision=jax.lax.Precision.HIGHEST)
        E = E.at[s.offset:s.offset + s.n, s.offset:s.offset + s.n].add(Eb)
    # seam fixups: off*(src - wrapped) on the slab
    for (slab, has_u, has_v, rows, cols, wraps), fx in zip(
            _seam_pairs(plan, sp), plan.fixups):
        if not has_u:
            continue
        off_slab = merged_ops[fx.sb][1][fx.face][slab].reshape(-1)
        if has_v:
            E = E.at[rows, cols].add(off_slab)
        E = E.at[rows, wraps].add(-off_slab)
    return E


def coarse_inverse(plan: MergePlan, sp: StripPlan, merged_ops,
                   eps_rel: float = 1e-6):
    """Regularized dense inverse of E (the strip basis is rank-deficient by
    the constant mode shared with null(A); eps keeps it SPD)."""
    with jax.default_matmul_precision("float32"):
        E = assemble_E(plan, sp, merged_ops)
        eps = eps_rel * jnp.trace(E) / sp.K
        return jnp.linalg.inv(E + eps * jnp.eye(sp.K, dtype=E.dtype))
