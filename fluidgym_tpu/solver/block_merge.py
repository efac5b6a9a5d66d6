"""Topology canonicalization: merge multi-block domains into few axis-aligned
super-blocks with identity seams.

Multi-block O/C-grids (cylinder, airfoil) store their blocks in per-block
local frames: adjacent blocks are rotated copies, and the CONNECTED halo
exchange (`stencil._halo`) pays a transpose/flip per seam per matvec.  On TPU
that layout is hostile twice over: the per-seam relayouts defeat fusion, and
the whole-solve-resident Pallas CG (`ops/cg_pallas.py`) cannot express
transposed gathers between VMEM refs.

This pass rewrites the TOPOLOGY instead of the kernels: it BFS-assigns each
block a dihedral transform (axis permutation + reversals) that places every
block in one shared canonical frame, then merges chains of face-adjacent
blocks into larger rectangles ("super-blocks").  The result for the 5-block
cylinder O-grid is two super-blocks -- the closed annulus (whose ring seams
become a plain periodic roll) and the wake -- coupled by ONE axis-aligned,
windowed, identity-orientation seam.  The linear operator is unchanged: the
merge is a permutation P of unknowns, and ``merged_apply`` computes
``P A P^T`` exactly (seam coefficients land on the concatenated faces, FIXED
faces keep their zero off-coefficients, so rolls + a static-slice fixup per
residual seam reproduce `stencil.domain_apply` bit-for-bit in fp64).

Every plan is numerically SELF-CHECKED at build time on random coefficient
fields (numpy, fp64) against a direct mirror of the reference halo semantics
(`stencil._halo`, reference computeConnectedPos, kernel.cu:342); a topology
whose plan fails the check is simply not merged (callers fall back to the
generic multi-block path), so a wrong plan can never corrupt physics.

Used by `solver/piso._solve` to route multi-block pressure solves through the
batch-resident fused CG kernel; see `ops/cg_pallas_mb.py`.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

from fluidgym_tpu.core.domain import BoundKind, DomainTopo, face_axis

__all__ = ["MergePlan", "Placement", "SeamFixup", "merge_plan",
           "trivial_plan", "pack_fields", "unpack_fields", "pack_ops",
           "merged_apply", "set_merged_xla_solves",
           "merged_xla_solves_enabled"]

#: Routing mode for MERGED-FRAME solves on the plain XLA path (no Pallas):
#: multi-block topologies whose solves did not route to a resident kernel
#: (flip-seam C-grids under "auto", VMEM-too-big plans, CPU) run the
#: blockwise Krylov loop with a matvec of 6 small blocks + per-seam
#: transposed halo exchanges; in the merged frame the same solve is 3
#: contiguous roll-stencils + static slab fixups -- identical iterates (the
#: merge is an exact permutation), fewer/larger fused ops per iteration.
#: "auto" = flip-seam (non-identity) plans only, i.e. exactly the
#: topologies the resident kernels decline (airfoil C-grids); identity-seam
#: plans keep their resident-kernel routing, and single-block topologies
#: are unaffected.  True = all plans with a merge plan; False = off.
#: Ships OFF pending the hardware A/B (scripts/merged_xla_ab.py).
_XLA_MODE = False


def set_merged_xla_solves(enabled) -> None:
    """True/False/"auto": see ``_XLA_MODE`` above."""
    global _XLA_MODE
    if enabled not in (True, False, "auto"):
        raise ValueError(
            f"set_merged_xla_solves expects True, False, or 'auto'; "
            f"got {enabled!r}")
    _XLA_MODE = enabled


def merged_xla_solves_enabled():
    """False, True (all plans), or "auto" (non-identity-seam plans only)."""
    import os

    env = os.environ.get("FLUIDGYM_MERGED_XLA_SOLVES", "").strip().lower()
    if env in ("0", "false", "off"):
        return False
    if env in ("1", "true", "on"):
        return True
    if env == "auto":
        return "auto"
    return _XLA_MODE


# ---------------------------------------------------------------------------
# plan structures (static python data; hashable)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Placement:
    """One original block placed in the canonical frame of its super-block."""

    block: int
    perm: tuple[int, ...]    # local physical axis d -> canonical axis perm[d]
    inv: tuple[int, ...]     # 1 if local axis d runs reversed in canonical
    offset: tuple[int, ...]  # canonical cell offset (per canonical axis)
    shape: tuple[int, ...]   # canonical extents (per canonical axis)


@dataclass(frozen=True)
class SuperBlockPlan:
    shape: tuple[int, ...]          # canonical extents (per physical axis)
    members: tuple[Placement, ...]


@dataclass(frozen=True)
class SeamFixup:
    """One directional residual-seam correction.

    The merged matvec computes rolls as if every face wrapped periodically;
    for cells in ``window`` of face ``face`` of super-block ``sb`` the wrapped
    value is wrong and must be replaced by the source super-block's boundary
    layer: ``y[slab] += off[face][slab] * (src - wrapped)``.  All slices are
    static; ``flip`` marks tangential axes whose direction reverses across
    the seam (canonical-frame reversal -- present only when the seam's loop
    holonomy is a reflection, e.g. a C-grid wake cut).
    """

    sb: int
    face: int
    window: tuple[tuple[int, int], ...]      # (lo, hi) per canonical axis;
                                             # the face axis entry is ignored
    src_sb: int
    src_face: int                            # source's own seam face
    src_window: tuple[tuple[int, int], ...]
    flip: tuple[bool, ...]                   # per canonical axis


@dataclass(frozen=True)
class MergePlan:
    ndims: int
    superblocks: tuple[SuperBlockPlan, ...]
    fixups: tuple[SeamFixup, ...]

    @property
    def identity_seams(self) -> bool:
        return all(not any(fx.flip) for fx in self.fixups)


# ---------------------------------------------------------------------------
# transform helpers (numpy/jax-agnostic via the xp module argument)
# ---------------------------------------------------------------------------

def _array_axis(rank: int, d: int) -> int:
    """Array axis of physical axis d (spatial axes ordered (z,)y,x)."""
    return rank - 1 - d


def _transform_array(xp, a, perm, inv):
    """Map a pure-spatial local array into the canonical frame."""
    n = len(perm)
    inv_perm = [0] * n
    for d, D in enumerate(perm):
        inv_perm[D] = d
    order = [_array_axis(n, inv_perm[D]) for D in range(n - 1, -1, -1)]
    a = xp.transpose(a, order)
    for d in range(n):
        if inv[d]:
            a = xp.flip(a, axis=_array_axis(n, perm[d]))
    return a


def _untransform_array(xp, a, perm, inv):
    n = len(perm)
    for d in range(n):
        if inv[d]:
            a = xp.flip(a, axis=_array_axis(n, perm[d]))
    order = [_array_axis(n, perm[d]) for d in range(n - 1, -1, -1)]
    return xp.transpose(a, order)


def _member_slices(pl: Placement, rank: int):
    idx = [slice(None)] * rank
    for D in range(len(pl.offset)):
        idx[_array_axis(rank, D)] = slice(pl.offset[D],
                                          pl.offset[D] + pl.shape[D])
    return tuple(idx)


def _canonical_face(pl: Placement, local_face: int) -> int:
    """Canonical face index of a member's local face."""
    d, u = face_axis(local_face), local_face & 1
    return 2 * pl.perm[d] + (u ^ pl.inv[d])


def _local_face(pl: Placement, canonical_face: int) -> int:
    D, u = face_axis(canonical_face), canonical_face & 1
    d = pl.perm.index(D)
    return 2 * d + (u ^ pl.inv[d])


# ---------------------------------------------------------------------------
# plan construction
# ---------------------------------------------------------------------------

def _place_blocks(topo: DomainTopo):
    """BFS over CONNECTED seams assigning canonical transforms + offsets.

    Returns (placements, residual_pairs): placements per block (in one global
    canonical frame, offsets possibly negative before normalization), and the
    seam pairs (b, f) whose adjacency is NOT realized by the placement
    geometry (ring/cut closures) and so must survive as residual seams.
    """
    nd = topo.ndims
    nb = len(topo.blocks)
    placements: list[Placement | None] = [None] * nb

    def _extents(b: int, perm) -> tuple[int, ...]:
        # topo shapes are array-ordered (z,)y,x; extent along canonical D
        shp = topo.blocks[b].shape
        ext = [0] * nd
        for d in range(nd):
            ext[perm[d]] = shp[_array_axis(nd, d)]
        return tuple(ext)

    placements[0] = Placement(0, tuple(range(nd)), (0,) * nd, (0,) * nd,
                              _extents(0, tuple(range(nd))))
    queue = [0]
    residual: list[tuple[int, int]] = []
    seen_pairs: set[tuple[int, int]] = set()
    while queue:
        b = queue.pop(0)
        pb = placements[b]
        for f, spec in enumerate(topo.blocks[b].faces):
            if spec.kind != BoundKind.CONNECTED:
                continue
            if (b, f) in seen_pairs:
                continue
            c = spec.connected_block
            cf = spec.axes[0]
            seen_pairs.add((b, f))
            seen_pairs.add((c, cf))
            d = face_axis(f)
            # the placement this seam implies for the neighbor (shared
            # derivation with residual-seam classification)
            cand = _implied_placement(pb, f, spec, _extents)
            if placements[c] is None:
                placements[c] = cand
                queue.append(c)
            else:
                have = placements[c]
                if (have.perm, have.inv, have.offset) != (
                        cand.perm, cand.inv, cand.offset):
                    residual.append((b, f))
            # tangential extents must match (full-face seams only)
            for i in range(1, nd):
                k = (d + i) % nd
                K = pb.perm[k]
                pc = placements[c]
                if pc.shape[K] != pb.shape[K]:
                    return None, None
    if any(p is None for p in placements):
        return None, None  # disconnected CONNECTED graph; not handled
    return placements, residual


def _group_superblocks(placements):
    """Group placements into perfect rectangles via greedy face-adjacent
    merging; returns (groups, bounds) or None if some group is not a perfect
    rectangle (total member area != bounding box area)."""
    nd = len(placements[0].perm)
    groups = [[p] for p in placements]

    def bbox(group):
        lo = [min(p.offset[D] for p in group) for D in range(nd)]
        hi = [max(p.offset[D] + p.shape[D] for p in group) for D in range(nd)]
        return lo, hi

    def area(lo, hi):
        out = 1
        for a, b in zip(lo, hi):
            out *= b - a
        return out

    def rectangular(group):
        lo, hi = bbox(group)
        return area(lo, hi) == sum(
            area(p.offset, [o + s for o, s in zip(p.offset, p.shape)])
            for p in group)

    merged = True
    while merged:
        merged = False
        for i in range(len(groups)):
            for j in range(i + 1, len(groups)):
                g = groups[i] + groups[j]
                if rectangular(g):
                    groups[i] = g
                    del groups[j]
                    merged = True
                    break
            if merged:
                break
    if not all(rectangular(g) for g in groups):
        return None
    out = []
    for g in groups:
        lo, hi = bbox(g)
        members = tuple(
            Placement(p.block, p.perm, p.inv,
                      tuple(o - l for o, l in zip(p.offset, lo)), p.shape)
            for p in g)
        out.append(SuperBlockPlan(tuple(h - l for l, h in zip(lo, hi)),
                                  members))
    return tuple(out)


def _implied_placement(pb: Placement, f: int, spec, ext_fn) -> Placement:
    """The placement seam (pb, f) DEMANDS for its neighbor -- the same
    derivation `_place_blocks` uses on tree edges.  Residual seams compare
    this against the neighbor's actual placement: equal up to offset = a ring
    wrap; reflected ``inv`` bits = a flip seam (C-grid cut)."""
    nd = len(pb.perm)
    c = spec.connected_block
    d, u = face_axis(f), f & 1
    a0, u0 = spec.axes[0] >> 1, spec.axes[0] & 1
    perm_c = [0] * nd
    inv_c = [0] * nd
    perm_c[a0] = pb.perm[d]
    inv_c[a0] = u0 ^ 1 ^ u ^ pb.inv[d]
    for i in range(1, nd):
        k = (d + i) % nd
        ai, upi = spec.axes[i] >> 1, spec.axes[i] & 1
        perm_c[ai] = pb.perm[k]
        inv_c[ai] = pb.inv[k] ^ upi
    ext_c = ext_fn(c, tuple(perm_c))
    D = pb.perm[d]
    off_c = list(pb.offset)
    if u ^ pb.inv[d]:
        off_c[D] = pb.offset[D] + pb.shape[D]
    else:
        off_c[D] = pb.offset[D] - ext_c[D]
    return Placement(c, tuple(perm_c), tuple(inv_c), tuple(off_c), ext_c)


def _build_fixups(topo: DomainTopo, sbs) -> tuple[SeamFixup, ...] | None:
    """Residual fixups: every CONNECTED seam side whose neighbor value is NOT
    already produced by the merged roll (concatenation adjacency or an exact
    full-orientation ring wrap).  Emitted per side (directional)."""
    nd = topo.ndims
    place = {}
    for si, sb in enumerate(sbs):
        for pl in sb.members:
            place[pl.block] = (si, pl)

    def ext_fn(b: int, perm) -> tuple[int, ...]:
        shp = topo.blocks[b].shape
        ext = [0] * nd
        for d in range(nd):
            ext[perm[d]] = shp[_array_axis(nd, d)]
        return tuple(ext)

    def window(pl: Placement, F: int):
        return tuple((pl.offset[D], pl.offset[D] + pl.shape[D])
                     for D in range(nd))

    fixups = []
    for b, bt in enumerate(topo.blocks):
        si, pl = place[b]
        for f, spec in enumerate(bt.faces):
            if spec.kind != BoundKind.CONNECTED:
                continue
            c = spec.connected_block
            sj, pc = place[c]
            cf = spec.axes[0]
            F = _canonical_face(pl, f)
            CF = _canonical_face(pc, cf)
            D, u = face_axis(F), F & 1
            implied = _implied_placement(pl, f, spec, ext_fn)
            if implied.perm != pc.perm:
                return None  # rotated residual seam; not expressible by rolls
            if si == sj and (implied.inv, implied.offset) == (pc.inv,
                                                              pc.offset):
                continue  # realized by in-super-block concatenation
            # the roll-form fixup (and the ring-wrap shortcut) needs both
            # seam slabs on their super-block BOUNDARY along a shared axis
            my_edge = pl.offset[D] + (pl.shape[D] if u else 0)
            sb_ext = sbs[si].shape[D]
            CD = face_axis(CF)
            nbr_edge = pc.offset[CD] + (pc.shape[CD] if CF & 1 else 0)
            src_ext = sbs[sj].shape[CD]
            if my_edge != (sb_ext if u else 0):
                return None
            if nbr_edge != (src_ext if CF & 1 else 0):
                return None
            if CD != D:
                return None  # rotated residual seam; needs a transpose
            # NOTE same-parity seams (CF & 1 == u, both faces on the same
            # side) are legal: a C-grid wake cut joins the axis0-high edges
            # of the upper and lower halves with a reflection, which the
            # ``flip`` bits express -- the wrap-subtraction is local to the
            # target super-block either way
            flip = tuple(
                bool(implied.inv[pc.perm.index(K)] ^ pc.inv[pc.perm.index(K)])
                if K != D else False
                for K in range(nd))
            if (si == sj and not any(flip)
                    and window(pl, F)[:D] + window(pl, F)[D + 1:]
                    == window(pc, CF)[:D] + window(pc, CF)[D + 1:]):
                continue  # exact ring wrap: the merged roll is already right
            fixups.append(SeamFixup(
                sb=si, face=F, window=window(pl, F),
                src_sb=sj, src_face=CF, src_window=window(pc, CF),
                flip=flip))
    return tuple(fixups)


@functools.lru_cache(maxsize=None)
def merge_plan(topo: DomainTopo) -> MergePlan | None:
    """Build (and numerically self-check) the merge plan for ``topo``.

    Returns None when the topology has no CONNECTED faces (nothing to merge),
    cannot be canonicalized to axis-aligned identity-orientation form, or
    fails the random-coefficient numerical self-check.
    """
    if len(topo.blocks) < 2:
        return None
    if not any(s.kind == BoundKind.CONNECTED
               for bt in topo.blocks for s in bt.faces):
        return None
    placed, _residual = _place_blocks(topo)
    if placed is None:
        return None
    sbs = _group_superblocks(placed)
    if sbs is None:
        return None
    fixups = _build_fixups(topo, sbs)
    if fixups is None:
        return None
    plan = MergePlan(ndims=topo.ndims, superblocks=sbs, fixups=fixups)
    if not _self_check(topo, plan):
        return None
    return plan


@functools.lru_cache(maxsize=None)
def trivial_plan(topo: DomainTopo) -> MergePlan | None:
    """Identity plan for SINGLE-block topologies with no CONNECTED faces:
    one super-block, no fixups, identity placement.  Lets the merged
    resident kernels (ops/cg_pallas_mb) serve single-block domains (RBC,
    TCF) without a separate kernel -- rolls handle PERIODIC faces and FIXED
    faces carry zero off-coefficients, exactly as in the single-block
    kernel (ops/cg_pallas).  Self-checked like merge_plan."""
    if len(topo.blocks) != 1:
        return None
    bt = topo.blocks[0]
    if any(s.kind == BoundKind.CONNECTED for s in bt.faces):
        return None
    nd = topo.ndims
    shape_pa = tuple(bt.shape[::-1])  # per PHYSICAL axis extents
    plan = MergePlan(
        ndims=nd,
        superblocks=(SuperBlockPlan(
            shape=shape_pa,
            members=(Placement(block=0, perm=tuple(range(nd)),
                               inv=(0,) * nd, offset=(0,) * nd,
                               shape=shape_pa),)),),
        fixups=(),
    )
    if not _self_check(topo, plan):
        return None
    return plan


# ---------------------------------------------------------------------------
# pack / unpack / apply  (xp = numpy or jax.numpy)
# ---------------------------------------------------------------------------

def pack_fields(plan: MergePlan, xs, xp=None):
    """Scatter per-block spatial fields into per-super-block canonical
    arrays.  ``xs`` is the usual BlockVec tuple (pure spatial arrays)."""
    if xp is None:
        import jax.numpy as xp
    nd = plan.ndims
    out = []
    for sb in plan.superblocks:
        parts = {}
        for pl in sb.members:
            parts[pl] = _transform_array(xp, xs[pl.block], pl.perm, pl.inv)
        buf = xp.zeros(tuple(sb.shape[D] for D in range(nd - 1, -1, -1)),
                       parts[sb.members[0]].dtype)
        for pl in sb.members:
            buf = _assign(xp, buf, _member_slices(pl, nd), parts[pl])
        out.append(buf)
    return tuple(out)


def _assign(xp, buf, idx, val):
    if xp is np:
        buf[idx] = val
        return buf
    return buf.at[idx].set(val)


def unpack_fields(plan: MergePlan, ys, xp=None):
    if xp is None:
        import jax.numpy as xp
    nd = plan.ndims
    n_blocks = sum(len(sb.members) for sb in plan.superblocks)
    out = [None] * n_blocks
    for si, sb in enumerate(plan.superblocks):
        for pl in sb.members:
            sub = ys[si][_member_slices(pl, nd)]
            out[pl.block] = _untransform_array(xp, sub, pl.perm, pl.inv)
    return tuple(out)


def pack_ops(plan: MergePlan, ops, xp=None):
    """Merge per-block StencilOps into per-super-block (diag, off) pairs.
    ``off`` keeps the (2*ndims, *spatial) face layout in the CANONICAL frame:
    canonical face F gathers each member's local face component."""
    if xp is None:
        import jax.numpy as xp
    nd = plan.ndims
    out = []
    for sb in plan.superblocks:
        diag = pack_fields_one(plan, sb, tuple(op.diag for op in ops), xp)
        offs = []
        for F in range(2 * nd):
            offs.append(pack_fields_one(
                plan, sb,
                tuple(op.off[_local_face(pl, F)]
                      for pl in sb.members
                      for op in (ops[pl.block],)),
                xp, per_member=True))
        out.append((diag, xp.stack(offs, axis=0)))
    return tuple(out)


def pack_fields_one(plan: MergePlan, sb: SuperBlockPlan, fields, xp,
                    per_member: bool = False):
    """Pack one canonical array for one super-block.  ``fields`` is indexed
    by original block id (per_member=False) or by member order
    (per_member=True)."""
    nd = plan.ndims
    first = fields[0 if per_member else sb.members[0].block]
    buf = xp.zeros(tuple(sb.shape[D] for D in range(nd - 1, -1, -1)),
                   first.dtype)
    for mi, pl in enumerate(sb.members):
        src = fields[mi if per_member else pl.block]
        buf = _assign(xp, buf, _member_slices(pl, nd),
                      _transform_array(xp, src, pl.perm, pl.inv))
    return buf


def _face_slab_idx(rank: int, F: int, window, shape):
    """Static index tuple for the boundary slab of face F windowed to
    ``window`` on the tangential axes."""
    D, u = face_axis(F), F & 1
    idx = [slice(None)] * rank
    for K in range(len(window)):
        ax = _array_axis(rank, K)
        if K == D:
            idx[ax] = slice(shape[K] - 1, shape[K]) if u else slice(0, 1)
        else:
            idx[ax] = slice(window[K][0], window[K][1])
    return tuple(idx)


def merged_apply(plan: MergePlan, merged_ops, ys, xp=None):
    """Matvec in the merged frame: per-super-block roll stencil + residual
    seam fixups.  Bit-equivalent (fp64) to ``stencil.domain_apply`` composed
    with pack/unpack."""
    if xp is None:
        import jax.numpy as xp
    nd = plan.ndims
    out = []
    for si, sb in enumerate(plan.superblocks):
        diag, off = merged_ops[si]
        y = diag * ys[si]
        for F in range(2 * nd):
            ax = _array_axis(nd, face_axis(F))
            y = y + off[F] * xp.roll(ys[si], 1 if F % 2 == 0 else -1,
                                     axis=ax)
        out.append(y)
    for fx in plan.fixups:
        sbp = plan.superblocks[fx.sb]
        src_sbp = plan.superblocks[fx.src_sb]
        rank = nd
        slab = _face_slab_idx(rank, fx.face, fx.window, sbp.shape)
        src_slab = _face_slab_idx(rank, fx.src_face, fx.src_window,
                                  src_sbp.shape)
        # the value the roll wrapped in (to subtract): the opposite edge of
        # the SAME window on this super-block
        wrap_slab = _face_slab_idx(rank, fx.face ^ 1, fx.window, sbp.shape)
        off_si = merged_ops[fx.sb][1]
        src = ys[fx.src_sb][src_slab]
        for K in range(nd):
            if fx.flip[K]:
                src = xp.flip(src, axis=_array_axis(rank, K))
        delta = off_si[fx.face][slab] * (src - ys[fx.sb][wrap_slab])
        out[fx.sb] = _assign(
            xp, out[fx.sb], slab, out[fx.sb][slab] + delta)
    return tuple(out)


# ---------------------------------------------------------------------------
# numerical self-check (numpy, fp64)
# ---------------------------------------------------------------------------

def _np_halo(other, spec, f, ndims):
    """Numpy mirror of stencil._halo (reference computeConnectedPos)."""
    rank = other.ndim
    a0, up0 = spec.axes[0] >> 1, spec.axes[0] & 1
    idx = [slice(None)] * rank
    idx[_array_axis(rank, a0)] = slice(-1, None) if up0 else slice(0, 1)
    slab = other[tuple(idx)]
    d = face_axis(f)
    src_for_my = {d: a0}
    for i in range(1, ndims):
        k = (d + i) % ndims
        ai, upi = spec.axes[i] >> 1, spec.axes[i] & 1
        if upi:
            slab = np.flip(slab, axis=_array_axis(rank, ai))
        src_for_my[k] = ai
    perm = list(range(rank))
    for k, a in src_for_my.items():
        perm[_array_axis(rank, k)] = _array_axis(rank, a)
    return np.transpose(slab, perm)


def _np_domain_apply(topo, ops_np, xs):
    nd = topo.ndims
    out = []
    for b, bt in enumerate(topo.blocks):
        diag, off = ops_np[b]
        y = diag * xs[b]
        for f in range(2 * nd):
            d = face_axis(f)
            ax = _array_axis(nd, d)
            nbr = np.roll(xs[b], 1 if f % 2 == 0 else -1, axis=ax)
            spec = bt.faces[f]
            if spec.kind == BoundKind.CONNECTED:
                vals = _np_halo(xs[spec.connected_block], spec, f, nd)
                idx = [slice(None)] * nd
                idx[ax] = slice(-1, None) if f % 2 else slice(0, 1)
                nbr[tuple(idx)] = vals
            y = y + off[f] * nbr
        out.append(y)
    return out


def _self_check(topo: DomainTopo, plan: MergePlan) -> bool:
    rng = np.random.default_rng(0)
    nd = topo.ndims
    xs, ops_np = [], []
    for bt in topo.blocks:
        shape = bt.shape
        xs.append(rng.standard_normal(shape))
        diag = rng.standard_normal(shape)
        off = rng.standard_normal((2 * nd,) + shape)
        # FIXED/PERIODIC faces keep the production invariant: prescribed
        # faces carry zero off-coefficients (PERIODIC wraps are exercised
        # with nonzero off, as in production)
        for f, spec in enumerate(bt.faces):
            if spec.kind == BoundKind.FIXED:
                idx = [slice(None)] * nd
                idx[_array_axis(nd, face_axis(f))] = (
                    slice(-1, None) if f % 2 else slice(0, 1))
                off[(f,) + tuple(idx)] = 0.0
        ops_np.append((diag, off))

    ref = _np_domain_apply(topo, ops_np, xs)

    class _Op:
        def __init__(self, diag, off):
            self.diag, self.off = diag, off

    ops_like = tuple(_Op(d, o) for d, o in ops_np)
    ys = pack_fields(plan, tuple(xs), xp=np)
    mops = pack_ops(plan, ops_like, xp=np)
    got = merged_apply(plan, mops, ys, xp=np)
    back = unpack_fields(plan, got, xp=np)
    return all(np.allclose(r, g, rtol=1e-12, atol=1e-12)
               for r, g in zip(ref, back))
