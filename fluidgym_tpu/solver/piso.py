"""PISO time integration as pure jittable functions (multi-block capable).

TPU-native re-expression of the reference simulation driver
(``/root/reference/src/fluidgym/simulation/pict/PISOtorch_simulation.py``):

* ``piso_substep``  = ``_PISO_split_step`` with ``iterations=1``
  (PISOtorch_simulation.py:1431-2002): optional scalar advection solve ->
  velocity prediction solve -> ``corrector_steps`` pressure corrections;
* ``piso_adaptive_step`` = ``_PISO_adaptive_step``
  (PISOtorch_simulation.py:2004-2064): CFL-driven substepping, kept entirely
  on-device as a ``lax.while_loop`` (the reference syncs ``getMaxVelocity``
  to the host every substep -- the TPU build avoids that);
* ``piso_fixed_steps``: ``lax.scan`` over a static substep count -- the
  reverse-differentiable path for gradient-based control (replaces the
  reference's eager autograd through dynamic loops);
* ``make_divergence_free`` (PISOtorch_simulation.py:1320-1429): pressure
  projection of an initial velocity field with A=1, dt=1.

Linear systems are GLOBAL over all blocks (tuples of per-block arrays as the
Krylov vectors; inter-block coupling via halo exchange in the operator apply)
-- exactly the role of the reference's concatenated CSR system.

Differentiability is the default (no dual backend): linear solves are wrapped
in ``lax.custom_linear_solve``, which provides the implicit-function VJP
(transposed solve + coefficient gradients) that the reference hand-writes in
PISOtorch_diff.py:493-618.

Hooks: the reference's prep_fn registry (PISOtorch_simulation.py:1039-1050)
becomes a dict of pure ``state -> state`` callables keyed by the same phase
names (PRE, PRE_VELOCITY_SETUP, POST_VELOCITY_SETUP, POST_PRESSURE_RESULT,
POST), closed over statically at trace time.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, replace
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from fluidgym_tpu.core.domain import (
    BlockGeom,
    DomainState,
    DomainTopo,
)
from fluidgym_tpu.solver import linsolve
from fluidgym_tpu.solver import nonortho
from fluidgym_tpu.solver import stencil as st

Array = jax.Array

__all__ = ["SimConfig", "Hooks", "StepInfo", "piso_substep",
           "piso_substep_info", "piso_adaptive_step", "piso_fixed_steps",
           "single_step", "single_step_info", "make_divergence_free",
           "jit_make_divergence_free", "advect_static", "get_max_time_step"]

Hooks = dict[str, tuple[Callable[..., DomainState], ...]]

ADAPTIVE = -1


class StepInfo(NamedTuple):
    """Aggregated solver-convergence metadata for a (sub)step -- the signal
    the reference surfaces by raising ``LinsolveError`` and returning False
    from ``single_step`` (PISOtorch_diff.py:262-371, simulation.py:266-280).
    Here failure is data, not control flow (jitted programs cannot raise):
    envs expose these in the step ``info`` dict so callers can detect a
    diverged/stalled pressure solve instead of meeting silent NaNs."""

    pressure_converged: Array    # bool: AND over every pressure solve
    pressure_iterations: Array   # int32: total Krylov iterations (0 = untracked)
    pressure_residual: Array     # float: max normalized residual over solves
    advection_converged: Array   # bool: AND over velocity/scalar solves


def _info_identity(dtype) -> StepInfo:
    return StepInfo(
        pressure_converged=jnp.asarray(True),
        pressure_iterations=jnp.asarray(0, jnp.int32),
        pressure_residual=jnp.asarray(0.0, dtype),
        advection_converged=jnp.asarray(True),
    )


def combine_scan_infos(si: StepInfo) -> StepInfo:
    """Collapse a stacked ``StepInfo`` (e.g. the ys of a ``lax.scan`` over
    sim steps) into one: AND over converged flags, summed iterations, max
    residual."""
    return StepInfo(
        pressure_converged=jnp.all(si.pressure_converged),
        pressure_iterations=jnp.sum(si.pressure_iterations),
        pressure_residual=jnp.max(si.pressure_residual),
        advection_converged=jnp.all(si.advection_converged),
    )


def solver_info_dict(si: StepInfo) -> dict[str, Array]:
    """The env step ``info`` entries for solver health (reference raises
    LinsolveError instead; here failure is observable data)."""
    return {
        "pressure_converged": si.pressure_converged,
        "pressure_iterations": si.pressure_iterations,
        "pressure_residual": si.pressure_residual,
        "advection_converged": si.advection_converged,
    }


def _info_merge(a: StepInfo, b: StepInfo) -> StepInfo:
    return StepInfo(
        pressure_converged=jnp.logical_and(
            a.pressure_converged, b.pressure_converged),
        pressure_iterations=a.pressure_iterations + b.pressure_iterations,
        pressure_residual=jnp.maximum(a.pressure_residual, b.pressure_residual),
        advection_converged=jnp.logical_and(
            a.advection_converged, b.advection_converged),
    )


@dataclass(frozen=True)
class SimConfig:
    """Static solver configuration (subset of the reference Simulation's ~40
    ctor knobs, PISOtorch_simulation.py:489-595, that affect the computation;
    logging/output knobs live in the env layer)."""

    dt: float = 1.0
    substeps: int = 1  # ADAPTIVE (-1) or a positive static count
    corrector_steps: int = 2
    adaptive_cfl: float = 0.8
    advection_tol: float | None = None
    pressure_tol: float | None = None
    advection_maxiter: int = 5000
    pressure_maxiter: int = 5000
    normalize_pressure_result: bool = True
    pressure_return_best_result: bool = False
    pressure_time_step_normalized: bool = False
    velocity_corrector: str = "FD"
    # Accepted for reference parity (Simulation advect_use_BiCG); the
    # advection-diffusion matrix is non-symmetric, so BiCGStab is ALWAYS
    # used for advection/scalar solves regardless of this flag
    advection_use_bicg: bool = True
    # BiCGStab for the pressure system (reference pressure_use_BiCG).
    # Since the non-orthogonal pressure coupling moved fully to the RHS
    # (flux-form deferred), build_pressure_ops is exactly SPD and CG is
    # always safe -- this flag exists for parity/experiments only, and the
    # preconditioning/deflation options below do not apply to BiCGStab
    # (validated in __post_init__)
    pressure_use_bicg: bool = False
    advect_passive_scalar: bool = True
    # Upwind blend factor for the VELOCITY advection matrix (stencil.
    # build_advection_ops): 0 = the reference's central face interpolation,
    # 1 = first-order upwind.  Bounded stabilization for tiers whose cell
    # Peclet number makes the central scheme oscillate (documented
    # deviation; the reference is central-only and relies on fp64 solver
    # fallbacks it cannot disable).
    advection_upwind_blend: float = 0.0
    non_orthogonal: bool = False
    # Inner deferred non-orthogonal passes per pressure corrector (reference
    # pressure_non_ortho_steps, cylinder_env_base.py:316-317: 1 in 2D, 4 in
    # 3D).  Each extra pass rebuilds the deferred cross-term RHS from the
    # fresh solution and re-solves (warm-started from the previous pass), so
    # the part of the pressure error the tolerance cannot see -- the
    # one-iterate lag of the deferred correction -- shrinks geometrically.
    pressure_non_ortho_steps: int = 1
    # Solve the FULL non-orthogonal pressure system in one Krylov solve:
    # the matvec is the orthogonal stencil PLUS the flux-form cross-term
    # map (nonortho.deferred_rhs_flux applied to the UNKNOWN), so no part
    # of the cross coupling lags an iterate and the solver tolerance
    # controls the complete residual.  The operator is mildly non-symmetric
    # (~5% skew) -> Jacobi-preconditioned BiCGStab; deflation/coarse/
    # multigrid (CG-only) must be off.  This is STRONGER than the
    # reference's NON_ORTHO_MODE = CENTER_MATRIX|DIRECT_MATRIX|DIAGONAL_RHS
    # (PISOtorch_simulation.py:479-486): the reference still defers the
    # DIAGONAL corner terms, and its corner-form assembly measures
    # indefinite on the O-grid (min sym-eig -1.5e-3 at res 8) where the
    # flux-form total operator is PSD + constant null mode.  Default False:
    # the exactly-SPD fully-deferred form is faster and stable on the
    # easy/medium tiers; full mode is for the high-Re tiers where the
    # one-iterate deferred-correction lag on strong O-grid cross terms
    # (|beta|/|alpha| ~ 2.2) destabilizes the PISO coupling.
    pressure_non_ortho_full: bool = False
    max_substeps: int = 1000
    # True: wrap solves in lax.custom_linear_solve (implicit-function VJP,
    # reverse-differentiable). False: direct Krylov loops with WARM STARTS
    # from the previous iterate (the reference non-diff backend's
    # advect_use_prev_result / pressure_reuse_result,
    # PISOtorch_simulation.py:1436-1440) -- faster for RL stepping.
    differentiable: bool = True
    # Jacobi preconditioning of the (SPD) pressure solve
    pressure_precondition: bool = True
    # Coarse-space deflation initial guess for the pressure solves: project
    # the RHS onto per-block constant+linear modes and start CG from the
    # coarse solution.  Helps when the RHS carries strong block-scale
    # low-frequency content (rough/impulsive states: 125 -> 51 iterations
    # measured); at statistically steady flow the RHS is already smooth and
    # the coarse setup (~k matvecs/substep) is not amortized, so default OFF.
    pressure_deflation: bool = False
    # Warm-start the non-differentiable advection/scalar Krylov solves from
    # the previous field (reference advect_use_prev_result)
    warm_start: bool = True
    # Warm-starting the PRESSURE solve is off by default: the all-Neumann
    # Poisson system is near-singular, and an inherited low-frequency error
    # component is nearly invisible to the residual stopping criterion, so it
    # accumulates across substeps and destabilizes the coupled PISO iteration
    # (observed as a t~0.1 blow-up on the cylinder; cold starts are stable).
    pressure_warm_start: bool = False
    # Krylov stagnation patience for the pressure solves: stop when the best
    # residual has not improved for this many iterations.  Do not trim this
    # aggressively: on the airfoil (fp32-unreachable 1e-7 tolerance) patience
    # 120 is ~15% SLOWER end-to-end than 250 (poorer pressure solutions cost
    # more in subsequent coupled solves) and patience 60 diverges.
    pressure_stall_iters: int = 250
    # Additive 2-level preconditioner for the pressure CG: M^-1 r =
    # D^-1 r + W E^+ W^T r (Jacobi smoother + coarse-space solve over the
    # per-block constant+linear modes).  SPD, constant within a solve, and
    # the setup is stop_gradient-ed, so it is valid on both the RL and the
    # differentiable paths.  Targets cold-started / stagnation-bound solves
    # where the slow coarse modes dominate the iteration count.
    pressure_coarse_precondition: bool = False
    # Tile size of the AGGREGATION coarse space for the additive 2-level
    # pressure preconditioner (0 = use the constant+linear space above).
    # Each block is partitioned into tile^ndims index-space cells; the
    # coarse basis is the tile indicators, restriction is a pad+reshape
    # pooling, prolongation a repeat+crop, and the coarse solve one small
    # dense (k x k) matmul -- all MXU/VPU-friendly ops with none of the
    # V-cycle's latency-bound tiny levels.  Measured on the REAL Airfoil2D
    # pressure operator (scripts/airfoil_coarse_pc_probe.py, 4-decade
    # reduction): Jacobi 2299 iters, +const/linear 1613 (1.43x),
    # +agg16 1010 (2.28x), +agg8 767 (3.00x); an E built from a 10%%-
    # perturbed operator solves in 768, so the Galerkin coarse matrix is
    # built ONCE per env construction (ensure_agg_coarse_cache, host-side
    # eager, baked into the jitted step as constants) and only rebuilt when
    # the operator-defining config/viscosity changes.  With a populated
    # cache the aggregation space replaces the constant+linear space for
    # BOTH `pressure_coarse_precondition` and the `pressure_deflation` x0
    # space; without one the solver falls back to constant+linear.
    pressure_coarse_tile: int = 0
    # Geometric multigrid V-cycle preconditioner for the pressure CG
    # (solver/multigrid.py): Galerkin-coarsened stencil hierarchy with
    # damped-Jacobi smoothing, block-additive on multi-block domains.
    # Symmetric positive definite, setup stop_gradient-ed -- valid on both
    # the RL and differentiable paths.  Targets the fp32 stagnation floor of
    # the tight-tolerance 3D solves (tol 5e-7/1e-8), where plain Jacobi-PCG
    # ends by stall patience.  Supersedes pressure_coarse_precondition when
    # both are set.
    pressure_multigrid: bool = False
    mg_sweeps: int = 2
    mg_omega: float = 0.8
    mg_coarsest_sweeps: int = 24
    # Linear temporal extrapolation of the pressure warm start across
    # substeps: the first corrector of substep k starts from
    # p_k + (dt_k/dt_{k-1}) (p_k - p_{k-1}) instead of p_k.  Measured on the
    # developed res-24 cylinder: the extrapolated guess is 13-42x closer to
    # the converged pressure than the plain warm start.  The guess is chosen
    # against the plain warm start by ACTUAL residual (one matvec), so a
    # rough transient can never make it worse than the status quo.
    pressure_extrapolate: bool = False
    # Two-level strip-aggregation coarse correction inside the merged
    # resident CG kernel (ops/cg_pallas_mb.py + solver/coarse_strips.py):
    # deflates the smooth long-axis error modes of elongated multi-block
    # domains each iteration.  Only affects solves routed through the
    # merged kernel; ignored elsewhere.
    pressure_coarse_strips: bool = False
    # Residual-rescaled iterative refinement around the pressure solve
    # (linsolve.refined): restart the fp32 inner solver on the recomputed
    # true residual rescaled to unit RMS, accumulating the solution in a
    # compensated double-float pair.  Lifts the fp32 stagnation floor that
    # makes the tight tolerances (airfoil 1e-7, 3D 5e-7/1e-8) end by stall
    # patience: each restart multiplies the attainable residual by
    # ``pressure_refine_inner_tol``, so 2-3 restarts reach 1e-7+ without
    # burning stall iterations.  The reference escapes to an fp64 re-solve
    # instead (PISOtorch_diff.py:418-447) -- fp64 is not native on TPU.
    # 0 = off (single direct solve at ``pressure_tol``, status quo).
    pressure_refine_restarts: int = 0
    pressure_refine_inner_tol: float = 1e-3
    # Static bound on CFL substeps per env dt in DIFFERENTIABLE adaptive mode
    # (reverse-mode AD cannot differentiate a dynamic while_loop, so the
    # adaptive loop becomes a masked lax.scan of this fixed length; converged
    # iterations are no-ops via lax.cond).  Raise it if a differentiable
    # rollout needs more than this many substeps per cfg.dt.
    diff_adaptive_max_substeps: int = 8

    def __post_init__(self):
        if self.velocity_corrector not in ("FD",):
            raise NotImplementedError(
                "only the FD velocity corrector is implemented (the reference "
                "env presets all use velocity_corrector='FD')"
            )
        if (self.pressure_use_bicg or self.pressure_full_mode) and (
            self.pressure_deflation or self.pressure_coarse_precondition
            or self.pressure_multigrid
        ):
            raise ValueError(
                "pressure_deflation / pressure_coarse_precondition / "
                "pressure_multigrid require the CG pressure solver "
                "(pressure_use_bicg=False and pressure_non_ortho_full="
                "False); BiCGStab has no deflation/coarse support"
            )

    @property
    def pressure_full_mode(self) -> bool:
        """True when the pressure solve carries the FULL non-orthogonal
        cross-term map inside the matvec (non-symmetric -> BiCGStab)."""
        return self.non_orthogonal and self.pressure_non_ortho_full


def _run_hooks(hooks: Hooks | None, name: str, state: DomainState, **kw) -> DomainState:
    if hooks and name in hooks and hooks[name]:
        fns = hooks[name]
        if callable(fns):
            fns = (fns,)
        for fn in fns:
            state = fn(state, **kw)
    return state


def _fused_cg_usable(ops, topo: DomainTopo, coarse_fn) -> bool:
    """Dispatch gate for the fused whole-solve CG kernel (ops/cg_pallas.py):
    single block, no CONNECTED faces (rolls handle PERIODIC; FIXED faces are
    masked by off=0), scalar RHS, no additive coarse preconditioner, working
    set within VMEM, and a backend that compiles Pallas."""
    from fluidgym_tpu.core.domain import BoundKind
    from fluidgym_tpu.ops import cg_pallas

    if coarse_fn is not None or len(topo.blocks) != 1:
        return False
    if any(f.kind == BoundKind.CONNECTED for f in topo.blocks[0].faces):
        return False
    if ops[0].diag.ndim != topo.ndims:  # channel axes take the XLA path
        return False
    return (cg_pallas.fused_cg_enabled()
            and cg_pallas.fused_cg_eligible(
                topo.blocks[0].shape, topo.ndims, ops[0].diag.dtype))


def _fused_bicg_mb_plan(ops, topo: DomainTopo):
    """Dispatch gate for the merged-frame fused BiCGStab
    (ops/cg_pallas_mb.fused_bicgstab_mb): multi-block topologies with a
    VMEM-fitting merge plan route the non-symmetric advection/scalar
    solves through the resident kernel.  The operator must be a plain
    scalar stencil (channel-shaped diags take the XLA path); the RHS may
    carry a leading component axis (the joint velocity solve) -- components
    become kernel lanes.  Returns the MergePlan or None."""
    from fluidgym_tpu.ops import cg_pallas, cg_pallas_mb
    from fluidgym_tpu.solver import block_merge

    if ops[0].diag.ndim != topo.ndims:
        return None
    mode = cg_pallas_mb.fused_bicg_mb_enabled()
    if not cg_pallas.fused_cg_enabled() or mode is False:
        return None
    plan = (block_merge.merge_plan(topo) if len(topo.blocks) >= 2
            else block_merge.trivial_plan(topo))
    if plan is None or not cg_pallas_mb.fused_bicg_mb_eligible(
            plan, ops[0].diag.dtype):
        return None
    if mode == "auto" and not plan.identity_seams:
        return None
    return plan


def _fused_bicg_mb_solve(mplan, ops, b, topo: DomainTopo, *, tol, maxiter,
                         stall_iters, precondition, return_best, x0):
    """Pack (optionally component-leading) block fields into the merged
    frame, run the resident BiCGStab, and unpack."""
    from fluidgym_tpu.ops import cg_pallas_mb
    from fluidgym_tpu.solver import block_merge

    nblocks = len(topo.blocks)
    S = len(mplan.superblocks)
    leaves = list(b)
    chan = leaves[0].ndim - topo.ndims  # 0 (scalar) or 1 (components)
    C = leaves[0].shape[0] if chan else 1

    def pack(fields):
        if chan:
            per_c = [block_merge.pack_fields(
                mplan, tuple(f[c] for f in fields)) for c in range(C)]
            return tuple(jnp.stack([per_c[c][s] for c in range(C)], axis=0)
                         for s in range(S))
        packed = block_merge.pack_fields(mplan, tuple(fields))
        return tuple(p[None] for p in packed)

    mops = block_merge.pack_ops(mplan, ops)
    xs, inf = cg_pallas_mb.fused_bicgstab_mb(
        mplan, tuple(m[0] for m in mops), tuple(m[1] for m in mops),
        pack(b), x0s=None if x0 is None else pack(x0),
        tol=tol, maxiter=maxiter, stall_iters=stall_iters,
        precondition=precondition, return_best=return_best)
    per_c = [block_merge.unpack_fields(mplan, tuple(x[c] for x in xs))
             for c in range(C)]
    if chan:
        res = tuple(jnp.stack([per_c[c][bi] for c in range(C)], axis=0)
                    for bi in range(nblocks))
    else:
        res = tuple(per_c[0])
    return res, inf


def _merged_xla_plan(ops, topo: DomainTopo):
    """Dispatch gate for MERGED-FRAME solves on the plain XLA path
    (block_merge._XLA_MODE): used when no resident kernel took the solve.
    The merge is an exact permutation, so the Krylov iterates (and info)
    are identical to the blockwise path -- only the matvec shape changes
    (few contiguous roll-stencils + static slab fixups instead of many
    small blocks with transposed halo exchanges).  Returns the MergePlan
    or None."""
    from fluidgym_tpu.solver import block_merge

    if len(topo.blocks) < 2 or ops[0].diag.ndim != topo.ndims:
        return None
    mode = block_merge.merged_xla_solves_enabled()
    if mode is False:
        return None
    plan = block_merge.merge_plan(topo)
    if plan is None:
        return None
    if mode == "auto" and plan.identity_seams:
        return None  # identity-seam plans route to the resident kernels
    return plan


def _merged_xla_solve(xplan, ops, b, *, tol, maxiter, stall_iters,
                      precondition, return_best, x0, symmetric,
                      matvec_extra=None):
    """Run linsolve.cg/bicgstab in the merged super-block frame.

    ``b``/``x0`` may carry a leading component axis (joint velocity
    solves); components are packed separately and the merged matvec is
    vmapped over them (merged_apply's static slab indexing is rank-exact).
    """
    from fluidgym_tpu.solver import block_merge, linsolve

    assert matvec_extra is None  # extra linear terms stay on the block path
    spatial_rank = ops[0].diag.ndim
    chan = b[0].ndim - spatial_rank  # 0 (scalar) or 1 (components)
    C = b[0].shape[0] if chan else 1
    mops = block_merge.pack_ops(xplan, ops)
    S = len(xplan.superblocks)

    def pack(fields):
        if chan:
            per_c = [block_merge.pack_fields(
                xplan, tuple(f[c] for f in fields)) for c in range(C)]
            return tuple(jnp.stack([per_c[c][s] for c in range(C)], axis=0)
                         for s in range(S))
        return block_merge.pack_fields(xplan, tuple(fields))

    def unpack(ys):
        if chan:
            per_c = [block_merge.unpack_fields(
                xplan, tuple(y[c] for y in ys)) for c in range(C)]
            nblocks = len(per_c[0])
            return tuple(jnp.stack([per_c[c][bi] for c in range(C)], axis=0)
                         for bi in range(nblocks))
        return tuple(block_merge.unpack_fields(xplan, ys))

    mv1 = lambda ys: block_merge.merged_apply(xplan, mops, ys)
    pmv = jax.vmap(mv1, in_axes=0, out_axes=0) if chan else mv1
    precond_fn = None
    if precondition:
        inv_diag = tuple(1.0 / m[0] for m in mops)
        # zero-padded cells (none for fully-tiled plans) would give inf;
        # merge plans are rectangular-tiled so diag covers every cell
        def precond_fn(rs):
            return tuple(d * r for d, r in zip(inv_diag, rs))
    pb = pack(b)
    px0 = None if x0 is None else pack(x0)
    solver = linsolve.cg if symmetric else linsolve.bicgstab
    xs, inf = solver(pmv, pb, x0=px0, tol=tol, maxiter=maxiter,
                     return_best=return_best, precond=precond_fn,
                     stall_iters=stall_iters)
    return unpack(xs), inf


def _fused_cg_mb_plan(ops, topo: DomainTopo, coarse_fn):
    """Dispatch gate for the MERGED-frame fused CG (ops/cg_pallas_mb.py):
    multi-block topologies whose merge plan (solver/block_merge.py) exists
    and fits VMEM route the whole pressure solve through the resident
    kernel in the super-block frame.  Returns the MergePlan or None."""
    from fluidgym_tpu.ops import cg_pallas, cg_pallas_mb
    from fluidgym_tpu.solver import block_merge

    if coarse_fn is not None or len(topo.blocks) < 2:
        return None
    if ops[0].diag.ndim != topo.ndims:  # channel axes take the XLA path
        return None
    mode = cg_pallas_mb.fused_cg_mb_enabled()
    if not cg_pallas.fused_cg_enabled() or mode is False:
        return None
    plan = block_merge.merge_plan(topo)
    if plan is None or not cg_pallas_mb.fused_cg_mb_eligible(
            plan, ops[0].diag.dtype):
        return None
    if mode == "auto" and not plan.identity_seams:
        return None  # flip-seam plans (C-grids) stay opt-in pending the A/B
    return plan


def _posthoc_info(mv, b, x, tol) -> linsolve.SolveInfo:
    """Convergence metadata recomputed from the returned iterate (used on the
    ``custom_linear_solve`` path, whose inner solve cannot surface aux data).
    Costs one matvec -- removed by XLA dead-code elimination whenever the
    caller discards the info.  ``iterations=-1`` marks "not tracked"."""
    r = jax.tree.map(lambda bb, ax: bb - ax, b, mv(lax.stop_gradient(x)))
    rs = sum(jnp.vdot(rr, rr).real for rr in jax.tree.leaves(r))
    n = sum(leaf.size for leaf in jax.tree.leaves(b))
    rmse = lax.stop_gradient(jnp.sqrt(rs / n))
    return linsolve.SolveInfo(
        converged=rmse <= tol,
        iterations=jnp.asarray(-1, jnp.int32),
        residual=rmse.astype(jax.tree.leaves(b)[0].dtype),
    )


def _solve(ops, b, topo: DomainTopo, *, tol, maxiter, symmetric, use_bicg,
           return_best, differentiable=True, x0=None, precondition=False,
           x0_fn=None, stall_iters=250, coarse_fn=None,
           precond_override=None, coarse_strips=False,
           matvec_extra=None, refine_restarts=0, refine_inner_tol=1e-3):
    """Differentiable global linear solve over all blocks; returns
    ``(x, SolveInfo)`` -- the convergence metadata the reference surfaces as
    ``LinearSolverResultInfo`` / raises as ``LinsolveError``
    (PISOtorch.cpp:567, PISOtorch_diff.py:262-371).

    ``lax.custom_linear_solve`` supplies the implicit-function gradient: the
    backward pass is a transposed solve plus automatic differentiation of the
    matvec w.r.t. the stencil coefficients -- the reference's
    LinearSolveFunction backward (transposed solve + SparseOuterProduct,
    PISOtorch_diff.py:553-616) for free.

    Deviation from the reference noted: multi-component RHS (velocity, scalar
    channels) are solved as one joint system with a joint RMSE criterion
    instead of per-RHS convergence; the joint criterion is equivalent in
    aggregate and keeps a single Krylov loop on-device.
    """

    if matvec_extra is not None:
        # additional LINEAR term beyond the stencil operator (the full
        # non-orthogonal pressure coupling, nonortho.deferred_rhs_flux as a
        # map of the unknown); non-symmetric, so requires use_bicg
        assert use_bicg and not symmetric

        def mv(xs):
            ax = st.domain_apply(ops, xs, topo)
            ex = matvec_extra(xs)
            return tuple(a + e for a, e in zip(ax, ex))
    else:
        def mv(xs):
            return st.domain_apply(ops, xs, topo)

    tol_resolved = (tol if tol is not None
                    else linsolve.default_tolerance(
                        jax.tree.leaves(b)[0].dtype))

    precond_fn = None
    if precond_override is not None:
        # e.g. the multigrid V-cycle (build_mg_preconditioner); replaces the
        # Jacobi/coarse combination entirely
        precond_fn = precond_override
    elif precondition:
        inv_diag = tuple(1.0 / op.diag for op in ops)
        if coarse_fn is None:
            def precond_fn(rs):
                return tuple(d * r for d, r in zip(inv_diag, rs))
        else:
            def precond_fn(rs):
                cg = coarse_fn(rs)
                return tuple(d * r + c
                             for d, r, c in zip(inv_diag, rs, cg))
    elif coarse_fn is not None:
        # never install the rank-k coarse solve alone: it is singular
        # outside the coarse space and freezes PCG; add the identity
        def precond_fn(rs):
            cg = coarse_fn(rs)
            return tuple(r + c for r, c in zip(rs, cg))

    if symmetric and not use_bicg:
        fused = (precond_override is None
                 and _fused_cg_usable(ops, topo, coarse_fn))
        mplan = None
        if not fused and precond_override is None:
            mplan = _fused_cg_mb_plan(ops, topo, coarse_fn)
        xplan = None
        if (not fused and mplan is None and precond_override is None
                and coarse_fn is None):
            xplan = _merged_xla_plan(ops, topo)

        def _merged_solve(bb, guess, solve_tol=None):
            from fluidgym_tpu.ops import cg_pallas_mb
            from fluidgym_tpu.solver import block_merge

            mops = block_merge.pack_ops(mplan, ops)
            xs, inf = cg_pallas_mb.fused_cg_mb(
                mplan, tuple(m[0] for m in mops),
                tuple(m[1] for m in mops),
                block_merge.pack_fields(mplan, bb),
                x0s=None if guess is None
                else block_merge.pack_fields(mplan, guess),
                tol=tol_resolved if solve_tol is None else solve_tol,
                maxiter=maxiter,
                stall_iters=stall_iters, precondition=precondition,
                return_best=return_best, coarse_strips=coarse_strips)
            return tuple(block_merge.unpack_fields(mplan, xs)), inf

        def _inner_for_refine(rhs):
            """Path-specific inner solver on a unit-RMS RHS, zero guess,
            at the refinement's inner tolerance (linsolve.refined)."""
            if fused:
                from fluidgym_tpu.ops import cg_pallas

                x1, inf = cg_pallas.fused_cg(
                    ops[0].diag, ops[0].off, rhs[0], x0=None,
                    ndims=topo.ndims, tol=refine_inner_tol, maxiter=maxiter,
                    stall_iters=stall_iters, precondition=precondition,
                    return_best=return_best)
                return (x1,), inf
            if mplan is not None:
                return _merged_solve(rhs, None, solve_tol=refine_inner_tol)
            if xplan is not None:
                return _merged_xla_solve(
                    xplan, ops, rhs, tol=refine_inner_tol, maxiter=maxiter,
                    stall_iters=stall_iters, precondition=precondition,
                    return_best=return_best, x0=None, symmetric=True)
            return linsolve.cg(mv, rhs, tol=refine_inner_tol,
                               maxiter=maxiter, return_best=return_best,
                               precond=precond_fn, stall_iters=stall_iters)

        if not differentiable:
            guess = x0_fn(b) if x0_fn is not None else x0
            if refine_restarts > 0:
                return linsolve.refined(mv, b, _inner_for_refine,
                                        tol=tol_resolved,
                                        restarts=refine_restarts, x0=guess)
            if fused:
                from fluidgym_tpu.ops import cg_pallas

                x1, inf = cg_pallas.fused_cg(
                    ops[0].diag, ops[0].off, b[0],
                    x0=None if guess is None else guess[0],
                    ndims=topo.ndims, tol=tol_resolved, maxiter=maxiter,
                    stall_iters=stall_iters, precondition=precondition,
                    return_best=return_best)
                return (x1,), inf
            if mplan is not None:
                return _merged_solve(b, guess)
            if xplan is not None:
                return _merged_xla_solve(
                    xplan, ops, b, tol=tol_resolved, maxiter=maxiter,
                    stall_iters=stall_iters, precondition=precondition,
                    return_best=return_best, x0=guess, symmetric=True)
            return linsolve.cg(mv, b, x0=guess, tol=tol, maxiter=maxiter,
                               return_best=return_best, precond=precond_fn,
                               stall_iters=stall_iters)

        def diff_guess(mv_fn, bb):
            """Initial guess for solves under ``custom_linear_solve``.

            stop_gradient-ed: by the implicit-function property the solution
            (hence the gradient) is guess-independent, so the guess machinery
            (previous iterate, deflation coarse setup) must not enter the
            backward graph.  The plain warm start is additionally SELF-GATED
            with one matvec: the same solve_fn also runs the TRANSPOSE solve,
            whose RHS is a cotangent unrelated to the forward-state guess --
            an ungated stale guess there costs (many) extra iterations.
            ``x0_fn`` (deflation) needs no gate: its coarse projection is
            computed from ``bb`` itself, so it adapts to either solve.
            """
            if x0_fn is not None:
                return jax.tree.map(lax.stop_gradient, x0_fn(bb))
            if x0 is None:
                return None
            g = jax.tree.map(lax.stop_gradient, x0)
            r0 = jax.tree.map(lambda y, ay: y - ay, bb, mv_fn(g))
            rs0 = sum(jnp.vdot(r, r).real for r in jax.tree.leaves(r0))
            rsb = sum(jnp.vdot(y, y).real for y in jax.tree.leaves(bb))
            ok = rs0 <= rsb
            return jax.tree.map(
                lambda gg: jnp.where(ok, gg, jnp.zeros_like(gg)), g)

        if refine_restarts > 0:
            # refinement wraps the path-specific inner solver; the
            # implicit-function VJP (custom_linear_solve) is unchanged --
            # the refined iterate is just a better-converged black box
            def solve_fn(mv_fn, bb):
                guess = diff_guess(mv_fn, bb)
                return linsolve.refined(mv, bb, _inner_for_refine,
                                        tol=tol_resolved,
                                        restarts=refine_restarts,
                                        x0=guess)[0]
        elif fused:
            from fluidgym_tpu.ops import cg_pallas

            # the kernel is a black-box inner solver: custom_linear_solve
            # still supplies the implicit-function VJP (transposed solve =
            # the same symmetric solve) -- gradients never differentiate
            # through the Krylov loop itself
            def solve_fn(mv_fn, bb):
                guess = diff_guess(mv_fn, bb)
                x1, _ = cg_pallas.fused_cg(
                    ops[0].diag, ops[0].off, bb[0],
                    x0=None if guess is None else guess[0],
                    ndims=topo.ndims, tol=tol_resolved, maxiter=maxiter,
                    stall_iters=stall_iters, precondition=precondition,
                    return_best=return_best)
                return (x1,)
        elif mplan is not None:
            # black-box inner solver in the merged frame; the
            # implicit-function VJP (custom_linear_solve) is unchanged
            def solve_fn(mv_fn, bb):
                return _merged_solve(bb, diff_guess(mv_fn, bb))[0]
        elif xplan is not None:
            def solve_fn(mv_fn, bb):
                return _merged_xla_solve(
                    xplan, ops, bb, tol=tol_resolved, maxiter=maxiter,
                    stall_iters=stall_iters, precondition=precondition,
                    return_best=return_best, x0=diff_guess(mv_fn, bb),
                    symmetric=True)[0]
        else:
            def solve_fn(mv_fn, bb):
                guess = diff_guess(mv_fn, bb)
                return linsolve.cg(mv_fn, bb, x0=guess, tol=tol,
                                   maxiter=maxiter, return_best=return_best,
                                   precond=precond_fn,
                                   stall_iters=stall_iters)[0]

        x = lax.custom_linear_solve(mv, b, solve_fn, symmetric=True)
        return x, _posthoc_info(mv, b, x, tol_resolved)

    mplan_b = None
    if matvec_extra is None and precond_override is None:
        mplan_b = _fused_bicg_mb_plan(ops, topo)
    xplan_b = None
    if mplan_b is None and matvec_extra is None and precond_override is None:
        xplan_b = _merged_xla_plan(ops, topo)

    def _inner_bicg_for_refine(rhs):
        """Path-specific BiCGStab inner solver for linsolve.refined (unit-RMS
        RHS, zero guess, inner tolerance) -- mirrors _inner_for_refine on the
        symmetric branch so pressure_refine_restarts also applies to
        pressure_use_bicg / pressure_full_mode solves."""
        if mplan_b is not None:
            return _fused_bicg_mb_solve(
                mplan_b, ops, rhs, topo, tol=refine_inner_tol,
                maxiter=maxiter, stall_iters=stall_iters,
                precondition=precondition, return_best=return_best, x0=None)
        if xplan_b is not None:
            return _merged_xla_solve(
                xplan_b, ops, rhs, tol=refine_inner_tol, maxiter=maxiter,
                stall_iters=stall_iters, precondition=precondition,
                return_best=return_best, x0=None, symmetric=False)
        return linsolve.bicgstab(mv, rhs, tol=refine_inner_tol,
                                 maxiter=maxiter, return_best=return_best,
                                 stall_iters=stall_iters, precond=precond_fn)

    if not differentiable:
        if refine_restarts > 0:
            return linsolve.refined(mv, b, _inner_bicg_for_refine,
                                    tol=tol_resolved,
                                    restarts=refine_restarts, x0=x0)
        if mplan_b is not None:
            return _fused_bicg_mb_solve(
                mplan_b, ops, b, topo, tol=tol_resolved,
                maxiter=maxiter, stall_iters=stall_iters,
                precondition=precondition, return_best=return_best,
                x0=x0)
        if xplan_b is not None:
            return _merged_xla_solve(
                xplan_b, ops, b, tol=tol_resolved, maxiter=maxiter,
                stall_iters=stall_iters, precondition=precondition,
                return_best=return_best, x0=x0, symmetric=False)
        return linsolve.bicgstab(mv, b, x0=x0, tol=tol, maxiter=maxiter,
                                 return_best=return_best,
                                 stall_iters=stall_iters, precond=precond_fn)

    if refine_restarts > 0:
        # black-box refined forward solve; custom_linear_solve's
        # implicit-function VJP is unchanged (transposed solve below)
        def solve_fn(mv_fn, bb):
            return linsolve.refined(mv, bb, _inner_bicg_for_refine,
                                    tol=tol_resolved,
                                    restarts=refine_restarts, x0=None)[0]
    elif mplan_b is not None:
        # the kernel is a black-box FORWARD solver under custom_linear_solve
        # (the implicit-function VJP is unaffected); the transposed solve
        # keeps the XLA loop -- its operator is A^T, not the stencil
        def solve_fn(mv_fn, bb):
            return _fused_bicg_mb_solve(
                mplan_b, ops, bb, topo, tol=tol_resolved, maxiter=maxiter,
                stall_iters=stall_iters, precondition=precondition,
                return_best=return_best, x0=None)[0]
    elif xplan_b is not None:
        def solve_fn(mv_fn, bb):
            return _merged_xla_solve(
                xplan_b, ops, bb, tol=tol_resolved, maxiter=maxiter,
                stall_iters=stall_iters, precondition=precondition,
                return_best=return_best, x0=None, symmetric=False)[0]
    else:
        def solve_fn(mv_fn, bb):
            return linsolve.bicgstab(mv_fn, bb, tol=tol, maxiter=maxiter,
                                     return_best=return_best,
                                     stall_iters=stall_iters,
                                     precond=precond_fn)[0]

    def tsolve_fn(vecmat, bb):
        # diag(A^T) = diag(A): the same Jacobi preconditioner applies
        return linsolve.bicgstab(vecmat, bb, tol=tol, maxiter=maxiter,
                                 return_best=return_best,
                                 stall_iters=stall_iters,
                                 precond=precond_fn)[0]

    x = lax.custom_linear_solve(mv, b, solve_fn, tsolve_fn)
    return x, _posthoc_info(mv, b, x, tol_resolved)


def _deflation_basis(topo: DomainTopo, dtype):
    """Per-block [constant, per-axis linear ramp] deflation vectors, stacked
    per block: ``Wstack[b]`` has shape ``(k, *block_shape)`` with
    ``k = nblocks * (ndims + 1)`` columns, each supported on one block.

    The slow modes of the multi-block Neumann Poisson operator are close to
    piecewise-linear-per-block fields; solving the k-dimensional coarse
    problem and warm-starting CG from that projection cuts the iteration
    count ~2.5x on the cylinder at developed flow (125 -> 51), at the cost of
    k matvecs per substep (amortized over the corrector solves).  Unlike
    warm-starting from the previous pressure, the guess is computed from the
    CURRENT right-hand side, so no stale low-frequency error is inherited.
    """
    nblocks = len(topo.blocks)
    cols: list[tuple[Array, ...]] = []
    from fluidgym_tpu.core.domain import BoundKind

    for b, bt in enumerate(topo.blocks):
        shp = bt.shape
        nd = len(shp)
        modes = [jnp.ones(shp, dtype)]
        for ax in range(nd):
            # a linear ramp is DISCONTINUOUS across a periodic seam: as a
            # deflation mode it has a huge A-image there and poisons the
            # coarse solve (observed as RBC blow-ups within ~200 steps when
            # warm+deflated starts were enabled on the periodic-x channel)
            f_lo = bt.faces[2 * (nd - 1 - ax)]
            if f_lo.kind == BoundKind.PERIODIC:
                continue
            ramp = jnp.linspace(-1.0, 1.0, shp[ax], dtype=dtype)
            modes.append(jnp.broadcast_to(
                ramp.reshape((1,) * ax + (-1,) + (1,) * (nd - 1 - ax)), shp))
        for m in modes:
            cols.append(tuple(
                m if bb == b else jnp.zeros(topo.blocks[bb].shape, dtype)
                for bb in range(nblocks)))
    return [jnp.stack([c[b] for c in cols]) for b in range(nblocks)]


def _make_coarse_solver(p_ops, topo: DomainTopo, dtype):
    """Coarse-space solve ``r -> W E^+ W^T r`` over the per-block
    constant+linear deflation basis (E = W^T A W computed once with k vmapped
    matvecs).  The whole setup runs under ``stop_gradient``: the coarse solve
    only steers Krylov iterate paths (initial guesses, preconditioning), so
    its gradient contribution is exactly zero -- differentiating the setup
    graph (vmapped matvecs + pinv) was measured 5.6x slower in the backward
    pass with no change to the gradient."""
    Wstack = _deflation_basis(topo, dtype)

    def apply_cols(*cols):
        return st.domain_apply(p_ops, tuple(cols), topo)

    AWstack = jax.vmap(apply_cols)(*Wstack)  # tuple of (k, *shape)
    E = sum(jnp.einsum("i...,j...->ij", w, aw)
            for w, aw in zip(Wstack, AWstack))
    E = lax.stop_gradient(E)
    # the global constant lies in the operator nullspace -> E is singular;
    # symmetrically normalize (blocks differ in size/coefficients by orders
    # of magnitude) and pseudo-invert
    d = 1.0 / jnp.sqrt(jnp.abs(jnp.diagonal(E)) + 1e-30)
    E_n = E * d[:, None] * d[None, :]
    En_inv = jnp.linalg.pinv(E_n, rcond=1e-5)

    def coarse(r):
        rhs_c = sum(jnp.einsum("i...,...->i", w, rr)
                    for w, rr in zip(Wstack, r))
        c = d * (En_inv @ (d * rhs_c))
        return tuple(jnp.einsum("i,i...->...", c, w) for w in Wstack)

    return coarse


#: operator key -> dict(d=…, En_inv=…, specs=…, nu=…) built by
#: ``ensure_agg_coarse_cache`` (host-side, once per env construction).
#: Keyed by every STATIC field that defines the pressure operator —
#: (topo, tile, dt, upwind blend, non_orthogonal) — so two envs sharing a
#: mesh topology but differing in time step / advection scheme never share
#: one Galerkin matrix; the (dynamic) viscosity is stored in the entry and
#: a materially different value triggers a rebuild (see
#: ``ensure_agg_coarse_cache``).  FIFO-capped so long-lived processes
#: constructing many distinct envs stay bounded.
_AGG_COARSE_CACHE: dict = {}
_AGG_COARSE_CACHE_MAX = 8
#: bumped whenever an EXISTING entry is replaced (force= or viscosity
#: mismatch); FluidEnv compares it around ``ensure_agg_coarse_cache`` to
#: know a previously traced step may hold stale baked-in E constants
_AGG_COARSE_GENERATION = 0


def agg_cache_generation() -> int:
    return _AGG_COARSE_GENERATION


def _agg_cache_key(topo: DomainTopo, cfg: SimConfig):
    return (topo, int(cfg.pressure_coarse_tile), float(cfg.dt),
            float(cfg.advection_upwind_blend), bool(cfg.non_orthogonal))


def _agg_tile_specs(topo: DomainTopo, tile: int):
    """Static per-block (block_shape, coarse_shape, flat_offset) for the
    ceil-division tile aggregation, plus the total coarse dimension k.
    Remainder cells form a (smaller) tail tile per axis, so restriction is
    a zero-pad + reshape + sum and prolongation a repeat + crop — no
    scatter/gather index maps at runtime."""
    specs, k = [], 0
    for bt in topo.blocks:
        shp = tuple(bt.shape)
        cshp = tuple(-(-n // tile) for n in shp)
        specs.append((shp, cshp, k))
        k += int(np.prod(cshp))
    return tuple(specs), k


def _agg_restrict(rs, specs, tile: int):
    """W^T r: per-block pad to tile multiples, reshape-pool, concatenate."""
    parts = []
    for r, (shp, cshp, _off) in zip(rs, specs):
        rp = jnp.pad(r, [(0, c * tile - n) for n, c in zip(shp, cshp)])
        rp = rp.reshape(tuple(x for c in cshp for x in (c, tile)))
        parts.append(rp.sum(tuple(range(1, 2 * len(shp), 2))).reshape(-1))
    return jnp.concatenate(parts)


def _agg_prolong(c, specs, tile: int):
    """W c: per-block slice, reshape, nearest-upsample, crop."""
    outs = []
    for shp, cshp, off in specs:
        cb = c[off:off + int(np.prod(cshp))].reshape(cshp)
        for ax in range(len(shp)):
            cb = jnp.repeat(cb, tile, axis=ax)
        outs.append(cb[tuple(slice(0, n) for n in shp)])
    return tuple(outs)


def build_pressure_ops_like_substep(state, geoms, topo: DomainTopo,
                                    cfg: SimConfig):
    """The pressure operator exactly as ``piso_substep`` assembles it
    (advection diag — incl. non-orthogonal matrix terms — into
    ``build_pressure_ops``), at the state's current fields and ``cfg.dt``."""
    dtype = state.blocks[0].velocity.dtype
    nu = state.viscosity
    dt = jnp.asarray(cfg.dt, dtype)
    adv_ops = st.build_advection_ops(
        state, geoms, topo, nu, dt, upwind=cfg.advection_upwind_blend)
    if cfg.non_orthogonal:
        nus = tuple(
            jnp.full_like(g.det, 1.0) * st._block_nu(state, b, nu, False)
            for b, g in enumerate(geoms))
        adv_ops = nonortho.apply_matrix_terms(
            adv_ops, geoms, topo, nus, det_divide=True, field="velocity")
    adiags = tuple(op.diag for op in adv_ops)
    return st.build_pressure_ops(adiags, geoms, topo)


def ensure_agg_coarse_cache(state, geoms, topo: DomainTopo, cfg: SimConfig,
                            *, force: bool = False, chunk: int = 64) -> None:
    """Build (once) the Galerkin coarse matrix ``E = W^T A W`` of the
    aggregation space for ``cfg.pressure_coarse_tile`` from the CURRENT
    state's pressure operator, and cache its normalized pseudo-inverse by
    ``(topo, tile)``.

    Host-side and eager: ``FluidEnv`` calls this after the initial state is
    ready, so the cached arrays are concrete when the step is traced and
    get baked into the jitted graph as constants (k^2 floats, ~4 MB at
    k≈1000).  The preconditioner tolerates a stale E — a 10% coefficient
    perturbation changes the PCG iteration count by <1% on the airfoil
    operator (scripts/airfoil_coarse_pc_probe.py) — so E is never rebuilt,
    which keeps the per-substep setup cost at exactly zero matvecs
    (vs. k matvecs per substep if built in-graph)."""
    global _AGG_COARSE_GENERATION
    tile = int(cfg.pressure_coarse_tile)
    if tile <= 0:
        return
    key = _agg_cache_key(topo, cfg)
    nu = float(np.asarray(jax.device_get(state.viscosity)))
    prev_entry = _AGG_COARSE_CACHE.get(key)
    if prev_entry is not None and not force:
        # same static operator key: only a materially different viscosity
        # (e.g. another Reynolds tier reusing this topology) forces a
        # rebuild — the preconditioner tolerates small coefficient drift
        if abs(prev_entry["nu"] - nu) <= 1e-6 * max(abs(nu), 1e-30):
            return
    specs, k = _agg_tile_specs(topo, tile)
    dtype = state.blocks[0].pressure.dtype
    p_ops = jax.tree.map(lax.stop_gradient,
                         build_pressure_ops_like_substep(
                             state, geoms, topo, cfg))

    # per-block tile-id maps (host-side only, for building basis columns)
    maps = []
    for shp, cshp, off in specs:
        grids = np.meshgrid(*[np.arange(n) // tile for n in shp],
                            indexing="ij")
        # row-major flat index of the tile within this block's coarse grid
        # (matches both the reshape-pool ordering of _agg_restrict and the
        # slice+reshape ordering of _agg_prolong)
        flat = np.ravel_multi_index(tuple(grids), cshp)
        maps.append(flat + off)

    def apply_cols(*cols):
        return st.domain_apply(p_ops, tuple(cols), topo)

    apply_v = jax.jit(jax.vmap(apply_cols))
    restrict_v = jax.jit(jax.vmap(lambda *rs: _agg_restrict(rs, specs, tile)))
    E = np.zeros((k, k), np.float64)
    for c0 in range(0, k, chunk):
        js = np.arange(c0, min(c0 + chunk, k))
        cols = tuple(
            jnp.asarray((m[None] == js.reshape((-1,) + (1,) * m.ndim))
                        .astype(np.float32), dtype)
            for m in maps)
        rows = restrict_v(*apply_v(*cols))
        E[c0:c0 + len(js)] = np.asarray(jax.device_get(rows), np.float64)
    # the assembly writes operator COLUMNS restrict(A W e_j) into E rows,
    # which is only an identity for a symmetric pressure operator —
    # symmetrize so a nonsymmetric variant degrades gracefully instead of
    # silently transposing E (it also cleans float noise)
    E = 0.5 * (E + E.T)
    # symmetrically normalize (tiles differ in size/coefficients by orders
    # of magnitude) and pseudo-invert; the global constant may lie in the
    # operator nullspace, which pinv's rcond handles
    d = 1.0 / np.sqrt(np.abs(np.diagonal(E)) + 1e-30)
    En_inv = np.linalg.pinv(E * d[:, None] * d[None, :], rcond=1e-7)
    if prev_entry is not None:
        _AGG_COARSE_GENERATION += 1  # replaced: traced steps may be stale
    while len(_AGG_COARSE_CACHE) >= _AGG_COARSE_CACHE_MAX \
            and key not in _AGG_COARSE_CACHE:
        _AGG_COARSE_CACHE.pop(next(iter(_AGG_COARSE_CACHE)))
    _AGG_COARSE_CACHE[key] = {
        "d": jnp.asarray(d, dtype),
        "En_inv": jnp.asarray(En_inv, dtype),
        "specs": specs,
        "tile": tile,
        "nu": nu,
    }


def _agg_coarse_from_cache(topo: DomainTopo, cfg: SimConfig):
    """Coarse-space solve ``r -> W E^+ W^T r`` from the cached aggregation
    matrices, or None when ``ensure_agg_coarse_cache`` has not run for this
    operator key — callers then fall back to the constant+linear space."""
    entry = _AGG_COARSE_CACHE.get(_agg_cache_key(topo, cfg))
    if entry is None:
        return None
    d, En_inv = entry["d"], entry["En_inv"]
    specs, t = entry["specs"], entry["tile"]

    def coarse(r):
        rhs = _agg_restrict(r, specs, t)
        c = d * (En_inv @ (d * rhs))
        return _agg_prolong(c, specs, t)

    return coarse


def _make_deflation_x0(p_ops, topo: DomainTopo, dtype, coarse=None):
    """Build ``x0_fn(b, base=None)`` for the pressure solves of one substep.

    Without ``base``: the coarse solution ``W E^+ W^T b``.  With ``base`` (a
    warm-start guess, e.g. the previous pressure): the coarse-corrected guess
    ``base + W E^+ W^T (b - A base)`` -- the base supplies the high-frequency
    content cheaply while the coarse correction removes exactly the
    low-frequency residual component that plain warm starts inherit (the
    residual stopping criterion barely sees it, but A^-1 amplifies it, which
    biased the cylinder drag by ~1.8% with plain warm starts at tol 1e-5)."""
    if coarse is None:
        coarse = _make_coarse_solver(p_ops, topo, dtype)

    def x0_fn(b, base=None):
        if base is None:
            return coarse(b)
        # SELF-GATING warm start: during rough transients consecutive
        # pressures differ wildly and the inherited guess destabilizes the
        # coupled PISO iteration (observed as a t~9 blow-up on the res-48
        # cylinder).  Use the previous pressure only when it is no worse a
        # guess than zero, i.e. ||b - A base|| <= ||b||; otherwise fall back
        # to the pure coarse (deflation) start.  One extra reduction; the
        # matvec is needed for the coarse correction anyway.
        Abase = st.domain_apply(p_ops, base, topo)
        rb = tuple(bb - ab for bb, ab in zip(b, Abase))
        use_base = (sum(jnp.vdot(r, r) for r in rb)
                    <= sum(jnp.vdot(bb, bb) for bb in b))
        sel = tuple(jnp.where(use_base, ba, jnp.zeros_like(ba)) for ba in base)
        r = tuple(jnp.where(use_base, rr, bb) for rr, bb in zip(rb, b))
        cg = coarse(r)
        return tuple(ss + cc for ss, cc in zip(sel, cg))

    return x0_fn


def _global_mean(xs) -> Array:
    """Mean over the concatenation of all block arrays (the reference's
    torch.mean over the global pressure vector)."""
    total = sum(jnp.sum(x) for x in xs)
    count = sum(x.size for x in xs)
    return total / count


def _advect_scalars(
    state: DomainState,
    geoms: tuple[BlockGeom, ...],
    topo: DomainTopo,
    cfg: SimConfig,
    dt: Array,
) -> DomainState:
    """Implicit advection-diffusion solve of every passive-scalar channel
    with the velocity field frozen (the scalar stage of _PISO_split_step,
    PISOtorch_simulation.py:1471-1644).  Returns ``(state, converged)``."""
    nblocks = len(topo.blocks)
    new_scalars = [[] for _ in range(nblocks)]
    converged = jnp.asarray(True)
    for c in range(topo.scalar_channels):
        kappa = state.scalar_diffusivity[c]
        ops = st.build_advection_ops(
            state, geoms, topo, kappa, dt, for_scalar=True, scalar_channel=c
        )
        rhs = st.advection_rhs_scalar(state, geoms, topo, kappa, dt, c)
        if cfg.non_orthogonal:
            ones = tuple(jnp.ones_like(g.det) for g in geoms)
            ops = nonortho.apply_matrix_terms(
                ops, geoms, topo, tuple(o * kappa for o in ones),
                det_divide=True, field="scalar", scalar_channel=c,
            )
            S = nonortho.deferred_rhs(
                tuple(blk.scalar[c] for blk in state.blocks), geoms, topo,
                ones, field="scalar",
                bval_fn=lambda b, f, _c=c: state.blocks[b].faces[f].scalar[_c],
                scalar_channel=c,
            )
            rhs = tuple(
                r - s * kappa / g.det for r, s, g in zip(rhs, S, geoms)
            )
        res, s_info = _solve(
            ops, rhs, topo,
            tol=cfg.advection_tol, maxiter=cfg.advection_maxiter,
            symmetric=False, use_bicg=cfg.advection_use_bicg,
            return_best=False, differentiable=cfg.differentiable,
            x0=tuple(blk.scalar[c] for blk in state.blocks)
            if cfg.warm_start else None,
        )
        converged = jnp.logical_and(converged, s_info.converged)
        for b in range(nblocks):
            new_scalars[b].append(res[b])
    for b in range(nblocks):
        state = state.replace_block(
            b, replace(state.blocks[b], scalar=jnp.stack(new_scalars[b], axis=0))
        )
    return state, converged


def piso_substep(
    state: DomainState,
    geoms: tuple[BlockGeom, ...],
    topo: DomainTopo,
    cfg: SimConfig,
    dt: Array,
    hooks: Hooks | None = None,
) -> DomainState:
    """One PISO substep advancing physical time ``dt``
    (reference ``_PISO_split_step`` body, PISOtorch_simulation.py:1453-2000)."""
    return piso_substep_info(state, geoms, topo, cfg, dt, hooks)[0]


def piso_substep_info(
    state: DomainState,
    geoms: tuple[BlockGeom, ...],
    topo: DomainTopo,
    cfg: SimConfig,
    dt: Array,
    hooks: Hooks | None = None,
    prev=None,
) -> tuple[DomainState, StepInfo]:
    """``piso_substep`` returning ``(state, StepInfo)`` with the solver
    convergence metadata aggregated over the substep's solves.  The metadata
    computation is dead-code-eliminated by XLA when the caller discards it,
    so the info-less wrapper above costs nothing.

    ``prev``: optional ``(pressures_prev, dt_prev)`` -- the ENTRY pressures
    and dt of the previous substep, enabling the extrapolated warm start
    (``cfg.pressure_extrapolate``).  Substep drivers thread it through their
    carries; the same tuple for THIS substep is ``(entry pressures, dt)``."""
    nblocks = len(topo.blocks)
    dtype = state.blocks[0].velocity.dtype
    info = _info_identity(dtype)
    state = _run_hooks(hooks, "PRE", state, time_step=dt)

    # ---- scalar advection (PISOtorch_simulation.py:1471-1644) -------------
    if cfg.advect_passive_scalar and topo.has_scalar and state.blocks[0].scalar is not None:
        state, sc_conv = _advect_scalars(state, geoms, topo, cfg, dt)
        info = info._replace(advection_converged=jnp.logical_and(
            info.advection_converged, sc_conv))

    # ---- velocity prediction (PISOtorch_simulation.py:1646-1762) ----------
    state = _run_hooks(hooks, "PRE_VELOCITY_SETUP", state, time_step=dt)
    nu = state.viscosity
    adv_ops = st.build_advection_ops(
        state, geoms, topo, nu, dt, upwind=cfg.advection_upwind_blend)
    vel_rhs = st.advection_rhs_velocity(state, geoms, topo, nu, dt)
    if cfg.non_orthogonal:
        # per-cell viscosity (SGS hooks set blocks[b].viscosity) must reach
        # the cross-diffusion terms too, matching build_advection_ops
        nus = tuple(
            jnp.full_like(g.det, 1.0) * st._block_nu(state, b, nu, False)
            for b, g in enumerate(geoms)
        )
        adv_ops = nonortho.apply_matrix_terms(
            adv_ops, geoms, topo, nus, det_divide=True, field="velocity"
        )
        # deferred correction per velocity component, from the pre-step field
        S_comps = []
        for d in range(topo.ndims):
            S_comps.append(nonortho.deferred_rhs(
                tuple(blk.velocity[d] for blk in state.blocks), geoms, topo,
                nus, field="velocity",
                bval_fn=lambda b, f, _d=d: state.blocks[b].faces[f].velocity[_d],
                boundary_visc=nu,
            ))
        vel_rhs = tuple(
            vel_rhs[b]
            - jnp.stack([S_comps[d][b] for d in range(topo.ndims)], axis=0)
            / geoms[b].det
            for b in range(nblocks)
        )
    state = _run_hooks(hooks, "POST_VELOCITY_SETUP", state, time_step=dt)
    u_star, v_info = _solve(
        adv_ops, vel_rhs, topo,
        tol=cfg.advection_tol, maxiter=cfg.advection_maxiter,
        symmetric=False, use_bicg=cfg.advection_use_bicg, return_best=False,
        differentiable=cfg.differentiable,
        x0=tuple(blk.velocity for blk in state.blocks)
        if cfg.warm_start else None,
    )
    info = info._replace(advection_converged=jnp.logical_and(
        info.advection_converged, v_info.converged))

    # ---- corrector loop (PISOtorch_simulation.py:1777-1972) ---------------
    adiags = tuple(op.diag for op in adv_ops)
    # default: the pressure matrix stays purely orthogonal (exactly SPD ->
    # CG-safe) and ALL non-orthogonal pressure coupling is deferred to the
    # RHS below; full mode (cfg.pressure_non_ortho_full) instead solves the
    # complete non-orthogonal system in one BiCGStab solve, with the
    # flux-form cross-term map inside the matvec (no deferred lag at all)
    p_ops = st.build_pressure_ops(adiags, geoms, topo)
    p_use_bicg = cfg.pressure_use_bicg or cfg.pressure_full_mode
    p_matvec_extra = None
    if cfg.non_orthogonal:
        inv_a = tuple(1.0 / a for a in adiags)
        if cfg.pressure_full_mode:
            def p_matvec_extra(xs, _inv_a=inv_a):
                # sign: the corrector solves P p = -(div0 + S(p)), i.e.
                # (P + S_map) p = -div0 with S_map = deferred_rhs_flux(.)
                return nonortho.deferred_rhs_flux(xs, geoms, topo, _inv_a)
    pressures = tuple(blk.pressure for blk in state.blocks)
    # extrapolated first-corrector warm start (see cfg.pressure_extrapolate):
    # pick extrapolated-vs-plain by actual residual once the RHS is known
    extrap = None
    if (cfg.pressure_extrapolate and prev is not None
            and (cfg.pressure_warm_start or cfg.pressure_deflation)
            and not p_use_bicg):
        p_prev, dt_prev = prev
        scale = (dt / jnp.maximum(jnp.abs(dt_prev), jnp.asarray(1e-30, dtype))
                 ).astype(dtype)
        extrap = tuple(p + scale * (p - q)
                       for p, q in zip(pressures, p_prev))
    defl = None
    coarse_fn = None
    mg_fn = None
    if ((cfg.pressure_deflation or cfg.pressure_coarse_precondition
         or cfg.pressure_multigrid) and not p_use_bicg):
        # differentiable mode: the setup only shapes guesses/convergence
        # (the converged solution -- hence the gradient -- is independent of
        # both, and _solve stop_gradients the guesses) -- keep the setup
        # graph out of the AD tape entirely
        setup_ops = (jax.tree.map(lax.stop_gradient, p_ops)
                     if cfg.differentiable else p_ops)
        if cfg.pressure_deflation or cfg.pressure_coarse_precondition:
            coarse = (_agg_coarse_from_cache(topo, cfg)
                      if cfg.pressure_coarse_tile else None)
            if coarse is None:
                coarse = _make_coarse_solver(
                    setup_ops, topo, state.blocks[0].pressure.dtype)
            if cfg.pressure_deflation:
                defl = _make_deflation_x0(
                    setup_ops, topo, state.blocks[0].pressure.dtype,
                    coarse=coarse)
            if cfg.pressure_coarse_precondition:
                coarse_fn = coarse
        if cfg.pressure_multigrid:
            from fluidgym_tpu.solver import multigrid

            mg_fn = multigrid.build_mg_preconditioner(
                setup_ops, topo.ndims, omega=cfg.mg_omega,
                sweeps=cfg.mg_sweeps,
                coarsest_sweeps=cfg.mg_coarsest_sweeps, topo=topo)
            coarse_fn = None  # multigrid supersedes the additive coarse
    for corrector in range(cfg.corrector_steps):
        base = pressures
        if corrector == 0 and extrap is not None:
            base = extrap  # residual-checked against `pressures` below
        if defl is not None:
            x0_fn = functools.partial(
                defl, base=base if cfg.pressure_warm_start else None)
        else:
            x0_fn = None
        hbyA = st.pressure_rhs_vec(state, geoms, topo, adv_ops, u_star, nu, dt)
        div0 = st.divergence_of(hbyA, state, geoms, topo)
        # Inner non-orthogonal passes (reference pstep loop,
        # PISOtorch_simulation.py:1841-1902): the pressure tolerance only
        # controls the residual of the ORTHOGONAL operator; the deferred
        # cross-term correction lags one iterate and its error is otherwise
        # uncontrolled (|beta|/|alpha| reaches ~2 on the cylinder O-grid).
        # Re-building the deferred RHS from the fresh solution and re-solving
        # shrinks that lag geometrically; pass k>0 warm-starts from pass k-1
        # (within-substep reuse -- the reference's pstep>0 x=pressureResult).
        n_ortho = (cfg.pressure_non_ortho_steps
                   if cfg.non_orthogonal and not cfg.pressure_full_mode
                   else 1)
        for pstep in range(n_ortho):
            div = div0
            if cfg.non_orthogonal and not cfg.pressure_full_mode:
                # deferred pressure correction from the previous iterate
                # (k_pressureRHSaddNonOrthoComponents, kernel.cu:5471-5492);
                # full mode needs no deferral (cross terms in the matvec)
                Sp = nonortho.deferred_rhs_flux(
                    pressures, geoms, topo, inv_a)
                div = tuple(d + s for d, s in zip(div0, Sp))
            if cfg.pressure_time_step_normalized:
                div = tuple(d / dt for d in div)
            # p_ops is the sign-flipped (positive definite) Poisson operator,
            # so negate the RHS: P p = div  <=>  (-P) p = -div.
            rhs_p = tuple(-d for d in div)
            if cfg.normalize_pressure_result:
                # solvability projection for the singular all-Neumann system:
                # remove the constant-mode component of the RHS (flux-balance
                # residual + deferred non-orthogonal boundary terms), without
                # which CG accumulates an unbounded nullspace component
                rhs_mean = _global_mean(rhs_p)
                rhs_p = tuple(r - rhs_mean for r in rhs_p)
            if pstep > 0:
                base = pressures
                if defl is not None:
                    x0_fn = functools.partial(defl, base=base)
            elif corrector == 0 and extrap is not None:
                # keep the extrapolated guess only where it actually beats
                # the plain warm start on THIS solve's RHS (one extra matvec;
                # a rough transient then degrades to exactly the old behavior)
                setup = (jax.tree.map(lax.stop_gradient, p_ops)
                         if cfg.differentiable else p_ops)
                r_ex = tuple(bb - ab for bb, ab in zip(
                    rhs_p, st.domain_apply(setup, jax.tree.map(
                        lax.stop_gradient, base), topo)))
                r_pl = tuple(bb - ab for bb, ab in zip(
                    rhs_p, st.domain_apply(setup, jax.tree.map(
                        lax.stop_gradient, pressures), topo)))
                better = (sum(jnp.vdot(r, r).real for r in r_ex)
                          <= sum(jnp.vdot(r, r).real for r in r_pl))
                base = tuple(jnp.where(better, bx, pp)
                             for bx, pp in zip(base, pressures))
                if defl is not None:
                    x0_fn = functools.partial(
                        defl, base=base if cfg.pressure_warm_start else None)
            pressures, p_info = _solve(
                p_ops, rhs_p, topo,
                tol=cfg.pressure_tol, maxiter=cfg.pressure_maxiter,
                symmetric=not p_use_bicg,
                use_bicg=p_use_bicg,
                matvec_extra=p_matvec_extra,
                return_best=cfg.pressure_return_best_result,
                differentiable=cfg.differentiable,
                x0=base
                if ((cfg.pressure_warm_start or pstep > 0) and defl is None)
                else None,
                precondition=cfg.pressure_precondition,
                x0_fn=x0_fn,
                stall_iters=cfg.pressure_stall_iters,
                coarse_fn=coarse_fn,
                precond_override=mg_fn,
                coarse_strips=cfg.pressure_coarse_strips,
                refine_restarts=cfg.pressure_refine_restarts,
                refine_inner_tol=cfg.pressure_refine_inner_tol,
            )
            info = info._replace(
                pressure_converged=jnp.logical_and(
                    info.pressure_converged, p_info.converged),
                pressure_iterations=info.pressure_iterations
                + jnp.maximum(p_info.iterations, 0),
                pressure_residual=jnp.maximum(
                    info.pressure_residual, p_info.residual.astype(dtype)),
            )
            if cfg.normalize_pressure_result:
                mean = _global_mean(pressures)
                pressures = tuple(p - mean for p in pressures)
        for b in range(nblocks):
            state = state.replace_block(
                b, replace(state.blocks[b], pressure=pressures[b])
            )
        state = _run_hooks(hooks, "POST_PRESSURE_RESULT", state, time_step=dt)
        pressures = tuple(blk.pressure for blk in state.blocks)
        u_star = st.correct_velocity_fd(
            hbyA, pressures, adiags, geoms, topo, dt,
            time_step_normalized=cfg.pressure_time_step_normalized,
        )

    for b in range(nblocks):
        state = state.replace_block(
            b, replace(state.blocks[b], velocity=u_star[b], pressure=pressures[b])
        )
    state = _run_hooks(hooks, "POST", state, time_step=dt)
    return state, info


def piso_adaptive_step(
    state: DomainState,
    geoms: tuple[BlockGeom, ...],
    topo: DomainTopo,
    cfg: SimConfig,
    time_target: Array,
    hooks: Hooks | None = None,
) -> DomainState:
    """See ``piso_adaptive_step_info`` (info discarded -> DCE'd)."""
    return piso_adaptive_step_info(state, geoms, topo, cfg, time_target, hooks)[0]


def piso_adaptive_step_info(
    state: DomainState,
    geoms: tuple[BlockGeom, ...],
    topo: DomainTopo,
    cfg: SimConfig,
    time_target: Array,
    hooks: Hooks | None = None,
) -> tuple[DomainState, StepInfo]:
    """Advance ``time_target`` with CFL-limited substeps, fully on-device
    (reference ``_PISO_adaptive_step``, PISOtorch_simulation.py:2004-2064).

    Non-differentiable mode uses a dynamic ``lax.while_loop`` (runs exactly
    as many substeps as the CFL requires).  Differentiable mode (reverse-mode
    AD cannot differentiate a dynamic while_loop) uses a masked ``lax.scan``
    of static length ``cfg.diff_adaptive_max_substeps``: each iteration
    either takes one CFL substep or, once ``remaining`` is exhausted, passes
    the state through unchanged via ``lax.cond`` (the reference's eager-torch
    adaptive loop needs no such bound; this is the jit-compatible
    equivalent)."""
    dtype = state.blocks[0].velocity.dtype
    time_target = jnp.asarray(time_target, dtype)
    eps = 1e-6 * time_target

    def cfl_ts(s, remaining):
        max_vel = st.max_computational_velocity(s, geoms, topo)
        max_ts = jnp.where(
            max_vel > 1e-30, cfg.adaptive_cfl / jnp.maximum(max_vel, 1e-30),
            remaining,
        )
        substeps = jnp.maximum(jnp.ceil(remaining / max_ts), 1.0)
        return remaining / substeps

    if cfg.differentiable:
        n_scan = cfg.diff_adaptive_max_substeps

        extrap = cfg.pressure_extrapolate

        def body(carry, i):
            if extrap:
                s, remaining, info, p_prev, dt_prev = carry
            else:
                s, remaining, info = carry
            done = remaining <= eps
            # guarantee the scan CONSUMES time_target even when the CFL asks
            # for more substeps than remain: stretch to remaining/(n_scan-i)
            # (mild CFL excess) rather than silently dropping simulated time,
            # which would desynchronize the env clock from the state.
            iters_left = jnp.asarray(n_scan - i, remaining.dtype)
            ts = jnp.maximum(cfl_ts(s, remaining), remaining / iters_left)
            # keep the (discarded) dummy step numerically safe AND small:
            # under vmap the cond lowers to a select, so done lanes still
            # execute the substep -- a large dummy dt can overflow fp32 and
            # 0*NaN would poison reverse-mode cotangents of the whole batch
            ts_safe = jnp.where(
                done, jnp.asarray(cfg.dt / n_scan, ts.dtype), ts)
            prev = (p_prev, dt_prev) if extrap else None
            p_entry = (tuple(blk.pressure for blk in s.blocks)
                       if extrap else None)
            s, si = lax.cond(
                done,
                lambda s_, ts_: (s_, _info_identity(dtype)),
                lambda s_, ts_: piso_substep_info(
                    s_, geoms, topo, cfg, ts_, hooks, prev=prev),
                s, ts_safe,
            )
            info = _info_merge(info, si)
            remaining = jnp.where(done, remaining, jnp.maximum(remaining - ts, 0.0))
            if extrap:
                # done lanes keep their history (the dummy substep is a no-op)
                p_keep = tuple(jnp.where(done, q, pe)
                               for q, pe in zip(p_prev, p_entry))
                dt_keep = jnp.where(done, dt_prev, ts_safe)
                return (s, remaining, info, p_keep, dt_keep), None
            return (s, remaining, info), None

        if extrap:
            p0 = tuple(blk.pressure for blk in state.blocks)
            (state, _, info, _, _), _ = lax.scan(
                body, (state, time_target, _info_identity(dtype), p0,
                       jnp.asarray(1.0, dtype)),
                jnp.arange(n_scan))
        else:
            (state, _, info), _ = lax.scan(
                body, (state, time_target, _info_identity(dtype)),
                jnp.arange(n_scan))
        return state, info

    if cfg.pressure_extrapolate:
        def cond(carry):
            return jnp.logical_and(carry[1] > eps, carry[2] < cfg.max_substeps)

        def body(carry):
            s, remaining, it, info, p_prev, dt_prev = carry
            ts = cfl_ts(s, remaining)
            p_entry = tuple(blk.pressure for blk in s.blocks)
            s, si = piso_substep_info(s, geoms, topo, cfg, ts, hooks,
                                      prev=(p_prev, dt_prev))
            return (s, remaining - ts, it + 1, _info_merge(info, si),
                    p_entry, ts)

        p0 = tuple(blk.pressure for blk in state.blocks)
        state, _, _, info, _, _ = lax.while_loop(
            cond, body,
            (state, time_target, jnp.asarray(0, jnp.int32),
             _info_identity(dtype), p0, jnp.asarray(1.0, dtype)))
        return state, info

    def cond(carry):
        _, remaining, it, _info = carry
        return jnp.logical_and(remaining > eps, it < cfg.max_substeps)

    def body(carry):
        s, remaining, it, info = carry
        ts = cfl_ts(s, remaining)
        s, si = piso_substep_info(s, geoms, topo, cfg, ts, hooks)
        return s, remaining - ts, it + 1, _info_merge(info, si)

    state, _, _, info = lax.while_loop(
        cond, body,
        (state, time_target, jnp.asarray(0, jnp.int32), _info_identity(dtype)))
    return state, info


def piso_fixed_steps(
    state: DomainState,
    geoms: tuple[BlockGeom, ...],
    topo: DomainTopo,
    cfg: SimConfig,
    dt: Array,
    n_steps: int,
    hooks: Hooks | None = None,
    use_remat: bool = False,
) -> DomainState:
    """``n_steps`` uniform substeps of size ``dt`` via ``lax.scan`` --
    reverse-differentiable; ``use_remat`` wraps each substep in
    ``jax.checkpoint`` (replaces the reference's manual detach/truncated-BPTT
    memory management for long rollouts)."""
    return piso_fixed_steps_info(
        state, geoms, topo, cfg, dt, n_steps, hooks, use_remat)[0]


def piso_fixed_steps_info(
    state: DomainState,
    geoms: tuple[BlockGeom, ...],
    topo: DomainTopo,
    cfg: SimConfig,
    dt: Array,
    n_steps: int,
    hooks: Hooks | None = None,
    use_remat: bool = False,
) -> tuple[DomainState, StepInfo]:
    """``piso_fixed_steps`` returning the aggregated ``StepInfo``."""

    if cfg.pressure_extrapolate:
        def step(carry, _):
            s, info, p_prev = carry
            p_entry = tuple(blk.pressure for blk in s.blocks)
            s, si = piso_substep_info(
                s, geoms, topo, cfg, dt, hooks,
                prev=(p_prev, jnp.asarray(dt, p_prev[0].dtype)))
            return (s, _info_merge(info, si), p_entry), None

        if use_remat:
            step = jax.checkpoint(step)
        p0 = tuple(blk.pressure for blk in state.blocks)
        (state, info, _), _ = lax.scan(
            step, (state, _info_identity(state.blocks[0].velocity.dtype), p0),
            None, length=n_steps)
        return state, info

    def step(carry, _):
        s, info = carry
        s, si = piso_substep_info(s, geoms, topo, cfg, dt, hooks)
        return (s, _info_merge(info, si)), None

    if use_remat:
        step = jax.checkpoint(step)
    (state, info), _ = lax.scan(
        step, (state, _info_identity(state.blocks[0].velocity.dtype)),
        None, length=n_steps)
    return state, info


def single_step(
    state: DomainState,
    geoms: tuple[BlockGeom, ...],
    topo: DomainTopo,
    cfg: SimConfig,
    hooks: Hooks | None = None,
) -> DomainState:
    """One env-level simulation step of physical length ``cfg.dt``
    (reference Simulation.single_step, simulation.py:210-280)."""
    return single_step_info(state, geoms, topo, cfg, hooks)[0]


def single_step_info(
    state: DomainState,
    geoms: tuple[BlockGeom, ...],
    topo: DomainTopo,
    cfg: SimConfig,
    hooks: Hooks | None = None,
) -> tuple[DomainState, StepInfo]:
    """``single_step`` returning the aggregated solver ``StepInfo`` -- the
    TPU-native form of the reference's LinsolveError/False-return failure
    signal (simulation.py:266-280): jitted programs cannot raise, so envs
    surface these fields through the step ``info`` dict instead."""
    dt = jnp.asarray(cfg.dt, state.blocks[0].velocity.dtype)
    if cfg.substeps == ADAPTIVE:
        return piso_adaptive_step_info(state, geoms, topo, cfg, dt, hooks)
    return piso_fixed_steps_info(
        state, geoms, topo, cfg, dt / cfg.substeps, cfg.substeps, hooks
    )


def make_divergence_free(
    state: DomainState,
    geoms: tuple[BlockGeom, ...],
    topo: DomainTopo,
    cfg: SimConfig,
    iterations: int | None = None,
    maxiter: int = 1000,
    hooks: Hooks | None = None,
) -> DomainState:
    """Pressure-project the current velocity to divergence free
    (reference make_divergence_free, PISOtorch_simulation.py:1320-1429:
    A=1, dt=1, hbyA = velocity).

    On non-orthogonal (curvilinear) configs the deferred pressure coupling
    (nonortho.deferred_rhs_flux, mirroring the corrector loop and the
    reference's pressure_non_ortho_steps at PISOtorch_simulation.py:
    1366-1374) enters the RHS from the previous pressure iterate, so
    ``iterations`` defaults to 2 there (1 on orthogonal configs) to converge
    the deferred term.
    """
    if iterations is None:
        iterations = 1
    # inner deferred non-orthogonal passes per projection, mirroring the
    # corrector loop's treatment (fixed hbyA, deferred RHS from the previous
    # TOTAL pressure iterate of THIS A=1 system, velocity corrected from the
    # original field with the final pressure)
    n_inner = 2 if cfg.non_orthogonal and not cfg.pressure_full_mode else 1
    nblocks = len(topo.blocks)
    one = jnp.asarray(1.0, state.blocks[0].velocity.dtype)
    adiags = tuple(jnp.ones_like(g.det) for g in geoms)
    p_ops = st.build_pressure_ops(adiags, geoms, topo)
    inv_a = tuple(jnp.ones_like(g.det) for g in geoms)
    p_use_bicg = cfg.pressure_use_bicg or cfg.pressure_full_mode
    p_matvec_extra = None
    if cfg.pressure_full_mode:
        def p_matvec_extra(xs, _inv_a=inv_a):
            return nonortho.deferred_rhs_flux(xs, geoms, topo, _inv_a)

    for _ in range(iterations):
        state = _run_hooks(hooks, "PRE", state, time_step=one)
        hbyA = tuple(blk.velocity for blk in state.blocks)
        div0 = st.divergence_of(hbyA, state, geoms, topo)
        proj_p = tuple(jnp.zeros_like(blk.pressure) for blk in state.blocks)
        for _inner in range(n_inner):
            div = div0
            if cfg.non_orthogonal and not cfg.pressure_full_mode:
                Sp = nonortho.deferred_rhs_flux(proj_p, geoms, topo, inv_a)
                div = tuple(d + sp for d, sp in zip(div0, Sp))
            rhs_p = tuple(-d for d in div)
            if cfg.normalize_pressure_result:
                rhs_mean = _global_mean(rhs_p)  # solvability projection
                rhs_p = tuple(r - rhs_mean for r in rhs_p)
            pressures, _proj_info = _solve(
                p_ops, rhs_p, topo,
                tol=cfg.pressure_tol, maxiter=maxiter,
                symmetric=not p_use_bicg, use_bicg=p_use_bicg,
                matvec_extra=p_matvec_extra,
                return_best=cfg.pressure_return_best_result,
                differentiable=cfg.differentiable,
                precondition=cfg.pressure_precondition,
                coarse_strips=cfg.pressure_coarse_strips,
                refine_restarts=cfg.pressure_refine_restarts,
                refine_inner_tol=cfg.pressure_refine_inner_tol,
            )
            if cfg.normalize_pressure_result:
                mean = _global_mean(pressures)
                pressures = tuple(p - mean for p in pressures)
            proj_p = pressures
        vel = st.correct_velocity_fd(
            hbyA, pressures, adiags, geoms, topo, one,
            time_step_normalized=cfg.pressure_time_step_normalized,
        )
        for b in range(nblocks):
            state = state.replace_block(
                b, replace(state.blocks[b], velocity=vel[b], pressure=pressures[b])
            )
    return state


def advect_static(
    state: DomainState,
    geoms: tuple[BlockGeom, ...],
    topo: DomainTopo,
    cfg: SimConfig,
    dt: Array,
    iterations: int = 1,
    hooks: Hooks | None = None,
) -> DomainState:
    """Scalar-only advection: advance the passive-scalar channels with the
    velocity field frozen (reference Simulation.advect_static,
    PISOtorch_simulation.py:1184-1318).  Runs the PRE hook each iteration,
    like the reference's prep_fn dispatch."""
    if not (topo.has_scalar and state.blocks[0].scalar is not None):
        raise ValueError("Domain has no passive scalar to advect.")
    dt = jnp.asarray(dt, state.blocks[0].velocity.dtype)
    for _ in range(iterations):
        state = _run_hooks(hooks, "PRE", state, time_step=dt)
        state, _converged = _advect_scalars(state, geoms, topo, cfg, dt)
    return state


def get_max_time_step(
    state: DomainState,
    geoms: tuple[BlockGeom, ...],
    topo: DomainTopo,
    time_step_target,
    cfl: float = 0.8,
):
    """CFL-limited substep size for a target step: returns ``(ts, substeps)``
    with ``ts * substeps == time_step_target`` (reference get_max_time_step,
    PISOtorch_simulation.py:42-54; computed on-device, no host sync)."""
    time_step_target = jnp.asarray(
        time_step_target, state.blocks[0].velocity.dtype)
    max_vel = st.max_computational_velocity(state, geoms, topo)
    max_ts = jnp.where(
        max_vel > 1e-30, cfl / jnp.maximum(max_vel, 1e-30), time_step_target)
    substeps = jnp.maximum(jnp.ceil(time_step_target / max_ts), 1.0)
    return time_step_target / substeps, substeps.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("topo", "cfg", "iterations"))
def jit_make_divergence_free(state, geoms, *, topo, cfg, iterations=None):
    """Module-level jitted projection: caches the (expensive) trace/compile
    across env resets and across the env slots of a BatchedFluidEnv --
    ``jax.jit(partial(make_divergence_free, ...))`` built fresh per reset can
    never be reused (new function identity every time)."""
    return make_divergence_free(state, geoms, topo, cfg, iterations=iterations)
