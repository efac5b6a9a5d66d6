"""Multi-host (pod) scaling: DCN data parallelism x ICI model axes.

The reference scales beyond one accelerator with one OS process per GPU and
``multiprocessing.Pipe`` CPU-tensor shuttling
(``/root/reference/src/fluidgym/envs/parallel_env.py:63-160``).  The
TPU-native story (SURVEY.md section 5, "Distributed communication backend")
is single-program SPMD: ``jax.distributed`` connects the hosts of a pod
slice, and one jitted program spans every chip with XLA placing collectives
on the right fabric — env-batch (``dp``) traffic rides DCN between hosts,
spatial-halo (``sp``) traffic stays on ICI within a host's chips.

``make_pod_mesh`` builds the hybrid mesh with
``mesh_utils.create_hybrid_device_mesh`` so the slow axis maps to DCN and
the fast axes to ICI; on a single process it degrades to the plain
``make_mesh`` layout, which is what the driver's ``dryrun_multichip``
exercises on a virtual device mesh.

Typical pod launch (same script on every host)::

    from fluidgym_tpu.parallel import initialize_distributed, make_pod_mesh

    initialize_distributed()         # env-driven (TPU pods auto-configure)
    mesh = make_pod_mesh(sp=2)       # dp = all remaining capacity
    benv = BatchedFluidEnv(env_id, n_envs, mesh=mesh)
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

from fluidgym_tpu.parallel.spatial import make_mesh

__all__ = ["initialize_distributed", "make_pod_mesh"]


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Connect this host to the pod (idempotent).

    On TPU pods every argument is discovered from the environment
    (``jax.distributed.initialize()`` with no arguments); pass explicit
    values only for CPU/GPU clusters.  Safe to call on a single host:
    a failure to auto-discover peers is reported, not raised, so scripts
    run unchanged on one host and on a pod.
    """
    if jax.process_count() > 1:
        return  # already initialized
    try:
        kwargs = {}
        if coordinator_address is not None:
            kwargs = dict(coordinator_address=coordinator_address,
                          num_processes=num_processes,
                          process_id=process_id)
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError) as e:  # single host, nothing to join
        import logging

        logging.getLogger("fluidgym_tpu").info(
            "jax.distributed not initialized (single host?): %s", e)


def make_pod_mesh(dp: int | None = None, sp: int = 1) -> Mesh:
    """A ``(dp, sp)`` mesh spanning every chip of every connected host.

    Multi-process: ``mesh_utils.create_hybrid_device_mesh`` places the
    ``dp`` axis across hosts (DCN-friendly: env batches never exchange
    data inside a step, only the RL learner reduces across them) and the
    ``sp`` spatial-halo axis within a host's ICI domain.  ``sp`` must
    divide the per-host chip count.  Single-process: identical to
    ``make_mesh`` (ICI only).
    """
    n_local = jax.local_device_count()
    n_total = jax.device_count()
    if jax.process_count() == 1:
        return make_mesh(dp, sp)
    if sp < 1 or n_local % sp:
        raise ValueError(
            f"sp={sp} must divide the {n_local} chips of one host (the "
            f"spatial-halo axis must stay on ICI)")
    dp_local = n_local // sp
    dp_hosts = jax.process_count()
    want_dp = dp if dp is not None else dp_hosts * dp_local
    if want_dp != dp_hosts * dp_local:
        raise ValueError(
            f"dp={dp} incompatible with {dp_hosts} hosts x {dp_local} "
            f"per-host dp capacity (= {dp_hosts * dp_local}); total "
            f"devices {n_total}")
    from jax.experimental import mesh_utils

    devices = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=(dp_local, sp),
        dcn_mesh_shape=(dp_hosts, 1),
    )
    return Mesh(devices.reshape(dp_hosts * dp_local, sp), ("dp", "sp"))
