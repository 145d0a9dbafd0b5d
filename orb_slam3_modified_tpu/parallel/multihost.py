"""Multi-host (multi-process) distributed backend glue.

The reference is a single-process C++ application (SURVEY.md §5.8 notes the
gap); this framework's distributed BA (parallel/dist_ba.py) is written
against a `jax.sharding.Mesh`, which is process-count agnostic — the same
`shard_map` program runs on 1 host × N chips or M hosts × N chips, with XLA
routing the psum over ICI/DCN. What multi-host adds is only *bootstrap*
(jax.distributed.initialize) and *data ingestion* (each process owns the
observation shards of its local devices). This module provides both.

Usage (one process per host, e.g. under SLURM/GKE or manual launch):

    from orb_slam3_modified_tpu.parallel import multihost
    multihost.initialize(coordinator="10.0.0.1:9876",
                         num_processes=4, process_id=rank)
    mesh = multihost.global_mesh("ba")
    sharded_prob = multihost.distribute_problem(prob, mesh)
    ... dist_bundle_adjust(sharded_prob, cam, mesh) ...

On a single host everything degrades to the local-mesh behavior used by
tests and the driver dryrun.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_initialized = False


def initialize(coordinator: str | None = None, num_processes: int | None = None,
               process_id: int | None = None, **kw):
    """Bootstrap the JAX distributed runtime (no-op on a single process).

    Mirrors jax.distributed.initialize; safe to call unconditionally —
    single-process callers (num_processes in (None, 1)) skip the barrier.
    """
    global _initialized
    if _initialized:
        return
    if num_processes is None or num_processes <= 1:
        _initialized = True
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        **kw,
    )
    _initialized = True


def global_mesh(axis: str = "ba", devices=None) -> Mesh:
    """1-D mesh over every device in the job (all hosts).

    jax.devices() is global after initialize(); a single process sees its
    local chips only, which is the same thing.
    """
    devs = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devs, (axis,))


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def distribute_array(x, mesh: Mesh, spec: P):
    """Build a global sharded array from per-process local data.

    Single-process: a plain device_put with the sharding (XLA slices it).
    Multi-process: each process passes ITS OWN shard rows; the global array
    is assembled with make_array_from_process_local_data, so no host ever
    materializes the whole tensor — the ingestion path that lets map sizes
    exceed one host's memory.
    """
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(jnp.asarray(x), sharding)
    # multi-process: x is THIS PROCESS's rows (sharded specs) or the full
    # array (replicated specs); keep it host-side numpy so no device round
    # trip happens before assembly
    return jax.make_array_from_process_local_data(sharding, np.asarray(x))


def distribute_problem(prob, mesh: Mesh, axis: str = "ba"):
    """Lay a (pre-partitioned, padded) BAProblem out on the mesh:
    observations + points sharded along the mesh axis, poses replicated.

    The problem must already be grouped by point shard
    (parallel/dist_ba.py partition_by_point) and padded to multiples of
    the mesh size (pad_problem_for_mesh).
    """
    from ..optim.ba import BAProblem

    shard = P(axis)
    rep = P()
    return BAProblem(
        T_cw=jax.tree_util.tree_map(
            lambda l: distribute_array(l, mesh, rep), prob.T_cw
        ),
        cam_fixed=distribute_array(prob.cam_fixed, mesh, rep),
        points=distribute_array(prob.points, mesh, shard),
        pt_valid=distribute_array(prob.pt_valid, mesh, shard),
        obs_cam=distribute_array(prob.obs_cam, mesh, shard),
        obs_pt=distribute_array(prob.obs_pt, mesh, shard),
        obs_uv=distribute_array(prob.obs_uv, mesh, shard),
        obs_inv_s2=distribute_array(prob.obs_inv_s2, mesh, shard),
        obs_valid=distribute_array(prob.obs_valid, mesh, shard),
        obs_ur=(None if prob.obs_ur is None
                else distribute_array(prob.obs_ur, mesh, shard)),
        bf=(None if prob.bf is None else distribute_array(prob.bf, mesh, rep)),
    )
