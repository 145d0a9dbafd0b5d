"""Worker for the 2-process distributed-BA gate (VERDICT r2 #4).

Each process:
- bootstraps jax.distributed over local TCP (CPU backend, 2 virtual
  devices per process -> a 4-device global mesh),
- builds the SAME deterministic BA problem,
- partitions by point and keeps only ITS OWN shard rows (local_rows),
- assembles global arrays with make_array_from_process_local_data
  (multihost.distribute_array) — no process ever holds the other's device
  shards,
- runs dist_bundle_adjust on the pre-sharded arrays,
- writes its replicated pose result + local point rows to an npz.

Usage: python scripts/multiproc_ba_worker.py <pid> <nprocs> <port> <outdir>
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DEV_PER_PROC = 2


def main():
    pid, nprocs, port, outdir = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={DEV_PER_PROC}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nprocs,
        process_id=pid,
    )
    assert jax.process_count() == nprocs
    n_global = len(jax.devices())
    assert n_global == nprocs * DEV_PER_PROC

    import numpy as np
    from jax.sharding import PartitionSpec as P

    from orb_slam3_modified_tpu.parallel import multihost
    from orb_slam3_modified_tpu.parallel.dist_ba import (
        dist_bundle_adjust,
        local_rows,
        partition_by_point,
    )
    from tests.test_ba import CAM, build_problem

    prob, _ = build_problem(noise_px=0.4)  # deterministic (seeded)
    mesh = multihost.global_mesh("ba")
    part = partition_by_point(prob, n_global)
    # THIS process's shard rows only (host-local ingestion)
    lo = pid * DEV_PER_PROC
    hi = lo + DEV_PER_PROC
    mine = local_rows(part, lo, hi)
    sh = P("ba")
    arrays = {
        "points": multihost.distribute_array(mine.points, mesh, sh),
        "pt_valid": multihost.distribute_array(mine.pt_valid, mesh, sh),
        "obs_cam": multihost.distribute_array(mine.obs_cam, mesh, sh),
        "obs_pt": multihost.distribute_array(mine.obs_pt, mesh, sh),
        "obs_uv": multihost.distribute_array(mine.obs_uv, mesh, sh),
        "obs_inv_s2": multihost.distribute_array(mine.obs_inv_s2, mesh, sh),
        "obs_valid": multihost.distribute_array(mine.obs_valid, mesh, sh),
        "obs_ur": None,
    }
    T, pts = dist_bundle_adjust(prob, CAM, mesh, iters=12, arrays=arrays)
    # poses are replicated: every process can read them; points: read only
    # this process's addressable shards
    R = np.asarray(T.R)
    t = np.asarray(T.t)
    local_pts = np.concatenate(
        [np.asarray(s.data) for s in pts.addressable_shards]
    )
    np.savez(
        os.path.join(outdir, f"rank{pid}.npz"),
        R=R, t=t, local_pts=local_pts, P_l=part.P_l, lo=lo, hi=hi,
    )
    print(f"[rank {pid}] done", flush=True)


if __name__ == "__main__":
    main()
