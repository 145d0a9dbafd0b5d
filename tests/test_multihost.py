"""Multi-host glue (parallel/multihost.py) on the virtual 8-device mesh.

True multi-process runs need multiple hosts; here we verify the
process-count-agnostic pieces: bootstrap no-op, global mesh construction,
per-spec array distribution, and that a distributed problem still solves.
"""
import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from orb_slam3_modified_tpu.parallel import multihost
from orb_slam3_modified_tpu.parallel.dist_ba import (
    dist_bundle_adjust,
    pad_problem_for_mesh,
)
from tests.test_ba import CAM, build_problem, reproj_rmse


def test_initialize_single_process_noop():
    multihost.initialize()  # no coordinator: must not raise or block
    assert not multihost.is_multiprocess()


def test_global_mesh_covers_all_devices():
    mesh = multihost.global_mesh("ba")
    assert mesh.shape["ba"] == len(jax.devices())


def test_distribute_array_shards_rows():
    mesh = multihost.global_mesh("ba")
    n = mesh.shape["ba"]
    x = np.arange(n * 4 * 3, dtype=np.float32).reshape(n * 4, 3)
    xd = multihost.distribute_array(x, mesh, P("ba"))
    assert len(xd.sharding.device_set) == n
    np.testing.assert_array_equal(np.asarray(xd), x)
    rep = multihost.distribute_array(x, mesh, P())
    assert np.asarray(rep.sharding.is_fully_replicated)


def test_distributed_problem_solves():
    mesh = multihost.global_mesh("ba")
    if mesh.shape["ba"] < 8:
        pytest.skip("needs 8 virtual devices")
    prob, _ = build_problem(noise_px=0.4)
    prob_p = pad_problem_for_mesh(prob, mesh.shape["ba"])
    prob_d = multihost.distribute_problem(prob_p, mesh)
    before = reproj_rmse(prob.T_cw, prob.points, prob)
    T, pts = dist_bundle_adjust(prob_d, CAM, mesh, iters=12)
    after = reproj_rmse(T, pts[: prob.points.shape[0]], prob)
    assert after < before * 0.25
