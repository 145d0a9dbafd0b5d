"""Distributed VI full BA + sharded pose graph on the virtual 8-device mesh.

VERDICT r2 #3: "Shard the visual-inertial full BA and the pose graph".
These gates check the sharded solvers against their single-device
counterparts (optim/vi_ba.py, optim/pose_graph.py) on the same problems.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from orb_slam3_modified_tpu.lie import so3 as so3m
from orb_slam3_modified_tpu.lie.sim3 import Sim3
from orb_slam3_modified_tpu.optim.pose_graph import (
    PoseGraphProblem,
    make_relative,
    optimize_pose_graph,
)
from orb_slam3_modified_tpu.optim.vi_ba import vi_bundle_adjust
from orb_slam3_modified_tpu.parallel.dist_pose_graph import dist_optimize_pose_graph
from orb_slam3_modified_tpu.parallel.dist_vi_ba import dist_vi_bundle_adjust

from test_vi_ba import CAM, _make_problem


@pytest.fixture(scope="module")
def mesh8():
    devs = np.array(jax.devices()[:8])
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(devs, ("ba",))


class TestDistVIBA:
    def test_matches_single_device(self, mesh8):
        prob, R_gt, t_gt, v_gt, pts_gt = _make_problem()
        res1 = vi_bundle_adjust(prob, CAM, 2, 10)
        res8, part = dist_vi_bundle_adjust(prob, CAM, mesh8, 2, 10)
        R = np.asarray(res8.T_cw.R)
        t = np.asarray(res8.T_cw.t)
        rot_err = np.array(
            [np.linalg.norm(R[k] @ R_gt[k].T - np.eye(3)) for k in range(len(R))]
        )
        c_est = -np.einsum("kji,kj->ki", R, t)
        c_gt = -np.einsum("kji,kj->ki", R_gt, t_gt)
        assert rot_err.max() < 5e-3, f"rot err {rot_err.max()}"
        assert np.abs(c_est - c_gt).max() < 2e-2
        v_err = np.linalg.norm(np.asarray(res8.v_w) - v_gt, axis=-1)
        assert v_err.mean() < 0.05
        # agreement with the single-device solve (same math, same schedule)
        c1 = -np.einsum(
            "kji,kj->ki", np.asarray(res1.T_cw.R), np.asarray(res1.T_cw.t)
        )
        assert np.abs(c_est - c1).max() < 5e-3

    def test_velocity_estimation(self, mesh8):
        prob, R_gt, t_gt, v_gt, pts_gt = _make_problem(seed=3)
        res8, _ = dist_vi_bundle_adjust(prob, CAM, mesh8, 2, 10)
        v_err0 = np.linalg.norm(np.asarray(prob.v_w) - v_gt, axis=-1).mean()
        v_err1 = np.linalg.norm(np.asarray(res8.v_w) - v_gt, axis=-1).mean()
        assert v_err1 < 0.5 * v_err0


def _ring_graph(K=24, drift=0.02, seed=0, yaw_only=False):
    """Odometry ring with drift + one loop edge, like a loop-closure graph.
    yaw_only limits rotational drift to yaw (what 4-DoF can correct)."""
    rng = np.random.default_rng(seed)
    # ground truth: poses on a circle
    angles = np.linspace(0, 2 * np.pi, K, endpoint=False)
    R_gt = np.stack(
        [np.asarray(so3m.exp(jnp.asarray([0.0, 0.0, a], jnp.float32))) for a in angles]
    )
    t_gt = np.stack(
        [np.array([np.cos(a), np.sin(a), 0.0], np.float32) for a in angles]
    )
    S_gt = Sim3(jnp.ones(K), jnp.asarray(R_gt), jnp.asarray(t_gt))
    # drifted initial guess: accumulate noisy odometry
    R0, t0 = [R_gt[0]], [t_gt[0]]
    for k in range(1, K):
        dR = R_gt[k] @ R_gt[k - 1].T
        dt = t_gt[k] - dR @ t_gt[k - 1]
        axis = rng.normal(0, drift, 3)
        if yaw_only:
            axis[:2] = 0.0
        n = np.asarray(so3m.exp(jnp.asarray(axis.astype(np.float32))))
        R0.append(n @ dR @ R0[-1])
        t0.append(dR @ t0[-1] + dt + rng.normal(0, drift, 3))
    S0 = Sim3(
        jnp.ones(K),
        jnp.asarray(np.stack(R0).astype(np.float32)),
        jnp.asarray(np.stack(t0).astype(np.float32)),
    )
    ei = np.arange(K - 1, dtype=np.int32)
    ej = np.arange(1, K, dtype=np.int32)
    # loop edge K-1 -> 0 with the TRUE relative
    ei = np.concatenate([ei, [K - 1]]).astype(np.int32)
    ej = np.concatenate([ej, [0]]).astype(np.int32)
    meas = make_relative(S_gt, jnp.asarray(ei), jnp.asarray(ej))
    fixed = np.zeros(K, bool)
    fixed[0] = True
    prob = PoseGraphProblem(
        S=S0,
        fixed=jnp.asarray(fixed),
        edge_i=jnp.asarray(ei),
        edge_j=jnp.asarray(ej),
        S_ji_meas=meas,
        edge_weight=jnp.ones(len(ei)),
        edge_valid=jnp.ones(len(ei), bool),
    )
    return prob, S_gt


class TestDistPoseGraph:
    def test_matches_single_device(self, mesh8):
        prob, S_gt = _ring_graph()
        S1 = optimize_pose_graph(prob, False, 25)
        S8 = dist_optimize_pose_graph(prob, mesh8, False, 25)
        t_gt = np.asarray(S_gt.t)
        err0 = np.abs(np.asarray(prob.S.t) - t_gt).max()
        err1 = np.abs(np.asarray(S1.t) - t_gt).max()
        err8 = np.abs(np.asarray(S8.t) - t_gt).max()
        assert err8 < 0.3 * err0, f"{err0} -> {err8}"
        assert abs(err8 - err1) < 0.05, f"single {err1} vs sharded {err8}"

    def test_four_dof(self, mesh8):
        prob, S_gt = _ring_graph(seed=2, yaw_only=True)
        S8 = dist_optimize_pose_graph(prob, mesh8, True, 25)
        # roll/pitch/scale untouched in 4-DoF mode
        np.testing.assert_allclose(np.asarray(S8.s), 1.0, atol=1e-5)
        err0 = np.abs(np.asarray(prob.S.t) - np.asarray(S_gt.t)).max()
        err8 = np.abs(np.asarray(S8.t) - np.asarray(S_gt.t)).max()
        assert err8 < 0.5 * err0
