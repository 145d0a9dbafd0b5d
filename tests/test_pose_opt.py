"""Motion-only pose optimization tests."""
import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_modified_tpu.cameras import Camera, project
from orb_slam3_modified_tpu.lie import se3
from orb_slam3_modified_tpu.lie.se3 import SE3
from orb_slam3_modified_tpu.optim.pose_opt import pose_optimization
from orb_slam3_modified_tpu.utils.synthetic import make_scene

CAM = Camera.pinhole(458.654, 457.296, 367.215, 248.375, width=752, height=480)


def setup(noise_px=0.5, n=300, outlier_frac=0.0, seed=0):
    scene = make_scene(n_points=n, n_frames=2, noise_px=noise_px, seed=seed)
    T_gt = SE3(scene.T_cw.R[0], scene.T_cw.t[0])
    uv = jnp.asarray(scene.uv[0])
    valid = jnp.asarray(scene.visible[0])
    if outlier_frac > 0:
        rng = np.random.default_rng(seed + 1)
        n_out = int(n * outlier_frac)
        idx = rng.choice(n, n_out, replace=False)
        uv_np = np.array(uv)
        uv_np[idx] += rng.uniform(20, 80, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
        uv = jnp.asarray(uv_np)
    inv_s2 = jnp.ones(n)
    return scene, T_gt, uv, valid, inv_s2


def pose_err(T_est, T_gt):
    dR = np.asarray(T_est.R) @ np.asarray(T_gt.R).T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    dt = np.linalg.norm(np.asarray(T_est.t) - np.asarray(T_gt.t))
    return ang, dt


class TestPoseOptimization:
    def test_converges_from_perturbed_pose(self):
        scene, T_gt, uv, valid, inv_s2 = setup()
        xi = jnp.array([0.05, -0.03, 0.04, 0.02, -0.015, 0.01])
        T0 = se3.exp(xi) @ T_gt
        res = pose_optimization(T0, CAM, jnp.asarray(scene.points), uv, inv_s2, valid=valid)
        ang, dt = pose_err(res.T_cw, T_gt)
        assert ang < 0.05, f"rot err {ang} deg"
        assert dt < 0.01, f"trans err {dt} m"
        assert int(res.n_inliers) > 200

    def test_robust_to_outliers(self):
        scene, T_gt, uv, valid, inv_s2 = setup(outlier_frac=0.3)
        xi = jnp.array([0.03, 0.02, -0.03, 0.01, 0.02, -0.01])
        T0 = se3.exp(xi) @ T_gt
        res = pose_optimization(T0, CAM, jnp.asarray(scene.points), uv, inv_s2, valid=valid)
        ang, dt = pose_err(res.T_cw, T_gt)
        assert ang < 0.1, f"rot err {ang} deg"
        assert dt < 0.02, f"trans err {dt} m"
        # outliers should be flagged
        inl = np.asarray(res.inliers)
        assert inl.sum() < np.asarray(valid).sum()

    def test_exact_at_ground_truth_noiseless(self):
        scene, T_gt, uv, valid, inv_s2 = setup(noise_px=0.0)
        res = pose_optimization(T_gt, CAM, jnp.asarray(scene.points), uv, inv_s2, valid=valid)
        ang, dt = pose_err(res.T_cw, T_gt)
        assert ang < 1e-3 and dt < 1e-4

    def test_large_initial_error(self):
        scene, T_gt, uv, valid, inv_s2 = setup()
        xi = jnp.array([0.3, -0.2, 0.2, 0.1, -0.1, 0.08])
        T0 = se3.exp(xi) @ T_gt
        res = pose_optimization(T0, CAM, jnp.asarray(scene.points), uv, inv_s2, valid=valid)
        ang, dt = pose_err(res.T_cw, T_gt)
        assert ang < 0.1 and dt < 0.05
