"""Bundle adjustment tests on synthetic scenes."""
import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_modified_tpu.cameras import Camera
from orb_slam3_modified_tpu.lie import se3
from orb_slam3_modified_tpu.lie.se3 import SE3
from orb_slam3_modified_tpu.optim.ba import BAProblem, bundle_adjust
from orb_slam3_modified_tpu.utils.synthetic import make_scene

CAM = Camera.pinhole(458.654, 457.296, 367.215, 248.375, width=752, height=480)


def build_problem(noise_px=0.5, n_pts=200, n_kf=6, pose_noise=0.02, pt_noise=0.05, seed=0):
    scene = make_scene(n_points=n_pts, n_frames=n_kf, noise_px=noise_px, seed=seed)
    rng = np.random.default_rng(seed + 10)
    # observations: every visible (kf, pt)
    obs_cam, obs_pt, obs_uv = [], [], []
    for k in range(n_kf):
        for p in range(n_pts):
            if scene.visible[k, p]:
                obs_cam.append(k)
                obs_pt.append(p)
                obs_uv.append(scene.uv[k, p])
    O = len(obs_cam)
    # perturb poses (except anchor 0) and points
    xi = rng.normal(0, pose_noise, (n_kf, 6)).astype(np.float32)
    xi[0] = 0
    T_noisy = se3.exp(jnp.asarray(xi)) @ SE3(scene.T_cw.R, scene.T_cw.t)
    pts_noisy = scene.points + rng.normal(0, pt_noise, scene.points.shape).astype(np.float32)
    prob = BAProblem(
        T_cw=T_noisy,
        cam_fixed=jnp.zeros(n_kf, bool).at[0].set(True),
        points=jnp.asarray(pts_noisy),
        pt_valid=jnp.ones(n_pts, bool),
        obs_cam=jnp.asarray(np.array(obs_cam, np.int32)),
        obs_pt=jnp.asarray(np.array(obs_pt, np.int32)),
        obs_uv=jnp.asarray(np.array(obs_uv, np.float32)),
        obs_inv_s2=jnp.ones(O),
        obs_valid=jnp.ones(O, bool),
    )
    return prob, scene


def reproj_rmse(T, pts, prob, mask=None):
    from orb_slam3_modified_tpu.cameras import project

    Rc = T.R[prob.obs_cam]
    tc = T.t[prob.obs_cam]
    pc = jnp.einsum("oij,oj->oi", Rc, pts[prob.obs_pt]) + tc
    uv = project(CAM, pc)
    e = jnp.sum((uv - prob.obs_uv) ** 2, axis=-1)
    m = prob.obs_valid if mask is None else mask
    return float(jnp.sqrt(jnp.sum(jnp.where(m, e, 0)) / jnp.sum(m)))


class TestBundleAdjust:
    def test_reduces_reprojection_error(self):
        prob, scene = build_problem()
        before = reproj_rmse(prob.T_cw, prob.points, prob)
        res = bundle_adjust(prob, CAM)
        after = reproj_rmse(res.T_cw, res.points, prob, res.obs_inlier)
        assert after < before * 0.2, f"{before} -> {after}"
        assert after < 1.0, f"final rmse {after}px"

    def test_recovers_poses(self):
        prob, scene = build_problem(noise_px=0.3)
        res = bundle_adjust(prob, CAM)
        # compare rotation of optimized vs gt
        for k in range(1, 6):
            dR = np.asarray(res.T_cw.R[k]) @ np.asarray(scene.T_cw.R[k]).T
            ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
            assert ang < 0.3, f"kf{k} rot err {ang}"

    def test_fixed_camera_unchanged(self):
        prob, _ = build_problem()
        res = bundle_adjust(prob, CAM)
        np.testing.assert_allclose(
            np.asarray(res.T_cw.R[0]), np.asarray(prob.T_cw.R[0]), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(res.T_cw.t[0]), np.asarray(prob.T_cw.t[0]), atol=1e-6
        )

    def test_outliers_classified(self):
        prob, scene = build_problem(noise_px=0.3)
        rng = np.random.default_rng(42)
        uv = np.array(prob.obs_uv)
        n_out = len(uv) // 10
        out_idx = rng.choice(len(uv), n_out, replace=False)
        uv[out_idx] += rng.uniform(15, 60, (n_out, 2))
        prob = prob._replace(obs_uv=jnp.asarray(uv))
        res = bundle_adjust(prob, CAM)
        inl = np.asarray(res.obs_inlier)
        assert inl[out_idx].mean() < 0.2, "outliers not flagged"
        keep = np.ones(len(uv), bool)
        keep[out_idx] = False
        assert inl[keep].mean() > 0.9, "inliers wrongly dropped"
