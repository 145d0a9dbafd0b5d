"""Visual-inertial tracking pose optimization tests."""
import jax.numpy as jnp
import numpy as np

from orb_slam3_modified_tpu.cameras import Camera, project
from orb_slam3_modified_tpu.imu.preintegration import GRAVITY_VEC, ImuBias, integrate
from orb_slam3_modified_tpu.lie import se3, so3
from orb_slam3_modified_tpu.lie.se3 import SE3
from orb_slam3_modified_tpu.optim.vi_pose_opt import vi_pose_optimization

CAM = Camera.pinhole(458.654, 457.296, 367.215, 248.375, width=752, height=480)


def make_vi_case(noise_px=0.5, seed=0):
    """Body moves between two instants under gravity; visual + IMU agree."""
    rng = np.random.default_rng(seed)
    g = np.asarray(GRAVITY_VEC)
    # previous state
    R0 = np.asarray(so3.exp(jnp.asarray([0.05, -0.1, 0.2])))
    p0 = np.array([0.5, -0.2, 0.0])
    v0 = np.array([0.3, 0.1, 0.05])
    # constant body rate + world accel over dt
    w = np.array([0.1, 0.2, -0.1])
    a_w = np.array([0.2, -0.1, 0.3])
    dt_total, freq = 0.05, 200.0
    n = int(dt_total * freq)
    accs, gyrs = [], []
    R, v, p = R0.copy(), v0.copy(), p0.copy()
    for i in range(n):
        accs.append(R.T @ (a_w - g))
        gyrs.append(w)
        h = 1.0 / freq
        p = p + v * h + 0.5 * a_w * h * h
        v = v + a_w * h
        R = R @ np.asarray(so3.exp(jnp.asarray(w * h)))
    pre = integrate(
        jnp.asarray(np.array(accs, np.float32)),
        jnp.asarray(np.array(gyrs, np.float32)),
        jnp.full(n, 1.0 / freq, jnp.float32),
        jnp.ones(n, bool),
        ImuBias.zero(),
    )
    # current ground truth camera pose (camera == body)
    R_cw = R.T
    t_cw = -R_cw @ p
    T_gt = SE3(jnp.asarray(R_cw.astype(np.float32)), jnp.asarray(t_cw.astype(np.float32)))
    # visual observations
    n_pts = 300
    pts = rng.uniform(-3, 3, (n_pts, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(4, 9, n_pts)
    pts_w = (pts - np.asarray(t_cw)) @ np.asarray(R_cw)  # put in front: world pts
    pc = pts_w @ np.asarray(R_cw).T + np.asarray(t_cw)
    uv = np.array(project(CAM, jnp.asarray(pc.astype(np.float32))))
    uv += rng.normal(0, noise_px, uv.shape)
    return (T_gt, R0, p0, v0, v, pre, jnp.asarray(pts_w.astype(np.float32)),
            jnp.asarray(uv.astype(np.float32)))


class TestVIPoseOpt:
    def test_converges(self):
        T_gt, R0, p0, v0, v_end, pre, pts_w, uv = make_vi_case()
        xi = jnp.asarray([0.02, -0.01, 0.015, 0.01, -0.008, 0.012])
        T0 = se3.exp(xi) @ T_gt
        res = vi_pose_optimization(
            T0, CAM, pts_w, uv, jnp.ones(pts_w.shape[0]), jnp.ones(pts_w.shape[0], bool),
            jnp.asarray(R0.astype(np.float32)), jnp.asarray(p0.astype(np.float32)),
            jnp.asarray(v0.astype(np.float32)),
            pre.dT, pre.dR, pre.dV, pre.dP,
            pre.JRg, pre.JVg, pre.JVa, pre.JPg, pre.JPa,
        )
        dR = np.asarray(res.T_cw.R) @ np.asarray(T_gt.R).T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 0.3, f"rot err {ang}"
        assert np.linalg.norm(np.asarray(res.T_cw.t) - np.asarray(T_gt.t)) < 0.05
        # velocity recovered near the true end velocity
        assert np.linalg.norm(np.asarray(res.v_w) - v_end) < 0.1

    def test_inertial_regularizes_few_points(self):
        """With very few visual points, the inertial factor should keep the
        pose near the IMU prediction instead of overfitting."""
        T_gt, R0, p0, v0, v_end, pre, pts_w, uv = make_vi_case(noise_px=2.0)
        few = 12
        res = vi_pose_optimization(
            se3.exp(jnp.asarray([0.03, 0, 0, 0, 0.02, 0])) @ T_gt,
            CAM, pts_w[:few], uv[:few], jnp.ones(few), jnp.ones(few, bool),
            jnp.asarray(R0.astype(np.float32)), jnp.asarray(p0.astype(np.float32)),
            jnp.asarray(v0.astype(np.float32)),
            pre.dT, pre.dR, pre.dV, pre.dP,
            pre.JRg, pre.JVg, pre.JVa, pre.JPg, pre.JPa,
        )
        dR = np.asarray(res.T_cw.R) @ np.asarray(T_gt.R).T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 2.0
        assert np.isfinite(np.asarray(res.T_cw.t)).all()


class TestVIMargPoseOpt:
    def _solve(self, H_prior, few=None, seed=0):
        from orb_slam3_modified_tpu.optim.vi_pose_opt import (
            vi_pose_optimization_marg,
        )

        T_gt, R0, p0, v0, v_end, pre, pts_w, uv = make_vi_case(seed=seed)
        if few is not None:
            pts_w, uv = pts_w[:few], uv[:few]
        n = pts_w.shape[0]
        xi = jnp.asarray([0.02, -0.01, 0.015, 0.01, -0.008, 0.012])
        T0 = se3.exp(xi) @ T_gt
        res = vi_pose_optimization_marg(
            T0, CAM, pts_w, uv, jnp.ones(n), jnp.ones(n, bool),
            jnp.asarray(R0.astype(np.float32)), jnp.asarray(p0.astype(np.float32)),
            jnp.asarray(v0.astype(np.float32)),
            jnp.asarray(H_prior.astype(np.float32)),
            pre.dT, pre.dR, pre.dV, pre.dP,
            pre.JRg, pre.JVg, pre.JVa, pre.JPg, pre.JPa,
            C=pre.C,
        )
        return T_gt, v_end, res

    def test_converges_with_strong_prior(self):
        H = np.diag(np.concatenate([np.full(6, 1e6), np.full(9, 1e4)]))
        T_gt, v_end, res = self._solve(H)
        dR = np.asarray(res.T_cw.R) @ np.asarray(T_gt.R).T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 0.3, f"rot err {ang}"
        assert np.linalg.norm(np.asarray(res.T_cw.t) - np.asarray(T_gt.t)) < 0.05
        assert np.linalg.norm(np.asarray(res.v_w) - v_end) < 0.1

    def test_marginal_information_is_psd_and_informative(self):
        H = np.diag(np.concatenate([np.full(6, 1e6), np.full(9, 1e4)]))
        _, _, res = self._solve(H)
        Hm = np.asarray(res.H_marg)
        evals = np.linalg.eigvalsh(0.5 * (Hm + Hm.T))
        assert evals.min() > -1e-2 * max(evals.max(), 1.0)
        # pose block should carry substantial information from 300 points
        assert np.trace(Hm[:6, :6]) > 1e3

    def test_prior_reduces_drift_under_dropout(self):
        """With a near-total feature dropout, the frame carrying a strong
        marginalization prior + IMU must stay closer to truth than one with
        a weak prior (the information-forgetting failure mode the reference
        avoids via EdgePriorPoseImu)."""
        strong = np.diag(np.concatenate([np.full(6, 1e6), np.full(9, 1e4)]))
        weak = np.eye(15) * 1e-4
        errs = {}
        for name, H in (("strong", strong), ("weak", weak)):
            T_gt, _, res = self._solve(H, few=4, seed=3)
            errs[name] = float(
                np.linalg.norm(np.asarray(res.T_cw.t) - np.asarray(T_gt.t))
            )
        assert errs["strong"] <= errs["weak"] + 1e-6, errs
        assert errs["strong"] < 0.2, errs
