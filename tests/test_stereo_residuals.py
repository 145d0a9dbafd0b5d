"""Stereo (u, v, uR) residual rows in pose optimization and BA, and the
non-rectified (fisheye) stereo matcher.

Reference parity targets: EdgeStereoOnlyPose / EdgeStereo
(include/G2oTypes.h:414-466) with the 7.815 chi2 gate, and
Frame::ComputeStereoFishEyeMatches (src/Frame.cc:1126).
"""
import jax.numpy as jnp
import numpy as np

from orb_slam3_modified_tpu.cameras import Camera, project
from orb_slam3_modified_tpu.lie import se3
from orb_slam3_modified_tpu.lie.se3 import SE3
from orb_slam3_modified_tpu.optim.ba import BAProblem, bundle_adjust
from orb_slam3_modified_tpu.optim.pose_opt import pose_optimization

CAM = Camera.pinhole(458.654, 457.296, 367.215, 248.375, width=752, height=480)
BF = 458.654 * 0.11


def _make_pose_case(seed=0, n=200, noise=0.3):
    rng = np.random.default_rng(seed)
    pts = rng.uniform([-3, -3, 4], [3, 3, 12], (n, 3)).astype(np.float32)
    xi = np.array([0.02, -0.03, 0.01, 0.01, -0.02, 0.015], np.float32)
    T_gt = se3.exp(jnp.asarray(xi))
    pc = np.asarray(T_gt.apply(jnp.asarray(pts)))
    uv = np.array(project(CAM, jnp.asarray(pc)))
    uv += rng.normal(0, noise, uv.shape)
    ur = uv[:, 0] - BF / pc[:, 2] + rng.normal(0, noise, n)
    return T_gt, pts, uv.astype(np.float32), ur.astype(np.float32)


class TestStereoPoseOpt:
    def test_stereo_rows_converge(self):
        T_gt, pts, uv, ur = _make_pose_case()
        T0 = se3.exp(jnp.asarray([0.03, -0.02, 0.04, 0.02, 0.01, -0.03])) @ T_gt
        res = pose_optimization(
            T0, CAM, jnp.asarray(pts), jnp.asarray(uv),
            jnp.ones(len(pts)),
            ur_obs=jnp.asarray(ur), bf=jnp.asarray(BF, jnp.float32),
        )
        t_err = np.linalg.norm(np.asarray(res.T_cw.t) - np.asarray(T_gt.t))
        assert t_err < 0.01, t_err
        assert int(res.n_inliers) > 180

    def test_disparity_outliers_gated_at_chi2_stereo(self):
        """Observations whose uv agrees but whose disparity is wrong must be
        rejected by the 3-dof 7.815 gate — the failure mode mono rows cannot
        see (reference: e2 Stereo>7.815 outlier loop, src/Optimizer.cc:1003
        region)."""
        T_gt, pts, uv, ur = _make_pose_case(seed=1, noise=0.2)
        bad = np.zeros(len(pts), bool)
        bad[::5] = True  # 20% wrong depth: shift disparity by 15 px
        ur_bad = ur.copy()
        ur_bad[bad] -= 15.0
        res = pose_optimization(
            T_gt, CAM, jnp.asarray(pts), jnp.asarray(uv), jnp.ones(len(pts)),
            ur_obs=jnp.asarray(ur_bad), bf=jnp.asarray(BF, jnp.float32),
        )
        inl = np.asarray(res.inliers)
        assert inl[bad].mean() < 0.05, "wrong-disparity obs survived the gate"
        assert inl[~bad].mean() > 0.9
        # mono rows are blind to the same corruption
        res_m = pose_optimization(
            T_gt, CAM, jnp.asarray(pts), jnp.asarray(uv), jnp.ones(len(pts)),
        )
        assert np.asarray(res_m.inliers)[bad].mean() > 0.9

    def test_mixed_mono_stereo_rows(self):
        """ur < 0 rows must behave as mono (masked third row)."""
        T_gt, pts, uv, ur = _make_pose_case(seed=2)
        ur_mixed = ur.copy()
        ur_mixed[::2] = -1.0  # half mono
        T0 = se3.exp(jnp.asarray([0.02, 0.01, -0.02, 0.01, -0.01, 0.02])) @ T_gt
        res = pose_optimization(
            T0, CAM, jnp.asarray(pts), jnp.asarray(uv), jnp.ones(len(pts)),
            ur_obs=jnp.asarray(ur_mixed), bf=jnp.asarray(BF, jnp.float32),
        )
        t_err = np.linalg.norm(np.asarray(res.T_cw.t) - np.asarray(T_gt.t))
        assert t_err < 0.02
        assert int(res.n_inliers) > 180


class TestStereoBA:
    def test_stereo_ba_fixes_scale(self):
        """With stereo rows, BA is scale-observable: a globally scaled-up
        initialization must come back to metric scale (mono BA would keep
        the gauge freedom and leave the scale drifted)."""
        rng = np.random.default_rng(3)
        n_pts, n_cams = 300, 4
        pts = rng.uniform([-4, -4, 5], [4, 4, 15], (n_pts, 3)).astype(np.float32)
        R = np.tile(np.eye(3, dtype=np.float32), (n_cams, 1, 1))
        t = np.zeros((n_cams, 3), np.float32)
        t[:, 0] = -np.arange(n_cams) * 0.4  # camera moves +x in world
        obs_cam, obs_pt, obs_uv, obs_ur = [], [], [], []
        for k in range(n_cams):
            pc = pts @ R[k].T + t[k]
            uv = np.asarray(project(CAM, jnp.asarray(pc)))
            ok = (
                (pc[:, 2] > 0.5)
                & (uv[:, 0] > 0) & (uv[:, 0] < 752)
                & (uv[:, 1] > 0) & (uv[:, 1] < 480)
            )
            idx = np.flatnonzero(ok)
            obs_cam.append(np.full(len(idx), k, np.int32))
            obs_pt.append(idx.astype(np.int32))
            obs_uv.append(uv[idx] + rng.normal(0, 0.3, (len(idx), 2)))
            obs_ur.append(uv[idx, 0] - BF / pc[idx, 2] + rng.normal(0, 0.3, len(idx)))
        s = 1.25  # corrupt the scale of everything but camera 0 (fixed)
        t_bad = t * s
        pts_bad = pts * s
        prob = BAProblem(
            T_cw=SE3(jnp.asarray(R), jnp.asarray(t_bad)),
            cam_fixed=jnp.asarray(np.array([True] + [False] * (n_cams - 1))),
            points=jnp.asarray(pts_bad),
            pt_valid=jnp.ones(n_pts, bool),
            obs_cam=jnp.asarray(np.concatenate(obs_cam)),
            obs_pt=jnp.asarray(np.concatenate(obs_pt)),
            obs_uv=jnp.asarray(np.concatenate(obs_uv).astype(np.float32)),
            obs_inv_s2=jnp.ones(sum(len(o) for o in obs_cam)),
            obs_valid=jnp.ones(sum(len(o) for o in obs_cam), bool),
            obs_ur=jnp.asarray(np.concatenate(obs_ur).astype(np.float32)),
            bf=jnp.asarray(BF, jnp.float32),
        )
        res = bundle_adjust(prob, CAM, 3, 8)
        # recovered inter-camera baseline should match the metric one
        t_out = np.asarray(res.T_cw.t)
        base_est = np.linalg.norm(t_out[1] - t_out[0])
        base_gt = np.linalg.norm(t[1] - t[0])
        assert abs(base_est - base_gt) / base_gt < 0.05, (base_est, base_gt)
        assert np.asarray(res.obs_inlier).mean() > 0.8

    def test_mono_problem_unchanged(self):
        """obs_ur=None keeps the pure-mono 2-row path bit-compatible."""
        rng = np.random.default_rng(4)
        pts = rng.uniform([-3, -3, 4], [3, 3, 10], (100, 3)).astype(np.float32)
        R = np.tile(np.eye(3, dtype=np.float32), (2, 1, 1))
        t = np.array([[0, 0, 0], [-0.5, 0, 0]], np.float32)
        obs_cam = np.repeat(np.arange(2, dtype=np.int32), 100)
        obs_pt = np.tile(np.arange(100, dtype=np.int32), 2)
        uv = []
        for k in range(2):
            pc = pts @ R[k].T + t[k]
            uv.append(np.asarray(project(CAM, jnp.asarray(pc))))
        prob = BAProblem(
            T_cw=SE3(jnp.asarray(R), jnp.asarray(t)),
            cam_fixed=jnp.asarray([True, False]),
            points=jnp.asarray(pts + rng.normal(0, 0.05, pts.shape).astype(np.float32)),
            pt_valid=jnp.ones(100, bool),
            obs_cam=jnp.asarray(obs_cam),
            obs_pt=jnp.asarray(obs_pt),
            obs_uv=jnp.asarray(np.concatenate(uv).astype(np.float32)),
            obs_inv_s2=jnp.ones(200),
            obs_valid=jnp.ones(200, bool),
        )
        res = bundle_adjust(prob, CAM, 2, 5)
        err = np.abs(np.asarray(res.points) - pts).max()
        assert err < 0.02, err


class TestFisheyeStereoMatch:
    def test_kb8_pair_depth(self):
        from orb_slam3_modified_tpu.ops.stereo_match import match_stereo_general

        cam_l = Camera.kb8(
            190.978, 190.973, 254.931, 256.897,
            0.00348, 0.000715, -0.00205, 0.000202, width=512, height=512,
        )
        cam_r = cam_l
        rng = np.random.default_rng(5)
        n = 150
        # depth <= 4.5 m: with the 10 cm baseline, farther points fall under
        # the reference's 0.9998 min-parallax gate (as they should)
        pts_l = rng.uniform([-2, -2, 1.5], [2, 2, 4.5], (n, 3)).astype(np.float32)
        R_rl = np.eye(3, dtype=np.float32)
        t_rl = np.array([-0.101, 0.0, 0.0], np.float32)  # baseline 10.1 cm
        pts_r = pts_l @ R_rl.T + t_rl
        uv_l = np.asarray(project(cam_l, jnp.asarray(pts_l)))
        uv_r = np.asarray(project(cam_r, jnp.asarray(pts_r)))
        in_l = ((uv_l > 5) & (uv_l < 507)).all(axis=1)
        in_r = ((uv_r > 5) & (uv_r < 507)).all(axis=1)
        ok_gt = in_l & in_r
        desc = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
        lvl = np.zeros(n, np.int32)
        depth, ok = match_stereo_general(
            jnp.asarray(uv_l.astype(np.float32)), jnp.asarray(desc),
            jnp.asarray(lvl), jnp.asarray(ok_gt),
            jnp.asarray(uv_r.astype(np.float32)), jnp.asarray(desc),
            jnp.asarray(lvl), jnp.asarray(ok_gt),
            cam_l, cam_r, jnp.asarray(R_rl), jnp.asarray(t_rl),
        )
        ok_np = np.asarray(ok)
        assert ok_np[ok_gt].mean() > 0.8
        rel = np.abs(np.asarray(depth)[ok_np] - pts_l[ok_np, 2]) / pts_l[ok_np, 2]
        assert np.median(rel) < 0.02, np.median(rel)


class TestStereoFacade:
    def test_track_stereo_metric_scale(self):
        """Feature-level stereo through the facade: translation comes out in
        METRIC units (the whole point of stereo — no mono scale gauge)."""
        from orb_slam3_modified_tpu.system.slam_system import (
            STEREO,
            SlamSystem,
            SystemConfig,
        )
        from orb_slam3_modified_tpu.utils.synthetic import orbit_trajectory
        from orb_slam3_modified_tpu.utils.synthetic_features import (
            SyntheticFeatureWorld,
        )

        n_frames = 25
        world = SyntheticFeatureWorld(
            n_points=3000, spread=5.0, seed=7, feat_cap=512, noise_px=0.3
        )
        T_all = orbit_trajectory(n_frames, radius=4.0, sweep=np.pi / 6)
        slam = SlamSystem(
            SystemConfig(
                cam=CAM, sensor=STEREO, feat_cap=512, bf=BF,
                use_loop_closing=False,
            )
        )
        Ts = []
        for i in range(n_frames):
            T_i = SE3(T_all.R[i], T_all.t[i])
            feats, idx = world.observe(CAM, T_i)
            # ideal per-feature stereo depth from the ground-truth points
            pc = world.points[idx] @ np.asarray(T_i.R).T + np.asarray(T_i.t)
            d = np.full(feats.capacity, -1.0, np.float32)
            d[: len(idx)] = pc[:, 2]
            uv = np.asarray(feats.uv)
            ur = np.where(d > 0, uv[:, 0] - BF / np.maximum(d, 1e-6), -1.0)
            T = slam.track_features(
                feats, ts=i / 20.0, depth=d, ur=ur.astype(np.float32)
            )
            Ts.append(T)
        assert Ts[-1] is not None

        # camera centers: c = -R^T t
        def center(R, t):
            return -np.asarray(R).T @ np.asarray(t)

        # metric translation magnitude of the estimated trajectory matches GT
        gt_span = np.linalg.norm(
            center(T_all.R[n_frames - 1], T_all.t[n_frames - 1])
            - center(T_all.R[0], T_all.t[0])
        )
        est_span = np.linalg.norm(
            center(Ts[-1][:3, :3], Ts[-1][:3, 3])
            - center(Ts[0][:3, :3], Ts[0][:3, 3])
        )
        assert abs(est_span - gt_span) / gt_span < 0.05, (est_span, gt_span)
