"""Stereo matching op + stereo/RGB-D tracking tests."""
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam3_modified_tpu.cameras import Camera
from orb_slam3_modified_tpu.eval.ate import ate_rmse
from orb_slam3_modified_tpu.lie.se3 import SE3
from orb_slam3_modified_tpu.mapping.local_mapper import LocalMapper, LocalMapperConfig
from orb_slam3_modified_tpu.ops.stereo_match import depth_from_depthmap, match_stereo
from orb_slam3_modified_tpu.slam_map.map_state import MapState
from orb_slam3_modified_tpu.tracking.tracker import OK, Tracker, TrackerConfig
from orb_slam3_modified_tpu.utils.synthetic import orbit_trajectory
from orb_slam3_modified_tpu.utils.synthetic_features import SyntheticFeatureWorld

CAM = Camera.pinhole(458.654, 457.296, 367.215, 248.375, width=752, height=480)
BF = 458.654 * 0.11  # EuRoC-ish baseline*fx


class TestStereoMatch:
    def test_rectified_pairs(self):
        rng = np.random.default_rng(0)
        n = 100
        uv_l = rng.uniform(100, 600, (n, 2)).astype(np.float32)
        depth = rng.uniform(1.0, 20.0, n).astype(np.float32)
        disp = BF / depth
        uv_r = uv_l.copy()
        uv_r[:, 0] -= disp
        desc = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
        lvl = np.zeros(n, np.int32)
        v = np.ones(n, bool)
        u_r, d_est, ok = match_stereo(
            jnp.asarray(uv_l), jnp.asarray(desc), jnp.asarray(lvl), jnp.asarray(v),
            jnp.asarray(uv_r), jnp.asarray(desc), jnp.asarray(lvl), jnp.asarray(v),
            bf=BF, min_z=0.3,
        )
        ok_np = np.asarray(ok)
        assert ok_np.mean() > 0.9
        err = np.abs(np.asarray(d_est)[ok_np] - depth[ok_np]) / depth[ok_np]
        assert np.median(err) < 0.01

    def test_depth_map_sampling(self):
        dm = jnp.asarray(np.full((480, 752), 3.0, np.float32))
        uv = jnp.asarray(np.array([[100.5, 200.2], [10, 10]], np.float32))
        d = depth_from_depthmap(uv, dm)
        np.testing.assert_allclose(np.asarray(d), [3.0, 3.0])


@pytest.fixture(scope="module")
def stereo_seq():
    """Track an orbit with per-feature metric depth (ideal stereo)."""
    n_frames = 30
    world = SyntheticFeatureWorld(
        n_points=4000, spread=5.0, seed=3, feat_cap=768, noise_px=0.4
    )
    T_all = orbit_trajectory(n_frames, radius=4.0, sweep=np.pi / 4)
    slam_map = MapState.create(max_kf=128, max_mp=32768, feat_cap=768)
    tcfg = TrackerConfig(cam=CAM)
    tracker = Tracker(tcfg, slam_map)
    mapper = LocalMapper(LocalMapperConfig(), tcfg, slam_map)
    tracker.on_keyframe = mapper.on_keyframe
    est, gt = [], []
    for i in range(n_frames):
        T_cw = SE3(T_all.R[i], T_all.t[i])
        feats, ids = world.observe(CAM, T_cw, max_feats=600)
        # ideal per-feature depth from ground truth geometry
        n = len(ids)
        pc = np.asarray(T_cw.apply(jnp.asarray(world.points[ids])))
        depth = np.full(feats.capacity, -1.0, np.float32)
        depth[:n] = pc[:, 2]
        T = tracker.track(feats, ts=i * 0.05, depth=depth)
        if T is not None:
            est.append(np.asarray(T))
            gt.append(np.asarray(T_cw.inverse().t))
    return tracker, slam_map, est, np.array(gt)


class TestStereoTracking:
    def test_initializes_first_frame(self, stereo_seq):
        tracker, m, est, gt = stereo_seq
        assert len(est) >= 29  # no 2-frame init delay in stereo

    def test_metric_scale(self, stereo_seq):
        """Stereo fixes scale: ATE WITHOUT scale alignment must be small."""
        tracker, m, est, gt = stereo_seq
        pos = np.array([np.linalg.inv(T)[:3, 3] for T in est])
        rmse, s = ate_rmse(pos, gt, with_scale=True)
        assert rmse < 0.02, f"ATE {rmse}"
        assert abs(s - 1.0) < 0.02, f"scale {s} should be ~1 (metric)"

    def test_state_ok(self, stereo_seq):
        tracker, m, est, gt = stereo_seq
        assert tracker.state == OK


class TestSubpixelRefinement:
    def test_sad_parabola(self):
        import jax
        from orb_slam3_modified_tpu.ops.stereo_match import refine_disparity_sad

        rng = np.random.default_rng(0)
        base = rng.uniform(0, 255, (60, 90)).astype(np.float32)
        img_l = np.asarray(jax.image.resize(jnp.asarray(base), (480, 720), "cubic"))
        true_disp = 13.0
        # right image = left shifted by true_disp (pure horizontal shift)
        img_r = np.roll(img_l, -int(true_disp), axis=1)
        n = 50
        uv_l = np.stack(
            [rng.uniform(60, 650, n), rng.uniform(60, 420, n)], axis=1
        ).astype(np.float32)
        u_r_coarse = uv_l[:, 0] - true_disp + rng.integers(-2, 3, n)
        u_ref = refine_disparity_sad(
            jnp.asarray(img_l), jnp.asarray(img_r),
            jnp.asarray(uv_l), jnp.asarray(u_r_coarse.astype(np.float32)),
            jnp.ones(n, bool),
        )
        err = np.abs(np.asarray(u_ref) - (uv_l[:, 0] - true_disp))
        assert np.median(err) < 0.6, f"median refine err {np.median(err)}px"
