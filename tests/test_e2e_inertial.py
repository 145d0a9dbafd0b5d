"""End-to-end monocular-inertial: staged IMU init recovers metric scale."""
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam3_modified_tpu.cameras import Camera
from orb_slam3_modified_tpu.eval.ate import ate_rmse
from orb_slam3_modified_tpu.imu.preintegration import GRAVITY
from orb_slam3_modified_tpu.lie import so3
from orb_slam3_modified_tpu.lie.se3 import SE3
from orb_slam3_modified_tpu.mapping.local_mapper import LocalMapper, LocalMapperConfig
from orb_slam3_modified_tpu.slam_map.map_state import MapState
from orb_slam3_modified_tpu.tracking.imu_frontend import ImuConfig, ImuFrontend
from orb_slam3_modified_tpu.tracking.tracker import OK, Tracker, TrackerConfig
from orb_slam3_modified_tpu.utils.synthetic_features import SyntheticFeatureWorld

CAM = Camera.pinhole(458.654, 457.296, 367.215, 248.375, width=752, height=480)


def circle_cam_state(t, radius=1.5, omega=0.8):
    """Camera on a horizontal circle, optical axis up (+z world): sees the
    'ceiling' features; body frame == camera frame (identity extrinsics)."""
    c, s = np.cos(omega * t), np.sin(omega * t)
    p = radius * np.array([c, s, 0.0])
    v = radius * omega * np.array([-s, c, 0.0])
    a = -radius * omega**2 * np.array([c, s, 0.0])
    R_wb = np.asarray(so3.exp(jnp.asarray([0.0, 0.0, omega * t])))
    return R_wb, p, v, a


@pytest.fixture(scope="module")
def vi_run():
    fps, freq = 20.0, 200.0
    n_frames = 140
    g = np.array([0.0, 0.0, -GRAVITY])
    rng = np.random.default_rng(5)
    # ceiling features 2-6 m above
    world = SyntheticFeatureWorld(n_points=5000, feat_cap=768, noise_px=0.4, seed=5)
    pts = rng.uniform(-4, 4, (5000, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(2.0, 6.0, 5000)
    world.points = pts

    m = MapState.create(max_kf=256, max_mp=32768, feat_cap=768)
    tcfg = TrackerConfig(cam=CAM)
    tracker = Tracker(tcfg, m)
    mapper = LocalMapper(LocalMapperConfig(), tcfg, m)
    tracker.on_keyframe = mapper.on_keyframe
    imu = ImuFrontend(ImuConfig(init_time=2.0))
    tracker.imu = imu
    mapper.imu = imu  # enables LocalInertialBA-style window refinement

    est, gt, times = [], [], []
    dt_imu = 1.0 / freq
    for i in range(n_frames):
        t = i / fps
        R_wb, p, v, a = circle_cam_state(t)
        # camera pose: world->cam, camera = body
        R_cw = R_wb.T
        t_cw = -R_cw @ p
        T_cw = SE3(jnp.asarray(R_cw.astype(np.float32)), jnp.asarray(t_cw.astype(np.float32)))
        feats, _ = world.observe(CAM, T_cw, max_feats=600)
        # IMU samples since the previous frame
        accs, gyrs, dts = [], [], []
        if i > 0:
            n_s = int(freq / fps)
            for j in range(n_s):
                tj = (i - 1) / fps + j * dt_imu
                R_j, _, _, a_j = circle_cam_state(tj)
                accs.append(R_j.T @ (a_j - g))
                gyrs.append(np.array([0.0, 0.0, 0.8]))
                dts.append(dt_imu)
        T = tracker.track(
            feats, ts=t,
            imu_samples=(
                np.array(accs, np.float32).reshape(-1, 3),
                np.array(gyrs, np.float32).reshape(-1, 3),
                np.array(dts, np.float32),
            ),
        )
        if T is not None:
            est.append(np.asarray(T))
            gt.append(p.copy())
    return tracker, imu, m, est, np.array(gt)


class TestMonoInertial:
    def test_tracks(self, vi_run):
        tracker, imu, m, est, gt = vi_run
        assert len(est) >= 120, f"tracked {len(est)}"

    def test_imu_initialized(self, vi_run):
        tracker, imu, m, est, gt = vi_run
        assert imu.initialized
        assert m.imu_initialized

    def test_metric_scale_recovered(self, vi_run):
        tracker, imu, m, est, gt = vi_run
        pos = np.array([np.linalg.inv(T)[:3, 3] for T in est])
        # only frames after IMU init are metric; use the last 60
        rmse, s = ate_rmse(pos[-60:], gt[-60:], with_scale=True)
        assert abs(s - 1.0) < 0.1, f"metric scale off: alignment scale {s}"
        assert rmse < 0.05, f"ATE {rmse}"

    def test_gravity_aligned(self, vi_run):
        """After init the map's z should align with gravity: the circular
        trajectory lies in a constant-z plane."""
        tracker, imu, m, est, gt = vi_run
        pos = np.array([np.linalg.inv(T)[:3, 3] for T in est])
        z_spread = pos[-60:, 2].std()
        r_spread = np.linalg.norm(pos[-60:, :2] - pos[-60:, :2].mean(0), axis=1).std()
        assert z_spread < 0.1, f"z spread {z_spread} (gravity misaligned?)"
