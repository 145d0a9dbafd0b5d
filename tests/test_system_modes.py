"""System facade modes: localization-only, reset protocol, trajectory
formats (reference: include/System.h:107-200 —
ActivateLocalizationMode :156, Reset/ResetActiveMap :543 region,
SaveTrajectoryEuRoC/KITTI src/System.cc:609-700)."""
import numpy as np
import pytest

from orb_slam3_modified_tpu.cameras import Camera
from orb_slam3_modified_tpu.lie.se3 import SE3
from orb_slam3_modified_tpu.system.slam_system import SlamSystem, SystemConfig
from orb_slam3_modified_tpu.utils.synthetic import orbit_trajectory
from orb_slam3_modified_tpu.utils.synthetic_features import SyntheticFeatureWorld

CAM = Camera.pinhole(458.654, 457.296, 367.215, 248.375, width=752, height=480)


@pytest.fixture(scope="module")
def tracked_system():
    world = SyntheticFeatureWorld(
        n_points=3000, spread=5.0, seed=11, feat_cap=512, noise_px=0.3
    )
    n = 30
    T_all = orbit_trajectory(n, radius=4.0, sweep=np.pi / 5)
    slam = SlamSystem(
        SystemConfig(cam=CAM, feat_cap=512, use_loop_closing=False)
    )
    for i in range(n):
        feats, _ = world.observe(CAM, SE3(T_all.R[i], T_all.t[i]))
        slam.track_features(feats, ts=i / 20.0)
    return slam, world, T_all


class TestLocalizationMode:
    def test_map_frozen_but_tracking_continues(self, tracked_system):
        slam, world, T_all = tracked_system
        n_kf = slam.map.n_keyframes()
        n_mp = slam.map.n_points()
        assert n_kf > 3
        slam.activate_localization_mode()
        T_more = orbit_trajectory(60, radius=4.0, sweep=np.pi / 4)
        ok = 0
        for i in range(30, 55):
            feats, _ = world.observe(CAM, SE3(T_more.R[i], T_more.t[i]))
            T = slam.track_features(feats, ts=i / 20.0)
            ok += T is not None
        assert ok >= 20, "tracking must keep working on the frozen map"
        assert slam.map.n_keyframes() == n_kf, "no keyframes in loc-only mode"
        assert slam.map.n_points() == n_mp, "no new points in loc-only mode"
        slam.deactivate_localization_mode()
        assert slam.tracker.only_tracking is False


class TestResetProtocol:
    def test_reset_active_map(self):
        world = SyntheticFeatureWorld(
            n_points=2500, spread=5.0, seed=12, feat_cap=512, noise_px=0.3
        )
        T_all = orbit_trajectory(40, radius=4.0, sweep=np.pi / 5)
        slam = SlamSystem(
            SystemConfig(cam=CAM, feat_cap=512, use_loop_closing=False)
        )
        for i in range(20):
            feats, _ = world.observe(CAM, SE3(T_all.R[i], T_all.t[i]))
            slam.track_features(feats, ts=i / 20.0)
        assert slam.map.n_keyframes() > 0
        slam.reset_active_map()
        assert slam.map.n_keyframes() == 0
        assert slam.map.n_points() == 0
        # system must be able to re-initialize afterwards
        for i in range(20, 40):
            feats, _ = world.observe(CAM, SE3(T_all.R[i], T_all.t[i]))
            T = slam.track_features(feats, ts=i / 20.0)
        assert T is not None
        assert slam.map.n_keyframes() > 0

    def test_full_reset_clears_all_maps(self):
        world = SyntheticFeatureWorld(
            n_points=2500, spread=5.0, seed=13, feat_cap=512, noise_px=0.3
        )
        T_all = orbit_trajectory(20, radius=4.0, sweep=np.pi / 6)
        slam = SlamSystem(
            SystemConfig(cam=CAM, feat_cap=512, use_loop_closing=False)
        )
        for i in range(20):
            feats, _ = world.observe(CAM, SE3(T_all.R[i], T_all.t[i]))
            slam.track_features(feats, ts=i / 20.0)
        slam.map.create_new_map()  # simulate a loss handoff
        slam.reset()
        assert slam.map.n_keyframes(all_maps=True) == 0
        assert slam.map.n_maps == 1
        assert slam.map.active_map == 0


class TestTrajectoryFormats:
    def test_euroc_and_kitti_savers(self, tracked_system, tmp_path):
        slam, _, _ = tracked_system
        p_euroc = tmp_path / "traj_euroc.txt"
        p_kitti = tmp_path / "traj_kitti.txt"
        slam.save_trajectory_euroc(str(p_euroc))
        slam.save_trajectory_kitti(str(p_kitti))
        le = p_euroc.read_text().strip().splitlines()
        lk = p_kitti.read_text().strip().splitlines()
        assert len(le) == len(lk) > 10
        # EuRoC: ns timestamp + 7 floats; quaternion normalized (w x y z)
        first = le[0].split()
        assert len(first) == 8
        int(first[0])  # nanosecond integer timestamp
        q = np.array([float(x) for x in first[4:8]])
        assert abs(np.linalg.norm(q) - 1) < 1e-5
        # KITTI: 12 floats, valid rotation block
        row = np.array([float(x) for x in lk[0].split()])
        assert row.shape == (12,)
        R = row.reshape(3, 4)[:, :3]
        assert np.allclose(R @ R.T, np.eye(3), atol=1e-4)


class TestBadImu:
    def test_insufficient_motion_resets_map(self):
        """Reference: mbBadImu (src/LocalMapping.cc:138-147) — a stationary
        rig after inertial init makes scale/gravity unobservable; the system
        must reset the active map."""
        from orb_slam3_modified_tpu.slam_map.map_state import MapState
        from orb_slam3_modified_tpu.tracking.imu_frontend import (
            ImuConfig,
            ImuFrontend,
        )

        m = MapState.create(max_kf=16, max_mp=256, feat_cap=64)
        imu = ImuFrontend(ImuConfig())
        imu.initialized = True
        imu.stage = 1  # post-init, pre-VIBA2
        from orb_slam3_modified_tpu.imu.preintegration import ImuBias, integrate
        import jax.numpy as jnp

        pre = integrate(
            jnp.zeros((4, 3)), jnp.zeros((4, 3)), jnp.full(4, 0.05),
            jnp.ones(4, bool), ImuBias.zero(),
        )
        # three keyframes at (almost) the same camera center
        for i in range(3):
            k = m.alloc_keyframe()
            m.kf_R[k] = np.eye(3)
            m.kf_t[k] = np.array([0.001 * i, 0, 0], np.float32)
            m.kf_ts[k] = 0.5 * i
            m.kf_frame_id[k] = i
            imu.preint_kf = pre
            imu.on_keyframe(k, 0.5 * i, m)
        assert imu.bad_imu, "stationary inertial rig must flag bad IMU"

    def test_moving_rig_not_flagged(self):
        from orb_slam3_modified_tpu.slam_map.map_state import MapState
        from orb_slam3_modified_tpu.tracking.imu_frontend import (
            ImuConfig,
            ImuFrontend,
        )
        from orb_slam3_modified_tpu.imu.preintegration import ImuBias, integrate
        import jax.numpy as jnp

        m = MapState.create(max_kf=16, max_mp=256, feat_cap=64)
        imu = ImuFrontend(ImuConfig())
        imu.initialized = True
        imu.stage = 1
        pre = integrate(
            jnp.zeros((4, 3)), jnp.zeros((4, 3)), jnp.full(4, 0.05),
            jnp.ones(4, bool), ImuBias.zero(),
        )
        for i in range(4):
            k = m.alloc_keyframe()
            m.kf_R[k] = np.eye(3)
            m.kf_t[k] = np.array([0.2 * i, 0, 0], np.float32)  # 20 cm/KF
            m.kf_ts[k] = 0.5 * i
            m.kf_frame_id[k] = i
            imu.preint_kf = pre
            imu.on_keyframe(k, 0.5 * i, m)
        assert not imu.bad_imu
        assert imu.t_motion > 0
