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


class TestLocalizationVO:
    def test_vo_bridges_low_overlap_and_relatches(self):
        """mbVO parity (reference: src/Tracking.cc:2050-2160): in
        localization-only mode, a stretch with no map coverage must switch
        to frame-to-frame visual odometry on temporal depth points (not go
        LOST), keep attempting relocalization, and re-latch onto the map
        when coverage returns."""
        from orb_slam3_modified_tpu.bow.vocabulary import build_vocabulary
        from orb_slam3_modified_tpu.utils.synthetic import orbit_trajectory

        world = SyntheticFeatureWorld(
            n_points=12000, spread=10.0, seed=21, feat_cap=768,
            noise_px=0.4, layout="ring",
        )
        voc = build_vocabulary(world.desc[:4000], k=8, depth=3, seed=1)
        slam = SlamSystem(
            SystemConfig(cam=CAM, feat_cap=768, vocabulary=voc)
        )
        n = 110
        T_all = orbit_trajectory(n, radius=4.0, sweep=2.2 * np.pi)

        def track(i):
            T_cw = SE3(T_all.R[i], T_all.t[i])
            feats, ids = world.observe(CAM, T_cw, max_feats=600)
            import jax.numpy as jnp

            pc = np.asarray(T_cw.apply(jnp.asarray(world.points[ids])))
            depth = np.full(feats.capacity, -1.0, np.float32)
            depth[: len(ids)] = pc[:, 2]
            return slam.track_features(feats, ts=i * 0.05, depth=depth), T_cw

        def center(T):
            return -np.asarray(T)[:3, :3].T @ np.asarray(T)[:3, 3]

        # phase 1: SLAM over the first quarter of the ring. The map frame is
        # anchored at frame 0 (not the GT world frame) — collect matched
        # centers so the gauge offset can be solved out with Horn alignment.
        c_est_map, c_gt_map = [], []
        for i in range(25):
            T, T_cw = track(i)
            if T is not None:
                c_est_map.append(center(T))
                c_gt_map.append(np.asarray(T_cw.inverse().t))
        assert slam.map.n_keyframes() > 3
        slam.activate_localization_mode()
        # phase 2: localization-only around the stretch of the ring wall the
        # map never saw, then back into coverage
        vo_seen = False
        n_published = 0
        final = []  # (c_est, c_gt) of the last frames, post re-latch
        from orb_slam3_modified_tpu.tracking.tracker import LOST

        for i in range(25, n):
            T, T_cw = track(i)
            assert slam.tracker.state != LOST, f"went LOST at frame {i}"
            vo_seen = vo_seen or slam.tracker.vo_mode
            n_published += T is not None
            if T is not None and i >= n - 3:
                final.append((center(T), np.asarray(T_cw.inverse().t)))
        assert vo_seen, "VO mode must engage on the unmapped stretch"
        assert n_published >= 0.9 * (n - 25), "VO must keep the pose alive"
        assert not slam.tracker.vo_mode, "must re-latch onto the map"
        assert len(final) >= 2
        from orb_slam3_modified_tpu.eval.ate import align_horn

        R_a, t_a, _, _ = align_horn(
            np.array(c_est_map).T, np.array(c_gt_map).T, with_scale=False
        )
        errs = [
            np.linalg.norm((R_a @ ce + t_a[:, 0]) - cg) for ce, cg in final
        ]
        assert max(errs) < 0.3, (
            f"re-latched pose error {errs} (map-frame alignment applied)"
        )
        assert slam.map.n_keyframes() <= 25, "map stayed frozen"


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
