"""ROS node core (ros/nodes.py LiveFeed) without a ROS install.

The reference's ROS examples are thin shells over the System API plus
message plumbing (reference: Examples_old/ROS/ORB_SLAM3/src/ros_mono.cc,
ros_mono_inertial.cc SyncWithImu); LiveFeed is that plumbing, tested here
by injecting numpy 'messages' directly.
"""
import numpy as np
import pytest

from orb_slam3_modified_tpu.cameras import Camera
from orb_slam3_modified_tpu.ros.nodes import LiveFeed, _to_gray_u8
from orb_slam3_modified_tpu.system.slam_system import (
    IMU_MONOCULAR,
    SlamSystem,
    SystemConfig,
)

CAM = Camera.pinhole(330.0, 330.0, 256.0, 192.0, width=512, height=384)


class TestMessageConversion:
    def test_gray_and_color_accepted(self):
        g = _to_gray_u8(np.full((4, 6), 300.0))
        assert g.dtype == np.uint8 and g.max() == 255
        c = _to_gray_u8(np.zeros((4, 6, 3)))
        assert c.shape == (4, 6)


class TestImuAssociation:
    def _feed(self, sensor="mono-imu"):
        slam = SlamSystem(
            SystemConfig(cam=CAM, sensor=IMU_MONOCULAR, feat_cap=256,
                         use_loop_closing=False)
        )
        return LiveFeed(slam, sensor)

    def test_imu_drained_per_frame_with_contiguous_dts(self):
        """SyncWithImu parity: every sample up to the frame timestamp is
        handed to the frame, dts chain across frames without gaps."""
        feed = self._feed()
        for j in range(10):
            feed.on_imu(j * 0.005, (0, 0, 9.81), (0, 0, 0))
        got = feed._imu_since(0.03)
        assert got is not None
        acc, gyro, dts = got
        assert len(dts) == 7  # samples at 0.000..0.030
        # remaining samples stay for the next frame
        got2 = feed._imu_since(0.05)
        acc2, gyro2, dts2 = got2
        assert len(dts2) == 3
        # contiguous: first dt of the second batch spans from the last
        # consumed sample (0.030 -> 0.035)
        np.testing.assert_allclose(dts2[0], 0.005, atol=1e-9)

    def test_stereo_pairing_window(self):
        slam = SlamSystem(
            SystemConfig(cam=CAM, feat_cap=256, use_loop_closing=False,
                         bf=0.11 * CAM.fx)
        )
        feed = LiveFeed(slam, "stereo")
        img = np.zeros((384, 512), np.uint8)
        # no right frame yet -> frame skipped, not crashed
        assert feed.on_image(0.0, img) is False
        feed.on_right(0.101, img)
        # 1 ms apart -> paired
        assert feed._nearest(feed._right_buf, 0.1) is not None
        # 50 ms apart -> rejected
        assert feed._nearest(feed._right_buf, 0.2) is None


class TestEndToEndFeed:
    def test_mono_feed_tracks_synthetic_stream(self, tmp_path):
        """Full LiveFeed -> SlamSystem path on a rendered stream (the
        ros_mono.cc loop without ROS transport)."""
        from orb_slam3_modified_tpu.utils.synthetic import orbit_trajectory
        from orb_slam3_modified_tpu.utils.synthetic_dataset import (
            camera_rays,
            render_textured_scene,
        )

        rng = np.random.default_rng(0)
        tex = rng.uniform(0, 255, (256, 256)).astype(np.float32)
        tex = np.kron(tex, np.ones((4, 4), np.float32))  # 1024x1024
        T_all = orbit_trajectory(40, radius=4.0, sweep=np.pi / 6)
        rays = camera_rays(CAM)
        slam = SlamSystem(
            SystemConfig(cam=CAM, feat_cap=512, use_loop_closing=False)
        )
        feed = LiveFeed(slam, "mono")
        for i in range(40):
            T = np.eye(4)
            T[:3, :3] = np.asarray(T_all.R[i])
            T[:3, 3] = np.asarray(T_all.t[i])
            img = render_textured_scene(
                T, CAM, tex, plane_z=2.0, plane_half=10.0, rays_c=rays
            )
            feed.on_image(i / 20.0, img)
        assert feed.n_frames == 40
        assert slam.map.n_keyframes() >= 2, "stream did not map"
        import os

        pref = str(tmp_path / "live")
        feed.finish(out_prefix=pref)
        assert os.path.getsize(pref + "_trajectory.txt") > 100
