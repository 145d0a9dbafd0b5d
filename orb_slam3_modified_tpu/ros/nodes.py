"""Live ROS nodes: topic streams -> SlamSystem.

TPU-native replacement for the reference's ROS examples (reference:
Examples_old/ROS/ORB_SLAM3/src/ros_mono.cc, ros_mono_inertial.cc,
ros_stereo.cc, ros_stereo_inertial.cc, ros_rgbd.cc — each subscribes to
image/IMU topics, feeds System::Track*, and saves trajectories on
shutdown).

Split in two layers so the logic is testable without a ROS install:

- ``LiveFeed``: ROS-agnostic core. Owns the IMU sample queue and the
  frame->IMU association (the reference's GrabImuData queue + SyncWithImu
  loop, ros_mono_inertial.cc:90-150), stereo pair pairing by nearest
  timestamp, and the SlamSystem dispatch per sensor config. Tests drive it
  with numpy arrays directly.
- ``main``: binds LiveFeed to rclpy (ROS2) or rospy (ROS1) subscribers —
  whichever imports — and runs the spin loop. Without a ROS python
  environment it exits with an actionable message (this build image has no
  ROS; the node layer is import-gated exactly like the reference keeps ROS
  examples out of the default build, CMakeLists.txt builds them only under
  Examples_old/ROS).
"""
from __future__ import annotations

import argparse
import sys
from collections import deque

import numpy as np


def _to_gray_u8(img: np.ndarray) -> np.ndarray:
    """Accept mono8/rgb8/bgr8-style arrays (the cv_bridge conversions the
    reference does in GrabImage, ros_mono.cc:73)."""
    a = np.asarray(img)
    if a.ndim == 3:
        a = a.mean(axis=-1)
    return np.clip(a, 0, 255).astype(np.uint8)


class LiveFeed:
    """Sensor-message fan-in for one SLAM session."""

    def __init__(self, slam, sensor: str, chunked: bool = False,
                 chunk_size: int = 8, max_pair_dt: float = 0.01):
        self.slam = slam
        self.sensor = sensor
        self.max_pair_dt = max_pair_dt
        self.imu_buf: deque = deque(maxlen=4096)  # (ts, acc, gyro)
        self._right_buf: deque = deque(maxlen=8)  # (ts, img)
        self._depth_buf: deque = deque(maxlen=8)  # (ts, depth)
        self._prev_imu_ts = None
        self.n_frames = 0
        self.fe = None
        if chunked:
            self.fe = slam.make_chunked_frontend(
                chunk=chunk_size, lag=1,
                stereo="stereo" in sensor, rgbd="rgbd" in sensor,
            )

    # ----------------------------------------------------------- ingestion
    def on_imu(self, ts: float, acc, gyro):
        """IMU sample callback (reference: ImuGrabber::GrabImu,
        ros_mono_inertial.cc:60)."""
        self.imu_buf.append(
            (float(ts), np.asarray(acc, np.float32),
             np.asarray(gyro, np.float32))
        )

    def on_right(self, ts: float, img):
        self._right_buf.append((float(ts), _to_gray_u8(img)))

    def on_depth(self, ts: float, depth):
        self._depth_buf.append((float(ts), np.asarray(depth, np.float32)))

    def _imu_since(self, ts: float):
        """Drain samples up to ts into (acc, gyro, dts) like the reference's
        SyncWithImu loop (ros_mono_inertial.cc:107-140)."""
        rows = []
        while self.imu_buf and self.imu_buf[0][0] <= ts:
            rows.append(self.imu_buf.popleft())
        if not rows:
            return None
        tss = np.array([r[0] for r in rows])
        t0 = self._prev_imu_ts if self._prev_imu_ts is not None else tss[0]
        self._prev_imu_ts = tss[-1]
        dts = np.maximum(np.diff(np.concatenate([[t0], tss])), 0.0)
        return (
            np.stack([r[1] for r in rows]),
            np.stack([r[2] for r in rows]),
            dts.astype(np.float32),
        )

    def _nearest(self, buf: deque, ts: float):
        best = None
        for bts, payload in buf:
            if best is None or abs(bts - ts) < abs(best[0] - ts):
                best = (bts, payload)
        if best is not None and abs(best[0] - ts) <= self.max_pair_dt:
            return best[1]
        return None

    # ------------------------------------------------------------ dispatch
    def on_image(self, ts: float, img) -> bool:
        """Left/mono image callback; returns True if a frame was tracked."""
        import jax.numpy as jnp

        ts = float(ts)
        img = _to_gray_u8(img)
        samples = (
            self._imu_since(ts) if "imu" in self.sensor else None
        )
        if "stereo" in self.sensor:
            right = self._nearest(self._right_buf, ts)
            if right is None:
                return False  # no close-enough pair yet
            if self.fe is not None:
                self.fe.track_image(img, ts, img_right=right,
                                    imu_samples=samples)
            else:
                self.slam.track_stereo(
                    jnp.asarray(img), jnp.asarray(right), ts,
                    imu_samples=samples,
                )
        elif "rgbd" in self.sensor:
            depth = self._nearest(self._depth_buf, ts)
            if depth is None:
                return False
            if self.fe is not None:
                self.fe.track_image(img, ts, depth_img=depth,
                                    imu_samples=samples)
            else:
                self.slam.track_rgbd(
                    jnp.asarray(img), jnp.asarray(depth), ts,
                    imu_samples=samples,
                )
        elif "imu" in self.sensor:
            if self.fe is not None:
                self.fe.track_image(img, ts, imu_samples=samples)
            else:
                self.slam.track_monocular_inertial(
                    jnp.asarray(img), ts, samples
                )
        else:
            if self.fe is not None:
                self.fe.track_image(img, ts)
            else:
                self.slam.track_monocular(jnp.asarray(img), ts)
        self.n_frames += 1
        return True

    def finish(self, out_prefix: str = "live"):
        """Flush + save trajectories (the reference nodes save
        KeyFrameTrajectory.txt on shutdown, ros_mono.cc:66)."""
        if self.fe is not None:
            self.fe.flush()
        self.slam.shutdown()
        self.slam.save_trajectory_tum(f"{out_prefix}_trajectory.txt")
        self.slam.save_keyframe_trajectory_tum(f"{out_prefix}_keyframes.txt")


def _build_slam(args):
    from ..run import main as _  # noqa: F401  (shared config parsing below)
    from ..io.settings import load_settings
    from ..system.slam_system import (
        IMU_MONOCULAR, IMU_RGBD, IMU_STEREO, MONOCULAR, RGBD, STEREO,
        SlamSystem, SystemConfig,
    )

    st = load_settings(args.config)
    sensor = {
        "mono": MONOCULAR, "stereo": STEREO, "rgbd": RGBD,
        "mono-imu": IMU_MONOCULAR, "stereo-imu": IMU_STEREO,
        "rgbd-imu": IMU_RGBD,
    }[args.sensor]
    imu_cfg = None
    if "imu" in args.sensor and st.imu is not None:
        from ..tracking.imu_frontend import ImuConfig

        T_bc = np.asarray(st.imu.T_bc, np.float64)
        imu_cfg = ImuConfig(
            noise_gyro=st.imu.noise_gyro, noise_acc=st.imu.noise_acc,
            walk_gyro=st.imu.walk_gyro, walk_acc=st.imu.walk_acc,
            freq=st.imu.freq,
            R_bc=T_bc[:3, :3].astype(np.float32),
            t_bc=T_bc[:3, 3].astype(np.float32),
        )
    return SlamSystem(SystemConfig(
        cam=st.cam, sensor=sensor, extractor=st.extractor,
        feat_cap=st.extractor.n_features,
        bf=st.baseline if st.baseline else 0.0,
        imu=imu_cfg, dist=st.dist,
    ))


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Live ROS node (reference: ros_mono.cc family)"
    )
    p.add_argument("--sensor", default="mono",
                   choices=["mono", "stereo", "rgbd", "mono-imu",
                            "stereo-imu", "rgbd-imu"])
    p.add_argument("--config", required=True)
    p.add_argument("--image-topic", default="/camera/image_raw")
    p.add_argument("--right-topic", default="/camera/right/image_raw")
    p.add_argument("--depth-topic", default="/camera/depth/image_raw")
    p.add_argument("--imu-topic", default="/imu")
    p.add_argument("--chunked", action="store_true")
    p.add_argument("--out-prefix", default="live")
    args = p.parse_args(argv)

    feed = LiveFeed(_build_slam(args), args.sensor, chunked=args.chunked)
    try:
        import rclpy  # ROS2
        from rclpy.node import Node

        return _spin_ros2(rclpy, Node, feed, args)
    except ImportError:
        pass
    try:
        import rospy  # ROS1

        return _spin_ros1(rospy, feed, args)
    except ImportError:
        print(
            "no ROS python environment (rclpy/rospy) importable — source a "
            "ROS install first; the SLAM side of this node is covered by "
            "tests/test_ros_feed.py without ROS",
            file=sys.stderr,
        )
        return 2


def _msg_ts(msg):
    s = msg.header.stamp
    return float(getattr(s, "sec", getattr(s, "secs", 0))) + 1e-9 * float(
        getattr(s, "nanosec", getattr(s, "nsecs", 0))
    )


def _img_of(msg):
    h, w = msg.height, msg.width
    a = np.frombuffer(bytes(msg.data), np.uint8)
    c = len(a) // (h * w)
    return a.reshape(h, w, c) if c > 1 else a.reshape(h, w)


def _spin_ros2(rclpy, Node, feed: LiveFeed, args):
    from sensor_msgs.msg import Image, Imu

    rclpy.init()
    node = Node("orb_slam3_modified_tpu")
    node.create_subscription(
        Image, args.image_topic,
        lambda m: feed.on_image(_msg_ts(m), _img_of(m)), 10,
    )
    if "stereo" in args.sensor:
        node.create_subscription(
            Image, args.right_topic,
            lambda m: feed.on_right(_msg_ts(m), _img_of(m)), 10,
        )
    if "rgbd" in args.sensor:
        node.create_subscription(
            Image, args.depth_topic,
            lambda m: feed.on_depth(
                _msg_ts(m),
                np.frombuffer(bytes(m.data), np.uint16).reshape(
                    m.height, m.width
                ).astype(np.float32) / 1000.0,
            ), 10,
        )
    if "imu" in args.sensor:
        node.create_subscription(
            Imu, args.imu_topic,
            lambda m: feed.on_imu(
                _msg_ts(m),
                (m.linear_acceleration.x, m.linear_acceleration.y,
                 m.linear_acceleration.z),
                (m.angular_velocity.x, m.angular_velocity.y,
                 m.angular_velocity.z),
            ), 200,
        )
    try:
        rclpy.spin(node)
    except KeyboardInterrupt:
        pass
    feed.finish(args.out_prefix)
    rclpy.shutdown()
    return 0


def _spin_ros1(rospy, feed: LiveFeed, args):
    from sensor_msgs.msg import Image, Imu

    rospy.init_node("orb_slam3_modified_tpu")
    rospy.Subscriber(
        args.image_topic, Image,
        lambda m: feed.on_image(_msg_ts(m), _img_of(m)),
    )
    if "stereo" in args.sensor:
        rospy.Subscriber(
            args.right_topic, Image,
            lambda m: feed.on_right(_msg_ts(m), _img_of(m)),
        )
    if "rgbd" in args.sensor:
        rospy.Subscriber(
            args.depth_topic, Image,
            lambda m: feed.on_depth(
                _msg_ts(m),
                np.frombuffer(bytes(m.data), np.uint16).reshape(
                    m.height, m.width
                ).astype(np.float32) / 1000.0,
            ),
        )
    if "imu" in args.sensor:
        rospy.Subscriber(
            args.imu_topic, Imu,
            lambda m: feed.on_imu(
                _msg_ts(m),
                (m.linear_acceleration.x, m.linear_acceleration.y,
                 m.linear_acceleration.z),
                (m.angular_velocity.x, m.angular_velocity.y,
                 m.angular_velocity.z),
            ),
        )
    rospy.spin()
    feed.finish(args.out_prefix)
    return 0


if __name__ == "__main__":
    sys.exit(main())
