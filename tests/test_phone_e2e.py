"""Phone-capture pipeline end-to-end: protobuf recording -> dataset -> tracking.

Mirrors the fork's phone workflow (reference: script/data2orbslam.py —
VideoIMUCapture protobuf + mp4 -> ORB-SLAM dataset): a synthetic rendered
sequence is encoded as a phone recording (mp4 + video_meta.pb with IMU
samples carrying a known drift/bias the converter must subtract), converted
with io.phone.convert_protobuf_recording, loaded by EurocDataset, and fed
through the real SLAM frontend.
"""
import os

import numpy as np
import pytest

from orb_slam3_modified_tpu.cameras import Camera

cv2 = pytest.importorskip("cv2")

CAM = Camera.pinhole(458.654, 457.296, 367.215, 248.375, width=752, height=480)
N_FRAMES = 24
FPS = 20.0


@pytest.fixture(scope="module")
def recording(tmp_path_factory):
    """Build a phone-style recording from a rendered EuRoC sequence."""
    from orb_slam3_modified_tpu.io.phone import _load_recording_pb2
    from orb_slam3_modified_tpu.utils.synthetic_dataset import write_euroc_sequence

    pb2 = _load_recording_pb2()
    src = str(tmp_path_factory.mktemp("src"))
    gts = write_euroc_sequence(
        src, CAM, n_frames=N_FRAMES, fps=FPS, radius=3.0, with_imu=True
    )
    rec_dir = str(tmp_path_factory.mktemp("recording"))
    # --- mp4 from the rendered frames
    vw = cv2.VideoWriter(
        os.path.join(rec_dir, "video_recording.mp4"),
        cv2.VideoWriter_fourcc(*"mp4v"),
        FPS,
        (CAM.width, CAM.height),
    )
    assert vw.isOpened(), "mp4v codec unavailable"
    cam_data = os.path.join(src, "mav0", "cam0", "data")
    names = sorted(os.listdir(cam_data), key=lambda s: int(s.split(".")[0]))
    frame_ts = []
    for name in names:
        img = cv2.imread(os.path.join(cam_data, name), cv2.IMREAD_GRAYSCALE)
        vw.write(cv2.cvtColor(img, cv2.COLOR_GRAY2BGR))
        frame_ts.append(int(name.split(".")[0]))
    vw.release()
    # --- protobuf metadata: frame times + IMU with a known drift the
    # converter must remove (reference: imu_to_rosimu subtracts gyro_drift
    # and accel_bias, script/data2orbslam.py:82-93)
    drift = np.array([0.01, -0.02, 0.03])
    bias = np.array([0.1, 0.2, -0.3])
    meta = pb2.VideoCaptureData()
    imu_rows = np.loadtxt(
        os.path.join(src, "mav0", "imu0", "data.csv"), delimiter=",", ndmin=2
    )
    for r in imu_rows:
        s = meta.imu.add()
        s.time_ns = int(r[0])
        s.gyro.extend((r[1:4] + drift).astype(np.float32))
        s.gyro_drift.extend(drift.astype(np.float32))
        s.accel.extend((r[4:7] + bias).astype(np.float32))
        s.accel_bias.extend(bias.astype(np.float32))
    for i, t in enumerate(frame_ts):
        fm = meta.video_meta.add()
        fm.time_ns = t
        fm.frame_number = i
    meta.camera_meta.intrinsic_params.extend(
        [458.654, 457.296, 367.215, 248.375, 0.0]
    )
    with open(os.path.join(rec_dir, "video_meta.pb"), "wb") as f:
        f.write(meta.SerializeToString())
    return rec_dir, gts, imu_rows


class TestPhonePipeline:
    def test_convert_and_load(self, recording, tmp_path):
        from orb_slam3_modified_tpu.io.datasets import EurocDataset
        from orb_slam3_modified_tpu.io.phone import convert_protobuf_recording

        rec_dir, gts, imu_rows = recording
        out = str(tmp_path / "converted")
        n = convert_protobuf_recording(rec_dir, out)
        assert n == N_FRAMES
        ds = EurocDataset(out, with_imu=True)
        assert len(ds) == N_FRAMES
        frames = list(ds)
        # drift/bias subtracted: recovered IMU matches the source stream
        got = np.concatenate(
            [[np.r_[s.gyro, s.acc] for s in f.imu] for f in frames if f.imu]
        )
        want = imu_rows[: len(got), 1:7]
        assert np.allclose(got, want, atol=1e-5)
        # frame timestamps preserved exactly (ns -> s)
        src_ts = imu_rows[:, 0]
        assert frames[0].ts >= 0 and frames[-1].ts > frames[0].ts
        assert frames[0].image.shape == (CAM.height, CAM.width)
        del src_ts

    def test_tracks_through_codec(self, recording, tmp_path):
        """The lossy mp4 round trip still tracks with the real frontend."""
        import jax.numpy as jnp

        from orb_slam3_modified_tpu.features.extractor import ExtractorConfig
        from orb_slam3_modified_tpu.io.datasets import EurocDataset
        from orb_slam3_modified_tpu.io.phone import convert_protobuf_recording
        from orb_slam3_modified_tpu.system.slam_system import (
            SlamSystem,
            SystemConfig,
        )

        rec_dir, gts, _ = recording
        out = str(tmp_path / "converted")
        convert_protobuf_recording(rec_dir, out)
        slam = SlamSystem(
            SystemConfig(
                cam=CAM,
                feat_cap=512,
                extractor=ExtractorConfig(n_features=512, n_levels=4),
                use_loop_closing=False,
            )
        )
        n_tracked = 0
        for frame in EurocDataset(out):
            T = slam.track_monocular(jnp.asarray(frame.image), frame.ts)
            if T is not None:
                n_tracked += 1
        assert n_tracked >= N_FRAMES // 2, f"tracked only {n_tracked}"
