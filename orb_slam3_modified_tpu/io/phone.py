"""Phone-capture conversion pipeline.

TPU-native replacement for the fork's script/ tooling (reference:
script/data2orbslam.py — VideoIMUCapture protobuf + video -> image dir +
timestamp list + imu csv, README.md:84-116) used with the Android capture
app (android_app/, recording.proto schema).

Two ingestion paths:
- protobuf recording (video_meta.pb + video_recording.mp4): parsed with a
  wire-compatible subset schema shipped in io/recording.proto (compiled at
  import time via protoc when a generated recording_pb2 is not already
  importable).
- generic video + IMU CSV: any phone capture exported as mp4 + a CSV of
  (t_ns, gx, gy, gz, ax, ay, az) converts the same way.

Output is the EuRoC MAV layout (<out>/mav0/cam0/data/<ns>.png +
data.csv, <out>/mav0/imu0/data.csv) so io.datasets.EurocDataset loads the
result directly; cam0/times.txt is also written for parity with the
reference converter's timestamp list.
"""
from __future__ import annotations

import os
import subprocess
import sys
import tempfile

import numpy as np


def _load_recording_pb2():
    """Import recording_pb2, generating it from io/recording.proto with
    protoc into a temp dir if no pre-generated module is importable."""
    try:
        import recording_pb2  # type: ignore

        return recording_pb2
    except ImportError:
        pass
    proto = os.path.join(os.path.dirname(__file__), "recording.proto")
    gen_dir = tempfile.mkdtemp(prefix="recording_pb2_")
    try:
        subprocess.run(
            ["protoc", f"-I{os.path.dirname(proto)}", f"--python_out={gen_dir}", proto],
            check=True,
        )
    except (FileNotFoundError, subprocess.CalledProcessError) as e:
        raise ImportError(
            "reading protobuf phone recordings needs a generated recording_pb2 "
            "module or the `protoc` compiler on PATH (install protobuf-compiler, "
            f"or pre-generate recording_pb2 from {proto})"
        ) from e
    sys.path.insert(0, gen_dir)
    try:
        import recording_pb2  # type: ignore
    finally:
        sys.path.remove(gen_dir)
    return recording_pb2


def _write_euroc_layout(out_dir, times, grays, imu_rows):
    """times: [ns], grays: iterable of (t_ns, HxW uint8), imu_rows:
    (N, 7) [t_ns, gx, gy, gz, ax, ay, az]."""
    import cv2

    cam_dir = os.path.join(out_dir, "mav0", "cam0")
    os.makedirs(os.path.join(cam_dir, "data"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "mav0", "imu0"), exist_ok=True)
    for t_ns, gray in grays:
        cv2.imwrite(os.path.join(cam_dir, "data", f"{t_ns}.png"), gray)
    with open(os.path.join(cam_dir, "data.csv"), "w") as f:
        f.write("#timestamp [ns],filename\n")
        for t in times:
            f.write(f"{t},{t}.png\n")
    with open(os.path.join(cam_dir, "times.txt"), "w") as f:
        f.write("\n".join(str(t) for t in times) + "\n")
    with open(os.path.join(out_dir, "mav0", "imu0", "data.csv"), "w") as f:
        f.write(
            "#timestamp [ns],w_RS_S_x [rad s^-1],w_RS_S_y [rad s^-1],"
            "w_RS_S_z [rad s^-1],a_RS_S_x [m s^-2],a_RS_S_y [m s^-2],"
            "a_RS_S_z [m s^-2]\n"
        )
        for r in imu_rows:
            f.write(f"{int(r[0])}," + ",".join(repr(float(x)) for x in r[1:7]) + "\n")


def convert_video_imu(
    video_path: str,
    imu_csv: str,
    out_dir: str,
    target_fps: float | None = None,
    resize: tuple | None = None,
):
    """Decode video frames + IMU csv into the EuRoC-style layout."""
    import cv2

    cap = cv2.VideoCapture(video_path)
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    step = 1 if target_fps is None else max(1, int(round(fps / target_fps)))
    times, grays = [], []
    i = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if i % step == 0:
            t_ns = int(cap.get(cv2.CAP_PROP_POS_MSEC) * 1e6)
            if t_ns == 0 and times:
                t_ns = times[-1] + int(1e9 / fps * step)
            gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
            if resize:
                gray = cv2.resize(gray, resize)
            times.append(t_ns)
            grays.append((t_ns, gray))
        i += 1
    cap.release()
    rows = np.loadtxt(imu_csv, delimiter=",", ndmin=2)
    _write_euroc_layout(out_dir, times, grays, rows)
    return len(times), len(rows)


def convert_protobuf_recording(recording_dir: str, out_dir: str, raw_imu=False):
    """Ingest a VideoIMUCapture recording (video_recording.mp4 +
    video_meta.pb). Gyro drift / accel bias reported by the phone are
    subtracted unless raw_imu (reference: data2orbslam.py imu_to_rosimu,
    script/data2orbslam.py:82-93)."""
    import cv2

    recording_pb2 = _load_recording_pb2()
    meta_path = os.path.join(recording_dir, "video_meta.pb")
    video_path = os.path.join(recording_dir, "video_recording.mp4")
    meta = recording_pb2.VideoCaptureData()
    with open(meta_path, "rb") as f:
        meta.ParseFromString(f.read())
    imu_rows = []
    for imu in meta.imu:
        g = np.asarray(imu.gyro, np.float64)
        a = np.asarray(imu.accel, np.float64)
        if not raw_imu:
            if len(imu.gyro_drift) == 3:
                g = g - np.asarray(imu.gyro_drift, np.float64)
            if len(imu.accel_bias) == 3:
                a = a - np.asarray(imu.accel_bias, np.float64)
        imu_rows.append([imu.time_ns, *g, *a])
    cap = cv2.VideoCapture(video_path)
    frame_times = [fd.time_ns for fd in meta.video_meta]
    times, grays = [], []
    for t_ns in frame_times:
        ok, frame = cap.read()
        if not ok:
            break
        gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
        times.append(t_ns)
        grays.append((t_ns, gray))
    cap.release()
    _write_euroc_layout(out_dir, times, grays, np.asarray(imu_rows))
    return len(times)
