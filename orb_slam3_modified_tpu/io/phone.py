"""Phone-capture conversion pipeline.

TPU-native replacement for the fork's script/ tooling (reference:
script/data2orbslam.py — VideoIMUCapture protobuf + video -> image dir +
timestamp list + imu.txt, README.md:84-116) used with the Android capture
app (android_app/, recording.proto schema).

Two ingestion paths:
- protobuf recording (video_meta.pb + video.mp4): requires the generated
  recording_pb2 module (protoc output from the app's recording.proto);
  gated import so environments without it still load this module.
- generic video + IMU CSV: any phone capture exported as mp4 + a CSV of
  (t_ns, gx, gy, gz, ax, ay, az) converts the same way.

Output layout matches the reference converter: <out>/cam0/data/<ns>.png,
<out>/cam0/times.txt, <out>/imu0/data.csv — loadable by io.datasets.
"""
from __future__ import annotations

import os

import numpy as np


def convert_video_imu(
    video_path: str,
    imu_csv: str,
    out_dir: str,
    target_fps: float | None = None,
    resize: tuple | None = None,
):
    """Decode video frames + IMU csv into the EuRoC-style layout."""
    import cv2

    os.makedirs(os.path.join(out_dir, "cam0", "data"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "imu0"), exist_ok=True)
    cap = cv2.VideoCapture(video_path)
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    step = 1 if target_fps is None else max(1, int(round(fps / target_fps)))
    times = []
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
            cv2.imwrite(os.path.join(out_dir, "cam0", "data", f"{t_ns}.png"), gray)
            times.append(t_ns)
        i += 1
    cap.release()
    with open(os.path.join(out_dir, "cam0", "times.txt"), "w") as f:
        f.write("\n".join(str(t) for t in times) + "\n")
    # IMU csv passthrough (normalize to EuRoC column order: t, gyro, acc)
    rows = np.loadtxt(imu_csv, delimiter=",")
    with open(os.path.join(out_dir, "imu0", "data.csv"), "w") as f:
        f.write("#timestamp [ns],w_x,w_y,w_z,a_x,a_y,a_z\n")
        for r in rows:
            f.write(",".join(str(x) for x in r[:7]) + "\n")
    return len(times), len(rows)


def convert_protobuf_recording(recording_dir: str, out_dir: str, **kw):
    """Ingest a VideoIMUCapture recording (video_recording.mp4 +
    video_meta.pb). Requires recording_pb2 (protoc-generated from the
    app's recording.proto)."""
    try:
        import recording_pb2  # type: ignore
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "recording_pb2 not found: generate it with "
            "`protoc --python_out=. recording.proto` from the capture app's "
            "schema (reference: android_app/protobuf/recording.proto)"
        ) from e
    meta_path = os.path.join(recording_dir, "video_meta.pb")
    video_path = os.path.join(recording_dir, "video_recording.mp4")
    meta = recording_pb2.VideoCaptureData()
    with open(meta_path, "rb") as f:
        meta.ParseFromString(f.read())
    os.makedirs(os.path.join(out_dir, "imu0"), exist_ok=True)
    with open(os.path.join(out_dir, "imu0", "data.csv"), "w") as f:
        f.write("#timestamp [ns],w_x,w_y,w_z,a_x,a_y,a_z\n")
        for imu in meta.imu:
            f.write(
                f"{imu.time_ns},{imu.gyro[0]},{imu.gyro[1]},{imu.gyro[2]},"
                f"{imu.accel[0]},{imu.accel[1]},{imu.accel[2]}\n"
            )
    import cv2

    os.makedirs(os.path.join(out_dir, "cam0", "data"), exist_ok=True)
    cap = cv2.VideoCapture(video_path)
    frame_times = [fd.time_ns for fd in meta.video_meta]
    times = []
    for t_ns in frame_times:
        ok, frame = cap.read()
        if not ok:
            break
        gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
        cv2.imwrite(os.path.join(out_dir, "cam0", "data", f"{t_ns}.png"), gray)
        times.append(t_ns)
    cap.release()
    with open(os.path.join(out_dir, "cam0", "times.txt"), "w") as f:
        f.write("\n".join(str(t) for t in times) + "\n")
    return len(times)
