"""Benchmark: end-to-end tracking throughput on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: frames/s over a rendered image sequence through the FULL SLAM
stack — ORB extraction (pyramid/FAST/BRIEF on device), motion-model
projection matching, IRLS-LM pose optimization, local-map tracking,
keyframe policy, async local mapping (triangulation + local BA) and loop
closing. Images enter as uint8 host frames, exactly what a camera driver
would hand over; the chunked frontend (tracking/chunked.py) amortizes
dispatch + transfer latency over 16-frame chunks.

Baseline = the reference's real-time contract of 20 fps on a desktop CPU
(BASELINE.md: EuRoC throttle loop,
Examples/Monocular-Inertial/mono_inertial_euroc.cc:224).
"""
import faulthandler
import json
import signal
import sys
import time

import numpy as np

faulthandler.register(signal.SIGUSR1)  # kill -USR1 <pid> dumps all stacks


def render_sequence(cam, n_frames, seed=0):
    """Rendered orbit over a textured plane, as uint8 host frames."""
    from orb_slam3_modified_tpu.utils.synthetic import orbit_trajectory
    from orb_slam3_modified_tpu.utils.synthetic_dataset import (
        camera_rays,
        render_textured_scene,
    )

    rng = np.random.default_rng(seed)
    try:
        import cv2

        tex_small = rng.uniform(0, 255, (96, 96)).astype(np.float32)
        texture = cv2.resize(tex_small, (1024, 1024), interpolation=cv2.INTER_CUBIC)
    except Exception:
        import jax.numpy as jnp
        import jax.image

        tex_small = rng.uniform(0, 255, (96, 96)).astype(np.float32)
        texture = np.asarray(
            jax.image.resize(jnp.asarray(tex_small), (1024, 1024), "cubic")
        )
    T_all = orbit_trajectory(n_frames, radius=4.0, sweep=np.pi / 2)
    rays = camera_rays(cam)
    imgs = []
    gts = []
    for i in range(n_frames):
        T = np.eye(4)
        T[:3, :3] = np.asarray(T_all.R[i])
        T[:3, 3] = np.asarray(T_all.t[i])
        img = render_textured_scene(
            T, cam, texture, plane_z=2.0, plane_half=10.0, rays_c=rays
        )
        imgs.append(np.clip(img, 0, 255).astype(np.uint8))
        gts.append(T)
    return imgs, gts


def main():
    import orb_slam3_modified_tpu  # noqa: F401  (precision + cache config)
    import jax

    from orb_slam3_modified_tpu.cameras import Camera
    from orb_slam3_modified_tpu.features.extractor import ExtractorConfig
    from orb_slam3_modified_tpu.system.slam_system import SlamSystem, SystemConfig

    cam = Camera.pinhole(458.654, 457.296, 367.215, 248.375, width=752, height=480)
    n_frames = 400
    t_render = time.perf_counter()
    cache = "/tmp/bench_seq.npz"
    import os

    if os.path.exists(cache):
        d = np.load(cache)
        imgs, gts = list(d["imgs"][:n_frames]), list(d["gts"][:n_frames])
    else:
        imgs, gts = render_sequence(cam, n_frames)
        np.savez(cache, imgs=np.stack(imgs), gts=np.stack(gts))
    print(
        f"[bench] rendered {n_frames} frames in {time.perf_counter()-t_render:.1f}s",
        file=sys.stderr,
    )

    slam = SlamSystem(
        SystemConfig(
            cam=cam,
            feat_cap=1024,
            extractor=ExtractorConfig(n_features=1024),
            use_loop_closing=True,
        )
    )
    fe = slam.make_chunked_frontend(chunk=16, lag=1)

    fps_cam = 20.0
    n_warm = 64  # init slow path + first chunk compiles
    retired = []
    for i in range(n_warm):
        retired += fe.track_image(imgs[i], ts=i / fps_cam)
    # drain the async mapping queue before the timer starts: the worker's
    # first keyframes trigger its kernel compiles (triangulation, local BA),
    # which on remote-compile TPU backends take minutes — compile latency is
    # warmup, not throughput (same rule as any serving benchmark)
    if getattr(slam, "async_mapper", None) is not None:
        slam.async_mapper.flush()

    t0 = time.perf_counter()
    for i in range(n_warm, n_frames):
        retired += fe.track_image(imgs[i], ts=i / fps_cam)
    retired += fe.flush()
    dt = time.perf_counter() - t0
    fps = (n_frames - n_warm) / dt
    slam.shutdown()

    tracked = sum(1 for fid, ts, T in retired if T is not None and fid >= n_warm)
    baseline_fps = 20.0
    print(
        f"[bench] device={jax.devices()[0]} tracked={tracked}/{n_frames - n_warm} "
        f"kfs={slam.map.n_keyframes()} mps={slam.map.n_points()}",
        file=sys.stderr,
    )
    # per-stage breakdown (chunked-frontend host wall time; REGISTER_TIMES
    # parity — the reference dumps ExecTimeMean.txt, src/Tracking.cc:263)
    print("[bench] per-stage breakdown:", file=sys.stderr)
    for line in fe.stats.dump().splitlines():
        print(f"[bench]   {line}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "tracking_fps_with_extraction",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / baseline_fps, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
