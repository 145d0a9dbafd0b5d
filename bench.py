"""Benchmark: end-to-end tracking throughput on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: tracking frames/s over a synthetic-feature sequence through the full
SLAM stack (motion-model projection matching + pose optimization + local-map
tracking + keyframe/local-BA upkeep). Baseline = the reference's real-time
contract of 20 fps on a desktop CPU (BASELINE.md: EuRoC throttle loop,
Examples/Monocular-Inertial/mono_inertial_euroc.cc:224).

Feature extraction is benchmarked separately ("extract_ms" auxiliary output
on stderr) until the image frontend is fused into the per-frame step.
"""
import json
import sys
import time

import numpy as np


def main():
    import orb_slam3_modified_tpu  # noqa: F401  (precision + cache config)
    import jax
    import jax.numpy as jnp

    from orb_slam3_modified_tpu.cameras import Camera
    from orb_slam3_modified_tpu.lie.se3 import SE3
    from orb_slam3_modified_tpu.mapping.local_mapper import (
        LocalMapper,
        LocalMapperConfig,
    )
    from orb_slam3_modified_tpu.slam_map.map_state import MapState
    from orb_slam3_modified_tpu.tracking.tracker import Tracker, TrackerConfig
    from orb_slam3_modified_tpu.utils.synthetic import orbit_trajectory
    from orb_slam3_modified_tpu.utils.synthetic_features import SyntheticFeatureWorld

    from orb_slam3_modified_tpu.tracking.fused import FusedTracker

    from orb_slam3_modified_tpu.mapping.async_mapper import AsyncLocalMapper

    cam = Camera.pinhole(458.654, 457.296, 367.215, 248.375, width=752, height=480)
    n_frames = 120
    world = SyntheticFeatureWorld(
        n_points=6000, spread=5.0, seed=0, feat_cap=1024, noise_px=0.4
    )
    T_all = orbit_trajectory(n_frames, radius=4.0, sweep=np.pi / 2)
    slam_map = MapState.create(max_kf=256, max_mp=32768, feat_cap=1024)
    tcfg = TrackerConfig(cam=cam)
    tracker = Tracker(tcfg, slam_map)
    mapper = LocalMapper(LocalMapperConfig(), tcfg, slam_map)
    async_mapper = AsyncLocalMapper(mapper)
    tracker.on_keyframe = async_mapper.on_keyframe
    tracker.mapper_busy_fn = async_mapper.busy
    fused = FusedTracker(tracker, lag=3, map_lock=async_mapper.lock)

    # pre-render features so the bench times SLAM, not the synthetic world
    frames = []
    for i in range(n_frames):
        T_cw = SE3(T_all.R[i], T_all.t[i])
        feats, _ = world.observe(cam, T_cw, max_feats=800)
        jax.block_until_ready(feats.uv)
        frames.append(feats)

    # warmup: first frames trigger all compiles
    n_warm = 12
    for i in range(n_warm):
        fused.track(frames[i], ts=i * 0.05)

    t0 = time.perf_counter()
    for i in range(n_warm, n_frames):
        fused.track(frames[i], ts=i * 0.05)
    fused.flush()
    dt = time.perf_counter() - t0
    async_mapper.flush()
    async_mapper.shutdown()
    fps = (n_frames - n_warm) / dt
    tracked = sum(
        1 for ts, fid, T in tracker.absolute_trajectory() if fid >= n_warm
    )

    baseline_fps = 20.0
    print(
        f"[bench] device={jax.devices()[0]} tracked={tracked}/{n_frames - n_warm} "
        f"kfs={slam_map.n_keyframes()} mps={slam_map.n_points()}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "tracking_fps",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / baseline_fps, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
