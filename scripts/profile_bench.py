"""Profile the chunked frontend: where does the time go on the real TPU?

Caches the rendered sequence to /tmp so iteration is fast.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

CACHE = "/tmp/bench_seq.npz"


def get_sequence(n_frames=400):
    import os

    if os.path.exists(CACHE):
        d = np.load(CACHE)
        if d["imgs"].shape[0] >= n_frames:
            return d["imgs"][:n_frames], d["gts"][:n_frames]
    from bench import render_sequence
    from orb_slam3_modified_tpu.cameras import Camera

    cam = Camera.pinhole(458.654, 457.296, 367.215, 248.375, width=752, height=480)
    imgs, gts = render_sequence(cam, n_frames)
    np.savez(CACHE, imgs=np.stack(imgs), gts=np.stack(gts))
    return np.stack(imgs), np.stack(gts)


def main():
    import orb_slam3_modified_tpu  # noqa: F401
    import jax

    from orb_slam3_modified_tpu.cameras import Camera
    from orb_slam3_modified_tpu.features.extractor import ExtractorConfig
    from orb_slam3_modified_tpu.system.slam_system import SlamSystem, SystemConfig

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    cam = Camera.pinhole(458.654, 457.296, 367.215, 248.375, width=752, height=480)
    t0 = time.perf_counter()
    imgs, gts = get_sequence(n_frames)
    print(f"[prof] sequence ready in {time.perf_counter()-t0:.1f}s", file=sys.stderr)

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
    times = []
    retired = []
    n_lost_events = 0
    import orb_slam3_modified_tpu.tracking.chunked as chunked_mod

    orig_replay = chunked_mod.ChunkedTracker._replay_after_loss
    replay_time = [0.0, 0]

    def timed_replay(self, p, start):
        t = time.perf_counter()
        out = orig_replay(self, p, start)
        replay_time[0] += time.perf_counter() - t
        replay_time[1] += 1
        return out

    chunked_mod.ChunkedTracker._replay_after_loss = timed_replay

    orig_slow = chunked_mod.ChunkedTracker._track_slow
    slow_time = [0.0, 0]

    def timed_slow(self, img, ts):
        t = time.perf_counter()
        out = orig_slow(self, img, ts)
        slow_time[0] += time.perf_counter() - t
        slow_time[1] += 1
        return out

    chunked_mod.ChunkedTracker._track_slow = timed_slow

    orig_dispatch = chunked_mod.ChunkedTracker._dispatch_buffer
    disp_time = [0.0, 0]

    def timed_dispatch(self):
        t = time.perf_counter()
        out = orig_dispatch(self)
        disp_time[0] += time.perf_counter() - t
        disp_time[1] += 1
        return out

    chunked_mod.ChunkedTracker._dispatch_buffer = timed_dispatch

    orig_retire = chunked_mod.ChunkedTracker._retire_chunk
    retire_time = [0.0, 0]

    def timed_retire(self, p):
        t = time.perf_counter()
        out = orig_retire(self, p)
        retire_time[0] += time.perf_counter() - t
        retire_time[1] += 1
        return out

    chunked_mod.ChunkedTracker._retire_chunk = timed_retire

    t_start = time.perf_counter()
    for i in range(n_frames):
        t1 = time.perf_counter()
        retired += fe.track_image(imgs[i], ts=i / fps_cam)
        times.append(time.perf_counter() - t1)
    retired += fe.flush()
    total = time.perf_counter() - t_start
    slam.shutdown()

    times = np.array(times)
    tracked = sum(1 for fid, ts, T in retired if T is not None)
    print(f"[prof] total={total:.1f}s frames={n_frames} fps={n_frames/total:.2f}")
    print(f"[prof] tracked={tracked}/{len(retired)} kfs={slam.map.n_keyframes()}")
    print(
        f"[prof] dispatch: {disp_time[0]:.1f}s / {disp_time[1]} calls; "
        f"retire: {retire_time[0]:.1f}s / {retire_time[1]}; "
        f"slow: {slow_time[0]:.1f}s / {slow_time[1]} frames; "
        f"replay events: {replay_time[1]} ({replay_time[0]:.1f}s)"
    )
    # worst 10 per-frame stalls
    worst = np.argsort(times)[-10:]
    print("[prof] worst frames:", [(int(w), round(float(times[w]), 2)) for w in worst])


if __name__ == "__main__":
    main()
