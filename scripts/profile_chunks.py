"""Profile the chunked frontend on the bench sequence.

Reports:
- pure device time of extract_batch and chunk_step (block_until_ready),
- per-frame inlier counts (to find where/why tracking dips),
- loss events and slow-path falls.
"""
import faulthandler
import os
import signal
import sys
import time

faulthandler.register(signal.SIGUSR1)  # kill -USR1 <pid> dumps all stacks

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import orb_slam3_modified_tpu  # noqa: F401
import jax
import jax.numpy as jnp


def main():
    from orb_slam3_modified_tpu.cameras import Camera
    from orb_slam3_modified_tpu.features.extractor import ExtractorConfig, extract_batch
    from orb_slam3_modified_tpu.system.slam_system import SlamSystem, SystemConfig

    cam = Camera.pinhole(458.654, 457.296, 367.215, 248.375, width=752, height=480)
    d = np.load("/tmp/bench_seq.npz")
    imgs = list(d["imgs"])
    n_frames = len(imgs)

    ecfg = ExtractorConfig(n_features=1024)

    # ---- pure device time: extraction
    batch = jnp.asarray(np.stack(imgs[:16]).astype(np.float32))
    ex = jax.jit(lambda b: extract_batch(b, ecfg))
    feats = ex(batch)
    jax.block_until_ready(feats)
    t0 = time.perf_counter()
    for _ in range(5):
        jax.block_until_ready(ex(batch))
    t_ex = (time.perf_counter() - t0) / 5
    print(f"[prof] extract_batch(16): {t_ex*1e3:.1f} ms = {t_ex/16*1e3:.2f} ms/frame")

    # ---- full pipeline with inlier logging
    slam = SlamSystem(
        SystemConfig(
            cam=cam, feat_cap=1024,
            extractor=ecfg, use_loop_closing=True,
        )
    )
    fe = slam.make_chunked_frontend(chunk=16, lag=1)

    # monkeypatch _retire_chunk to log inliers
    orig_retire = fe._retire_chunk

    log = []

    def retire(p):
        n_inl = np.asarray(p.outs.n_inliers)
        for i in range(p.n_valid):
            log.append((p.fids[i], int(n_inl[i])))
        return orig_retire(p)

    fe._retire_chunk = retire

    fps_cam = 20.0
    t_chunks = []
    lost_events = []
    t0 = time.perf_counter()
    for i in range(n_frames):
        t1 = time.perf_counter()
        r = fe.track_image(imgs[i], ts=i / fps_cam)
        dt = time.perf_counter() - t1
        if dt > 0.05:
            t_chunks.append((i, dt))
            print(f"[prof] frame {i}: stalled {dt:.2f}s "
                  f"(state={fe.tracker.state})", flush=True)
        for fid, ts, T in r:
            if T is None:
                lost_events.append(fid)
                print(f"[prof] frame {fid}: LOST", flush=True)
    fe.flush()
    wall = time.perf_counter() - t0
    slam.shutdown()
    print(f"[prof] wall {wall:.1f}s = {n_frames/wall:.1f} fps "
          f"kfs={slam.map.n_keyframes()} mps={slam.map.n_points()}")
    print(f"[prof] lost frames: {lost_events}")
    print("[prof] frames with >50ms host stall (frame, sec):")
    for i, dt in t_chunks[:40]:
        print(f"    {i}: {dt:.2f}")
    inl = np.array([n for _, n in sorted(log)])
    print(f"[prof] inliers: mean={inl.mean():.0f} min={inl.min()} "
          f"p5={np.percentile(inl, 5):.0f}")
    # dump the inlier series in coarse form
    for s in range(0, len(inl), 20):
        seg = inl[s:s + 20]
        print(f"    f{s:3d}: " + " ".join(f"{x:3d}" for x in seg))
    print(fe.stats.dump())
    print("[prof] mapper phases:")
    print(slam.mapper.stats.dump())
    from orb_slam3_modified_tpu.optim.ba import bundle_adjust

    print(f"[prof] bundle_adjust jit cache entries: {bundle_adjust._cache_size()}")


if __name__ == "__main__":
    main()
