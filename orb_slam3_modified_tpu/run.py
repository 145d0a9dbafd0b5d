"""Dataset runner CLI — the Examples/ mains equivalent.

TPU-native replacement for the reference example executables (reference:
Examples/Monocular/mono_euroc.cc, Examples/Stereo/stereo_euroc.cc,
Examples/RGB-D/rgbd_tum.cc and friends, registered in CMakeLists.txt:162-262).

Usage:
  python -m orb_slam3_modified_tpu.run --dataset euroc --path /data/MH01 \
      --config configs/euroc_mono.yaml --sensor mono --out traj.txt
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description="TPU-native SLAM dataset runner")
    p.add_argument("--dataset", choices=["euroc", "tum", "kitti"], required=True)
    p.add_argument("--path", required=True)
    p.add_argument("--config", default=None, help="settings YAML (reference format)")
    p.add_argument("--vocab", default=None,
                   help="vocabulary: ORBvoc.txt (reference text format) or "
                        ".npz (scripts/train_default_vocab.py); default = "
                        "packaged corpus-trained vocabulary")
    p.add_argument("--sensor",
                   choices=["mono", "stereo", "rgbd", "mono-imu", "stereo-imu",
                            "rgbd-imu"],
                   default="mono")
    p.add_argument("--out", default="trajectory_tum.txt")
    p.add_argument("--kf-out", default=None)
    p.add_argument("--atlas-out", default=None, help="save atlas checkpoint")
    p.add_argument("--atlas-in", default=None, help="resume from checkpoint")
    p.add_argument("--max-frames", type=int, default=0)
    p.add_argument("--no-loop", action="store_true")
    p.add_argument("--chunked", action="store_true",
                   help="chunk-pipelined frontend (all six sensor configs: "
                        "mono/stereo/rgbd, visual or visual-inertial; "
                        "tracking/chunked.py)")
    p.add_argument("--chunk-size", type=int, default=16)
    p.add_argument("--sync-mapping", action="store_true",
                   help="run local mapping synchronously at keyframe time "
                        "(deterministic; default overlaps it on a worker "
                        "thread like the reference's LocalMapping thread)")
    p.add_argument("--debug-out", default=None,
                   help="write IMU-init debug traces (scale/R_wg/time per "
                        "staged event) as JSON lines — SaveDebugData parity "
                        "(reference src/System.cc:1305)")
    p.add_argument("--viz-out", default=None,
                   help="write per-frame annotated overlays (keypoints, "
                        "tracking state, match counts) to this directory "
                        "(FrameDrawer parity, reference src/FrameDrawer.cc)")
    p.add_argument("--viz-every", type=int, default=10,
                   help="overlay every Nth frame (with --viz-out)")
    p.add_argument("--semantic-out", default=None,
                   help="write a colored semantic PLY cloud: replays posed "
                        "frames through the packaged depth+segmentation net "
                        "(mono_semantic parity, reference README.md:247-267)")
    p.add_argument("--semantic-stride", type=int, default=8,
                   help="pixel stride for semantic backprojection")
    args = p.parse_args(argv)

    from .cameras import Camera
    from .features.extractor import ExtractorConfig
    from .io.datasets import EurocDataset, KittiDataset, TumDataset
    from .system.slam_system import (
        IMU_MONOCULAR,
        MONOCULAR,
        RGBD,
        STEREO,
        SlamSystem,
        SystemConfig,
    )

    if args.config:
        from .io.settings import load_settings

        st = load_settings(args.config)
        cam = st.cam
        ecfg = st.extractor
        bf = st.baseline
        dist = st.dist
        rect = st.rect
    else:
        cam = Camera.pinhole(458.654, 457.296, 367.215, 248.375, width=752, height=480)
        ecfg = ExtractorConfig()
        bf = 458.654 * 0.11
        dist = None
        rect = None

    from .system.slam_system import IMU_RGBD, IMU_STEREO

    sensor = {
        "mono": MONOCULAR,
        "stereo": STEREO,
        "rgbd": RGBD,
        "mono-imu": IMU_MONOCULAR,
        "stereo-imu": IMU_STEREO,
        "rgbd-imu": IMU_RGBD,
    }[args.sensor]
    voc = None
    if args.vocab:
        from .bow.vocabulary import load_orbvoc_text, load_vocabulary_npz

        voc = (
            load_orbvoc_text(args.vocab)
            if args.vocab.endswith(".txt")
            else load_vocabulary_npz(args.vocab)
        )
    imu_cfg = None
    if "imu" in args.sensor and args.config and st.imu is not None:
        # feed the parsed calibration (noise densities, walk, rate, T_b_c1)
        # into the frontend — the reference does this in ParseIMUParamFile
        # (src/Tracking.cc:1303): every preintegration and inertial optimizer
        # must see the real rig, not defaults
        from .tracking.imu_frontend import ImuConfig

        T_bc = np.asarray(st.imu.T_bc, np.float64)
        imu_cfg = ImuConfig(
            noise_gyro=st.imu.noise_gyro,
            noise_acc=st.imu.noise_acc,
            walk_gyro=st.imu.walk_gyro,
            walk_acc=st.imu.walk_acc,
            freq=st.imu.freq,
            R_bc=T_bc[:3, :3].astype(np.float32),
            t_bc=T_bc[:3, 3].astype(np.float32),
        )
    sys_cfg = SystemConfig(
        cam=cam, sensor=sensor, extractor=ecfg,
        feat_cap=ecfg.n_features,
        vocabulary=voc,
        use_loop_closing=not args.no_loop,
        bf=bf if "stereo" in args.sensor or "rgbd" in args.sensor else 0.0,
        th_far_points=st.th_far_points if args.config else 0.0,
        dist=dist,
        imu=imu_cfg,
        # KB8 fisheye rig (no rectification): general left<->right matching
        cam_right=(
            st.cam_right if args.config and "stereo" in args.sensor else None
        ),
        T_rl=st.T_rl if args.config and "stereo" in args.sensor else None,
    )
    slam = SlamSystem(sys_cfg)
    if args.atlas_in:
        from .slam_map.serialization import load_atlas

        slam.map = load_atlas(args.atlas_in)
        slam.tracker.map = slam.map
        slam.mapper.map = slam.map
        if slam.closer:
            slam.closer.map = slam.map

    if args.dataset == "euroc":
        ds = EurocDataset(args.path, stereo="stereo" in args.sensor,
                          with_imu="imu" in args.sensor,
                          with_depth="rgbd" in args.sensor)
    elif args.dataset == "tum":
        ds = TumDataset(args.path, with_depth="rgbd" in args.sensor)
    else:
        ds = KittiDataset(args.path, stereo=args.sensor == "stereo")

    import jax.numpy as jnp

    def imu_tuple(samples, prev_ts):
        """(acc (N,3), gyro (N,3), dts (N,)) from dataset ImuSamples since the
        previous frame (reference: GrabImuData + PreintegrateIMU,
        src/Tracking.cc:1621,1627)."""
        if not samples:
            return None
        acc = np.stack([s.acc for s in samples]).astype(np.float32)
        gyro = np.stack([s.gyro for s in samples]).astype(np.float32)
        tss = np.array([s.ts for s in samples])
        t0 = prev_ts if prev_ts is not None else tss[0]
        dts = np.diff(np.concatenate([[t0], tss])).astype(np.float32)
        dts = np.maximum(dts, 0.0)
        return acc, gyro, dts

    chunk_fe = None
    if args.chunked:
        chunk_fe = slam.make_chunked_frontend(
            chunk=args.chunk_size, lag=1,
            stereo="stereo" in args.sensor,
            rgbd="rgbd" in args.sensor,
            async_mapping=not args.sync_mapping,
        )

    n_done = 0
    prev_imu_ts = None
    drawer = None
    recent_imgs = None
    if args.viz_out:
        from .viz.frame_drawer import FrameDrawer

        drawer = FrameDrawer()
        recent_imgs = {}  # frame_id -> host image (chunked mode retires late)
    t_start = time.perf_counter()
    for frame in ds:
        img = jnp.asarray(frame.image)
        if args.sensor in ("stereo", "stereo-imu") and frame.image_right is not None:
            samples = None
            if "imu" in args.sensor:
                samples = imu_tuple(frame.imu, prev_imu_ts)
                if frame.imu:
                    prev_imu_ts = frame.imu[-1].ts
            img_r = jnp.asarray(frame.image_right)
            if rect is not None:
                # device-side rectification remap (reference: Settings
                # precomputeRectificationMaps + cv::remap per frame)
                img, img_r = rect.remap(img, img_r)
            if chunk_fe is not None:
                chunk_fe.track_image(
                    np.asarray(img, np.uint8), frame.ts,
                    img_right=np.asarray(img_r, np.uint8),
                    imu_samples=samples,
                )
            else:
                slam.track_stereo(img, img_r, frame.ts, imu_samples=samples)
        elif "rgbd" in args.sensor and frame.depth is not None:
            samples = None
            if "imu" in args.sensor:
                samples = imu_tuple(frame.imu, prev_imu_ts)
                if frame.imu:
                    prev_imu_ts = frame.imu[-1].ts
            if chunk_fe is not None:
                chunk_fe.track_image(
                    np.asarray(frame.image, np.uint8), frame.ts,
                    depth_img=np.asarray(frame.depth, np.float32),
                    imu_samples=samples,
                )
            else:
                slam.track_rgbd(img, jnp.asarray(frame.depth), frame.ts,
                                imu_samples=samples)
        elif args.sensor == "mono-imu":
            samples = imu_tuple(frame.imu, prev_imu_ts)
            if frame.imu:
                prev_imu_ts = frame.imu[-1].ts
            if chunk_fe is not None:
                chunk_fe.track_image(
                    np.asarray(frame.image, np.uint8), frame.ts,
                    imu_samples=samples,
                )
            else:
                slam.track_monocular_inertial(img, frame.ts, samples)
        elif chunk_fe is not None:
            chunk_fe.track_image(np.asarray(frame.image, np.uint8), frame.ts)
        else:
            slam.track_monocular(img, frame.ts)
        n_done += 1
        if drawer is not None:
            recent_imgs[n_done - 1] = np.asarray(frame.image)
            for stale in [
                f for f in recent_imgs if f < n_done - 8 * args.chunk_size
            ]:
                del recent_imgs[stale]
            rec = slam.tracker.last
            if (
                rec is not None
                and rec.frame_id % max(1, args.viz_every) == 0
                and rec.frame_id in recent_imgs
            ):
                from .viz.frame_drawer import write_overlay

                write_overlay(
                    args.viz_out, slam.tracker,
                    image=recent_imgs.pop(rec.frame_id), drawer=drawer,
                )
        if args.max_frames and n_done >= args.max_frames:
            break
        if n_done % 100 == 0:
            fps = n_done / (time.perf_counter() - t_start)
            print(f"[{n_done}/{len(ds)}] {fps:.1f} fps, "
                  f"kfs={slam.map.n_keyframes()} mps={slam.map.n_points()}",
                  file=sys.stderr)

    if chunk_fe is not None:
        chunk_fe.flush()
    slam.shutdown()
    if args.semantic_out:
        _write_semantic_cloud(args, slam, ds, cam)
    slam.save_trajectory_tum(args.out)
    if args.kf_out:
        slam.save_keyframe_trajectory_tum(args.kf_out)
    if args.debug_out:
        n_ev = slam.save_debug_data(args.debug_out)
        print(f"[debug] {n_ev} staged-init events -> {args.debug_out}",
              file=sys.stderr)
    if args.atlas_out:
        from .slam_map.serialization import save_atlas

        save_atlas(args.atlas_out, slam.map)
    print(slam.timing.dump())
    fps = n_done / (time.perf_counter() - t_start)
    print(f"done: {n_done} frames at {fps:.1f} fps")
    return slam


def _write_semantic_cloud(args, slam, ds, cam):
    """mono_semantic parity: SLAM poses + packaged depth/seg net -> colored
    PLY (reference: mono_semantic main — pose + ZoeDepth + OneFormer ->
    PCL cloud, README.md:247-267; CloudPoint accumulation src/CloudPoint.cc)."""
    from .models.depth import default_depth_model, make_depth_fn, make_seg_fn
    from .recon.cloud import save_ply, semantic_cloud

    model = default_depth_model()
    if model is None:
        print("[semantic] no packaged depth model "
              "(run scripts/train_depth_net.py); skipping", file=sys.stderr)
        return
    net, params, meta = model
    hw = tuple(
        int(x) for x in meta.get("train_res", "96x128").split("x")
    )
    depth_fn = make_depth_fn(net, params, hw)
    seg_fn = make_seg_fn(net, params, hw)
    pose_of = {}
    for ts, fid, T in slam.tracker.absolute_trajectory():
        pose_of[fid] = T
    # keyframe-rate replay: every Nth posed frame (the dataset re-iterates)
    step = max(1, len(ds) // 40)
    frames = []
    for i, frame in enumerate(ds):
        if i in pose_of and i % step == 0:
            frames.append((np.asarray(frame.image, np.float32), pose_of[i]))
        if args.max_frames and i >= args.max_frames:
            break
    if not frames:
        print("[semantic] no posed frames; skipping", file=sys.stderr)
        return
    colormap = np.array([[40, 40, 200], [90, 200, 90]], np.uint8)  # bg, surface
    pts, cols = semantic_cloud(
        cam, frames, depth_fn, seg_fn, colormap,
        stride=args.semantic_stride, voxel=0.05,
    )
    save_ply(args.semantic_out, pts, cols)
    print(f"[semantic] {len(pts)} points from {len(frames)} frames -> "
          f"{args.semantic_out}", file=sys.stderr)


if __name__ == "__main__":
    main()
