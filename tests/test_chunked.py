"""Chunked device-pipeline e2e: rendered images -> chunk dispatches -> ATE.

Exercises tracking/chunked.py (the amortized image->pose fast path used by
bench.py): batched extraction + scanned track step in one dispatch,
retroactive keyframe policy, async local mapping, slow-path handoff.
"""
import numpy as np
import pytest

from orb_slam3_modified_tpu.cameras import Camera
from orb_slam3_modified_tpu.eval.ate import ate_rmse

CAM = Camera.pinhole(458.654, 457.296, 367.215, 248.375, width=752, height=480)


@pytest.fixture(scope="module")
def chunked_run(tmp_path_factory):
    from orb_slam3_modified_tpu.features.extractor import ExtractorConfig
    from orb_slam3_modified_tpu.io.datasets import EurocDataset
    from orb_slam3_modified_tpu.system.slam_system import SlamSystem, SystemConfig
    from orb_slam3_modified_tpu.utils.synthetic_dataset import write_euroc_sequence

    root = str(tmp_path_factory.mktemp("euroc_synth_chunk"))
    n_frames = 26
    gts = write_euroc_sequence(root, CAM, n_frames=n_frames, radius=3.0)
    ds = EurocDataset(root)
    slam = SlamSystem(
        SystemConfig(
            cam=CAM,
            feat_cap=512,
            extractor=ExtractorConfig(n_features=512, n_levels=4),
            use_loop_closing=False,
        )
    )
    fe = slam.make_chunked_frontend(chunk=4, lag=1)
    retired = []
    for frame in ds:
        retired += fe.track_image(frame.image.astype(np.uint8), frame.ts)
    retired += fe.flush()
    slam.shutdown()
    return slam, gts, retired, n_frames


class TestChunkedPipeline:
    def test_all_frames_retired_in_order(self, chunked_run):
        slam, gts, retired, n_frames = chunked_run
        fids = [r[0] for r in retired]
        assert fids == sorted(fids)
        assert len(retired) == n_frames

    def test_tracks_and_creates_keyframes(self, chunked_run):
        slam, gts, retired, n_frames = chunked_run
        n_tracked = sum(1 for r in retired if r[2] is not None)
        assert n_tracked >= n_frames - 6, f"tracked only {n_tracked}"
        assert slam.map.n_keyframes() >= 2

    def test_trajectory_ate(self, chunked_run):
        slam, gts, retired, n_frames = chunked_run
        traj = slam.tracker.absolute_trajectory()
        if len(traj) < 10:
            pytest.skip("too few tracked frames for ATE")
        est, gt = [], []
        for ts, fid, T in traj:
            est.append(np.linalg.inv(T)[:3, 3])
            gt.append(np.linalg.inv(gts[fid])[:3, 3])
        rmse, s = ate_rmse(np.array(est), np.array(gt))
        assert rmse < 0.25, f"ATE {rmse}"


@pytest.fixture(scope="module")
def chunked_stereo_run(tmp_path_factory):
    from orb_slam3_modified_tpu.features.extractor import ExtractorConfig
    from orb_slam3_modified_tpu.io.datasets import EurocDataset
    from orb_slam3_modified_tpu.system.slam_system import (
        STEREO,
        SlamSystem,
        SystemConfig,
    )
    from orb_slam3_modified_tpu.utils.synthetic_dataset import write_euroc_sequence

    baseline = 0.11
    root = str(tmp_path_factory.mktemp("euroc_synth_chunk_st"))
    n_frames = 26
    gts = write_euroc_sequence(
        root, CAM, n_frames=n_frames, radius=3.0, stereo_baseline=baseline
    )
    ds = EurocDataset(root, stereo=True)
    slam = SlamSystem(
        SystemConfig(
            cam=CAM,
            sensor=STEREO,
            feat_cap=512,
            extractor=ExtractorConfig(n_features=512, n_levels=4),
            use_loop_closing=False,
            bf=baseline * CAM.fx,
        )
    )
    fe = slam.make_chunked_frontend(chunk=4, lag=1, stereo=True)
    retired = []
    for frame in ds:
        retired += fe.track_image(
            frame.image.astype(np.uint8), frame.ts,
            img_right=frame.image_right.astype(np.uint8),
        )
    retired += fe.flush()
    slam.shutdown()
    return slam, gts, retired, n_frames


class TestChunkedStereo:
    """Stereo chunk pipeline: batched L+R extraction + in-scan row-band
    matching + (u, v, uR) pose rows (reference: ComputeStereoMatches
    src/Frame.cc:811 inside the Frame ctor; EdgeStereoOnlyPose rows)."""

    def test_tracks_metric(self, chunked_stereo_run):
        slam, gts, retired, n_frames = chunked_stereo_run
        n_tracked = sum(1 for r in retired if r[2] is not None)
        assert n_tracked >= n_frames - 6, f"tracked only {n_tracked}"
        traj = slam.tracker.absolute_trajectory()
        est, gt = [], []
        for ts, fid, T in traj:
            est.append(np.linalg.inv(T)[:3, 3])
            gt.append(np.linalg.inv(gts[fid])[:3, 3])
        rmse, s = ate_rmse(np.array(est), np.array(gt), with_scale=True)
        assert rmse < 0.10, f"stereo chunked ATE {rmse}"
        # metricness comes from the stereo rows: alignment scale ~ 1
        assert abs(s - 1.0) < 0.15, f"scale {s}"

    def test_depth_points_spawned(self, chunked_stereo_run):
        """Stereo keyframes must spawn close depth points (reference:
        CreateNewKeyFrame stereo path, src/Tracking.cc:3260)."""
        slam, gts, retired, n_frames = chunked_stereo_run
        assert slam.map.n_keyframes() >= 2
        assert slam.map.n_points() > 100
