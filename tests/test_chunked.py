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
