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


class TestAnchorCorrection:
    """Device-state map anchoring (VERDICT r4: background BA/init/loop
    commits moved the map while the device pose stayed in the old frame
    until matching collapsed). The correction is measured on the reference
    keyframe's pose delta between dispatches and applied as T' = T @ W."""

    def _fixture(self):
        from orb_slam3_modified_tpu.features.extractor import ExtractorConfig
        from orb_slam3_modified_tpu.slam_map.map_state import MapState
        from orb_slam3_modified_tpu.tracking.chunked import ChunkedTracker
        from orb_slam3_modified_tpu.tracking.fused import DeviceTrackState
        from orb_slam3_modified_tpu.tracking.tracker import Tracker, TrackerConfig
        import jax.numpy as jnp

        m = MapState.create(max_kf=8, max_mp=64, feat_cap=16)
        t = Tracker(TrackerConfig(cam=CAM), m)
        k = m.alloc_keyframe()
        m.kf_R[k] = np.eye(3)
        m.kf_t[k] = np.array([0.0, 0.0, 1.0], np.float32)
        m.kf_frame_id[k] = 0
        t.ref_kf = int(k)
        ct = ChunkedTracker(t, ExtractorConfig(n_features=16))
        ct.state = DeviceTrackState(
            R=jnp.eye(3), t=jnp.asarray([0.0, 0.0, 1.5]),
            R_prev=jnp.eye(3), t_prev=jnp.asarray([0.0, 0.0, 1.4]),
            ok=jnp.asarray(True),
        )
        return m, t, ct, int(k)

    def test_map_move_propagates_to_device_state(self):
        m, t, ct, k = self._fixture()
        ct._record_anchor()
        # background solve moves the keyframe (pure translation in cam space)
        m.kf_t[k] = np.array([0.3, 0.0, 1.0], np.float32)
        ct._apply_anchor_correction()
        np.testing.assert_allclose(
            np.asarray(ct.state.t), [0.3, 0.0, 1.5], atol=1e-6
        )
        # prev pose corrected identically (constant-velocity preserved)
        np.testing.assert_allclose(
            np.asarray(ct.state.t_prev), [0.3, 0.0, 1.4], atol=1e-6
        )

    def test_culled_anchor_falls_back_to_covisible(self):
        m, t, ct, k = self._fixture()
        # second keyframe, covisible with the first
        k2 = m.alloc_keyframe()
        m.kf_R[k2] = np.eye(3)
        m.kf_t[k2] = np.array([0.1, 0.0, 1.0], np.float32)
        m.kf_frame_id[k2] = 1
        mp = m.alloc_points(8)
        m.mp_pos[mp] = np.random.default_rng(0).uniform(-1, 1, (8, 3))
        m.kf_obs[k, :8] = mp
        m.kf_obs[k2, :8] = mp
        ct._record_anchor()
        assert len(ct._anchor) >= 2, "covisible fallback not recorded"
        # cull the primary anchor; move the surviving one
        m.remove_keyframe(k)
        m.kf_t[k2] = np.array([0.1, 0.2, 1.0], np.float32)
        ct._apply_anchor_correction()
        np.testing.assert_allclose(
            np.asarray(ct.state.t), [0.0, 0.2, 1.5], atol=1e-6
        )

    def test_alignment_consume_invalidates_anchor(self):
        """An init similarity fixes state AND map together; the stale
        pre-alignment anchor must not be differenced against the new map
        (double correction)."""
        from orb_slam3_modified_tpu.tracking.imu_frontend import (
            ImuConfig,
            ImuFrontend,
        )

        m, t, ct, k = self._fixture()
        imu = ImuFrontend(ImuConfig())
        t.imu = imu
        ct.imu = imu
        ct._record_anchor()
        assert ct._anchor is not None
        imu.align_log.append((np.eye(3, dtype=np.float32), 2.0))
        ct._consume_alignments()
        assert ct._anchor is None, "anchor must reset on alignment consume"
