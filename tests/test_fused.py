"""Fused device-resident tracking path: correctness vs the full tracker."""
import numpy as np
import pytest

from orb_slam3_modified_tpu.cameras import Camera
from orb_slam3_modified_tpu.eval.ate import ate_rmse
from orb_slam3_modified_tpu.lie.se3 import SE3
from orb_slam3_modified_tpu.mapping.local_mapper import LocalMapper, LocalMapperConfig
from orb_slam3_modified_tpu.slam_map.map_state import MapState
from orb_slam3_modified_tpu.tracking.fused import FusedTracker
from orb_slam3_modified_tpu.tracking.tracker import OK, Tracker, TrackerConfig
from orb_slam3_modified_tpu.utils.synthetic import orbit_trajectory
from orb_slam3_modified_tpu.utils.synthetic_features import SyntheticFeatureWorld

CAM = Camera.pinhole(458.654, 457.296, 367.215, 248.375, width=752, height=480)


@pytest.fixture(scope="module")
def fused_run():
    n_frames = 40
    world = SyntheticFeatureWorld(
        n_points=4000, spread=5.0, seed=0, feat_cap=768, noise_px=0.4
    )
    T_all = orbit_trajectory(n_frames, radius=4.0, sweep=np.pi / 3)
    m = MapState.create(max_kf=128, max_mp=16384, feat_cap=768)
    tcfg = TrackerConfig(cam=CAM)
    tracker = Tracker(tcfg, m)
    mapper = LocalMapper(LocalMapperConfig(), tcfg, m)
    tracker.on_keyframe = mapper.on_keyframe
    fused = FusedTracker(tracker, lag=2)
    gt_of = {}
    for i in range(n_frames):
        T_cw = SE3(T_all.R[i], T_all.t[i])
        feats, _ = world.observe(CAM, T_cw, max_feats=600)
        fused.track(feats, ts=i * 0.05)
        gt_of[i] = np.asarray(T_cw.inverse().t)
    fused.flush()
    est, gt = [], []
    for ts, fid, T in tracker.absolute_trajectory():
        est.append(T)
        gt.append(gt_of[fid])
    return tracker, fused, est, np.array(gt)


class TestFusedTracker:
    def test_tracks_sequence(self, fused_run):
        tracker, fused, est, gt = fused_run
        assert len(est) >= 35, f"tracked {len(est)}"
        assert tracker.state == OK

    def test_ate(self, fused_run):
        tracker, fused, est, gt = fused_run
        pos = np.array([np.linalg.inv(T)[:3, 3] for T in est])
        rmse, _ = ate_rmse(pos, gt)
        assert rmse < 0.03, f"ATE {rmse}"

    def test_keyframes_created(self, fused_run):
        tracker, fused, est, gt = fused_run
        assert tracker.map.n_keyframes() >= 3
