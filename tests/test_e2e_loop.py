"""End-to-end loop closure on a full-circle synthetic sequence."""
import numpy as np
import pytest

from orb_slam3_modified_tpu.bow.vocabulary import build_vocabulary
from orb_slam3_modified_tpu.cameras import Camera
from orb_slam3_modified_tpu.eval.ate import ate_rmse
from orb_slam3_modified_tpu.lie.se3 import SE3
from orb_slam3_modified_tpu.loop.loop_closer import LoopCloser, LoopCloserConfig
from orb_slam3_modified_tpu.mapping.local_mapper import LocalMapper, LocalMapperConfig
from orb_slam3_modified_tpu.slam_map.map_state import MapState
from orb_slam3_modified_tpu.tracking.tracker import Tracker, TrackerConfig
from orb_slam3_modified_tpu.utils.synthetic import orbit_trajectory
from orb_slam3_modified_tpu.utils.synthetic_features import SyntheticFeatureWorld

CAM = Camera.pinhole(458.654, 457.296, 367.215, 248.375, width=752, height=480)


@pytest.fixture(scope="module")
def loop_run():
    n_frames = 90
    # ring layout: covisibility decays around the loop so the revisit is a
    # genuine place-recognition event, not continuous covisibility
    world = SyntheticFeatureWorld(
        n_points=12000, spread=10.0, seed=7, feat_cap=768, noise_px=0.5,
        layout="ring",
    )
    voc = build_vocabulary(world.desc[:4000], k=8, depth=3, seed=1)
    T_all = orbit_trajectory(n_frames, radius=4.0, sweep=2.05 * np.pi)
    slam_map = MapState.create(max_kf=128, max_mp=32768, feat_cap=768)
    tcfg = TrackerConfig(cam=CAM)
    tracker = Tracker(tcfg, slam_map)
    mapper = LocalMapper(LocalMapperConfig(), tcfg, slam_map)
    closer = LoopCloser(LoopCloserConfig(), tcfg, voc, slam_map)

    def on_kf(k):
        mapper.on_keyframe(k)
        closer.on_keyframe(k)

    tracker.on_keyframe = on_kf
    gt_all = {}
    n_tracked = 0
    for i in range(n_frames):
        T_cw = SE3(T_all.R[i], T_all.t[i])
        feats, _ = world.observe(CAM, T_cw, max_feats=600)
        T = tracker.track(feats, ts=i * 0.05)
        gt_all[i] = np.asarray(T_cw.inverse().t)
        if T is not None:
            n_tracked += 1
    # corrected trajectory (relative-pose replay against final KF poses)
    est, gt = [], []
    for ts, fid, T in tracker.absolute_trajectory():
        est.append((fid, T))
        gt.append(gt_all[fid])
    assert len(est) == n_tracked
    return tracker, slam_map, closer, est, np.array(gt)


class TestLoopClosure:
    def test_survives_full_circle(self, loop_run):
        tracker, slam_map, closer, est, gt = loop_run
        assert len(est) >= 80, f"tracked {len(est)}"

    def test_loop_detected(self, loop_run):
        tracker, slam_map, closer, est, gt = loop_run
        assert closer.n_loops_closed >= 1, "no loop closed on full circle"

    def test_ate_after_loop(self, loop_run):
        tracker, slam_map, closer, est, gt = loop_run
        pos = np.array([np.linalg.inv(T)[:3, 3] for _, T in est])
        rmse, _ = ate_rmse(pos, gt)
        # current envelope: correction keeps ATE within the VO drift bound
        # (~0.5% of the 25 m circuit). Round-2 target: < 0.05 with a
        # converged essential-graph + GBA interplay.
        assert rmse < 0.15, f"ATE {rmse}"
