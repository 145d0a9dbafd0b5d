"""End-to-end monocular tracking with a Kannala-Brandt fisheye camera.

The whole pipeline is camera-model-generic (unit-plane/bearing formulations
everywhere, reference: GeometricCamera virtualization); this proves it on
the TUM-VI-style KB8 calibration.
"""
import numpy as np
import pytest

from orb_slam3_modified_tpu.cameras import Camera
from orb_slam3_modified_tpu.eval.ate import ate_rmse
from orb_slam3_modified_tpu.lie.se3 import SE3
from orb_slam3_modified_tpu.mapping.local_mapper import LocalMapper, LocalMapperConfig
from orb_slam3_modified_tpu.slam_map.map_state import MapState
from orb_slam3_modified_tpu.tracking.tracker import OK, Tracker, TrackerConfig
from orb_slam3_modified_tpu.utils.synthetic import orbit_trajectory
from orb_slam3_modified_tpu.utils.synthetic_features import SyntheticFeatureWorld

KB8 = Camera.kb8(
    190.978, 190.973, 254.932, 256.897,
    0.00348238, 0.000715034, -0.00205323, 0.000202936,
    width=512, height=512,
)


@pytest.fixture(scope="module")
def fisheye_run():
    n_frames = 30
    world = SyntheticFeatureWorld(
        n_points=6000, spread=5.0, seed=2, feat_cap=768, noise_px=0.4
    )
    T_all = orbit_trajectory(n_frames, radius=4.0, sweep=np.pi / 4)
    m = MapState.create(max_kf=128, max_mp=16384, feat_cap=768)
    tcfg = TrackerConfig(cam=KB8)
    tracker = Tracker(tcfg, m)
    mapper = LocalMapper(LocalMapperConfig(), tcfg, m)
    tracker.on_keyframe = mapper.on_keyframe
    gt_of = {}
    for i in range(n_frames):
        T_cw = SE3(T_all.R[i], T_all.t[i])
        feats, _ = world.observe(KB8, T_cw, max_feats=600)
        tracker.track(feats, ts=i * 0.05)
        gt_of[i] = np.asarray(T_cw.inverse().t)
    est, gt = [], []
    for ts, fid, T in tracker.absolute_trajectory():
        est.append(np.linalg.inv(T)[:3, 3])
        gt.append(gt_of[fid])
    return tracker, m, np.array(est), np.array(gt)


class TestFisheye:
    def test_tracks(self, fisheye_run):
        tracker, m, est, gt = fisheye_run
        assert len(est) >= 25, f"tracked {len(est)}"
        assert tracker.state == OK

    def test_ate(self, fisheye_run):
        tracker, m, est, gt = fisheye_run
        rmse, _ = ate_rmse(est, gt)
        assert rmse < 0.03, f"fisheye ATE {rmse}"
