"""End-to-end monocular VO/SLAM on a synthetic feature stream.

The dataset-free analog of running mono_euroc on MH01 and checking ATE
(reference test strategy, SURVEY.md §4): orbit trajectory, ideal extractor,
full tracker + local mapper, scale-aligned ATE bound.
"""
import numpy as np
import pytest

from orb_slam3_modified_tpu.cameras import Camera
from orb_slam3_modified_tpu.eval.ate import ate_rmse
from orb_slam3_modified_tpu.mapping.local_mapper import LocalMapper, LocalMapperConfig
from orb_slam3_modified_tpu.slam_map.map_state import MapState
from orb_slam3_modified_tpu.tracking.tracker import OK, Tracker, TrackerConfig
from orb_slam3_modified_tpu.utils.synthetic import orbit_trajectory
from orb_slam3_modified_tpu.utils.synthetic_features import SyntheticFeatureWorld
from orb_slam3_modified_tpu.lie.se3 import SE3

CAM = Camera.pinhole(458.654, 457.296, 367.215, 248.375, width=752, height=480)


def run_sequence(n_frames=40, sweep=np.pi / 3, n_points=4000, noise_px=0.4, seed=0):
    import jax.numpy as jnp

    world = SyntheticFeatureWorld(
        n_points=n_points, spread=5.0, seed=seed, feat_cap=768, noise_px=noise_px
    )
    T_all = orbit_trajectory(n_frames, radius=4.0, sweep=sweep)
    slam_map = MapState.create(max_kf=128, max_mp=16384, feat_cap=768)
    tcfg = TrackerConfig(cam=CAM)
    tracker = Tracker(tcfg, slam_map)
    mapper = LocalMapper(LocalMapperConfig(), tcfg, slam_map)
    tracker.on_keyframe = mapper.on_keyframe

    est, gt = [], []
    for i in range(n_frames):
        T_cw = SE3(T_all.R[i], T_all.t[i])
        feats, _ = world.observe(CAM, T_cw, max_feats=600)
        T = tracker.track(feats, ts=i * 0.05)
        if T is not None:
            est.append((i, np.asarray(T)))
            gt.append(np.asarray(SE3(T_all.R[i], T_all.t[i]).inverse().t))
    return tracker, slam_map, est, np.array(gt)


@pytest.fixture(scope="module")
def seq():
    return run_sequence()


class TestEndToEndMono:
    def test_tracks_full_sequence(self, seq):
        tracker, slam_map, est, gt = seq
        # initialization consumes the first 1-2 frames
        assert len(est) >= 37, f"tracked only {len(est)} frames"
        assert tracker.state == OK

    def test_ate_bound(self, seq):
        tracker, slam_map, est, gt = seq
        pos = np.array([np.linalg.inv(T)[:3, 3] for _, T in est])
        rmse, scale = ate_rmse(pos, gt)
        # trajectory spans ~4m radius arc; mono scale is free
        assert rmse < 0.02, f"ATE {rmse:.4f} m"

    def test_map_grows(self, seq):
        tracker, slam_map, est, gt = seq
        assert slam_map.n_keyframes() >= 3
        assert slam_map.n_points() > 300

    def test_keyframe_observations_consistent(self, seq):
        tracker, slam_map, est, gt = seq
        from orb_slam3_modified_tpu.slam_map.map_state import NO_POINT

        for k in slam_map.keyframe_indices():
            obs = slam_map.kf_obs[k]
            mp = obs[obs != NO_POINT]
            assert slam_map.mp_valid[mp].all(), "observation of dead point"


if __name__ == "__main__":
    pytest.main([__file__, "-v", "-x"])
