"""Fused device-resident tracking step: device-side recovery unit gate.

The chunked frontend (tracking/chunked.py + tests/test_chunked.py, e2e CLI
gates) is the production driver of make_step_body; this file unit-tests the
step's in-device recovery path in isolation.
"""
import numpy as np

from orb_slam3_modified_tpu.cameras import Camera
from orb_slam3_modified_tpu.lie.se3 import SE3
from orb_slam3_modified_tpu.tracking.tracker import TrackerConfig
from orb_slam3_modified_tpu.utils.synthetic import orbit_trajectory
from orb_slam3_modified_tpu.utils.synthetic_features import SyntheticFeatureWorld

CAM = Camera.pinhole(458.654, 457.296, 367.215, 248.375, width=752, height=480)


class TestDeviceRecovery:
    """The fused step's brute-match recovery pass (reference analog:
    TrackReferenceKeyFrame fallback, src/Tracking.cc:1928 region) must
    re-acquire the pose in-device when the motion-model prediction is
    badly wrong — no host slow-path replay."""

    def _make_cache_and_state(self, world, T_cw, T_bad_vel):
        import jax.numpy as jnp

        from orb_slam3_modified_tpu.tracking.fused import (
            CACHE_CAP,
            DeviceTrackState,
            MapCache,
        )

        n = min(len(world.points), CACHE_CAP)
        pos = np.zeros((CACHE_CAP, 3), np.float32)
        desc = np.zeros((CACHE_CAP, 8), np.uint32)
        valid = np.zeros(CACHE_CAP, bool)
        ids = np.full(CACHE_CAP, -1, np.int32)
        pos[:n] = world.points[:n]
        desc[:n] = world.desc[:n]
        valid[:n] = True
        ids[:n] = np.arange(n)
        cache = MapCache(
            jnp.asarray(pos), jnp.asarray(desc), jnp.asarray(valid),
            jnp.asarray(ids),
        )
        # state pose = true previous pose, but T_prev encodes a huge bogus
        # velocity so the constant-velocity prediction lands far off
        T_prev = T_bad_vel.inverse() @ T_cw
        state = DeviceTrackState(
            R=jnp.asarray(np.asarray(T_cw.R, np.float32)),
            t=jnp.asarray(np.asarray(T_cw.t, np.float32)),
            R_prev=jnp.asarray(np.asarray(T_prev.R, np.float32)),
            t_prev=jnp.asarray(np.asarray(T_prev.t, np.float32)),
            ok=jnp.asarray(True),
        )
        return cache, state

    def test_recovers_from_broken_motion_model(self):
        import jax.numpy as jnp

        from orb_slam3_modified_tpu.lie import se3
        from orb_slam3_modified_tpu.tracking.fused import make_track_step

        world = SyntheticFeatureWorld(
            n_points=3000, spread=5.0, seed=4, feat_cap=768, noise_px=0.3
        )
        T_all = orbit_trajectory(8, radius=4.0, sweep=np.pi / 8)
        T_last = SE3(T_all.R[5], T_all.t[5])
        T_cur = SE3(T_all.R[6], T_all.t[6])
        # bogus velocity: 40 deg rotation + 1.5 m jump per frame
        xi = np.array([0.5, 0.3, -0.4, 0.7, 0.0, 0.2], np.float32)
        T_exp = se3.exp(jnp.asarray(xi))
        T_bad_vel = SE3(np.asarray(T_exp.R), np.asarray(T_exp.t))
        cache, state = self._make_cache_and_state(world, T_last, T_bad_vel)
        feats, _ = world.observe(CAM, T_cur, max_feats=600)
        step = make_track_step(
            CAM, TrackerConfig(cam=CAM).inv_level_sigma2(), feats.capacity
        )
        new_state, out = step(
            state, cache, feats.uv, feats.desc, feats.level, feats.valid
        )
        n_inl = int(out.n_inliers)
        assert n_inl >= 50, f"recovery failed: {n_inl} inliers"
        t_est = np.asarray(out.t)
        t_gt = np.asarray(T_cur.t)
        assert np.linalg.norm(t_est - t_gt) < 0.05, (
            f"recovered pose off: {t_est} vs {t_gt}"
        )
        # velocity history reset after recovery: prediction for the next
        # frame starts from the recovered pose, not the bogus velocity
        np.testing.assert_allclose(
            np.asarray(new_state.R_prev), np.asarray(new_state.R), atol=1e-6
        )
