"""Chunked visual-inertial frontend: unit gates for the device-side IMU
plumbing (tracking/vi_fused.py). The e2e CLI gates live in test_e2e_cli."""
import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_modified_tpu.imu.preintegration import ImuBias, integrate
from orb_slam3_modified_tpu.tracking.vi_fused import (
    integrate_chunk,
    merge_np,
    pre_slice_np,
)


class TestChunkedPreintegration:
    def test_chunked_merge_matches_full_integration(self):
        """integrate_chunk + host merge_np over 3 padded frame batches must
        reproduce the single full-batch integration exactly (the keyframe
        chain is built from these merges — any drift here corrupts every
        inertial solve downstream)."""
        rng = np.random.default_rng(0)
        N = 30
        acc = rng.normal(0, 2, (N, 3)).astype(np.float32) + [0, 0, 9.81]
        gyr = rng.normal(0, 0.5, (N, 3)).astype(np.float32)
        dts = np.full(N, 0.005, np.float32)
        bias = ImuBias(
            jnp.asarray([0.01, -0.02, 0.005]), jnp.asarray([0.05, 0.0, -0.03])
        )
        full = integrate(
            jnp.asarray(acc), jnp.asarray(gyr), jnp.asarray(dts),
            jnp.ones(N, bool), bias, 1.7e-4, 2e-3, 1.9e-5, 3e-3, 200.0,
        )
        S = 16
        a3 = np.zeros((3, S, 3), np.float32)
        g3 = np.zeros((3, S, 3), np.float32)
        d3 = np.zeros((3, S), np.float32)
        v3 = np.zeros((3, S), bool)
        for f in range(3):
            a3[f, :10] = acc[f * 10:(f + 1) * 10]
            g3[f, :10] = gyr[f * 10:(f + 1) * 10]
            d3[f, :10] = dts[f * 10:(f + 1) * 10]
            v3[f, :10] = True
        pres = integrate_chunk(
            jnp.asarray(a3), jnp.asarray(g3), jnp.asarray(d3),
            jnp.asarray(v3), bias, 1.7e-4, 2e-3, 1.9e-5, 3e-3, 200.0,
        )
        pres = jax.tree_util.tree_map(np.asarray, pres)
        accum = None
        for f in range(3):
            p = pre_slice_np(pres, f)
            accum = p if accum is None else merge_np(accum, p)
        for name in ("dT", "dR", "dV", "dP", "JRg", "JVg", "JVa", "JPg", "JPa"):
            a = np.asarray(getattr(full, name))
            b = np.asarray(getattr(accum, name))
            np.testing.assert_allclose(
                b, a, atol=5e-4 * max(1.0, float(np.abs(a).max())),
                err_msg=f"{name} diverges between chunked and full integration",
            )

    def test_vi_step_tracks_and_carries_state(self):
        """One VI device step on synthetic geometry: accepts the frame,
        estimates a pose near truth, and carries velocity/bias/prior."""
        from orb_slam3_modified_tpu.cameras import Camera, project
        from orb_slam3_modified_tpu.tracking.fused import CACHE_CAP, MapCache
        from orb_slam3_modified_tpu.tracking.imu_frontend import ImuConfig
        from orb_slam3_modified_tpu.tracking.vi_fused import (
            VITrackState,
            _FIXED_INFO,
            make_vi_step_body,
        )
        from orb_slam3_modified_tpu.utils.synthetic_features import (
            SyntheticFeatureWorld,
        )

        cam = Camera.pinhole(330.0, 330.0, 256.0, 192.0, width=512, height=384)
        world = SyntheticFeatureWorld(
            n_points=3000, feat_cap=512, noise_px=0.3, seed=3
        )
        rng = np.random.default_rng(3)
        pts = rng.uniform(-4, 4, (3000, 3)).astype(np.float32)
        pts[:, 2] = rng.uniform(2.0, 6.0, 3000)
        world.points = pts
        # camera at origin moving +x at 1 m/s, z-up world, gravity -z;
        # camera looks +z (identity rig, body == camera)
        from orb_slam3_modified_tpu.lie.se3 import SE3

        dt, n_s = 0.05, 10
        v_true = np.array([1.0, 0.0, 0.0], np.float32)
        p0 = np.zeros(3, np.float32)
        p1 = p0 + v_true * dt
        T0 = SE3(jnp.eye(3), jnp.asarray(-p0))
        T1 = SE3(jnp.eye(3), jnp.asarray(-p1))
        feats, _ = world.observe(cam, T1, max_feats=400)
        # cache from ground truth points
        n = min(3000, CACHE_CAP)
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
        state = VITrackState(
            R=jnp.eye(3), t=jnp.asarray(-p0),
            v_w=jnp.asarray(v_true),
            bg=jnp.zeros(3), ba=jnp.zeros(3),
            H_prior=jnp.asarray(_FIXED_INFO), ok=jnp.asarray(True),
        )
        # ideal IMU: zero angular rate, specific force = -g
        acc = np.tile([0.0, 0.0, 9.81], (16, 1)).astype(np.float32)
        gyro = np.zeros((16, 3), np.float32)
        dts = np.full(16, dt / n_s, np.float32)
        iv = np.arange(16) < n_s
        body = make_vi_step_body(
            cam, (1.0 / 1.2 ** (2 * np.arange(8))).astype(np.float32),
            feats.capacity, ImuConfig(),
        )
        step = jax.jit(body)
        new_state, out = step(
            state, cache, feats.uv, feats.desc, feats.level, feats.valid,
            jnp.asarray(acc), jnp.asarray(gyro), jnp.asarray(dts),
            jnp.asarray(iv),
        )
        assert int(out.n_inliers) >= 50, f"VI step rejected: {int(out.n_inliers)}"
        t_est = np.asarray(out.t)
        np.testing.assert_allclose(t_est, -p1, atol=0.02)
        v_est = np.asarray(out.v_w)
        np.testing.assert_allclose(v_est, v_true, atol=0.1)
        # the carried prior is the capped Schur marginal, not the stiff seed
        H = np.asarray(new_state.H_prior)
        assert np.isfinite(H).all()
        assert np.abs(H - np.diag(np.diag(H))).max() > 0, "prior not carried"
        # the frame's preintegration is exposed for the host keyframe chain
        assert abs(float(out.pre.dT) - dt) < 1e-6
