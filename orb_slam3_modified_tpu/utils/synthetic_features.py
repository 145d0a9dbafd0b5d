"""Synthetic feature streams: an ideal ORB extractor over a known scene.

Generates per-frame `Features` from ground-truth geometry — world points
carry fixed random descriptors, observations get pixel noise and descriptor
bit flips — so the full tracking/mapping/BA stack can be integration-tested
with exact ATE bounds and no image data (SURVEY.md §4: the reference's only
"tests" are EuRoC runs; this is the dataset-free equivalent).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..features.extractor import Features


class SyntheticFeatureWorld:
    def __init__(
        self,
        n_points=3000,
        spread=6.0,
        seed=0,
        feat_cap=1024,
        noise_px=0.4,
        desc_flips=4,
        n_levels=8,
        layout="box",
    ):
        rng = np.random.default_rng(seed)
        self.rng = rng
        if layout == "ring":
            # annulus wall: revisit tests need covisibility to decay around
            # the loop, so keep the center empty
            ang = rng.uniform(0, 2 * np.pi, n_points)
            rad = rng.uniform(spread * 0.5, spread, n_points)
            z = rng.uniform(-spread * 0.4, spread * 0.4, n_points)
            self.points = np.stack(
                [rad * np.cos(ang), z, rad * np.sin(ang)], axis=1
            ).astype(np.float32)
        else:
            self.points = rng.uniform(-spread, spread, (n_points, 3)).astype(
                np.float32
            )
        self.desc = rng.integers(0, 2**32, (n_points, 8), dtype=np.uint32)
        self.feat_cap = feat_cap
        self.noise_px = noise_px
        self.desc_flips = desc_flips
        self.n_levels = n_levels
        self.max_depth = 50.0  # visibility range cap (meters)

    def observe(self, cam, T_cw, max_feats=None):
        """Render Features for camera pose T_cw (numpy-backed SE3)."""
        from ..cameras import project

        cap = self.feat_cap
        R = np.asarray(T_cw.R)
        t = np.asarray(T_cw.t)
        pc = self.points @ R.T + t
        uv = np.asarray(project(cam, jnp.asarray(pc)))
        vis = (
            (pc[:, 2] > 0.3)
            & (pc[:, 2] < self.max_depth)
            & (uv[:, 0] >= 10) & (uv[:, 0] < cam.width - 10)
            & (uv[:, 1] >= 10) & (uv[:, 1] < cam.height - 10)
        )
        idx = np.flatnonzero(vis)
        # deterministic subsample: a real detector re-finds the same corners
        # across frames, so selection must be stable, not random — otherwise
        # consecutive frames share only |S|^2/|visible| features
        n = min(len(idx), max_feats or cap, cap)
        idx = idx[:n]
        uv_o = uv[idx] + self.rng.normal(0, self.noise_px, (n, 2))
        desc = self.desc[idx].copy()
        for _ in range(self.desc_flips):
            w = self.rng.integers(0, 8, n)
            b = self.rng.integers(0, 32, n)
            desc[np.arange(n), w] ^= (np.uint32(1) << b.astype(np.uint32))
        feats = Features(
            uv=jnp.asarray(_pad(uv_o.astype(np.float32), cap)),
            desc=jnp.asarray(_pad(desc, cap)),
            angle=jnp.zeros(cap, jnp.float32),
            level=jnp.zeros(cap, jnp.int32),
            response=jnp.asarray(_pad(np.ones(n, np.float32), cap)),
            valid=jnp.asarray(_pad(np.ones(n, bool), cap)),
        )
        return feats, idx  # idx: ground-truth point id per slot (first n)


def _pad(a, n):
    if len(a) >= n:
        return a[:n]
    return np.concatenate([a, np.zeros((n - len(a), *a.shape[1:]), a.dtype)])
