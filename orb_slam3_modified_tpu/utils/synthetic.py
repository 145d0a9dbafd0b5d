"""Synthetic scene/trajectory generation for tests and benchmarks.

The reference verifies end-to-end on EuRoC datasets (SURVEY.md §4); this
module provides the dataset-free analog: known ground-truth geometry with
controllable noise, so unit/integration tests can assert exact error bounds.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np

from ..lie.se3 import SE3


class SyntheticScene(NamedTuple):
    points: np.ndarray  # (P, 3) world points
    T_cw: object  # SE3 batched (F,) camera-from-world poses
    uv: np.ndarray  # (F, P, 2) pixel observations
    visible: np.ndarray  # (F, P) bool
    cam: object  # Camera


def orbit_trajectory(n_frames, radius=4.0, height=0.4, sweep=np.pi / 2):
    """Cameras on a circular arc looking at the origin. Returns SE3 (F,)."""
    import jax.numpy as jnp

    angles = np.linspace(0.0, sweep, n_frames)
    Rs, ts = [], []
    for a in angles:
        c = np.array([radius * np.sin(a), height * np.sin(3 * a), -radius * np.cos(a)])
        # camera z-axis points from c to origin
        fwd = -c / np.linalg.norm(c)
        up = np.array([0.0, -1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        R_wc = np.stack([right, up2, fwd], axis=1)  # columns = camera axes in world
        R_cw = R_wc.T
        t_cw = -R_cw @ c
        Rs.append(R_cw)
        ts.append(t_cw)
    return SE3(jnp.asarray(np.stack(Rs), dtype=jnp.float32), jnp.asarray(np.stack(ts), dtype=jnp.float32))


def make_scene(
    n_points=512,
    n_frames=8,
    noise_px=0.5,
    seed=0,
    cam=None,
    radius=4.0,
    sweep=np.pi / 2,
    point_spread=2.0,
):
    """Random point cloud near the origin observed from an orbit arc."""
    import jax.numpy as jnp

    from ..cameras import Camera, in_image, project

    rng = np.random.default_rng(seed)
    if cam is None:
        cam = Camera.pinhole(458.654, 457.296, 367.215, 248.375, width=752, height=480)
    pts = rng.uniform(-point_spread, point_spread, size=(n_points, 3)).astype(np.float32)
    T_cw = orbit_trajectory(n_frames, radius=radius, sweep=sweep)
    # (F, 1, 3, 3) @ (1, P, 3): explicit broadcast for the einsum batch dims
    pc = SE3(T_cw.R[:, None], T_cw.t[:, None]).apply(jnp.asarray(pts)[None])
    uv = project(cam, pc)
    vis = np.asarray(in_image(cam, uv, margin=1.0)) & (np.asarray(pc[..., 2]) > 0.2)
    uv_noisy = np.asarray(uv) + rng.normal(0, noise_px, size=uv.shape).astype(np.float32)
    return SyntheticScene(pts, T_cw, uv_noisy.astype(np.float32), vis, cam)
