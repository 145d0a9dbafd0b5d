"""Keypoint orientation by intensity centroid.

TPU-native replacement for ORBextractor IC_Angle (reference:
src/ORBextractor.cc:76): angle = atan2(m01, m10) over a radius-15 circular
patch. Instead of per-keypoint scalar loops we gather (N, 31, 31) patches in
one dynamic-slice batch and reduce with precomputed x/y/circular-mask
weights — one fused VPU pass for all keypoints.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

PATCH_R = 15
PATCH = 2 * PATCH_R + 1


@functools.lru_cache(maxsize=1)
def _centroid_weights():
    # NOTE: returns numpy (not jnp) — cached device arrays would leak tracers
    # across jit traces.
    ys, xs = np.mgrid[-PATCH_R : PATCH_R + 1, -PATCH_R : PATCH_R + 1]
    # circular mask matching the reference's per-row u_max HALF_PATCH_SIZE circle
    mask = (xs * xs + ys * ys) <= PATCH_R * PATCH_R
    wx = (xs * mask).astype(np.float32)
    wy = (ys * mask).astype(np.float32)
    return wx, wy


def gather_patches(img, ys, xs, half: int):
    """(N, 2h+1, 2h+1) patches centered at integer coords (clamped to valid)."""
    h, w = img.shape
    size = 2 * half + 1
    y0 = jnp.clip(ys - half, 0, h - size)
    x0 = jnp.clip(xs - half, 0, w - size)

    def one(y, x):
        return jax.lax.dynamic_slice(img, (y, x), (size, size))

    return jax.vmap(one)(y0.astype(jnp.int32), x0.astype(jnp.int32))


def ic_angles(img, ys, xs):
    """Orientation (radians) for keypoints at integer coords. img: (H, W)."""
    wx_np, wy_np = _centroid_weights()
    wx, wy = jnp.asarray(wx_np), jnp.asarray(wy_np)
    patches = gather_patches(img, ys, xs, PATCH_R)  # (N, 31, 31)
    m10 = jnp.sum(patches * wx, axis=(-2, -1))
    m01 = jnp.sum(patches * wy, axis=(-2, -1))
    return jnp.arctan2(m01, m10)
