"""Keypoint patch extraction + orientation by intensity centroid.

TPU-native replacement for ORBextractor IC_Angle (reference:
src/ORBextractor.cc:76): angle = atan2(m01, m10) over a radius-15 circular
patch.

Patch extraction avoids per-keypoint scalar gathers (pathological on TPU:
vmapped dynamic_slice lowers to element gathers): the image is padded so
patch windows never clamp, then
  1. a row gather pulls (N, S) full rows — an embedding-lookup-shaped,
     memory-bound gather the TPU handles at row granularity, and
  2. column selection runs as a one-hot matmul on the MXU.
The orientation reduce itself is one fused VPU pass over all patches.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

PATCH_R = 15
PATCH = 2 * PATCH_R + 1


@functools.lru_cache(maxsize=4)
def _centroid_weights(patch_r: int = PATCH_R):
    # NOTE: returns numpy (not jnp) — cached device arrays would leak tracers
    # across jit traces.
    ys, xs = np.mgrid[-patch_r : patch_r + 1, -patch_r : patch_r + 1]
    # circular mask matching the reference's per-row u_max HALF_PATCH_SIZE circle
    mask = (xs * xs + ys * ys) <= patch_r * patch_r
    wx = (xs * mask).astype(np.float32)
    wy = (ys * mask).astype(np.float32)
    return wx, wy


def gather_patches(img, ys, xs, half: int):
    """(N, 2h+1, 2h+1) patches centered at integer coords.

    The image is zero-padded by `half`, so windows never clamp and the
    keypoint is always at the exact patch center (border pixels read 0).
    """
    size = 2 * half + 1
    padded = jnp.pad(img, half)
    return _patches_from_padded(padded, ys.astype(jnp.int32), xs.astype(jnp.int32), size)


def _patches_from_padded(padded, y0, x0, size: int):
    """Windows of (size, size) from a pre-padded image; (y0, x0) is the
    window origin in padded coords (= keypoint coords in original image
    coords when the pad equals the window half-size)."""
    ar = jnp.arange(size, dtype=jnp.int32)
    rows = padded[y0[:, None] + ar[None, :]]  # (N, size, Wp) row gather
    wp = padded.shape[1]
    # one-hot column selection on the MXU: onehot[n, w, j] = (w == x0[n]+j)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, wp, 1), 1)
    onehot = (col == (x0[:, None, None] + ar[None, None, :])).astype(padded.dtype)
    return jax.lax.dot_general(
        rows,
        onehot,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )  # (N, size, size)


def ic_angles_from_patches(patches, patch_r: int = PATCH_R):
    """Orientation from pre-gathered square patches.

    patches: (N, S, S) with S >= 2*patch_r+1; the circular moment window is
    the centered (2*patch_r+1)^2 sub-patch."""
    s = patches.shape[-1]
    off = (s - (2 * patch_r + 1)) // 2
    sub = patches[:, off : off + 2 * patch_r + 1, off : off + 2 * patch_r + 1]
    wx_np, wy_np = _centroid_weights(patch_r)
    wx, wy = jnp.asarray(wx_np), jnp.asarray(wy_np)
    m10 = jnp.sum(sub * wx, axis=(-2, -1))
    m01 = jnp.sum(sub * wy, axis=(-2, -1))
    return jnp.arctan2(m01, m10)


def ic_angles(img, ys, xs):
    """Orientation (radians) for keypoints at integer coords. img: (H, W)."""
    patches = gather_patches(img, ys, xs, PATCH_R)  # (N, 31, 31)
    return ic_angles_from_patches(patches)
