"""Rotated (steered) BRIEF-256 descriptors.

TPU-native replacement for computeOrbDescriptor (reference:
src/ORBextractor.cc:107): 256 intensity comparisons on a blurred patch,
sampled along the keypoint orientation.

The reference uses the learned 256-pair pattern from the ORB paper. This
framework is not descriptor-binary-compatible with OpenCV (it ships its own
vocabulary tooling — see bow/), so we use the classic BRIEF construction:
pairs drawn from an isotropic Gaussian (sigma = patch/5, Calonder et al.),
fixed by seed. Pattern rotation is applied as a batched 2x2 rotation of the
(256, 2, 2) coordinate table, then bilinear sampling from the gathered
(N, 37, 37) patches; the 256 bits pack into 8 uint32 lanes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .orientation import gather_patches

N_BITS = 256
N_WORDS = 8  # uint32 words per descriptor
PATTERN_R = 13  # pattern coordinate range
GATHER_R = 18  # patch radius gathered (covers rotation of +-13 * sqrt2)


@functools.lru_cache(maxsize=1)
def _pattern():
    # returns numpy — cached device arrays would leak tracers across traces
    rng = np.random.default_rng(0xB51EF)
    # Gaussian BRIEF pairs, sigma = patch/5 (Calonder 2010), clipped
    pts = rng.normal(0.0, PATTERN_R / 2.0, size=(N_BITS, 2, 2))
    pts = np.clip(pts, -PATTERN_R, PATTERN_R)
    return pts.astype(np.float32)  # (256, 2 endpoints, xy)


def _bilinear(patches, ys, xs):
    """Sample patches (N, S, S) at float coords (N, K). Coords are patch-relative
    (0..S-1). Returns (N, K)."""
    s = patches.shape[-1]
    y0 = jnp.clip(jnp.floor(ys), 0, s - 2)
    x0 = jnp.clip(jnp.floor(xs), 0, s - 2)
    wy = ys - y0
    wx = xs - x0
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)

    def gather(p, yy, xx):
        return p[yy, xx]

    g = jax.vmap(jax.vmap(gather, in_axes=(None, 0, 0)), in_axes=(0, 0, 0))
    v00 = g(patches, y0, x0)
    v01 = g(patches, y0, x0 + 1)
    v10 = g(patches, y0 + 1, x0)
    v11 = g(patches, y0 + 1, x0 + 1)
    return (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )


def brief_descriptors(img_blurred, ys, xs, angles):
    """Compute packed descriptors (N, 8) uint32.

    img_blurred: (H, W) float32 (Gaussian-smoothed level image).
    ys, xs: (N,) integer keypoint coords in this level. angles: (N,) radians.
    """
    pat = jnp.asarray(_pattern())  # (256, 2, 2) in (x, y) order
    ca, sa = jnp.cos(angles), jnp.sin(angles)  # (N,)
    # rotate pattern per keypoint: (N, 256, 2, 2)
    px = pat[None, ..., 0]
    py = pat[None, ..., 1]
    rx = ca[:, None, None] * px - sa[:, None, None] * py
    ry = sa[:, None, None] * px + ca[:, None, None] * py
    patches = gather_patches(img_blurred, ys, xs, GATHER_R)  # (N, 37, 37)
    # account for clamping at borders: recompute actual patch origin
    h, w = img_blurred.shape
    size = 2 * GATHER_R + 1
    y0 = jnp.clip(ys - GATHER_R, 0, h - size)
    x0 = jnp.clip(xs - GATHER_R, 0, w - size)
    cy = (ys - y0).astype(jnp.float32)[:, None]
    cx = (xs - x0).astype(jnp.float32)[:, None]
    n = ys.shape[0]
    sy = ry.reshape(n, -1) + cy  # (N, 512)
    sx = rx.reshape(n, -1) + cx
    vals = _bilinear(patches, sy, sx).reshape(n, N_BITS, 2)
    bits = (vals[..., 0] < vals[..., 1]).astype(jnp.uint32)  # (N, 256)
    # pack into 8 uint32
    bits = bits.reshape(n, N_WORDS, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(bits << shifts[None, None, :], axis=-1, dtype=jnp.uint32)
