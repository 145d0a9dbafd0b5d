"""Rotated (steered) BRIEF-256 descriptors.

TPU-native replacement for computeOrbDescriptor (reference:
src/ORBextractor.cc:107): 256 intensity comparisons on a blurred patch,
sampled along the keypoint orientation.

The reference uses the learned 256-pair pattern from the ORB paper. This
framework is not descriptor-binary-compatible with OpenCV (it ships its own
vocabulary tooling — see bow/), so we use the classic BRIEF construction:
pairs drawn from an isotropic Gaussian (sigma = patch/5, Calonder et al.),
fixed by seed.

Sampling is TPU-first: instead of per-sample scalar gathers (pathological
on TPU), bilinear interpolation is expressed SEPARABLY as two dense
contractions with hat-function weights:

    val[n, s] = sum_r sum_c  hat(sy[n,s]-r) * hat(sx[n,s]-c) * P[n, r, c]

i.e. a batched (512, S) x (S, S) matmul on the MXU followed by a fused VPU
reduce. No gather appears anywhere in the hot path; the rotation stays
continuous (no angle quantization).
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
GATHER_R = 19  # patch radius gathered (covers rotation of +-13 * sqrt2 = 18.4)
PATCH = 2 * GATHER_R + 1  # 39


@functools.lru_cache(maxsize=1)
def _pattern():
    # returns numpy — cached device arrays would leak tracers across traces
    rng = np.random.default_rng(0xB51EF)
    # Gaussian BRIEF pairs, sigma = patch/5 (Calonder 2010), clipped
    pts = rng.normal(0.0, PATTERN_R / 2.0, size=(N_BITS, 2, 2))
    pts = np.clip(pts, -PATTERN_R, PATTERN_R)
    return pts.astype(np.float32)  # (256, 2 endpoints, xy)


def _sample_separable(patches, sy, sx):
    """Bilinear-sample patches (N, S, S) at float coords (N, K), coords in
    patch units (0..S-1, clipped). Returns (N, K) float32.

    Separable hat-weight contraction: wy (N, K, S) @ patches (N, S, S) on
    the MXU, then an elementwise wx reduce on the VPU."""
    s = patches.shape[-1]
    ar = jnp.arange(s, dtype=jnp.float32)
    sy = jnp.clip(sy, 0.0, s - 1.0)
    sx = jnp.clip(sx, 0.0, s - 1.0)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(sy[..., None] - ar))  # (N, K, S)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(sx[..., None] - ar))
    t = jax.lax.dot_general(
        wy,
        patches,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )  # (N, K, S)
    return jnp.sum(t * wx, axis=-1)


def brief_from_patches(patches, angles):
    """Packed descriptors (N, 8) uint32 from pre-gathered blurred patches.

    patches: (N, PATCH, PATCH) float32, keypoint at the exact center.
    angles: (N,) radians."""
    pat = jnp.asarray(_pattern())  # (256, 2, 2) in (x, y) order
    ca, sa = jnp.cos(angles), jnp.sin(angles)  # (N,)
    px = pat[None, ..., 0]
    py = pat[None, ..., 1]
    rx = ca[:, None, None] * px - sa[:, None, None] * py
    ry = sa[:, None, None] * px + ca[:, None, None] * py
    n = angles.shape[0]
    center = (patches.shape[-1] - 1) / 2.0
    sy = ry.reshape(n, -1) + center  # (N, 512)
    sx = rx.reshape(n, -1) + center
    vals = _sample_separable(patches, sy, sx).reshape(n, N_BITS, 2)
    bits = (vals[..., 0] < vals[..., 1]).astype(jnp.uint32)  # (N, 256)
    bits = bits.reshape(n, N_WORDS, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(bits << shifts[None, None, :], axis=-1, dtype=jnp.uint32)


def brief_descriptors(img_blurred, ys, xs, angles):
    """Compute packed descriptors (N, 8) uint32.

    img_blurred: (H, W) float32 (Gaussian-smoothed level image).
    ys, xs: (N,) integer keypoint coords in this level. angles: (N,) radians.
    """
    patches = gather_patches(img_blurred, ys, xs, GATHER_R)  # (N, 39, 39)
    return brief_from_patches(patches, angles)
