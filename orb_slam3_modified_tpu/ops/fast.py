"""FAST-9/16 corner detection as dense vectorized maps.

TPU-native replacement for the cv::FAST calls in
ORBextractor::ComputeKeyPointsOctTree (reference: src/ORBextractor.cc:781,
thresholds iniThFAST=20 / minThFAST=7 from the YAML ORBextractor block).

Design: instead of per-cell scalar loops, one dense pass computes a corner
response for EVERY pixel (16 shifted views of the image -> contiguous-arc
test as integer bit tricks). Cell-level selection then happens as a
reshape + top-k reduction (see ops/select.py). This is embarrassingly
parallel and maps straight onto the VPU.

The contiguous-arc-of-9 test packs the 16 ring comparisons into a uint32
bitmask per pixel and ANDs 9 shifted copies of the doubled mask — ~10 VPU
ops replacing the cumsum-based sliding window (which materialized a
(33, H, W) intermediate). Both FAST thresholds share the 16 ring views,
which dominate the memory traffic.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Bresenham circle of radius 3 (the standard FAST-16 ring, clockwise from top)
_CIRCLE = np.array(
    [
        (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
        (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
    ]
)
ARC_LEN = 9  # FAST-9: at least 9 contiguous ring pixels all brighter/darker
BORDER = 3


def _ring_views(img):
    """(16, H, W): img shifted so ring pixel k aligns with its center."""
    views = []
    for dx, dy in _CIRCLE:
        views.append(jnp.roll(img, shift=(-dy, -dx), axis=(0, 1)))
    return jnp.stack(views, axis=0)


def _arc_ok(mask16):
    """mask16: (16, H, W) bool -> (H, W) bool: any 9 contiguous ring bits set
    (circular). Packs to uint32 and tests via 9 shift-ANDs of the doubled
    mask — window starts 0..15 all lie inside the doubled 32-bit word."""
    shifts = jnp.asarray((1 << np.arange(16)).astype(np.uint32))
    bits = jnp.sum(
        mask16.astype(jnp.uint32) * shifts[:, None, None], axis=0, dtype=jnp.uint32
    )
    d = bits | (bits << jnp.uint32(16))
    acc = d
    for k in range(1, ARC_LEN):
        acc = acc & (d >> jnp.uint32(k))
    return acc != 0


def _border_mask(h, w):
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    return (ys >= BORDER) & (ys < h - BORDER) & (xs >= BORDER) & (xs < w - BORDER)


def fast_score_maps(img, th_hi: float, th_lo: float):
    """Corner responses at BOTH thresholds in one pass (they share the 16
    ring views, which dominate memory traffic). img: (H, W) float32.

    Returns (resp_hi, resp_lo), each (H, W) float32; 0 where not a corner.
    Score is the symmetric sum-of-exceedance variant, which preserves the
    ordering cv::FAST uses for non-max suppression.
    """
    ring = _ring_views(img)  # (16, H, W)
    diff = ring - img[None]
    border = _border_mask(*img.shape)

    def one(th):
        brighter = diff > th
        darker = diff < -th
        is_corner = _arc_ok(brighter) | _arc_ok(darker)
        sb = jnp.sum(jnp.where(brighter, diff - th, 0.0), axis=0)
        sd = jnp.sum(jnp.where(darker, -diff - th, 0.0), axis=0)
        score = jnp.maximum(sb, sd)
        return jnp.where(is_corner & border, score, 0.0)

    return one(th_hi), one(th_lo)


def fast_score_map(img, threshold: float):
    """Single-threshold corner response (see fast_score_maps)."""
    return fast_score_maps(img, threshold, threshold)[0]


def nonmax_3x3(resp):
    """3x3 non-maximum suppression on a response map."""
    import jax.lax as lax

    mx = lax.reduce_window(
        resp, -jnp.inf, lax.max, (3, 3), (1, 1), "SAME"
    )
    return jnp.where(resp >= mx, resp, 0.0)
