"""FAST-9/16 corner detection as dense vectorized maps.

TPU-native replacement for the cv::FAST calls in
ORBextractor::ComputeKeyPointsOctTree (reference: src/ORBextractor.cc:781,
thresholds iniThFAST=20 / minThFAST=7 from the YAML ORBextractor block).

Design: instead of per-cell scalar loops, one dense pass computes a corner
response for EVERY pixel (16 shifted views of the image -> contiguous-arc
test via a circular sliding-window sum). Cell-level selection then happens as
a reshape + argmax reduction (see ops/select.py). This is embarrassingly
parallel and maps straight onto the VPU.
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


def fast_score_map(img, threshold: float):
    """Corner response for every pixel. img: (H, W) float32.

    Returns (H, W) float32 response; 0 where not a corner. Response is the
    OpenCV-style score: max over valid arcs of (min |ring - center| - threshold)
    approximated as sum-of-differences over the best arc, which preserves
    the ordering cv::FAST uses for non-max suppression.
    """
    ring = _ring_views(img)  # (16, H, W)
    center = img[None]
    diff = ring - center
    brighter = (diff > threshold).astype(jnp.float32)
    darker = (diff < -threshold).astype(jnp.float32)

    def arc_ok(mask):
        # circular sliding window sum of length ARC_LEN over axis 0
        m = jnp.concatenate([mask, mask[: ARC_LEN - 1]], axis=0)
        c = jnp.cumsum(m, axis=0)
        zero = jnp.zeros_like(c[:1])
        c = jnp.concatenate([zero, c], axis=0)
        win = c[ARC_LEN:] - c[:-ARC_LEN]  # (16, H, W)
        return jnp.max(win, axis=0) >= ARC_LEN

    is_corner = arc_ok(brighter) | arc_ok(darker)
    # score: sum of |diff| over pixels exceeding threshold (symmetric variant)
    sb = jnp.sum(jnp.where(diff > threshold, diff - threshold, 0.0), axis=0)
    sd = jnp.sum(jnp.where(diff < -threshold, -diff - threshold, 0.0), axis=0)
    score = jnp.maximum(sb, sd)
    resp = jnp.where(is_corner, score, 0.0)
    # zero out the rolled border
    h, w = img.shape
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    valid = (
        (ys >= BORDER) & (ys < h - BORDER) & (xs >= BORDER) & (xs < w - BORDER)
    )
    return jnp.where(valid, resp, 0.0)


def nonmax_3x3(resp):
    """3x3 non-maximum suppression on a response map."""
    import jax.lax as lax

    mx = lax.reduce_window(
        resp, -jnp.inf, lax.max, (3, 3), (1, 1), "SAME"
    )
    return jnp.where(resp >= mx, resp, 0.0)
