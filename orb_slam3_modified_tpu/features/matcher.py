"""Feature association kernels.

TPU-native replacement for ORBmatcher (reference: src/ORBmatcher.cc,
include/ORBmatcher.h:46-90): projection-window search, brute-force matching
with ratio test, initialization window search, and the 30-bin rotation-
consistency filter.

Where the reference walks per-feature grid cells, we compute full masked
(N1, N2) Hamming matrices — at SLAM feature counts (1-2k) these are small
dense integer ops that the VPU chews through; the spatial window becomes an
elementwise mask, and candidate selection a row argmin. Everything is
fixed-shape and jit-safe.

Thresholds follow the reference: TH_LOW=50, TH_HIGH=100, HISTO_LENGTH=30
(src/ORBmatcher.cc:35-37).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops.hamming import MAX_DIST, hamming_matrix

TH_LOW = 50
TH_HIGH = 100
HISTO_BINS = 30

# The public matchers are jitted at the boundary: host-side callers (slow
# path, mapper) issue ONE dispatch per search instead of one per jnp op —
# on a tunneled TPU each eager op from a busy host thread costs a round
# trip. Jit-in-jit callers (the fused step) inline these transparently.


def rotation_consistency_mask(angle1, angle2, matched_idx, match_valid):
    """Keep only matches whose angle difference falls in the 3 dominant
    histogram bins (reference: ComputeThreeMaxima + HISTO_LENGTH=30 pattern
    used across all SearchBy* methods).

    angle1: (N1,) radians; angle2: (N2,); matched_idx: (N1,) index into 2.
    """
    rot = angle1 - angle2[matched_idx]
    # wrap to [0, 2pi)
    two_pi = 2.0 * jnp.pi
    rot = jnp.mod(rot, two_pi)
    bins = jnp.clip(
        (rot * (HISTO_BINS / two_pi)).astype(jnp.int32), 0, HISTO_BINS - 1
    )
    hist = jnp.zeros(HISTO_BINS, jnp.int32).at[bins].add(
        match_valid.astype(jnp.int32)
    )
    top3 = jax.lax.top_k(hist, 3)[0]
    # reference rule: discard bins below 0.1*max except the top-3 bins
    thresh = jnp.where(
        jnp.arange(3) == 0, 0, (0.1 * top3[0]).astype(jnp.int32)
    )
    keep_bin = jnp.zeros(HISTO_BINS, dtype=bool)
    top3_idx = jax.lax.top_k(hist, 3)[1]
    keep_ok = jnp.array([True, True, True]) & (top3 >= thresh)
    keep_bin = keep_bin.at[top3_idx].set(keep_ok)
    return match_valid & keep_bin[bins]


@functools.partial(jax.jit, static_argnames=("max_dist", "ratio"))
def mutual_best_match(
    desc1,
    valid1,
    desc2,
    valid2,
    max_dist: int = TH_LOW,
    ratio: float = 1.0,
    extra_mask=None,
):
    """Best-match with optional Lowe ratio + mutual-consistency checks.

    Returns (idx2: (N1,) int32, valid: (N1,) bool, dist: (N1,) int32).
    extra_mask: optional (N1, N2) bool of allowed pairs (spatial window,
    level gates, epipolar bands...).
    """
    dm = hamming_matrix(desc1, desc2)
    allowed = valid1[:, None] & valid2[None, :]
    if extra_mask is not None:
        allowed = allowed & extra_mask
    dm = jnp.where(allowed, dm, MAX_DIST)
    idx = jnp.argmin(dm, axis=1)
    best = jnp.take_along_axis(dm, idx[:, None], axis=1)[:, 0]
    # second best for ratio test
    dm2 = dm.at[jnp.arange(dm.shape[0]), idx].set(MAX_DIST)
    second = jnp.min(dm2, axis=1)
    ok = (best <= max_dist) & (best < ratio * second)
    # mutual check: is row i the argmin of column idx[i]?
    col_best = jnp.argmin(dm, axis=0)  # (N2,)
    ok = ok & (col_best[idx] == jnp.arange(dm.shape[0]))
    return idx, ok, best


@functools.partial(jax.jit, static_argnames=("window",))
def search_for_initialization(
    uv1, angle1, desc1, valid1, uv2, angle2, desc2, valid2, window: float = 100.0
):
    """Monocular-init matching (reference: SearchForInitialization
    src/ORBmatcher.cc:648): window search around the frame-1 location,
    ratio 0.9, rotation consistency.
    """
    d2 = uv1[:, None, :] - uv2[None, :, :]
    spatial = jnp.sum(d2 * d2, axis=-1) < window * window
    idx, ok, dist = mutual_best_match(
        desc1, valid1, desc2, valid2, max_dist=TH_LOW, ratio=0.9, extra_mask=spatial
    )
    ok = rotation_consistency_mask(angle1, angle2, idx, ok)
    return idx, ok, dist


@functools.partial(
    jax.jit, static_argnames=("level_tol", "max_dist", "ratio")
)
def search_by_projection(
    uv_pred,
    level_pred,
    pt_desc,
    pt_valid,
    f_uv,
    f_level,
    f_desc,
    f_valid,
    radius_per_level,
    level_tol: int = 1,
    max_dist: int = TH_HIGH,
    ratio: float = 1.0,
):
    """Project-and-match (reference: SearchByProjection src/ORBmatcher.cc:43
    for local map points, :1676 for last-frame tracking).

    uv_pred: (P, 2) predicted pixel position for each candidate point.
    level_pred: (P,) predicted octave; the window radius scales with it and
    candidate keypoints must be within level_tol octaves.
    radius_per_level: (L,) base search radius (px) per predicted level
    (caller bakes in scale factors and view-angle multipliers, mirroring
    RadiusByViewingCos, src/Tracking.cc region).
    Returns (idx: (P,), valid: (P,), dist: (P,)).
    """
    d = uv_pred[:, None, :] - f_uv[None, :, :]
    r = radius_per_level[jnp.clip(level_pred, 0, radius_per_level.shape[0] - 1)]
    spatial = jnp.sum(d * d, axis=-1) < (r * r)[:, None]
    lvl_ok = jnp.abs(f_level[None, :] - level_pred[:, None]) <= level_tol
    idx, ok, dist = mutual_best_match(
        pt_desc,
        pt_valid,
        f_desc,
        f_valid,
        max_dist=max_dist,
        ratio=ratio,
        extra_mask=spatial & lvl_ok,
    )
    return idx, ok, dist


@functools.partial(jax.jit, static_argnames=("n_targets",))
def resolve_duplicate_targets(idx, ok, dist, n_targets: int):
    """Ensure each target feature is claimed by at most one source (the best).

    The reference enforces this implicitly via its fill-in order; here we do a
    segment-min over target indices.
    """
    big = jnp.where(ok, dist, MAX_DIST)
    # min distance per target
    best_per_target = jnp.full((n_targets,), MAX_DIST, big.dtype).at[idx].min(big)
    keep = ok & (big <= best_per_target[idx])
    # tie-break: keep lowest source index among equal-dist claims
    first_claim = (
        jnp.full((n_targets,), idx.shape[0], jnp.int32)
        .at[idx]
        .min(jnp.where(keep, jnp.arange(idx.shape[0], dtype=jnp.int32), idx.shape[0]))
    )
    keep = keep & (first_claim[idx] == jnp.arange(idx.shape[0]))
    return keep
