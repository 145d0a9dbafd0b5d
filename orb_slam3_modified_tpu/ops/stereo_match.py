"""Rectified stereo feature matching.

TPU-native replacement for Frame::ComputeStereoMatches (reference:
src/Frame.cc:811 — row-bucketed search along horizontal epipolar lines,
descriptor distance + SAD sub-pixel refinement, giving each left keypoint a
right-image u coordinate and depth).

Design: one masked (F_L, F_R) Hamming matrix with row-band + disparity-range
masks (the row bucketing becomes an elementwise mask), argmin per left
feature. Sub-pixel refinement via parabola fit over descriptor distances of
horizontal neighbors is folded in as an optional correction.
"""
from __future__ import annotations

import jax.numpy as jnp

from .hamming import MAX_DIST, hamming_matrix

TH_HIGH = 100


def match_stereo(
    uv_l, desc_l, level_l, valid_l,
    uv_r, desc_r, level_r, valid_r,
    bf: float,
    min_z: float,
    row_tol_levels=None,
    max_disp_frac: float = 1.0,
):
    """Match left->right features on rectified pairs.

    bf: baseline * fx (the reference's mbf). min_z: minimum depth (= bf /
    max disparity). Returns (u_right (F,), depth (F,), valid (F,)) with -1
    markers for unmatched.

    Row tolerance scales with octave like the reference's r = 2*sigma of the
    coarser level (src/Frame.cc:840 region).
    """
    scale = 1.2 ** jnp.maximum(level_l[:, None], level_r[None, :]).astype(jnp.float32)
    row_ok = jnp.abs(uv_l[:, 1:2] - uv_r[None, :, 1]) <= 2.0 * scale
    disp = uv_l[:, 0:1] - uv_r[None, :, 0]  # positive for valid stereo
    max_disp = bf / min_z
    disp_ok = (disp > 0.1) & (disp < max_disp)
    lvl_ok = jnp.abs(level_l[:, None] - level_r[None, :]) <= 1
    dm = hamming_matrix(desc_l, desc_r)
    dm = jnp.where(
        valid_l[:, None] & valid_r[None, :] & row_ok & disp_ok & lvl_ok,
        dm,
        MAX_DIST,
    )
    best = jnp.argmin(dm, axis=1)
    bd = jnp.take_along_axis(dm, best[:, None], axis=1)[:, 0]
    matched = bd < TH_HIGH
    u_r = jnp.where(matched, uv_r[best, 0], -1.0)
    disparity = jnp.where(matched, uv_l[:, 0] - u_r, -1.0)
    depth = jnp.where(matched & (disparity > 0.1), bf / jnp.maximum(disparity, 0.1), -1.0)
    return u_r, depth, matched & (depth > 0)


def refine_disparity_sad(
    img_l,
    img_r,
    uv_l,
    u_r,
    matched,
    half_w: int = 5,
    search: int = 5,
):
    """Sub-pixel disparity refinement by SAD + parabola fit.

    Reference: Frame::ComputeStereoMatches' refinement stage
    (src/Frame.cc:880 region): slide an (2w+1)^2 patch along the scanline
    around the descriptor match, take the SAD minimum, then fit a parabola
    through the three central costs for sub-pixel u_r.

    Batched: every keypoint's (2s+1) candidate windows are gathered and
    reduced in one fused pass.
    """
    import jax

    from .orientation import gather_patches

    n = uv_l.shape[0]
    size = 2 * half_w + 1
    xs_l = uv_l[:, 0].astype(jnp.int32)
    ys = uv_l[:, 1].astype(jnp.int32)
    patch_l = gather_patches(img_l, ys, xs_l, half_w)  # (N, S, S)

    def cost_at(shift):
        xr = jnp.clip(u_r.astype(jnp.int32) + shift, half_w, img_r.shape[1] - half_w - 1)
        patch_r = gather_patches(img_r, ys, xr, half_w)
        return jnp.sum(jnp.abs(patch_l - patch_r), axis=(-2, -1))  # (N,)

    shifts = list(range(-search, search + 1))
    costs = jnp.stack([cost_at(s) for s in shifts], axis=-1)  # (N, 2s+1)
    best = jnp.argmin(costs, axis=-1)
    # parabola through (best-1, best, best+1)
    b = jnp.clip(best, 1, len(shifts) - 2)
    c0 = jnp.take_along_axis(costs, (b - 1)[:, None], axis=1)[:, 0]
    c1 = jnp.take_along_axis(costs, b[:, None], axis=1)[:, 0]
    c2 = jnp.take_along_axis(costs, (b + 1)[:, None], axis=1)[:, 0]
    denom = c0 + c2 - 2 * c1
    delta = jnp.where(jnp.abs(denom) > 1e-6, 0.5 * (c0 - c2) / jnp.where(jnp.abs(denom) > 1e-6, denom, 1.0), 0.0)
    delta = jnp.clip(delta, -1.0, 1.0)
    u_refined = u_r + (b - search).astype(jnp.float32) + delta
    return jnp.where(matched, u_refined, u_r)


def match_stereo_general(
    uv_l, desc_l, level_l, valid_l,
    uv_r, desc_r, level_r, valid_r,
    cam_l, cam_r, R_rl, t_rl,
    max_dist: int = 50,
    reproj_chi2: float = 5.991,
    max_parallax_cos: float = 0.9998,
):
    """Non-rectified stereo (e.g. KB8 fisheye): mutual-best descriptor
    matching + two-view triangulation against the known left->right
    extrinsics (R_rl, t_rl with p_r = R_rl p_l + t_rl).

    TPU-native replacement for Frame::ComputeStereoFishEyeMatches
    (reference: src/Frame.cc:1126 — BFMatcher knn + TriangulateMatches) and
    KannalaBrandt8::TriangulateMatches' depth/parallax/reprojection gates
    (include/CameraModels/KannalaBrandt8.h:78-86).

    Returns (depth (F,), valid (F,)): depth of each left feature in the
    left camera frame, <=0 for unmatched/rejected.
    """
    import jax.numpy as _jnp

    from ..cameras import unproject
    from ..geom.triangulation import depth_and_reproj_checks, triangulate_rays
    from ..lie.se3 import SE3

    lvl_ok = _jnp.abs(level_l[:, None] - level_r[None, :]) <= 1
    dm = hamming_matrix(desc_l, desc_r)
    dm = _jnp.where(
        valid_l[:, None] & valid_r[None, :] & lvl_ok, dm, MAX_DIST
    )
    best = _jnp.argmin(dm, axis=1)
    bd = _jnp.take_along_axis(dm, best[:, None], axis=1)[:, 0]
    # mutual consistency
    best_rev = _jnp.argmin(dm, axis=0)
    mutual = best_rev[best] == _jnp.arange(uv_l.shape[0])
    matched = (bd < max_dist) & mutual & valid_l
    ray_l = unproject(cam_l, uv_l)  # (F, 3) unit-plane rays, z=1 direction
    ray_r = unproject(cam_r, uv_r[best])
    T_cw1 = SE3.identity()  # left camera = world
    T_cw2 = SE3(_jnp.asarray(R_rl), _jnp.asarray(t_rl))  # right <- left(world)
    pw = triangulate_rays(T_cw1.inverse(), T_cw2.inverse(), ray_l, ray_r)
    x1 = ray_l[..., :2] / _jnp.maximum(ray_l[..., 2:], 1e-9)
    x2 = ray_r[..., :2] / _jnp.maximum(ray_r[..., 2:], 1e-9)
    # unit-plane threshold: chi2 / focal^2 (per-level sigma folded by caller
    # via level gating; the reference uses sigma-scaled pixel thresholds)
    f_l = cam_l.params[0]
    f_r = cam_r.params[0]
    thr = reproj_chi2 / _jnp.minimum(f_l, f_r) ** 2
    ok3d, _, _, _ = depth_and_reproj_checks(
        T_cw1, T_cw2, pw, x1, x2, thr, max_parallax_cos
    )
    depth = _jnp.where(matched & ok3d, pw[..., 2], -1.0)
    return depth, matched & ok3d & (pw[..., 2] > 0)


def depth_from_depthmap(uv, depth_map, depth_scale: float = 1.0):
    """RGB-D: sample depth at feature locations (reference: Frame RGB-D ctor
    src/Frame.cc:200 + ComputeStereoFromRGBD :984)."""
    h, w = depth_map.shape
    x = jnp.clip(uv[:, 0].astype(jnp.int32), 0, w - 1)
    y = jnp.clip(uv[:, 1].astype(jnp.int32), 0, h - 1)
    d = depth_map[y, x] * depth_scale
    return jnp.where(d > 0, d, -1.0)
