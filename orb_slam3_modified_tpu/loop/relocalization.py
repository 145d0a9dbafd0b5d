"""Relocalization: BoW candidate retrieval + batched PnP RANSAC.

TPU-native replacement for Tracking::Relocalization (reference:
src/Tracking.cc:3612 — DetectRelocalizationCandidates -> SearchByBoW ->
MLPnPsolver RANSAC -> PoseOptimization refinement; MLPnP at
include/MLPnPsolver.h:59-183).

The minimal solver here is a 6-point DLT for the full projection matrix
(batched over all RANSAC hypotheses in one dispatch, like every other RANSAC
in this framework), followed by rotation orthonormalization and an IRLS-LM
polish with pose_optimization. MLPnP's per-point uncertainty weighting is
subsumed by the final robust refinement.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..cameras import Camera, unproject
from ..lie import so3
from ..lie.se3 import SE3
from ..optim.pose_opt import pose_optimization

N_HYP = 128
MIN_SET = 6


class PnPResult(NamedTuple):
    success: jnp.ndarray
    T_cw: SE3
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray


def _p6p_dlt(pw, rays):
    """Batched 6-point DLT: pw (..., 6, 3) world, rays (..., 6, 2) unit-plane.

    Builds the 2x12 epipolar-free projection equations per point and takes
    the smallest eigenvector of A^T A. Returns (R (..., 3, 3), t (..., 3)).
    """
    x, y = rays[..., 0], rays[..., 1]
    X = jnp.concatenate([pw, jnp.ones_like(pw[..., :1])], axis=-1)  # (..., 6, 4)
    zeros = jnp.zeros_like(X)
    # rows: [X 0 -x*X], [0 X -y*X]
    r1 = jnp.concatenate([X, zeros, -x[..., None] * X], axis=-1)
    r2 = jnp.concatenate([zeros, X, -y[..., None] * X], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2)  # (..., 12, 12)
    AtA = jnp.einsum("...ji,...jk->...ik", A, A)
    _, V = jnp.linalg.eigh(AtA)
    p = V[..., :, 0]
    P = p.reshape(*p.shape[:-1], 3, 4)
    M = P[..., :3]
    # scale/sign: det(M) > 0 and ||rows|| ~ 1
    detM = jnp.linalg.det(M)
    sign = jnp.where(detM < 0, -1.0, 1.0)
    M = M * sign[..., None, None]
    p4 = P[..., 3] * sign[..., None]
    scale = jnp.cbrt(jnp.maximum(jnp.linalg.det(M), 1e-12))
    M = M / scale[..., None, None]
    t = p4 / scale[..., None]
    R = so3.normalize(M)
    return R, t


def pnp_ransac(
    cam: Camera,
    pw,  # (N, 3) world points
    uv,  # (N, 2) pixel observations
    valid,  # (N,)
    key,
    err_px: float = 5.99,
    min_inliers: int = 15,
):
    """Batched-hypothesis PnP. Returns PnPResult."""
    rays = unproject(cam, uv)
    rays2 = rays[..., :2] / rays[..., 2:3]
    logits = jnp.where(valid, 0.0, -jnp.inf)
    idx = jax.random.categorical(key, logits, shape=(N_HYP, MIN_SET))
    R, t = _p6p_dlt(pw[idx], rays2[idx])  # (H, 3, 3), (H, 3)
    pc = jnp.einsum("hij,nj->hni", R, pw) + t[:, None]
    z = pc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    proj = pc[..., :2] / zs[..., None]
    f = cam.params[0]
    err = jnp.sum((proj - rays2[None]) ** 2, axis=-1) * (f * f)
    inl = valid[None] & (z > 0) & (err < err_px)
    n_inl = jnp.sum(inl, axis=-1)
    best = jnp.argmax(n_inl)
    return PnPResult(
        n_inl[best] >= min_inliers,
        SE3(R[best], t[best]),
        inl[best],
        n_inl[best],
    )


def relocalize(
    cam: Camera,
    kfdb,
    voc,
    slam_map,
    feats,
    inv_s2_levels,
    frame_key: int,
    max_candidates: int = 5,
):
    """Full relocalization attempt. Returns (T_cw SE3, obs_mp (F,)) or None."""
    from ..features.matcher import TH_LOW, mutual_best_match, resolve_duplicate_targets
    from ..slam_map.map_state import NO_POINT
    from ..tracking.tracker import _pad1

    m = slam_map
    desc_np = np.asarray(feats.desc)
    valid_np = np.asarray(feats.valid)
    words = voc.transform_np(desc_np[valid_np])
    cands = kfdb.query(words, exclude=set(), n_best=max_candidates)
    F = feats.capacity
    for c in cands:
        c = int(c)
        if not m.kf_valid[c]:
            continue
        slots, mps = m.observations_of_kf(c)
        if len(mps) < 15:
            continue
        dk = _pad1(m.kf_desc[c, slots], F)
        vk = np.zeros(F, bool)
        vk[: min(len(slots), F)] = True
        idx, ok, dist = mutual_best_match(
            jnp.asarray(dk), jnp.asarray(vk), feats.desc, feats.valid,
            max_dist=TH_LOW, ratio=0.75,
        )
        keep = resolve_duplicate_targets(idx, ok, dist, F)
        keep_np = np.array(keep)
        keep_np[len(slots):] = False
        if keep_np.sum() < 15:
            continue
        sel = np.flatnonzero(keep_np)
        idx_np = np.asarray(idx)
        mp = mps[sel]
        f_slot = idx_np[sel]
        cap = 512
        n = min(len(mp), cap)
        vmask = np.zeros(cap, bool)
        vmask[:n] = True
        res = pnp_ransac(
            cam,
            jnp.asarray(_pad1(m.mp_pos[mp], cap)),
            jnp.asarray(_pad1(np.asarray(feats.uv)[f_slot], cap)),
            jnp.asarray(vmask),
            jax.random.PRNGKey(frame_key),
        )
        if not bool(res.success):
            continue
        # polish with robust pose optimization on the inlier set
        inl = np.asarray(res.inliers)[:n]
        pts = m.mp_pos[mp[inl]]
        uvs = np.asarray(feats.uv)[f_slot[inl]]
        popt = pose_optimization(
            res.T_cw, cam,
            jnp.asarray(_pad1(pts, cap)),
            jnp.asarray(_pad1(uvs, cap)),
            jnp.asarray(_pad1(inv_s2_levels[np.asarray(feats.level)[f_slot[inl]]], cap, 1.0)),
            valid=jnp.asarray(np.arange(cap) < inl.sum()),
        )
        if int(popt.n_inliers) < 15:
            continue
        obs = np.full(F, NO_POINT, np.int32)
        good = np.asarray(popt.inliers)[: int(inl.sum())]
        obs[f_slot[inl][good]] = mp[inl][good]
        return popt.T_cw, obs
    return None
