"""Batched Horn Sim3/SE3 RANSAC between two keyframes' matched points.

TPU-native replacement for Sim3Solver (reference: include/Sim3Solver.h:37-56,
src/Sim3Solver.cc — Horn 1987 closed-form similarity from 3 point pairs
inside RANSAC with reprojection-error inlier gating).

All RANSAC hypotheses are computed as one batch: (H, 3, 3) point triples ->
(H,) Horn solutions -> (H, N) reprojection gates -> argmax. One dispatch.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..lie.sim3 import Sim3

N_HYP = 128  # reference default: up to 300 iterations, 0.99 confidence


class Sim3Result(NamedTuple):
    success: jnp.ndarray
    S_12: Sim3  # maps points in frame-2 coords to frame-1 coords
    inliers: jnp.ndarray  # (N,)
    n_inliers: jnp.ndarray


def horn_sim3(p1, p2, fix_scale=False):
    """Closed-form similarity aligning p2 -> p1. p1, p2: (..., N, 3).

    Returns Sim3 batched over leading axes (Horn's method with the rotation
    from the centered cross-covariance SVD and the symmetric scale).
    """
    c1 = jnp.mean(p1, axis=-2, keepdims=True)
    c2 = jnp.mean(p2, axis=-2, keepdims=True)
    q1 = p1 - c1
    q2 = p2 - c2
    M = jnp.einsum("...ni,...nj->...ij", q1, q2)  # cross covariance
    U, _, Vt = jnp.linalg.svd(M)
    d = jnp.linalg.det(U @ Vt)
    D = jnp.stack(
        [jnp.ones_like(d), jnp.ones_like(d), d], axis=-1
    )
    R = U @ (D[..., :, None] * Vt)
    if fix_scale:
        s = jnp.ones(R.shape[:-2], R.dtype)
    else:
        num = jnp.sum(q1 * jnp.einsum("...ij,...nj->...ni", R, q2), axis=(-2, -1))
        den = jnp.sum(q2 * q2, axis=(-2, -1))
        s = num / jnp.maximum(den, 1e-12)
    t = c1[..., 0, :] - s[..., None] * jnp.einsum("...ij,...j->...i", R, c2[..., 0, :])
    return Sim3(s, R, t)


def solve_sim3_ransac(
    p1,  # (N, 3) matched 3D points in kf1 camera coords
    p2,  # (N, 3) matched points in kf2 camera coords
    valid,  # (N,)
    key,
    fix_scale: bool = False,
    err_thresh: float = 0.05,
    min_inliers: int = 20,
):
    """RANSAC Horn alignment. err_thresh: relative 3D error gate
    (the reference gates on reprojection chi2 9.210; a 3D gate at ~5% of
    point norm is the camera-model-free equivalent used here — the caller
    re-verifies with projection matching anyway, as the reference does with
    SearchByProjection after Sim3Solver)."""
    n = p1.shape[0]
    logits = jnp.where(valid, 0.0, -jnp.inf)
    idx = jax.random.categorical(key, logits, shape=(N_HYP, 3))
    S = horn_sim3(p1[idx], p2[idx], fix_scale)  # batched (H,)
    p2to1 = S.s[:, None, None] * jnp.einsum("hij,nj->hni", S.R, p2) + S.t[:, None]
    err = jnp.linalg.norm(p2to1 - p1[None], axis=-1)
    scale_ref = jnp.maximum(jnp.linalg.norm(p1, axis=-1), 1.0)
    inl = valid[None] & (err < err_thresh * scale_ref[None])
    n_inl = jnp.sum(inl, axis=-1)
    best = jnp.argmax(n_inl)
    S_best = Sim3(S.s[best], S.R[best], S.t[best])
    inliers = inl[best]
    # refine on inliers with one more Horn solve (weights as mask)
    w = inliers[:, None].astype(p1.dtype)
    cnt = jnp.maximum(jnp.sum(inliers), 3)
    # masked Horn: subtract masked centroids
    c1 = jnp.sum(p1 * w, axis=0) / cnt
    c2 = jnp.sum(p2 * w, axis=0) / cnt
    q1 = (p1 - c1) * w
    q2 = (p2 - c2) * w
    M = q1.T @ q2
    U, _, Vt = jnp.linalg.svd(M)
    d = jnp.linalg.det(U @ Vt)
    R = U @ (jnp.array([1.0, 1.0, 0.0])[:, None] * Vt + jnp.array([0.0, 0.0, 1.0])[:, None] * d * Vt)
    if fix_scale:
        s = jnp.asarray(1.0, p1.dtype)
    else:
        s = jnp.sum(q1 * (q2 @ R.T)) / jnp.maximum(jnp.sum(q2 * q2), 1e-12)
    t = c1 - s * (R @ c2)
    S_ref = Sim3(s, R, t)
    ok = n_inl[best] >= min_inliers
    return Sim3Result(ok, S_ref, inliers, n_inl[best])
