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


def optimize_sim3(
    S12: Sim3,
    cam1,
    cam2,
    p1_c1,  # (N, 3) matched points in kf1 camera coords
    p2_c2,  # (N, 3) same points in kf2 camera coords
    uv1,  # (N, 2) observed pixels in kf1
    uv2,  # (N, 2) observed pixels in kf2
    inv_s2_1,  # (N,) octave information in kf1
    inv_s2_2,  # (N,)
    valid,  # (N,)
    fix_scale: bool = False,
    iters: int = 10,
    chi2_thresh: float = 9.210,
):
    """Joint bidirectional reprojection refinement of a Sim3 hypothesis.

    TPU-native replacement for Optimizer::OptimizeSim3 (reference:
    src/Optimizer.cc:2115): minimize, over the 7-DoF (or 6 with fix_scale)
    similarity S12, the reprojection of kf2's points into kf1
    (EdgeSim3ProjectXYZ) AND kf1's points into kf2 via S12^-1
    (EdgeInverseSim3ProjectXYZ), Huber-robust, with the reference's
    chi2 > 9.210 outlier gate. Points stay fixed, exactly as the reference
    fixes VertexSBAPointXYZ there.

    Returns (S12_refined, inliers (N,), n_inliers).
    """
    from functools import partial as _partial

    from ..cameras import project
    from ..lie import so3

    delta = jnp.sqrt(chi2_thresh)

    def apply_state(x):
        # x: (7,) [phi(3), dt(3), dlog_s(1)] right-perturbation on S12
        R = S12.R @ so3.exp(x[:3])
        t = S12.t + x[3:6]
        s = S12.s * jnp.exp(x[6]) if not fix_scale else S12.s
        return Sim3(s, R, t)

    def residuals(x):
        S = apply_state(x)
        Sinv = S.inverse()
        q1 = S.apply(p2_c2)  # kf2 points in kf1 camera
        q2 = Sinv.apply(p1_c1)
        r1 = (project(cam1, q1) - uv1) * jnp.sqrt(inv_s2_1)[:, None]
        r2 = (project(cam2, q2) - uv2) * jnp.sqrt(inv_s2_2)[:, None]
        w1 = valid & (q1[..., 2] > 0.05)
        w2 = valid & (q2[..., 2] > 0.05)
        return r1, r2, w1, w2

    def chi2_of(x):
        r1, r2, w1, w2 = residuals(x)
        c1 = jnp.sum(r1 * r1, axis=-1)
        c2 = jnp.sum(r2 * r2, axis=-1)
        c1 = jnp.where(w1, c1, jnp.inf)
        c2 = jnp.where(w2, c2, jnp.inf)
        return c1, c2

    def flat_res(x, inl):
        r1, r2, w1, w2 = residuals(x)
        c1 = jnp.sum(r1 * r1, axis=-1)
        c2 = jnp.sum(r2 * r2, axis=-1)
        from ..optim.robust import huber_weight

        h1 = jnp.sqrt(huber_weight(c1, delta))
        h2 = jnp.sqrt(huber_weight(c2, delta))
        m1 = (w1 & inl).astype(r1.dtype) * h1
        m2 = (w2 & inl).astype(r2.dtype) * h2
        return jnp.concatenate(
            [(r1 * m1[:, None]).reshape(-1), (r2 * m2[:, None]).reshape(-1)]
        )

    @_partial(jax.jit, static_argnums=())
    def solve(inl0):
        def gn_step(_, carry):
            x, lam, inl = carry
            r = flat_res(x, inl)
            J = jax.jacfwd(flat_res)(x, inl)
            H = J.T @ J
            b = J.T @ r
            Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-8 * jnp.eye(7)
            dx = -jnp.linalg.solve(Hd, b)
            dx = jnp.where(fix_scale, dx.at[6].set(0.0), dx)
            x_new = x + dx
            good = jnp.sum(flat_res(x_new, inl) ** 2) < jnp.sum(r * r)
            x = jnp.where(good, x_new, x)
            lam = jnp.where(good, lam * 0.5, lam * 4.0)
            return x, lam, inl

        x0 = jnp.zeros(7, jnp.float32)
        # round 1: optimize, drop chi2 > 9.210 in EITHER view, re-optimize
        # (reference: the vbIsInKF2 erase loop + second optimize(nMoreIters))
        x, _, _ = jax.lax.fori_loop(
            0, iters // 2, gn_step, (x0, jnp.asarray(1e-3), inl0)
        )
        c1, c2 = chi2_of(x)
        inl1 = inl0 & (c1 < chi2_thresh) & (c2 < chi2_thresh)
        x, _, _ = jax.lax.fori_loop(
            0, iters - iters // 2, gn_step, (x, jnp.asarray(1e-3), inl1)
        )
        c1, c2 = chi2_of(x)
        inl2 = inl0 & (c1 < chi2_thresh) & (c2 < chi2_thresh)
        return x, inl2

    x, inl = solve(valid)
    S_out = apply_state(x)
    return S_out, inl, jnp.sum(inl)
