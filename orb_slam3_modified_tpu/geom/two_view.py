"""Two-view reconstruction for monocular initialization.

TPU-native replacement for TwoViewReconstruction (reference:
include/TwoViewReconstruction.h:42-70, src/TwoViewReconstruction.cc):
8-point essential + 4-point homography hypotheses, model selection by score
ratio, motion-hypothesis disambiguation by cheirality/parallax.

TPU-first design: instead of the reference's 200 sequential RANSAC iterations
(two threads for F and H), ALL hypotheses are estimated and scored as one
batched computation — (H_HYP, N) error matrices, batched 3x3/9x9 eigensolves —
so the whole initializer is a single jitted dispatch.

Works in unit-plane (normalized bearing) coordinates: pixels are unprojected
through the camera model first, so pinhole and fisheye share one path and the
"fundamental" hypothesis is directly the essential matrix. Pixel-domain
chi-square thresholds are scaled by 1/f^2.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..lie.se3 import SE3
from .triangulation import triangulate_dlt

NUM_HYP = 200  # reference: mMaxIterations = 200 (src/TwoViewReconstruction.cc:70)
TH_F_PX = 3.841  # chi2(1dof, 0.05) gate, reference CheckFundamental
TH_SCORE_PX = 5.991  # chi2(2dof) score cap, reference CheckFundamental/Homography
MIN_TRIANGULATED = 50  # reference: minTriangulated param of ReconstructF/H
MIN_PARALLAX_DEG = 1.0  # reference: minParallax = 1.0


class TwoViewResult(NamedTuple):
    success: jnp.ndarray  # () bool
    T_21: SE3  # pose of cam2 w.r.t cam1 (world = cam1 frame)
    points: jnp.ndarray  # (N, 3) triangulated points in cam1 frame
    valid: jnp.ndarray  # (N,) bool triangulation validity
    n_good: jnp.ndarray  # () int32
    used_homography: jnp.ndarray  # () bool


def _normalize(x, mask):
    """Hartley normalization over valid points. x: (N, 2)."""
    m = mask[..., None].astype(x.dtype)
    cnt = jnp.maximum(jnp.sum(m), 1.0)
    mean = jnp.sum(x * m, axis=0) / cnt
    d = jnp.abs(x - mean) * m
    mean_dev = jnp.sum(d, axis=0) / cnt
    s = 1.0 / jnp.maximum(mean_dev, 1e-9)
    xn = (x - mean) * s
    T = jnp.array(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], dtype=x.dtype
    )
    T = T.at[0, 0].set(s[0]).at[1, 1].set(s[1])
    T = T.at[0, 2].set(-mean[0] * s[0]).at[1, 2].set(-mean[1] * s[1])
    return xn, T


def _sample_minimal_sets(key, mask, n_sets, set_size):
    """(n_sets, set_size) indices drawn from valid entries (with replacement;
    a duplicated index yields a degenerate hypothesis that simply scores low)."""
    logits = jnp.where(mask, 0.0, -jnp.inf)
    return jax.random.categorical(key, logits, shape=(n_sets, set_size))


def _eight_point_E(x1, x2):
    """Batched 8-point: x1, x2 (..., 8, 2) unit-plane -> E (..., 3, 3)."""
    u1, v1 = x1[..., 0], x1[..., 1]
    u2, v2 = x2[..., 0], x2[..., 1]
    one = jnp.ones_like(u1)
    # x2^T E x1 = 0, rows of A ordered [u2u1, u2v1, u2, v2u1, v2v1, v2, u1, v1, 1]
    A = jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, one], axis=-1
    )  # (..., 8, 9)
    AtA = jnp.einsum("...ji,...jk->...ik", A, A)
    _, V = jnp.linalg.eigh(AtA)
    e = V[..., :, 0]
    E = e.reshape(*e.shape[:-1], 3, 3)
    # project to essential manifold: singular values -> (1, 1, 0)
    U, S, Vt = jnp.linalg.svd(E)
    S_proj = jnp.stack(
        [jnp.ones_like(S[..., 0]), jnp.ones_like(S[..., 0]), jnp.zeros_like(S[..., 0])],
        axis=-1,
    )
    return U @ (S_proj[..., None] * Vt)


def _four_point_H(x1, x2):
    """Batched DLT homography from 4 points: (..., 4, 2) -> (..., 3, 3)."""
    u1, v1 = x1[..., 0], x1[..., 1]
    u2, v2 = x2[..., 0], x2[..., 1]
    zero = jnp.zeros_like(u1)
    one = jnp.ones_like(u1)
    r1 = jnp.stack([u1, v1, one, zero, zero, zero, -u2 * u1, -u2 * v1, -u2], axis=-1)
    r2 = jnp.stack([zero, zero, zero, u1, v1, one, -v2 * u1, -v2 * v1, -v2], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2)  # (..., 8, 9)
    AtA = jnp.einsum("...ji,...jk->...ik", A, A)
    _, V = jnp.linalg.eigh(AtA)
    h = V[..., :, 0]
    return h.reshape(*h.shape[:-1], 3, 3)


def _epipolar_errors(E, x1, x2):
    """Squared point-to-epiline transfer errors both directions.

    E: (H, 3, 3); x1, x2: (N, 2). Returns (err12, err21): (H, N) each,
    matching CheckFundamental's two directional chi-squares (reference:
    src/TwoViewReconstruction.cc:435 region).
    """
    ones = jnp.ones((*x1.shape[:-1], 1), dtype=x1.dtype)
    p1 = jnp.concatenate([x1, ones], axis=-1)  # (N, 3)
    p2 = jnp.concatenate([x2, ones], axis=-1)
    l2 = jnp.einsum("hij,nj->hni", E, p1)  # line in image 2
    l1 = jnp.einsum("hji,nj->hni", E, p2)  # line in image 1
    num2 = jnp.einsum("ni,hni->hn", p2, l2) ** 2
    num1 = jnp.einsum("ni,hni->hn", p1, l1) ** 2
    den2 = l2[..., 0] ** 2 + l2[..., 1] ** 2
    den1 = l1[..., 0] ** 2 + l1[..., 1] ** 2
    return num1 / jnp.maximum(den1, 1e-12), num2 / jnp.maximum(den2, 1e-12)


def _homography_errors(H, x1, x2):
    """Squared symmetric transfer errors for homography hypotheses.

    H: (Hyp, 3, 3). Returns (err_in_1, err_in_2): (Hyp, N).
    """
    Hinv = jnp.linalg.inv(H)
    ones = jnp.ones((*x1.shape[:-1], 1), dtype=x1.dtype)
    p1 = jnp.concatenate([x1, ones], axis=-1)
    p2 = jnp.concatenate([x2, ones], axis=-1)
    q2 = jnp.einsum("hij,nj->hni", H, p1)
    q1 = jnp.einsum("hij,nj->hni", Hinv, p2)
    q2 = q2[..., :2] / jnp.where(jnp.abs(q2[..., 2:]) < 1e-12, 1e-12, q2[..., 2:])
    q1 = q1[..., :2] / jnp.where(jnp.abs(q1[..., 2:]) < 1e-12, 1e-12, q1[..., 2:])
    e2 = jnp.sum((q2 - x2[None]) ** 2, axis=-1)
    e1 = jnp.sum((q1 - x1[None]) ** 2, axis=-1)
    return e1, e2


def _decompose_E(E):
    """E -> 4 motion hypotheses (R, t), t unit-norm. Reference: DecomposeE."""
    U, _, Vt = jnp.linalg.svd(E)
    # enforce proper rotations
    detU = jnp.linalg.det(U)
    detV = jnp.linalg.det(Vt)
    U = U * jnp.where(detU < 0, -1.0, 1.0)
    Vt = Vt * jnp.where(detV < 0, -1.0, 1.0)
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[..., 2]
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)
    Rs = jnp.stack([R1, R1, R2, R2], axis=0)
    ts = jnp.stack([t, -t, t, -t], axis=0)
    return Rs, ts


def _decompose_H(H):
    """Faugeras SVD decomposition of a unit-plane homography into 8 (R, t).

    Reference: ReconstructH (src/TwoViewReconstruction.cc:594 region)
    implements the same Faugeras et al. 1988 case d' > 0 / d' < 0 solutions.
    """
    U, S, Vt = jnp.linalg.svd(H)
    d1, d2, d3 = S[..., 0], S[..., 1], S[..., 2]
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    V = jnp.swapaxes(Vt, -1, -2)

    d2s = jnp.maximum(d2, 1e-12)
    aux1 = jnp.sqrt(jnp.maximum(d1 * d1 - d2 * d2, 0.0))
    aux3 = jnp.sqrt(jnp.maximum(d2 * d2 - d3 * d3, 0.0))
    denom = jnp.sqrt(jnp.maximum(d1 * d1 - d3 * d3, 1e-18))
    x1 = aux1 / denom
    x3 = aux3 / denom

    Rs, ts = [], []
    # d' = +d2: rotation about y by theta with sin t = (d1-d3) x1 x3 / d2
    sin_t = (d1 - d3) * x1 * x3 / d2s
    cos_t = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, 1e-12)
    # ORB-SLAM form: cos t = (d1 x3^2 + d3 x1^2)/d2 ... use aux-based version
    cos_t = (d1 * x3 * x3 + d3 * x1 * x1) / d2s
    for e1 in (1.0, -1.0):
        for e3 in (1.0, -1.0):
            st = e1 * e3 * sin_t
            Rp = jnp.zeros_like(H)
            Rp = (
                Rp.at[..., 0, 0].set(cos_t)
                .at[..., 0, 2].set(-st)
                .at[..., 1, 1].set(1.0)
                .at[..., 2, 0].set(st)
                .at[..., 2, 2].set(cos_t)
            )
            tp = jnp.stack(
                [e1 * x1, jnp.zeros_like(x1), -e3 * x3], axis=-1
            ) * (d1 - d3)[..., None]
            R = s[..., None, None] * U @ Rp @ Vt
            t = jnp.einsum("...ij,...j->...i", U, tp)
            Rs.append(R)
            ts.append(t)
    # d' = -d2: rotation about y by phi plus reflection
    sin_p = (d1 + d3) * x1 * x3 / d2s
    cos_p = (d3 * x1 * x1 - d1 * x3 * x3) / d2s
    for e1 in (1.0, -1.0):
        for e3 in (1.0, -1.0):
            sp = e1 * e3 * sin_p
            Rp = jnp.zeros_like(H)
            Rp = (
                Rp.at[..., 0, 0].set(cos_p)
                .at[..., 0, 2].set(sp)
                .at[..., 1, 1].set(-1.0)
                .at[..., 2, 0].set(sp)
                .at[..., 2, 2].set(-cos_p)
            )
            tp = jnp.stack(
                [e1 * x1, jnp.zeros_like(x1), e3 * x3], axis=-1
            ) * (d1 + d3)[..., None]
            R = s[..., None, None] * U @ Rp @ Vt
            t = jnp.einsum("...ij,...j->...i", U, tp)
            Rs.append(R)
            ts.append(t)
    Rs = jnp.stack(Rs, axis=0)
    ts = jnp.stack(ts, axis=0)
    tn = jnp.maximum(jnp.linalg.norm(ts, axis=-1, keepdims=True), 1e-12)
    return Rs, ts / tn


def _check_motion_hypotheses(Rs, ts, x1, x2, mask, th_sq):
    """Triangulate all points under each (R, t); count good points.

    Mirrors TwoViewReconstruction::CheckRT. Returns per-hypothesis
    (n_good (Hyp,), points (Hyp, N, 3), good (Hyp, N), parallax_deg (Hyp,)).
    """
    n_hyp = Rs.shape[0]
    P1 = jnp.concatenate(
        [jnp.eye(3, dtype=x1.dtype), jnp.zeros((3, 1), x1.dtype)], axis=-1
    )
    P1 = jnp.broadcast_to(P1, (n_hyp, *x1.shape[:-1], 3, 4))
    P2 = jnp.concatenate([Rs, ts[..., None]], axis=-1)[:, None]  # (Hyp,1,3,4)
    P2 = jnp.broadcast_to(P2, (n_hyp, *x1.shape[:-1], 3, 4))
    x1b = jnp.broadcast_to(x1, (n_hyp, *x1.shape))
    x2b = jnp.broadcast_to(x2, (n_hyp, *x2.shape))
    pts = triangulate_dlt(P1, P2, x1b, x2b)  # (Hyp, N, 3)

    pc1 = pts
    pc2 = jnp.einsum("hij,hnj->hni", Rs, pts) + ts[:, None]
    z1, z2 = pc1[..., 2], pc2[..., 2]
    c2 = -jnp.einsum("hji,hj->hi", Rs, ts)  # camera-2 center in cam1 frame
    r1 = pts
    r2 = pts - c2[:, None]
    cos_par = jnp.sum(r1 * r2, axis=-1) / (
        jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1) + 1e-12
    )
    z1s = jnp.where(jnp.abs(z1) < 1e-9, 1e-9, z1)
    z2s = jnp.where(jnp.abs(z2) < 1e-9, 1e-9, z2)
    e1 = jnp.sum((pc1[..., :2] / z1s[..., None] - x1[None]) ** 2, axis=-1)
    e2 = jnp.sum((pc2[..., :2] / z2s[..., None] - x2[None]) ** 2, axis=-1)
    finite = jnp.all(jnp.isfinite(pts), axis=-1)
    good = (
        mask[None]
        & finite
        & (z1 > 0)
        & (z2 > 0)
        & (cos_par < 0.99998)
        & (e1 < th_sq)
        & (e2 < th_sq)
    )
    n_good = jnp.sum(good, axis=-1)
    # parallax statistic: 50th-best parallax among good, like the reference's
    # "50th smallest cosParallax" (CheckRT sorts and indexes min(50, size)-1).
    big = jnp.where(good, cos_par, 2.0)
    sorted_cos = jnp.sort(big, axis=-1)
    idx = jnp.minimum(49, jnp.maximum(n_good - 1, 0))
    sel = jnp.take_along_axis(sorted_cos, idx[:, None], axis=-1)[:, 0]
    parallax_deg = jnp.degrees(jnp.arccos(jnp.clip(sel, -1.0, 1.0)))
    return n_good, pts, good, parallax_deg


def reconstruct_two_views(
    x1,
    x2,
    mask,
    focal: float,
    key,
    sigma: float = 1.0,
):
    """Full monocular initializer on unit-plane correspondences.

    x1, x2: (N, 2) unit-plane coords in frame 1 / frame 2; mask: (N,) valid.
    focal: mean focal length in pixels (converts pixel chi2 thresholds).
    Reference flow: TwoViewReconstruction::Reconstruct
    (src/TwoViewReconstruction.cc:79): estimate H and F in parallel, pick by
    score ratio SH/(SH+SF) > 0.5, then ReconstructH/ReconstructF.
    """
    inv_f2 = (sigma / focal) ** 2
    th_f = TH_F_PX * inv_f2
    th_score = TH_SCORE_PX * inv_f2
    th_h = TH_SCORE_PX * inv_f2

    kE, kH = jax.random.split(key)
    idx_E = _sample_minimal_sets(kE, mask, NUM_HYP, 8)
    idx_H = _sample_minimal_sets(kH, mask, NUM_HYP, 4)

    # ----- essential hypotheses -----
    E = _eight_point_E(x1[idx_E], x2[idx_E])  # (Hyp, 3, 3)
    eF1, eF2 = _epipolar_errors(E, x1, x2)
    inl_F = mask[None] & (eF1 < th_f) & (eF2 < th_f)
    scr_F = jnp.where(
        mask[None] & (eF1 < th_f), th_score - eF1, 0.0
    ) + jnp.where(mask[None] & (eF2 < th_f), th_score - eF2, 0.0)
    score_F = jnp.sum(scr_F, axis=-1)
    best_F = jnp.argmax(score_F)
    SF = score_F[best_F]
    E_best = E[best_F]
    inliers_F = inl_F[best_F]

    # ----- homography hypotheses -----
    Hm = _four_point_H(x1[idx_H], x2[idx_H])
    eH1, eH2 = _homography_errors(Hm, x1, x2)
    inl_H = mask[None] & (eH1 < th_h) & (eH2 < th_h)
    score_H = jnp.sum(
        jnp.where(mask[None] & (eH1 < th_h), th_h - eH1, 0.0)
        + jnp.where(mask[None] & (eH2 < th_h), th_h - eH2, 0.0),
        axis=-1,
    )
    best_H = jnp.argmax(score_H)
    SH = score_H[best_H]
    H_best = Hm[best_H]
    inliers_H = inl_H[best_H]

    # Model selection ratio: the reference ships 0.50 with the original
    # ORB-SLAM2 value 0.40 left commented (src/TwoViewReconstruction.cc:119).
    # F's 1-D point-to-line residuals score systematically better than H's 2-D
    # transfer residuals even on planar scenes, so 0.40 is the robust choice
    # for planar initialization.
    use_H = SH / jnp.maximum(SH + SF, 1e-12) > 0.4

    # ----- motion hypotheses from both models; evaluated together -----
    Rs_E, ts_E = _decompose_E(E_best)  # (4, ...)
    Rs_H, ts_H = _decompose_H(H_best)  # (8, ...)
    th_sq = 4.0 * inv_f2 * sigma * sigma  # reference: 4*sigma2 in CheckRT

    nE, ptsE, goodE, parE = _check_motion_hypotheses(
        Rs_E, ts_E, x1, x2, mask & inliers_F, th_sq
    )
    nH, ptsH, goodH, parH = _check_motion_hypotheses(
        Rs_H, ts_H, x1, x2, mask & inliers_H, th_sq
    )

    def select(n_good, pts, good, par, Rs, ts, n_inliers, n_models):
        best = jnp.argmax(n_good)
        max_good = n_good[best]
        # count hypotheses within 0.7*max ("nsimilar" must be 1; reference
        # ReconstructF uses 0.7, ReconstructH uses 0.75)
        nsimilar = jnp.sum(n_good > 0.7 * max_good)
        min_good = jnp.maximum(
            jnp.int32(0.9 * n_inliers), MIN_TRIANGULATED
        )
        ok = (
            (max_good >= min_good)
            & (nsimilar == 1)
            & (par[best] > MIN_PARALLAX_DEG)
        )
        return ok, Rs[best], ts[best], pts[best], good[best], max_good

    okE, R_E, t_E, p_E, g_E, ngE = select(
        nE, ptsE, goodE, parE, Rs_E, ts_E, jnp.sum(inliers_F), 4
    )
    okH, R_H, t_H, p_H, g_H, ngH = select(
        nH, ptsH, goodH, parH, Rs_H, ts_H, jnp.sum(inliers_H), 8
    )

    success = jnp.where(use_H, okH, okE)
    R = jnp.where(use_H, R_H, R_E)
    t = jnp.where(use_H, t_H, t_E)
    pts = jnp.where(use_H, p_H, p_E)
    good = jnp.where(use_H, g_H, g_E)
    n_good = jnp.where(use_H, ngH, ngE)
    return TwoViewResult(success, SE3(R, t), pts, good, n_good, use_H)
