"""Batched bundle adjustment with dense Schur complement.

TPU-native replacement for the g2o pipeline used by
Optimizer::LocalBundleAdjustment / GlobalBundleAdjustemnt (reference:
src/Optimizer.cc:1116, :60) and g2o's BlockSolver Schur machinery
(Thirdparty/g2o/g2o/core/block_solver.hpp).

Design (SURVEY.md §7.1 "Batched LM/GN optimizer"):
- Problem state: poses (K cameras, SE3 SoA), points (P, 3), observations as
  fixed-capacity COO arrays (obs_cam, obs_pt, obs_uv, obs_w, obs_valid).
- Per-observation 2x6 / 2x3 jacobians in closed form for the whole batch.
- Dense-block Schur: the camera system is materialized as a dense
  (6K, 6K) matrix (SLAM windows keep K small: 10-30 local, <=200 global),
  point blocks are batched 3x3 inverses, and the point->camera reduction
  W_p Hpp^-1 W_p^T is one einsum over points — pure MXU work. No sparse
  CCS bookkeeping, no per-edge virtual dispatch.
- Gauge/fixed cameras: jacobian columns of fixed cameras are zeroed and
  their diagonal blocks pinned to identity (equivalent to g2o setFixed).
- Robust Huber weights as IRLS, outlier reclassification between rounds
  (reference LocalBA: optimize(5), drop chi2>5.991, optimize(10)).

The same kernel shards over a device mesh for distributed BA: observations
and points are partitioned, and H_cc/b_c/S contributions are psum-reduced
(see parallel/dist_ba.py).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..cameras import Camera, project, project_jac
from ..lie import se3, so3
from ..lie.se3 import SE3
from .robust import (
    CHI2_MONO,
    CHI2_STEREO,
    DELTA_MONO,
    DELTA_STEREO,
    huber_weight,
)


class BAProblem(NamedTuple):
    """Fixed-capacity BA problem. K cameras, P points, O observations.

    Stereo observations (reference: EdgeStereo, include/G2oTypes.h:414 —
    3-D residual (u, v, uR) with uR = u - bf/z on rectified pairs) are
    expressed by obs_ur >= 0; obs_ur < 0 rows stay monocular. bf is the
    stereo baseline*fx (the reference's mbf). obs_ur=None compiles the
    pure-mono 2-row path."""

    T_cw: SE3  # (K,) batched pose SoA
    cam_fixed: jnp.ndarray  # (K,) bool — gauge anchors / frontier
    points: jnp.ndarray  # (P, 3)
    pt_valid: jnp.ndarray  # (P,) bool
    obs_cam: jnp.ndarray  # (O,) int32 camera index
    obs_pt: jnp.ndarray  # (O,) int32 point index
    obs_uv: jnp.ndarray  # (O, 2) pixel measurement
    obs_inv_s2: jnp.ndarray  # (O,) information (1/sigma^2 of octave)
    obs_valid: jnp.ndarray  # (O,) bool
    obs_ur: jnp.ndarray = None  # (O,) right-image u, <0 = mono
    bf: jnp.ndarray = None  # () baseline * fx


class BAResult(NamedTuple):
    T_cw: SE3
    points: jnp.ndarray
    obs_inlier: jnp.ndarray  # (O,) bool post-reclassification
    chi2: jnp.ndarray  # (O,) final per-observation chi2


def _obs_residuals(prob: BAProblem, cam: Camera, Rk, tk, pts):
    """Residuals + jacobians for every observation.

    Mono: r = (du, dv), (O, 2) rows. Stereo (obs_ur set): r = (du, dv, dur)
    with uR = u - bf/z (reference EdgeStereo::computeError,
    include/G2oTypes.h:414); the third row is masked off by `row_mask` for
    mono observations."""
    Rc = Rk[prob.obs_cam]  # (O, 3, 3)
    tc = tk[prob.obs_cam]
    pw = pts[prob.obs_pt]  # (O, 3)
    pc = jnp.einsum("oij,oj->oi", Rc, pw) + tc
    uv = project(cam, pc)
    Jproj = project_jac(cam, pc)  # (O, 2, 3)
    if prob.obs_ur is not None:
        z = jnp.maximum(pc[..., 2], 1e-6)
        ur_pred = uv[..., 0] - prob.bf / z
        r = jnp.concatenate(
            [uv - prob.obs_uv, (ur_pred - prob.obs_ur)[:, None]], axis=-1
        )  # (O, 3)
        # d uR / d pc = d u / d pc + [0, 0, bf/z^2]
        O = pc.shape[0]
        e_z = jnp.zeros((O, 3), pc.dtype).at[:, 2].set(prob.bf / (z * z))
        Jproj = jnp.concatenate(
            [Jproj, (Jproj[:, 0, :] + e_z)[:, None, :]], axis=1
        )  # (O, 3, 3)
    else:
        r = uv - prob.obs_uv  # (O, 2)
    O = pc.shape[0]
    I3 = jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), (O, 3, 3))
    Jpose = Jproj @ jnp.concatenate([I3, -so3.hat(pc)], axis=-1)  # (O, R, 6)
    Jpt = Jproj @ Rc  # (O, R, 3)
    return r, Jpose, Jpt, pc


def _row_mask(prob: BAProblem, dtype=jnp.float32):
    """(O, R) per-row validity: the uR row only exists for stereo obs."""
    O = prob.obs_cam.shape[0]
    if prob.obs_ur is None:
        return jnp.ones((O, 2), dtype)
    is_st = (prob.obs_ur >= 0).astype(dtype)
    return jnp.stack([jnp.ones(O, dtype), jnp.ones(O, dtype), is_st], axis=-1)


def _chi2_thresh(prob: BAProblem):
    """Per-observation chi2 gate: 5.991 (2 dof) mono / 7.815 (3 dof) stereo
    (reference: src/Optimizer.cc thHuber/chi2 constants)."""
    if prob.obs_ur is None:
        return CHI2_MONO
    return jnp.where(prob.obs_ur >= 0, CHI2_STEREO, CHI2_MONO)


def _huber_delta(prob: BAProblem):
    if prob.obs_ur is None:
        return DELTA_MONO
    return jnp.where(prob.obs_ur >= 0, DELTA_STEREO, DELTA_MONO)


def _schur_solve(prob, K, P, wr, r, Jpose, Jpt, lam):
    """One damped GN step via dense Schur. wr: (O, R) per-row weights.
    Returns (dx_cam (K,6), dx_pt (P,3))."""
    R_rows = r.shape[1]
    onehot = (prob.obs_cam[:, None] == jnp.arange(K)[None, :]).astype(r.dtype)
    # dense per-observation camera jacobian (O, R, K*6)
    Jc = jnp.einsum("ok,orj->orkj", onehot, Jpose).reshape(
        r.shape[0], R_rows, K * 6
    )
    wJc = wr[:, :, None] * Jc
    H_cc = jnp.einsum("ora,orb->ab", wJc, Jc)  # (6K, 6K)
    b_c = jnp.einsum("ora,or->a", wJc, r)
    # point blocks
    H_pp = jax.ops.segment_sum(
        jnp.einsum("or,ora,orb->oab", wr, Jpt, Jpt), prob.obs_pt, num_segments=P
    )  # (P, 3, 3)
    b_p = jax.ops.segment_sum(
        jnp.einsum("or,ora,or->oa", wr, Jpt, r), prob.obs_pt, num_segments=P
    )  # (P, 3)
    # cross terms per point: W_p = sum_{o in p} Jc_o^T w Jpt_o  -> (P, 6K, 3)
    W = jax.ops.segment_sum(
        jnp.einsum("ora,orb->oab", wJc, Jpt), prob.obs_pt, num_segments=P
    )
    # damp + invert point blocks (diagonal LM damping per block)
    H_pp_d = H_pp + jnp.eye(3, dtype=r.dtype) * (
        lam * jnp.diagonal(H_pp, axis1=-2, axis2=-1) + 1e-8
    )[..., :, None]
    pt_active = prob.pt_valid
    H_pp_inv = jnp.linalg.inv(
        jnp.where(pt_active[:, None, None], H_pp_d, jnp.eye(3, dtype=r.dtype))
    )
    H_pp_inv = jnp.where(pt_active[:, None, None], H_pp_inv, 0.0)
    # Schur reduction
    S = H_cc - jnp.einsum("pac,pcd,pbd->ab", W, H_pp_inv, W)
    b_red = b_c - jnp.einsum("pac,pcd,pd->a", W, H_pp_inv, b_p)
    # damp cameras + pin fixed cameras
    diagS = jnp.diag(S)
    S = S + jnp.diag(lam * diagS + 1e-8)
    fixed6 = jnp.repeat(prob.cam_fixed, 6)
    S = jnp.where(fixed6[:, None] | fixed6[None, :], 0.0, S)
    S = S + jnp.diag(jnp.where(fixed6, 1.0, 0.0))
    b_red = jnp.where(fixed6, 0.0, b_red)
    dx_cam = -jnp.linalg.solve(S, b_red)  # (6K,)
    # back-substitute points: dx_p = -Hpp^-1 (b_p + W^T dx_cam)
    dx_pt = -jnp.einsum(
        "pcd,pd->pc", H_pp_inv, b_p + jnp.einsum("pac,a->pc", W, dx_cam)
    )
    return dx_cam.reshape(K, 6), dx_pt


@partial(jax.jit, static_argnums=(2, 3, 4))
def bundle_adjust(
    prob: BAProblem,
    cam: Camera,
    rounds: int = 2,
    iters_per_round: int = 5,
    huber: bool | None = None,
):
    """Robust BA. Mirrors the reference LocalBA schedule: each round runs
    `iters_per_round` LM iterations then reclassifies chi2>5.991 (or negative
    depth) observations as outliers (reference: src/Optimizer.cc:1350-1400
    region).

    huber: None = Huber on all but the last round (the reference schedule);
    True/False force it for every round (used when a caller splits the
    schedule into separately-dispatched abortable chunks)."""
    K = prob.T_cw.t.shape[0]
    P = prob.points.shape[0]
    rmask = _row_mask(prob)
    chi2_thr = _chi2_thresh(prob)
    delta = _huber_delta(prob)

    def chi2_of(Rk, tk, pts):
        r, _, _, pc = _obs_residuals(prob, cam, Rk, tk, pts)
        c = jnp.sum(r * r * rmask, axis=-1) * prob.obs_inv_s2
        return jnp.where(pc[..., 2] > 0, c, jnp.inf)

    def lm_round(round_idx, carry):
        Rk, tk, pts, inlier = carry
        use_huber = (round_idx < rounds - 1) if huber is None else huber

        def lm_iter(_, st):
            Rk, tk, pts, lam = st
            r, Jpose, Jpt, pc = _obs_residuals(prob, cam, Rk, tk, pts)
            chi2 = jnp.sum(r * r * rmask, axis=-1) * prob.obs_inv_s2
            w_rob = jnp.where(use_huber, huber_weight(chi2, delta), 1.0)
            w = (
                inlier.astype(r.dtype)
                * prob.obs_valid.astype(r.dtype)
                * prob.pt_valid[prob.obs_pt].astype(r.dtype)
                * w_rob
                * prob.obs_inv_s2
            )
            w = jnp.where(pc[..., 2] > 0, w, 0.0)
            dx_cam, dx_pt = _schur_solve(
                prob, K, P, w[:, None] * rmask, r, Jpose, Jpt, lam
            )
            R_new = jax.vmap(lambda d, R: se3.exp(d).R @ R)(dx_cam, Rk)
            t_new = jax.vmap(
                lambda d, R, t: (se3.exp(d) @ SE3(R, t)).t
            )(dx_cam, Rk, tk)
            pts_new = pts + dx_pt
            c_old = jnp.sum(jnp.where(jnp.isfinite(chi2), w * chi2, 0.0))
            r2, _, _, pc2 = _obs_residuals(prob, cam, R_new, t_new, pts_new)
            chi2n = jnp.sum(r2 * r2 * rmask, axis=-1) * prob.obs_inv_s2
            c_new = jnp.sum(jnp.where(pc2[..., 2] > 0, w * chi2n, w * chi2))
            good = c_new < c_old
            Rk = jnp.where(good, R_new, Rk)
            tk = jnp.where(good, t_new, tk)
            pts = jnp.where(good, pts_new, pts)
            lam = jnp.where(good, lam * 0.5, lam * 5.0)
            return Rk, tk, pts, lam

        Rk, tk, pts, _ = jax.lax.fori_loop(
            0, iters_per_round, lm_iter, (Rk, tk, pts, jnp.asarray(1e-4))
        )
        chi2 = chi2_of(Rk, tk, pts)
        inlier_new = prob.obs_valid & (chi2 < chi2_thr)
        return Rk, tk, pts, inlier_new

    carry0 = (prob.T_cw.R, prob.T_cw.t, prob.points, prob.obs_valid)
    Rk, tk, pts, inlier = jax.lax.fori_loop(0, rounds, lm_round, carry0)
    Rk = so3.normalize(Rk)
    chi2 = chi2_of(Rk, tk, pts)
    return BAResult(SE3(Rk, tk), pts, inlier, chi2)
