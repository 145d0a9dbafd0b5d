"""Motion-only pose optimization (frame tracking solver).

TPU-native replacement for Optimizer::PoseOptimization (reference:
src/Optimizer.cc:814): given the current frame's 3D-2D associations, optimize
the 6-DoF camera pose with all map points fixed.

Reference behavior mirrored:
- 4 outer rounds x 10 LM iterations (its[4]={10,10,10,10},
  src/Optimizer.cc:1003), re-classifying inliers by chi2 between rounds
  (mono 5.991 / stereo 7.815) and dropping the Huber kernel in the last
  round (outliers are hard-excluded instead).
- Huber robust kernel inside each round.

TPU-first: per-point 2x6 jacobians are built in closed form for the whole
batch; H = sum w J^T J is one einsum into a single 6x6 system; the LM loop is
a lax.fori_loop with static trip count. Everything is one jitted dispatch —
no host round-trips inside the solve.

Pose convention: T_cw (world->camera), left-multiplicative update
T <- exp(xi) * T with xi = (rho, phi).
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


class PoseOptResult(NamedTuple):
    T_cw: SE3
    inliers: jnp.ndarray  # (N,) bool
    n_inliers: jnp.ndarray  # () int32
    chi2: jnp.ndarray  # (N,) final per-point chi2


def _residuals_and_jac(T_cw: SE3, cam: Camera, pts_w, uv_obs, ur_obs=None, bf=None):
    """Mono rows (du, dv); with ur_obs also the stereo row dur, uR = u - bf/z
    (reference EdgeStereoOnlyPose, include/G2oTypes.h:440)."""
    pc = T_cw.apply(pts_w)  # (N, 3)
    uv = project(cam, pc)
    Jproj = project_jac(cam, pc)  # (N, 2, 3)
    if ur_obs is not None:
        z = jnp.maximum(pc[..., 2], 1e-6)
        ur_pred = uv[..., 0] - bf / z
        r = jnp.concatenate(
            [uv - uv_obs, (ur_pred - ur_obs)[:, None]], axis=-1
        )  # (N, 3)
        N = pc.shape[0]
        e_z = jnp.zeros((N, 3), pc.dtype).at[:, 2].set(bf / (z * z))
        Jproj = jnp.concatenate(
            [Jproj, (Jproj[:, 0, :] + e_z)[:, None, :]], axis=1
        )
    else:
        r = uv - uv_obs  # (N, 2)
    # d pc / d xi (left-mult on T_cw): [ I | -hat(pc) ]  (rho, phi ordering)
    N = pts_w.shape[0]
    I3 = jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), (N, 3, 3))
    Jse3 = jnp.concatenate([I3, -so3.hat(pc)], axis=-1)  # (N, 3, 6)
    J = Jproj @ Jse3  # (N, R, 6)
    return r, J, pc


@partial(jax.jit, static_argnums=(5, 6))
def pose_optimization(
    T_cw0: SE3,
    cam: Camera,
    pts_w,
    uv_obs,
    inv_sigma2,
    rounds: int = 4,
    iters: int = 10,
    valid=None,
    ur_obs=None,
    bf=None,
):
    """Optimize T_cw. pts_w: (N, 3); uv_obs: (N, 2); inv_sigma2: (N,) per-level
    information (1/1.2^(2*octave), reference mvInvLevelSigma2); valid: (N,).

    ur_obs: optional (N,) right-image u for rectified-stereo observations
    (<0 = mono row); bf = baseline * fx. Adds the reference's EdgeStereo
    (u, v, uR) 3-D residual with the 7.815 chi2 gate.
    """
    if valid is None:
        valid = jnp.ones(pts_w.shape[0], dtype=bool)
    N = pts_w.shape[0]
    if ur_obs is not None:
        is_st = (ur_obs >= 0).astype(jnp.float32)
        rmask = jnp.stack(
            [jnp.ones(N), jnp.ones(N), is_st], axis=-1
        )
        chi2_thr = jnp.where(ur_obs >= 0, CHI2_STEREO, CHI2_MONO)
        delta = jnp.where(ur_obs >= 0, DELTA_STEREO, DELTA_MONO)
    else:
        rmask = jnp.ones((N, 2))
        chi2_thr = CHI2_MONO
        delta = DELTA_MONO
    state0 = (T_cw0.R, T_cw0.t, valid)

    def chi2_of(T, w_in):
        r, _, pc = _residuals_and_jac(T, cam, pts_w, uv_obs, ur_obs, bf)
        c = jnp.sum(r * r * rmask, axis=-1) * inv_sigma2
        behind = pc[..., 2] <= 0.0
        return jnp.where(behind, jnp.inf, c)

    def lm_round(round_idx, carry):
        R, t, inl = carry
        use_huber = round_idx < rounds - 1  # last round: hard outlier cut

        def lm_iter(_, st):
            R, t, lam = st
            T = SE3(R, t)
            r, J, pc = _residuals_and_jac(T, cam, pts_w, uv_obs, ur_obs, bf)
            chi2 = jnp.sum(r * r * rmask, axis=-1) * inv_sigma2
            w_rob = jnp.where(use_huber, huber_weight(chi2, delta), 1.0)
            w = inl.astype(r.dtype) * valid.astype(r.dtype) * w_rob * inv_sigma2
            w = jnp.where(pc[..., 2] > 0, w, 0.0)
            wr = w[:, None] * rmask  # (N, R)
            H = jnp.einsum("nri,nr,nrj->ij", J, wr, J)
            b = jnp.einsum("nri,nr,nr->i", J, wr, r)
            Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-8 * jnp.eye(6, dtype=H.dtype)
            dx = -jnp.linalg.solve(Hd, b)
            T_new = se3.exp(dx) @ T
            # accept if cost decreased (LM): compare weighted cost
            c_old = jnp.sum(w * chi2 / jnp.maximum(inv_sigma2, 1e-12))
            r2, _, pc2 = _residuals_and_jac(T_new, cam, pts_w, uv_obs, ur_obs, bf)
            chi2_new = jnp.sum(r2 * r2 * rmask, axis=-1) * inv_sigma2
            c_new = jnp.sum(w * jnp.where(pc2[..., 2] > 0, chi2_new, chi2) / jnp.maximum(inv_sigma2, 1e-12))
            good = c_new < c_old
            R_out = jnp.where(good, T_new.R, T.R)
            t_out = jnp.where(good, T_new.t, T.t)
            lam_out = jnp.where(good, lam * 0.5, lam * 4.0)
            return R_out, t_out, lam_out

        R, t, _ = jax.lax.fori_loop(0, iters, lm_iter, (R, t, jnp.asarray(1e-3)))
        T = SE3(R, t)
        chi2 = chi2_of(T, inl)
        inl_new = valid & (chi2 < chi2_thr)
        return R, t, inl_new

    R, t, inl = jax.lax.fori_loop(0, rounds, lm_round, state0)
    T = SE3(so3.normalize(R), t)
    chi2 = chi2_of(T, inl)
    return PoseOptResult(T, inl, jnp.sum(inl), chi2)
