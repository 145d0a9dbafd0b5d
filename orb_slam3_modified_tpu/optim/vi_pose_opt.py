"""Visual-inertial pose optimization for tracking.

TPU-native replacement for Optimizer::PoseInertialOptimizationLastFrame /
LastKeyFrame (reference: src/Optimizer.cc:4875 / :4491): optimize the
current frame's {pose, velocity, gyro/accel bias delta} against
- Huber-weighted visual reprojection residuals (map points fixed), and
- the 9-D preintegration residual to the previous frame/keyframe state
  (EdgeInertial, include/G2oTypes.h:495), plus bias random-walk priors
  (EdgeGyroRW/EdgeAccRW :635/:671).

State x = [xi_pose(6) | dv(3) | dbg(3) | dba(3)] (15-D), solved by a few
damped GN steps with jacfwd over the stacked residual — the visual block is
batched closed-form-size, the state tiny, so one dense (15,15) solve per
iteration. Single jitted dispatch.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..cameras import Camera, project
from ..imu.preintegration import GRAVITY_VEC
from ..lie import se3, so3
from ..lie.se3 import SE3
from .robust import CHI2_MONO, CHI2_STEREO, DELTA_MONO, DELTA_STEREO, huber_weight


class VIPoseResult(NamedTuple):
    T_cw: SE3
    v_w: jnp.ndarray  # (3,)
    dbg: jnp.ndarray
    dba: jnp.ndarray
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray


class VIMargResult(NamedTuple):
    T_cw: SE3
    v_w: jnp.ndarray  # (3,) current body velocity
    dbg: jnp.ndarray  # (3,) bias delta from the linearization bias
    dba: jnp.ndarray
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray
    # marginalization products for the NEXT frame's solve: the current
    # state's posterior information with the previous state Schur'd out
    # (reference: Marginalize src/Optimizer.cc:2960 -> EdgePriorPoseImu
    # include/G2oTypes.h:732). Anchored at (R_wb, p_wb, v_w, bias+delta).
    H_marg: jnp.ndarray  # (15, 15)
    R_wb: jnp.ndarray  # (3, 3) current body rotation (anchor)
    p_wb: jnp.ndarray  # (3,) current body position (anchor)


def _body_from_cam(R_cw, t_cw, R_bc, t_bc):
    """(R_wb, p_wb) of the body given the camera pose T_cw and the
    camera-to-body extrinsics x_b = R_bc x_c + t_bc (reference: ImuCamPose
    keeps Rcb/tcb and maps every inertial vertex through it,
    include/G2oTypes.h:60-128)."""
    R_bw = R_bc @ R_cw
    t_bw = R_bc @ t_cw + t_bc
    R_wb = jnp.swapaxes(R_bw, -1, -2)
    p_wb = -jnp.einsum("...ij,...j->...i", R_wb, t_bw)
    return R_wb, p_wb


def _cam_from_body(R_wb, p_wb, R_bc, t_bc):
    """Inverse of _body_from_cam: camera pose (R_cw, t_cw) from body state."""
    R_bw = jnp.swapaxes(R_wb, -1, -2)
    t_bw = -jnp.einsum("...ij,...j->...i", R_bw, p_wb)
    R_cw = R_bc.T @ R_bw
    t_cw = jnp.einsum("ji,...j->...i", R_bc, t_bw - t_bc)
    return R_cw, t_cw


@partial(jax.jit, static_argnums=(18, 19))
def vi_pose_optimization(
    T_cw0: SE3,
    cam: Camera,
    pts_w,  # (N, 3)
    uv_obs,  # (N, 2)
    inv_s2,  # (N,)
    valid,  # (N,)
    # previous (frame or keyframe) body state — held fixed
    R_wb_prev,
    p_wb_prev,
    v_prev,
    # preintegration prev->cur (deltas already bias-corrected by caller at
    # the linearization bias; JRg/JVg/JVa/JPg/JPa give first-order updates)
    dT, dR, dV, dP, JRg, JVg, JVa, JPg, JPa,
    iters: int = 6,
    use_huber: bool = True,
    v_init=None,
    inertial_weight: float = 1.0,
    bias_prior: float = 1e4,
    R_bc=None,  # camera-to-body extrinsics; None = identity rig
    t_bc=None,
):
    """General-extrinsics VI pose solve: the optimized pose stays the camera
    pose T_cw, the inertial residual is evaluated on the body state mapped
    through T_bc (reference threads Tcb through every inertial vertex,
    include/G2oTypes.h:60-128, src/Optimizer.cc:4491)."""
    if v_init is None:
        v_init = v_prev
    if R_bc is None:
        R_bc = jnp.eye(3)
    if t_bc is None:
        t_bc = jnp.zeros(3)

    def unpack(x):
        T = se3.exp(x[:6]) @ T_cw0
        v = v_init + x[6:9]
        dbg = x[9:12]
        dba = x[12:15]
        return T, v, dbg, dba

    def residuals(x):
        T, v, dbg, dba = unpack(x)
        # visual block
        pc = T.apply(pts_w)
        uv = project(cam, pc)
        r = (uv - uv_obs) * jnp.sqrt(jnp.maximum(inv_s2, 1e-9))[:, None]
        chi2 = jnp.sum(r * r, axis=-1)
        w_rob = jnp.where(use_huber, jnp.sqrt(huber_weight(chi2, DELTA_MONO)), 1.0)
        w = valid.astype(r.dtype) * (pc[..., 2] > 0.05)
        r_vis = (r * (w * w_rob)[:, None]).reshape(-1)
        # inertial block on the body state behind the extrinsics
        R_wb, p_wb = _body_from_cam(T.R, T.t, R_bc, t_bc)
        dR_c = dR @ so3.exp(JRg @ dbg)
        dV_c = dV + JVg @ dbg + JVa @ dba
        dP_c = dP + JPg @ dbg + JPa @ dba
        RiT = R_wb_prev.T
        r_R = so3.log(dR_c.T @ RiT @ R_wb)
        r_v = RiT @ (v - v_prev - GRAVITY_VEC * dT) - dV_c
        r_p = (
            RiT @ (p_wb - p_wb_prev - v_prev * dT - 0.5 * GRAVITY_VEC * dT * dT)
            - dP_c
        )
        r_inert = jnp.concatenate([r_R, r_v, r_p]) * inertial_weight
        r_bias = jnp.concatenate([dbg, dba]) * jnp.sqrt(bias_prior) * dT
        return jnp.concatenate([r_vis, r_inert, r_bias])

    def gn_step(_, carry):
        x, lam = carry
        r = residuals(x)
        J = jax.jacfwd(residuals)(x)
        H = J.T @ J
        b = J.T @ r
        Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-8 * jnp.eye(15)
        dx = -jnp.linalg.solve(Hd, b)
        x_new = x + dx
        good = jnp.sum(residuals(x_new) ** 2) < jnp.sum(r * r)
        x = jnp.where(good, x_new, x)
        lam = jnp.where(good, lam * 0.5, lam * 4.0)
        return x, lam

    x, _ = jax.lax.fori_loop(
        0, iters, gn_step, (jnp.zeros(15, jnp.float32), jnp.asarray(1e-3))
    )
    T, v, dbg, dba = unpack(x)
    pc = T.apply(pts_w)
    uv = project(cam, pc)
    chi2 = jnp.sum((uv - uv_obs) ** 2, axis=-1) * inv_s2
    inl = valid & (chi2 < CHI2_MONO) & (pc[..., 2] > 0)
    return VIPoseResult(
        SE3(so3.normalize(T.R), T.t), v, dbg, dba, inl, jnp.sum(inl)
    )


@partial(jax.jit, static_argnums=(20,))
def vi_pose_optimization_marg(
    T_cw0: SE3,
    cam: Camera,
    pts_w,  # (N, 3)
    uv_obs,  # (N, 2)
    inv_s2,  # (N,)
    valid,  # (N,)
    # previous frame body state (anchor of the 15-D prior)
    R_prev,  # (3, 3) R_wb
    p_prev,  # (3,)
    v_prev,  # (3,)
    # 15-D prior information on the previous state, anchored at the above
    # (reference: EdgePriorPoseImu built by Marginalize,
    # include/G2oTypes.h:732, src/Optimizer.cc:2960)
    H_prior,  # (15, 15) [phi, dp, dv, dbg, dba]
    # preintegration prev->cur, deltas at the shared linearization bias
    dT, dR, dV, dP, JRg, JVg, JVa, JPg, JPa,
    C=None,  # (15, 15) preintegration covariance for whitening
    iters: int = 8,
    R_bc=None,  # camera-to-body extrinsics; None = identity rig
    t_bc=None,
    ur_obs=None,  # (N,) right-image u for rectified stereo (<0 = mono row)
    bf=None,  # baseline * fx; enables the (u, v, uR) EdgeStereo rows
):
    """Joint {previous, current} 30-D visual-inertial frame solve.

    Reference: PoseInertialOptimizationLastFrame (src/Optimizer.cc:4875) —
    the previous frame is a VERTEX held by a finite 15-D marginalization
    prior instead of being fixed, the current frame carries the visual
    edges, and EdgeInertial + bias random walk couple the two. After the
    solve the previous state is Schur-marginalized out of the 30x30 Hessian
    to produce the prior for the next frame (reference: Marginalize
    src/Optimizer.cc:2960).

    Both states are BODY states; the visual block maps the current body
    state back to the camera through the T_bc extrinsics (reference:
    ImuCamPose, include/G2oTypes.h:60-128). R_prev/p_prev must therefore be
    body-frame (callers convert via the same extrinsics).
    State layout x = [prev: phi(3), dp(3), dv(3), dbg(3), dba(3) |
                      cur:  phi(3), dp(3), dv(3), dbg(3), dba(3)],
    with R = R0 exp(phi), p = p0 + dp (world frame), anchored at the
    previous solution / IMU prediction.
    """
    if R_bc is None:
        R_bc = jnp.eye(3)
    if t_bc is None:
        t_bc = jnp.zeros(3)
    # current-state anchor (body) from the camera pose seed
    R_cur0, p_cur0 = _body_from_cam(T_cw0.R, T_cw0.t, R_bc, t_bc)
    v_cur0 = v_prev + GRAVITY_VEC * dT + jnp.einsum("ij,j->i", R_prev, dV)

    # whitening factors. The preintegration covariance alone under-states
    # the residual: the WORLD gravity direction is only known to staged-init
    # accuracy (~0.5-1 deg after VIBA2), and an unmodeled tilt of angle a
    # biases r_v by ~g*sin(a)*dT and r_p by ~0.5*g*sin(a)*dT^2 — tens of
    # sigma against an ideal-IMU covariance. Without this floor the IMU
    # factor fights the visual rows after every init stage and the device
    # VI pipeline's inliers decay to the loss floor (measured on the ring
    # scenes); the reference sidesteps it with real-IMU noise floors.
    _TILT_SIG = 9.81 * 0.01  # 1-sigma residual gravity tilt ~0.57 deg
    g_v = (_TILT_SIG * dT) ** 2
    g_p = (0.5 * _TILT_SIG * dT * dT) ** 2
    C_floor = jnp.diag(
        jnp.concatenate(
            [jnp.zeros(3), jnp.full(3, g_v), jnp.full(3, g_p)]
        ).astype(jnp.float32)
    )
    jitter9 = 1e-10 * jnp.eye(9)
    C9 = jnp.eye(9) * 1e-6 if C is None else 0.5 * (C[:9, :9] + C[:9, :9].T)
    C9 = C9 + C_floor
    L_inert = jnp.linalg.cholesky(
        jnp.linalg.inv(C9 + jitter9) + jitter9
    )  # info = L L^T, whitened r' = L^T r
    # bias random walk over the gap (reference EdgeGyroRW/EdgeAccRW with the
    # walk covariance block of the preintegration)
    C_rw = (
        jnp.eye(6) * 1e-8
        if C is None
        else 0.5 * (C[9:15, 9:15] + C[9:15, 9:15].T)
    )
    L_rw = jnp.linalg.cholesky(jnp.linalg.inv(C_rw + 1e-12 * jnp.eye(6)) + 1e-12 * jnp.eye(6))
    H_p = 0.5 * (H_prior + H_prior.T)
    L_prior = jnp.linalg.cholesky(H_p + 1e-8 * jnp.eye(15))

    def unpack(x):
        phi_p, dp_p, dv_p = x[0:3], x[3:6], x[6:9]
        dbg_p, dba_p = x[9:12], x[12:15]
        phi_c, dp_c, dv_c = x[15:18], x[18:21], x[21:24]
        dbg_c, dba_c = x[24:27], x[27:30]
        Rp = R_prev @ so3.exp(phi_p)
        pp = p_prev + dp_p
        vp = v_prev + dv_p
        Rc = R_cur0 @ so3.exp(phi_c)
        pc_ = p_cur0 + dp_c
        vc = v_cur0 + dv_c
        return (Rp, pp, vp, dbg_p, dba_p), (Rc, pc_, vc, dbg_c, dba_c)

    def visual_residuals(z6):
        """Visual rows as a function of ONLY the current-pose increment
        x[15:21]. Splitting this out lets the GN jacobian run forward-mode
        over 6 tangents instead of 30 — the visual block carries thousands
        of rows and dominated the old full-x jacfwd 5x (hot path: the
        chunked VI device step runs this twice per frame).

        With ur_obs/bf, rows with ur_obs >= 0 additionally carry the
        rectified-stereo residual uR_pred - uR (reference:
        EdgeStereoOnlyPose in the inertial frame solves,
        include/G2oTypes.h:442)."""
        Rc = R_cur0 @ so3.exp(z6[:3])
        pc_b = p_cur0 + z6[3:6]
        R_cw, t_cw = _cam_from_body(Rc, pc_b, R_bc, t_bc)
        pcam = pts_w @ R_cw.T + t_cw
        uv = project(cam, pcam)
        sq = jnp.sqrt(jnp.maximum(inv_s2, 1e-9))
        r = (uv - uv_obs) * sq[:, None]
        if ur_obs is not None:
            z = jnp.maximum(pcam[..., 2], 1e-6)
            ur_pred = uv[..., 0] - bf / z
            is_st = ur_obs >= 0
            r3 = jnp.where(is_st, (ur_pred - ur_obs) * sq, 0.0)
            r = jnp.concatenate([r, r3[:, None]], axis=-1)
            delta = jnp.where(is_st, DELTA_STEREO, DELTA_MONO)
        else:
            delta = DELTA_MONO
        chi2 = jnp.sum(r * r, axis=-1)
        w_rob = jnp.sqrt(huber_weight(chi2, delta))
        w = valid.astype(r.dtype) * (pcam[..., 2] > 0.05)
        return (r * (w * w_rob)[:, None]).reshape(-1)

    def small_residuals(x):
        """Inertial + random-walk + prior rows (30 of them): full-x
        jacobian stays forward-mode but over a tiny output."""
        (Rp, pp, vp, dbg_p, dba_p), (Rc, pc_b, vc, dbg_c, dba_c) = unpack(x)
        dR_c = dR @ so3.exp(JRg @ dbg_p)
        dV_c = dV + JVg @ dbg_p + JVa @ dba_p
        dP_c = dP + JPg @ dbg_p + JPa @ dba_p
        RiT = Rp.T
        r_R = so3.log(dR_c.T @ RiT @ Rc)
        r_v = RiT @ (vc - vp - GRAVITY_VEC * dT) - dV_c
        r_p = RiT @ (pc_b - pp - vp * dT - 0.5 * GRAVITY_VEC * dT * dT) - dP_c
        r_inert = L_inert.T @ jnp.concatenate([r_R, r_v, r_p])
        r_rw = L_rw.T @ jnp.concatenate([dbg_c - dbg_p, dba_c - dba_p])
        r_prior = L_prior.T @ x[:15]
        return jnp.concatenate([r_inert, r_rw, r_prior])

    def residuals(x):
        return jnp.concatenate([visual_residuals(x[15:21]), small_residuals(x)])

    def system_at(x):
        """(H, b, cost) of the full residual, with the visual jacobian
        evaluated over its 6 live dims only and scattered into the 30x30."""
        rv = visual_residuals(x[15:21])
        Jv = jax.jacfwd(visual_residuals)(x[15:21])  # (N2, 6)
        rs = small_residuals(x)
        Js = jax.jacfwd(small_residuals)(x)  # (30, 30)
        H = Js.T @ Js
        H = H.at[15:21, 15:21].add(Jv.T @ Jv)
        b = Js.T @ rs
        b = b.at[15:21].add(Jv.T @ rv)
        cost = jnp.sum(rv * rv) + jnp.sum(rs * rs)
        return H, b, cost

    def cost_at(x):
        rv = visual_residuals(x[15:21])
        rs = small_residuals(x)
        return jnp.sum(rv * rv) + jnp.sum(rs * rs)

    def gn_step(_, carry):
        x, lam = carry
        H, b, cost = system_at(x)
        Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-8 * jnp.eye(30)
        dx = -jnp.linalg.solve(Hd, b)
        x_new = x + dx
        good = cost_at(x_new) < cost
        x = jnp.where(good, x_new, x)
        lam = jnp.where(good, lam * 0.5, lam * 4.0)
        return x, lam

    x, _ = jax.lax.fori_loop(
        0, iters, gn_step, (jnp.zeros(30, jnp.float32), jnp.asarray(1e-3))
    )
    (_, _, _, _, _), (Rc, pc_b, vc, dbg_c, dba_c) = unpack(x)
    Rc = so3.normalize(Rc)
    R_cw, t_cw = _cam_from_body(Rc, pc_b, R_bc, t_bc)
    T = SE3(R_cw, t_cw)
    pcam = pts_w @ R_cw.T + t_cw
    uv = project(cam, pcam)
    chi2 = jnp.sum((uv - uv_obs) ** 2, axis=-1) * inv_s2
    if ur_obs is not None:
        z = jnp.maximum(pcam[..., 2], 1e-6)
        r3 = jnp.where(ur_obs >= 0, uv[..., 0] - bf / z - ur_obs, 0.0)
        chi2 = chi2 + r3 * r3 * inv_s2
        thr = jnp.where(ur_obs >= 0, CHI2_STEREO, CHI2_MONO)
    else:
        thr = CHI2_MONO
    inl = valid & (chi2 < thr) & (pcam[..., 2] > 0)
    # marginalize the previous state out of the final Hessian
    H, _, _ = system_at(x)
    H_pp = H[:15, :15] + 1e-6 * jnp.eye(15)
    H_cc = H[15:, 15:]
    H_cp = H[15:, :15]
    H_marg = H_cc - H_cp @ jnp.linalg.solve(H_pp, H_cp.T)
    H_marg = 0.5 * (H_marg + H_marg.T)
    return VIMargResult(
        T, vc, dbg_c, dba_c, inl, jnp.sum(inl), H_marg, Rc, pc_b
    )
