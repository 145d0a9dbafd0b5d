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
from .robust import CHI2_MONO, DELTA_MONO, huber_weight


class VIPoseResult(NamedTuple):
    T_cw: SE3
    v_w: jnp.ndarray  # (3,)
    dbg: jnp.ndarray
    dba: jnp.ndarray
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray


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
):
    """Identity camera-body extrinsics variant (R_bc=I): body pose == camera
    pose; callers with real extrinsics fold Tbc into the prev state."""
    if v_init is None:
        v_init = v_prev

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
        # inertial block (body == camera, R_wb = R_cw^T, p = camera center)
        R_wb = jnp.swapaxes(T.R, -1, -2)
        p_wb = -jnp.einsum("ij,j->i", R_wb, T.t)
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
