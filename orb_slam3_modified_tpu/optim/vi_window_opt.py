"""Visual-inertial temporal-window optimization.

TPU-native replacement for Optimizer::LocalInertialBA (reference:
src/Optimizer.cc:2383: temporal window of Nd=10 keyframes along the mPrevKF
chain + fixed anchor, visual reprojection + EdgeInertial + bias random-walk)
— structured here as a refinement pass over {poses, velocities, shared bias}
with map points held fixed (the dense-Schur visual BA owns point updates;
alternating the two passes approximates the joint solve at a fraction of
the state size).

State x = [xi_1..xi_K (6K) | v_1..v_K (3K) | dbg(3) | dba(3)]; residuals are
the batched visual block over all window observations plus K-1 chain
inertial factors; dense GN with jacfwd (state <= ~100 dims). One jitted
dispatch per call. Identity camera-body extrinsics variant.
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
from .inertial import InertialChain
from .robust import DELTA_MONO, huber_weight


class VIWindowResult(NamedTuple):
    T_cw: SE3  # (K,)
    v_w: jnp.ndarray  # (K, 3)
    dbg: jnp.ndarray
    dba: jnp.ndarray


@partial(jax.jit, static_argnums=(10,))
def vi_window_optimization(
    T_cw0: SE3,  # (K,) window poses, temporal order
    v0,  # (K, 3) velocities
    fixed,  # (K,) bool — anchor (oldest) fixed
    cam: Camera,
    pts_w,  # (O, 3) observed points (fixed)
    obs_kf,  # (O,) int32 window index per observation
    obs_uv,  # (O, 2)
    obs_inv_s2,  # (O,)
    obs_valid,  # (O,)
    chain: InertialChain,  # K-1 factors between consecutive window kfs
    iters: int = 8,
    inertial_weight: float = 1.0,
    bias_prior: float = 1e4,
):
    K = T_cw0.t.shape[0]

    def unpack(x):
        xi = x[: 6 * K].reshape(K, 6)
        xi = jnp.where(fixed[:, None], 0.0, xi)
        T = se3.exp(xi) @ T_cw0
        v = v0 + x[6 * K : 9 * K].reshape(K, 3)
        dbg = x[9 * K : 9 * K + 3]
        dba = x[9 * K + 3 : 9 * K + 6]
        return T, v, dbg, dba

    def residuals(x):
        T, v, dbg, dba = unpack(x)
        # visual
        Rk = T.R[obs_kf]
        tk = T.t[obs_kf]
        pc = jnp.einsum("oij,oj->oi", Rk, pts_w) + tk
        uv = project(cam, pc)
        r = (uv - obs_uv) * jnp.sqrt(jnp.maximum(obs_inv_s2, 1e-9))[:, None]
        chi2 = jnp.sum(r * r, axis=-1)
        w = (
            obs_valid.astype(r.dtype)
            * (pc[..., 2] > 0.05)
            * jnp.sqrt(huber_weight(chi2, DELTA_MONO))
        )
        r_vis = (r * w[:, None]).reshape(-1)
        # inertial chain (body == camera)
        R_wb = jnp.swapaxes(T.R, -1, -2)
        p_wb = -jnp.einsum("kij,kj->ki", R_wb, T.t)
        Ri, Rj = R_wb[:-1], R_wb[1:]
        pi, pj = p_wb[:-1], p_wb[1:]
        vi, vj = v[:-1], v[1:]
        dt = chain.dT[:, None]
        dR_c = chain.dR @ so3.exp(jnp.einsum("eij,j->ei", chain.JRg, dbg))
        dV_c = chain.dV + jnp.einsum("eij,j->ei", chain.JVg, dbg) + jnp.einsum(
            "eij,j->ei", chain.JVa, dba
        )
        dP_c = chain.dP + jnp.einsum("eij,j->ei", chain.JPg, dbg) + jnp.einsum(
            "eij,j->ei", chain.JPa, dba
        )
        RiT = jnp.swapaxes(Ri, -1, -2)
        r_R = so3.log(jnp.swapaxes(dR_c, -1, -2) @ RiT @ Rj)
        r_v = jnp.einsum("eij,ej->ei", RiT, vj - vi - GRAVITY_VEC[None] * dt) - dV_c
        r_p = (
            jnp.einsum(
                "eij,ej->ei",
                RiT,
                pj - pi - vi * dt - 0.5 * GRAVITY_VEC[None] * dt * dt,
            )
            - dP_c
        )
        r_inert = (
            jnp.concatenate([r_R, r_v, r_p], axis=-1)
            * chain.valid[:, None]
            * inertial_weight
        ).reshape(-1)
        r_bias = jnp.concatenate([dbg, dba]) * jnp.sqrt(bias_prior)
        return jnp.concatenate([r_vis, r_inert, r_bias])

    n_x = 9 * K + 6

    def gn_step(_, carry):
        x, lam = carry
        r = residuals(x)
        J = jax.jacfwd(residuals)(x)
        H = J.T @ J
        b = J.T @ r
        Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-8 * jnp.eye(n_x)
        dx = -jnp.linalg.solve(Hd, b)
        x_new = x + dx
        good = jnp.sum(residuals(x_new) ** 2) < jnp.sum(r * r)
        x = jnp.where(good, x_new, x)
        lam = jnp.where(good, lam * 0.5, lam * 4.0)
        return x, lam

    x, _ = jax.lax.fori_loop(
        0, iters, gn_step, (jnp.zeros(n_x, jnp.float32), jnp.asarray(1e-3))
    )
    T, v, dbg, dba = unpack(x)
    return VIWindowResult(SE3(so3.normalize(T.R), T.t), v, dbg, dba)
