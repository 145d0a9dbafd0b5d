"""Inertial factors and visual-inertial optimizers.

TPU-native replacement for the G2oTypes inertial vertices/edges (reference:
include/G2oTypes.h — EdgeInertial :495, EdgeInertialGS :548, EdgeGyroRW/
EdgeAccRW :635/:671, VertexGDir :274, VertexScale :296) and the Optimizer
methods that assemble them: InertialOptimization (src/Optimizer.cc:3042,
:3227, :3389) for staged IMU initialization and the inertial residual used
by LocalInertialBA / FullInertialBA (src/Optimizer.cc:2383, :392).

State layout per keyframe: R_wb (3,3), p_w (3,), v_w (3,), bias is shared
during init (single bg/ba, as the reference's inertial-only MAP init does).
Residuals follow Forster's preintegration paper (the reference's EdgeInertial
computeError, src/G2oTypes.cc:600 region):
  r_R = Log( dR(bg)^T R_i^T R_j )
  r_v = R_i^T (v_j - v_i - g dt) - dV(b)
  r_p = R_i^T (p_j - p_i - v_i dt - 0.5 g dt^2) - dP(b)

The init optimizer treats {gravity direction (2 dof), log-scale, shared
biases, all velocities} as unknowns with poses fixed, exactly like the
reference's inertial-only MAP (scale+gravity refinement), and solves by
Gauss-Newton on a dense parameter vector via jax autodiff jacobians —
the parameter count is tiny (6 + 2 + 1 + 3K), so one dense solve per
iteration is MXU-trivial.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..imu.preintegration import GRAVITY
from ..lie import so3


class InertialChain(NamedTuple):
    """Stacked preintegrated constraints along the temporal keyframe chain.

    K keyframes -> K-1 constraints; arrays stacked over the constraint axis.
    """

    dT: jnp.ndarray  # (E,)
    dR: jnp.ndarray  # (E, 3, 3)
    dV: jnp.ndarray  # (E, 3)
    dP: jnp.ndarray  # (E, 3)
    JRg: jnp.ndarray  # (E, 3, 3)
    JVg: jnp.ndarray  # (E, 3, 3)
    JVa: jnp.ndarray  # (E, 3, 3)
    JPg: jnp.ndarray  # (E, 3, 3)
    JPa: jnp.ndarray  # (E, 3, 3)
    C_inv: jnp.ndarray  # (E, 9, 9) information of [r_R, r_v, r_p]
    valid: jnp.ndarray  # (E,) bool

    @staticmethod
    def from_preintegrated(pres: list, dtype=jnp.float32):
        import numpy as np

        def stack(f):
            return jnp.asarray(np.stack([np.asarray(f(p)) for p in pres]))

        C = np.stack([np.asarray(p.C)[:9, :9] for p in pres])
        C = C + np.eye(9, dtype=np.float32) * 1e-10
        C_inv = jnp.asarray(np.linalg.inv(C))
        return InertialChain(
            dT=stack(lambda p: p.dT),
            dR=stack(lambda p: p.dR),
            dV=stack(lambda p: p.dV),
            dP=stack(lambda p: p.dP),
            JRg=stack(lambda p: p.JRg),
            JVg=stack(lambda p: p.JVg),
            JVa=stack(lambda p: p.JVa),
            JPg=stack(lambda p: p.JPg),
            JPa=stack(lambda p: p.JPa),
            C_inv=C_inv,
            valid=jnp.ones(len(pres), bool),
        )


def inertial_residuals(
    chain: InertialChain,
    R_wb,  # (K, 3, 3)
    p_w,  # (K, 3)
    v_w,  # (K, 3)
    bg,
    ba,
    g_w,  # (3,) gravity vector in world
    scale,  # () applied to positions (mono init)
):
    """(E, 9) stacked [r_R, r_v, r_p] residuals for consecutive-kf factors."""
    Ri, Rj = R_wb[:-1], R_wb[1:]
    pi, pj = p_w[:-1] * scale, p_w[1:] * scale
    vi, vj = v_w[:-1], v_w[1:]
    dt = chain.dT[:, None]

    dR_corr = chain.dR @ so3.exp(
        jnp.einsum("eij,j->ei", chain.JRg, bg)
    )
    dV_corr = chain.dV + jnp.einsum("eij,j->ei", chain.JVg, bg) + jnp.einsum(
        "eij,j->ei", chain.JVa, ba
    )
    dP_corr = chain.dP + jnp.einsum("eij,j->ei", chain.JPg, bg) + jnp.einsum(
        "eij,j->ei", chain.JPa, ba
    )
    RiT = jnp.swapaxes(Ri, -1, -2)
    r_R = so3.log(jnp.swapaxes(dR_corr, -1, -2) @ RiT @ Rj)
    r_v = jnp.einsum("eij,ej->ei", RiT, vj - vi - g_w[None] * dt) - dV_corr
    r_p = (
        jnp.einsum(
            "eij,ej->ei", RiT, pj - pi - vi * dt - 0.5 * g_w[None] * dt * dt
        )
        - dP_corr
    )
    return jnp.concatenate([r_R, r_v, r_p], axis=-1)


class InertialInitResult(NamedTuple):
    R_wg: jnp.ndarray  # (3, 3) gravity-alignment rotation (world' = R_wg^T world)
    scale: jnp.ndarray  # ()
    bg: jnp.ndarray  # (3,)
    ba: jnp.ndarray  # (3,)
    v_w: jnp.ndarray  # (K, 3) velocities
    cost: jnp.ndarray  # () final cost


def linear_inertial_init(chain: InertialChain, R_wb, p_w):
    """Closed-form seed: with rotations fixed and biases ~0, the constraints
    r_v = 0, r_p = 0 are LINEAR in x = [scale, g(3), v_1..v_K(3K)]:
      s R_i^T (p_j - p_i) - R_i^T v_i dt - 0.5 R_i^T g dt^2 = dP
      R_i^T (v_j - v_i) - R_i^T g dt = dV
    (the Martinelli / VINS-Mono visual-inertial alignment). Solving this
    least-squares system first keeps the nonlinear refinement out of the
    scale-collapse local minimum that short keyframe chains exhibit.
    """
    K = R_wb.shape[0]
    E = K - 1
    RiT = jnp.swapaxes(R_wb[:-1], -1, -2)  # (E, 3, 3)
    dp = p_w[1:] - p_w[:-1]
    dt = chain.dT[:, None]
    n_x = 4 + 3 * K
    rows = []
    rhs = []
    Z = jnp.zeros((E, 3, 3))
    I = jnp.broadcast_to(jnp.eye(3), (E, 3, 3))
    # position rows
    col_s = jnp.einsum("eij,ej->ei", RiT, dp)[..., None]  # (E, 3, 1)
    col_g = -0.5 * RiT * (dt**2)[..., None]  # (E, 3, 3)
    A_p = jnp.zeros((E, 3, n_x))
    A_p = A_p.at[..., 0:1].set(col_s)
    A_p = A_p.at[..., 1:4].set(col_g)
    # v_i coefficient: -RiT*dt at block i
    idx_i = jnp.arange(E)
    # use scatter via one-hot over K blocks
    onehot_i = (idx_i[:, None] == jnp.arange(K)[None, :]).astype(p_w.dtype)
    onehot_j = ((idx_i + 1)[:, None] == jnp.arange(K)[None, :]).astype(p_w.dtype)
    vi_coef = -RiT * dt[..., None]  # (E, 3, 3)
    A_p_v = jnp.einsum("ek,eab->ekab", onehot_i, vi_coef)  # (E, K, 3, 3)
    A_p = A_p.at[..., 4:].set(
        A_p_v.transpose(0, 2, 1, 3).reshape(E, 3, 3 * K)
    )
    b_p = chain.dP
    # velocity rows
    A_v = jnp.zeros((E, 3, n_x))
    A_v = A_v.at[..., 1:4].set(-RiT * dt[..., None])
    Av_blocks = jnp.einsum("ek,eab->ekab", onehot_j - onehot_i, RiT)
    A_v = A_v.at[..., 4:].set(Av_blocks.transpose(0, 2, 1, 3).reshape(E, 3, 3 * K))
    b_v = chain.dV
    A = jnp.concatenate([A_p.reshape(-1, n_x), A_v.reshape(-1, n_x)], axis=0)
    b = jnp.concatenate([b_p.reshape(-1), b_v.reshape(-1)])
    x, _, _, _ = jnp.linalg.lstsq(A, b)
    s = x[0]
    g = x[1:4]
    v = x[4:].reshape(K, 3)
    return s, g, v


@partial(jax.jit, static_argnums=(4, 5))
def inertial_only_optimization(
    chain: InertialChain,
    R_wb,
    p_w,
    v0,
    fix_scale: bool = False,
    iters: int = 30,
    prior_gyro: float = 1e2,
    prior_acc: float = 1e10,
):
    """Inertial-only MAP: optimize gravity dir (2dof), log-scale, shared
    biases, and per-kf velocities with poses fixed.

    Reference: Optimizer::InertialOptimization (src/Optimizer.cc:3042) with
    the same bias priors (priorG=1e2, priorA=1e10|1e5 passed from
    LocalMapping::InitializeIMU, src/LocalMapping.cc:1212 region).
    Gravity is parameterized as Exp([a, b, 0]) applied to the nominal
    [0,0,-G] (VertexGDir's 2-dof update, include/G2oTypes.h:274).
    """
    K = R_wb.shape[0]

    def unpack(theta):
        ab = theta[:2]
        s = jnp.where(fix_scale, 0.0, theta[2])
        bg = theta[3:6]
        ba = theta[6:9]
        v = theta[9:].reshape(K, 3)
        g_w = so3.exp(jnp.concatenate([ab, jnp.zeros(1)])) @ jnp.array(
            [0.0, 0.0, -GRAVITY]
        )
        return g_w, jnp.exp(s), bg, ba, v

    def whitened(theta):
        g_w, s, bg, ba, v = unpack(theta)
        r = inertial_residuals(chain, R_wb, p_w, v, bg, ba, g_w, s)
        # whiten per-edge with chol of C_inv: r' = L^T r where C_inv = L L^T
        L = jnp.linalg.cholesky(
            0.5 * (chain.C_inv + jnp.swapaxes(chain.C_inv, -1, -2))
        )
        rw = jnp.einsum("eji,ej->ei", L, r)
        rw = jnp.where(chain.valid[:, None], rw, 0.0)
        # bias priors
        pri = jnp.concatenate(
            [bg * jnp.sqrt(prior_gyro), ba * jnp.sqrt(prior_acc)]
        )
        return jnp.concatenate([rw.reshape(-1), pri])

    # seed from the closed-form linear alignment (scale/gravity/velocities);
    # the nonlinear problem has a scale-collapse local minimum for short
    # chains that the linear solution avoids
    s_lin, g_lin, v_lin = linear_inertial_init(chain, R_wb, p_w)
    g_norm = jnp.linalg.norm(g_lin)
    g_ok = (g_norm > 0.5 * GRAVITY) & (g_norm < 2.0 * GRAVITY) & (s_lin > 1e-3)
    g_dir0 = jnp.where(g_ok, g_lin / jnp.maximum(g_norm, 1e-9), jnp.array([0.0, 0.0, -1.0]))
    gI0 = jnp.array([0.0, 0.0, -1.0])
    axis0 = jnp.cross(gI0, g_dir0)
    na = jnp.linalg.norm(axis0)
    ang0 = jnp.arctan2(na, jnp.clip(jnp.dot(gI0, g_dir0), -1.0, 1.0))
    ab0 = jnp.where(na < 1e-9, jnp.zeros(3), axis0 / jnp.maximum(na, 1e-9) * ang0)[:2]
    log_s0 = jnp.where(g_ok & ~jnp.asarray(fix_scale), jnp.log(jnp.maximum(s_lin, 1e-3)), 0.0)
    v_seed = jnp.where(g_ok, v_lin, v0)
    theta0 = jnp.concatenate(
        [
            jnp.where(g_ok, ab0, jnp.zeros(2)),
            log_s0[None],
            jnp.zeros(6, jnp.float32),
            v_seed.reshape(-1).astype(jnp.float32),
        ]
    )

    def gn_step(_, carry):
        theta, lam = carry
        r = whitened(theta)
        J = jax.jacfwd(whitened)(theta)
        H = J.T @ J
        b = J.T @ r
        H = H + (lam * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(H.shape[0]))
        dx = -jnp.linalg.solve(H, b)
        theta_new = theta + dx
        c_old = jnp.sum(r * r)
        c_new = jnp.sum(whitened(theta_new) ** 2)
        good = c_new < c_old
        theta = jnp.where(good, theta_new, theta)
        lam = jnp.where(good, lam * 0.5, lam * 4.0)
        return theta, lam

    theta, _ = jax.lax.fori_loop(0, iters, gn_step, (theta0, jnp.asarray(1e-3)))
    g_w, s, bg, ba, v = unpack(theta)
    # R_wg aligns estimated gravity to [0,0,-G]
    gI = jnp.array([0.0, 0.0, -1.0])
    g_dir = g_w / jnp.linalg.norm(g_w)
    vaxis = jnp.cross(gI, g_dir)
    norm_v = jnp.linalg.norm(vaxis)
    cosg = jnp.clip(jnp.dot(gI, g_dir), -1.0, 1.0)
    ang = jnp.arctan2(norm_v, cosg)
    axis = vaxis / jnp.where(norm_v < 1e-9, 1.0, norm_v)
    R_wg = so3.exp(axis * ang)
    cost = jnp.sum(whitened(theta) ** 2)
    return InertialInitResult(R_wg, s, bg, ba, v, cost)
