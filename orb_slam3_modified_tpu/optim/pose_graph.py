"""Essential-graph / pose-graph optimization over Sim3 and 4-DoF.

TPU-native replacement for Optimizer::OptimizeEssentialGraph
(reference: src/Optimizer.cc:1501; 4-DoF inertial variant :5292) and g2o's
sim3 types (Thirdparty/g2o/g2o/types/types_seven_dof_expmap.cpp).

Design: poses as a dense (K, 7) sim3-tangent state around the initial
values; each edge residual r_ij = log_sim3(S_ij_meas * S_j * S_i^-1)
(measurement = S_i_meas_rel so residual is 0 at the measured relative pose).
Jacobians come from jax.jacfwd of the whole stacked residual w.r.t. the
tangent state — the graph is small (K <= a few hundred, E ~ 5K), so a dense
GN with one (7K, 7K) solve per iteration is MXU-cheap and avoids sparse
bookkeeping entirely. Fixed vertices are pinned via jacobian masking.

The 4-DoF variant (yaw + translation, used for inertial maps where
roll/pitch/scale are observable from gravity) masks the tangent to
[tx, ty, tz, yaw].
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..lie import sim3 as sim3m
from ..lie import so3
from ..lie.sim3 import Sim3


class PoseGraphProblem(NamedTuple):
    S: Sim3  # (K,) current/initial absolute poses (world->kf, like Scw)
    fixed: jnp.ndarray  # (K,) bool
    edge_i: jnp.ndarray  # (E,) int32
    edge_j: jnp.ndarray  # (E,) int32
    S_ji_meas: Sim3  # (E,) measured relative pose S_j * S_i^-1
    edge_weight: jnp.ndarray  # (E,)
    edge_valid: jnp.ndarray  # (E,)


def make_relative(S: Sim3, edge_i, edge_j) -> Sim3:
    """Measured relatives from current absolutes: S_ji = S_j @ S_i^-1."""
    Si = Sim3(S.s[edge_i], S.R[edge_i], S.t[edge_i])
    Sj = Sim3(S.s[edge_j], S.R[edge_j], S.t[edge_j])
    return Sj @ Si.inverse()


def _apply_tangent(S: Sim3, xi):
    """Left-multiplicative update: S' = exp(xi) * S, batched."""
    dS = sim3m.exp(xi)
    return dS @ S


def _residuals(prob: PoseGraphProblem, xi_flat, dof_mask):
    K = prob.S.t.shape[0]
    xi = (xi_flat.reshape(K, 7) * dof_mask[None, :])
    xi = jnp.where(prob.fixed[:, None], 0.0, xi)
    S_new = _apply_tangent(prob.S, xi)
    Si = Sim3(S_new.s[prob.edge_i], S_new.R[prob.edge_i], S_new.t[prob.edge_i])
    Sj = Sim3(S_new.s[prob.edge_j], S_new.R[prob.edge_j], S_new.t[prob.edge_j])
    # r = log( S_ji_meas * S_i * S_j^-1 ): zero when S_j S_i^-1 == meas
    err = (prob.S_ji_meas @ Si) @ Sj.inverse()
    r = sim3m.log(err)  # (E, 7)
    w = jnp.sqrt(jnp.maximum(prob.edge_weight, 0.0)) * prob.edge_valid
    return (r * w[:, None]).reshape(-1)


@partial(jax.jit, static_argnums=(1, 2))
def optimize_pose_graph(
    prob: PoseGraphProblem,
    four_dof: bool = False,
    iters: int = 20,
):
    """Run dense GN on the pose graph. Returns optimized Sim3 (K,).

    four_dof=True restricts updates to translation+yaw (reference:
    OptimizeEssentialGraph4DoF for inertial maps).
    """
    K = prob.S.t.shape[0]
    if four_dof:
        dof_mask = jnp.array([1.0, 1.0, 1.0, 0.0, 0.0, 1.0, 0.0])
    else:
        dof_mask = jnp.ones(7)

    def gn_step(_, carry):
        S_cur, lam = carry
        p = prob._replace(S=S_cur)
        xi0 = jnp.zeros(K * 7)
        r = _residuals(p, xi0, dof_mask)
        J = jax.jacfwd(lambda x: _residuals(p, x, dof_mask))(xi0)
        H = J.T @ J
        b = J.T @ r
        # pin fixed + masked dofs
        free = (
            (~prob.fixed[:, None]) & (dof_mask[None, :] > 0)
        ).reshape(-1)
        H = jnp.where(free[:, None] & free[None, :], H, 0.0)
        H = H + jnp.diag(jnp.where(free, lam * jnp.diag(H) + 1e-6, 1.0))
        b = jnp.where(free, b, 0.0)
        dx = -jnp.linalg.solve(H, b)
        S_new = _apply_tangent(
            S_cur,
            jnp.where(
                prob.fixed[:, None], 0.0, dx.reshape(K, 7) * dof_mask[None, :]
            ),
        )
        c_old = jnp.sum(r * r)
        r_new = _residuals(prob._replace(S=S_new), jnp.zeros(K * 7), dof_mask)
        c_new = jnp.sum(r_new * r_new)
        good = c_new < c_old
        S_out = Sim3(
            jnp.where(good, S_new.s, S_cur.s),
            jnp.where(good, S_new.R, S_cur.R),
            jnp.where(good, S_new.t, S_cur.t),
        )
        lam = jnp.where(good, lam * 0.5, lam * 4.0)
        return S_out, lam

    S_fin, _ = jax.lax.fori_loop(0, iters, gn_step, (prob.S, jnp.asarray(1e-4)))
    return Sim3(S_fin.s, so3.normalize(S_fin.R), S_fin.t)
