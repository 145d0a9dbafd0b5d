"""Sharded essential-graph (pose-graph) relaxation over a device mesh.

Reference: Optimizer::OptimizeEssentialGraph (src/Optimizer.cc:1501) and
the 4-DoF inertial variant (:5292) — single-core sparse g2o there.
BASELINE.json's north star names "pose-graph relaxation sharded the same
way" as the distributed BA.

Layout:
- Sim3 states (K, 7-dim tangent each): replicated — the state is tiny.
- edges (temporal + strong-covis + loop): SHARDED. Each device computes
  per-edge 7-D residuals and their (7, 14) local jacobians via vmapped
  jacfwd (each edge touches only vertices i and j), scatters them into its
  local (7K, 7K) normal system, and the mesh psums ONE (7K,7K)+(7K)
  system per GN iteration. This also replaces the single-device solver's
  dense jacfwd over the full 7K tangent (O(K) passes over every edge) with
  O(1) passes — the sharding and the better jacobian structure come
  together.
- every device solves the reduced system redundantly (cheap vs the psum).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..lie import sim3 as sim3m
from ..lie import so3
from ..lie.sim3 import Sim3
from ..optim.pose_graph import PoseGraphProblem


def _round_up(n, q):
    return ((n + q - 1) // q) * q


def _edge_residual_local(S, meas_s, meas_R, meas_t, i, j, z, dof_mask):
    """7-D residual of one edge as a function of the 14-D local increment
    z = [xi_i (7) | xi_j (7)] applied to vertices i and j."""
    xi_i = z[:7] * dof_mask
    xi_j = z[7:] * dof_mask
    Si = sim3m.exp(xi_i) @ Sim3(S.s[i], S.R[i], S.t[i])
    Sj = sim3m.exp(xi_j) @ Sim3(S.s[j], S.R[j], S.t[j])
    meas = Sim3(meas_s, meas_R, meas_t)
    err = (meas @ Si) @ Sj.inverse()
    return sim3m.log(err)


def make_dist_pose_graph_step(mesh: Mesh, K: int, axis: str = "pg"):
    from jax import shard_map

    n_x = 7 * K

    def step_local(S_s, S_R, S_t, ei, ej, ms, mR, mt, ew, ev,
                   fixed, dof_mask, lam):
        S = Sim3(S_s, S_R, S_t)
        E = ei.shape[0]
        z0 = jnp.zeros(14)

        def res_e(e, z):
            r = _edge_residual_local(
                S, ms[e], mR[e], mt[e], ei[e], ej[e], z, dof_mask
            )
            w = jnp.sqrt(jnp.maximum(ew[e], 0.0)) * ev[e]
            return r * w

        r = jax.vmap(lambda e: res_e(e, z0))(jnp.arange(E))  # (E, 7)
        J = jax.vmap(lambda e: jax.jacfwd(lambda z: res_e(e, z))(z0))(
            jnp.arange(E)
        )  # (E, 7, 14)

        def cols_of(i, j):
            return jnp.concatenate([7 * i + jnp.arange(7), 7 * j + jnp.arange(7)])

        cols = jax.vmap(cols_of)(ei, ej)  # (E, 14)
        sel = (cols[:, :, None] == jnp.arange(n_x)[None, None, :]).astype(J.dtype)
        Jg = jnp.einsum("erc,ecx->erx", J, sel)  # (E, 7, n_x)
        H = jax.lax.psum(jnp.einsum("era,erb->ab", Jg, Jg), axis)
        b = jax.lax.psum(jnp.einsum("era,er->a", Jg, r), axis)
        c_old = jax.lax.psum(jnp.sum(r * r), axis)

        free = ((~fixed[:, None]) & (dof_mask[None, :] > 0)).reshape(-1)
        H = jnp.where(free[:, None] & free[None, :], H, 0.0)
        H = H + jnp.diag(jnp.where(free, lam * jnp.diag(H) + 1e-6, 1.0))
        b = jnp.where(free, b, 0.0)
        dx = -jnp.linalg.solve(H, b)
        xi = jnp.where(fixed[:, None], 0.0, dx.reshape(K, 7) * dof_mask[None, :])
        S_new = sim3m.exp(xi) @ S

        r_new = jax.vmap(
            lambda e: _edge_residual_local(
                S_new, ms[e], mR[e], mt[e], ei[e], ej[e], jnp.zeros(14), dof_mask
            )
            * (jnp.sqrt(jnp.maximum(ew[e], 0.0)) * ev[e])
        )(jnp.arange(E))
        c_new = jax.lax.psum(jnp.sum(r_new * r_new), axis)
        good = c_new < c_old
        S_out = Sim3(
            jnp.where(good, S_new.s, S.s),
            jnp.where(good, S_new.R, S.R),
            jnp.where(good, S_new.t, S.t),
        )
        lam = jnp.where(good, lam * 0.5, lam * 4.0)
        return S_out.s, S_out.R, S_out.t, lam

    rep, sh = P(), P(axis)
    return jax.jit(
        shard_map(
            step_local,
            mesh=mesh,
            in_specs=(
                rep, rep, rep,            # state
                sh, sh, sh, sh, sh, sh, sh,  # edges
                rep, rep, rep,            # fixed, dof_mask, lam
            ),
            out_specs=(rep, rep, rep, rep),
            check_vma=False,
        )
    )


def dist_optimize_pose_graph(
    prob: PoseGraphProblem,
    mesh: Mesh,
    four_dof: bool = False,
    iters: int = 20,
):
    """Sharded-edge pose graph relaxation; same semantics as
    optim.pose_graph.optimize_pose_graph."""
    axis = mesh.axis_names[0]
    n = mesh.shape[axis]
    K = int(np.asarray(prob.S.t).shape[0])
    E = int(np.asarray(prob.edge_i).shape[0])
    Eb = _round_up(max(E, n), n)

    def padn(a, fill=0.0):
        a = np.asarray(a)
        out = np.full((Eb, *a.shape[1:]), fill, a.dtype)
        out[:E] = a
        return out

    ei = padn(prob.edge_i)
    ej = padn(prob.edge_j)
    ms = padn(np.asarray(prob.S_ji_meas.s, np.float32), 1.0)
    mR = padn(np.asarray(prob.S_ji_meas.R, np.float32))
    mR[E:] = np.eye(3, dtype=np.float32)
    mt = padn(np.asarray(prob.S_ji_meas.t, np.float32))
    ew = padn(np.asarray(prob.edge_weight, np.float32))
    ev = padn(np.asarray(prob.edge_valid, bool), False).astype(np.float32)

    from . import multihost

    sh = P(axis)
    arrays = [
        multihost.distribute_array(x, mesh, sh)
        for x in (ei, ej, ms, mR, mt, ew, ev)
    ]
    step = make_dist_pose_graph_step(mesh, K, axis)
    if four_dof:
        dof_mask = jnp.array([1.0, 1.0, 1.0, 0.0, 0.0, 1.0, 0.0])
    else:
        dof_mask = jnp.ones(7)
    S_s = jnp.asarray(np.asarray(prob.S.s, np.float32))
    S_R = jnp.asarray(np.asarray(prob.S.R, np.float32))
    S_t = jnp.asarray(np.asarray(prob.S.t, np.float32))
    fixed = jnp.asarray(np.asarray(prob.fixed, bool))
    lam = jnp.asarray(1e-4, jnp.float32)
    for _ in range(iters):
        S_s, S_R, S_t, lam = step(
            S_s, S_R, S_t, *arrays, fixed, dof_mask, lam
        )
    return Sim3(S_s, so3.normalize(S_R), S_t)
