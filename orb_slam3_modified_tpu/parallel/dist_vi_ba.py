"""Distributed visual-INERTIAL full bundle adjustment over a device mesh.

Extends parallel/dist_ba.py's point-partitioned layout to the joint
visual-inertial system (reference scale anchor: Optimizer::FullInertialBA
over the whole map, src/Optimizer.cc:392-560 — single-core in the
reference; BASELINE.json names "visual-inertial full BA ... sharded" as the
north star).

Layout:
- visual observations + points: sharded by owning point (H_pp, b_p, W and
  the point back-substitution stay device-local, exactly like dist_ba).
- the 15K-dim keyframe state (pose 6 + velocity 3 + gyro/acc bias 6 per KF)
  and the K-1 preintegration edges: REPLICATED. The inertial edge system is
  tiny (15K x 15K with K <= 200) — every device assembles it identically
  from replicated inputs (free compared to one psum of the same size) and
  adds the psum-ed visual Schur complement into the pose block.
- per-iteration collective volume: ONE psum of the (6K,6K)+(6K) visual
  camera system + two cost scalars — independent of map size.

The LM schedule, Jacobi preconditioning, bias priors and random-walk edges
mirror optim/vi_ba.py (the single-device solver); results match it on one
device by construction (same math, same gates).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..cameras import Camera
from ..lie import se3, so3
from ..lie.se3 import SE3
from ..optim.vi_ba import (
    VIBAProblem,
    VIBAResult,
    _edge_system,
    _inertial_cost,
    _reseed_velocities,
)
from .dist_ba import (
    _visual_cost_local,
    _visual_local_systems,
    partition_by_point,
)


def partition_vi_problem(prob: VIBAProblem, n_shards: int):
    """Group the visual part of a VIBAProblem by point shard (numpy).

    Returns (prob_grouped, P_l): prob_grouped has its points/observations
    re-ordered into n_shards contiguous blocks; everything inertial is
    untouched (replicated later).
    """
    from ..optim.ba import BAProblem

    vis = BAProblem(
        T_cw=prob.T_cw, cam_fixed=prob.cam_fixed,
        points=prob.points, pt_valid=prob.pt_valid,
        obs_cam=prob.obs_cam, obs_pt=prob.obs_pt, obs_uv=prob.obs_uv,
        obs_inv_s2=prob.obs_inv_s2, obs_valid=prob.obs_valid,
    )
    part = partition_by_point(vis, n_shards)
    # shard-local obs_pt indices must be re-globalized per shard inside the
    # kernel; keep them local here (the step adds the shard offset)
    grouped = prob._replace(
        points=part.points,
        pt_valid=part.pt_valid,
        obs_cam=part.obs_cam,
        obs_pt=part.obs_pt,
        obs_uv=part.obs_uv,
        obs_inv_s2=part.obs_inv_s2,
        obs_valid=part.obs_valid,
    )
    return grouped, part


def make_dist_vi_ba_step(mesh: Mesh, cam: Camera, K: int, P_l: int, axis: str = "ba"):
    """One sharded LM iteration of the joint VI system."""
    from jax import shard_map

    n_x = 15 * K

    def step_local(Rk, tk, v, bg, ba, pts_local, ptv_local,
                   obs_cam, obs_pt, obs_uv, obs_is2, obs_val,
                   chain, edge_i, edge_j, bg_lin, ba_lin, rw_g, rw_a,
                   prior_g, prior_a, R_bc, t_bc,
                   cam_fixed, state_fixed, lam, inlier):
        obs = {
            "cam": obs_cam, "pt": obs_pt, "uv": obs_uv, "is2": obs_is2,
            "val": obs_val, "ptv": ptv_local, "ur": None, "bf": None,
        }
        (H_pose, b_pose, S_part, b_red_part, H_pp_inv, W, b_p, w, rmask,
         c_local) = _visual_local_systems(
            cam, Rk, tk, pts_local, obs, K, P_l, lam, inlier=inlier
        )
        S_pose = jax.lax.psum(H_pose - S_part, axis)
        b_pose_red = jax.lax.psum(b_pose - b_red_part, axis)

        # replicated inertial system (identical on every device)
        prob_rep = VIBAProblem(
            T_cw=SE3(Rk, tk), cam_fixed=cam_fixed,
            points=pts_local, pt_valid=ptv_local,
            obs_cam=obs_cam, obs_pt=obs_pt, obs_uv=obs_uv,
            obs_inv_s2=obs_is2, obs_valid=obs_val,
            v_w=v, bg=bg, ba=ba, chain=chain,
            edge_i=edge_i, edge_j=edge_j, bg_lin=bg_lin, ba_lin=ba_lin,
            rw_info_g=rw_g, rw_info_a=rw_a,
            prior_g=prior_g, prior_a=prior_a, R_bc=R_bc, t_bc=t_bc,
            state_fixed=state_fixed,
        )
        H_in, b_in, c_inert = _edge_system(prob_rep, Rk, tk, v, bg, ba, n_x, K)
        H = H_in.at[: 6 * K, : 6 * K].add(S_pose)
        b = b_in.at[: 6 * K].add(b_pose_red)
        H = H.at[9 * K : 9 * K + 3, 9 * K : 9 * K + 3].add(prior_g * jnp.eye(3))
        H = H.at[12 * K : 12 * K + 3, 12 * K : 12 * K + 3].add(
            prior_a * jnp.eye(3)
        )
        b = b.at[9 * K : 9 * K + 3].add(prior_g * bg[0])
        b = b.at[12 * K : 12 * K + 3].add(prior_a * ba[0])
        fixed15 = jnp.concatenate(
            [
                jnp.repeat(cam_fixed, 6),
                jnp.repeat(state_fixed, 3),
                jnp.repeat(state_fixed, 3),
                jnp.repeat(state_fixed, 3),
            ]
        )
        H = H + jnp.diag(lam * jnp.diag(H) + 1e-8)
        H = jnp.where(fixed15[:, None] | fixed15[None, :], 0.0, H)
        H = H + jnp.diag(jnp.where(fixed15, 1.0, 0.0))
        b = jnp.where(fixed15, 0.0, b)
        d_inv = jax.lax.rsqrt(jnp.maximum(jnp.diag(H), 1e-12))
        Hs = H * d_inv[:, None] * d_inv[None, :]
        dx = -jnp.linalg.solve(Hs, b * d_inv) * d_inv
        dx_pose = dx[: 6 * K].reshape(K, 6)
        dv = dx[6 * K : 9 * K].reshape(K, 3)
        dbg = dx[9 * K : 12 * K].reshape(K, 3)
        dba = dx[12 * K :].reshape(K, 3)
        dx_pt = -jnp.einsum(
            "pcd,pd->pc", H_pp_inv, b_p + jnp.einsum("pac,a->pc", W, dx[: 6 * K])
        )
        R_new = jax.vmap(lambda d, R: se3.exp(d).R @ R)(dx_pose, Rk)
        t_new = jax.vmap(lambda d, R, t: (se3.exp(d) @ SE3(R, t)).t)(dx_pose, Rk, tk)
        pts_new = pts_local + dx_pt
        v_new, bg_new, ba_new = v + dv, bg + dbg, ba + dba

        def priors(bgx, bax):
            return prior_g * jnp.sum(bgx[0] ** 2) + prior_a * jnp.sum(bax[0] ** 2)

        c_old = jax.lax.psum(c_local, axis) + c_inert + priors(bg, ba)
        c_vis_new = _visual_cost_local(cam, R_new, t_new, pts_new, obs, w, rmask)
        c_vis_new = jnp.where(jnp.isfinite(c_vis_new), c_vis_new, jnp.inf)
        c_new = (
            jax.lax.psum(c_vis_new, axis)
            + _inertial_cost(prob_rep, R_new, t_new, v_new, bg_new, ba_new)
            + priors(bg_new, ba_new)
        )
        good = c_new < c_old
        Rk = jnp.where(good, R_new, Rk)
        tk = jnp.where(good, t_new, tk)
        pts_out = jnp.where(good, pts_new, pts_local)
        v = jnp.where(good, v_new, v)
        bg = jnp.where(good, bg_new, bg)
        ba = jnp.where(good, ba_new, ba)
        lam = jnp.where(good, lam * 0.5, lam * 5.0)
        return Rk, tk, v, bg, ba, pts_out, lam

    rep, sh = P(), P(axis)
    chain_spec = jax.tree_util.tree_map(lambda _: rep, _chain_struct())
    return jax.jit(
        shard_map(
            step_local,
            mesh=mesh,
            in_specs=(
                rep, rep, rep, rep, rep,  # Rk tk v bg ba
                sh, sh,                   # points, pt_valid
                sh, sh, sh, sh, sh,       # observations
                chain_spec, rep, rep, rep, rep, rep, rep,  # inertial edges
                rep, rep, rep, rep,       # priors + extrinsics
                rep, rep, rep,            # cam_fixed, state_fixed, lam
                sh,                       # inlier mask (obs-shaped)
            ),
            out_specs=(rep, rep, rep, rep, rep, sh, rep),
            check_vma=False,
        )
    )


def _chain_struct():
    """A pytree prototype matching InertialChain's structure for specs."""
    from ..optim.inertial import InertialChain

    z = 0
    return InertialChain(
        dT=z, dR=z, dV=z, dP=z, JRg=z, JVg=z, JVa=z, JPg=z, JPa=z, C_inv=z,
        valid=z,
    )


def dist_vi_bundle_adjust(
    prob: VIBAProblem,
    cam: Camera,
    mesh: Mesh,
    rounds: int = 2,
    iters_per_round: int = 8,
):
    """Distributed replacement for optim.vi_ba.vi_bundle_adjust.

    Same schedule (rounds x iters + chi2 reclassification between rounds);
    points/observations sharded by point, 15K state replicated.
    Returns a VIBAResult with GLOBAL (gathered) point array.
    """
    axis = mesh.axis_names[0]
    n = mesh.shape[axis]
    K = int(np.asarray(prob.T_cw.t).shape[0])
    grouped, part = partition_vi_problem(prob, n)
    step = make_dist_vi_ba_step(mesh, cam, K, part.P_l, axis)

    from . import multihost

    sh = P(axis)
    pts = multihost.distribute_array(part.points, mesh, sh)
    ptv = multihost.distribute_array(part.pt_valid, mesh, sh)
    oc = multihost.distribute_array(part.obs_cam, mesh, sh)
    op = multihost.distribute_array(part.obs_pt, mesh, sh)
    ouv = multihost.distribute_array(part.obs_uv, mesh, sh)
    ois = multihost.distribute_array(part.obs_inv_s2, mesh, sh)
    oval = multihost.distribute_array(part.obs_valid, mesh, sh)

    state_fixed = (
        prob.state_fixed if prob.state_fixed is not None else prob.cam_fixed
    )
    # velocity reseed on the replicated inertial system (see vi_ba)
    v0 = _vseed(grouped, prob, K, state_fixed)

    Rk = jnp.asarray(np.asarray(prob.T_cw.R, np.float32))
    tk = jnp.asarray(np.asarray(prob.T_cw.t, np.float32))
    v = jnp.asarray(v0)
    bg = jnp.asarray(np.asarray(prob.bg, np.float32))
    ba = jnp.asarray(np.asarray(prob.ba, np.float32))
    cam_fixed = jnp.asarray(np.asarray(prob.cam_fixed, bool))
    state_fixed = jnp.asarray(np.asarray(state_fixed, bool))
    chain = jax.tree_util.tree_map(jnp.asarray, grouped.chain)
    lam = jnp.asarray(1e-4, jnp.float32)
    inlier = oval
    for rnd in range(rounds):
        for _ in range(iters_per_round):
            Rk, tk, v, bg, ba, pts, lam = step(
                Rk, tk, v, bg, ba, pts, ptv,
                oc, op, ouv, ois, oval,
                chain, grouped.edge_i, grouped.edge_j,
                grouped.bg_lin, grouped.ba_lin,
                grouped.rw_info_g, grouped.rw_info_a,
                jnp.asarray(grouped.prior_g), jnp.asarray(grouped.prior_a),
                jnp.asarray(grouped.R_bc), jnp.asarray(grouped.t_bc),
                cam_fixed, state_fixed, lam, inlier,
            )
        # chi2 reclassification between rounds (replicated poses + sharded
        # points: compute per-shard, stays sharded)
        inlier = _reclassify(mesh, cam, K, part.P_l, axis)(
            Rk, tk, pts, ptv, oc, op, ouv, ois, oval
        )
    return VIBAResult(
        T_cw=SE3(so3.normalize(Rk), tk),
        points=pts,
        v_w=v, bg=bg, ba=ba,
        obs_inlier=inlier,
        chi2_vis=None,
        cost_inertial=None,
    ), part


def _vseed(grouped, prob, K, state_fixed):
    # device-convert EVERY leaf: problems built by optim.vi_ba.build_vi_problem
    # are numpy end-to-end, and numpy arrays cannot be indexed by the vmap
    # tracers inside _edge_system
    prob_rep = jax.tree_util.tree_map(jnp.asarray, grouped)
    prob_rep = prob_rep._replace(
        T_cw=SE3(
            jnp.asarray(np.asarray(prob.T_cw.R, np.float32)),
            jnp.asarray(np.asarray(prob.T_cw.t, np.float32)),
        ),
    )
    return _reseed_velocities(
        prob_rep,
        prob_rep.T_cw.R, prob_rep.T_cw.t,
        jnp.asarray(np.asarray(prob.v_w, np.float32)),
        jnp.asarray(np.asarray(prob.bg, np.float32)),
        jnp.asarray(np.asarray(prob.ba, np.float32)),
        15 * K, K,
        jnp.asarray(np.asarray(state_fixed, bool)),
    )


def _reclassify(mesh: Mesh, cam: Camera, K: int, P_l: int, axis: str):
    from jax import shard_map

    from ..optim.ba import BAProblem, _obs_residuals
    from ..optim.robust import CHI2_MONO

    def local(Rk, tk, pts_local, ptv, oc, op, ouv, ois, oval):
        prob_like = BAProblem(
            T_cw=SE3(Rk, tk), cam_fixed=None,
            points=pts_local, pt_valid=ptv,
            obs_cam=oc, obs_pt=op, obs_uv=ouv,
            obs_inv_s2=ois, obs_valid=oval,
        )
        r, _, _, pc = _obs_residuals(prob_like, cam, Rk, tk, pts_local)
        chi2 = jnp.sum(r * r, axis=-1) * ois
        chi2 = jnp.where(pc[..., 2] > 0, chi2, jnp.inf)
        return oval & (chi2 < CHI2_MONO)

    rep, sh = P(), P(axis)
    return jax.jit(
        shard_map(
            local, mesh=mesh,
            in_specs=(rep, rep, sh, sh, sh, sh, sh, sh, sh),
            out_specs=sh,
            check_vma=False,
        )
    )
