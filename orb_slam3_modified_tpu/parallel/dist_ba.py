"""Distributed bundle adjustment over a device mesh.

The reference has NO distributed anything (SURVEY.md §2.3/§5.8) — its largest
solve is whole-map FullInertialBA on one core. This module is the north-star
TPU design from BASELINE.json: shard the BA workload over a
jax.sharding.Mesh and reduce the Schur system with XLA collectives.

Sharding layout (v2, partition-by-point):
- points are partitioned into contiguous per-device ranges, and EVERY
  observation of a point lives on the point's shard (host-side grouping in
  partition_by_point). Point Hessian blocks H_pp, point gradients b_p and
  the camera-point coupling W therefore stay fully LOCAL — no collective
  touches anything sized by P or O.
- poses are replicated (camera count is small: <=200 even for global BA).
- the only cross-shard coupling is the reduced camera system: the
  block-diagonal H_cc (K,6,6), b_c (K,6) and the Schur outer product
  S_part (6K,6K) are psum-ed; every device solves the (6K,6K) system
  redundantly (cheap vs. the reduction) and back-substitutes its own
  point shard.

v1 replicated the full point state and psum-ed (P,6K,3) tensors; v2's
per-iteration collective volume is O((6K)^2) regardless of map size —
the layout the SURVEY §5.7 reduce_scatter/all_reduce plan calls for.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..cameras import Camera
from ..lie import se3, so3
from ..lie.se3 import SE3
from ..optim.ba import BAProblem, _obs_residuals
from ..optim.robust import DELTA_MONO, huber_weight


def _round_up(n, q):
    return ((n + q - 1) // q) * q


def pad_problem_for_mesh(prob: BAProblem, n_shards: int) -> BAProblem:
    """Pad O and P to multiples of the mesh size."""
    O = prob.obs_cam.shape[0]
    Pn = prob.points.shape[0]
    Ob = _round_up(O, n_shards)
    Pb = _round_up(Pn, n_shards)
    if (Ob, Pb) == (O, Pn):
        return prob
    po, pp = Ob - O, Pb - Pn
    return BAProblem(
        T_cw=prob.T_cw,
        cam_fixed=prob.cam_fixed,
        points=jnp.concatenate([prob.points, jnp.zeros((pp, 3), prob.points.dtype)]),
        pt_valid=jnp.concatenate([prob.pt_valid, jnp.zeros(pp, bool)]),
        obs_cam=jnp.concatenate([prob.obs_cam, jnp.zeros(po, jnp.int32)]),
        obs_pt=jnp.concatenate([prob.obs_pt, jnp.zeros(po, jnp.int32)]),
        obs_uv=jnp.concatenate([prob.obs_uv, jnp.zeros((po, 2), prob.obs_uv.dtype)]),
        obs_inv_s2=jnp.concatenate([prob.obs_inv_s2, jnp.ones(po, prob.obs_inv_s2.dtype)]),
        obs_valid=jnp.concatenate([prob.obs_valid, jnp.zeros(po, bool)]),
    )


class PartitionedProblem:
    """Host-side point-partitioned view of a BAProblem.

    points: (n, P_l, 3) concatenated as (n*P_l, 3) — shard i owns points
    [i*P_l, (i+1)*P_l) of the PERMUTED point array (perm maps new->old).
    Observations are grouped by owning shard and padded to a common O_l.
    """

    def __init__(self, prob: BAProblem, n_shards: int):
        obs_pt = np.asarray(prob.obs_pt)
        obs_valid = np.asarray(prob.obs_valid)
        Pn = prob.points.shape[0]
        P_pad = _round_up(max(Pn, n_shards), n_shards)
        self.P_l = P_pad // n_shards
        self.n_shards = n_shards
        self.perm = np.arange(P_pad)  # new point order (identity + padding)
        # contiguous ranges own the points; observations follow their point
        owner = np.minimum(obs_pt // self.P_l, n_shards - 1)
        counts = np.bincount(owner[obs_valid], minlength=n_shards)
        O_l = int(_round_up(max(int(counts.max()), 1), 8))
        self.O_l = O_l
        n_obs = len(obs_pt)
        oc = np.zeros((n_shards, O_l), np.int32)
        op = np.zeros((n_shards, O_l), np.int32)
        ouv = np.zeros((n_shards, O_l, 2), np.float32)
        ois = np.ones((n_shards, O_l), np.float32)
        oval = np.zeros((n_shards, O_l), bool)
        obs_cam = np.asarray(prob.obs_cam)
        obs_uv = np.asarray(prob.obs_uv)
        obs_is2 = np.asarray(prob.obs_inv_s2)
        fill = np.zeros(n_shards, np.int32)
        for o in range(n_obs):
            if not obs_valid[o]:
                continue
            s = int(owner[o])
            i = fill[s]
            oc[s, i] = obs_cam[o]
            op[s, i] = obs_pt[o] - s * self.P_l  # LOCAL point index
            ouv[s, i] = obs_uv[o]
            ois[s, i] = obs_is2[o]
            oval[s, i] = True
            fill[s] += 1
        pts = np.zeros((P_pad, 3), np.float32)
        ptv = np.zeros(P_pad, bool)
        pts[:Pn] = np.asarray(prob.points)
        ptv[:Pn] = np.asarray(prob.pt_valid)
        self.obs_cam = jnp.asarray(oc.reshape(-1))
        self.obs_pt = jnp.asarray(op.reshape(-1))
        self.obs_uv = jnp.asarray(ouv.reshape(-1, 2))
        self.obs_inv_s2 = jnp.asarray(ois.reshape(-1))
        self.obs_valid = jnp.asarray(oval.reshape(-1))
        self.points = jnp.asarray(pts)
        self.pt_valid = jnp.asarray(ptv)
        self.Pn = Pn


def make_dist_ba_step(mesh: Mesh, cam: Camera, K: int, P_l: int, axis: str = "ba"):
    """Build the sharded one-LM-iteration step over a point-partitioned
    problem. All point/observation structures are shard-local; cross-shard
    coupling is ONLY the psum of the (K,6,6)+(6K,6K) camera system."""
    from jax import shard_map

    def step_local(Rk, tk, pts_local, obs_cam, obs_pt, obs_uv, obs_is2, obs_val,
                   pt_valid_local, cam_fixed, lam):
        prob_like = BAProblem(
            T_cw=SE3(Rk, tk), cam_fixed=cam_fixed,
            points=pts_local, pt_valid=pt_valid_local,
            obs_cam=obs_cam, obs_pt=obs_pt, obs_uv=obs_uv,
            obs_inv_s2=obs_is2, obs_valid=obs_val,
        )
        r, Jpose, Jpt, pc = _obs_residuals(prob_like, cam, Rk, tk, pts_local)
        chi2 = jnp.sum(r * r, axis=-1) * obs_is2
        w = (
            obs_val.astype(r.dtype)
            * pt_valid_local[obs_pt].astype(r.dtype)
            * huber_weight(chi2, DELTA_MONO)
            * obs_is2
        )
        w = jnp.where(pc[..., 2] > 0, w, 0.0)
        wJc = w[:, None, None] * Jpose  # (O_l, 2, 6)
        # block-diagonal camera Hessian: one obs touches exactly one camera
        Hc = jax.lax.psum(
            jax.ops.segment_sum(
                jnp.einsum("ora,orb->oab", wJc, Jpose), obs_cam, num_segments=K
            ),
            axis,
        )  # (K, 6, 6)
        b_c = jax.lax.psum(
            jax.ops.segment_sum(
                jnp.einsum("ora,or->oa", wJc, r), obs_cam, num_segments=K
            ),
            axis,
        )  # (K, 6)
        # point structures: fully local (observations were grouped by point)
        H_pp = jax.ops.segment_sum(
            jnp.einsum("o,ora,orb->oab", w, Jpt, Jpt), obs_pt, num_segments=P_l
        )
        b_p = jax.ops.segment_sum(
            jnp.einsum("o,ora,or->oa", w, Jpt, r), obs_pt, num_segments=P_l
        )
        comb = obs_pt * K + obs_cam
        W = jax.ops.segment_sum(
            jnp.einsum("ora,orb->oab", wJc, Jpt), comb, num_segments=P_l * K
        ).reshape(P_l, K * 6, 3)  # camera-point coupling, local
        H_pp_d = H_pp + jnp.eye(3, dtype=r.dtype) * (
            lam * jnp.diagonal(H_pp, axis1=-2, axis2=-1) + 1e-8
        )[..., :, None]
        H_pp_inv = jnp.linalg.inv(
            jnp.where(pt_valid_local[:, None, None], H_pp_d, jnp.eye(3, dtype=r.dtype))
        )
        H_pp_inv = jnp.where(pt_valid_local[:, None, None], H_pp_inv, 0.0)
        # Schur reduction: local outer products, ONE (6K,6K) psum
        S_part = jnp.einsum("pac,pcd,pbd->ab", W, H_pp_inv, W)
        b_red_part = jnp.einsum("pac,pcd,pd->a", W, H_pp_inv, b_p)
        # block-diagonal H_cc -> dense (6K, 6K)
        S = jnp.zeros((K * 6, K * 6), r.dtype)
        idx = jnp.arange(K)
        S = S.at[
            (idx[:, None, None] * 6 + jnp.arange(6)[None, :, None]),
            (idx[:, None, None] * 6 + jnp.arange(6)[None, None, :]),
        ].set(Hc)
        S = S - jax.lax.psum(S_part, axis)
        b_red = b_c.reshape(-1) - jax.lax.psum(b_red_part, axis)
        diagS = jnp.diag(S)
        S = S + jnp.diag(lam * diagS + 1e-8)
        fixed6 = jnp.repeat(cam_fixed, 6)
        S = jnp.where(fixed6[:, None] | fixed6[None, :], 0.0, S)
        S = S + jnp.diag(jnp.where(fixed6, 1.0, 0.0))
        b_red = jnp.where(fixed6, 0.0, b_red)
        dx_cam = -jnp.linalg.solve(S, b_red)
        dx_pt = -jnp.einsum(
            "pcd,pd->pc", H_pp_inv, b_p + jnp.einsum("pac,a->pc", W, dx_cam)
        )
        dx_cam = dx_cam.reshape(K, 6)
        R_new = jax.vmap(lambda d, R: se3.exp(d).R @ R)(dx_cam, Rk)
        t_new = jax.vmap(lambda d, R, t: (se3.exp(d) @ SE3(R, t)).t)(dx_cam, Rk, tk)
        pts_new = pts_local + dx_pt
        # accept/reject on the global cost (psum of local weighted chi2)
        c_old = jax.lax.psum(jnp.sum(w * chi2), axis)
        prob2 = prob_like._replace(T_cw=SE3(R_new, t_new), points=pts_new)
        r2, _, _, pc2 = _obs_residuals(prob2, cam, R_new, t_new, pts_new)
        chi2n = jnp.sum(r2 * r2, axis=-1) * obs_is2
        c_new = jax.lax.psum(
            jnp.sum(jnp.where(pc2[..., 2] > 0, w * chi2n, w * chi2)), axis
        )
        good = c_new < c_old
        Rk = jnp.where(good, R_new, Rk)
        tk = jnp.where(good, t_new, tk)
        pts_out = jnp.where(good, pts_new, pts_local)
        lam = jnp.where(good, lam * 0.5, lam * 5.0)
        return Rk, tk, pts_out, lam

    sharded = jax.jit(
        shard_map(
            step_local,
            mesh=mesh,
            in_specs=(
                P(), P(),                      # Rk, tk (replicated)
                P(axis),                       # points (sharded by owner)
                P(axis), P(axis), P(axis), P(axis), P(axis),  # observations
                P(axis),                       # pt_valid (sharded)
                P(), P(),                      # cam_fixed, lam
            ),
            out_specs=(P(), P(), P(axis), P()),
            check_vma=False,
        )
    )
    return sharded


def dist_bundle_adjust(prob: BAProblem, cam: Camera, mesh: Mesh, iters: int = 10):
    """Run `iters` sharded LM iterations. Returns (SE3, points) with points
    in the original order (padding stripped by the caller via [:P])."""
    n = mesh.shape["ba"]
    part = PartitionedProblem(prob, n)
    K = prob.T_cw.t.shape[0]
    step = make_dist_ba_step(mesh, cam, K, part.P_l)

    lam = jnp.asarray(1e-4, prob.points.dtype)
    Rk, tk, pts = prob.T_cw.R, prob.T_cw.t, part.points
    for _ in range(iters):
        Rk, tk, pts, lam = step(
            Rk, tk, pts,
            part.obs_cam, part.obs_pt, part.obs_uv, part.obs_inv_s2,
            part.obs_valid, part.pt_valid, prob.cam_fixed, lam,
        )
    return SE3(so3.normalize(Rk), tk), pts
