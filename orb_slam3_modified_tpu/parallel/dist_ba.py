"""Distributed bundle adjustment over a device mesh.

The reference has NO distributed anything (SURVEY.md §2.3/§5.8) — its largest
solve is whole-map FullInertialBA on one core. This module is the north-star
TPU design from BASELINE.json: shard the BA workload over a
jax.sharding.Mesh and reduce the Schur system with XLA collectives.

Sharding layout (v1, data-parallel over factors):
- observations: sharded along O across the "ba" mesh axis
- points: sharded along P (each shard owns P/n point blocks)
- poses: replicated (camera count is small: <=200 even for global BA)
Per-shard partial H_cc/b_c and per-point Schur contributions are psum-ed;
every device then solves the (6K, 6K) reduced camera system redundantly
(cheap vs. the reduction) and back-substitutes its own point shard.

Collectives used: psum over ICI — the shard_map equivalent of the
reduce_scatter/all_reduce plan in SURVEY.md §5.7.
"""
from __future__ import annotations

from functools import partial

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


def make_dist_ba_step(mesh: Mesh, cam: Camera, K: int, axis: str = "ba"):
    """Build the sharded one-LM-iteration step function.

    Returns step(prob, Rk, tk, pts, inlier, lam) -> (Rk, tk, pts, lam)
    with observation/point arrays sharded along `axis` and pose state
    replicated. All cross-shard coupling goes through psum.
    """
    from jax import shard_map

    def step_local(Rk, tk, pts_full, obs_cam, obs_pt, obs_uv, obs_is2, obs_val,
                   pt_valid_full, cam_fixed, pt_shard_ids, lam):
        # ---- local residuals on this shard's observations
        prob_like = BAProblem(
            T_cw=SE3(Rk, tk), cam_fixed=cam_fixed,
            points=pts_full, pt_valid=pt_valid_full,
            obs_cam=obs_cam, obs_pt=obs_pt, obs_uv=obs_uv,
            obs_inv_s2=obs_is2, obs_valid=obs_val,
        )
        r, Jpose, Jpt, pc = _obs_residuals(prob_like, cam, Rk, tk, pts_full)
        chi2 = jnp.sum(r * r, axis=-1) * obs_is2
        w = (
            obs_val.astype(r.dtype)
            * pt_valid_full[obs_pt].astype(r.dtype)
            * huber_weight(chi2, DELTA_MONO)
            * obs_is2
        )
        w = jnp.where(pc[..., 2] > 0, w, 0.0)
        Pn = pts_full.shape[0]
        onehot = (obs_cam[:, None] == jnp.arange(K)[None, :]).astype(r.dtype)
        Jc = jnp.einsum("ok,orj->orkj", onehot, Jpose).reshape(-1, 2, K * 6)
        wJc = w[:, None, None] * Jc
        H_cc = jax.lax.psum(jnp.einsum("ora,orb->ab", wJc, Jc), axis)
        b_c = jax.lax.psum(jnp.einsum("ora,or->a", wJc, r), axis)
        # per-point blocks over FULL point index space, psum-combined
        H_pp = jax.lax.psum(
            jax.ops.segment_sum(
                jnp.einsum("o,ora,orb->oab", w, Jpt, Jpt), obs_pt, num_segments=Pn
            ),
            axis,
        )
        b_p = jax.lax.psum(
            jax.ops.segment_sum(
                jnp.einsum("o,ora,or->oa", w, Jpt, r), obs_pt, num_segments=Pn
            ),
            axis,
        )
        W = jax.lax.psum(
            jax.ops.segment_sum(
                jnp.einsum("ora,orb->oab", wJc, Jpt), obs_pt, num_segments=Pn
            ),
            axis,
        )
        H_pp_d = H_pp + jnp.eye(3, dtype=r.dtype) * (
            lam * jnp.diagonal(H_pp, axis1=-2, axis2=-1) + 1e-8
        )[..., :, None]
        H_pp_inv = jnp.linalg.inv(
            jnp.where(pt_valid_full[:, None, None], H_pp_d, jnp.eye(3, dtype=r.dtype))
        )
        H_pp_inv = jnp.where(pt_valid_full[:, None, None], H_pp_inv, 0.0)
        # Schur reduction: shard the sum over points, psum the (6K, 6K) result
        my = pt_shard_ids  # (P_local,) indices of points this shard owns
        S_part = jnp.einsum(
            "pac,pcd,pbd->ab", W[my], H_pp_inv[my], W[my]
        )
        S = H_cc - jax.lax.psum(S_part, axis)
        b_red_part = jnp.einsum("pac,pcd,pd->a", W[my], H_pp_inv[my], b_p[my])
        b_red = b_c - jax.lax.psum(b_red_part, axis)
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
        pts_new = pts_full + dx_pt
        # accept/reject on the global cost (psum of local weighted chi2)
        c_old = jax.lax.psum(jnp.sum(w * chi2), axis)
        r2, _, _, pc2 = _obs_residuals(prob_like, cam, R_new, t_new, pts_new)
        chi2n = jnp.sum(r2 * r2, axis=-1) * obs_is2
        c_new = jax.lax.psum(jnp.sum(jnp.where(pc2[..., 2] > 0, w * chi2n, w * chi2)), axis)
        good = c_new < c_old
        Rk = jnp.where(good, R_new, Rk)
        tk = jnp.where(good, t_new, tk)
        pts_out = jnp.where(good, pts_new, pts_full)
        lam = jnp.where(good, lam * 0.5, lam * 5.0)
        return Rk, tk, pts_out, lam

    n = mesh.shape[axis]

    sharded = jax.jit(
        shard_map(
            step_local,
            mesh=mesh,
            in_specs=(
                P(), P(), P(),               # Rk, tk, points (replicated)
                P(axis), P(axis), P(axis), P(axis), P(axis),  # observations
                P(), P(), P(axis), P(),  # pt_valid, cam_fixed, pt_shard_ids, lam
            ),
            out_specs=(P(), P(), P(), P()),
            check_vma=False,
        )
    )

    def step(prob: BAProblem, lam):
        Pn = prob.points.shape[0]
        shard_ids = jnp.arange(Pn, dtype=jnp.int32)
        return sharded(
            prob.T_cw.R, prob.T_cw.t, prob.points,
            prob.obs_cam, prob.obs_pt, prob.obs_uv, prob.obs_inv_s2,
            prob.obs_valid, prob.pt_valid, prob.cam_fixed, shard_ids, lam,
        )

    return step


def dist_bundle_adjust(prob: BAProblem, cam: Camera, mesh: Mesh, iters: int = 10):
    """Run `iters` sharded LM iterations. Returns (SE3, points)."""
    prob = pad_problem_for_mesh(prob, mesh.shape["ba"])
    K = prob.T_cw.t.shape[0]
    step = make_dist_ba_step(mesh, cam, K)

    lam = jnp.asarray(1e-4, prob.points.dtype)
    Rk, tk, pts = prob.T_cw.R, prob.T_cw.t, prob.points
    cur = prob
    for _ in range(iters):
        Rk, tk, pts, lam = step(cur, lam)
        cur = cur._replace(T_cw=SE3(Rk, tk), points=pts)
    return SE3(so3.normalize(Rk), tk), pts
