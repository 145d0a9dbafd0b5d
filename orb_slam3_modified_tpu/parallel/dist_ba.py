"""Distributed bundle adjustment over a device mesh.

The reference has NO distributed anything (SURVEY.md §2.3/§5.8) — its largest
solve is whole-map FullInertialBA on one core. This module is the north-star
TPU design from BASELINE.json: shard the BA workload over a
jax.sharding.Mesh and reduce the Schur system with XLA collectives.

Sharding layout (v3, partition-by-point):
- points are partitioned into contiguous per-device ranges, and EVERY
  observation of a point lives on the point's shard (host-side grouping in
  partition_by_point — pure numpy, vectorized, so each PROCESS can build
  only its own shard rows in a multi-host job). Point Hessian blocks H_pp,
  point gradients b_p and the camera-point coupling W therefore stay fully
  LOCAL — no collective touches anything sized by P or O.
- poses are replicated (camera count is small: <=200 even for global BA).
- the only cross-shard coupling is the reduced camera system: the
  block-diagonal H_cc (K,6,6), b_c (K,6) and the Schur outer product
  S_part (6K,6K) are psum-ed; every device solves the (6K,6K) system
  redundantly (cheap vs. the reduction) and back-substitutes its own
  point shard.
- stereo rows (obs_ur >= 0) ride along: residuals become (u, v, uR) exactly
  like the single-device solver (reference EdgeStereo,
  include/G2oTypes.h:414).

v1 replicated the full point state and psum-ed (P,6K,3) tensors; v2's
per-iteration collective volume is O((6K)^2) regardless of map size; v3
adds stereo rows, vectorized host partitioning, and a pre-sharded input
path for true multi-process runs (each host feeds only its own rows via
multihost.distribute_array).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..cameras import Camera
from ..lie import se3, so3
from ..lie.se3 import SE3
from ..optim.ba import BAProblem, _obs_residuals
from ..optim.robust import DELTA_MONO, DELTA_STEREO, huber_weight


def _round_up(n, q):
    return ((n + q - 1) // q) * q


class PointPartition(NamedTuple):
    """Host-side point-partitioned view of a BAProblem (pure numpy).

    Shard i owns points [i*P_l, (i+1)*P_l); observations are grouped by the
    owning shard of their point, each storing the LOCAL point index. Arrays
    are the concatenation over shards (n_shards*X_l rows), so slicing rows
    [lo*X_l, hi*X_l) yields the host-local block for shards [lo, hi) — the
    multi-process ingestion path.
    """

    n_shards: int
    P_l: int
    O_l: int
    Pn: int  # original (unpadded) point count
    points: np.ndarray  # (n*P_l, 3)
    pt_valid: np.ndarray  # (n*P_l,)
    obs_cam: np.ndarray  # (n*O_l,)
    obs_pt: np.ndarray  # (n*O_l,) local point index within the shard
    obs_uv: np.ndarray  # (n*O_l, 2)
    obs_inv_s2: np.ndarray  # (n*O_l,)
    obs_valid: np.ndarray  # (n*O_l,)
    obs_ur: np.ndarray = None  # (n*O_l,) right-image u; None = mono problem


def partition_by_point(prob: BAProblem, n_shards: int) -> PointPartition:
    """Group observations by the shard that owns their point (vectorized)."""
    obs_pt = np.asarray(prob.obs_pt)
    obs_valid = np.asarray(prob.obs_valid)
    Pn = int(np.asarray(prob.points).shape[0])
    P_pad = _round_up(max(Pn, n_shards), n_shards)
    P_l = P_pad // n_shards
    owner = np.minimum(obs_pt // P_l, n_shards - 1)
    owner = np.where(obs_valid, owner, n_shards)  # invalid rows sort last
    order = np.argsort(owner, kind="stable")
    counts = np.bincount(owner[obs_valid], minlength=n_shards)[:n_shards]
    O_l = int(_round_up(max(int(counts.max()) if len(counts) else 1, 1), 8))

    def grouped(src, fill=0.0):
        src = np.asarray(src)
        out = np.full((n_shards * O_l, *src.shape[1:]), fill, src.dtype)
        srco = src[order]
        pos = 0
        for s in range(n_shards):
            c = int(counts[s])
            out[s * O_l : s * O_l + c] = srco[pos : pos + c]
            pos += c
        return out

    oc = grouped(prob.obs_cam)
    op_global = grouped(prob.obs_pt)
    shard_of_row = np.repeat(np.arange(n_shards), O_l)
    op = (op_global - shard_of_row * P_l).astype(np.int32)
    oval = grouped(prob.obs_valid, False)
    op[~oval] = 0
    pts = np.zeros((P_pad, 3), np.float32)
    ptv = np.zeros(P_pad, bool)
    pts[:Pn] = np.asarray(prob.points)
    ptv[:Pn] = np.asarray(prob.pt_valid)
    return PointPartition(
        n_shards=n_shards,
        P_l=P_l,
        O_l=O_l,
        Pn=Pn,
        points=pts,
        pt_valid=ptv,
        obs_cam=oc,
        obs_pt=op,
        obs_uv=grouped(prob.obs_uv),
        obs_inv_s2=grouped(prob.obs_inv_s2, 1.0),
        obs_valid=oval,
        obs_ur=None if prob.obs_ur is None else grouped(prob.obs_ur, -1.0),
    )


def local_rows(part: PointPartition, shard_lo: int, shard_hi: int) -> PointPartition:
    """The host-local block of a partition: rows of shards [lo, hi).

    In a multi-process job each process calls partition_by_point on its own
    (globally consistent) problem copy OR builds only these rows, then feeds
    them to multihost.distribute_array — no process ever has to materialize
    another host's device shards.
    """

    def po(a):
        return None if a is None else a[shard_lo * part.P_l : shard_hi * part.P_l]

    def oo(a):
        return None if a is None else a[shard_lo * part.O_l : shard_hi * part.O_l]

    return part._replace(
        points=po(part.points),
        pt_valid=po(part.pt_valid),
        obs_cam=oo(part.obs_cam),
        obs_pt=oo(part.obs_pt),
        obs_uv=oo(part.obs_uv),
        obs_inv_s2=oo(part.obs_inv_s2),
        obs_valid=oo(part.obs_valid),
        obs_ur=oo(part.obs_ur),
    )


def _visual_local_systems(cam, Rk, tk, pts_local, obs, K, P_l, lam, inlier=None):
    """Shard-local visual Schur pieces. obs is a dict-like of local arrays.
    Returns (S_part_pose (6K,6K) pre-psum pieces...) — see callers."""
    obs_cam, obs_pt = obs["cam"], obs["pt"]
    obs_uv, obs_is2, obs_val = obs["uv"], obs["is2"], obs["val"]
    obs_ur, bf = obs.get("ur"), obs.get("bf")
    prob_like = BAProblem(
        T_cw=SE3(Rk, tk), cam_fixed=None,
        points=pts_local, pt_valid=obs["ptv"],
        obs_cam=obs_cam, obs_pt=obs_pt, obs_uv=obs_uv,
        obs_inv_s2=obs_is2, obs_valid=obs_val,
        obs_ur=obs_ur, bf=bf,
    )
    r, Jpose, Jpt, pc = _obs_residuals(prob_like, cam, Rk, tk, pts_local)
    R_rows = r.shape[1]
    if obs_ur is not None:
        rmask = jnp.stack(
            [jnp.ones_like(obs_is2), jnp.ones_like(obs_is2),
             (obs_ur >= 0).astype(r.dtype)], axis=-1
        )
        delta = jnp.where(obs_ur >= 0, DELTA_STEREO, DELTA_MONO)
    else:
        rmask = jnp.ones((r.shape[0], 2), r.dtype)
        delta = DELTA_MONO
    chi2 = jnp.sum(r * r * rmask, axis=-1) * obs_is2
    w = (
        obs_val.astype(r.dtype)
        * obs["ptv"][obs_pt].astype(r.dtype)
        * huber_weight(chi2, delta)
        * obs_is2
    )
    if inlier is not None:
        w = w * inlier.astype(r.dtype)
    w = jnp.where(pc[..., 2] > 0, w, 0.0)
    wr = w[:, None] * rmask  # (O_l, R)
    onehot = (obs_cam[:, None] == jnp.arange(K)[None, :]).astype(r.dtype)
    Jc = jnp.einsum("ok,orj->orkj", onehot, Jpose).reshape(r.shape[0], R_rows, K * 6)
    wJc = wr[:, :, None] * Jc
    H_pose = jnp.einsum("ora,orb->ab", wJc, Jc)  # (6K, 6K) local
    b_pose = jnp.einsum("ora,or->a", wJc, r)
    H_pp = jax.ops.segment_sum(
        jnp.einsum("or,ora,orb->oab", wr, Jpt, Jpt), obs_pt, num_segments=P_l
    )
    b_p = jax.ops.segment_sum(
        jnp.einsum("or,ora,or->oa", wr, Jpt, r), obs_pt, num_segments=P_l
    )
    W = jax.ops.segment_sum(
        jnp.einsum("ora,orb->oab", wJc, Jpt), obs_pt, num_segments=P_l
    )  # (P_l, 6K, 3)
    H_pp_d = H_pp + jnp.eye(3, dtype=r.dtype) * (
        lam * jnp.diagonal(H_pp, axis1=-2, axis2=-1) + 1e-8
    )[..., :, None]
    ptv = obs["ptv"]
    H_pp_inv = jnp.linalg.inv(
        jnp.where(ptv[:, None, None], H_pp_d, jnp.eye(3, dtype=r.dtype))
    )
    H_pp_inv = jnp.where(ptv[:, None, None], H_pp_inv, 0.0)
    S_part = jnp.einsum("pac,pcd,pbd->ab", W, H_pp_inv, W)
    b_red_part = jnp.einsum("pac,pcd,pd->a", W, H_pp_inv, b_p)
    c_local = jnp.sum(w * jnp.where(jnp.isfinite(chi2), chi2, 0.0))
    return (
        H_pose, b_pose, S_part, b_red_part, H_pp_inv, W, b_p, w, rmask, c_local
    )


def _visual_cost_local(cam, Rk, tk, pts_local, obs, w, rmask):
    prob_like = BAProblem(
        T_cw=SE3(Rk, tk), cam_fixed=None,
        points=pts_local, pt_valid=obs["ptv"],
        obs_cam=obs["cam"], obs_pt=obs["pt"], obs_uv=obs["uv"],
        obs_inv_s2=obs["is2"], obs_valid=obs["val"],
        obs_ur=obs.get("ur"), bf=obs.get("bf"),
    )
    r, _, _, pc = _obs_residuals(prob_like, cam, Rk, tk, pts_local)
    chi2 = jnp.sum(r * r * rmask, axis=-1) * obs["is2"]
    return jnp.sum(jnp.where(pc[..., 2] > 0, w * chi2, jnp.inf * w))


def make_dist_ba_step(
    mesh: Mesh, cam: Camera, K: int, P_l: int, axis: str = "ba", stereo: bool = False
):
    """Build the sharded one-LM-iteration step over a point-partitioned
    problem. All point/observation structures are shard-local; cross-shard
    coupling is ONLY the psum of the (6K,6K) camera system + cost scalars."""
    from jax import shard_map

    def step_local(Rk, tk, pts_local, obs_cam, obs_pt, obs_uv, obs_is2, obs_val,
                   obs_ur, bf, pt_valid_local, cam_fixed, lam):
        obs = {
            "cam": obs_cam, "pt": obs_pt, "uv": obs_uv, "is2": obs_is2,
            "val": obs_val, "ptv": pt_valid_local,
            "ur": obs_ur if stereo else None, "bf": bf if stereo else None,
        }
        (H_pose, b_pose, S_part, b_red_part, H_pp_inv, W, b_p, w, rmask,
         c_local) = _visual_local_systems(
            cam, Rk, tk, pts_local, obs, K, P_l, lam
        )
        S = jax.lax.psum(H_pose - S_part, axis)
        b_red = jax.lax.psum(b_pose - b_red_part, axis)
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
        dx_cam6 = dx_cam.reshape(K, 6)
        R_new = jax.vmap(lambda d, R: se3.exp(d).R @ R)(dx_cam6, Rk)
        t_new = jax.vmap(lambda d, R, t: (se3.exp(d) @ SE3(R, t)).t)(dx_cam6, Rk, tk)
        pts_new = pts_local + dx_pt
        # accept/reject on the global cost (psum of local weighted chi2)
        c_old = jax.lax.psum(c_local, axis)
        chi_new_local = _visual_cost_local(cam, R_new, t_new, pts_new, obs, w, rmask)
        # a point behind a camera post-step keeps the old cost row (mirrors
        # the single-device gate); jnp.inf rows force rejection instead
        chi_new_local = jnp.where(jnp.isfinite(chi_new_local), chi_new_local, jnp.inf)
        c_new = jax.lax.psum(chi_new_local, axis)
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
                P(axis) if stereo else P(),    # obs_ur (sharded) / dummy
                P(),                           # bf (replicated)
                P(axis),                       # pt_valid (sharded)
                P(), P(),                      # cam_fixed, lam
            ),
            out_specs=(P(), P(), P(axis), P()),
            check_vma=False,
        )
    )
    return sharded


def dist_bundle_adjust(
    prob: BAProblem,
    cam: Camera,
    mesh: Mesh,
    iters: int = 10,
    part: PointPartition | None = None,
    arrays: dict | None = None,
):
    """Run `iters` sharded LM iterations.

    Three input paths:
    - prob only: partition on this host (single-process convenience).
    - part: pre-partitioned numpy (host may hold all rows or — multi-process
      — only its own; pass `arrays` then).
    - arrays: pre-distributed GLOBAL jax.Arrays (from
      multihost.distribute_array); nothing is host-gathered here, so this
      path works when no process holds the whole problem.

    Returns (SE3, points (global, padded — slice [:Pn])).
    """
    axis = mesh.axis_names[0]
    n = mesh.shape[axis]
    if part is None and arrays is None:
        part = partition_by_point(prob, n)
    stereo = (
        prob.obs_ur is not None
        if arrays is None
        else arrays.get("obs_ur") is not None
    )
    K = np.asarray(prob.T_cw.t).shape[0]
    if arrays is None:
        from . import multihost

        shard, rep = P(axis), P()
        arrays = {
            "points": multihost.distribute_array(part.points, mesh, shard),
            "pt_valid": multihost.distribute_array(part.pt_valid, mesh, shard),
            "obs_cam": multihost.distribute_array(part.obs_cam, mesh, shard),
            "obs_pt": multihost.distribute_array(part.obs_pt, mesh, shard),
            "obs_uv": multihost.distribute_array(part.obs_uv, mesh, shard),
            "obs_inv_s2": multihost.distribute_array(part.obs_inv_s2, mesh, shard),
            "obs_valid": multihost.distribute_array(part.obs_valid, mesh, shard),
            "obs_ur": (
                None if part.obs_ur is None
                else multihost.distribute_array(part.obs_ur, mesh, shard)
            ),
        }
        P_l = part.P_l
    else:
        P_l = arrays["points"].shape[0] // n
    step = make_dist_ba_step(mesh, cam, K, P_l, axis, stereo=stereo)

    lam = jnp.asarray(1e-4, jnp.float32)
    Rk = jnp.asarray(np.asarray(prob.T_cw.R, np.float32))
    tk = jnp.asarray(np.asarray(prob.T_cw.t, np.float32))
    cam_fixed = jnp.asarray(np.asarray(prob.cam_fixed, bool))
    pts = arrays["points"]
    obs_ur = arrays.get("obs_ur")
    if obs_ur is None:
        obs_ur = arrays["obs_inv_s2"]  # dummy, ignored when stereo=False
    bf = jnp.asarray(
        np.float32(np.asarray(prob.bf)) if prob.bf is not None else np.float32(0.0)
    )
    for _ in range(iters):
        Rk, tk, pts, lam = step(
            Rk, tk, pts,
            arrays["obs_cam"], arrays["obs_pt"], arrays["obs_uv"],
            arrays["obs_inv_s2"], arrays["obs_valid"], obs_ur, bf,
            arrays["pt_valid"], cam_fixed, lam,
        )
    return SE3(so3.normalize(Rk), tk), pts


# ---------------------------------------------------------------- legacy API
class PartitionedProblem:
    """Back-compat shim over partition_by_point (v2 API)."""

    def __init__(self, prob: BAProblem, n_shards: int):
        part = partition_by_point(prob, n_shards)
        self.P_l = part.P_l
        self.O_l = part.O_l
        self.Pn = part.Pn
        self.n_shards = n_shards
        self.obs_cam = jnp.asarray(part.obs_cam)
        self.obs_pt = jnp.asarray(part.obs_pt)
        self.obs_uv = jnp.asarray(part.obs_uv)
        self.obs_inv_s2 = jnp.asarray(part.obs_inv_s2)
        self.obs_valid = jnp.asarray(part.obs_valid)
        self.points = jnp.asarray(part.points)
        self.pt_valid = jnp.asarray(part.pt_valid)


def pad_problem_for_mesh(prob: BAProblem, n_shards: int) -> BAProblem:
    """Pad O and P to multiples of the mesh size (numpy)."""
    O = np.asarray(prob.obs_cam).shape[0]
    Pn = np.asarray(prob.points).shape[0]
    Ob = _round_up(O, n_shards)
    Pb = _round_up(Pn, n_shards)
    if (Ob, Pb) == (O, Pn):
        return prob

    def padn(a, nrow, fill=0.0):
        a = np.asarray(a)
        out = np.full((nrow, *a.shape[1:]), fill, a.dtype)
        out[: len(a)] = a
        return out

    return BAProblem(
        T_cw=prob.T_cw,
        cam_fixed=prob.cam_fixed,
        points=padn(prob.points, Pb),
        pt_valid=padn(prob.pt_valid, Pb, False),
        obs_cam=padn(prob.obs_cam, Ob),
        obs_pt=padn(prob.obs_pt, Ob),
        obs_uv=padn(prob.obs_uv, Ob),
        obs_inv_s2=padn(prob.obs_inv_s2, Ob, 1.0),
        obs_valid=padn(prob.obs_valid, Ob, False),
        obs_ur=None if prob.obs_ur is None else padn(prob.obs_ur, Ob, -1.0),
        bf=prob.bf,
    )
