"""Joint visual-inertial bundle adjustment (poses + velocities + per-KF
biases + points), the TPU-native replacement for:

- Optimizer::FullInertialBA (reference: src/Optimizer.cc:392-560): all
  keyframes with EdgeInertial between consecutive KFs, EdgeGyroRW/EdgeAccRW
  random-walk edges, EdgePriorGyro/Acc on the first KF, points free. Used
  by the staged IMU init VIBA1/VIBA2 (src/LocalMapping.cc:207-230) and the
  post-loop inertial GBA (src/LoopClosing.cc:2284).
- Optimizer::LocalInertialBA (src/Optimizer.cc:2383): same factor graph
  over a temporal window along the mPrevKF chain with a fixed anchor.
- Optimizer::MergeInertialBA (src/Optimizer.cc:3948): same graph over the
  weld window after a map merge.

One batched solver covers all three call sites (SURVEY §7.1: one LM family
parameterized by factors). Design:

- State x = [xi_pose (6K) | dv (3K) | dbg (3K) | dba (3K)]; pose increments
  act on the LEFT of T_cw (camera pose); body states derive through the
  fixed extrinsics T_bc, so the map write-back stays camera-frame.
- Visual block: closed-form reprojection jacobians (shared with optim/ba),
  point blocks eliminated by dense Schur EXACTLY as in optim/ba — points
  couple only to the pose part, so the Schur correction touches only the
  (6K, 6K) corner of the camera system.
- Inertial block: per-edge 15-D whitened residual (9 preintegration + 6
  bias random-walk), jacobians by vmapped forward-mode autodiff over the
  30 increment inputs of each edge — (E, 15, 30) then scattered into the
  dense camera system with a one-hot contraction. E = K-1 edges keeps this
  tiny; no hand-derived inertial jacobians to get wrong.
- LM with cost-decrease gating + per-round visual outlier reclassification
  (chi2 > 5.991), mirroring optim/ba.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..cameras import Camera
from ..imu.preintegration import GRAVITY_VEC
from ..lie import se3, so3
from ..lie.se3 import SE3
from .ba import BAProblem, _obs_residuals
from .inertial import InertialChain
from .robust import CHI2_MONO, DELTA_MONO, huber_weight


class VIBAProblem(NamedTuple):
    # visual part (layout-identical to optim.ba.BAProblem)
    T_cw: SE3  # (K,)
    cam_fixed: jnp.ndarray  # (K,) bool — pose pinned (gauge / frontier)
    points: jnp.ndarray  # (P, 3)
    pt_valid: jnp.ndarray  # (P,)
    obs_cam: jnp.ndarray  # (O,)
    obs_pt: jnp.ndarray  # (O,)
    obs_uv: jnp.ndarray  # (O, 2)
    obs_inv_s2: jnp.ndarray  # (O,)
    obs_valid: jnp.ndarray  # (O,)
    # inertial states at linearization
    v_w: jnp.ndarray  # (K, 3) body velocity in world
    bg: jnp.ndarray  # (K, 3) gyro bias
    ba: jnp.ndarray  # (K, 3) acc bias
    # preintegration edges (E of them, arbitrary (i, j) pairs along the chain)
    chain: InertialChain
    edge_i: jnp.ndarray  # (E,) int32 source kf (window index)
    edge_j: jnp.ndarray  # (E,) int32 target kf
    bg_lin: jnp.ndarray  # (E, 3) bias the deltas were integrated at
    ba_lin: jnp.ndarray  # (E, 3)
    rw_info_g: jnp.ndarray  # (E,) 1/(walk_g^2 dt) random-walk information
    rw_info_a: jnp.ndarray  # (E,)
    # bias priors on the FIRST keyframe (reference: EdgePriorGyro/Acc,
    # include/G2oTypes.h:768,792; priors 1e2/1e10|1e5 from InitializeIMU)
    prior_g: jnp.ndarray  # ()
    prior_a: jnp.ndarray  # ()
    # camera-to-body extrinsics (x_b = R_bc x_c + t_bc)
    R_bc: jnp.ndarray  # (3, 3)
    t_bc: jnp.ndarray  # (3,)
    # velocity+bias pinning, independent of the pose gauge: window solvers
    # pin the frontier KF's full state (reference LocalInertialBA fixes all
    # four vertices of the anchor, src/Optimizer.cc:2440 region); the init
    # FullInertialBA leaves velocities/biases free everywhere
    state_fixed: jnp.ndarray = None  # (K,) bool


class VIBAResult(NamedTuple):
    T_cw: SE3
    points: jnp.ndarray
    v_w: jnp.ndarray
    bg: jnp.ndarray
    ba: jnp.ndarray
    obs_inlier: jnp.ndarray
    chi2_vis: jnp.ndarray  # (O,)
    cost_inertial: jnp.ndarray  # ()


def _edge_residual(prob: VIBAProblem, e, z, Rk, tk, v, bg, ba):
    """15-D whitened residual of inertial edge e as a function of the
    30-D increment z = [xi_i, xi_j, dv_i, dv_j, dbg_i, dba_i, dbg_j, dba_j].

    Forster preintegration residuals (reference EdgeInertial::computeError,
    src/G2oTypes.cc:600 region) + gyro/acc random walk (EdgeGyroRW/AccRW,
    include/G2oTypes.h:635,671)."""
    i = prob.edge_i[e]
    j = prob.edge_j[e]
    xi_i, xi_j = z[0:6], z[6:12]
    dv_i, dv_j = z[12:15], z[15:18]
    dbg_i, dba_i = z[18:21], z[21:24]
    dbg_j, dba_j = z[24:27], z[27:30]

    def body_state(kf, xi):
        T = se3.exp(xi) @ SE3(Rk[kf], tk[kf])  # camera pose with increment
        R_bw = prob.R_bc @ T.R
        t_bw = prob.R_bc @ T.t + prob.t_bc
        R_wb = R_bw.T
        p_wb = -R_bw.T @ t_bw
        return R_wb, p_wb

    R_i, p_i = body_state(i, xi_i)
    R_j, p_j = body_state(j, xi_j)
    v_i = v[i] + dv_i
    v_j = v[j] + dv_j
    bg_i = bg[i] + dbg_i
    ba_i = ba[i] + dba_i
    bg_j = bg[j] + dbg_j
    ba_j = ba[j] + dba_j

    db_g = bg_i - prob.bg_lin[e]
    db_a = ba_i - prob.ba_lin[e]
    dt = prob.chain.dT[e]
    dR_c = prob.chain.dR[e] @ so3.exp(prob.chain.JRg[e] @ db_g)
    dV_c = prob.chain.dV[e] + prob.chain.JVg[e] @ db_g + prob.chain.JVa[e] @ db_a
    dP_c = prob.chain.dP[e] + prob.chain.JPg[e] @ db_g + prob.chain.JPa[e] @ db_a
    r_R = so3.log(dR_c.T @ R_i.T @ R_j)
    r_v = R_i.T @ (v_j - v_i - GRAVITY_VEC * dt) - dV_c
    r_p = R_i.T @ (p_j - p_i - v_i * dt - 0.5 * GRAVITY_VEC * dt * dt) - dP_c
    r9 = jnp.concatenate([r_R, r_v, r_p])
    C_inv = prob.chain.C_inv[e]
    L = jnp.linalg.cholesky(0.5 * (C_inv + C_inv.T))
    r9w = L.T @ r9
    r_rw_g = (bg_j - bg_i) * jnp.sqrt(prob.rw_info_g[e])
    r_rw_a = (ba_j - ba_i) * jnp.sqrt(prob.rw_info_a[e])
    r = jnp.concatenate([r9w, r_rw_g, r_rw_a])
    return jnp.where(prob.chain.valid[e], r, jnp.zeros(15))


def _edge_system(prob: VIBAProblem, Rk, tk, v, bg, ba, n_x, K):
    """Assemble the inertial contribution (H_in (n_x, n_x), b_in (n_x),
    cost) from all edges via per-edge autodiff."""
    E = prob.edge_i.shape[0]
    z0 = jnp.zeros(30)

    def res_e(e, z):
        return _edge_residual(prob, e, z, Rk, tk, v, bg, ba)

    r = jax.vmap(lambda e: res_e(e, z0))(jnp.arange(E))  # (E, 15)
    J = jax.vmap(lambda e: jax.jacfwd(lambda z: res_e(e, z))(z0))(
        jnp.arange(E)
    )  # (E, 15, 30)
    # global column index of each of the 30 local increment dims
    def cols_of(i, j):
        return jnp.concatenate(
            [
                6 * i + jnp.arange(6),
                6 * j + jnp.arange(6),
                6 * K + 3 * i + jnp.arange(3),
                6 * K + 3 * j + jnp.arange(3),
                9 * K + 3 * i + jnp.arange(3),
                12 * K + 3 * i + jnp.arange(3),
                9 * K + 3 * j + jnp.arange(3),
                12 * K + 3 * j + jnp.arange(3),
            ]
        )

    cols = jax.vmap(cols_of)(prob.edge_i, prob.edge_j)  # (E, 30)
    sel = (cols[:, :, None] == jnp.arange(n_x)[None, None, :]).astype(J.dtype)
    Jg = jnp.einsum("erc,ecx->erx", J, sel)  # (E, 15, n_x)
    H = jnp.einsum("era,erb->ab", Jg, Jg)
    b = jnp.einsum("era,er->a", Jg, r)
    cost = jnp.sum(r * r)
    return H, b, cost


def _inertial_cost(prob, Rk, tk, v, bg, ba):
    E = prob.edge_i.shape[0]
    z0 = jnp.zeros(30)
    r = jax.vmap(lambda e: _edge_residual(prob, e, z0, Rk, tk, v, bg, ba))(
        jnp.arange(E)
    )
    return jnp.sum(r * r)


def _reseed_velocities(prob, Rk, tk, v, bg, ba, n_x, K, fixed):
    """Exact minimizer over velocities with everything else held: the
    preintegration residuals are LINEAR in v, so one Newton step in the
    velocity block is the global optimum. Starting the joint LM from there
    keeps it out of the mono scale-warp valley (vision is scale-blind; bad
    initial velocities otherwise drag the scene scale instead of fixing v —
    the reference avoids this by seeding velocities from
    InertialOptimization before FullInertialBA, src/LocalMapping.cc:1272)."""
    H_in, b_in, _ = _edge_system(prob, Rk, tk, v, bg, ba, n_x, K)
    Hv = H_in[6 * K : 9 * K, 6 * K : 9 * K]
    bv = b_in[6 * K : 9 * K]
    fixed_v = jnp.repeat(fixed, 3)
    Hv = jnp.where(fixed_v[:, None] | fixed_v[None, :], 0.0, Hv)
    Hv = Hv + jnp.diag(jnp.where(fixed_v, 1.0, 1e-6))
    bv = jnp.where(fixed_v, 0.0, bv)
    d_inv = jax.lax.rsqrt(jnp.maximum(jnp.diag(Hv), 1e-12))
    dv = -jnp.linalg.solve(Hv * d_inv[:, None] * d_inv[None, :], bv * d_inv) * d_inv
    return v + dv.reshape(K, 3)


@partial(jax.jit, static_argnums=(2, 3))
def vi_bundle_adjust(
    prob: VIBAProblem,
    cam: Camera,
    rounds: int = 2,
    iters_per_round: int = 8,
):
    """Joint VI-BA. Visual points eliminated by dense Schur on the pose
    block; inertial factors keep the full 15K camera system coupled."""
    K = prob.T_cw.t.shape[0]
    P = prob.points.shape[0]
    n_x = 15 * K
    vis = BAProblem(
        prob.T_cw, prob.cam_fixed, prob.points, prob.pt_valid,
        prob.obs_cam, prob.obs_pt, prob.obs_uv, prob.obs_inv_s2, prob.obs_valid,
    )
    state_fixed = (
        prob.state_fixed if prob.state_fixed is not None else prob.cam_fixed
    )
    fixed15 = jnp.concatenate(
        [
            jnp.repeat(prob.cam_fixed, 6),
            jnp.repeat(state_fixed, 3),
            jnp.repeat(state_fixed, 3),
            jnp.repeat(state_fixed, 3),
        ]
    )

    def chi2_vis_of(Rk, tk, pts):
        r, _, _, pc = _obs_residuals(vis, cam, Rk, tk, pts)
        c = jnp.sum(r * r, axis=-1) * prob.obs_inv_s2
        return jnp.where(pc[..., 2] > 0, c, jnp.inf)

    def prior_terms(bg, ba):
        # first non-fixed kf carries the bias prior; index 0 by convention
        return prob.prior_g * jnp.sum(bg[0] ** 2) + prob.prior_a * jnp.sum(
            ba[0] ** 2
        )

    def lm_round(round_idx, carry):
        Rk, tk, pts, v, bg, ba, inlier = carry
        use_huber = round_idx < rounds - 1

        def lm_iter(_, st):
            Rk, tk, pts, v, bg, ba, lam = st
            r, Jpose, Jpt, pc = _obs_residuals(vis, cam, Rk, tk, pts)
            chi2 = jnp.sum(r * r, axis=-1) * prob.obs_inv_s2
            w_rob = jnp.where(use_huber, huber_weight(chi2, DELTA_MONO), 1.0)
            w = (
                inlier.astype(r.dtype)
                * prob.obs_valid.astype(r.dtype)
                * prob.pt_valid[prob.obs_pt].astype(r.dtype)
                * w_rob
                * prob.obs_inv_s2
            )
            w = jnp.where(pc[..., 2] > 0, w, 0.0)
            # ---- visual camera system (pose block only) + point blocks
            onehot = (prob.obs_cam[:, None] == jnp.arange(K)[None, :]).astype(
                r.dtype
            )
            Jc = jnp.einsum("ok,orj->orkj", onehot, Jpose).reshape(
                r.shape[0], 2, K * 6
            )
            wJc = w[:, None, None] * Jc
            H_pose = jnp.einsum("ora,orb->ab", wJc, Jc)
            b_pose = jnp.einsum("ora,or->a", wJc, r)
            H_pp = jax.ops.segment_sum(
                jnp.einsum("o,ora,orb->oab", w, Jpt, Jpt),
                prob.obs_pt,
                num_segments=P,
            )
            b_p = jax.ops.segment_sum(
                jnp.einsum("o,ora,or->oa", w, Jpt, r),
                prob.obs_pt,
                num_segments=P,
            )
            W = jax.ops.segment_sum(
                jnp.einsum("ora,orb->oab", wJc, Jpt), prob.obs_pt, num_segments=P
            )
            H_pp_d = H_pp + jnp.eye(3, dtype=r.dtype) * (
                lam * jnp.diagonal(H_pp, axis1=-2, axis2=-1) + 1e-8
            )[..., :, None]
            pt_active = prob.pt_valid
            H_pp_inv = jnp.linalg.inv(
                jnp.where(pt_active[:, None, None], H_pp_d, jnp.eye(3, dtype=r.dtype))
            )
            H_pp_inv = jnp.where(pt_active[:, None, None], H_pp_inv, 0.0)
            S_pose = H_pose - jnp.einsum("pac,pcd,pbd->ab", W, H_pp_inv, W)
            b_pose_red = b_pose - jnp.einsum("pac,pcd,pd->a", W, H_pp_inv, b_p)
            # ---- inertial + random-walk system over the full 15K state
            H_in, b_in, c_inert = _edge_system(prob, Rk, tk, v, bg, ba, n_x, K)
            H = H_in.at[: 6 * K, : 6 * K].add(S_pose)
            b = b_in.at[: 6 * K].add(b_pose_red)
            # bias priors on kf 0
            H = H.at[9 * K : 9 * K + 3, 9 * K : 9 * K + 3].add(
                prob.prior_g * jnp.eye(3)
            )
            H = H.at[12 * K : 12 * K + 3, 12 * K : 12 * K + 3].add(
                prob.prior_a * jnp.eye(3)
            )
            b = b.at[9 * K : 9 * K + 3].add(prob.prior_g * bg[0])
            b = b.at[12 * K : 12 * K + 3].add(prob.prior_a * ba[0])
            # damping + fixed pinning + Jacobi-preconditioned solve (the
            # whitened inertial blocks span ~4 orders of magnitude; a raw
            # float32 solve of the mixed system loses the velocity columns)
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
                "pcd,pd->pc",
                H_pp_inv,
                b_p + jnp.einsum("pac,a->pc", W, dx[: 6 * K]),
            )
            R_new = jax.vmap(lambda d, R: se3.exp(d).R @ R)(dx_pose, Rk)
            t_new = jax.vmap(lambda d, R, t: (se3.exp(d) @ SE3(R, t)).t)(
                dx_pose, Rk, tk
            )
            pts_new = pts + dx_pt
            v_new = v + dv
            bg_new = bg + dbg
            ba_new = ba + dba
            # cost gate on the FULL objective
            c_vis_old = jnp.sum(jnp.where(jnp.isfinite(chi2), w * chi2, 0.0))
            c_old = c_vis_old + c_inert + prior_terms(bg, ba)
            r2, _, _, pc2 = _obs_residuals(vis, cam, R_new, t_new, pts_new)
            chi2n = jnp.sum(r2 * r2, axis=-1) * prob.obs_inv_s2
            c_vis_new = jnp.sum(jnp.where(pc2[..., 2] > 0, w * chi2n, w * chi2))
            c_new = (
                c_vis_new
                + _inertial_cost(prob, R_new, t_new, v_new, bg_new, ba_new)
                + prior_terms(bg_new, ba_new)
            )
            good = c_new < c_old
            Rk = jnp.where(good, R_new, Rk)
            tk = jnp.where(good, t_new, tk)
            pts = jnp.where(good, pts_new, pts)
            v = jnp.where(good, v_new, v)
            bg = jnp.where(good, bg_new, bg)
            ba = jnp.where(good, ba_new, ba)
            lam = jnp.where(good, lam * 0.5, lam * 5.0)
            return Rk, tk, pts, v, bg, ba, lam

        Rk, tk, pts, v, bg, ba, _ = jax.lax.fori_loop(
            0, iters_per_round, lm_iter,
            (Rk, tk, pts, v, bg, ba, jnp.asarray(1e-4)),
        )
        chi2 = chi2_vis_of(Rk, tk, pts)
        inlier_new = prob.obs_valid & (chi2 < CHI2_MONO)
        return Rk, tk, pts, v, bg, ba, inlier_new

    v_seed = _reseed_velocities(
        prob, prob.T_cw.R, prob.T_cw.t, prob.v_w, prob.bg, prob.ba, n_x, K,
        state_fixed,
    )
    carry0 = (
        prob.T_cw.R,
        prob.T_cw.t,
        prob.points,
        v_seed,
        prob.bg,
        prob.ba,
        prob.obs_valid,
    )
    Rk, tk, pts, v, bg, ba, inlier = jax.lax.fori_loop(0, rounds, lm_round, carry0)
    Rk = so3.normalize(Rk)
    chi2 = chi2_vis_of(Rk, tk, pts)
    return VIBAResult(
        SE3(Rk, tk), pts, v, bg, ba, inlier, chi2,
        _inertial_cost(prob, Rk, tk, v, bg, ba),
    )


def _next_bucket(n, base):
    b = base
    while b < n:
        b *= 2
    return b


def build_vi_problem(
    m,
    tcfg,
    kfs,
    pres,
    fixed,
    prior_g: float,
    prior_a: float,
    imu_cfg,
    kf_pad: int = 8,
    obs_bucket: int = 4096,
    pt_bucket: int = 2048,
    state_fixed=None,
):
    """Assemble a padded VIBAProblem from the map arena.

    kfs: temporal list of keyframe indices (len K0); pres: Preintegrated
    between consecutive entries (len K0-1); fixed: (K0,) bool anchor mask.
    Keyframe count pads to a multiple of kf_pad, observations/points to
    power-of-two buckets, so the jitted solver compiles per bucket, not per
    call. Returns (problem, kfs, mp_sel) for write-back."""
    K0 = len(kfs)
    E0 = len(pres)
    assert E0 == K0 - 1
    K = int(np.ceil(K0 / kf_pad) * kf_pad)
    inv_s2_levels = tcfg.inv_level_sigma2()

    # ---- point selection: valid points seen by the window
    obs = m.kf_obs[kfs]
    mp_sel = np.unique(obs[obs != -1])
    mp_sel = mp_sel[(mp_sel >= 0) & m.mp_valid[mp_sel]][:pt_bucket]
    P = _next_bucket(max(len(mp_sel), 1), 256)
    mp_pos_map = np.full(m.mp_valid.shape[0], -1, np.int64)
    mp_pos_map[mp_sel] = np.arange(len(mp_sel))
    pts = np.zeros((P, 3), np.float32)
    pts[: len(mp_sel)] = m.mp_pos[mp_sel]
    pt_valid = np.zeros(P, bool)
    pt_valid[: len(mp_sel)] = True

    # ---- observations
    obs_cam, obs_pt, obs_uv, obs_is2 = [], [], [], []
    for i, k in enumerate(kfs):
        slots, mps = m.observations_of_kf(int(k))
        sel = mp_pos_map[mps] >= 0
        slots, mps = slots[sel], mps[sel]
        obs_cam.append(np.full(len(slots), i, np.int32))
        obs_pt.append(mp_pos_map[mps].astype(np.int32))
        obs_uv.append(m.kf_uv[int(k), slots])
        obs_is2.append(inv_s2_levels[m.kf_level[int(k), slots]])
    obs_cam = np.concatenate(obs_cam)
    obs_pt = np.concatenate(obs_pt)
    obs_uv = np.concatenate(obs_uv).astype(np.float32)
    obs_is2 = np.concatenate(obs_is2).astype(np.float32)
    O = _next_bucket(max(len(obs_cam), 1), obs_bucket)

    def pad(a, n, fill=0):
        out = np.full((n, *a.shape[1:]), fill, a.dtype)
        out[: len(a)] = a[:n]
        return out

    obs_valid = np.zeros(O, bool)
    obs_valid[: len(obs_cam)] = True

    # ---- keyframe states (padded entries: identity pose, fixed)
    R = np.tile(np.eye(3, dtype=np.float32), (K, 1, 1))
    t = np.zeros((K, 3), np.float32)
    vel = np.zeros((K, 3), np.float32)
    bias = np.zeros((K, 6), np.float32)
    fixed_k = np.ones(K, bool)
    R[:K0] = m.kf_R[kfs]
    t[:K0] = m.kf_t[kfs]
    vel[:K0] = m.kf_vel[kfs]
    bias[:K0] = m.kf_bias[kfs]
    fixed_k[:K0] = np.asarray(fixed, bool)

    # ---- inertial edges (padded entries invalid, self-loop on kf 0)
    E = K - 1

    def stack_pre(f, shape):
        out = np.zeros((E, *shape), np.float32)
        for e, p in enumerate(pres):
            out[e] = np.asarray(f(p))
        return out

    dT = stack_pre(lambda p: p.dT, ())
    dR = stack_pre(lambda p: p.dR, (3, 3))
    dR[E0:] = np.eye(3, dtype=np.float32)
    # the problem stays NUMPY end-to-end: the jitted solver batches the
    # transfers at call time; eager per-array device uploads from the mapper
    # thread each pay a tunnel round trip while the device is busy
    chain = InertialChain(
        dT=np.maximum(dT, 1e-6),
        dR=dR,
        dV=stack_pre(lambda p: p.dV, (3,)),
        dP=stack_pre(lambda p: p.dP, (3,)),
        JRg=stack_pre(lambda p: p.JRg, (3, 3)),
        JVg=stack_pre(lambda p: p.JVg, (3, 3)),
        JVa=stack_pre(lambda p: p.JVa, (3, 3)),
        JPg=stack_pre(lambda p: p.JPg, (3, 3)),
        JPa=stack_pre(lambda p: p.JPa, (3, 3)),
        C_inv=_chain_informations(pres, E),
        valid=np.arange(E) < E0,
    )
    edge_i = np.arange(E, dtype=np.int32)
    edge_j = np.arange(1, E + 1, dtype=np.int32)
    edge_i[E0:] = 0
    edge_j[E0:] = 0
    bg_lin = np.zeros((E, 3), np.float32)
    ba_lin = np.zeros((E, 3), np.float32)
    for e, p in enumerate(pres):
        bg_lin[e] = np.asarray(p.bias.bg)
        ba_lin[e] = np.asarray(p.bias.ba)
    dts = np.maximum(dT, 1e-3)
    rw_g = 1.0 / (imu_cfg.walk_gyro**2 * dts)
    rw_a = 1.0 / (imu_cfg.walk_acc**2 * dts)
    rw_g[E0:] = 0.0
    rw_a[E0:] = 0.0

    prob = VIBAProblem(
        T_cw=SE3(R, t),
        cam_fixed=fixed_k,
        points=pts,
        pt_valid=pt_valid,
        obs_cam=pad(obs_cam, O),
        obs_pt=pad(obs_pt, O),
        obs_uv=pad(obs_uv, O),
        obs_inv_s2=pad(obs_is2, O, 1.0),
        obs_valid=obs_valid,
        v_w=vel,
        bg=np.ascontiguousarray(bias[:, :3]),
        ba=np.ascontiguousarray(bias[:, 3:]),
        chain=chain,
        edge_i=edge_i,
        edge_j=edge_j,
        bg_lin=bg_lin,
        ba_lin=ba_lin,
        rw_info_g=rw_g.astype(np.float32),
        rw_info_a=rw_a.astype(np.float32),
        prior_g=np.float32(prior_g),
        prior_a=np.float32(prior_a),
        R_bc=np.asarray(imu_cfg.R_bc, np.float32),
        t_bc=np.asarray(imu_cfg.t_bc, np.float32),
        state_fixed=(
            fixed_k if state_fixed is None
            else np.concatenate([np.asarray(state_fixed, bool),
                                 np.ones(K - K0, bool)])
        ),
    )
    return prob, np.asarray(kfs), mp_sel


def _chain_informations(pres, E):
    C = np.tile(np.eye(9, dtype=np.float32), (E, 1, 1))
    for e, p in enumerate(pres):
        C[e] = np.asarray(p.C)[:9, :9]
        # gravity-direction uncertainty floor (~0.57 deg 1-sigma residual
        # init tilt): without it the ideal-IMU covariance overstates the
        # edge confidence by tens of sigma against an imperfectly aligned
        # world and the joint solve fights the visual rows (same floor as
        # optim/vi_pose_opt.py)
        dt = float(np.asarray(p.dT))
        sg = 9.81 * 0.01
        C[e, 3:6, 3:6] += np.eye(3, dtype=np.float32) * (sg * dt) ** 2
        C[e, 6:9, 6:9] += np.eye(3, dtype=np.float32) * (
            0.5 * sg * dt * dt
        ) ** 2
    C = C + np.eye(9, dtype=np.float32) * 1e-10
    return np.linalg.inv(C)


def write_back_vi(m, res: VIBAResult, kfs, mp_sel):
    """Fold an optimized window back into the map arena."""
    K0 = len(kfs)
    m.kf_R[kfs] = np.asarray(res.T_cw.R)[:K0]
    m.kf_t[kfs] = np.asarray(res.T_cw.t)[:K0]
    m.kf_vel[kfs] = np.asarray(res.v_w)[:K0]
    m.kf_bias[kfs, :3] = np.asarray(res.bg)[:K0]
    m.kf_bias[kfs, 3:] = np.asarray(res.ba)[:K0]
    if len(mp_sel):
        m.mp_pos[mp_sel] = np.asarray(res.points)[: len(mp_sel)]
