"""Local mapping: map growth, fusion, local BA, culling.

TPU-native replacement for the LocalMapping thread (reference:
src/LocalMapping.cc — Run :64, ProcessNewKeyFrame :298, MapPointCulling :346,
CreateNewMapPoints :388, SearchInNeighbors :714, KeyFrameCulling :902).

Runs synchronously on the host when the tracker inserts a keyframe (the
reference's thread+queue becomes a direct call; an async driver can overlap
it with tracking later since all heavy steps are device dispatches).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..cameras import Camera, project_np, unproject_np
from ..features.matcher import TH_LOW, mutual_best_match, resolve_duplicate_targets
from ..geom import triangulate_dlt
from ..lie.se3 import SE3
from ..optim.ba import bundle_adjust
from ..slam_map.map_state import NO_POINT, MapState
from ..tracking.tracker import TrackerConfig, _build_ba_problem, _pad1, _write_back_ba
from ..utils.fetch import fetch


# Session-static local-BA pad shape on accelerator backends (see
# _pad_problem): keyframes / points / observations.
_BA_PAD_K = 32
_BA_PAD_P = 8192
_BA_PAD_O = 16384

# One dispatch for the whole batched DLT (eager jnp from a mapper thread
# costs a tunnel round trip PER OP while the device streams tracking work)
_triangulate_jit = jax.jit(triangulate_dlt)


@dataclasses.dataclass
class LocalMapperConfig:
    n_triangulation_neighbors: int = 10  # reference: nn=10 mono (20 used when inertial)
    min_parallax_cos: float = 0.9998
    reproj_chi2: float = 5.991
    ba_window: int = 12  # covisible kfs in local BA
    cull_found_ratio: float = 0.25  # reference GetFoundRatio()<0.25f
    cull_min_obs: int = 3
    kf_cull_redundancy: float = 0.9  # reference: 90% rule


class LocalMapper:
    def __init__(self, cfg: LocalMapperConfig, tracker_cfg: TrackerConfig, slam_map: MapState):
        import contextlib

        from ..utils.timing import TimeStats

        self.cfg = cfg
        self.tcfg = tracker_cfg
        self.map = slam_map
        self.stats = TimeStats()  # per-phase wall time (REGISTER_TIMES parity)
        self.recent_points: list = []  # (mp_idx array, birth_kf) for culling
        # injected by AsyncLocalMapper: mutation phases lock; long device
        # solves run unlocked so the tracker's keyframe creation never waits
        # behind a full mapping cycle
        self.lock = contextlib.nullcontext()
        # optional ImuFrontend: enables the LocalInertialBA-style temporal
        # window refinement after visual BA
        self.imu = None

    def on_keyframe(self, k: int, skip_ba: bool = False):
        """Process one keyframe. skip_ba mirrors the reference's mapping
        loop: LocalMapping runs the local BA ONLY when its keyframe queue is
        empty (src/LocalMapping.cc:148-155 `if(!CheckNewKeyFrames())`) —
        under a backlog, triangulation/fusion/culling still run per
        keyframe so the map keeps up, and the solve lands at quiescence."""
        m = self.map
        if m.n_keyframes() < 2:
            return
        with self.stats.measure("mp_cull"), self.lock:
            slots, mps = m.observations_of_kf(k)
            m.update_point_stats(mps, self.tcfg.scale_factors())
            self._cull_recent_points(k)
        with self.stats.measure("triangulate"):
            new_pts = self._create_new_points(k)  # snapshot/compute/commit inside
        if len(new_pts):
            self.recent_points.append((new_pts, k))
        with self.stats.measure("fuse"):
            self._fuse_neighbors(k)  # snapshot/compute/commit inside
        if skip_ba:
            with self.stats.measure("kf_cull"), self.lock:
                self._cull_keyframes(k)
            return
        if m.n_keyframes() > 2:
            # once the IMU is initialized the temporal-window VI BA REPLACES
            # the visual local BA (reference: LocalMapping::Run picks
            # LocalInertialBA over LocalBundleAdjustment,
            # src/LocalMapping.cc:148-155) — running both doubles solver
            # cost and lets the un-inertial pass fight the VI one
            if self.imu is not None and self.imu.initialized:
                with self.stats.measure("vi_refine"):
                    self._vi_refine(k)
            else:
                with self.stats.measure("local_ba"):
                    self._local_ba(k)  # locks internally around build/write-back
        with self.stats.measure("kf_cull"), self.lock:
            self._cull_keyframes(k)

    def _vi_refine(self, k: int, window_size: int = 10):
        """Temporal-window JOINT visual-inertial BA (reference:
        Optimizer::LocalInertialBA, src/Optimizer.cc:2383 — Nd=10 keyframes
        along the mPrevKF chain, poses + velocities + per-KF biases with
        random-walk edges AND points optimized together; the anchor keyframe
        is fully pinned as the reference fixes all four anchor vertices)."""
        from ..imu.preintegration import ImuBias
        from ..optim.vi_ba import build_vi_problem, vi_bundle_adjust, write_back_vi

        m = self.map
        imu = self.imu
        # last `window_size` surviving chain entries, preintegrations merged
        # across culled keyframes (a partial-gap edge is a wrong constraint)
        kfs_all, pres_all = imu.valid_chain(m)
        kfs = kfs_all[-window_size:]
        pres = pres_all[-window_size:][1:] if len(kfs_all) >= 2 else []
        if len(kfs) < 3:
            return
        K = len(kfs)
        fixed = np.zeros(K, bool)
        fixed[0] = True
        with self.lock:
            # pinned obs bucket (one compile per session; see _pad_problem)
            prob, kfs_np, mp_sel = build_vi_problem(
                m, self.tcfg, kfs, pres, fixed, 0.0, 0.0, imu.cfg,
                obs_bucket=8192,
            )
        res = vi_bundle_adjust(prob, self.tcfg.cam, 2, 6)
        res = fetch(res)  # overlapped readback, sync OUTSIDE the lock
        with self.lock:
            write_back_vi(m, res, kfs_np, mp_sel)
            # drop visual outliers like the visual LBA does (reference:
            # LocalInertialBA erases chi2-failing observations after the
            # solve, src/Optimizer.cc:2680 region)
            self._drop_ba_outliers(m, prob, res, kfs_np, mp_sel)
        imu.v_w = np.asarray(res.v_w)[K - 1].astype(np.float32)
        imu.bias = ImuBias(
            jnp.asarray(np.asarray(res.bg)[K - 1]),
            jnp.asarray(np.asarray(res.ba)[K - 1]),
        )
        imu.bias_epoch += 1

    # ------------------------------------------------------- triangulation
    def _create_new_points(self, k: int):
        """Epipolar-search triangulation against covisible keyframes
        (reference: CreateNewMapPoints src/LocalMapping.cc:388).

        TPU batching: matching against ALL neighbors runs as one vmapped
        dispatch + one readback (the sequential per-neighbor version costs
        ~4 host<->device round trips per neighbor)."""
        m = self.map
        cfg = self.cfg
        cam = self.tcfg.cam
        inv_s2 = self.tcfg.inv_level_sigma2()
        created = []

        # ---- snapshot phase (brief lock): everything the device match needs
        with self.lock:
            neighbors = [
                int(x)
                for x in m.best_covisible(
                    k, cfg.n_triangulation_neighbors, min_weight=10
                )
            ]
            if len(neighbors) == 0:
                return np.empty(0, np.int64)
            F = m.kf_uv.shape[1]
            free_k = m.kf_feat_valid[k] & (m.kf_obs[k] == NO_POINT)
            center_k = -m.kf_R[k].T @ m.kf_t[k]
            R_k_snap, t_k_snap = m.kf_R[k].copy(), m.kf_t[k].copy()
            NB = 8
            neighbors = neighbors[:NB]
            r_k = unproject_np(cam, m.kf_uv[k]).astype(np.float32)  # (F, 3)
            r_n = np.zeros((NB, F, 3), np.float32)
            E_n = np.zeros((NB, 3, 3), np.float32)
            th_n = np.zeros((NB, F), np.float32)  # 0 threshold = masked out
            desc_n = np.zeros((NB, F, 8), np.uint32)
            valid_n = np.zeros((NB, F), bool)
            f2 = float(np.asarray(cam.params[0])) ** 2
            use = []
            for j, kn in enumerate(neighbors):
                center_n = -m.kf_R[kn].T @ m.kf_t[kn]
                if np.linalg.norm(center_k - center_n) < 0.01:
                    continue  # reference gate: tiny baseline
                # essential matrix cam_n <- cam_k: E = [t]x R of T_nk
                R_nk = m.kf_R[kn] @ R_k_snap.T
                t_nk = m.kf_t[kn] - R_nk @ t_k_snap
                E_n[j] = _hat(t_nk.astype(np.float32)) @ R_nk.astype(np.float32)
                r_n[j] = unproject_np(cam, m.kf_uv[kn]).astype(np.float32)
                th_n[j] = 3.84 / f2 / np.maximum(inv_s2[m.kf_level[kn]], 1e-9)
                desc_n[j] = m.kf_desc[kn]
                valid_n[j] = m.kf_feat_valid[kn] & (m.kf_obs[kn] == NO_POINT)
                use.append(j)
            desc_k_snap = m.kf_desc[k].copy()
        if not use:
            return np.empty(0, np.int64)

        # ---- compute phase (NO lock): device matching + readback. Numpy
        # args go straight into the jit (its input transfer is one batch; an
        # explicit jnp.asarray per array from this thread pays a tunnel RTT
        # each while the device is busy with the tracking stream).
        idx_all, keep_all = _batched_neighbor_match(
            desc_k_snap, free_k, r_k, desc_n, valid_n, r_n, E_n, th_n,
        )
        idx_all, keep_all = fetch((idx_all, keep_all))

        # collect matched pairs from every neighbor, then run ONE batched
        # triangulation dispatch (per-neighbor dispatches cost a tunnel RTT
        # each). A feature is claimed by the first neighbor that matched it
        # this round (the sequential version claimed on acceptance; claiming
        # on match only defers a failed candidate to the next keyframe).
        P1 = np.concatenate(
            [R_k_snap, t_k_snap[:, None]], axis=1
        ).astype(np.float32)
        sel_l, x1_l, x2_l, P2_l, nb_l = [], [], [], [], []
        for j in use:
            kn = neighbors[j]
            keep_np = keep_all[j] & free_k
            if not keep_np.any():
                continue
            sel = np.flatnonzero(keep_np)
            free_k[sel] = False
            idx_np = idx_all[j]
            r1 = r_k[sel]
            r2 = r_n[j][idx_np[sel]]
            sel_l.append(sel)
            x1_l.append(r1[:, :2] / r1[:, 2:3])
            x2_l.append(r2[:, :2] / r2[:, 2:3])
            P2 = np.concatenate(
                [m.kf_R[kn], m.kf_t[kn][:, None]], axis=1
            ).astype(np.float32)
            P2_l.append(np.broadcast_to(P2, (len(sel), 3, 4)))
            nb_l.append(np.full(len(sel), j, np.int32))
        if not sel_l:
            return np.empty(0, np.int64)
        sel_a = np.concatenate(sel_l)
        x1_a = np.concatenate(x1_l).astype(np.float32)
        x2_a = np.concatenate(x2_l).astype(np.float32)
        P2_a = np.concatenate(P2_l)
        nb_a = np.concatenate(nb_l)
        n_pairs = len(sel_a)
        # ONE static bucket (= feature capacity, the hard upper bound on
        # matches: each pair claims a distinct k-feature) so the batched
        # eigensolve compiles exactly once per session.
        bucket = F
        pts = np.asarray(
            _triangulate_jit(
                np.ascontiguousarray(np.broadcast_to(P1, (bucket, 3, 4))),
                _pad1(P2_a, bucket),
                _pad1(x1_a, bucket),
                _pad1(x2_a, bucket),
            )
        )[:n_pairs]
        # acceptance gates (reference: cheirality, parallax, reproj, scale)
        idx_pair = np.concatenate(
            [idx_all[int(n[0])][s] for n, s in zip(nb_l, sel_l)]
        )
        R_n_a = np.stack([m.kf_R[neighbors[j]] for j in nb_a])  # (N, 3, 3)
        t_n_a = np.stack([m.kf_t[neighbors[j]] for j in nb_a])
        center_n_a = -np.einsum("nij,ni->nj", R_n_a, t_n_a)
        pc1 = pts @ R_k_snap.T + t_k_snap
        pc2 = np.einsum("nij,nj->ni", R_n_a, pts) + t_n_a
        v1 = pts - center_k
        v2 = pts - center_n_a
        cosp = np.sum(v1 * v2, -1) / (
            np.linalg.norm(v1, axis=-1) * np.linalg.norm(v2, axis=-1) + 1e-12
        )
        uv1 = m.kf_uv[k][sel_a]
        kn_a = np.array([neighbors[j] for j in nb_a])
        uv2 = m.kf_uv[kn_a, idx_pair]
        uv1_pred = project_np(cam, pc1)
        uv2_pred = project_np(cam, pc2)
        e1 = np.sum((uv1_pred - uv1) ** 2, -1) * inv_s2[m.kf_level[k][sel_a]]
        e2 = np.sum((uv2_pred - uv2) ** 2, -1) * inv_s2[m.kf_level[kn_a, idx_pair]]
        good = (
            (pc1[:, 2] > 0)
            & (pc2[:, 2] > 0)
            & (cosp < self.cfg.min_parallax_cos)
            & (e1 < self.cfg.reproj_chi2)
            & (e2 < self.cfg.reproj_chi2)
            & np.isfinite(pts).all(axis=-1)
        )
        if good.any():
            gsel = sel_a[good]
            g_idx = idx_pair[good]
            g_kn = kn_a[good]
            g_pts = pts[good]
            with self.lock:
                # slots may have been claimed since the snapshot
                still = (m.kf_obs[k, gsel] == NO_POINT) & (
                    m.kf_obs[g_kn, g_idx] == NO_POINT
                )
                gsel, g_idx, g_kn, g_pts = (
                    gsel[still], g_idx[still], g_kn[still], g_pts[still]
                )
                if len(gsel):
                    try:
                        mp_idx = m.alloc_points(len(gsel))
                    except RuntimeError:
                        mp_idx = np.empty(0, np.int64)
                    n_ok = len(mp_idx)
                    if n_ok:
                        m.mp_pos[mp_idx] = g_pts[:n_ok]
                        m.mp_first_kf[mp_idx] = k
                        m.kf_obs[k, gsel[:n_ok]] = mp_idx
                        m.kf_obs[g_kn[:n_ok], g_idx[:n_ok]] = mp_idx
                        created.append(mp_idx)
        if not created:
            return np.empty(0, np.int64)
        out = np.concatenate(created)
        with self.lock:
            m.update_point_stats(out, self.tcfg.scale_factors())
        return out

    # -------------------------------------------------------------- fusion
    def _fuse_neighbors(self, k: int):
        """Project k's points into neighbors and fuse duplicates
        (reference: SearchInNeighbors src/LocalMapping.cc:714, Fuse
        src/ORBmatcher.cc:1148). Simplified to first-order neighbors."""
        m = self.map
        cam = self.tcfg.cam
        with self.lock:
            neighbors = [
                int(x)
                for x in m.best_covisible(
                    k, self.cfg.n_triangulation_neighbors, min_weight=10
                )
            ][:8]
            slots_k, mps_k = m.observations_of_kf(k)
            if len(mps_k) == 0 or len(neighbors) == 0:
                return
            F = m.kf_uv.shape[1]
            NB = 8
            n_c = min(len(mps_k), F)
            c_sel = np.arange(n_c)
            desc_p = _pad1(m.mp_desc[mps_k[:n_c]], F)
            # batched: project the candidate set into every neighbor (numpy,
            # tiny), then ONE vmapped match dispatch across neighbors — the
            # (NB, F, F) radius masks are computed on device from the
            # projections (materializing + uploading them cost ~8 MB/KF)
            uv_pred = np.zeros((NB, F, 2), np.float32)
            uv_n = np.zeros((NB, F, 2), np.float32)
            desc_n = np.zeros((NB, F, 8), np.uint32)
            valid_n = np.zeros((NB, F), bool)
            val_p_nb = np.zeros((NB, F), bool)
            for j, kn in enumerate(neighbors):
                pc = m.mp_pos[mps_k[:n_c]] @ m.kf_R[kn].T + m.kf_t[kn]
                uv = project_np(cam, pc)
                visible = (
                    (pc[:, 2] > 0.05)
                    & (uv[:, 0] >= 0) & (uv[:, 0] < cam.width)
                    & (uv[:, 1] >= 0) & (uv[:, 1] < cam.height)
                )
                val_p_nb[j, :n_c] = visible
                uv_pred[j] = _pad1(np.nan_to_num(uv).astype(np.float32), F)
                uv_n[j] = m.kf_uv[kn]
                desc_n[j] = m.kf_desc[kn]
                valid_n[j] = m.kf_feat_valid[kn]
        # compute phase (NO lock); numpy straight into the jit (see above)
        idx_all, ok_all = _batched_fuse_match(
            desc_p, val_p_nb, desc_n, valid_n, uv_pred, uv_n,
        )
        idx_all, ok_all = fetch((idx_all, ok_all))
        with self.lock:
            self._commit_fuse(k, neighbors, mps_k, c_sel, n_c, idx_all, ok_all)

    def _commit_fuse(self, k, neighbors, mps_k, c_sel, n_c, idx_all, ok_all):
        m = self.map
        counts = m.obs_count_per_point()  # once, not per match
        for j, kn in enumerate(neighbors):
            ok_np = ok_all[j]
            ok_np[n_c:] = False
            idx_np = idx_all[j]
            for i in np.flatnonzero(ok_np):
                mp_src = int(mps_k[c_sel[i]])
                tgt_slot = int(idx_np[i])
                mp_tgt = int(m.kf_obs[kn, tgt_slot])
                if not m.mp_valid[mp_src]:
                    continue
                if mp_tgt == NO_POINT:
                    m.kf_obs[kn, tgt_slot] = mp_src
                elif mp_tgt != mp_src and m.mp_valid[mp_tgt]:
                    # keep the one with more observations
                    if counts[mp_tgt] >= counts[mp_src]:
                        m.replace_point(mp_src, mp_tgt)
                    else:
                        m.replace_point(mp_tgt, mp_src)

    # ------------------------------------------------------------ local BA
    def _local_ba(self, k: int):
        """Reference: Optimizer::LocalBundleAdjustment (src/Optimizer.cc:1116):
        covisible window optimized, frontier fixed, their points free."""
        m = self.map
        with self.stats.measure("ba_select"):
            window = [k] + [
                int(x) for x in m.best_covisible(k, self.cfg.ba_window, min_weight=10)
            ]
            window = list(dict.fromkeys(window))
            obs = m.kf_obs[window]
            mp_sel = np.unique(obs[obs != NO_POINT])
            mp_sel = mp_sel[m.mp_valid[mp_sel]]
            if len(mp_sel) < 20:
                return
            # frontier: kfs observing these points but not in window
            observers = np.flatnonzero(m.point_observers(mp_sel))
            frontier = [int(x) for x in observers if int(x) not in window]
            # bound the problem to the static BA pad shape (_pad_problem): keep
            # the strongest-covis frontier keyframes. The reference includes every
            # observer as a fixed vertex (src/Optimizer.cc:1183 region); capping
            # only drops distant anchors, never optimized keyframes.
            max_frontier = _BA_PAD_K - len(window)
            if len(frontier) > max_frontier > 0:
                w = m.covisibility_weights(k)[frontier]
                order = np.argsort(-w)
                frontier = [frontier[i] for i in order[:max_frontier]]
            kf_sel = np.array(window + frontier)
            fixed = np.zeros(len(kf_sel), bool)
            fixed[len(window):] = True
            if len(frontier) == 0:
                fixed[0] = True  # gauge anchor
            # always fix the oldest keyframe in the problem (reference fixes kf 0
            # implicitly via frontier; a 2-kf map needs an explicit anchor)
            oldest = int(np.argmin(m.kf_frame_id[kf_sel]))
            fixed[oldest] = True
        with self.stats.measure("ba_build"), self.lock:
            prob = _build_ba_problem(m, self.tcfg, kf_sel, mp_sel, fixed)
        with self.stats.measure("ba_pad"):
            prob = _pad_problem(prob)
        with self.stats.measure("ba_solve"):
            res = bundle_adjust(prob, self.tcfg.cam, 2, 5)
            res = fetch(res)  # overlapped readback, sync OUTSIDE the lock
        with self.stats.measure("ba_write"), self.lock:
            _write_back_ba(m, prob, res, kf_sel, mp_sel)
            self._drop_ba_outliers(m, prob, res, kf_sel, mp_sel)

    def _drop_ba_outliers(self, m, prob, res, kf_sel, mp_sel):
        # drop outlier observations
        obs_inl = np.asarray(res.obs_inlier)
        obs_cam = np.asarray(prob.obs_cam)
        obs_pt = np.asarray(prob.obs_pt)
        obs_valid = np.asarray(prob.obs_valid)
        bad = (~obs_inl) & obs_valid
        for o in np.flatnonzero(bad):
            kk = int(kf_sel[obs_cam[o]])
            mp = int(mp_sel[obs_pt[o]])
            slot = np.flatnonzero(m.kf_obs[kk] == mp)
            if len(slot):
                m.kf_obs[kk, slot[0]] = NO_POINT

    # ------------------------------------------------------------- culling
    def _cull_recent_points(self, k: int):
        """Reference: MapPointCulling (src/LocalMapping.cc:346)."""
        m = self.map
        keep = []
        counts = m.obs_count_per_point()
        for mp_idx, birth in self.recent_points:
            age = k - birth  # keyframe-count age proxy
            alive = m.mp_valid[mp_idx]
            ratio = m.mp_found[mp_idx] / np.maximum(m.mp_visible[mp_idx], 1)
            bad = alive & (ratio < self.cfg.cull_found_ratio)
            if age >= 2:
                bad |= alive & (counts[mp_idx] < self.cfg.cull_min_obs)
            if bad.any():
                m.remove_point(mp_idx[bad])
            if age < 3:
                keep.append((mp_idx[~bad & alive], birth))
        self.recent_points = keep

    def _cull_keyframes(self, k: int):
        """Reference: KeyFrameCulling (src/LocalMapping.cc:902): a covisible
        kf whose tracked points are >=90% seen by >=3 other kfs (at finer or
        equal scale — scale check simplified away) is removed."""
        m = self.map
        counts = m.obs_count_per_point()
        # loop-edge keyframes are uncullable (reference: AddLoopEdge sets
        # mbNotErase, src/KeyFrame.cc:525-528)
        protected = m.loop_edge_keyframes()
        for kc in m.best_covisible(k, 10, min_weight=10):
            kc = int(kc)
            if kc == k or kc in protected:
                continue
            slots, mps = m.observations_of_kf(kc)
            if len(mps) < 20:
                continue
            redundant = (counts[mps] >= self.cfg.cull_min_obs + 1).mean()
            if redundant > self.cfg.kf_cull_redundancy:
                m.remove_keyframe(kc)


@jax.jit
def _batched_neighbor_match(desc_k, free_k, r_k, desc_n, valid_n, r_n, E_n, th_n):
    """Match kf-k features against NB neighbor keyframes in one dispatch,
    epipolar gate included (reference: SearchForTriangulation epipolar
    check, src/ORBmatcher.cc:907 region).

    The (NB, F, F) epipolar masks are computed ON DEVICE from tiny inputs
    (unit-plane rays r_k (F,3) / r_n (NB,F,3), essential matrices E_n
    (NB,3,3), per-target chi2 thresholds th_n (NB,F)) — materializing them
    on a 2-core host and shipping 8 MB of bools per keyframe was the
    mapper's dominant cost.

    Returns idx (NB, F), keep (NB, F).
    """
    F = desc_k.shape[0]

    def one(dn, vn, rn, E, th):
        l2 = r_k @ E.T  # epiline of each k-feature in the neighbor's plane
        d = l2 @ rn.T  # (F, F) algebraic point-line distance
        den = l2[:, 0] ** 2 + l2[:, 1] ** 2
        err = d * d / jnp.maximum(den[:, None], 1e-12)
        mask = err < th[None, :]
        idx, ok, dist = mutual_best_match(
            desc_k, free_k, dn, vn, max_dist=TH_LOW, ratio=0.8, extra_mask=mask
        )
        keep = resolve_duplicate_targets(idx, ok, dist, F)
        return idx, keep

    return jax.vmap(one)(desc_n, valid_n, r_n, E_n, th_n)


@jax.jit
def _batched_fuse_match(desc_p, val_p_nb, desc_n, valid_n, uv_pred, uv_n):
    """Fuse matching against NB neighbors in one dispatch (radius masks
    computed on device from projected candidates uv_pred (NB,F,2) and
    neighbor keypoints uv_n (NB,F,2); 3 px fuse radius).

    desc_p: (F, 8) candidate point descriptors (shared across neighbors);
    val_p_nb: (NB, F) per-neighbor candidate visibility.
    """
    def one(vp, dn, vn, uvp, uvn):
        d2 = jnp.sum((uvp[:, None, :] - uvn[None]) ** 2, -1)
        mask = d2 < 9.0
        idx, ok, dist = mutual_best_match(
            desc_p, vp, dn, vn, max_dist=TH_LOW, extra_mask=mask
        )
        return idx, ok

    return jax.vmap(one)(val_p_nb, desc_n, valid_n, uv_pred, uv_n)


def _hat(v):
    return np.array(
        [[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]], dtype=np.float32
    )


def _pad_problem(prob):
    """Pad the BA problem to a session-static shape — in PURE NUMPY.

    On accelerator backends every new shape is a fresh XLA compile — minutes
    on remote-compile TPU setups — so the local-BA problem is padded straight
    to ONE max shape (_BA_PAD_K/_BA_PAD_P/_BA_PAD_O; the window builder caps
    the keyframe count to fit). The padded FLOPs are noise on a TPU (the
    reduced camera system is 192x192). On CPU (tests) power-of-two buckets
    keep small problems cheap. Numpy matters: device-side concatenates from
    a mapper thread each paid a tunnel round trip + a per-shape compile
    (measured 7 s/keyframe); numpy padding is microseconds and the jitted
    solver uploads the finished problem in one batch.
    """
    from ..optim.ba import BAProblem

    def bucket(n, q):
        # next power-of-two multiple of the floor q
        b = q
        while b < n:
            b *= 2
        return b

    K = prob.T_cw.t.shape[0]
    P = prob.points.shape[0]
    O = prob.obs_cam.shape[0]
    if jax.default_backend() != "cpu":
        # exactly TWO accelerator shapes for the steady-state local BA (each
        # new shape = a minutes-long remote compile, but the always-max shape
        # made every local BA pay the worst case: the device solve scales
        # with P and O, and typical local windows fit the small bucket at
        # ~1/4 the device time). Problems that exceed the static pads (the
        # loop closer's global BA / merge weld run over ALL keyframes) fall
        # back to power-of-two growth — rare, and each bucket compiles once.
        if K <= 16 and P <= _BA_PAD_P // 2 and O <= _BA_PAD_O // 2:
            Kb, Pb, Ob = 16, _BA_PAD_P // 2, _BA_PAD_O // 2
        elif K <= _BA_PAD_K and P <= _BA_PAD_P and O <= _BA_PAD_O:
            Kb, Pb, Ob = _BA_PAD_K, _BA_PAD_P, _BA_PAD_O
        else:
            Kb = max(_BA_PAD_K, bucket(K, 16))
            Pb = max(_BA_PAD_P, bucket(P, 4096))
            Ob = max(_BA_PAD_O, bucket(O, 8192))
    else:
        Kb, Pb, Ob = bucket(K, 16), bucket(P, 4096), bucket(O, 8192)
    if (Kb, Pb, Ob) == (K, P, O):
        return prob

    def padn(a, n, fill=0.0):
        a = np.asarray(a)
        out = np.full((n, *a.shape[1:]), fill, a.dtype)
        out[: len(a)] = a
        return out

    R = padn(prob.T_cw.R, Kb)
    R[K:] = np.eye(3, dtype=R.dtype)
    return BAProblem(
        T_cw=SE3(R, padn(prob.T_cw.t, Kb)),
        cam_fixed=padn(prob.cam_fixed, Kb, True),
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
