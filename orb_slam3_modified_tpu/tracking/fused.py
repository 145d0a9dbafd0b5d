"""Fused device-resident tracking step.

The per-frame hot path as ONE jitted dispatch with the tracker state and a
local-map point cache living on device (SURVEY.md §7.3 item 5: "fuse the
whole track step into <=2 dispatches; keep tracker state resident on
device"). Host<->device crossings dominate on tunneled TPUs (~50 ms RTT
measured), so the steady-state loop:

- uploads the frame's features (async h2d),
- dispatches track_step (async),
- starts an async copy of the tiny outputs,
- reads results with a LAG of a few frames, so transfers overlap compute
  and the pipeline never blocks on the interconnect.

The map cache (a fixed-capacity slice of map points near the camera) is
refreshed by the host at keyframe rate, not frame rate. Matching +
IRLS-LM pose optimization reuse the same kernels as the reference-style
Tracker; this path handles the steady OK state, while initialization,
relocalization and keyframe bookkeeping stay in tracking/tracker.py.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..cameras import Camera, project
from ..features.matcher import (
    TH_HIGH,
    TH_LOW,
    mutual_best_match,
    resolve_duplicate_targets,
)
from ..lie.se3 import SE3
from ..optim.pose_opt import pose_optimization

CACHE_CAP = 4096  # device-resident local-map point budget


class MapCache(NamedTuple):
    pos: jnp.ndarray  # (C, 3)
    desc: jnp.ndarray  # (C, 8) uint32
    valid: jnp.ndarray  # (C,)
    mp_id: jnp.ndarray  # (C,) int32 global ids (host decodes matches)


class DeviceTrackState(NamedTuple):
    R: jnp.ndarray  # (3, 3) current T_cw
    t: jnp.ndarray  # (3,)
    R_prev: jnp.ndarray
    t_prev: jnp.ndarray
    ok: jnp.ndarray  # () bool — last step had enough inliers


class StepOutput(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    n_inliers: jnp.ndarray  # () int32
    obs_cache_idx: jnp.ndarray  # (F,) int32 cache index per feature or -1


def make_step_body(
    cam: Camera, inv_s2_levels, feat_cap: int, rounds: int = 4, iters: int = 8,
    bf: float = 0.0,
):
    """Pure (state, cache, features) -> (state, out) step, shared by the
    per-frame jit (make_track_step) and the chunked lax.scan pipeline
    (tracking/chunked.py).

    bf > 0 enables rectified-stereo residual rows: callers pass per-feature
    right-image u (f_ur, <0 = mono row) and the pose solves use the
    reference's (u, v, uR) EdgeStereo rows (src/Optimizer.cc EdgeStereo)."""
    inv_s2_levels = jnp.asarray(inv_s2_levels)
    bf = float(bf)  # static: may arrive as a jnp scalar (cfg.bf = b * cam.fx)

    def track_step(
        state: DeviceTrackState,
        cache: MapCache,
        f_uv,
        f_desc,
        f_level,
        f_valid,
        f_ur=None,
    ):
        # --- constant-velocity prediction: T_pred = (T T_prev^-1) T
        T = SE3(state.R, state.t)
        T_prev = SE3(state.R_prev, state.t_prev)
        vel = T @ T_prev.inverse()
        T_pred = vel @ T

        def match_and_optimize(T_init, radius_scale, prev_R, prev_t):
            pc = T_init.apply(cache.pos)
            uv_pred = project(cam, pc)
            in_view = (
                cache.valid
                & (pc[..., 2] > 0.05)
                & (uv_pred[..., 0] >= -20)
                & (uv_pred[..., 0] < cam.width + 20)
                & (uv_pred[..., 1] >= -20)
                & (uv_pred[..., 1] < cam.height + 20)
            )
            d2 = uv_pred[:, None, :] - f_uv[None, :, :]
            r = radius_scale * (1.2 ** f_level.astype(jnp.float32))
            spatial = jnp.sum(d2 * d2, axis=-1) < (r * r)[None, :]
            idx, okm, dist = mutual_best_match(
                cache.desc,
                in_view,
                f_desc,
                f_valid,
                max_dist=TH_HIGH,
                ratio=0.9,
                extra_mask=spatial,
            )
            keep = resolve_duplicate_targets(idx, okm, dist, feat_cap)
            # build pose-opt problem over cache entries (fixed C capacity)
            pts = cache.pos
            uv_obs = f_uv[idx]
            inv_s2 = inv_s2_levels[jnp.clip(f_level[idx], 0, inv_s2_levels.shape[0] - 1)]
            res = pose_optimization(
                T_init, cam, pts, uv_obs, inv_s2, rounds, iters, valid=keep,
                ur_obs=None if (f_ur is None or bf <= 0) else f_ur[idx],
                bf=None if (f_ur is None or bf <= 0) else jnp.float32(bf),
            )
            return res, idx, keep

        res1, idx1, keep1 = match_and_optimize(T_pred, 15.0, state.R, state.t)
        # second pass with refined pose + tight radius picks up more matches
        res2, idx2, keep2 = match_and_optimize(res1.T_cw, 4.0, state.R, state.t)

        # --- device-side recovery pass (reference analog:
        # TrackReferenceKeyFrame after TrackWithMotionModel failure,
        # src/Tracking.cc:1928 region — brute descriptor match, no motion
        # window). When the windowed passes collapse (motion-model break,
        # stale prediction), a spatially-unconstrained mutual match against
        # the cache re-acquires the pose WITHOUT leaving the device — the
        # host slow-path replay this replaces costs ~1 s/frame in tunnel
        # round trips. lax.cond-gated: healthy frames (the vast majority)
        # skip its ~2x step cost entirely on TPU's real conditionals.
        need_rec = res2.n_inliers < 25

        def do_recovery(_):
            idxr, okr, distr = mutual_best_match(
                cache.desc, cache.valid, f_desc, f_valid,
                max_dist=TH_LOW, ratio=0.8,
            )
            keepr = resolve_duplicate_targets(idxr, okr, distr, feat_cap)
            inv_s2r = inv_s2_levels[
                jnp.clip(f_level[idxr], 0, inv_s2_levels.shape[0] - 1)
            ]
            resr0 = pose_optimization(
                T, cam, cache.pos, f_uv[idxr], inv_s2r, rounds, iters,
                valid=keepr,
                ur_obs=None if (f_ur is None or bf <= 0) else f_ur[idxr],
                bf=None if (f_ur is None or bf <= 0) else jnp.float32(bf),
            )
            # polish with a windowed pass from the re-acquired pose
            resr, idxr2, keepr2 = match_and_optimize(
                resr0.T_cw, 6.0, state.R, state.t
            )
            return (resr.T_cw.R, resr.T_cw.t, resr.n_inliers,
                    resr.inliers, idxr2, keepr2)

        def no_recovery(_):
            return (res2.T_cw.R, res2.T_cw.t, jnp.int32(-1),
                    res2.inliers, idx2, keep2)

        (rec_R, rec_t, rec_n, rec_inl, idxr2, keepr2) = jax.lax.cond(
            need_rec, do_recovery, no_recovery, None
        )

        use_rec = need_rec & (rec_n > res2.n_inliers)
        n_inl = jnp.where(use_rec, rec_n, res2.n_inliers)
        T_sel_R = jnp.where(use_rec, rec_R, res2.T_cw.R)
        T_sel_t = jnp.where(use_rec, rec_t, res2.T_cw.t)
        idx_f = jnp.where(use_rec, idxr2, idx2)
        good = jnp.where(
            use_rec, keepr2 & rec_inl, keep2 & res2.inliers
        )
        ok = n_inl >= 20
        R_new = jnp.where(ok, T_sel_R, T_pred.R)
        t_new = jnp.where(ok, T_sel_t, T_pred.t)
        # per-feature cache association (invert idx_f: feature -> cache entry)
        obs = jnp.full((feat_cap,), -1, jnp.int32)
        src = jnp.arange(cache.pos.shape[0], dtype=jnp.int32)
        obs = obs.at[idx_f].max(jnp.where(good, src, -1))
        # a recovery jump invalidates the constant-velocity history: zero
        # the velocity (R_prev = R_new) instead of deriving a bogus one
        R_prev = jnp.where(use_rec, R_new, state.R)
        t_prev = jnp.where(use_rec, t_new, state.t)
        new_state = DeviceTrackState(
            R=R_new, t=t_new, R_prev=R_prev, t_prev=t_prev, ok=ok
        )
        out = StepOutput(R_new, t_new, n_inl, obs)
        return new_state, out

    return track_step


def make_track_step(cam: Camera, inv_s2_levels, feat_cap: int):
    """Build the jitted fused step for a given camera/feature capacity."""
    return jax.jit(make_step_body(cam, inv_s2_levels, feat_cap))


class FusedTracker:
    """Steady-state pipeline driver around tracking/tracker.py.

    Delegates to the full Tracker for initialization, keyframe creation,
    loss recovery and relocalization; once tracking is OK it streams frames
    through the fused device step, syncing with the host only at keyframe
    decisions (with a configurable readback lag).
    """

    def __init__(self, tracker, lag: int = 2, map_lock=None):
        import threading

        from .tracker import OK

        self.tracker = tracker
        self.cfg = tracker.cfg
        self.lag = lag
        self.map_lock = map_lock or threading.Lock()
        self._pending = []  # (fid, ts, feats, out, cache_ids)
        self.state: DeviceTrackState | None = None
        self.cache: MapCache | None = None
        self.cache_ids: np.ndarray | None = None
        self._step = None

    # -------------------------------------------------------------- cache
    def refresh_cache(self):
        """Rebuild the device point cache from the current local map."""
        t = self.tracker
        m = t.map
        k = t.ref_kf
        if k < 0 or not m.kf_valid[k]:
            return
        window = [k] + [int(x) for x in m.best_covisible(k, 10, min_weight=5)]
        obs = m.kf_obs[window]
        mp = np.unique(obs[obs >= 0])
        mp = mp[m.mp_valid[mp]][:CACHE_CAP]
        n = len(mp)
        pos = np.zeros((CACHE_CAP, 3), np.float32)
        desc = np.zeros((CACHE_CAP, 8), np.uint32)
        valid = np.zeros(CACHE_CAP, bool)
        ids = np.full(CACHE_CAP, -1, np.int32)
        pos[:n] = m.mp_pos[mp]
        desc[:n] = m.mp_desc[mp]
        valid[:n] = True
        ids[:n] = mp
        self.cache = MapCache(
            jnp.asarray(pos), jnp.asarray(desc), jnp.asarray(valid), jnp.asarray(ids)
        )
        self.cache_ids = ids

    def _sync_state_from_tracker(self):
        t = self.tracker
        T = t.last.T_cw
        T_prev = T if t.velocity is None else t.velocity.inverse() @ T
        self.state = DeviceTrackState(
            R=jnp.asarray(np.asarray(T.R)),
            t=jnp.asarray(np.asarray(T.t)),
            R_prev=jnp.asarray(np.asarray(T_prev.R)),
            t_prev=jnp.asarray(np.asarray(T_prev.t)),
            ok=jnp.asarray(True),
        )

    # --------------------------------------------------------------- track
    def track(self, feats, ts: float):
        from .tracker import OK

        t = self.tracker
        if t.state != OK or t.ref_kf < 0:
            # slow path (init / reloc / recovery) — mutates the map from
            # this thread, so serialize against the async mapper
            with self.map_lock:
                out = t.track(feats, ts)
                if t.state == OK:
                    self.refresh_cache()
                    self._sync_state_from_tracker()
            return out
        if self.cache is None or self.state is None:
            self.refresh_cache()
            self._sync_state_from_tracker()
        if self._step is None:
            self._step = make_track_step(
                self.cfg.cam, self.cfg.inv_level_sigma2(), feats.capacity
            )
        self.state, out = self._step(
            self.state, self.cache, feats.uv, feats.desc, feats.level, feats.valid
        )
        # async copy of the small outputs; consumed after `lag` frames
        for leaf in (out.R, out.t, out.n_inliers, out.obs_cache_idx):
            try:
                leaf.copy_to_host_async()
            except Exception:
                pass
        self._pending.append((t.frame_id, ts, feats, out, self.cache_ids))
        t.frame_id += 1
        result = None
        if len(self._pending) > self.lag:
            result = self._retire(*self._pending.pop(0))
        return result

    def flush(self):
        """Retire all pending frames (end of sequence)."""
        outs = []
        while self._pending:
            outs.append(self._retire(*self._pending.pop(0)))
        return outs

    def _retire(self, fid, ts, feats, out, cache_ids):
        """Read back one frame's result; run keyframe policy on the host.
        Holds the map lock across map reads/writes (the async mapper mutates
        the arena from its worker thread)."""
        from ..slam_map.map_state import NO_POINT
        from .tracker import RECENTLY_LOST, FrameRecord

        t = self.tracker
        # lock-free fast path: per-frame retire only does brief element reads
        # and counter bumps (torn reads are benign, mirroring the reference's
        # snapshot-style tracker reads); only keyframe creation, which
        # structurally mutates the arena, takes the map lock below.
        return self._retire_impl(fid, ts, feats, out, cache_ids, t, NO_POINT, RECENTLY_LOST, FrameRecord)

    def _retire_impl(self, fid, ts, feats, out, cache_ids, t, NO_POINT, RECENTLY_LOST, FrameRecord):
        n_inl = int(out.n_inliers)
        R = np.asarray(out.R)
        tt = np.asarray(out.t)
        # numpy-backed SE3: the per-frame path must not upload to device
        T = SE3(R, tt)
        obs_cache = np.asarray(out.obs_cache_idx)
        obs_mp = np.full(feats.capacity, NO_POINT, np.int32)
        hit = obs_cache >= 0
        obs_mp[hit] = cache_ids[obs_cache[hit]]
        # points may have been culled/fused since this frame was dispatched
        stale = (obs_mp != NO_POINT) & ~t.map.mp_valid[np.maximum(obs_mp, 0)]
        obs_mp[stale] = NO_POINT
        # numpy 4x4 (SE3.matrix() is jnp-backed -> device round trip)
        T_abs = np.eye(4)
        T_abs[:3, :3] = R
        T_abs[:3, 3] = tt
        if n_inl < self.cfg.min_inliers_local:
            # fall back to the full tracker on the next frame
            t.state = RECENTLY_LOST
            t.last = FrameRecord(feats, T, obs_mp, ts, fid)
            self.state = None
            return None
        rec = FrameRecord(feats, T, obs_mp, ts, fid)
        # velocity in numpy (SE3 methods would dispatch device ops per frame)
        if t.last is not None:
            R_l = np.asarray(t.last.T_cw.R)
            t_l = np.asarray(t.last.T_cw.t)
            vR = R @ R_l.T
            vt = tt - vR @ t_l
            t.velocity = SE3(vR, vt)
        t.last = rec
        t.frames_since_kf += 1
        t.n_last_inliers = n_inl
        # trajectory (relative log, same as Tracker.track)
        ref = t.ref_kf
        if ref >= 0 and t.map.kf_valid[ref]:
            T_kw = np.eye(4)
            T_kw[:3, :3] = t.map.kf_R[ref]
            T_kw[:3, 3] = t.map.kf_t[ref]
            t.trajectory.append(
                (ts, fid, ref, int(t.map.kf_frame_id[ref]),
                 T_abs @ np.linalg.inv(T_kw), T_abs)
            )
        else:
            t.trajectory.append((ts, fid, -1, -1, T_abs, T_abs))
        if t._need_new_keyframe(n_inl):
            T_pre = np.eye(4)
            T_pre[:3, :3] = np.asarray(rec.T_cw.R)
            T_pre[:3, 3] = np.asarray(rec.T_cw.t)
            with self.map_lock:
                t._create_keyframe(rec)
            # local BA just moved the new keyframe: propagate the world
            # correction W = T_pre^-1 T_post into the device-resident pose
            # (otherwise the pipeline drifts away from the optimized map)
            k_new = t.ref_kf
            T_post = np.eye(4)
            T_post[:3, :3] = t.map.kf_R[k_new]
            T_post[:3, 3] = t.map.kf_t[k_new]
            W = np.linalg.inv(T_pre) @ T_post
            if np.abs(W - np.eye(4)).max() > 1e-9 and self.state is not None:
                Wj = jnp.asarray(W.astype(np.float32))

                def corr(R, tt_):
                    T4 = jnp.concatenate(
                        [
                            jnp.concatenate([R, tt_[:, None]], axis=1),
                            jnp.asarray([[0.0, 0.0, 0.0, 1.0]]),
                        ],
                        axis=0,
                    ) @ Wj
                    return T4[:3, :3], T4[:3, 3]

                R1, t1 = corr(self.state.R, self.state.t)
                R0, t0 = corr(self.state.R_prev, self.state.t_prev)
                self.state = DeviceTrackState(R1, t1, R0, t0, self.state.ok)
            # refresh candidates; in-flight steps keep their captured cache
            self.refresh_cache()
        return T_abs
