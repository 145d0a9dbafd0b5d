"""Fused device-resident tracking step.

The per-frame hot path as ONE jitted program with the tracker state and a
local-map point cache living on device (SURVEY.md §7.3 item 5: "fuse the
whole track step into <=2 dispatches; keep tracker state resident on
device"). The production driver is the chunked frontend
(tracking/chunked.py), which lax.scan's this step over 16-frame chunks; the
map cache (a fixed-capacity slice of map points near the camera) is
refreshed by the host at keyframe rate, not frame rate. Matching + IRLS-LM
pose optimization reuse the same kernels as the reference-style Tracker;
this step handles the steady OK state, while initialization, relocalization
and keyframe bookkeeping stay in tracking/tracker.py.
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
