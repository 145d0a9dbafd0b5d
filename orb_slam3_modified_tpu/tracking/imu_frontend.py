"""Visual-inertial tracking state: preintegration buffers + staged init.

TPU-native replacement for the IMU plumbing inside the reference Tracking
and LocalMapping threads (reference: Tracking::PreintegrateIMU
src/Tracking.cc:1627, PredictStateIMU :1741, UpdateFrameIMU :3983;
LocalMapping::InitializeIMU :1173 with priors 1e2/1e10, VIBA1 at t>5s,
VIBA2 at t>15s :207-230, ScaleRefinement :1429).

The frontend owns body state (velocity, biases), per-frame and per-keyframe
preintegrated deltas, and runs the staged initialization over the keyframe
chain. Camera<->body extrinsics follow the reference's Tbc convention.
"""
from __future__ import annotations

import dataclasses
import logging

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger(__name__)

from ..imu.preintegration import (
    ImuBias,
    Preintegrated,
    integrate,
    merge,
    predict_state,
)
from ..lie.se3 import SE3
from ..optim.inertial import InertialChain, inertial_only_optimization

IMU_BATCH = 64  # padded samples per frame gap


@dataclasses.dataclass
class ImuConfig:
    noise_gyro: float = 1.7e-4
    noise_acc: float = 2.0e-3
    walk_gyro: float = 1.9e-5
    walk_acc: float = 3.0e-3
    freq: float = 200.0
    R_bc: np.ndarray = None  # camera-to-body rotation
    t_bc: np.ndarray = None
    init_time: float = 2.0  # seconds of keyframes before first IMU init
    viba1_time: float = 5.0
    viba2_time: float = 15.0
    # monocular maps have free scale; stereo/RGB-D-inertial maps are already
    # metric so the init must NOT rescale them (reference: InitializeIMU's
    # bMonocular -> FixedScale in InertialOptimization/FullInertialBA,
    # src/LocalMapping.cc:1173, src/Optimizer.cc:3042)
    mono: bool = True


class ImuFrontend:
    def __init__(self, cfg: ImuConfig):
        self.cfg = cfg
        if cfg.R_bc is None:
            cfg.R_bc = np.eye(3, dtype=np.float32)
        if cfg.t_bc is None:
            cfg.t_bc = np.zeros(3, np.float32)
        self.bias = ImuBias.zero()
        self.v_w = np.zeros(3, np.float32)  # body velocity in world
        self.initialized = False
        self.stage = 0  # 0=none, 1=init done, 2=VIBA1, 3=VIBA2
        self.preint_frame: Preintegrated | None = None  # since last frame
        self.preint_kf: Preintegrated | None = None  # since last keyframe
        # 15-D marginalization prior on the last frame's state (reference:
        # mpcpi / EdgePriorPoseImu, src/Tracking.cc uses the prior produced
        # by Marginalize after each PoseInertialOptimizationLastFrame).
        # Anchored at the last solved body state + current bias.
        self.marg_prior: np.ndarray | None = None  # (15, 15)
        self._marg_pending: np.ndarray | None = None
        # keyframe-anchored prior (reference: the first frame after a
        # keyframe solves PoseInertialOptimizationLastKeyFrame against the
        # keyframe state, src/Optimizer.cc:4491). The frame that became the
        # keyframe carries its own solved 15-D posterior information; the
        # next frame anchors on the keyframe's (post-refine) map state with
        # that covariance-derived information. (kf_idx, kf_frame_id, H)
        self.kf_prior: tuple | None = None
        self.kf_chain: list = []  # [(kf_idx, Preintegrated from prev kf)]
        self.first_kf_ts: float | None = None
        self.R_gw = np.eye(3, dtype=np.float32)  # gravity alignment applied
        # bad-IMU detection (reference: src/LocalMapping.cc:138-147 — if the
        # camera barely moves before VIBA2, inertial init is unobservable and
        # the active map must be reset). t_motion accumulates only while the
        # rig is actually moving, mirroring the reference's mTinit clock.
        self.bad_imu = False
        self.t_motion = 0.0
        # bumped whenever a SOLVER (staged init, full VI BA, the mapper's
        # VI-window refinement) re-estimates self.bias — the chunked
        # frontend pushes the refined bias into the device-resident state at
        # the next dispatch (reference: UpdateFrameIMU resets the frame bias
        # to the keyframe's solved bias after LocalInertialBA/init,
        # src/Tracking.cc:3983). The per-frame device walk is random-walk
        # stiff by design and cannot absorb init-residual gravity tilt on
        # its own (measured: the accel bias must reach ~g*sin(tilt) before
        # the stiff IMU factor stops fighting the visual rows).
        self.bias_epoch = 0
        # ---- staged-init execution mode ------------------------------------
        # Synchronous (default): maybe_initialize solves inline in the
        # tracker's keyframe path — deterministic, used by the per-frame
        # entry points and --sync-mapping chunked runs.
        # Asynchronous (chunked pipeline): the solves run on the async
        # mapper's worker thread after keyframe processing (reference:
        # InitializeIMU runs on the LocalMapping thread,
        # src/LocalMapping.cc:200-230, never blocking Tracking) and the
        # applied world similarity is handed back through align_log; the
        # chunked frontend consumes it and corrects in-flight chunks
        # analytically.
        self.async_init = False
        self.map_lock = None  # shared map lock (async mode)
        self.abort_gba_fn = None  # stop a stale global BA before realigning
        # every applied world similarity (A = R_wg^T, s), in order; the
        # chunked frontend tracks its consumption epoch against this log
        self.align_log: list = []
        self.last_alignment = None
        self._epoch = 0  # bumped on reset/loss; in-flight solves abort
        # stage-4 periodic monocular scale refinement schedule (reference:
        # LocalMapping::Run re-runs ScaleRefinement while mTinit crosses
        # 25/35/45/55/65/75 s, src/LocalMapping.cc:232-244, :1429)
        self.refine_schedule = (25.0, 35.0, 45.0, 55.0, 65.0, 75.0)
        self.refine_idx = 0
        # IMU-init observability traces (reference: System::SaveDebugData
        # writes init_Rwg/Scale/Time files, src/System.cc:1305 region)
        self.init_log: list = []

    # ----------------------------------------------------------- per frame
    def integrate_frame(self, acc, gyro, dts):
        """Preintegrate this frame's IMU batch (padded device scan)."""
        n = len(dts)
        pad = max(IMU_BATCH, int(np.ceil(max(n, 1) / IMU_BATCH) * IMU_BATCH))
        a = np.zeros((pad, 3), np.float32)
        g = np.zeros((pad, 3), np.float32)
        d = np.zeros(pad, np.float32)
        v = np.zeros(pad, bool)
        a[:n], g[:n], d[:n], v[:n] = acc, gyro, dts, True
        pre = integrate(
            jnp.asarray(a), jnp.asarray(g), jnp.asarray(d), jnp.asarray(v),
            self.bias,
            self.cfg.noise_gyro, self.cfg.noise_acc,
            self.cfg.walk_gyro, self.cfg.walk_acc, self.cfg.freq,
        )
        self.preint_frame = pre
        self.preint_kf = pre if self.preint_kf is None else merge(self.preint_kf, pre)
        return pre

    def predict_pose(self, T_cw_last: SE3):
        """IMU dead-reckoning of the next camera pose (PredictStateIMU).

        T_bw = T_bc o T_cw; predict the body state across the frame gap,
        then map back: T_cw' = T_bc^-1 o T_bw'.
        """
        if self.preint_frame is None:
            return None
        R_bc = self.cfg.R_bc.astype(np.float32)
        t_bc = self.cfg.t_bc.astype(np.float32)
        R_cw = np.asarray(T_cw_last.R)
        t_cw = np.asarray(T_cw_last.t)
        R_bw = R_bc @ R_cw
        t_bw = R_bc @ t_cw + t_bc
        R_wb = R_bw.T
        p_wb = -R_bw.T @ t_bw
        R_new, v_new, p_new = predict_state(
            jnp.asarray(R_wb.astype(np.float32)),
            jnp.asarray(self.v_w),
            jnp.asarray(p_wb.astype(np.float32)),
            self.preint_frame,
            self.bias,
        )
        R_new = np.asarray(R_new)
        p_new = np.asarray(p_new)
        self._pred_v = np.asarray(v_new)
        R_bw_new = R_new.T
        t_bw_new = -R_bw_new @ p_new
        R_cw_new = R_bc.T @ R_bw_new
        t_cw_new = R_bc.T @ (t_bw_new - t_bc)
        return SE3(
            jnp.asarray(R_cw_new.astype(np.float32)),
            jnp.asarray(t_cw_new.astype(np.float32)),
        )

    def commit_frame_velocity(self, T_cw_prev: SE3, T_cw_cur: SE3, dt: float):
        """Update velocity from consecutive optimized poses (visual path) or
        the IMU prediction when initialized."""
        if dt <= 0:
            return
        # commit the marginalization prior produced by this frame's final
        # pose solve; it constrains the next frame's solve
        self.marg_prior = self._marg_pending
        self._marg_pending = None
        if self.initialized and hasattr(self, "_pred_v"):
            self.v_w = self._pred_v
        else:
            c_prev = np.asarray(T_cw_prev.inverse().t)
            c_cur = np.asarray(T_cw_cur.inverse().t)
            self.v_w = ((c_cur - c_prev) / dt).astype(np.float32)

    # -------------------------------------------------------- per keyframe
    def on_keyframe(self, kf_idx: int, ts: float, slam_map):
        # the frame becoming this keyframe carries its own solved posterior
        # information — keep it as the keyframe-anchored prior for the next
        # frame's solve (reference: PoseInertialOptimizationLastKeyFrame
        # anchors on the keyframe, src/Optimizer.cc:4491). The anchor STATE
        # is read from the map at solve time, so the mapper's VI refinement
        # moving the keyframe is absorbed; the information matrix is a
        # conservative carry-over of the pre-refine posterior.
        H_kf = self._marg_pending if self._marg_pending is not None else self.marg_prior
        if H_kf is not None:
            self.kf_prior = (int(kf_idx), int(slam_map.kf_frame_id[kf_idx]), H_kf)
        # keyframe processing (local/VI BA) moves the map the frame-to-frame
        # prior was linearized against: drop it (rebuilt on the next solve)
        self.marg_prior = None
        self._marg_pending = None
        if self.first_kf_ts is None:
            self.first_kf_ts = ts
        if self.preint_kf is not None:
            self.kf_chain.append(
                (kf_idx, int(slam_map.kf_frame_id[kf_idx]), self.preint_kf)
            )
        self.preint_kf = None
        slam_map.kf_vel[kf_idx] = self.v_w
        # bad-IMU gate over the last three keyframes (reference:
        # src/LocalMapping.cc:138-147: dist = |c_k - c_{k-1}| + |c_{k-1} -
        # c_{k-2}|; not enough motion before VIBA2 -> reset + mbBadImu)
        if len(self.kf_chain) >= 3 and self.stage < 3:
            ks = [c[0] for c in self.kf_chain[-3:]]
            if all(slam_map.kf_valid[x] for x in ks):
                cs = [-slam_map.kf_R[x].T @ slam_map.kf_t[x] for x in ks]
                dist = float(
                    np.linalg.norm(cs[2] - cs[1]) + np.linalg.norm(cs[1] - cs[0])
                )
                dt_kf = float(slam_map.kf_ts[ks[2]] - slam_map.kf_ts[ks[1]])
                if dist > 0.05:
                    self.t_motion += max(dt_kf, 0.0)
                elif self.initialized and self.t_motion < 10.0 and dist < 0.02:
                    self.bad_imu = True

    def on_initial_keyframes(self, k0: int, k1: int, ts0: float, ts1: float, slam_map):
        """Register the monocular-init keyframe pair: the accumulated
        preintegration covers exactly the k0->k1 gap (integration starts at
        the first tracked frame)."""
        self.first_kf_ts = ts0
        self.kf_chain = [
            (k0, int(slam_map.kf_frame_id[k0]), Preintegrated.identity(self.bias))
        ]
        if self.preint_kf is not None:
            self.kf_chain.append(
                (k1, int(slam_map.kf_frame_id[k1]), self.preint_kf)
            )
        self.preint_kf = None
        slam_map.kf_vel[k0] = self.v_w
        slam_map.kf_vel[k1] = self.v_w

    def valid_chain(self, slam_map):
        """Surviving keyframe chain with preintegrations MERGED across
        culled keyframes. Slot validity is not enough: free-listed slots get
        REUSED by newer keyframes, so the stored frame id must still match
        (otherwise intervals pair with the wrong poses). Returns
        (kfs, pres) with len(pres) == len(kfs) and pres[0] a placeholder
        (edges are pres[1:], between consecutive surviving kfs)."""
        kfs = [k for k, _, _ in self.kf_chain]
        fids = [f for _, f, _ in self.kf_chain]
        pres = [p for _, _, p in self.kf_chain]
        keep = [
            i
            for i, (k, f) in enumerate(zip(kfs, fids))
            if slam_map.kf_valid[k] and int(slam_map.kf_frame_id[k]) == f
        ]
        if not keep:
            return [], []
        kfs2, pres2 = [kfs[keep[0]]], [pres[keep[0]]]
        for prev, cur in zip(keep[:-1], keep[1:]):
            p = pres[prev + 1]
            for j in range(prev + 2, cur + 1):
                p = merge(p, pres[j])
            kfs2.append(kfs[cur])
            pres2.append(p)
        return kfs2, pres2

    def _init_due(self, slam_map):
        """Which staged-init event (if any) the chain is due for.

        Returns None, "init" (stages 1-3), or "refine" (stage-4 periodic
        monocular scale refinement). The chain must be substantial before
        solving gravity/scale — the reference requires nMinKF = 10 keyframes
        (InitializeIMU, src/LocalMapping.cc:1187 region); initializing on a
        starved map produces degenerate alignments that wreck tracking."""
        if self.first_kf_ts is None or len(self.kf_chain) < 10:
            return None
        last_ts = slam_map.kf_ts[self.kf_chain[-1][0]]
        # (timestamp of the newest chain entry; slot reuse handled below)
        elapsed = last_ts - self.first_kf_ts
        if self.stage == 0:
            return "init" if elapsed >= self.cfg.init_time else None
        if self.stage == 1:
            return "init" if elapsed >= self.cfg.viba1_time else None
        if self.stage == 2:
            return "init" if elapsed >= self.cfg.viba2_time else None
        # stage >= 3: periodic mono scale refinement (reference:
        # LocalMapping::Run @ mTinit 25-75 s, src/LocalMapping.cc:232-244)
        if not self.cfg.mono or self.refine_idx >= len(self.refine_schedule):
            return None
        if elapsed >= self.refine_schedule[self.refine_idx]:
            return "refine"
        return None

    def maybe_initialize(self, slam_map, tracker) -> bool:
        """Staged IMU init on the keyframe chain (InitializeIMU analog).

        Synchronous mode solves inline (per-frame entry points,
        --sync-mapping). In async mode this is a NO-OP — the async mapper
        worker calls run_pending_init after each keyframe instead, mirroring
        the reference's mapper-thread InitializeIMU
        (src/LocalMapping.cc:200-230)."""
        if self.async_init:
            return False
        due = self._init_due(slam_map)
        if due is None:
            return False
        snap = self._snapshot_chain(slam_map)
        if snap is None:
            return False
        import time as _time

        t0 = _time.perf_counter()
        res = self._solve_inertial(snap, due)
        ok = self._commit_init(
            slam_map, tracker, due, snap, res, _time.perf_counter() - t0
        )
        if ok and due == "init":
            # joint full visual-inertial BA over the chain: poses +
            # velocities + per-KF biases + points (reference: InitializeIMU
            # runs FullInertialBA with 100 iters and priors 1e2/1e10 after
            # ApplyScaledRotation, src/LocalMapping.cc:1280-1300; VIBA1/VIBA2
            # re-run it with 1/1e5 and 0/0). The newest KF's pose anchors the
            # gauge so the tracker's current pose stays consistent.
            import os as _os

            if _os.environ.get("ORB_TPU_NO_BG_VIBA", "0") != "1":  # debug
                kfs2, pres2 = snap[0], snap[1]
                self._full_vi_ba(slam_map, tracker, kfs2, pres2[1:])
        return ok

    def run_pending_init(self, slam_map, tracker):
        """Async-mode staged init, called on the mapper worker thread after
        each keyframe's mapping cycle (reference: LocalMapping::Run order —
        local BA, then InitializeIMU/VIBA, src/LocalMapping.cc:148-244).

        Snapshots under the map lock, solves unlocked (the tracker keeps
        streaming chunks), commits under the lock; the applied similarity
        lands in align_log for the chunked frontend to consume."""
        import time as _time

        lock = self.map_lock
        epoch = self._epoch
        with lock:
            if epoch != self._epoch:
                return False
            due = self._init_due(slam_map)
            if due is None:
                return False
            snap = self._snapshot_chain(slam_map)
        if snap is None:
            return False
        t0 = _time.perf_counter()
        res = self._solve_inertial(snap, due)
        res = jax.tree_util.tree_map(np.asarray, res)
        # a stale global BA would write pre-alignment poses back over the
        # realigned map — stop it first, WITHOUT holding the map lock (the
        # GBA thread needs the lock to finish its current phase)
        if self.abort_gba_fn is not None:
            self.abort_gba_fn()
        with lock:
            if epoch != self._epoch:
                return False
            ok = self._commit_init(
                slam_map, tracker, due, snap, res, _time.perf_counter() - t0
            )
        if ok and due == "init":
            import os as _os

            if _os.environ.get("ORB_TPU_NO_BG_VIBA", "0") != "1":  # debug knob
                self._bg_full_vi_ba(slam_map, tracker, epoch)
        return ok

    def _snapshot_chain(self, slam_map):
        """(kfs2, pres2, R_wb, p_wb) of the surviving chain, or None."""
        kfs2, pres2 = self.valid_chain(slam_map)
        if len(kfs2) < 6:
            return None
        R_bc = self.cfg.R_bc
        t_bc = self.cfg.t_bc
        # body rotations/positions from camera poses: T_bw = T_bc o T_cw
        R_wb, p_wb = [], []
        for k in kfs2:
            R_cw = slam_map.kf_R[k]
            t_cw = slam_map.kf_t[k]
            R_bw = R_bc @ R_cw
            t_bw = R_bc @ t_cw + t_bc
            R_wb.append(R_bw.T)
            p_wb.append(-R_bw.T @ t_bw)
        return (
            kfs2,
            pres2,
            np.stack(R_wb).astype(np.float32),
            np.stack(p_wb).astype(np.float32),
        )

    def _solve_inertial(self, snap, kind):
        kfs2, pres2, R_wb, p_wb = snap
        # pad the chain to a power-of-two keyframe bucket: the solve's
        # parameter vector is 9+3K, so every new chain length was a fresh
        # XLA compile — measured 52 s on the tunneled chip, landing right
        # in the tracking stream at each staged event. Padded edges carry
        # dT=0 identity preintegrations and valid=False; padded states are
        # copies of the last row (their residual rows are masked and their
        # velocity columns have zero jacobian, so they stay at the seed).
        K0 = len(kfs2)
        Kb = 8
        while Kb < K0:
            Kb *= 2
        pres = list(pres2[1:])
        if Kb > K0:
            pad = Preintegrated.identity(self.bias)
            pres = pres + [pad] * (Kb - K0)
            R_wb = np.concatenate(
                [R_wb, np.tile(R_wb[-1:], (Kb - K0, 1, 1))]
            )
            p_wb = np.concatenate(
                [p_wb, np.tile(p_wb[-1:], (Kb - K0, 1))]
            )
        chain = InertialChain.from_preintegrated(pres)
        if Kb > K0:
            mask = np.zeros(Kb - 1, bool)
            mask[: K0 - 1] = True
            chain = chain._replace(valid=jnp.asarray(mask))
        v0 = jnp.zeros((Kb, 3), jnp.float32)
        # scale is solved once for MONOCULAR maps and re-solved by the
        # periodic refinement; VIBA1/VIBA2 — and stereo/RGB-D maps, which
        # are metric from the baseline — keep it fixed (reference:
        # bFixScale gating in InertialOptimization/FullInertialBA;
        # ScaleRefinement always frees it, src/LocalMapping.cc:1429)
        fix_scale = (self.stage >= 1 or not self.cfg.mono) and kind != "refine"
        return inertial_only_optimization(
            # 80 damped-GN iterations: the 40-iteration budget left the
            # stereo (fix-scale) gravity estimate ~7 deg under-converged on
            # fast ring sequences; the loop is rolled, so compile time is
            # unchanged and runtime stays a one-off mapper-thread cost
            chain, jnp.asarray(R_wb), jnp.asarray(p_wb), v0, fix_scale, 80
        )

    def _commit_init(self, slam_map, tracker, kind, snap, res, t_solve) -> bool:
        """Validate + apply one staged-init solve. Caller holds the map lock
        in async mode."""
        kfs2 = snap[0]
        scale = float(res.scale)
        fix_scale = (self.stage >= 1 or not self.cfg.mono) and kind != "refine"
        # sanity gates (reference: InitializeIMU rejects scale<1e-1 for mono
        # and bad-IMU cases, src/LocalMapping.cc:1260 region); a gyro bias
        # beyond ~0.1 rad/s is unphysical for consumer IMUs -> bad solve
        if not np.isfinite(scale) or scale <= 1e-2 or scale > 1e3:
            return False
        if float(np.linalg.norm(np.asarray(res.bg))) > 0.1:
            return False
        R_wg = np.asarray(res.R_wg)
        if fix_scale:
            scale = 1.0
        tilt = float(np.arccos(np.clip((np.trace(R_wg) - 1) / 2, -1.0, 1.0)))
        self.init_log.append(
            {
                "kind": kind, "stage": self.stage, "scale": scale,
                "R_wg": R_wg.copy(), "t_solve": t_solve,
                "ts": float(slam_map.kf_ts[kfs2[-1]]),
            }
        )
        if kind == "refine":
            self.refine_idx += 1
            # apply only if meaningfully different (reference:
            # |mScale-1| > 0.002 gate, src/LocalMapping.cc:1451 region)
            if abs(scale - 1.0) <= 0.002 and tilt <= 2e-3:
                self.init_log[-1]["applied"] = False
                return False
        self.init_log[-1]["applied"] = True
        log.info(
            "staged-init commit: kind=%s stage=%d scale=%.4f tilt=%.4f "
            "t_solve=%.2fs K=%d",
            kind, self.stage, scale, tilt, t_solve, len(kfs2),
        )
        # apply gravity alignment + scale to the whole map
        # (reference: Map::ApplyScaledRotation include/Map.h:118 via
        # InitializeIMU src/LocalMapping.cc:1283)
        _apply_scaled_rotation(slam_map, R_wg.T, scale)
        # record the applied similarity so pipelined frontends can correct
        # in-flight results analytically instead of replaying them
        # (world' : R_cw' = R_cw A^T, t' = s t, v' = s A v, A = R_wg^T)
        A = R_wg.T.astype(np.float32)
        self.last_alignment = (A, float(scale))
        self.align_log.append((A, float(scale)))
        if kind == "init":
            # velocities come out in the pre-alignment frame at true scale;
            # rotate into the aligned frame and write back the SURVIVING
            # chain states (async: keyframes may have been culled mid-solve)
            v_new = np.asarray(res.v_w) @ R_wg
            for i, k in enumerate(kfs2):
                if not slam_map.kf_valid[k]:
                    continue
                slam_map.kf_vel[k] = v_new[i]
                slam_map.kf_bias[k, :3] = np.asarray(res.bg)
                slam_map.kf_bias[k, 3:] = np.asarray(res.ba)
            if self.stage == 0 or not self.initialized:
                # padded solve rows (chain bucket) sit beyond len(kfs2)
                self.v_w = v_new[len(kfs2) - 1].astype(np.float32)
            else:
                # live velocity has advanced past the snapshot (async):
                # transform it instead of rolling back to the chain's
                self.v_w = (scale * (A @ self.v_w)).astype(np.float32)
            self.bias = ImuBias(
                jnp.asarray(np.asarray(res.bg)), jnp.asarray(np.asarray(res.ba))
            )
            self.bias_epoch += 1
            self.initialized = True
            self.stage += 1
            slam_map.imu_initialized = True
            slam_map.n_inertial_ba = self.stage
        else:
            self.v_w = (scale * (A @ self.v_w)).astype(np.float32)
        self.marg_prior = None  # world frame + bias changed under the prior
        self._marg_pending = None
        self.kf_prior = None  # its tangent frame rotated with the world
        # tracker pose state must follow the map transform
        if tracker is not None and tracker.last is not None:
            R_cw = np.asarray(tracker.last.T_cw.R) @ R_wg
            t_cw = np.asarray(tracker.last.T_cw.t) * scale
            tracker.last.T_cw = SE3(
                jnp.asarray(R_cw.astype(np.float32)), jnp.asarray(t_cw.astype(np.float32))
            )
            tracker.velocity = None
        return True

    def _full_vi_ba(self, slam_map, tracker, kfs, pres):
        from ..optim.vi_ba import build_vi_problem, vi_bundle_adjust, write_back_vi

        priors = {1: (1e2, 1e10), 2: (1.0, 1e5), 3: (0.0, 0.0)}
        prior_g, prior_a = priors.get(self.stage, (0.0, 0.0))
        fixed = np.zeros(len(kfs), bool)
        fixed[-1] = True  # gauge on the newest KF (tracker-consistent)
        if tracker is None:
            return
        tcfg = tracker.cfg
        # pinned buckets: staged-init solves grow run to run, and a fresh
        # power-of-two bucket is a fresh XLA compile (minutes on remote
        # backends) right in the tracking hot path
        prob, kfs_np, mp_sel = build_vi_problem(
            slam_map, tcfg, kfs, pres, fixed, prior_g, prior_a, self.cfg,
            obs_bucket=16384, state_fixed=np.zeros(len(kfs), bool),
        )
        pre_R = slam_map.kf_R[kfs_np].copy()
        pre_t = slam_map.kf_t[kfs_np].copy()
        res = vi_bundle_adjust(prob, tcfg.cam, 2, 10)
        write_back_vi(slam_map, res, kfs_np, mp_sel)
        if log.isEnabledFor(logging.INFO):
            c_pre = -np.einsum("kij,ki->kj", pre_R, pre_t)
            c_post = -np.einsum(
                "kij,ki->kj", slam_map.kf_R[kfs_np], slam_map.kf_t[kfs_np]
            )
            dc = np.linalg.norm(c_post - c_pre, axis=-1)
            log.info(
                "sync full VI BA: stage=%d K=%d max|dc|=%.3f dc[-1]=%.3f",
                self.stage, len(kfs), float(dc.max()), float(dc[-1]),
            )
        self.v_w = np.asarray(res.v_w)[len(kfs) - 1].astype(np.float32)
        self.bias = ImuBias(
            jnp.asarray(np.asarray(res.bg)[len(kfs) - 1]),
            jnp.asarray(np.asarray(res.ba)[len(kfs) - 1]),
        )
        self.bias_epoch += 1

    def _bg_full_vi_ba(self, slam_map, tracker, epoch):
        """Async FullInertialBA: snapshot under the lock, solve unlocked on
        the worker, commit with propagation to keyframes created meanwhile
        (reference: InitializeIMU's FullInertialBA + queued-keyframe
        correction, src/LocalMapping.cc:1280-1360)."""
        from ..optim.vi_ba import build_vi_problem, vi_bundle_adjust
        from ..slam_map.commit import commit_whole_map_solve
        from ..utils.fetch import fetch

        priors = {1: (1e2, 1e10), 2: (1.0, 1e5), 3: (0.0, 0.0)}
        prior_g, prior_a = priors.get(self.stage, (0.0, 0.0))
        tcfg = tracker.cfg
        lock = self.map_lock
        with lock:
            if epoch != self._epoch:
                return
            kfs2, pres2 = self.valid_chain(slam_map)
            if len(kfs2) < 6:
                return
            kfs = np.asarray(kfs2)
            kfs_fid = slam_map.kf_frame_id[kfs].copy()
            fixed = np.zeros(len(kfs2), bool)
            fixed[-1] = True  # gauge on the newest snapshot KF
            prob, kfs_np, mp_sel = build_vi_problem(
                slam_map, tcfg, kfs2, pres2[1:], fixed, prior_g, prior_a,
                self.cfg, obs_bucket=16384,
                state_fixed=np.zeros(len(kfs2), bool),
            )
            pre_R = slam_map.kf_R[kfs].copy()
            pre_t = slam_map.kf_t[kfs].copy()
        res = vi_bundle_adjust(prob, tcfg.cam, 2, 10)
        res = fetch(res)
        K0 = len(kfs2)
        with lock:
            if epoch != self._epoch:
                return
            alive = slam_map.kf_valid[kfs] & (slam_map.kf_frame_id[kfs] == kfs_fid)
            v_opt = np.asarray(res.v_w)[:K0]
            bg_opt = np.asarray(res.bg)[:K0]
            ba_opt = np.asarray(res.ba)[:K0]
            slam_map.kf_vel[kfs[alive]] = v_opt[alive]
            slam_map.kf_bias[kfs[alive], :3] = bg_opt[alive]
            slam_map.kf_bias[kfs[alive], 3:] = ba_opt[alive]
            commit_whole_map_solve(
                slam_map, kfs, kfs_fid, np.asarray(mp_sel),
                np.asarray(res.T_cw.R)[:K0], np.asarray(res.T_cw.t)[:K0],
                np.asarray(res.points)[: len(mp_sel)], pre_R, pre_t,
            )
            # biases are slowly varying: adopt the newest solved one; the
            # live velocity/pose have advanced and stay with the frontend
            if alive[-1]:
                self.bias = ImuBias(
                    jnp.asarray(bg_opt[-1]), jnp.asarray(ba_opt[-1])
                )
                self.bias_epoch += 1
            if log.isEnabledFor(logging.INFO):
                c_pre = -np.einsum(
                    "kij,ki->kj", pre_R[alive], pre_t[alive]
                )
                c_post = -np.einsum(
                    "kij,ki->kj",
                    slam_map.kf_R[kfs[alive]], slam_map.kf_t[kfs[alive]],
                )
                dc = np.linalg.norm(c_post - c_pre, axis=-1)
                log.info(
                    "bg full VI BA commit: stage=%d K=%d alive=%d "
                    "max|dc|=%.3f dc[-1]=%.3f",
                    self.stage, K0, int(alive.sum()),
                    float(dc.max()) if len(dc) else -1.0,
                    float(dc[-1]) if len(dc) else -1.0,
                )


def _apply_scaled_rotation(m, R_gw: np.ndarray, s: float):
    """world' = s * R_gw world: rotate gravity to -z and fix mono scale.

    Reference: Map::ApplyScaledRotation — updates all kf poses, velocities,
    and point positions.
    """
    kfs = m.keyframe_indices(all_maps=True)
    # T_cw' = T_cw \circ (s R_gw)^-1, SE3-stored with the [R t/s]-style fold:
    # x_c = R_cw w + t_cw, w = R_gw^T w' / s
    # => x_c = (1/s) R_cw R_gw^T w' + t_cw  ~ SE3(R_cw R_gw^T, s t_cw)
    Rn = np.einsum("kij,lj->kil", m.kf_R[kfs], R_gw)
    m.kf_R[kfs] = Rn
    m.kf_t[kfs] = (s * m.kf_t[kfs]).astype(np.float32)
    m.kf_vel[kfs] = (s * m.kf_vel[kfs] @ R_gw.T).astype(np.float32)
    mps = m.point_indices(all_maps=True)
    m.mp_pos[mps] = (s * m.mp_pos[mps] @ R_gw.T).astype(np.float32)
