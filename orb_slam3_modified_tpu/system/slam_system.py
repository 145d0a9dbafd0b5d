"""Top-level SLAM system facade.

TPU-native replacement for System (reference: include/System.h:107-200,
src/System.cc — ctor :41, TrackMonocular :426, Shutdown :555, trajectory
savers :609-700) plus the Atlas multi-map recovery behavior
(reference: Tracking::CreateMapInAtlas src/Tracking.cc:2665, loss handling
:2020-2026).

Wires tracker + local mapper + loop closer over the shared SoA map arena,
handles LOST -> new-map recovery and cross-map merge, and exposes
trajectory export in TUM format.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from ..bow.vocabulary import Vocabulary, build_vocabulary
from ..cameras import Camera
from ..features.extractor import ExtractorConfig, Features, extract
from ..loop.loop_closer import LoopCloser, LoopCloserConfig
from ..mapping.local_mapper import LocalMapper, LocalMapperConfig
from ..slam_map.map_state import MapState
from ..tracking.tracker import (
    LOST,
    NOT_INITIALIZED,
    RECENTLY_LOST,
    Tracker,
    TrackerConfig,
)
from ..utils.timing import TimeStats

MONOCULAR = 0
STEREO = 1
RGBD = 2
IMU_MONOCULAR = 3
IMU_STEREO = 4
IMU_RGBD = 5


@dataclasses.dataclass
class SystemConfig:
    cam: Camera = None
    sensor: int = MONOCULAR
    vocabulary: Optional[Vocabulary] = None
    max_kf: int = 512
    max_mp: int = 65536
    feat_cap: int = 1024
    use_loop_closing: bool = True  # reference: loopClosing YAML flag
    min_kfs_for_new_map: int = 10  # reference: >10 KFs -> new map on LOST
    extractor: ExtractorConfig = None
    imu: object = None  # ImuConfig for *-inertial sensors
    # stereo (reference: Settings stereo block, include/Settings.h:44-121)
    bf: float = 0.0  # baseline * fx (reference mbf); rectified pairs
    min_depth: float = 0.3  # stereo minimum depth (= bf / max disparity)
    depth_scale: float = 1.0  # RGB-D depth map factor (reference mDepthMapFactor)
    # depth readings beyond this are discarded outright (reference:
    # thFarPoints YAML flag, src/System.cc:199-209 -> mThFarPoints); 0 = off
    th_far_points: float = 0.0
    # non-rectified stereo (fisheye): right camera + left->right extrinsics
    cam_right: Camera = None
    T_rl: object = None  # (4, 4) p_right = R @ p_left + t
    # pinhole radial-tangential distortion (k1,k2,p1,p2[,k3]); keypoint
    # coordinates are undistorted after extraction, descriptors stay on the
    # raw image (reference: Frame::UndistortKeyPoints, src/Frame.cc:746)
    dist: object = None


class SlamSystem:
    def __init__(self, cfg: SystemConfig):
        self.cfg = cfg
        self.map = MapState.create(cfg.max_kf, cfg.max_mp, cfg.feat_cap)
        self.tcfg = TrackerConfig(cam=cfg.cam, bf=cfg.bf)
        self.tracker = Tracker(self.tcfg, self.map)
        self.mapper = LocalMapper(LocalMapperConfig(), self.tcfg, self.map)
        self.timing = TimeStats()
        voc = cfg.vocabulary
        if voc is None:
            # corpus-trained default vocabulary shipped with the package
            # (scripts/train_default_vocab.py — the reference expects an
            # externally trained ORBvoc.txt, src/System.cc:118)
            from ..bow.vocabulary import default_vocabulary

            voc = default_vocabulary()
        if voc is None:
            # last-resort fallback: random-descriptor vocabulary (tests
            # without the asset; useless for real place recognition)
            rng = np.random.default_rng(0)
            voc = build_vocabulary(
                rng.integers(0, 2**32, (4000, 8), dtype=np.uint32), k=8, depth=3
            )
        self.closer = (
            LoopCloser(LoopCloserConfig(), self.tcfg, voc, self.map)
            if cfg.use_loop_closing
            else None
        )
        self.tracker.on_keyframe = self._on_keyframe
        if cfg.sensor in (IMU_MONOCULAR, IMU_STEREO, IMU_RGBD):
            from ..tracking.imu_frontend import ImuConfig, ImuFrontend

            imu_cfg = cfg.imu or ImuConfig()
            # stereo-inertial: the map is metric from the baseline — the IMU
            # init must not re-solve scale (reference: bMonocular gating in
            # InitializeIMU, src/LocalMapping.cc:1173)
            imu_cfg.mono = cfg.sensor == IMU_MONOCULAR
            self.tracker.imu = ImuFrontend(imu_cfg)
            self.mapper.imu = self.tracker.imu
            if self.closer is not None:
                # inertial maps: gravity fixes roll/pitch and (with IMU) the
                # scale, so loop Sim3 is scale-fixed (reference: bFixScale)
                self.closer.cfg.fix_scale = True
                # MergeInertialBA analog: joint VI window refinement after a
                # map weld (reference: src/Optimizer.cc:3948)
                self.closer.imu = self.tracker.imu
                self.closer.vi_refine_fn = self.mapper._vi_refine
        if self.closer is not None:
            self.tracker.relocalize_fn = self._relocalize
        self.ecfg = cfg.extractor or ExtractorConfig(n_features=cfg.feat_cap)
        self._undistort_kp = None
        if cfg.dist is not None and np.any(np.asarray(cfg.dist) != 0):
            # keypoint-coordinate undistortion (reference:
            # Frame::UndistortKeyPoints src/Frame.cc:746) — device-side,
            # applied to extracted uv before tracking; descriptors are
            # computed on the raw (distorted) image, as in the reference
            from ..cameras.rectify import make_keypoint_undistorter

            c = np.asarray(cfg.cam.params)
            K = np.array(
                [[c[0], 0, c[2]], [0, c[1], c[3]], [0, 0, 1]], np.float64
            )
            self._undistort_kp = make_keypoint_undistorter(K, cfg.dist)
        self.poses = []  # (ts, T_cw 4x4 or None)
        self._localization_only = False

    def _post_extract(self, feats: Features) -> Features:
        if self._undistort_kp is None:
            return feats
        return feats._replace(uv=self._undistort_kp(feats.uv))

    # ------------------------------------------------------ mode / reset API
    def activate_localization_mode(self):
        """Tracking-only mode: the map is frozen — no keyframes are created
        and local mapping is paused (reference:
        System::ActivateLocalizationMode include/System.h:156 ->
        LocalMapping::RequestStop + Tracking::InformOnlyTracking)."""
        self._localization_only = True
        self.tracker.only_tracking = True

    def deactivate_localization_mode(self):
        """Reference: System::DeactivateLocalizationMode
        (include/System.h:160 — Release local mapping, resume SLAM)."""
        self._localization_only = False
        self.tracker.only_tracking = False

    def reset(self):
        """Full reset: clear every map in the atlas and the tracker state
        (reference: System::Reset latch -> Tracking::Reset,
        src/System.cc:543, src/Tracking.cc:3782)."""
        m = self.map
        for k in m.keyframe_indices(all_maps=True):
            m.remove_keyframe(int(k))
        mps = m.point_indices(all_maps=True)
        if len(mps):
            m.remove_point(mps)
        m.active_map = 0
        m.n_maps = 1
        m.imu_initialized = False
        m.n_inertial_ba = 0
        m.culled_redirect.clear()
        self._reset_tracker()
        self.poses = []

    def reset_active_map(self):
        """Reset only the active map (reference: System::ResetActiveMap ->
        Tracking::ResetActiveMap, src/Tracking.cc:3843)."""
        m = self.map
        for k in m.keyframe_indices():
            m.remove_keyframe(int(k))
        mps = m.point_indices()
        if len(mps):
            m.remove_point(mps)
        self._reset_tracker()

    def _reset_tracker(self):
        t = self.tracker
        t.state = NOT_INITIALIZED
        t.init_frame = None
        t.last = None
        t.velocity = None
        t.ref_kf = -1
        t.lost_frames = 0
        t.frames_since_kf = 0
        if t.imu is not None:
            t.imu.preint_frame = None
            t.imu.preint_kf = None
            t.imu.marg_prior = None
            t.imu._marg_pending = None
            t.imu.kf_chain = []
            t.imu.first_kf_ts = None
            t.imu.initialized = False
            t.imu.stage = 0
            t.imu.bad_imu = False
            t.imu.t_motion = 0.0
            t.imu.v_w = np.zeros(3, np.float32)
            t.imu.refine_idx = 0
            t.imu._epoch += 1  # in-flight async init solves abort at commit

    def _relocalize(self, feats, frame_id):
        from ..loop.relocalization import relocalize

        # rate-limit consecutive failing attempts: each attempt costs a BoW
        # query + batched PnP RANSAC + polish (several device dispatches —
        # ~0.5 s on a tunneled chip), and during an extended blackout the
        # tracker retries EVERY frame. Three-frame spacing delays recovery
        # by <=0.15 s at 20 fps and cuts blackout cost ~3x (the reference
        # retries every frame, but its CPU attempt is microseconds).
        last = getattr(self, "_last_reloc_fail", None)
        if last is not None and 0 <= frame_id - last < 3:
            return None
        res = relocalize(
            self.cfg.cam,
            self.closer.kfdb,
            self.closer.voc,
            self.map,
            feats,
            self.tcfg.inv_level_sigma2(),
            frame_id,
        )
        self._last_reloc_fail = frame_id if res is None else None
        return res

    # ------------------------------------------------------------------ API
    def track_monocular(self, image, ts: float):
        """image: (H, W) grayscale float32 [0,255] -> T_cw (4,4) or None.

        Reference: System::TrackMonocular (src/System.cc:426)."""
        with self.timing.measure("extract"):
            feats = self._post_extract(extract(image, self.ecfg))
        return self.track_features(feats, ts)

    def track_monocular_inertial(self, image, ts: float, imu_samples):
        """Mono-inertial entry: imu_samples = (acc (N,3), gyro (N,3), dts).

        Reference: System::TrackMonocular with vImuMeas (src/System.cc:426)."""
        with self.timing.measure("extract"):
            feats = self._post_extract(extract(image, self.ecfg))
        with self.timing.measure("track"):
            T = self.tracker.track(feats, ts, imu_samples=imu_samples)
        self._handle_loss()
        self.poses.append((ts, T))
        return T

    def track_stereo(self, img_left, img_right, ts: float, imu_samples=None):
        """Stereo entry: both extractions in ONE batched dispatch, then
        rectified row-band matching (pinhole) or descriptor+triangulation
        matching (non-rectified/fisheye, cfg.cam_right set).

        Reference: System::TrackStereo (src/System.cc:271) -> Frame stereo
        ctor with parallel L/R extraction (src/Frame.cc:122-123) +
        ComputeStereoMatches (:811) / ComputeStereoFishEyeMatches (:1126)."""
        import jax.numpy as jnp

        from ..features.extractor import extract_batch
        from ..ops.stereo_match import match_stereo, match_stereo_general

        with self.timing.measure("extract"):
            fb = extract_batch(
                jnp.stack([jnp.asarray(img_left), jnp.asarray(img_right)]).astype(
                    jnp.float32
                ),
                self.ecfg,
            )
            feats = Features(*[leaf[0] for leaf in fb])
            feats_r = Features(*[leaf[1] for leaf in fb])
        ur = None
        with self.timing.measure("stereo_match"):
            if self.cfg.cam_right is not None:
                T_rl = np.asarray(self.cfg.T_rl, np.float32)
                depth, ok = match_stereo_general(
                    feats.uv, feats.desc, feats.level, feats.valid,
                    feats_r.uv, feats_r.desc, feats_r.level, feats_r.valid,
                    self.cfg.cam, self.cfg.cam_right,
                    T_rl[:3, :3], T_rl[:3, 3],
                )
                # unmatched rows must not spawn depth points
                depth = np.where(np.asarray(ok), np.asarray(depth), -1.0).astype(
                    np.float32
                )
            else:
                u_r, depth, ok = match_stereo(
                    feats.uv, feats.desc, feats.level, feats.valid,
                    feats_r.uv, feats_r.desc, feats_r.level, feats_r.valid,
                    bf=self.cfg.bf, min_z=self.cfg.min_depth,
                )
                ur = np.where(np.asarray(ok), np.asarray(u_r), -1.0).astype(
                    np.float32
                )
                depth = np.asarray(depth)
            if self.cfg.th_far_points > 0:
                far = depth > self.cfg.th_far_points
                depth = np.where(far, -1.0, depth)
                if ur is not None:
                    ur = np.where(far, -1.0, ur)
        return self.track_features(
            feats, ts, depth=depth, imu_samples=imu_samples, ur=ur
        )

    def track_rgbd(self, image, depth_map, ts: float, imu_samples=None):
        """RGB-D entry: per-feature depth lookup + virtual-right coordinate
        uR = u - bf/z (reference: System::TrackRGBD src/System.cc:349 ->
        ComputeStereoFromRGBD src/Frame.cc:984). imu_samples enables the
        RGB-D-inertial config (reference:
        Examples/RGB-D-Inertial/rgbd_inertial_realsense_D435i.cc)."""
        import jax.numpy as jnp

        from ..ops.stereo_match import depth_from_depthmap

        with self.timing.measure("extract"):
            feats = self._post_extract(
                extract(jnp.asarray(image, jnp.float32), self.ecfg)
            )
        d = np.asarray(
            depth_from_depthmap(
                feats.uv, jnp.asarray(depth_map), self.cfg.depth_scale
            )
        )
        if self.cfg.th_far_points > 0:
            d = np.where(d > self.cfg.th_far_points, -1.0, d)
        ur = None
        if self.cfg.bf > 0:
            u = np.asarray(feats.uv)[:, 0]
            ur = np.where(d > 0, u - self.cfg.bf / np.maximum(d, 1e-6), -1.0).astype(
                np.float32
            )
        return self.track_features(feats, ts, depth=d, ur=ur,
                                   imu_samples=imu_samples)

    def track_features(self, feats: Features, ts: float, depth=None,
                       imu_samples=None, ur=None):
        """Feature-level entry (decoupled frontend, used by tests/bench)."""
        with self.timing.measure("track"):
            T = self.tracker.track(
                feats, ts, depth=depth, imu_samples=imu_samples, ur=ur
            )
        self._handle_loss()
        self.poses.append((ts, T))
        return T

    def _on_keyframe(self, k: int):
        with self.timing.measure("local_mapping"):
            self.mapper.on_keyframe(k)
        if self.closer is not None:
            with self.timing.measure("loop_closing"):
                self.closer.on_keyframe(k)

    def make_chunked_frontend(self, chunk: int = 16, lag: int = 1,
                              async_mapping: bool = True,
                              stereo: bool = False,
                              rgbd: bool = False):
        """Chunk-pipelined image frontend (tracking/chunked.py): one device
        dispatch extracts + tracks `chunk` frames, and keyframe processing
        (local mapping -> loop closing, reference pipeline order) moves to a
        worker thread — the TPU equivalent of the reference's three-thread
        pipeline (src/System.cc:197,214).

        Returns a ChunkedTracker; feed it track_image(img, ts) and read the
        retired (frame_id, ts, T_cw|None) triples. Call flush() at end of
        sequence, then SlamSystem.shutdown()."""
        from ..tracking.chunked import ChunkedTracker

        lock = None
        if async_mapping:
            from ..mapping.async_mapper import AsyncLocalMapper

            post = self.closer.on_keyframe if self.closer is not None else None
            am = AsyncLocalMapper(self.mapper, post_fn=post)
            self.async_mapper = am
            self.tracker.on_keyframe = am.on_keyframe
            self.tracker.mapper_busy_fn = am.busy
            lock = am.lock
            if self.closer is not None:
                # post-loop global BA runs on its own abortable thread
                # (reference: transient GBA thread, src/LoopClosing.cc:1199)
                self.closer.map_lock = am.lock
                self.closer.cfg.gba_async = True
            imu = self.tracker.imu
            if imu is not None:
                # staged IMU init runs on the mapper worker, off the
                # tracker's critical path (reference: InitializeIMU on the
                # LocalMapping thread, src/LocalMapping.cc:200-230); the
                # chunked frontend consumes the applied world similarity
                # from imu.align_log
                imu.async_init = True
                imu.map_lock = am.lock
                if self.closer is not None:
                    imu.abort_gba_fn = self.closer.abort_gba
                am.init_fn = lambda: imu.run_pending_init(
                    self.map, self.tracker
                )
        ct = ChunkedTracker(
            self.tracker, self.ecfg, chunk=chunk, lag=lag, map_lock=lock,
            stereo=stereo, min_z=self.cfg.min_depth,
            rgbd=rgbd, depth_scale=self.cfg.depth_scale,
            th_far=self.cfg.th_far_points,
        )
        if async_mapping:
            # bounded pipeline: the tracker may run a couple of keyframes
            # ahead of the mapper, no more (unbounded backlogs let keyframes
            # go stale before triangulation/BA and the map silently
            # degrades — measured as stereo scale drift). The bound is soft:
            # a capped wait keeps throughput when the mapper is merely slow
            # rather than wedged.
            # last-resort only: with BA deferred under backlog (reference
            # parity), the worker keeps up at triangulation cost; the wait
            # engages only when the queue grows pathological
            ct.throttle_fn = lambda: self.async_mapper.wait_drained(
                max_backlog=4, timeout=1.0
            )
        # Atlas recovery on LOST (multi-map handoff) — same policy as the
        # per-frame entry points
        ct.loss_fn = self._handle_loss
        return ct

    def _handle_loss(self):
        """Multi-map recovery: on LOST, store the map and start a new one
        (reference: src/Tracking.cc:2020-2026 — maps with <=10 KFs are reset
        instead)."""
        imu = self.tracker.imu
        if imu is not None and imu.bad_imu:
            # insufficient motion for inertial init: the map's scale/gravity
            # are unobservable — reset the active map (reference: mbBadImu,
            # src/LocalMapping.cc:138-147, checked by the tracker at
            # src/Tracking.cc:1808)
            self.reset_active_map()
            return
        if self.tracker.state != LOST:
            return
        if self._localization_only:
            # map is frozen: stay LOST and keep attempting relocalization
            # against it (reference: mbOnlyTracking loss handling,
            # src/Tracking.cc:2004 region — no map reset, no new map)
            self.tracker.state = RECENTLY_LOST
            self.tracker.lost_frames = 0
            return
        m = self.map
        if imu is not None:
            imu._epoch += 1  # abort in-flight async init against the old map
        if m.n_keyframes() > self.cfg.min_kfs_for_new_map:
            m.create_new_map()
        else:
            # reset active map (discard)
            kfs = m.keyframe_indices()
            for k in kfs:
                m.remove_keyframe(int(k))
            mps = m.point_indices()
            if len(mps):
                m.remove_point(mps)
        self.tracker.state = NOT_INITIALIZED
        self.tracker.init_frame = None
        self.tracker.last = None
        self.tracker.velocity = None
        self.tracker.ref_kf = -1
        self.tracker.lost_frames = 0

    # ------------------------------------------------------------ trajectory
    def save_trajectory_tum(self, path: str):
        """TUM format: ts tx ty tz qx qy qz qw (reference:
        System::SaveTrajectoryTUM src/System.cc:609)."""
        import jax.numpy as jnp

        from ..lie import so3

        lines = []
        for ts, fid, T in self.tracker.absolute_trajectory():
            Twc = np.linalg.inv(T)
            q = np.asarray(so3.quat_from_mat(jnp.asarray(Twc[:3, :3])))
            t = Twc[:3, 3]
            lines.append(
                f"{ts:.6f} {t[0]:.7f} {t[1]:.7f} {t[2]:.7f} "
                f"{q[1]:.7f} {q[2]:.7f} {q[3]:.7f} {q[0]:.7f}"
            )
        with open(path, "w") as f:
            f.write("\n".join(lines) + "\n")

    def _T_bc(self):
        """(4,4) camera->body transform for inertial configs, else None."""
        imu = self.tracker.imu
        if imu is None:
            return None
        T = np.eye(4)
        T[:3, :3] = np.asarray(imu.cfg.R_bc, np.float64)
        T[:3, 3] = np.asarray(imu.cfg.t_bc, np.float64)
        return T

    def save_trajectory_euroc(self, path: str):
        """EuRoC format: ts_ns tx ty tz qw qx qy qz. Visual configs emit
        camera-to-world; inertial configs emit BODY-to-world through the
        rig extrinsics T_bc (reference: System::SaveTrajectoryEuRoC writes
        Twb = (mImuCalib.mTbc * Tcw).inverse() when IMU is present,
        src/System.cc:799-801)."""
        import jax.numpy as jnp

        from ..lie import so3

        T_bc = self._T_bc()
        lines = []
        for ts, fid, T in self.tracker.absolute_trajectory():
            if T_bc is not None:
                T = T_bc @ T  # T_bw = T_bc o T_cw
            Twx = np.linalg.inv(T)
            q = np.asarray(so3.quat_from_mat(jnp.asarray(Twx[:3, :3])))
            t = Twx[:3, 3]
            lines.append(
                f"{int(round(ts * 1e9))} {t[0]:.9f} {t[1]:.9f} {t[2]:.9f} "
                f"{q[0]:.9f} {q[1]:.9f} {q[2]:.9f} {q[3]:.9f}"
            )
        with open(path, "w") as f:
            f.write("\n".join(lines) + "\n")

    def save_keyframe_trajectory_euroc(self, path: str):
        """Keyframe EuRoC saver; body-frame for inertial configs (reference:
        System::SaveKeyFrameTrajectoryEuRoC, src/System.cc:830 region)."""
        import jax.numpy as jnp

        from ..lie import so3

        m = self.map
        T_bc = self._T_bc()
        kfs = m.keyframe_indices(all_maps=True)
        order = kfs[np.argsort(m.kf_ts[kfs])]
        lines = []
        for k in order:
            T = np.eye(4)
            T[:3, :3] = m.kf_R[k]
            T[:3, 3] = m.kf_t[k]
            if T_bc is not None:
                T = T_bc @ T
            Twx = np.linalg.inv(T)
            q = np.asarray(so3.quat_from_mat(jnp.asarray(Twx[:3, :3])))
            t = Twx[:3, 3]
            lines.append(
                f"{int(round(m.kf_ts[k] * 1e9))} {t[0]:.9f} {t[1]:.9f} "
                f"{t[2]:.9f} {q[0]:.9f} {q[1]:.9f} {q[2]:.9f} {q[3]:.9f}"
            )
        with open(path, "w") as f:
            f.write("\n".join(lines) + "\n")

    def save_trajectory_kitti(self, path: str):
        """KITTI format: 12 numbers per line, row-major 3x4 T_wc (reference:
        System::SaveTrajectoryKITTI src/System.cc:609-700 region)."""
        lines = []
        for ts, fid, T in self.tracker.absolute_trajectory():
            Twc = np.linalg.inv(T)
            lines.append(" ".join(f"{x:.9e}" for x in Twc[:3].reshape(-1)))
        with open(path, "w") as f:
            f.write("\n".join(lines) + "\n")

    def save_keyframe_trajectory_tum(self, path: str):
        m = self.map
        kfs = m.keyframe_indices(all_maps=True)
        import jax.numpy as jnp

        from ..lie import so3

        order = kfs[np.argsort(m.kf_ts[kfs])]
        lines = []
        for k in order:
            R = m.kf_R[k].T
            t = -R @ m.kf_t[k]
            q = np.asarray(so3.quat_from_mat(jnp.asarray(R)))
            lines.append(
                f"{m.kf_ts[k]:.6f} {t[0]:.7f} {t[1]:.7f} {t[2]:.7f} "
                f"{q[1]:.7f} {q[2]:.7f} {q[3]:.7f} {q[0]:.7f}"
            )
        with open(path, "w") as f:
            f.write("\n".join(lines) + "\n")

    def save_debug_data(self, path: str):
        """IMU-init observability dump (reference: System::SaveDebugData
        writes init_Rwg/Scale/Time traces, src/System.cc:1305 region).
        One JSON line per staged-init/refinement event: kind, stage, solved
        scale, gravity rotation, solve wall time, sequence timestamp,
        whether it was applied."""
        import json

        imu = self.tracker.imu
        events = imu.init_log if imu is not None else []
        with open(path, "w") as f:
            for e in events:
                row = dict(e)
                row["R_wg"] = np.asarray(row["R_wg"]).reshape(-1).tolist()
                f.write(json.dumps(row) + "\n")
        return len(events)

    def shutdown(self):
        """Reference: System::Shutdown (src/System.cc:555)."""
        am = getattr(self, "async_mapper", None)
        if am is not None:
            am.flush()
            am.shutdown()
        if self.closer is not None:
            self.closer.wait_gba()
        return self.timing.summary()
