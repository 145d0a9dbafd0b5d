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
from ..tracking.tracker import LOST, NOT_INITIALIZED, Tracker, TrackerConfig
from ..utils.timing import TimeStats

MONOCULAR = 0
STEREO = 1
RGBD = 2
IMU_MONOCULAR = 3
IMU_STEREO = 4


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


class SlamSystem:
    def __init__(self, cfg: SystemConfig):
        self.cfg = cfg
        self.map = MapState.create(cfg.max_kf, cfg.max_mp, cfg.feat_cap)
        self.tcfg = TrackerConfig(cam=cfg.cam)
        self.tracker = Tracker(self.tcfg, self.map)
        self.mapper = LocalMapper(LocalMapperConfig(), self.tcfg, self.map)
        self.timing = TimeStats()
        voc = cfg.vocabulary
        if voc is None:
            # self-trained fallback vocabulary from random descriptors; real
            # deployments pass a corpus-trained vocabulary (bow/vocabulary)
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
        if cfg.sensor in (IMU_MONOCULAR, IMU_STEREO):
            from ..tracking.imu_frontend import ImuConfig, ImuFrontend

            self.tracker.imu = ImuFrontend(cfg.imu or ImuConfig())
            self.mapper.imu = self.tracker.imu
            if self.closer is not None:
                # inertial maps: gravity fixes roll/pitch and (with IMU) the
                # scale, so loop Sim3 is scale-fixed (reference: bFixScale)
                self.closer.cfg.fix_scale = True
        if self.closer is not None:
            self.tracker.relocalize_fn = self._relocalize
        self.ecfg = cfg.extractor or ExtractorConfig(n_features=cfg.feat_cap)
        self.poses = []  # (ts, T_cw 4x4 or None)

    def _relocalize(self, feats, frame_id):
        from ..loop.relocalization import relocalize

        return relocalize(
            self.cfg.cam,
            self.closer.kfdb,
            self.closer.voc,
            self.map,
            feats,
            self.tcfg.inv_level_sigma2(),
            frame_id,
        )

    # ------------------------------------------------------------------ API
    def track_monocular(self, image, ts: float):
        """image: (H, W) grayscale float32 [0,255] -> T_cw (4,4) or None.

        Reference: System::TrackMonocular (src/System.cc:426)."""
        with self.timing.measure("extract"):
            feats = extract(image, self.ecfg)
        return self.track_features(feats, ts)

    def track_monocular_inertial(self, image, ts: float, imu_samples):
        """Mono-inertial entry: imu_samples = (acc (N,3), gyro (N,3), dts).

        Reference: System::TrackMonocular with vImuMeas (src/System.cc:426)."""
        with self.timing.measure("extract"):
            feats = extract(image, self.ecfg)
        with self.timing.measure("track"):
            T = self.tracker.track(feats, ts, imu_samples=imu_samples)
        self._handle_loss()
        self.poses.append((ts, T))
        return T

    def track_features(self, feats: Features, ts: float, depth=None, imu_samples=None):
        """Feature-level entry (decoupled frontend, used by tests/bench)."""
        with self.timing.measure("track"):
            T = self.tracker.track(feats, ts, depth=depth, imu_samples=imu_samples)
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
                              async_mapping: bool = True):
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
        return ChunkedTracker(
            self.tracker, self.ecfg, chunk=chunk, lag=lag, map_lock=lock
        )

    def _handle_loss(self):
        """Multi-map recovery: on LOST, store the map and start a new one
        (reference: src/Tracking.cc:2020-2026 — maps with <=10 KFs are reset
        instead)."""
        if self.tracker.state != LOST:
            return
        m = self.map
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

    def shutdown(self):
        """Reference: System::Shutdown (src/System.cc:555)."""
        am = getattr(self, "async_mapper", None)
        if am is not None:
            am.flush()
            am.shutdown()
        if self.closer is not None:
            self.closer.wait_gba()
        return self.timing.summary()
