"""Multi-map Atlas merge: the post-merge essential graph must propagate the
weld correction to keyframes FAR from the junction (reference:
LoopClosing::MergeLocal runs Optimizer::OptimizeEssentialGraph after the
welding BA, /root/reference/src/LoopClosing.cc:1717). VERDICT r4 missing #2.
"""
import numpy as np
import pytest

from orb_slam3_modified_tpu.bow.vocabulary import build_vocabulary
from orb_slam3_modified_tpu.cameras import Camera
from orb_slam3_modified_tpu.eval.ate import ate_rmse
from orb_slam3_modified_tpu.features.extractor import Features
from orb_slam3_modified_tpu.lie.se3 import SE3
from orb_slam3_modified_tpu.loop.loop_closer import LoopCloser, LoopCloserConfig
from orb_slam3_modified_tpu.slam_map.map_state import MapState
from orb_slam3_modified_tpu.system.slam_system import SlamSystem, SystemConfig
from orb_slam3_modified_tpu.tracking.tracker import TrackerConfig
from orb_slam3_modified_tpu.utils.synthetic_features import SyntheticFeatureWorld

CAM = Camera.pinhole(458.654, 457.296, 367.215, 248.375, width=752, height=480)


class TestEssentialGraphPropagation:
    def test_weld_correction_reaches_far_keyframes(self):
        """Fix a 2-keyframe 'weld window' at poses moved by a known world
        transform Δ and run the essential graph with edges measured from
        the pre-move snapshot: every other keyframe (and its points) must
        come out moved by the same Δ — the rigid propagation MergeLocal's
        essential graph exists for."""
        rng = np.random.default_rng(3)
        m = MapState.create(64, 512, 64)
        K = 12
        kfs = []
        for i in range(K):
            k = m.alloc_keyframe()
            c = np.array([1.0 * i, 0.0, 0.0], np.float32)
            m.kf_R[k] = np.eye(3, dtype=np.float32)
            m.kf_t[k] = -c  # T_cw with R=I
            m.kf_ts[k] = i * 0.5
            m.kf_frame_id[k] = i * 5
            mp = m.alloc_points(2)
            m.mp_pos[mp] = (
                c[None] + np.array([[0.3, 0.1, 4.0], [-0.2, 0.4, 5.0]])
            ).astype(np.float32)
            m.mp_first_kf[mp] = k
            kfs.append(k)
        kfs = np.asarray(kfs)
        voc = build_vocabulary(
            rng.integers(0, 2**32, (512, 8), dtype=np.uint32), k=4, depth=2
        )
        closer = LoopCloser(LoopCloserConfig(), TrackerConfig(cam=CAM), voc, m)

        snap_R = m.kf_R[kfs].copy()
        snap_t = m.kf_t[kfs].copy()
        # weld BA analog: move kfs 0 and 1 by a world transform Δ
        ang = np.deg2rad(3.0)
        R_d = np.array(
            [[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
             [-np.sin(ang), 0, np.cos(ang)]], np.float32
        )
        t_d = np.array([0.2, 0.0, 0.1], np.float32)
        for k in kfs[:2]:
            R_cw = m.kf_R[k] @ R_d.T
            m.kf_R[k] = R_cw
            m.kf_t[k] = m.kf_t[k] - R_cw @ t_d

        far_pt = m.mp_pos[m.mp_first_kf == kfs[-1]].copy()
        fixed = np.zeros(K, bool)
        fixed[:2] = True
        closer._run_essential_graph(kfs, fixed, snap_R, snap_t)

        # every keyframe center must now be Δ(c_old)
        for i, k in enumerate(kfs):
            c_old = np.array([1.0 * i, 0.0, 0.0])
            c_exp = R_d @ c_old + t_d
            c_new = -m.kf_R[k].T @ m.kf_t[k]
            np.testing.assert_allclose(
                c_new, c_exp, atol=0.02,
                err_msg=f"kf {i} not propagated (far from weld)",
            )
        # the far keyframe's points followed through their reference kf
        far_exp = far_pt @ R_d.T + t_d
        far_new = m.mp_pos[m.mp_first_kf == kfs[-1]]
        np.testing.assert_allclose(far_new, far_exp, atol=0.05)


def _pose_on_ring(a):
    c = np.array([4 * np.sin(a), 0.4 * np.sin(3 * a), -4 * np.cos(a)])
    fwd = -c / np.linalg.norm(c)
    up = np.array([0.0, -1.0, 0.0])
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    up2 = np.cross(fwd, right)
    R_cw = np.stack([right, up2, fwd], axis=1).T
    return R_cw.astype(np.float32), (-R_cw @ c).astype(np.float32), c


def _empty_feats(cap):
    import jax.numpy as jnp

    return Features(
        uv=jnp.zeros((cap, 2), jnp.float32),
        desc=jnp.zeros((cap, 8), jnp.uint32),
        angle=jnp.zeros(cap, jnp.float32),
        level=jnp.zeros(cap, jnp.int32),
        response=jnp.zeros(cap, jnp.float32),
        valid=jnp.zeros(cap, bool),
    )


class TestCrossMapMerge:
    @pytest.fixture(scope="class")
    def merge_run(self):
        """Track an arc (map 0), lose tracking in a blackout (Atlas starts
        map 1), re-traverse the SAME arc: place recognition must find the
        cross-map overlap and MergeLocal must weld map 1 into map 0
        (reference: src/LoopClosing.cc:1215; loss handoff
        src/Tracking.cc:2020-2026)."""
        world = SyntheticFeatureWorld(
            n_points=12000, spread=10.0, seed=7, feat_cap=768, noise_px=0.5,
            layout="ring",
        )
        voc = build_vocabulary(world.desc[:4000], k=8, depth=3, seed=1)
        slam = SlamSystem(
            SystemConfig(
                cam=CAM, feat_cap=768, vocabulary=voc, use_loop_closing=True,
                max_kf=256, max_mp=65536, min_kfs_for_new_map=6,
            )
        )
        slam.tracker.cfg.recently_lost_budget = 3
        # softer culling so phase A's arc keeps enough place-recognition
        # anchors (same tuning as the two-loop course in test_e2e_loop);
        # detection gate lowered to the small fresh map's size
        slam.mapper.cfg.kf_cull_redundancy = 0.97
        slam.closer.cfg.min_map_kfs = 5
        nA, nB = 70, 70
        gt = {}
        i = 0
        for j in range(nA):  # phase A: arc [0, 1.05pi] in map 0
            a = 1.05 * np.pi * j / nA
            R_cw, t_cw, c = _pose_on_ring(a)
            feats, _ = world.observe(CAM, SE3(R_cw, t_cw), max_feats=600)
            slam.track_features(feats, ts=i * 0.05)
            gt[i] = c
            i += 1
        kfs_a = slam.map.n_keyframes()
        assert kfs_a > 6, f"phase A built only {kfs_a} keyframes"
        for _ in range(8):  # blackout: no features -> LOST -> new map
            slam.track_features(_empty_feats(768), ts=i * 0.05)
            i += 1
        from orb_slam3_modified_tpu.tracking.tracker import NOT_INITIALIZED

        assert slam.tracker.state == NOT_INITIALIZED
        assert slam.map.n_maps >= 2, "Atlas did not start a fresh map"
        b_start = i
        for j in range(nB):  # phase B: re-traverse [0.1pi, 1.0pi]
            a = 0.1 * np.pi + 0.9 * np.pi * j / nB
            R_cw, t_cw, c = _pose_on_ring(a)
            feats, _ = world.observe(CAM, SE3(R_cw, t_cw), max_feats=600)
            slam.track_features(feats, ts=i * 0.05)
            gt[i] = c
            i += 1
        return slam, gt, b_start

    def test_maps_merged(self, merge_run):
        slam, gt, b_start = merge_run
        assert slam.closer.n_merges >= 1, "cross-map overlap never merged"
        m = slam.map
        live = m.keyframe_indices(all_maps=True)
        assert len(np.unique(m.kf_map[live])) == 1, (
            "keyframes left outside the merged map"
        )

    def test_merged_map_globally_consistent(self, merge_run):
        """ATE of the WHOLE merged keyframe set against ground truth — the
        done-criterion is the merged map, not just the junction (keyframes
        far from the weld must have been corrected by the essential
        graph)."""
        slam, gt, b_start = merge_run
        m = slam.map
        live = m.keyframe_indices(all_maps=True)
        fids = m.kf_frame_id[live]
        sel = np.array([f in gt for f in fids])
        centers = np.stack(
            [-m.kf_R[k].T @ m.kf_t[k] for k in live[sel]]
        )
        gts = np.stack([gt[f] for f in fids[sel]])
        rmse, s = ate_rmse(centers, gts, with_scale=True)
        print(f"[gate] merged-map keyframe ATE {rmse:.4f} m scale {s:.4f} "
              f"({sel.sum()} kfs)")
        assert rmse < 0.5, f"merged map inconsistent: ATE {rmse:.3f} m"

    def test_phase_b_trajectory_consistent(self, merge_run):
        """The re-traversal's frame trajectory, replayed against the merged
        map, must land on the same ground-truth arc."""
        slam, gt, b_start = merge_run
        est, gts = [], []
        for ts, fid, T in slam.tracker.absolute_trajectory():
            if fid >= b_start and fid in gt:
                est.append(np.linalg.inv(T)[:3, 3])
                gts.append(gt[fid])
        assert len(est) > 30
        rmse, s = ate_rmse(np.asarray(est), np.asarray(gts), with_scale=True)
        print(f"[gate] phase-B ATE {rmse:.4f} m scale {s:.4f}")
        assert rmse < 0.5, f"re-traversal inconsistent: {rmse:.3f} m"
