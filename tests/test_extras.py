"""Tests for AR plane detection, point-cloud reconstruction, viewer output."""
import numpy as np
import pytest

from orb_slam3_modified_tpu.cameras import Camera
from orb_slam3_modified_tpu.recon.cloud import (
    backproject_depth,
    save_ply,
    semantic_cloud,
    voxel_filter,
)
from orb_slam3_modified_tpu.viz.ar import cube_model, detect_plane, render_overlay

CAM = Camera.pinhole(458.654, 457.296, 367.215, 248.375, width=752, height=480)


class TestPlaneDetection:
    def test_finds_dominant_plane(self):
        rng = np.random.default_rng(0)
        n = 300
        pts = np.zeros((n, 3), np.float32)
        pts[:, 0] = rng.uniform(-2, 2, n)
        pts[:, 2] = rng.uniform(2, 6, n)
        pts[:, 1] = 0.5 + rng.normal(0, 0.01, n)  # y = 0.5 plane
        pts[250:] = rng.uniform(-2, 2, (50, 3))  # outliers
        plane = detect_plane(pts)
        assert plane is not None
        assert abs(abs(plane.normal[1]) - 1.0) < 0.05
        assert plane.inliers.sum() > 200

    def test_no_plane_in_uniform_cloud(self):
        rng = np.random.default_rng(1)
        pts = rng.uniform(-3, 3, (200, 3)).astype(np.float32)
        plane = detect_plane(pts, min_inlier_frac=0.6)
        # uniform cloud: either None or weak plane with few inliers
        if plane is not None:
            assert plane.inliers.mean() < 0.6

    def test_render_overlay(self):
        rng = np.random.default_rng(2)
        pts = np.zeros((200, 3), np.float32)
        pts[:, 0] = rng.uniform(-2, 2, 200)
        pts[:, 2] = rng.uniform(2, 6, 200)
        pts[:, 1] = 0.5
        plane = detect_plane(pts)
        img = np.full((480, 752), 128.0, np.float32)
        T_cw = np.eye(4)
        out = render_overlay(img, CAM, T_cw, plane, model=cube_model(0.3))
        assert out.shape == (480, 752, 3)
        assert (out != 128).any(), "nothing rendered"


class TestCloud:
    def test_backproject_roundtrip(self):
        depth = np.full((480, 752), 4.0, np.float32)
        T = np.eye(4)
        pw, uv = backproject_depth(CAM, depth, T, stride=16)
        assert (np.abs(pw[:, 2] - 4.0) < 1e-3).all()

    def test_voxel_filter(self):
        pts = np.array([[0, 0, 0], [0.001, 0, 0], [1, 1, 1]], np.float32)
        out = voxel_filter(pts, 0.05)
        assert len(out) == 2

    def test_semantic_cloud_and_ply(self, tmp_path):
        depth_fn = lambda img: np.full(img.shape, 3.0, np.float32)
        seg_fn = lambda img: np.zeros(img.shape, np.int32)
        cmap = np.array([[255, 0, 0], [0, 255, 0]], np.uint8)
        frames = [(np.zeros((480, 752), np.float32), np.eye(4))]
        pts, cols = semantic_cloud(CAM, frames, depth_fn, seg_fn, cmap, stride=32)
        assert len(pts) > 100
        assert (cols == [255, 0, 0]).all()
        p = str(tmp_path / "cloud.ply")
        save_ply(p, pts, cols)
        head = open(p).read(200)
        assert "ply" in head and "element vertex" in head


class TestFrameDrawer:
    def test_overlay_marks_and_status_bar(self, tmp_path):
        """FrameDrawer parity (reference: src/FrameDrawer.cc DrawFrame —
        keypoint markers split tracked/untracked plus a status text bar):
        rendered overlay must contain green tracked markers, blue hollow
        untracked markers, and the appended bar row."""
        import os

        from orb_slam3_modified_tpu.viz.frame_drawer import FrameDrawer

        rng = np.random.default_rng(3)
        h, w, F = 120, 160, 40
        img = rng.uniform(0, 255, (h, w)).astype(np.uint8)
        uv = rng.uniform(10, [w - 10, h - 10], (F, 2)).astype(np.float32)
        valid = np.ones(F, bool)
        tracked = np.zeros(F, bool)
        tracked[:25] = True
        d = FrameDrawer()
        d.update(img, uv, valid, tracked, state=1, n_kfs=7, n_mps=321,
                 frame_id=42)
        out = d.render()
        assert out.shape == (h + 22, w, 3)
        # tracked marker green present at a tracked keypoint
        x, y = np.round(uv[0]).astype(int)
        assert (out[y, x] == [0, 220, 0]).all()
        # untracked hollow blue ring around an untracked keypoint
        x, y = np.round(uv[30]).astype(int)
        assert (out[y - 2, x] == [80, 160, 255]).all()
        assert not (out[y, x] == [80, 160, 255]).all()  # hollow center
        p = d.save(str(tmp_path / "overlay.png"))
        assert os.path.exists(p) and os.path.getsize(p) > 500

    def test_update_from_tracker_and_vo_flag(self):
        from orb_slam3_modified_tpu.viz.frame_drawer import FrameDrawer
        from orb_slam3_modified_tpu.cameras import Camera
        from orb_slam3_modified_tpu.slam_map.map_state import MapState
        from orb_slam3_modified_tpu.tracking.tracker import (
            Tracker, TrackerConfig, FrameRecord,
        )
        from orb_slam3_modified_tpu.features.extractor import Features
        from orb_slam3_modified_tpu.lie.se3 import SE3
        import jax.numpy as jnp

        cam = Camera.pinhole(100.0, 100.0, 64.0, 48.0, width=128, height=96)
        m = MapState.create(max_kf=4, max_mp=64, feat_cap=8)
        t = Tracker(TrackerConfig(cam=cam), m)
        F = 8
        feats = Features(
            uv=jnp.asarray(np.random.default_rng(0).uniform(5, 90, (F, 2)),
                           jnp.float32),
            desc=jnp.zeros((F, 8), jnp.uint32),
            angle=jnp.zeros(F), level=jnp.zeros(F, jnp.int32),
            response=jnp.ones(F), valid=jnp.ones(F, bool),
        )
        t.last = FrameRecord(
            feats, SE3.identity(), np.full(F, -1, np.int32), 0.0, 5
        )
        t.vo_mode = True
        t.state = 1
        d = FrameDrawer()
        assert d.update_from_tracker(t)
        out = d.render()
        assert out.shape[0] == 96 + 22


class TestViewer:
    def test_plot_map(self, tmp_path):
        from orb_slam3_modified_tpu.slam_map.map_state import MapState
        from orb_slam3_modified_tpu.viz.viewer import plot_map

        m = MapState.create(max_kf=8, max_mp=128, feat_cap=16)
        k = m.alloc_keyframe()
        mp = m.alloc_points(50)
        m.mp_pos[mp] = np.random.default_rng(0).uniform(-2, 2, (50, 3))
        p = str(tmp_path / "map.png")
        out = plot_map(m, path=p)
        import os

        assert os.path.exists(out) and os.path.getsize(out) > 1000
