"""Packaged depth+segmentation model: real inference end-to-end.

The reference's semantic reconstruction runs actual model inference
(ZoeDepth depth, OneFormer segmentation — depth_estimate/predict_depth.py,
image_segmentation/oneformer/oneformer_model.py); these tests exercise the
packaged flax equivalent through the same surfaces: raw inference accuracy
on fresh rendered scenes, the semantic_cloud pipeline with ground-truth
poses, and the CLI --semantic-out path (mono_semantic parity).
"""
import os

import numpy as np
import pytest

from orb_slam3_modified_tpu.cameras import Camera

pytestmark = pytest.mark.skipif(
    not os.path.exists(
        os.path.join(
            os.path.dirname(__file__), "..", "orb_slam3_modified_tpu",
            "assets", "depth_seg_net.npz",
        )
    ),
    reason="packaged depth model absent (run scripts/train_depth_net.py)",
)

CAM = Camera.pinhole(330.0, 330.0, 256.0, 192.0, width=512, height=384)


@pytest.fixture(scope="module")
def model():
    from orb_slam3_modified_tpu.models.depth import (
        default_depth_model,
        make_depth_fn,
        make_seg_fn,
    )

    net, params, meta = default_depth_model()
    hw = tuple(int(x) for x in meta.get("train_res", "96x128").split("x"))
    return make_depth_fn(net, params, hw), make_seg_fn(net, params, hw)


def _render_posed(seed=11, n=4, plane_z=2.0):
    import cv2

    from orb_slam3_modified_tpu.utils.synthetic_dataset import (
        camera_rays,
        orbit_state,
        render_textured_scene_with_depth,
    )

    rng = np.random.default_rng(seed)
    tex = cv2.resize(
        rng.uniform(0, 255, (96, 96)).astype(np.float32), (1024, 1024),
        interpolation=cv2.INTER_CUBIC,
    )
    rays = camera_rays(CAM)
    out = []
    for v in range(n):
        R_cw, p, _, _ = orbit_state(v / 2.0, n / 2.0, 3.0, 2 * np.pi, ring=True)
        T = np.eye(4)
        T[:3, :3] = R_cw
        T[:3, 3] = -R_cw @ p
        img, depth, mask = render_textured_scene_with_depth(
            T, CAM, tex, plane_z=plane_z, plane_half=10.0, rays_c=rays
        )
        out.append((img, depth, mask, T))
    return out


class TestDepthInference:
    def test_depth_accuracy_fresh_scene(self, model):
        """<=25% mean relative depth error on a scene the net never saw
        at the full camera resolution (trained at 96x128)."""
        depth_fn, seg_fn = model
        rel_all = []
        for img, depth_gt, mask, T in _render_posed():
            pred = depth_fn(img)
            assert pred.shape == depth_gt.shape
            v = mask & (depth_gt > 0.5)
            rel_all.append(np.abs(pred[v] - depth_gt[v]) / depth_gt[v])
        rel = np.concatenate(rel_all)
        assert rel.mean() < 0.25, f"mean rel depth err {rel.mean():.3f}"

    def test_segmentation_iou(self, model):
        depth_fn, seg_fn = model
        img, depth_gt, mask, T = _render_posed()[0]
        seg = seg_fn(img)
        inter = ((seg == 1) & mask).sum()
        union = ((seg == 1) | mask).sum()
        assert inter / max(union, 1) > 0.9, "surface IoU below 0.9"

    def test_semantic_cloud_geometry(self, model):
        """Backprojected cloud with GT poses lands on the true plane."""
        from orb_slam3_modified_tpu.recon.cloud import semantic_cloud

        depth_fn, seg_fn = model
        frames = [(img, T) for img, _, _, T in _render_posed()]
        colormap = np.array([[40, 40, 200], [90, 200, 90]], np.uint8)
        pts, cols = semantic_cloud(
            CAM, frames, depth_fn, seg_fn, colormap, stride=8, voxel=0.05
        )
        assert len(pts) > 500
        surf = (cols == colormap[1]).all(axis=1)
        assert surf.mean() > 0.5
        # the rendered world is the z=2 plane; the cloud must hug it
        dz = np.abs(pts[surf][:, 2] - 2.0)
        assert np.median(dz) < 0.5, f"median plane distance {np.median(dz):.2f}"


class TestSemanticCli:
    def test_semantic_out(self, tmp_path):
        """--semantic-out writes a colored PLY through the packaged model
        (reference: mono_semantic main, README.md:247-267)."""
        from orb_slam3_modified_tpu.run import main as run_main
        from orb_slam3_modified_tpu.utils.synthetic_dataset import (
            write_euroc_sequence,
        )

        root = str(tmp_path / "seq")
        write_euroc_sequence(root, CAM, n_frames=24, fps=20.0, radius=3.0)
        out = str(tmp_path / "t.txt")
        ply = str(tmp_path / "cloud.ply")
        cfg = str(tmp_path / "c.yaml")
        with open(cfg, "w") as f:
            f.write(
                "%YAML:1.0\n---\n"
                f"Camera.fx: {CAM.fx}\nCamera.fy: {CAM.fy}\n"
                f"Camera.cx: {CAM.cx}\nCamera.cy: {CAM.cy}\n"
                f"Camera.width: {CAM.width}\nCamera.height: {CAM.height}\n"
                "Camera.fps: 20.0\n"
                "ORBextractor.nFeatures: 512\nORBextractor.nLevels: 4\n"
            )
        run_main(
            ["--dataset", "euroc", "--path", root, "--config", cfg,
             "--sensor", "mono", "--out", out, "--no-loop",
             "--semantic-out", ply]
        )
        assert os.path.exists(ply)
        with open(ply) as f:
            head = f.readline()
            assert head.strip() == "ply"
            n_vert = 0
            for line in f:
                if line.startswith("element vertex"):
                    n_vert = int(line.split()[-1])
                if line.startswith("end_header"):
                    break
        assert n_vert > 200, f"only {n_vert} points in semantic cloud"
