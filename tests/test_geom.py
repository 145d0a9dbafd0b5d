"""Tests for triangulation and two-view reconstruction on synthetic scenes."""
import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_modified_tpu.cameras import Camera, unproject
from orb_slam3_modified_tpu.geom import (
    projection_matrix,
    reconstruct_two_views,
    triangulate_dlt,
)
from orb_slam3_modified_tpu.lie.se3 import SE3
from orb_slam3_modified_tpu.utils.synthetic import make_scene


def unit_plane(cam, uv):
    ray = unproject(cam, jnp.asarray(uv))
    return ray[..., :2] / ray[..., 2:3]


class TestTriangulation:
    def test_dlt_exact(self):
        scene = make_scene(n_points=128, n_frames=2, noise_px=0.0, sweep=np.pi / 8)
        T0 = SE3(scene.T_cw.R[0], scene.T_cw.t[0])
        T1 = SE3(scene.T_cw.R[1], scene.T_cw.t[1])
        x0 = unit_plane(scene.cam, scene.uv[0])
        x1 = unit_plane(scene.cam, scene.uv[1])
        P0 = jnp.broadcast_to(projection_matrix(T0), (128, 3, 4))
        P1 = jnp.broadcast_to(projection_matrix(T1), (128, 3, 4))
        pts = triangulate_dlt(P0, P1, x0, x1)
        both = scene.visible[0] & scene.visible[1]
        err = np.linalg.norm(np.asarray(pts) - scene.points, axis=-1)
        assert np.median(err[both]) < 1e-3
        assert err[both].max() < 0.05

    def test_dlt_noisy(self):
        scene = make_scene(n_points=256, n_frames=2, noise_px=0.5, sweep=np.pi / 6)
        T0 = SE3(scene.T_cw.R[0], scene.T_cw.t[0])
        T1 = SE3(scene.T_cw.R[1], scene.T_cw.t[1])
        x0 = unit_plane(scene.cam, scene.uv[0])
        x1 = unit_plane(scene.cam, scene.uv[1])
        P0 = jnp.broadcast_to(projection_matrix(T0), (256, 3, 4))
        P1 = jnp.broadcast_to(projection_matrix(T1), (256, 3, 4))
        pts = triangulate_dlt(P0, P1, x0, x1)
        both = scene.visible[0] & scene.visible[1]
        err = np.linalg.norm(np.asarray(pts) - scene.points, axis=-1)
        assert np.median(err[both]) < 0.05


class TestTwoView:
    def _run(self, noise_px, n=300, planar=False, sweep=np.pi / 10):
        if planar:
            rng = np.random.default_rng(3)
            pts = rng.uniform(-2, 2, size=(n, 3)).astype(np.float32)
            pts[:, 2] = 0.3 * pts[:, 0] - 0.1 * pts[:, 1]  # plane
            scene = make_scene(n_points=n, n_frames=2, noise_px=noise_px, sweep=sweep)
            scene = scene._replace(points=pts)
            import jax.numpy as jnp_

            from orb_slam3_modified_tpu.cameras import in_image, project

            pc = SE3(scene.T_cw.R[:, None], scene.T_cw.t[:, None]).apply(
                jnp_.asarray(pts)[None]
            )
            uv = project(scene.cam, pc)
            vis = np.asarray(in_image(scene.cam, uv, 1.0)) & (np.asarray(pc[..., 2]) > 0.2)
            uv = np.asarray(uv) + rng.normal(0, noise_px, uv.shape).astype(np.float32)
            scene = scene._replace(uv=uv.astype(np.float32), visible=vis)
        else:
            scene = make_scene(n_points=n, n_frames=2, noise_px=noise_px, sweep=sweep)
        x0 = unit_plane(scene.cam, scene.uv[0])
        x1 = unit_plane(scene.cam, scene.uv[1])
        mask = jnp.asarray(scene.visible[0] & scene.visible[1])
        res = reconstruct_two_views(
            x0, x1, mask, focal=458.0, key=jax.random.PRNGKey(0)
        )
        # ground-truth relative pose cam1<-cam0 (world frame = cam0)
        T0 = SE3(scene.T_cw.R[0], scene.T_cw.t[0])
        T1 = SE3(scene.T_cw.R[1], scene.T_cw.t[1])
        T_10 = T1 @ T0.inverse()
        return res, T_10, scene

    def _check_pose(self, res, T_gt):
        assert bool(res.success)
        R_err = np.asarray(res.T_21.R) @ np.asarray(T_gt.R).T
        ang = np.degrees(np.arccos(np.clip((np.trace(R_err) - 1) / 2, -1, 1)))
        assert ang < 1.0, f"rotation error {ang} deg"
        t_est = np.asarray(res.T_21.t)
        t_gt = np.asarray(T_gt.t)
        cos = abs(
            np.dot(t_est, t_gt) / (np.linalg.norm(t_est) * np.linalg.norm(t_gt))
        )
        assert cos > 0.999, f"translation direction cos {cos}"

    def test_general_scene_noiseless(self):
        res, T_gt, _ = self._run(0.0)
        self._check_pose(res, T_gt)
        assert not bool(res.used_homography)

    def test_general_scene_noisy(self):
        res, T_gt, _ = self._run(0.5)
        self._check_pose(res, T_gt)

    def test_planar_scene_uses_homography(self):
        res, T_gt, _ = self._run(0.3, planar=True)
        assert bool(res.used_homography)
        self._check_pose(res, T_gt)

    def test_insufficient_parallax_fails(self):
        res, _, _ = self._run(0.5, sweep=0.0005)
        assert not bool(res.success)

    def test_jit_compiles(self):
        scene = make_scene(n_points=300, n_frames=2, noise_px=0.5, sweep=np.pi / 10)
        x0 = unit_plane(scene.cam, scene.uv[0])
        x1 = unit_plane(scene.cam, scene.uv[1])
        mask = jnp.asarray(scene.visible[0] & scene.visible[1])
        f = jax.jit(lambda a, b, m, k: reconstruct_two_views(a, b, m, 458.0, k))
        res = f(x0, x1, mask, jax.random.PRNGKey(1))
        assert bool(res.success)
