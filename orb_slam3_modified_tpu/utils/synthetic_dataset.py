"""Write a synthetic image sequence to disk in EuRoC layout.

Gives the dataset-runner CLI (run.py) and integration tests a real
image-pipeline target when no EuRoC download is available: textured planes
rendered under a known trajectory, saved as mav0/cam0/data/*.png + data.csv.
"""
from __future__ import annotations

import os

import numpy as np


def camera_rays(cam):
    """(H*W, 3) unit-plane rays for every pixel — constant per camera;
    precompute once when rendering sequences."""
    from ..cameras import unproject_np

    h, w = cam.height, cam.width
    ys, xs = np.mgrid[0:h, 0:w]
    uv = np.stack([xs.ravel(), ys.ravel()], axis=-1).astype(np.float32)
    return unproject_np(cam, uv)


def render_textured_scene(
    T_cw: np.ndarray,  # (4, 4) world->cam
    cam,
    texture: np.ndarray,  # (TH, TW) float32 texture on the z=Z0 plane
    plane_z: float = 6.0,
    plane_half: float = 12.0,
    rays_c: np.ndarray = None,  # optional precomputed camera_rays(cam)
):
    """Render a fronto-textured plane by inverse warping (plane z=Z0 in
    world; texture mapped over [-half, half]^2)."""
    h, w = cam.height, cam.width
    if rays_c is None:
        rays_c = camera_rays(cam)  # (N, 3)
    R = T_cw[:3, :3]
    t = T_cw[:3, 3]
    # ray in world: origin = cam center, dir = R^T ray
    c = -R.T @ t
    d = rays_c @ R  # (N, 3) world dirs
    denom = d[:, 2]
    denom = np.where(np.abs(denom) < 1e-9, 1e-9, denom)
    s = (plane_z - c[2]) / denom
    pw = c[None] + s[:, None] * d
    valid = (s > 0.1) & (np.abs(pw[:, 0]) < plane_half) & (np.abs(pw[:, 1]) < plane_half)
    th, tw = texture.shape
    tx = ((pw[:, 0] + plane_half) / (2 * plane_half) * (tw - 1)).astype(np.int32)
    ty = ((pw[:, 1] + plane_half) / (2 * plane_half) * (th - 1)).astype(np.int32)
    tx = np.clip(tx, 0, tw - 1)
    ty = np.clip(ty, 0, th - 1)
    img = np.where(valid, texture[ty, tx], 20.0)
    return img.reshape(h, w).astype(np.float32)


def write_euroc_sequence(
    out_dir: str,
    cam,
    n_frames: int = 30,
    fps: float = 20.0,
    seed: int = 0,
    radius: float = 3.0,
):
    """Render an orbit over a textured plane into EuRoC layout; returns the
    list of ground-truth T_cw (4, 4)."""
    import cv2

    from .synthetic import orbit_trajectory

    rng = np.random.default_rng(seed)
    tex_small = rng.uniform(0, 255, (96, 96)).astype(np.float32)
    texture = cv2.resize(tex_small, (1024, 1024), interpolation=cv2.INTER_CUBIC)

    cam_dir = os.path.join(out_dir, "mav0", "cam0")
    os.makedirs(os.path.join(cam_dir, "data"), exist_ok=True)
    T_all = orbit_trajectory(n_frames, radius=radius, sweep=np.pi / 4)
    # orbit looks at origin; push the plane behind the origin (z=6 world)
    lines = ["#timestamp [ns],filename"]
    gts = []
    import jax.numpy as jnp

    for i in range(n_frames):
        T = np.eye(4)
        T[:3, :3] = np.asarray(T_all.R[i])
        T[:3, 3] = np.asarray(T_all.t[i])
        img = render_textured_scene(T, cam, texture, plane_z=2.0, plane_half=10.0)
        t_ns = int(i / fps * 1e9)
        name = f"{t_ns}.png"
        cv2.imwrite(os.path.join(cam_dir, "data", name), img.astype(np.uint8))
        lines.append(f"{t_ns},{name}")
        gts.append(T)
    with open(os.path.join(cam_dir, "data.csv"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return gts
