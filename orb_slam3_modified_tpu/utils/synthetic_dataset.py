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
    pw = np.nan_to_num(pw)  # invalid rays are masked by `valid` below
    tx = ((pw[:, 0] + plane_half) / (2 * plane_half) * (tw - 1)).astype(np.int32)
    ty = ((pw[:, 1] + plane_half) / (2 * plane_half) * (th - 1)).astype(np.int32)
    tx = np.clip(tx, 0, tw - 1)
    ty = np.clip(ty, 0, th - 1)
    img = np.where(valid, texture[ty, tx], 20.0)
    return img.reshape(h, w).astype(np.float32)


def render_textured_scene_with_depth(
    T_cw: np.ndarray, cam, texture: np.ndarray,
    plane_z: float = 6.0, plane_half: float = 12.0, rays_c: np.ndarray = None,
):
    """Like render_textured_scene, additionally returning the exact
    per-pixel camera depth (z in the camera frame; 0 where the ray misses
    the plane) and the surface mask — ground truth for training the
    mono-depth/segmentation models (reference role: the depth_estimate/
    image_segmentation training data the fork's semantic pipeline assumes)."""
    h, w = cam.height, cam.width
    if rays_c is None:
        rays_c = camera_rays(cam)
    R = T_cw[:3, :3]
    t = T_cw[:3, 3]
    c = -R.T @ t
    d = rays_c @ R
    denom = d[:, 2]
    denom = np.where(np.abs(denom) < 1e-9, 1e-9, denom)
    s = (plane_z - c[2]) / denom
    pw = c[None] + s[:, None] * d
    valid = (
        (s > 0.1)
        & (np.abs(pw[:, 0]) < plane_half)
        & (np.abs(pw[:, 1]) < plane_half)
    )
    th, tw = texture.shape
    pw = np.nan_to_num(pw)
    tx = np.clip(((pw[:, 0] + plane_half) / (2 * plane_half) * (tw - 1)).astype(np.int32), 0, tw - 1)
    ty = np.clip(((pw[:, 1] + plane_half) / (2 * plane_half) * (th - 1)).astype(np.int32), 0, th - 1)
    img = np.where(valid, texture[ty, tx], 20.0)
    # camera-frame depth: rays_c has z=1 (unit-plane rays), so depth = s
    depth = np.where(valid, s, 0.0)
    return (
        img.reshape(h, w).astype(np.float32),
        depth.reshape(h, w).astype(np.float32),
        valid.reshape(h, w),
    )


def orbit_state(t: float, period: float, radius: float, sweep: float,
                height: float = 0.4, ring: bool = False, ring_z: float = -4.0):
    """Analytic camera/body state for consistent image + IMU synthesis.

    Two layouts, both looking at the origin (plane at z=+2 beyond it):

    - arc (default): camera on an arc in the x-z plane (matches
      utils.synthetic.orbit_trajectory) — good for partial sweeps, but a full
      revolution passes within ~1 m of the plane (texture blows up).
    - ring: camera on a horizontal circle at z=ring_z with vertical bobbing —
      plane distance stays ~constant over a FULL revolution, so a 2-pi sweep
      is a proper loop-closure sequence.

    Returns (R_cw (3,3), p_w (3,), v_w (3,), a_w (3,)) — camera-from-world
    rotation, camera center, velocity, acceleration (world frame, no gravity).
    """
    a = sweep * t / period
    da = sweep / period
    sa, ca = np.sin(a), np.cos(a)
    if ring:
        s3, c3 = np.sin(3 * a), np.cos(3 * a)
        p = np.array([radius * sa, radius * ca, ring_z + height * (1 - c3)])
        v = np.array([radius * ca, -radius * sa, 3 * height * s3]) * da
        acc = np.array([-radius * sa, -radius * ca, 9 * height * c3]) * da**2
    else:
        p = np.array([radius * sa, height * np.sin(3 * a), -radius * ca])
        v = np.array([radius * ca, 3 * height * np.cos(3 * a), radius * sa]) * da
        acc = np.array(
            [-radius * sa, -9 * height * np.sin(3 * a), radius * ca]
        ) * da**2
    # look-at-origin frame (matches orbit_trajectory)
    fwd = -p / np.linalg.norm(p)
    up = np.array([0.0, -1.0, 0.0])
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    up2 = np.cross(fwd, right)
    R_wc = np.stack([right, up2, fwd], axis=1)
    return R_wc.T, p, v, acc


def write_euroc_sequence(
    out_dir: str,
    cam,
    n_frames: int = 30,
    fps: float = 20.0,
    seed: int = 0,
    radius: float = 3.0,
    sweep: float = np.pi / 4,
    height: float = 0.4,
    stereo_baseline: float = 0.0,
    with_imu: bool = False,
    imu_rate: float = 200.0,
    closed_loop: bool = False,
    T_bc: np.ndarray = None,  # (4,4) camera->body extrinsics; None = identity
    gyro_noise_std: float = 0.0,  # rad/s per-sample white noise
    acc_noise_std: float = 0.0,  # m/s^2 per-sample white noise
    gyro_bias=(0.0, 0.0, 0.0),  # constant true bias (rad/s)
    acc_bias=(0.0, 0.0, 0.0),  # constant true bias (m/s^2)
    with_depth: bool = False,  # write mav0/depth0/data/<ns>.png (uint16 mm)
    texture: np.ndarray = None,  # (TH, TW) float32 override scene texture
):
    """Render an orbit over a textured plane into EuRoC layout.

    Mirrors the reference dataset surface the example mains consume
    (reference: mono_inertial_euroc.cc LoadImages/LoadIMU — mav0/cam0/data.csv,
    mav0/cam1 for stereo, mav0/imu0/data.csv with gyro-then-acc columns):

    - ``closed_loop=True`` sets sweep to a full revolution, so the camera
      revisits its start view — a loop-closure target.
    - ``stereo_baseline > 0`` renders cam1 displaced by +baseline along the
      left camera's x axis (rectified-stereo geometry).
    - ``with_imu`` writes a body-frame IMU stream (gravity = -z world, 9.81)
      consistent with the rendered trajectory. ``T_bc`` places the IMU on a
      real rig (x_b = R_bc x_c + t_bc, the reference's IMU.T_b_c1
      convention, src/Tracking.cc:1303); lever-arm accelerations are
      included via finite differences of the body position. Optional white
      noise and a constant true bias emulate a consumer IMU.

    Returns the list of ground-truth T_cw (4, 4) for cam0.
    """
    import cv2

    ring = closed_loop
    if closed_loop:
        sweep = 2 * np.pi
    rng = np.random.default_rng(seed)
    if texture is None:
        tex_small = rng.uniform(0, 255, (96, 96)).astype(np.float32)
        texture = cv2.resize(
            tex_small, (1024, 1024), interpolation=cv2.INTER_CUBIC
        )

    period = n_frames / fps  # full sweep duration; frame i at i/fps
    rays = camera_rays(cam)
    cam_dir = os.path.join(out_dir, "mav0", "cam0")
    os.makedirs(os.path.join(cam_dir, "data"), exist_ok=True)
    cam1_dir = os.path.join(out_dir, "mav0", "cam1")
    if stereo_baseline > 0:
        os.makedirs(os.path.join(cam1_dir, "data"), exist_ok=True)
    depth_dir = os.path.join(out_dir, "mav0", "depth0")
    if with_depth:
        os.makedirs(os.path.join(depth_dir, "data"), exist_ok=True)
    T_rl = np.eye(4)
    T_rl[0, 3] = -stereo_baseline  # p_right = p_left - b*ex

    lines = ["#timestamp [ns],filename"]
    gts = []
    for i in range(n_frames):
        R_cw, p, _, _ = orbit_state(i / fps, period, radius, sweep, height, ring)
        T = np.eye(4)
        T[:3, :3] = R_cw
        T[:3, 3] = -R_cw @ p
        t_ns = int(round(i / fps * 1e9))
        name = f"{t_ns}.png"
        if with_depth:
            img, depth, _ = render_textured_scene_with_depth(
                T, cam, texture, plane_z=2.0, plane_half=10.0, rays_c=rays
            )
            # RGB-D convention: uint16 millimeters, 0 = invalid (the
            # realsense D435i stream the reference's RGB-D-Inertial main
            # consumes, Examples/RGB-D-Inertial/rgbd_inertial_realsense_D435i.cc)
            cv2.imwrite(
                os.path.join(depth_dir, "data", name),
                np.clip(depth * 1000.0, 0, 65535).astype(np.uint16),
            )
        else:
            img = render_textured_scene(
                T, cam, texture, plane_z=2.0, plane_half=10.0, rays_c=rays
            )
        cv2.imwrite(os.path.join(cam_dir, "data", name), img.astype(np.uint8))
        if stereo_baseline > 0:
            img_r = render_textured_scene(
                T_rl @ T, cam, texture, plane_z=2.0, plane_half=10.0, rays_c=rays
            )
            cv2.imwrite(
                os.path.join(cam1_dir, "data", name), img_r.astype(np.uint8)
            )
        lines.append(f"{t_ns},{name}")
        gts.append(T)
    with open(os.path.join(cam_dir, "data.csv"), "w") as f:
        f.write("\n".join(lines) + "\n")
    if stereo_baseline > 0:
        with open(os.path.join(cam1_dir, "data.csv"), "w") as f:
            f.write("\n".join(lines) + "\n")
    if with_depth:
        with open(os.path.join(depth_dir, "data.csv"), "w") as f:
            f.write("\n".join(lines) + "\n")

    if with_imu:
        imu_dir = os.path.join(out_dir, "mav0", "imu0")
        os.makedirs(imu_dir, exist_ok=True)
        g_w = np.array([0.0, 0.0, -9.81])
        R_bc = np.eye(3) if T_bc is None else np.asarray(T_bc, np.float64)[:3, :3]
        t_bc = np.zeros(3) if T_bc is None else np.asarray(T_bc, np.float64)[:3, 3]
        t_cb = -R_bc.T @ t_bc  # body origin expressed in the camera frame
        b_g = np.asarray(gyro_bias, np.float64)
        b_a = np.asarray(acc_bias, np.float64)
        noise_rng = np.random.default_rng(seed + 7919)
        dt_fd = 1e-4  # finite-difference step (rotation rate + lever arm)

        def body_pos(tau):
            R_cw, p_c, _, _ = orbit_state(tau, period, radius, sweep, height, ring)
            return p_c + R_cw.T @ t_cb, R_cw

        rows = ["#timestamp [ns],w_x,w_y,w_z,a_x,a_y,a_z"]
        n_samples = int((n_frames - 1) / fps * imu_rate) + 1
        for j in range(n_samples):
            tau = j / imu_rate
            p_b, R_cw = body_pos(tau)
            p_bp, _ = body_pos(tau + dt_fd)
            p_bm, _ = body_pos(tau - dt_fd)
            a_b_w = (p_bp - 2 * p_b + p_bm) / (dt_fd * dt_fd)
            R_cw2, _, _, _ = orbit_state(
                tau + dt_fd, period, radius, sweep, height, ring
            )
            # omega in the camera frame, rotated into the body frame
            dR = R_cw @ R_cw2.T  # R_wc(t)^T-chain: R_wb^T dR_wb for body==cam
            w_c = (
                np.array([dR[2, 1] - dR[1, 2], dR[0, 2] - dR[2, 0], dR[1, 0] - dR[0, 1]])
                / (2.0 * dt_fd)
            )
            w_b = R_bc @ w_c
            R_bw = R_bc @ R_cw
            f_b = R_bw @ (a_b_w - g_w)  # specific force in body frame
            w_meas = w_b + b_g + noise_rng.normal(0.0, gyro_noise_std, 3)
            a_meas = f_b + b_a + noise_rng.normal(0.0, acc_noise_std, 3)
            t_ns = int(round(tau * 1e9))
            rows.append(
                f"{t_ns},{w_meas[0]:.9f},{w_meas[1]:.9f},{w_meas[2]:.9f},"
                f"{a_meas[0]:.9f},{a_meas[1]:.9f},{a_meas[2]:.9f}"
            )
        with open(os.path.join(imu_dir, "data.csv"), "w") as f:
            f.write("\n".join(rows) + "\n")
    return gts
