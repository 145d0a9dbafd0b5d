"""Radial-tangential distortion, keypoint undistortion, stereo rectification.

TPU-native replacement for the reference's OpenCV-based image geometry:

- ``Frame::UndistortKeyPoints`` (reference: src/Frame.cc:746) undistorts
  keypoint coordinates with ``cv::undistortPoints`` instead of warping the
  image. Here ``undistort_points`` is the same fixed-point iteration,
  vectorized over all keypoints, with a jnp twin (``undistort_points_jnp``)
  so it can run fused on device right after extraction.

- The reference's new-style ``Settings`` precomputes stereo rectification
  maps (reference: include/Settings.h:44-121, src/Settings.cc ``
  precomputeRectificationMaps`` using cv::stereoRectify +
  cv::initUndistortRectifyMap) and remaps every stereo frame on the CPU.
  Here ``stereo_rectify`` implements the same Bouguet construction in numpy
  (computed once at startup) and ``remap_bilinear`` applies the maps on
  device as a jitted bilinear gather — per-frame rectification rides the
  TPU's vector units instead of a host thread, and fuses into the pyramid
  build of the extractor dispatch.

Legacy EuRoC stereo configs carry LEFT.K/D/R/P directly (reference:
src/Tracking.cc:621 ParseCamParamFile legacy branch); those feed straight
into ``init_undistort_rectify_map`` without calling ``stereo_rectify``.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------- radtan

def radtan_distort_normalized(xy, dist):
    """Apply (k1,k2,p1,p2[,k3]) to normalized image coordinates.

    Works for numpy or jnp arrays; ``xy`` is (..., 2).
    """
    d = [float(v) for v in np.asarray(dist).ravel()[:5]] + [0.0] * 5
    k1, k2, p1, p2, k3 = d[0], d[1], d[2], d[3], d[4]
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    xp = np if isinstance(x, np.ndarray) else jnp
    return xp.stack([xd, yd], axis=-1)


def _undistort_normalized_core(xy_dist, dist, iters, xp):
    """Fixed-point inversion of the radtan model (cv::undistortPoints loop)."""
    d = [float(v) for v in np.asarray(dist).ravel()[:5]] + [0.0] * 5
    k1, k2, p1, p2, k3 = d[0], d[1], d[2], d[3], d[4]
    x0, y0 = xy_dist[..., 0], xy_dist[..., 1]
    x, y = x0, y0
    for _ in range(iters):
        r2 = x * x + y * y
        icdist = 1.0 / (1.0 + r2 * (k1 + r2 * (k2 + r2 * k3)))
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        x = (x0 - dx) * icdist
        y = (y0 - dy) * icdist
    return xp.stack([x, y], axis=-1)


def undistort_points(pts_px, K, dist, R=None, P=None, iters=40):
    """``cv::undistortPoints`` parity: pixel coords -> undistorted coords.

    pts_px (..., 2) pixels under intrinsics K (3,3) with radtan ``dist``.
    If R (3,3) is given the normalized rays are rotated by it; if P is
    given (3,3 or 3,4) the result is re-projected to pixels, else
    normalized coordinates are returned. Pure numpy (host, once-per-frame
    keypoint sets or map precompute).
    """
    K = np.asarray(K, np.float64)
    pts = np.asarray(pts_px, np.float64)
    xn = (pts[..., 0] - K[0, 2]) / K[0, 0]
    yn = (pts[..., 1] - K[1, 2]) / K[1, 1]
    xy = _undistort_normalized_core(np.stack([xn, yn], -1), dist, iters, np)
    if R is not None:
        R = np.asarray(R, np.float64)
        v = np.stack([xy[..., 0], xy[..., 1], np.ones_like(xy[..., 0])], -1)
        v = v @ R.T
        xy = v[..., :2] / v[..., 2:3]
    if P is not None:
        P = np.asarray(P, np.float64)
        out = np.empty_like(xy)
        out[..., 0] = P[0, 0] * xy[..., 0] + P[0, 2]
        out[..., 1] = P[1, 1] * xy[..., 1] + P[1, 2]
        return out
    return xy


def make_keypoint_undistorter(K, dist, iters=8):
    """Device-side keypoint undistortion: pixels -> undistorted pixels
    (same K), as the reference's Frame::UndistortKeyPoints. Returns a
    jittable fn over (..., 2) float32 uv arrays; identity-safe on padded
    (invalid) slots since the iteration is total."""
    K = np.asarray(K, np.float64)
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    d = tuple(float(v) for v in np.asarray(dist).ravel()[:5])

    def fn(uv):
        xn = (uv[..., 0] - cx) / fx
        yn = (uv[..., 1] - cy) / fy
        xy = _undistort_normalized_core(
            jnp.stack([xn, yn], -1), d, iters, jnp
        )
        return jnp.stack(
            [xy[..., 0] * fx + cx, xy[..., 1] * fy + cy], -1
        ).astype(uv.dtype)

    return fn


# ------------------------------------------------------- stereo rectify

def _rodrigues_vec(R):
    """Rotation matrix -> rotation vector (numpy, single)."""
    R = np.asarray(R, np.float64)
    c = (np.trace(R) - 1.0) * 0.5
    c = np.clip(c, -1.0, 1.0)
    theta = np.arccos(c)
    if theta < 1e-12:
        return np.zeros(3)
    w = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    return w * (theta / (2.0 * np.sin(theta)))


def _rodrigues_mat(w):
    """Rotation vector -> matrix (numpy, single)."""
    w = np.asarray(w, np.float64)
    theta = np.linalg.norm(w)
    if theta < 1e-12:
        return np.eye(3)
    k = w / theta
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


def stereo_rectify(K1, D1, K2, D2, image_size, R, t):
    """Bouguet stereo rectification (cv::stereoRectify,
    CALIB_ZERO_DISPARITY, alpha<0 i.e. no free-scaling crop).

    ``R, t`` map points from camera-1 to camera-2 frame (x2 = R x1 + t),
    matching the reference Settings' ``T_c1_c2`` inverse convention.
    Returns (R1, R2, P1, P2, Q): per-camera rectifying rotations, new
    3x4 projections sharing one focal/principal point, and the disparity
    -to-depth matrix.
    """
    K1 = np.asarray(K1, np.float64)
    K2 = np.asarray(K2, np.float64)
    R = np.asarray(R, np.float64)
    t = np.asarray(t, np.float64).ravel()
    nx, ny = int(image_size[0]), int(image_size[1])

    # Split the relative rotation evenly between the two cameras.
    om = _rodrigues_vec(R)
    r_r = _rodrigues_mat(-0.5 * om)
    t_half = r_r @ t

    idx = 0 if abs(t_half[0]) > abs(t_half[1]) else 1
    c = t_half[idx]
    nt = np.linalg.norm(t_half)
    uu = np.zeros(3)
    uu[idx] = 1.0 if c > 0 else -1.0

    # Rotation that aligns the (halved) baseline with the image x (or y) axis.
    ww = np.cross(t_half, uu)
    nw = np.linalg.norm(ww)
    if nw > 0:
        ww *= np.arccos(np.clip(abs(c) / nt, -1.0, 1.0)) / nw
    wR = _rodrigues_mat(ww)
    R1 = wR @ r_r.T
    R2 = wR @ r_r
    t_new = R2 @ t

    # New focal: average of the cross-axis focals (modern cv::stereoRectify).
    fc_new = 0.5 * (K1[idx ^ 1, idx ^ 1] + K2[idx ^ 1, idx ^ 1])

    # New principal point: image corners through undistort+rectify, averaged
    # per camera, then shared (CALIB_ZERO_DISPARITY averages the two).
    cc_new = np.zeros((2, 2))
    corners = np.array(
        [[0, 0], [nx - 1, 0], [0, ny - 1], [nx - 1, ny - 1]], np.float64
    )
    for k, (K, D, Rk) in enumerate(((K1, D1, R1), (K2, D2, R2))):
        xy = undistort_points(corners, K, D if D is not None else np.zeros(5),
                              R=Rk)
        cc_new[k, 0] = (nx - 1) / 2.0 - fc_new * np.mean(xy[:, 0])
        cc_new[k, 1] = (ny - 1) / 2.0 - fc_new * np.mean(xy[:, 1])
    cc = cc_new.mean(axis=0)

    P1 = np.array(
        [[fc_new, 0, cc[0], 0], [0, fc_new, cc[1], 0], [0, 0, 1, 0]]
    )
    P2 = P1.copy()
    P2[idx, 3] = t_new[idx] * fc_new

    Q = np.array(
        [
            [1, 0, 0, -cc[0]],
            [0, 1, 0, -cc[1]],
            [0, 0, 0, fc_new],
            [0, 0, -1.0 / t_new[idx], 0],
        ]
    )
    return R1, R2, P1, P2, Q


def init_undistort_rectify_map(K, D, R, P, image_size):
    """cv::initUndistortRectifyMap parity for the radtan model.

    For every rectified pixel, unproject with P, rotate back by R^-1,
    distort, and project with K — producing the source-pixel lookup maps.
    Returns (map_x, map_y) float32 arrays of shape (H, W). Pure numpy,
    computed once at startup.
    """
    K = np.asarray(K, np.float64)
    P = np.asarray(P, np.float64)
    R = np.asarray(R, np.float64)
    nx, ny = int(image_size[0]), int(image_size[1])
    u, v = np.meshgrid(np.arange(nx, dtype=np.float64),
                       np.arange(ny, dtype=np.float64))
    x = (u - P[0, 2]) / P[0, 0]
    y = (v - P[1, 2]) / P[1, 1]
    ones = np.ones_like(x)
    rays = np.stack([x, y, ones], axis=-1) @ np.linalg.inv(R).T
    xn = rays[..., 0] / rays[..., 2]
    yn = rays[..., 1] / rays[..., 2]
    xy = radtan_distort_normalized(np.stack([xn, yn], -1),
                                   D if D is not None else np.zeros(5))
    map_x = (xy[..., 0] * K[0, 0] + K[0, 2]).astype(np.float32)
    map_y = (xy[..., 1] * K[1, 1] + K[1, 2]).astype(np.float32)
    return map_x, map_y


# ------------------------------------------------------ device-side remap

@jax.jit
def remap_bilinear(img, map_x, map_y):
    """cv::remap(INTER_LINEAR, BORDER_CONSTANT 0) on device.

    img (H, W) float32/uint8; map_x/map_y (Ho, Wo) source coordinates.
    A pure gather + lerp — XLA fuses it into the consumer (the pyramid
    build), so rectification adds no extra HBM round-trip.
    """
    img = img.astype(jnp.float32)
    H, W = img.shape
    x0 = jnp.floor(map_x)
    y0 = jnp.floor(map_y)
    fx = map_x - x0
    fy = map_y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def at(yy, xx):
        inb = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
        val = img[jnp.clip(yy, 0, H - 1), jnp.clip(xx, 0, W - 1)]
        return jnp.where(inb, val, 0.0)

    v00 = at(y0i, x0i)
    v01 = at(y0i, x0i + 1)
    v10 = at(y0i + 1, x0i)
    v11 = at(y0i + 1, x0i + 1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


# ------------------------------------------------------------- settings glue

@dataclasses.dataclass
class StereoRectification:
    """Precomputed per-camera rectification maps + the rectified camera.

    Built once from Settings (either legacy LEFT./RIGHT. K/D/R/P blocks or
    new-style Camera1/Camera2 + Stereo.T_c1_c2); ``remap`` applies both
    maps on device.
    """

    map_lx: np.ndarray
    map_ly: np.ndarray
    map_rx: np.ndarray
    map_ry: np.ndarray
    fx: float
    fy: float
    cx: float
    cy: float
    bf: float  # baseline * fx of the rectified pair

    def remap(self, img_left, img_right):
        l = remap_bilinear(jnp.asarray(img_left), jnp.asarray(self.map_lx),
                           jnp.asarray(self.map_ly))
        r = remap_bilinear(jnp.asarray(img_right), jnp.asarray(self.map_rx),
                           jnp.asarray(self.map_ry))
        return l, r


def build_rectification(K1, D1, K2, D2, image_size, R, t) -> StereoRectification:
    """New-style Settings path: stereoRectify + maps (src/Settings.cc
    precomputeRectificationMaps parity)."""
    R1, R2, P1, P2, _ = stereo_rectify(K1, D1, K2, D2, image_size, R, t)
    mlx, mly = init_undistort_rectify_map(K1, D1, R1, P1, image_size)
    mrx, mry = init_undistort_rectify_map(K2, D2, R2, P2, image_size)
    return StereoRectification(
        mlx, mly, mrx, mry,
        fx=float(P1[0, 0]), fy=float(P1[1, 1]),
        cx=float(P1[0, 2]), cy=float(P1[1, 2]),
        bf=float(abs(P2[0, 3])),
    )


def build_rectification_legacy(Kl, Dl, Rl, Pl, Kr, Dr, Rr, Pr,
                               image_size) -> StereoRectification:
    """Legacy EuRoC config path: LEFT./RIGHT. K,D,R,P given directly
    (src/Tracking.cc:621 ParseCamParamFile legacy branch)."""
    mlx, mly = init_undistort_rectify_map(Kl, Dl, Rl, Pl, image_size)
    mrx, mry = init_undistort_rectify_map(Kr, Dr, Rr, Pr, image_size)
    Pl = np.asarray(Pl, np.float64)
    Pr = np.asarray(Pr, np.float64)
    return StereoRectification(
        mlx, mly, mrx, mry,
        fx=float(Pl[0, 0]), fy=float(Pl[1, 1]),
        cx=float(Pl[0, 2]), cy=float(Pl[1, 2]),
        bf=float(abs(Pr[0, 3])),
    )
