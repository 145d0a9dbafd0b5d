"""SO(3) operations, batch-agnostic over leading axes.

TPU-native replacement for the Sophus SO3 template used throughout the
reference (reference: Thirdparty/Sophus/sophus/so3.hpp) and the SO3 helpers in
the IMU module (reference: src/ImuTypes.cc:34-81 — RightJacobianSO3,
InverseRightJacobianSO3, NormalizeRotation).

All functions are pure jnp, jit/vmap/grad-safe, float32 by default, and use
Taylor guards around theta -> 0 so gradients are finite everywhere.
Rotations are (..., 3, 3) matrices; tangents are (..., 3) vectors.
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-6


def hat(w):
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zero, -wz, wy], axis=-1),
            jnp.stack([wz, zero, -wx], axis=-1),
            jnp.stack([-wy, wx, zero], axis=-1),
        ],
        axis=-2,
    )


def vee(W):
    """(..., 3, 3) -> (..., 3). Inverse of hat for skew-symmetric input."""
    return jnp.stack(
        [W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1
    )


def _theta_sq(w):
    return jnp.sum(w * w, axis=-1)


def _sin_cos_coeffs(theta_sq):
    """Return (A, B, C) = (sin t / t, (1-cos t)/t^2, (t - sin t)/t^3).

    Taylor-guarded so the same expressions are valid AND differentiable at
    theta == 0: the generic branch is evaluated on a sanitized theta so its
    (discarded) gradient stays finite (jnp.where grad rule: 0 * inf = nan).
    """
    small = theta_sq < _EPS
    ts_safe = jnp.where(small, 1.0, theta_sq)
    theta = jnp.sqrt(ts_safe)
    st, ct = jnp.sin(theta), jnp.cos(theta)
    A = jnp.where(small, 1.0 - theta_sq / 6.0, st / theta)
    B = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - ct) / ts_safe)
    C = jnp.where(small, 1.0 / 6.0 - theta_sq / 120.0, (theta - st) / (ts_safe * theta))
    return A, B, C


def exp(w):
    """Rodrigues: (..., 3) axis-angle -> (..., 3, 3) rotation."""
    theta_sq = _theta_sq(w)
    A, B, _ = _sin_cos_coeffs(theta_sq)
    W = hat(w)
    W2 = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + A[..., None, None] * W + B[..., None, None] * W2


def log(R):
    """(..., 3, 3) -> (..., 3) rotation vector.

    Goes through the unit quaternion: q = (cos(t/2), sin(t/2) a), so
    w = 2 atan2(|v|, qw) * v/|v|. The 4-branch quaternion extraction keeps
    full precision at every angle (the vector part has norm sin(t/2) ~ 1
    near pi, unlike vee(R - R^T) whose norm vanishes there).
    """
    q = quat_from_mat(R)  # w >= 0 -> theta in [0, pi]
    qw = q[..., 0]
    v = q[..., 1:]
    nv = jnp.linalg.norm(v, axis=-1)
    small = nv < 1e-6
    nv_safe = jnp.where(small, 1.0, nv)
    scale = jnp.where(
        small,
        2.0 / jnp.maximum(qw, 1e-12),
        2.0 * jnp.arctan2(nv, qw) / nv_safe,
    )
    return scale[..., None] * v


def left_jacobian(w):
    """J_l(w): exp((w+dw)^) ~= exp(J_l dw ^) exp(w^)."""
    theta_sq = _theta_sq(w)
    _, B, C = _sin_cos_coeffs(theta_sq)
    W = hat(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + B[..., None, None] * W + C[..., None, None] * (W @ W)


def right_jacobian(w):
    """J_r(w) = J_l(-w). Reference: src/ImuTypes.cc:48 RightJacobianSO3."""
    return left_jacobian(-w)


def left_jacobian_inv(w):
    theta_sq = _theta_sq(w)
    small = theta_sq < _EPS
    ts_safe = jnp.where(small, 1.0, theta_sq)
    theta = jnp.sqrt(ts_safe)
    half = theta * 0.5
    # coeff = (1 - (t/2) cot(t/2)) / t^2 via half-angle: stable on (0, 2*pi)
    # since sin(t/2) only vanishes at 0 and 2*pi.
    sin_half = jnp.sin(half)
    cos_half = jnp.cos(half)
    sin_half_safe = jnp.where(jnp.abs(sin_half) < 1e-12, 1e-12, sin_half)
    cot_coeff = jnp.where(
        small,
        1.0 / 12.0 + theta_sq / 720.0,
        (1.0 - half * cos_half / sin_half_safe) / ts_safe,
    )
    W = hat(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I - 0.5 * W + cot_coeff[..., None, None] * (W @ W)


def right_jacobian_inv(w):
    """Reference: src/ImuTypes.cc:65 InverseRightJacobianSO3 (fork-fixed)."""
    return left_jacobian_inv(-w)


# ---- quaternion helpers (wxyz convention) ----

def quat_from_mat(R):
    """(..., 3, 3) -> (..., 4) unit quaternion, wxyz, w >= 0."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate constructions; pick numerically best
    qw_0 = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12)) * 0.5
    q0 = jnp.stack(
        [qw_0, (m21 - m12) / (4 * qw_0), (m02 - m20) / (4 * qw_0), (m10 - m01) / (4 * qw_0)],
        axis=-1,
    )
    qx_1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 0.5
    q1 = jnp.stack(
        [(m21 - m12) / (4 * qx_1), qx_1, (m01 + m10) / (4 * qx_1), (m02 + m20) / (4 * qx_1)],
        axis=-1,
    )
    qy_2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) * 0.5
    q2 = jnp.stack(
        [(m02 - m20) / (4 * qy_2), (m01 + m10) / (4 * qy_2), qy_2, (m12 + m21) / (4 * qy_2)],
        axis=-1,
    )
    qz_3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) * 0.5
    q3 = jnp.stack(
        [(m10 - m01) / (4 * qz_3), (m02 + m20) / (4 * qz_3), (m12 + m21) / (4 * qz_3), qz_3],
        axis=-1,
    )
    cand = jnp.stack([q0, q1, q2, q3], axis=-2)  # (..., 4cand, 4)
    scores = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], axis=-1)
    best = jnp.argmax(scores, axis=-1)
    onehot = (best[..., None] == jnp.arange(4)).astype(cand.dtype)
    q = jnp.einsum("...c,...cd->...d", onehot, cand)
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def mat_from_quat(q):
    """(..., 4) wxyz -> (..., 3, 3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def normalize(R):
    """Re-project a near-rotation onto SO(3) via quaternion round-trip.

    Reference behavior: IMU::NormalizeRotation (src/ImuTypes.cc:76) does SVD;
    the quaternion round-trip is equivalent for near-orthogonal input and much
    cheaper on TPU.
    """
    return mat_from_quat(quat_from_mat(R))
