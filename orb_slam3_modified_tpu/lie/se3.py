"""SE(3) rigid transforms, batch-agnostic over leading axes.

TPU-native replacement for Sophus::SE3f (reference:
Thirdparty/Sophus/sophus/se3.hpp) as used by Frame/KeyFrame pose state
(reference: include/Frame.h, include/KeyFrame.h).

A transform is a pair (R, t): R (..., 3, 3), t (..., 3). We keep them as
separate arrays rather than 4x4 matrices — SoA layout batches better and
avoids wasted lanes. Tangent convention: xi = (rho, phi) with exp matching
Sophus (translation part first is NOT used; we use (rho, phi) = (trans, rot)
ordering like Sophus::SE3::exp applied as [upsilon, omega]).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import so3


class SE3(NamedTuple):
    """Batched rigid transform. R: (..., 3, 3), t: (..., 3)."""

    R: jnp.ndarray
    t: jnp.ndarray

    @staticmethod
    def identity(batch_shape=(), dtype=jnp.float32):
        R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*batch_shape, 3, 3))
        t = jnp.zeros((*batch_shape, 3), dtype=dtype)
        return SE3(R, t)

    def inverse(self):
        Rt = jnp.swapaxes(self.R, -1, -2)
        return SE3(Rt, -jnp.einsum("...ij,...j->...i", Rt, self.t))

    def __matmul__(self, other: "SE3") -> "SE3":
        return SE3(
            self.R @ other.R,
            jnp.einsum("...ij,...j->...i", self.R, other.t) + self.t,
        )

    def apply(self, p):
        """Transform points p (..., 3) (broadcasts over leading axes)."""
        return jnp.einsum("...ij,...j->...i", self.R, p) + self.t

    def matrix(self):
        """(..., 4, 4) homogeneous matrix."""
        batch = self.R.shape[:-2]
        bottom = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], dtype=self.R.dtype), (*batch, 1, 4)
        )
        top = jnp.concatenate([self.R, self.t[..., None]], axis=-1)
        return jnp.concatenate([top, bottom], axis=-2)

    def normalize(self):
        return SE3(so3.normalize(self.R), self.t)


def from_matrix(T):
    return SE3(T[..., :3, :3], T[..., :3, 3])


def exp(xi):
    """(..., 6) tangent (upsilon translational, omega rotational) -> SE3."""
    u, w = xi[..., :3], xi[..., 3:]
    R = so3.exp(w)
    V = so3.left_jacobian(w)
    return SE3(R, jnp.einsum("...ij,...j->...i", V, u))


def log(T: SE3):
    """SE3 -> (..., 6)."""
    w = so3.log(T.R)
    Vinv = so3.left_jacobian_inv(w)
    u = jnp.einsum("...ij,...j->...i", Vinv, T.t)
    return jnp.concatenate([u, w], axis=-1)


def adjoint(T: SE3):
    """(..., 6, 6) adjoint: Ad_T [u; w] acts on tangents."""
    tR = so3.hat(T.t) @ T.R
    top = jnp.concatenate([T.R, tR], axis=-1)
    bottom = jnp.concatenate([jnp.zeros_like(T.R), T.R], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)
