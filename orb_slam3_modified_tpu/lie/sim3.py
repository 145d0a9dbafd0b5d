"""Sim(3) similarity transforms, batch-agnostic.

TPU-native replacement for Sophus::Sim3f / g2o::Sim3 (reference:
Thirdparty/Sophus/sophus/sim3.hpp, Thirdparty/g2o/g2o/types/sim3.h) used by
loop closing + essential-graph optimization (reference: src/LoopClosing.cc,
src/Optimizer.cc:1501 OptimizeEssentialGraph, src/Optimizer.cc:2115
OptimizeSim3, src/Sim3Solver.cc).

Representation: (s, R, t) with action p -> s * R p + t. Tangent ordering for
exp/log: (upsilon[3], omega[3], sigma[1]) with s = e^sigma.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import so3
from .se3 import SE3

_EPS = 1e-6


class Sim3(NamedTuple):
    s: jnp.ndarray  # (...,)
    R: jnp.ndarray  # (..., 3, 3)
    t: jnp.ndarray  # (..., 3)

    @staticmethod
    def identity(batch_shape=(), dtype=jnp.float32):
        return Sim3(
            jnp.ones(batch_shape, dtype=dtype),
            jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*batch_shape, 3, 3)),
            jnp.zeros((*batch_shape, 3), dtype=dtype),
        )

    @staticmethod
    def from_se3(T: SE3, s=None):
        if s is None:
            s = jnp.ones(T.t.shape[:-1], dtype=T.t.dtype)
        return Sim3(s, T.R, T.t)

    def to_se3(self) -> SE3:
        """Drop scale into translation: SE3(R, t/s) matches the reference's
        loop-correction convention [R t/s] (src/LoopClosing.cc:1062 region)."""
        return SE3(self.R, self.t / self.s[..., None])

    def inverse(self):
        Rt = jnp.swapaxes(self.R, -1, -2)
        s_inv = 1.0 / self.s
        return Sim3(
            s_inv,
            Rt,
            -s_inv[..., None] * jnp.einsum("...ij,...j->...i", Rt, self.t),
        )

    def __matmul__(self, other: "Sim3") -> "Sim3":
        return Sim3(
            self.s * other.s,
            self.R @ other.R,
            self.s[..., None] * jnp.einsum("...ij,...j->...i", self.R, other.t)
            + self.t,
        )

    def apply(self, p):
        return (
            self.s[..., None] * jnp.einsum("...ij,...j->...i", self.R, p) + self.t
        )


def exp(xi):
    """(..., 7) = (upsilon, omega, sigma) -> Sim3."""
    u, w, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    s = jnp.exp(sigma)
    R = so3.exp(w)
    W = so3.hat(w)
    W2 = W @ W
    theta_sq = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta_sq, 1e-24))

    # V matrix for Sim3 (Strasdat thesis): V = A*I + B*W + C*W^2 with
    # coefficients depending on (sigma, theta).
    small_sigma = jnp.abs(sigma) < _EPS
    small_theta = theta_sq < _EPS
    es = s
    sigma_safe = jnp.where(small_sigma, 1.0, sigma)
    A_s = jnp.where(small_sigma, 1.0 + sigma / 2.0, (es - 1.0) / sigma_safe)

    st, ct = jnp.sin(theta), jnp.cos(theta)
    a = es * st
    b = es * ct
    sig2th2 = sigma * sigma + theta_sq
    sig2th2_safe = jnp.where(sig2th2 < 1e-20, 1.0, sig2th2)
    theta_safe = jnp.where(small_theta, 1.0, theta)
    # Strasdat/Sophus Sim3 V-matrix coefficients (coeffs of W and W^2).
    B_gen = (a * sigma + (1.0 - b) * theta) / (theta_safe * sig2th2_safe)
    C_gen = (A_s - ((b - 1.0) * sigma + a * theta) / sig2th2_safe) / jnp.where(
        small_theta, 1.0, theta_sq
    )
    # small-theta limits
    B_small = jnp.where(
        small_sigma, 0.5 + sigma / 3.0, (sigma_safe * es - es + 1.0) / jnp.where(small_sigma, 1.0, sigma_safe * sigma_safe)
    )
    C_small = jnp.where(
        small_sigma,
        1.0 / 6.0 + sigma / 8.0,
        (es * (0.5 * sigma_safe * sigma_safe - sigma_safe + 1.0) - 1.0)
        / jnp.where(small_sigma, 1.0, sigma_safe ** 3),
    )
    B = jnp.where(small_theta, B_small, B_gen)
    C = jnp.where(small_theta, C_small, C_gen)
    I = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    V = A_s[..., None, None] * I + B[..., None, None] * W + C[..., None, None] * W2
    t = jnp.einsum("...ij,...j->...i", V, u)
    return Sim3(s, R, t)


def log(X: Sim3):
    """Sim3 -> (..., 7) by inverting exp's V numerically (3x3 solve)."""
    w = so3.log(X.R)
    sigma = jnp.log(X.s)
    # Rebuild V from (w, sigma) exactly as in exp (columns = exp applied to
    # unit translations), then solve V u = t.
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), (*w.shape[:-1], 3, 3))
    cols = []
    for i in range(3):
        xi_i = jnp.concatenate([eye[..., i], w, sigma[..., None]], axis=-1)
        cols.append(exp(xi_i).t)
    V = jnp.stack(cols, axis=-1)  # (..., 3, 3)
    u = jnp.linalg.solve(V, X.t[..., None])[..., 0]
    return jnp.concatenate([u, w, sigma[..., None]], axis=-1)
