"""Point triangulation kernels.

TPU-native replacement for GeometricTools::Triangulate (reference:
include/GeometricTools.h:37-41, src/GeometricTools.cc) and the triangulation
inside KannalaBrandt8::TriangulateMatches. Batched DLT: one 4x4 SVD per
correspondence, vmapped — XLA batches the small eigendecompositions.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..lie.se3 import SE3


def projection_matrix(T_cw: SE3):
    """(..., 3, 4) projection [R|t] in normalized (unit-plane) coordinates."""
    return jnp.concatenate([T_cw.R, T_cw.t[..., None]], axis=-1)


def triangulate_dlt(P1, P2, x1, x2):
    """DLT triangulation in normalized camera coordinates.

    P1, P2: (..., 3, 4) projection matrices (world -> cam, normalized coords).
    x1, x2: (..., 2) unit-plane observations (x/z, y/z).
    Returns (..., 3) world points. Reference: src/GeometricTools.cc Triangulate
    builds the same 4x4 system and takes the smallest right singular vector.
    """
    rows = [
        x1[..., 0, None] * P1[..., 2, :] - P1[..., 0, :],
        x1[..., 1, None] * P1[..., 2, :] - P1[..., 1, :],
        x2[..., 0, None] * P2[..., 2, :] - P2[..., 0, :],
        x2[..., 1, None] * P2[..., 2, :] - P2[..., 1, :],
    ]
    A = jnp.stack(rows, axis=-2)  # (..., 4, 4)
    # Smallest right singular vector of A == eigenvector of A^T A for the
    # smallest eigenvalue. eigh on the 4x4 normal matrix is cheaper than SVD
    # and batches well on TPU.
    AtA = jnp.einsum("...ji,...jk->...ik", A, A)
    _, V = jnp.linalg.eigh(AtA)  # ascending eigenvalues
    X = V[..., :, 0]  # (..., 4)
    w = X[..., 3]
    w_safe = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    return X[..., :3] / w_safe[..., None]


def triangulate_rays(T_wc1: SE3, T_wc2: SE3, ray1, ray2):
    """Triangulate from two camera-to-world poses and camera-frame rays.

    Used by the fisheye path where observations are 3D bearing vectors
    (reference: KannalaBrandt8::TriangulateMatches).
    """
    P1 = projection_matrix(T_wc1.inverse())
    P2 = projection_matrix(T_wc2.inverse())
    x1 = ray1[..., :2] / jnp.where(jnp.abs(ray1[..., 2:]) < 1e-9, 1e-9, ray1[..., 2:])
    x2 = ray2[..., :2] / jnp.where(jnp.abs(ray2[..., 2:]) < 1e-9, 1e-9, ray2[..., 2:])
    return triangulate_dlt(P1, P2, x1, x2)


def depth_and_reproj_checks(
    T_cw1: SE3,
    T_cw2: SE3,
    pw,
    x1,
    x2,
    reproj_thresh_sq: float,
    min_parallax_cos: float = 0.9998,
):
    """Cheirality + parallax + reprojection gates used after triangulation.

    Mirrors the acceptance logic of TwoViewReconstruction::CheckRT
    (reference: src/TwoViewReconstruction.cc:760 region): positive depth in
    both views, sufficient parallax, squared reprojection error below the
    threshold in both views (unit-plane coordinates scaled by caller).
    Returns (valid_mask, parallax_cos, err1_sq, err2_sq).
    """
    pc1 = T_cw1.apply(pw)
    pc2 = T_cw2.apply(pw)
    z1, z2 = pc1[..., 2], pc2[..., 2]
    # parallax between viewing rays from each camera center
    c1 = T_cw1.inverse().t
    c2 = T_cw2.inverse().t
    r1 = pw - c1
    r2 = pw - c2
    cos_par = jnp.sum(r1 * r2, axis=-1) / (
        jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1) + 1e-12
    )
    z1s = jnp.where(jnp.abs(z1) < 1e-9, 1e-9, z1)
    z2s = jnp.where(jnp.abs(z2) < 1e-9, 1e-9, z2)
    e1 = pc1[..., :2] / z1s[..., None] - x1
    e2 = pc2[..., :2] / z2s[..., None] - x2
    err1 = jnp.sum(e1 * e1, axis=-1)
    err2 = jnp.sum(e2 * e2, axis=-1)
    valid = (
        (z1 > 0)
        & (z2 > 0)
        & (cos_par < min_parallax_cos)
        & (err1 < reproj_thresh_sq)
        & (err2 < reproj_thresh_sq)
    )
    return valid, cos_par, err1, err2
