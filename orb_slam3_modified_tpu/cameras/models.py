"""Camera models: pinhole and Kannala-Brandt-8 fisheye.

TPU-native replacement for the reference's GeometricCamera hierarchy
(reference: include/CameraModels/GeometricCamera.h:61-90,
src/CameraModels/Pinhole.cpp, src/CameraModels/KannalaBrandt8.cpp).

Instead of virtual dispatch we use a static `kind` + a flat parameter vector,
so heterogeneous camera rigs batch as arrays and everything stays jittable:
  pinhole: params = [fx, fy, cx, cy]            (kind = PINHOLE)
  kb8:     params = [fx, fy, cx, cy, k0..k3]    (kind = FISHEYE_KB8)

All functions are batch-agnostic over leading axes of the point arrays and
broadcast against the (possibly unbatched) parameter vector.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

PINHOLE = 0
FISHEYE_KB8 = 1

_Z_EPS = 1e-6


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Camera:
    """Camera description: `params` is a leaf (traced under jit); `kind`,
    `width`, `height` are static aux data so model dispatch and image-bound
    checks stay Python-level."""

    kind: int
    params: jnp.ndarray  # (8,) padded; pinhole uses first 4
    width: int = 0
    height: int = 0

    def tree_flatten(self):
        return (self.params,), (self.kind, self.width, self.height)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux[0], children[0], aux[1], aux[2])

    @staticmethod
    def pinhole(fx, fy, cx, cy, width=0, height=0):
        p = jnp.zeros(8, dtype=jnp.float32).at[:4].set(
            jnp.array([fx, fy, cx, cy], dtype=jnp.float32)
        )
        return Camera(PINHOLE, p, width, height)

    @staticmethod
    def kb8(fx, fy, cx, cy, k0, k1, k2, k3, width=0, height=0):
        p = jnp.array([fx, fy, cx, cy, k0, k1, k2, k3], dtype=jnp.float32)
        return Camera(FISHEYE_KB8, p, width, height)

    @property
    def fx(self):
        return self.params[..., 0]

    @property
    def fy(self):
        return self.params[..., 1]

    @property
    def cx(self):
        return self.params[..., 2]

    @property
    def cy(self):

        return self.params[..., 3]

    def K(self):
        fx, fy, cx, cy = (self.params[..., i] for i in range(4))
        z = jnp.zeros_like(fx)
        o = jnp.ones_like(fx)
        return jnp.stack(
            [
                jnp.stack([fx, z, cx], axis=-1),
                jnp.stack([z, fy, cy], axis=-1),
                jnp.stack([z, z, o], axis=-1),
            ],
            axis=-2,
        )


# ---------- pinhole ----------

def _pinhole_project(params, pc):
    """Camera-frame points (..., 3) -> pixels (..., 2).

    Reference: Pinhole::project (src/CameraModels/Pinhole.cpp:34).
    """
    fx, fy, cx, cy = (params[..., i] for i in range(4))
    z = pc[..., 2]
    z_safe = jnp.where(jnp.abs(z) < _Z_EPS, _Z_EPS, z)
    u = fx * pc[..., 0] / z_safe + cx
    v = fy * pc[..., 1] / z_safe + cy
    return jnp.stack([u, v], axis=-1)


def _pinhole_unproject(params, uv):
    """Pixels (..., 2) -> unit-plane ray (..., 3) with z=1.

    Reference: Pinhole::unprojectEig (src/CameraModels/Pinhole.cpp:60).
    """
    fx, fy, cx, cy = (params[..., i] for i in range(4))
    x = (uv[..., 0] - cx) / fx
    y = (uv[..., 1] - cy) / fy
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


def _pinhole_project_jac(params, pc):
    """d(uv)/d(pc): (..., 2, 3). Reference: Pinhole::projectJac."""
    fx, fy = params[..., 0], params[..., 1]
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    z_safe = jnp.where(jnp.abs(z) < _Z_EPS, _Z_EPS, z)
    inv_z = 1.0 / z_safe
    inv_z2 = inv_z * inv_z
    zero = jnp.zeros_like(x)
    row0 = jnp.stack([fx * inv_z, zero, -fx * x * inv_z2], axis=-1)
    row1 = jnp.stack([zero, fy * inv_z, -fy * y * inv_z2], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


# ---------- Kannala-Brandt 8 (equidistant fisheye) ----------

def _kb8_project(params, pc):
    """Reference: KannalaBrandt8::project (src/CameraModels/KannalaBrandt8.cpp:34):
    r(theta) = theta + k0 th^3 + k1 th^5 + k2 th^7 + k3 th^9.
    """
    fx, fy, cx, cy = (params[..., i] for i in range(4))
    k0, k1, k2, k3 = (params[..., 4 + i] for i in range(4))
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    r2 = x * x + y * y
    r = jnp.sqrt(jnp.maximum(r2, 1e-18))
    theta = jnp.arctan2(r, z)
    th2 = theta * theta
    r_theta = theta * (1 + th2 * (k0 + th2 * (k1 + th2 * (k2 + th2 * k3))))
    small_r = r2 < 1e-12
    r_safe = jnp.where(small_r, 1.0, r)
    scale = jnp.where(small_r, 0.0, r_theta / r_safe)
    u = fx * scale * x + cx
    v = fy * scale * y + cy
    return jnp.stack([u, v], axis=-1)


def _kb8_unproject(params, uv, num_iters: int = 10):
    """Invert r(theta) by Newton iterations (fixed count for jit).

    Reference: KannalaBrandt8::unprojectEig (src/CameraModels/KannalaBrandt8.cpp:126)
    uses the same Newton solve with 10 iterations.
    """
    fx, fy, cx, cy = (params[..., i] for i in range(4))
    k0, k1, k2, k3 = (params[..., 4 + i] for i in range(4))
    mx = (uv[..., 0] - cx) / fx
    my = (uv[..., 1] - cy) / fy
    r_d = jnp.sqrt(mx * mx + my * my)
    # clamp distorted radius to the valid monotonic range (~ theta < pi/2 + margin)
    theta = r_d  # init
    for _ in range(num_iters):
        th2 = theta * theta
        f = theta * (1 + th2 * (k0 + th2 * (k1 + th2 * (k2 + th2 * k3)))) - r_d
        fp = 1 + th2 * (3 * k0 + th2 * (5 * k1 + th2 * (7 * k2 + th2 * 9 * k3)))
        theta = theta - f / jnp.where(jnp.abs(fp) < 1e-6, 1e-6, fp)
    small = r_d < 1e-9
    r_safe = jnp.where(small, 1.0, r_d)
    s = jnp.where(small, 0.0, jnp.tan(theta) / r_safe)
    x = jnp.where(small, mx, mx * s)
    y = jnp.where(small, my, my * s)
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


def _kb8_project_jac(params, pc):
    """Analytic d(uv)/d(pc) for KB8 (..., 2, 3).

    Reference: KannalaBrandt8::projectJac (src/CameraModels/KannalaBrandt8.cpp:93).
    """
    fx, fy = params[..., 0], params[..., 1]
    k0, k1, k2, k3 = (params[..., 4 + i] for i in range(4))
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    r2 = jnp.maximum(x * x + y * y, 1e-18)
    r = jnp.sqrt(r2)
    R2 = r2 + z * z
    theta = jnp.arctan2(r, z)
    th2 = theta * theta
    f = theta * (1 + th2 * (k0 + th2 * (k1 + th2 * (k2 + th2 * k3))))
    fp = 1 + th2 * (3 * k0 + th2 * (5 * k1 + th2 * (7 * k2 + th2 * 9 * k3)))
    # d theta / d(x,y,z)
    dth_dx = x * z / (R2 * r)
    dth_dy = y * z / (R2 * r)
    dth_dz = -r / R2
    s = f / r
    # ds/d* = (fp * dth_d* * r - f * dr_d*) / r^2 ; dr_dx = x/r
    ds_dx = (fp * dth_dx * r - f * (x / r)) / r2
    ds_dy = (fp * dth_dy * r - f * (y / r)) / r2
    ds_dz = fp * dth_dz / r
    # u = fx * s * x + cx
    du = jnp.stack([fx * (ds_dx * x + s), fx * ds_dy * x, fx * ds_dz * x], axis=-1)
    dv = jnp.stack([fy * ds_dx * y, fy * (ds_dy * y + s), fy * ds_dz * y], axis=-1)
    return jnp.stack([du, dv], axis=-2)


# ---------- dispatch (static on Camera.kind) ----------

def project(cam: Camera, pc):
    if cam.kind == PINHOLE:
        return _pinhole_project(cam.params, pc)
    return _kb8_project(cam.params, pc)


def unproject(cam: Camera, uv):
    if cam.kind == PINHOLE:
        return _pinhole_unproject(cam.params, uv)
    return _kb8_unproject(cam.params, uv)


def project_jac(cam: Camera, pc):
    if cam.kind == PINHOLE:
        return _pinhole_project_jac(cam.params, pc)
    return _kb8_project_jac(cam.params, pc)


def project_np(cam: Camera, pc):
    """Numpy projection for small host-side gating math (no device dispatch,
    no recompiles on varying candidate counts). pc: (N, 3) numpy."""
    import numpy as np

    p = np.asarray(cam.params)
    if cam.kind == PINHOLE:
        z = pc[..., 2]
        zs = np.where(np.abs(z) < _Z_EPS, _Z_EPS, z)
        return np.stack(
            [p[0] * pc[..., 0] / zs + p[2], p[1] * pc[..., 1] / zs + p[3]], axis=-1
        )
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    r = np.sqrt(np.maximum(x * x + y * y, 1e-18))
    theta = np.arctan2(r, z)
    th2 = theta * theta
    r_theta = theta * (1 + th2 * (p[4] + th2 * (p[5] + th2 * (p[6] + th2 * p[7]))))
    scale = np.where(r < 1e-6, 0.0, r_theta / np.where(r < 1e-6, 1.0, r))
    return np.stack([p[0] * scale * x + p[2], p[1] * scale * y + p[3]], axis=-1)


def unproject_np(cam: Camera, uv):
    """Numpy unprojection (host-side). uv: (N, 2) numpy -> (N, 3) rays."""
    import numpy as np

    p = np.asarray(cam.params)
    if cam.kind == PINHOLE:
        x = (uv[..., 0] - p[2]) / p[0]
        y = (uv[..., 1] - p[3]) / p[1]
        return np.stack([x, y, np.ones_like(x)], axis=-1)
    mx = (uv[..., 0] - p[2]) / p[0]
    my = (uv[..., 1] - p[3]) / p[1]
    r_d = np.sqrt(mx * mx + my * my)
    theta = r_d.copy()
    for _ in range(10):
        th2 = theta * theta
        f = theta * (1 + th2 * (p[4] + th2 * (p[5] + th2 * (p[6] + th2 * p[7])))) - r_d
        fp = 1 + th2 * (3 * p[4] + th2 * (5 * p[5] + th2 * (7 * p[6] + th2 * 9 * p[7])))
        theta = theta - f / np.where(np.abs(fp) < 1e-6, 1e-6, fp)
    small = r_d < 1e-9
    s = np.where(small, 0.0, np.tan(theta) / np.where(small, 1.0, r_d))
    x = np.where(small, mx, mx * s)
    y = np.where(small, my, my * s)
    return np.stack([x, y, np.ones_like(x)], axis=-1)


def in_image(cam: Camera, uv, margin: float = 0.0):
    return (
        (uv[..., 0] >= margin)
        & (uv[..., 0] < cam.width - margin)
        & (uv[..., 1] >= margin)
        & (uv[..., 1] < cam.height - margin)
    )
