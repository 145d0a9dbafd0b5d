"""Camera model tests: project/unproject roundtrips, jacobians vs autodiff."""
import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_modified_tpu.cameras import (
    Camera,
    project,
    project_jac,
    unproject,
)

PIN = Camera.pinhole(458.654, 457.296, 367.215, 248.375, width=752, height=480)
# EuRoC TUM-VI style fisheye calibration
KB8 = Camera.kb8(
    190.978, 190.973, 254.932, 256.897,
    0.00348238, 0.000715034, -0.00205323, 0.000202936,
    width=512, height=512,
)


def rand_points(n=256, key=0):
    k = jax.random.PRNGKey(key)
    xy = jax.random.normal(k, (n, 2)) * 0.4
    z = jax.random.uniform(jax.random.PRNGKey(key + 1), (n, 1), minval=0.3, maxval=10.0)
    return jnp.concatenate([xy * z, z], axis=-1)


class TestPinhole:
    def test_roundtrip(self):
        pc = rand_points()
        uv = project(PIN, pc)
        ray = unproject(PIN, uv)
        # ray * z should reproduce the point
        rec = ray * pc[..., 2:3]
        np.testing.assert_allclose(np.asarray(rec), np.asarray(pc), rtol=1e-4, atol=1e-4)

    def test_known_value(self):
        uv = project(PIN, jnp.array([0.0, 0.0, 1.0]))
        np.testing.assert_allclose(np.asarray(uv), [367.215, 248.375], atol=1e-4)

    def test_jac_matches_autodiff(self):
        pc = rand_points(32)
        J = project_jac(PIN, pc)
        J_auto = jax.vmap(jax.jacfwd(lambda p: project(PIN, p)))(pc)
        np.testing.assert_allclose(np.asarray(J), np.asarray(J_auto), rtol=1e-3, atol=1e-3)


class TestKB8:
    def test_roundtrip(self):
        pc = rand_points()
        uv = project(KB8, pc)
        ray = unproject(KB8, uv)
        rec = ray * pc[..., 2:3]
        np.testing.assert_allclose(np.asarray(rec), np.asarray(pc), rtol=1e-3, atol=2e-3)

    def test_principal_point(self):
        uv = project(KB8, jnp.array([0.0, 0.0, 2.0]))
        np.testing.assert_allclose(np.asarray(uv), [254.932, 256.897], atol=1e-3)

    def test_wide_angle(self):
        """KB8 handles rays > 90 deg off-axis (fisheye FoV)."""
        pc = jnp.array([2.0, 0.0, 0.5])  # ~76 deg
        uv = project(KB8, pc)
        ray = unproject(KB8, uv)
        rec = ray / ray[2] * pc[2]
        np.testing.assert_allclose(np.asarray(rec), np.asarray(pc), rtol=1e-3, atol=1e-2)

    def test_jac_matches_autodiff(self):
        pc = rand_points(32, key=5)
        J = project_jac(KB8, pc)
        J_auto = jax.vmap(jax.jacfwd(lambda p: project(KB8, p)))(pc)
        np.testing.assert_allclose(np.asarray(J), np.asarray(J_auto), rtol=1e-3, atol=1e-2)
