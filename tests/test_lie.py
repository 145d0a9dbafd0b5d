"""Property tests for the lie-group module (SURVEY.md §4: lie-group identities)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

from orb_slam3_modified_tpu.lie import SE3, Sim3, se3, sim3, so3

KEY = jax.random.PRNGKey(0)


def rand_w(key, n=64, scale=2.0):
    return jax.random.normal(key, (n, 3)) * scale


class TestSO3:
    def test_exp_matches_scipy(self):
        w = np.asarray(rand_w(KEY))
        R = np.asarray(so3.exp(jnp.asarray(w)))
        R_ref = ScipyRot.from_rotvec(w).as_matrix()
        np.testing.assert_allclose(R, R_ref, atol=1e-5)

    def test_exp_log_roundtrip(self):
        w = rand_w(KEY)
        w2 = so3.log(so3.exp(w))
        np.testing.assert_allclose(np.asarray(so3.exp(w2)), np.asarray(so3.exp(w)), atol=1e-5)

    def test_log_small_angle(self):
        w = rand_w(KEY, scale=1e-5)
        np.testing.assert_allclose(np.asarray(so3.log(so3.exp(w))), np.asarray(w), atol=1e-7)

    def test_log_near_pi(self):
        axes = np.array(rand_w(KEY, 32, 1.0))
        axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
        w = jnp.asarray(axes * (np.pi - 1e-4))
        R = so3.exp(w)
        w2 = so3.log(R)
        np.testing.assert_allclose(np.asarray(so3.exp(w2)), np.asarray(R), atol=2e-4)

    def test_orthogonality(self):
        R = so3.exp(rand_w(KEY))
        I = jnp.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(np.asarray(I), np.eye(3)[None].repeat(64, 0), atol=1e-5)

    def test_left_jacobian_fd(self):
        """J_l: exp(w + dw) ~= exp(J_l dw) exp(w)."""
        w = np.asarray(rand_w(KEY, 8, 1.0))
        dw = 1e-4 * np.random.default_rng(0).standard_normal((8, 3))
        lhs = np.asarray(so3.exp(jnp.asarray(w + dw)))
        Jl = np.asarray(so3.left_jacobian(jnp.asarray(w)))
        pert = np.einsum("nij,nj->ni", Jl, dw)
        rhs = np.asarray(so3.exp(jnp.asarray(pert))) @ np.asarray(so3.exp(jnp.asarray(w)))
        np.testing.assert_allclose(lhs, rhs, atol=1e-5)

    def test_jacobian_inverses(self):
        w = rand_w(KEY, 16, 1.5)
        I = so3.left_jacobian(w) @ so3.left_jacobian_inv(w)
        np.testing.assert_allclose(np.asarray(I), np.eye(3)[None].repeat(16, 0), atol=1e-4)
        I = so3.right_jacobian(w) @ so3.right_jacobian_inv(w)
        np.testing.assert_allclose(np.asarray(I), np.eye(3)[None].repeat(16, 0), atol=1e-4)

    def test_quat_roundtrip(self):
        R = so3.exp(rand_w(KEY))
        R2 = so3.mat_from_quat(so3.quat_from_mat(R))
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)

    def test_normalize_projects(self):
        R = so3.exp(rand_w(KEY, 16))
        noisy = R + 1e-3 * jax.random.normal(jax.random.PRNGKey(1), R.shape)
        Rn = so3.normalize(noisy)
        I = jnp.einsum("nij,nkj->nik", Rn, Rn)
        np.testing.assert_allclose(np.asarray(I), np.eye(3)[None].repeat(16, 0), atol=1e-4)

    def test_jit_grad(self):
        f = jax.jit(lambda w: jnp.sum(so3.exp(w)))
        g = jax.grad(f)(jnp.array([0.1, -0.2, 0.3]))
        assert np.all(np.isfinite(np.asarray(g)))
        g0 = jax.grad(f)(jnp.zeros(3))
        assert np.all(np.isfinite(np.asarray(g0)))


class TestSE3:
    def test_exp_log_roundtrip(self):
        xi = jax.random.normal(KEY, (32, 6))
        T = se3.exp(xi)
        xi2 = se3.log(T)
        T2 = se3.exp(xi2)
        np.testing.assert_allclose(np.asarray(T2.R), np.asarray(T.R), atol=1e-5)
        np.testing.assert_allclose(np.asarray(T2.t), np.asarray(T.t), atol=1e-4)

    def test_compose_inverse(self):
        xi = jax.random.normal(KEY, (32, 6))
        T = se3.exp(xi)
        I = T @ T.inverse()
        np.testing.assert_allclose(np.asarray(I.R), np.eye(3)[None].repeat(32, 0), atol=1e-5)
        np.testing.assert_allclose(np.asarray(I.t), 0, atol=1e-5)

    def test_apply_matches_matrix(self):
        xi = jax.random.normal(KEY, (8, 6))
        T = se3.exp(xi)
        p = jax.random.normal(jax.random.PRNGKey(2), (8, 3))
        ph = jnp.concatenate([p, jnp.ones((8, 1))], axis=-1)
        ref = jnp.einsum("nij,nj->ni", T.matrix(), ph)[..., :3]
        np.testing.assert_allclose(np.asarray(T.apply(p)), np.asarray(ref), atol=1e-5)

    def test_adjoint(self):
        """Ad: T exp(xi) T^-1 == exp(Ad_T xi)."""
        T = se3.exp(jax.random.normal(KEY, (8, 6)))
        xi = 1e-2 * jax.random.normal(jax.random.PRNGKey(3), (8, 6))
        lhs = (T @ se3.exp(xi)) @ T.inverse()
        rhs = se3.exp(jnp.einsum("nij,nj->ni", se3.adjoint(T), xi))
        np.testing.assert_allclose(np.asarray(lhs.R), np.asarray(rhs.R), atol=1e-5)
        np.testing.assert_allclose(np.asarray(lhs.t), np.asarray(rhs.t), atol=1e-4)


class TestSim3:
    def test_exp_log_roundtrip(self):
        xi = jax.random.normal(KEY, (32, 7)) * jnp.array([1, 1, 1, 1, 1, 1, 0.3])
        X = sim3.exp(xi)
        xi2 = sim3.log(X)
        X2 = sim3.exp(xi2)
        np.testing.assert_allclose(np.asarray(X2.s), np.asarray(X.s), atol=1e-4)
        np.testing.assert_allclose(np.asarray(X2.R), np.asarray(X.R), atol=1e-5)
        np.testing.assert_allclose(np.asarray(X2.t), np.asarray(X.t), atol=1e-3)

    def test_zero_is_identity(self):
        X = sim3.exp(jnp.zeros(7))
        np.testing.assert_allclose(np.asarray(X.s), 1.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(X.R), np.eye(3), atol=1e-6)
        np.testing.assert_allclose(np.asarray(X.t), 0.0, atol=1e-6)

    def test_se3_consistency(self):
        """sigma=0 Sim3 exp matches SE3 exp."""
        xi6 = jax.random.normal(KEY, (16, 6))
        xi7 = jnp.concatenate([xi6, jnp.zeros((16, 1))], axis=-1)
        X = sim3.exp(xi7)
        T = se3.exp(xi6)
        np.testing.assert_allclose(np.asarray(X.R), np.asarray(T.R), atol=1e-5)
        np.testing.assert_allclose(np.asarray(X.t), np.asarray(T.t), atol=1e-4)
        np.testing.assert_allclose(np.asarray(X.s), 1.0, atol=1e-6)

    def test_compose_inverse(self):
        xi = jax.random.normal(KEY, (16, 7)) * jnp.array([1, 1, 1, 1, 1, 1, 0.3])
        X = sim3.exp(xi)
        I = X @ X.inverse()
        np.testing.assert_allclose(np.asarray(I.s), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(I.R), np.eye(3)[None].repeat(16, 0), atol=1e-5)
        np.testing.assert_allclose(np.asarray(I.t), 0.0, atol=1e-4)

    def test_apply(self):
        X = Sim3(jnp.array(2.0), so3.exp(jnp.array([0.0, 0.0, jnp.pi / 2])), jnp.array([1.0, 0.0, 0.0]))
        p = jnp.array([1.0, 0.0, 0.0])
        out = X.apply(p)
        np.testing.assert_allclose(np.asarray(out), [1.0, 2.0, 0.0], atol=1e-5)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
