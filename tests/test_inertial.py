"""Inertial-only initialization tests: recover scale, gravity, biases."""
import jax.numpy as jnp
import numpy as np

from orb_slam3_modified_tpu.imu.preintegration import GRAVITY, ImuBias, integrate
from orb_slam3_modified_tpu.lie import so3
from orb_slam3_modified_tpu.optim.inertial import (
    InertialChain,
    inertial_only_optimization,
    inertial_residuals,
)


def circle_sim(n_kf=10, kf_dt=0.5, freq=200.0, radius=1.5, omega=0.8,
               bias_g=None, bias_a=None, seed=0):
    """Body on a horizontal circle, yawing with the motion. Returns
    keyframe states + per-interval IMU measurements."""
    g = np.array([0.0, 0.0, -GRAVITY])
    bias_g = np.zeros(3) if bias_g is None else bias_g
    bias_a = np.zeros(3) if bias_a is None else bias_a

    def state(t):
        c, s = np.cos(omega * t), np.sin(omega * t)
        p = radius * np.array([c, s, 0.0])
        v = radius * omega * np.array([-s, c, 0.0])
        a = -radius * omega**2 * np.array([c, s, 0.0])
        R = np.asarray(so3.exp(jnp.asarray([0.0, 0.0, omega * t])))
        return R, p, v, a

    kf_states = [state(k * kf_dt) for k in range(n_kf)]
    pres = []
    dt = 1.0 / freq
    for k in range(n_kf - 1):
        t0 = k * kf_dt
        n = int(kf_dt * freq)
        accs, gyrs = [], []
        for i in range(n):
            R, p, v, a = state(t0 + i * dt)
            accs.append(R.T @ (a - g) + bias_a)
            gyrs.append(np.array([0.0, 0.0, omega]) + bias_g)
        pre = integrate(
            jnp.asarray(np.array(accs, np.float32)),
            jnp.asarray(np.array(gyrs, np.float32)),
            jnp.full(n, dt, jnp.float32),
            jnp.ones(n, bool),
            ImuBias.zero(),
        )
        pres.append(pre)
    return kf_states, pres


class TestInertialResiduals:
    def test_zero_at_ground_truth(self):
        kf_states, pres = circle_sim()
        chain = InertialChain.from_preintegrated(pres)
        R = jnp.asarray(np.stack([s[0] for s in kf_states]).astype(np.float32))
        p = jnp.asarray(np.stack([s[1] for s in kf_states]).astype(np.float32))
        v = jnp.asarray(np.stack([s[2] for s in kf_states]).astype(np.float32))
        r = inertial_residuals(
            chain, R, p, v, jnp.zeros(3), jnp.zeros(3),
            jnp.array([0.0, 0.0, -GRAVITY]), jnp.asarray(1.0),
        )
        assert float(jnp.abs(r).max()) < 0.02, f"max residual {float(jnp.abs(r).max())}"


class TestInertialInit:
    def _run(self, s_gt=2.5, tilt=(0.3, -0.2), bias_g=None, fix_scale=False):
        kf_states, pres = circle_sim(bias_g=bias_g)
        chain = InertialChain.from_preintegrated(pres)
        # map frame: rotated by R_mg, positions scaled DOWN by s_gt
        R_mg = np.asarray(so3.exp(jnp.asarray([tilt[0], tilt[1], 0.0])))
        R_map = jnp.asarray(
            np.stack([R_mg @ s[0] for s in kf_states]).astype(np.float32)
        )
        p_map = jnp.asarray(
            np.stack([R_mg @ s[1] / s_gt for s in kf_states]).astype(np.float32)
        )
        v0 = jnp.zeros((len(kf_states), 3), jnp.float32)
        res = inertial_only_optimization(
            chain, R_map, p_map, v0, fix_scale, 40
        )
        g_est = np.asarray(res.R_wg @ jnp.array([0.0, 0.0, -GRAVITY]))
        g_map_gt = R_mg @ np.array([0.0, 0.0, -GRAVITY])
        return res, g_est, g_map_gt

    def test_recovers_scale_and_gravity(self):
        res, g_est, g_gt = self._run()
        assert abs(float(res.scale) - 2.5) / 2.5 < 0.02, f"scale {float(res.scale)}"
        cos = g_est @ g_gt / (np.linalg.norm(g_est) * np.linalg.norm(g_gt))
        assert cos > 0.9995, f"gravity dir cos {cos}"

    def test_recovers_gyro_bias(self):
        bg = np.array([0.02, -0.015, 0.01])
        res, _, _ = self._run(bias_g=bg)
        np.testing.assert_allclose(np.asarray(res.bg), bg, atol=3e-3)

    def test_velocities_recovered(self):
        res, _, _ = self._run()
        kf_states, _ = circle_sim()
        # velocities are in the map frame: v_map = R_mg v_true / 1 (scale
        # applies to positions; optimizer velocities correspond to TRUE scale)
        R_mg = np.asarray(so3.exp(jnp.asarray([0.3, -0.2, 0.0])))
        v_gt = np.stack([R_mg @ s[2] for s in kf_states])
        err = np.linalg.norm(np.asarray(res.v_w) - v_gt, axis=-1)
        assert err.mean() < 0.05, f"velocity err {err.mean()}"
