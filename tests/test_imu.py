"""IMU preintegration tests against analytic ground truth."""
import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_modified_tpu.imu.preintegration import (
    GRAVITY_VEC,
    ImuBias,
    Preintegrated,
    delta_position,
    delta_rotation,
    delta_velocity,
    integrate,
    merge,
    predict_state,
)
from orb_slam3_modified_tpu.lie import so3


def simulate(w_body, a_world, T=0.5, freq=200.0, R0=None, v0=None, bias=None):
    """Constant body rate + constant world acceleration trajectory.

    Returns measurements and the ground-truth delta quantities.
    """
    n = int(T * freq)
    dt = 1.0 / freq
    R0 = np.eye(3) if R0 is None else R0
    v0 = np.zeros(3) if v0 is None else v0
    g = np.asarray(GRAVITY_VEC)
    ts = np.arange(n) * dt
    accs, gyrs = [], []
    R = R0.copy()
    v = v0.copy()
    p = np.zeros(3)
    Rs = [R.copy()]
    vs = [v.copy()]
    ps = [p.copy()]
    for i in range(n):
        # measure at the start of the interval (matches integrator convention)
        a_body = R.T @ (a_world - g)
        accs.append(a_body)
        gyrs.append(w_body)
        # propagate ground truth with fine substeps for accuracy
        sub = 20
        for _ in range(sub):
            h = dt / sub
            p = p + v * h + 0.5 * a_world * h * h
            v = v + a_world * h
            R = R @ np.asarray(so3.exp(jnp.asarray(w_body * h)))
        Rs.append(R.copy())
        vs.append(v.copy())
        ps.append(p.copy())
    accs = np.array(accs, np.float32)
    gyrs = np.array(gyrs, np.float32)
    dts = np.full(n, dt, np.float32)
    # ground-truth deltas (Forster defs): dR = R0^T R(T)
    dR_gt = R0.T @ R
    dV_gt = R0.T @ (v - v0 - g * T)
    dP_gt = R0.T @ (p - v0 * T - 0.5 * g * T * T)
    if bias is not None:
        accs = accs + bias[3:]
        gyrs = gyrs + bias[:3]
    return accs, gyrs, dts, (dR_gt, dV_gt, dP_gt), (R, v, p)


class TestPreintegration:
    def test_static_gravity_only(self):
        """Stationary IMU: dV = -R^T g t integrated; dR = I."""
        accs, gyrs, dts, (dR, dV, dP), _ = simulate(
            np.zeros(3), np.zeros(3), T=0.5
        )
        pre = integrate(
            jnp.asarray(accs), jnp.asarray(gyrs), jnp.asarray(dts),
            jnp.ones(len(dts), bool), ImuBias.zero(),
        )
        np.testing.assert_allclose(np.asarray(pre.dR), dR, atol=1e-5)
        np.testing.assert_allclose(np.asarray(pre.dV), dV, atol=1e-3)
        np.testing.assert_allclose(np.asarray(pre.dP), dP, atol=1e-3)

    def test_rotation_and_accel(self):
        accs, gyrs, dts, (dR, dV, dP), _ = simulate(
            np.array([0.3, -0.5, 0.8]), np.array([0.5, 0.2, -0.3]), T=0.5
        )
        pre = integrate(
            jnp.asarray(accs), jnp.asarray(gyrs), jnp.asarray(dts),
            jnp.ones(len(dts), bool), ImuBias.zero(),
        )
        np.testing.assert_allclose(np.asarray(pre.dR), dR, atol=2e-3)
        np.testing.assert_allclose(np.asarray(pre.dV), dV, atol=2e-2)
        np.testing.assert_allclose(np.asarray(pre.dP), dP, atol=1e-2)

    def test_padding_mask(self):
        accs, gyrs, dts, (dR, dV, dP), _ = simulate(
            np.array([0.1, 0.2, -0.1]), np.array([0.3, 0, 0]), T=0.25
        )
        n = len(dts)
        pad = 32
        accs_p = np.concatenate([accs, np.full((pad, 3), 99.0, np.float32)])
        gyrs_p = np.concatenate([gyrs, np.full((pad, 3), 99.0, np.float32)])
        dts_p = np.concatenate([dts, np.full(pad, 1.0, np.float32)])
        valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
        pre = integrate(
            jnp.asarray(accs_p), jnp.asarray(gyrs_p), jnp.asarray(dts_p),
            jnp.asarray(valid), ImuBias.zero(),
        )
        np.testing.assert_allclose(float(pre.dT), 0.25, atol=1e-5)
        np.testing.assert_allclose(np.asarray(pre.dR), dR, atol=2e-3)

    def test_bias_jacobian_vs_reintegration(self):
        """First-order bias correction must match re-integration with the
        new bias (SURVEY.md §4 property test)."""
        w = np.array([0.2, -0.4, 0.6])
        a = np.array([0.3, 0.1, -0.2])
        accs, gyrs, dts, _, _ = simulate(w, a, T=0.4)
        v = jnp.ones(len(dts), bool)
        pre0 = integrate(jnp.asarray(accs), jnp.asarray(gyrs), jnp.asarray(dts), v, ImuBias.zero())
        db = np.array([3e-3, -2e-3, 1e-3, 5e-3, -4e-3, 2e-3], np.float32)
        new_bias = ImuBias(jnp.asarray(db[:3]), jnp.asarray(db[3:]))
        # corrected deltas via jacobians
        dR_c = np.asarray(delta_rotation(pre0, new_bias))
        dV_c = np.asarray(delta_velocity(pre0, new_bias))
        dP_c = np.asarray(delta_position(pre0, new_bias))
        # re-integrate with measurements minus the new bias
        pre1 = integrate(
            jnp.asarray(accs), jnp.asarray(gyrs), jnp.asarray(dts), v, new_bias
        )
        np.testing.assert_allclose(dR_c, np.asarray(pre1.dR), atol=5e-4)
        np.testing.assert_allclose(dV_c, np.asarray(pre1.dV), atol=5e-3)
        np.testing.assert_allclose(dP_c, np.asarray(pre1.dP), atol=5e-3)

    def test_predict_state(self):
        w = np.array([0.1, 0.3, -0.2])
        a = np.array([0.4, -0.1, 0.2])
        R0 = np.asarray(so3.exp(jnp.asarray(np.array([0.1, 0.2, 0.3]))))
        v0 = np.array([0.5, -0.2, 0.1])
        accs, gyrs, dts, _, (R_end, v_end, p_end) = simulate(w, a, T=0.5, R0=R0, v0=v0)
        pre = integrate(
            jnp.asarray(accs), jnp.asarray(gyrs), jnp.asarray(dts),
            jnp.ones(len(dts), bool), ImuBias.zero(),
        )
        R_p, v_p, p_p = predict_state(
            jnp.asarray(R0.astype(np.float32)), jnp.asarray(v0.astype(np.float32)),
            jnp.zeros(3), pre, ImuBias.zero(),
        )
        np.testing.assert_allclose(np.asarray(R_p), R_end, atol=3e-3)
        np.testing.assert_allclose(np.asarray(v_p), v_end, atol=2e-2)
        np.testing.assert_allclose(np.asarray(p_p), p_end, atol=1e-2)

    def test_merge_matches_full(self):
        w = np.array([0.2, -0.1, 0.4])
        a = np.array([0.1, 0.3, -0.2])
        accs, gyrs, dts, _, _ = simulate(w, a, T=0.5)
        n = len(dts)
        h = n // 2
        vmask = jnp.ones(n, bool)
        full = integrate(jnp.asarray(accs), jnp.asarray(gyrs), jnp.asarray(dts), vmask, ImuBias.zero())
        p1 = integrate(jnp.asarray(accs[:h]), jnp.asarray(gyrs[:h]), jnp.asarray(dts[:h]), jnp.ones(h, bool), ImuBias.zero())
        p2 = integrate(jnp.asarray(accs[h:]), jnp.asarray(gyrs[h:]), jnp.asarray(dts[h:]), jnp.ones(n - h, bool), ImuBias.zero())
        m = merge(p1, p2)
        np.testing.assert_allclose(np.asarray(m.dR), np.asarray(full.dR), atol=1e-5)
        np.testing.assert_allclose(np.asarray(m.dV), np.asarray(full.dV), atol=1e-4)
        np.testing.assert_allclose(np.asarray(m.dP), np.asarray(full.dP), atol=1e-4)

    def test_covariance_grows(self):
        accs, gyrs, dts, _, _ = simulate(np.zeros(3), np.zeros(3), T=0.5)
        pre = integrate(
            jnp.asarray(accs), jnp.asarray(gyrs), jnp.asarray(dts),
            jnp.ones(len(dts), bool), ImuBias.zero(),
        )
        C = np.asarray(pre.C)
        assert np.all(np.diag(C)[:9] > 0)
        # symmetric PSD-ish
        np.testing.assert_allclose(C, C.T, atol=1e-10)
