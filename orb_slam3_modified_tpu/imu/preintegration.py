"""IMU preintegration (Forster et al. style, float32).

TPU-native replacement for IMU::Preintegrated (reference:
include/ImuTypes.h:129-240, src/ImuTypes.cc:177 IntegrateNewMeasurement):
delta rotation/velocity/position between frames, 15x15 covariance, bias
jacobians, first-order bias-corrected getters, and re-integration.

TPU-first: measurements are integrated with one lax.scan over the sample
batch (the reference integrates sample-by-sample inside the tracker thread);
the scan carry holds (dR, dV, dP, J*, C) so the whole preintegration of a
frame gap is a single fused device program. Gravity constant and noise model
match the reference (GRAVITY_VALUE=9.81, include/ImuTypes.h:43).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..lie import so3

GRAVITY = 9.81
GRAVITY_VEC = jnp.array([0.0, 0.0, -GRAVITY], jnp.float32)


class ImuCalib(NamedTuple):
    """Reference: IMU::Calib (include/ImuTypes.h:92)."""

    R_bc: jnp.ndarray  # (3, 3) camera-to-body rotation
    t_bc: jnp.ndarray  # (3,)
    noise_gyro: float = 1.7e-4  # rad/s/sqrt(Hz)
    noise_acc: float = 2.0e-3  # m/s^2/sqrt(Hz)
    walk_gyro: float = 1.9e-5
    walk_acc: float = 3.0e-3
    freq: float = 200.0


class ImuBias(NamedTuple):
    """gyro + accel bias. Reference: IMU::Bias (include/ImuTypes.h:62)."""

    bg: jnp.ndarray  # (3,)
    ba: jnp.ndarray  # (3,)

    @staticmethod
    def zero():
        return ImuBias(jnp.zeros(3, jnp.float32), jnp.zeros(3, jnp.float32))


class Preintegrated(NamedTuple):
    """Accumulated deltas between two frames/keyframes.

    Mirrors IMU::Preintegrated's state (include/ImuTypes.h:188-206): dT, dR,
    dV, dP, C (15x15: [rot, vel, pos, bg, ba]), bias jacobians, and the
    original bias used for integration.
    """

    dT: jnp.ndarray  # () total time
    dR: jnp.ndarray  # (3, 3)
    dV: jnp.ndarray  # (3,)
    dP: jnp.ndarray  # (3,)
    C: jnp.ndarray  # (15, 15) covariance
    JRg: jnp.ndarray  # (3, 3) d dR / d bg
    JVg: jnp.ndarray  # (3, 3)
    JVa: jnp.ndarray  # (3, 3)
    JPg: jnp.ndarray  # (3, 3)
    JPa: jnp.ndarray  # (3, 3)
    bias: ImuBias  # linearization bias
    avg_a: jnp.ndarray  # (3,) average specific force (for init gravity dir)
    avg_w: jnp.ndarray  # (3,)

    @staticmethod
    def identity(bias: ImuBias | None = None):
        z3 = jnp.zeros((3, 3), jnp.float32)
        return Preintegrated(
            dT=jnp.asarray(0.0, jnp.float32),
            dR=jnp.eye(3, dtype=jnp.float32),
            dV=jnp.zeros(3, jnp.float32),
            dP=jnp.zeros(3, jnp.float32),
            C=jnp.zeros((15, 15), jnp.float32),
            JRg=z3, JVg=z3, JVa=z3, JPg=z3, JPa=z3,
            bias=bias or ImuBias.zero(),
            avg_a=jnp.zeros(3, jnp.float32),
            avg_w=jnp.zeros(3, jnp.float32),
        )


@partial(jax.jit, static_argnames=())
def integrate(
    acc,  # (N, 3) measured specific force
    gyro,  # (N, 3) measured angular rate
    dts,  # (N,) per-sample integration interval
    valid,  # (N,) bool (padding mask)
    bias: ImuBias,
    noise_gyro: float | jnp.ndarray = 1.7e-4,
    noise_acc: float | jnp.ndarray = 2.0e-3,
    walk_gyro: float | jnp.ndarray = 1.9e-5,
    walk_acc: float | jnp.ndarray = 3.0e-3,
    freq: float | jnp.ndarray = 200.0,
) -> Preintegrated:
    """Integrate a (padded) batch of IMU samples into a Preintegrated.

    Discrete noise: sigma_d = sigma * sqrt(freq) (reference: Calib ctor
    builds Cov = sigma^2 * freq * I, src/ImuTypes.cc Calib::Set).
    """
    ng2 = (noise_gyro**2) * freq
    na2 = (noise_acc**2) * freq
    wg2 = (walk_gyro**2) / freq
    wa2 = (walk_acc**2) / freq
    Nga = jnp.eye(6, dtype=jnp.float32) * jnp.concatenate(
        [jnp.full(3, ng2), jnp.full(3, na2)]
    )

    def step(carry, x):
        pre, sum_a, sum_w, n = carry
        a, w, dt, ok = x
        a_c = a - pre.bias.ba
        w_c = w - pre.bias.bg
        dt2 = dt * dt

        # position/velocity update with CURRENT dR (midpoint as reference)
        dP_new = pre.dP + pre.dV * dt + 0.5 * (pre.dR @ a_c) * dt2
        dV_new = pre.dV + (pre.dR @ a_c) * dt

        # covariance propagation (reference: A/B matrices src/ImuTypes.cc:196)
        hat_a = so3.hat(a_c)
        dRi = so3.exp(w_c * dt)
        Jr = so3.right_jacobian(w_c * dt)
        A = jnp.eye(9, dtype=jnp.float32)
        A = A.at[:3, :3].set(dRi.T)
        A = A.at[3:6, :3].set(-pre.dR @ hat_a * dt)
        A = A.at[6:9, :3].set(-0.5 * pre.dR @ hat_a * dt2)
        A = A.at[6:9, 3:6].set(jnp.eye(3) * dt)
        B = jnp.zeros((9, 6), jnp.float32)
        B = B.at[:3, :3].set(Jr * dt)
        B = B.at[3:6, 3:6].set(pre.dR * dt)
        B = B.at[6:9, 3:6].set(0.5 * pre.dR * dt2)
        C9 = A @ pre.C[:9, :9] @ A.T + B @ Nga @ B.T
        Cw = pre.C[9:, 9:] + jnp.eye(6, dtype=jnp.float32) * jnp.concatenate(
            [jnp.full(3, wg2), jnp.full(3, wa2)]
        ) * dt * freq  # walk variance grows with time: (walk^2/freq)*freq*dt = walk^2*dt
        C_new = pre.C.at[:9, :9].set(C9).at[9:, 9:].set(Cw)

        # bias jacobians (reference: src/ImuTypes.cc:221-229)
        JPa_new = pre.JPa + pre.JVa * dt - 0.5 * pre.dR * dt2
        JPg_new = pre.JPg + pre.JVg * dt - 0.5 * pre.dR @ hat_a @ pre.JRg * dt2
        JVa_new = pre.JVa - pre.dR * dt
        JVg_new = pre.JVg - pre.dR @ hat_a @ pre.JRg * dt
        JRg_new = dRi.T @ pre.JRg - Jr * dt

        dR_new = so3.normalize(pre.dR @ dRi)

        new = Preintegrated(
            dT=pre.dT + dt,
            dR=dR_new, dV=dV_new, dP=dP_new, C=C_new,
            JRg=JRg_new, JVg=JVg_new, JVa=JVa_new, JPg=JPg_new, JPa=JPa_new,
            bias=pre.bias, avg_a=pre.avg_a, avg_w=pre.avg_w,
        )
        # masked update: skip padded samples
        out = jax.tree_util.tree_map(
            lambda n_, o_: jnp.where(ok, n_, o_), new, pre
        )
        sum_a = jnp.where(ok, sum_a + a, sum_a)
        sum_w = jnp.where(ok, sum_w + w, sum_w)
        n = jnp.where(ok, n + 1.0, n)
        return (out, sum_a, sum_w, n), None

    init = (Preintegrated.identity(bias), jnp.zeros(3), jnp.zeros(3), jnp.asarray(0.0))
    (pre, sum_a, sum_w, n), _ = jax.lax.scan(
        step, init, (acc, gyro, dts, valid)
    )
    n = jnp.maximum(n, 1.0)
    return pre._replace(avg_a=sum_a / n, avg_w=sum_w / n)


# ---- bias-corrected getters (reference: src/ImuTypes.cc:283-311) ----

def delta_rotation(pre: Preintegrated, bias: ImuBias):
    db = bias.bg - pre.bias.bg
    return so3.normalize(pre.dR @ so3.exp(pre.JRg @ db))


def delta_velocity(pre: Preintegrated, bias: ImuBias):
    dbg = bias.bg - pre.bias.bg
    dba = bias.ba - pre.bias.ba
    return pre.dV + pre.JVg @ dbg + pre.JVa @ dba


def delta_position(pre: Preintegrated, bias: ImuBias):
    dbg = bias.bg - pre.bias.bg
    dba = bias.ba - pre.bias.ba
    return pre.dP + pre.JPg @ dbg + pre.JPa @ dba


def predict_state(R_wb, v_w, p_w, pre: Preintegrated, bias: ImuBias):
    """Dead-reckon the body state across the preintegrated interval.

    Reference: Tracking::PredictStateIMU (src/Tracking.cc:1741).
    """
    dt = pre.dT
    R_new = R_wb @ delta_rotation(pre, bias)
    v_new = v_w + GRAVITY_VEC * dt + R_wb @ delta_velocity(pre, bias)
    p_new = (
        p_w + v_w * dt + 0.5 * GRAVITY_VEC * dt * dt + R_wb @ delta_position(pre, bias)
    )
    return R_new, v_new, p_new


def merge(pre1: Preintegrated, pre2: Preintegrated) -> Preintegrated:
    """Concatenate two preintegrated intervals (same linearization bias).

    Reference: Preintegrated::MergePrevious (src/ImuTypes.cc:133) — the
    reference replays stored measurements; with matching bias the closed-form
    composition is equivalent and avoids keeping the measurement log.
    """
    dT = pre1.dT + pre2.dT
    dR = so3.normalize(pre1.dR @ pre2.dR)
    dV = pre1.dV + pre1.dR @ pre2.dV
    dP = pre1.dP + pre1.dV * pre2.dT + pre1.dR @ pre2.dP
    # jacobian composition (first-order)
    JRg = pre2.dR.T @ pre1.JRg + pre2.JRg
    JVg = pre1.JVg + pre1.dR @ pre2.JVg - pre1.dR @ so3.hat(pre2.dV) @ pre1.JRg
    JVa = pre1.JVa + pre1.dR @ pre2.JVa
    JPg = (
        pre1.JPg
        + pre1.JVg * pre2.dT
        + pre1.dR @ pre2.JPg
        - pre1.dR @ so3.hat(pre2.dP) @ pre1.JRg
    )
    JPa = pre1.JPa + pre1.JVa * pre2.dT + pre1.dR @ pre2.JPa
    C = pre1.C + pre2.C  # conservative first-order combination
    w1 = pre1.dT / jnp.maximum(dT, 1e-9)
    return Preintegrated(
        dT=dT, dR=dR, dV=dV, dP=dP, C=C,
        JRg=JRg, JVg=JVg, JVa=JVa, JPg=JPg, JPa=JPa,
        bias=pre1.bias,
        avg_a=w1 * pre1.avg_a + (1 - w1) * pre2.avg_a,
        avg_w=w1 * pre1.avg_w + (1 - w1) * pre2.avg_w,
    )
