"""Robust kernels as IRLS weights.

TPU-native replacement for g2o's RobustKernelHuber (reference:
Thirdparty/g2o/g2o/core/robust_kernel_impl.cpp) — in a batched IRLS solver a
robust kernel is just a per-residual weight multiplier.

Chi-square thresholds follow the reference (src/Optimizer.cc:880-885):
mono 5.991 (2 dof), stereo 7.815 (3 dof).
"""
from __future__ import annotations

import jax.numpy as jnp

CHI2_MONO = 5.991
CHI2_STEREO = 7.815
DELTA_MONO = CHI2_MONO**0.5
DELTA_STEREO = CHI2_STEREO**0.5


def huber_weight(chi2, delta: float):
    """IRLS weight for the Huber kernel given squared error chi2.

    rho'(e2): weight = 1 for |e| <= delta, delta/|e| beyond.
    """
    e = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    return jnp.where(e <= delta, 1.0, delta / e)
