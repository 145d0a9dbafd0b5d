"""Image-level ops: pyramid construction and separable Gaussian blur.

TPU-native replacement for ORBextractor::ComputePyramid (reference:
src/ORBextractor.cc:1170) and the pre-BRIEF GaussianBlur(7x7, sigma=2)
(reference: src/ORBextractor.cc:1115 region).

Images are float32 (H, W) in [0, 255]. Every function is shape-static and
jit-safe; the pyramid returns a list of per-level arrays (each level shape is
static, so XLA compiles one program per level size).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def pyramid_shapes(h: int, w: int, n_levels: int, scale: float):
    """Static (h, w) per level, mirroring cvRound(h/scale^l)."""
    return [
        (int(round(h / scale**lvl)), int(round(w / scale**lvl)))
        for lvl in range(n_levels)
    ]


def build_pyramid(img, n_levels: int = 8, scale: float = 1.2):
    """Bilinear image pyramid. img: (H, W) float32."""
    h, w = img.shape
    out = [img]
    for lh, lw in pyramid_shapes(h, w, n_levels, scale)[1:]:
        out.append(jax.image.resize(img, (lh, lw), method="bilinear"))
    return out


@functools.lru_cache(maxsize=8)
def _gauss_kernel1d(ksize: int, sigma: float):
    # returns numpy — cached device arrays would leak tracers across traces
    r = ksize // 2
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-(x * x) / (2 * sigma * sigma))
    k /= k.sum()
    return k.astype(np.float32)


def gaussian_blur(img, ksize: int = 7, sigma: float = 2.0):
    """Separable Gaussian blur with reflect padding, (H, W) float32.

    Implemented as 2*ksize shifted static slices + FMAs: single-channel
    convs waste the TPU's channel lanes, while shifted adds stay fused
    elementwise VPU work."""
    k = _gauss_kernel1d(ksize, sigma)
    r = ksize // 2
    h, w = img.shape

    a = jnp.pad(img, ((r, r), (0, 0)), mode="reflect")
    out = k[0] * a[0:h]
    for i in range(1, ksize):
        out = out + k[i] * a[i : i + h]
    a = jnp.pad(out, ((0, 0), (r, r)), mode="reflect")
    out = k[0] * a[:, 0:w]
    for i in range(1, ksize):
        out = out + k[i] * a[:, i : i + w]
    return out
