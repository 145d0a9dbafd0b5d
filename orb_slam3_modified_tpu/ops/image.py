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
    """Separable Gaussian blur with reflect padding, (H, W) float32."""
    k = jnp.asarray(_gauss_kernel1d(ksize, sigma))
    r = ksize // 2

    def conv1d(a, axis):
        a2 = jnp.pad(a, ((r, r), (0, 0)) if axis == 0 else ((0, 0), (r, r)), mode="reflect")
        if axis == 0:
            kern = k[:, None, None, None]  # (kh, kw, in, out)
            a4 = a2[None, :, :, None]
            out = jax.lax.conv_general_dilated(
                a4, kern, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
        else:
            kern = k[None, :, None, None]
            a4 = a2[None, :, :, None]
            out = jax.lax.conv_general_dilated(
                a4, kern, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
        return out[0, :, :, 0]

    return conv1d(conv1d(img, 0), 1)
