"""ORB feature extraction pipeline.

TPU-native replacement for ORBextractor::operator() (reference:
src/ORBextractor.cc:1086): 8-level pyramid (scale 1.2), FAST per ~35px cell
with 20->7 threshold fallback, spatially-balanced selection, intensity-
centroid orientation, Gaussian blur + 256-bit steered BRIEF.

TPU-first: every level is one dense fused pass (no per-cell loops); selection
is reshape+top_k; all outputs are fixed-capacity arrays with a validity mask
so downstream stays jit-static. The whole extractor jits into a single
dispatch per image shape.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.brief import GATHER_R, brief_from_patches
from ..ops.fast import fast_score_maps, nonmax_3x3
from ..ops.image import build_pyramid, gaussian_blur
from ..ops.orientation import _patches_from_padded, ic_angles_from_patches
from ..ops.select import cell_topk, global_topk

EDGE = 19  # reference: EDGE_THRESHOLD=19 border margin


class ExtractorConfig(NamedTuple):
    n_features: int = 1000
    n_levels: int = 8
    scale: float = 1.2
    ini_th: float = 20.0
    min_th: float = 7.0
    cell: int = 35
    k_per_cell: int = 4


class Features(NamedTuple):
    """Fixed-capacity per-image feature set (capacity = cfg.n_features)."""

    uv: jnp.ndarray  # (N, 2) float32, level-0 pixel coords
    desc: jnp.ndarray  # (N, 8) uint32 packed BRIEF-256
    angle: jnp.ndarray  # (N,) float32 radians
    level: jnp.ndarray  # (N,) int32 pyramid octave
    response: jnp.ndarray  # (N,) float32
    valid: jnp.ndarray  # (N,) bool

    @property
    def capacity(self):
        return self.uv.shape[0]


def level_budgets(cfg: ExtractorConfig):
    """Per-level feature counts, geometric split as the reference ctor
    (src/ORBextractor.cc:409 region: factor 1/1.2 per level, remainder to
    the coarsest level)."""
    inv = 1.0 / cfg.scale
    n_desired = cfg.n_features * (1 - inv) / (1 - inv**cfg.n_levels)
    budgets = []
    acc = 0
    for lvl in range(cfg.n_levels - 1):
        b = int(round(n_desired * inv**lvl))
        budgets.append(b)
        acc += b
    budgets.append(max(cfg.n_features - acc, 0))
    return budgets


@functools.partial(jax.jit, static_argnums=(1,))
def extract(img, cfg: ExtractorConfig = ExtractorConfig()):
    """img: (H, W) float32 grayscale in [0, 255] -> Features."""
    pyr = build_pyramid(img, cfg.n_levels, cfg.scale)
    budgets = level_budgets(cfg)
    uvs, descs, angs, lvls, resps, valids = [], [], [], [], [], []
    for lvl, im in enumerate(pyr):
        budget = budgets[lvl]
        if budget == 0 or min(im.shape) <= 2 * EDGE + 7:
            continue
        r_hi, r_lo = fast_score_maps(im, cfg.ini_th, cfg.min_th)
        r_hi = nonmax_3x3(r_hi)
        r_lo = nonmax_3x3(r_lo)
        # mask off the EDGE border (descriptor patch must fit)
        h, w = im.shape
        ys_g = jnp.arange(h)[:, None]
        xs_g = jnp.arange(w)[None, :]
        border_ok = (
            (ys_g >= EDGE) & (ys_g < h - EDGE) & (xs_g >= EDGE) & (xs_g < w - EDGE)
        )
        r_hi = jnp.where(border_ok, r_hi, 0.0)
        r_lo = jnp.where(border_ok, r_lo, 0.0)
        ys, xs, sc = cell_topk(r_hi, r_lo, cfg.cell, cfg.k_per_cell)
        ys, xs, sc, ok = global_topk(ys, xs, sc, budget)
        ys = ys.astype(jnp.int32)
        xs = xs.astype(jnp.int32)
        # one shared patch gather feeds orientation AND descriptor: blurred
        # (GATHER_R-padded) 39x39 windows. Deviation from the reference,
        # which computes IC angles on the raw level image — moments of the
        # blurred patch are equivalent up to the blur's smoothing and keep
        # the whole level at a single gather.
        blurred = gaussian_blur(im)
        padded = jnp.pad(blurred, GATHER_R)
        patches = _patches_from_padded(padded, ys, xs, 2 * GATHER_R + 1)
        ang = ic_angles_from_patches(patches)
        d = brief_from_patches(patches, ang)
        s = cfg.scale**lvl
        uvs.append(jnp.stack([xs.astype(jnp.float32) * s, ys.astype(jnp.float32) * s], -1))
        descs.append(d)
        angs.append(ang)
        lvls.append(jnp.full((budget,), lvl, jnp.int32))
        resps.append(sc)
        valids.append(ok)
    return Features(
        uv=jnp.concatenate(uvs, 0),
        desc=jnp.concatenate(descs, 0),
        angle=jnp.concatenate(angs, 0),
        level=jnp.concatenate(lvls, 0),
        response=jnp.concatenate(resps, 0),
        valid=jnp.concatenate(valids, 0),
    )


def extract_batch(imgs, cfg: ExtractorConfig = ExtractorConfig()):
    """Batched extraction: imgs (B, H, W) float32 -> Features with a leading
    batch axis on every field. One dispatch for the whole chunk."""
    return jax.vmap(lambda im: extract(im, cfg))(imgs)
