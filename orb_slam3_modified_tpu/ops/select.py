"""Spatially-balanced keypoint selection.

TPU-native substitute for ORBextractor::DistributeOctTree (reference:
src/ORBextractor.cc:555): the reference builds a recursive quadtree and keeps
the best corner per leaf. Dynamic trees don't map to XLA; the idiomatic
equivalent with the same goal (spatial uniformity + best-response preference)
is per-cell top-k over a fixed grid, followed by a global response top-K.
Deterministic, fixed-shape, one reduction per level.
"""
from __future__ import annotations

import jax.numpy as jnp


def pad_to_multiple(resp, cell: int):
    h, w = resp.shape
    ph = (-h) % cell
    pw = (-w) % cell
    if ph or pw:
        resp = jnp.pad(resp, ((0, ph), (0, pw)))
    return resp


def cell_topk(resp_hi, resp_lo, cell: int, k_per_cell: int = 4):
    """Per-cell best corners with high->low threshold fallback.

    resp_hi / resp_lo: (H, W) response maps at iniThFAST / minThFAST
    (reference behavior: a cell falls back to the low threshold only when the
    high threshold finds nothing, src/ORBextractor.cc:826-839).

    Returns (ys, xs, scores): (n_cells * k_per_cell,) arrays; score 0 marks
    invalid slots.
    """
    resp_hi = pad_to_multiple(resp_hi, cell)
    resp_lo = pad_to_multiple(resp_lo, cell)
    h, w = resp_hi.shape
    gh, gw = h // cell, w // cell
    hi = resp_hi.reshape(gh, cell, gw, cell).transpose(0, 2, 1, 3).reshape(gh, gw, -1)
    lo = resp_lo.reshape(gh, cell, gw, cell).transpose(0, 2, 1, 3).reshape(gh, gw, -1)
    cell_has_hi = jnp.max(hi, axis=-1) > 0.0
    use = jnp.where(cell_has_hi[..., None], hi, lo)
    scores, idx = top_k_lastdim(use, k_per_cell)
    dy = idx // cell
    dx = idx % cell
    cy = jnp.arange(gh)[:, None, None] * cell
    cx = jnp.arange(gw)[None, :, None] * cell
    ys = (cy + dy).reshape(-1)
    xs = (cx + dx).reshape(-1)
    return ys, xs, scores.reshape(-1)


def top_k_lastdim(x, k):
    import jax.lax as lax

    vals, idx = lax.top_k(x, k)
    return vals, idx


def global_topk(ys, xs, scores, k: int):
    """Keep the k best by score; returns fixed-size (k,) arrays + valid mask."""
    import jax.lax as lax

    vals, idx = lax.top_k(scores, k)
    return ys[idx], xs[idx], vals, vals > 0.0
