"""Pallas TPU kernels for the matching hot path.

The (N1, N2) Hamming-distance matrix is the most-executed kernel in the
framework (every tracking step, triangulation search, loop verification —
reference equivalent: the popcount loop in ORBmatcher::DescriptorDistance,
src/ORBmatcher.cc:2058, executed inside O(N1*N2) match loops).

XLA's default lowering materializes the (N1, N2, 8) XOR tensor in HBM; this
kernel tiles descriptors into VMEM and accumulates popcounts per (128, 128)
output tile, so each descriptor word is read once per tile row/column and
the intermediate never touches HBM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # pallas is TPU/GPU-only; CPU tests use the jnp fallback
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

TILE = 128


def _hamming_kernel(d1_ref, d2_ref, out_ref):
    """One (TILE, TILE) output tile: d1 (TILE, 8) vs d2 (TILE, 8) uint32."""
    a = d1_ref[:]  # (TILE, 8)
    b = d2_ref[:]  # (TILE, 8)
    acc = jnp.zeros((TILE, TILE), jnp.int32)
    for w in range(8):  # unrolled over descriptor words
        x = jax.lax.bitwise_xor(a[:, w : w + 1], b[:, w : w + 1].T)  # (T, T)
        acc = acc + jax.lax.population_count(x).astype(jnp.int32)
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnums=())
def hamming_matrix_pallas(d1, d2):
    """(N1, 8) x (N2, 8) uint32 -> (N1, N2) int32. N1, N2 must be multiples
    of 128 (callers pad; every fixed-capacity buffer here already is)."""
    n1, n2 = d1.shape[0], d2.shape[0]
    grid = (n1 // TILE, n2 // TILE)
    return pl.pallas_call(
        _hamming_kernel,
        out_shape=jax.ShapeDtypeStruct((n1, n2), jnp.int32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((TILE, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE, 8), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (TILE, TILE), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
        ),
    )(d1, d2)


def hamming_matrix_auto(d1, d2):
    """Use the pallas kernel when shapes tile cleanly on a TPU backend,
    else the XLA fallback (ops/hamming.py)."""
    from .hamming import hamming_matrix

    if (
        _HAS_PALLAS
        and d1.shape[0] % TILE == 0
        and d2.shape[0] % TILE == 0
        and jax.default_backend() not in ("cpu",)
    ):
        return hamming_matrix_pallas(d1, d2)
    return hamming_matrix(d1, d2)
