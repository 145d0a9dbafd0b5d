"""Binary descriptor Hamming distances.

TPU-native replacement for ORBmatcher::DescriptorDistance (reference:
src/ORBmatcher.cc:2058 — the 13-op popcount) and the O(N1*N2) brute-force
loops inside SearchByBoW / SearchForInitialization.

Descriptors are (N, 8) uint32 (256 bits). The full distance matrix is
XOR + population_count + lane reduction — pure VPU work that XLA tiles well;
matmul-free, so precision config is irrelevant.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

MAX_DIST = 256


def hamming_matrix(d1, d2):
    """(N1, 8) x (N2, 8) uint32 -> (N1, N2) int32 Hamming distances."""
    x = jnp.bitwise_xor(d1[:, None, :], d2[None, :, :])
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


def hamming_pairs(d1, d2):
    """Row-wise distances for aligned pairs: (N, 8), (N, 8) -> (N,)."""
    x = jnp.bitwise_xor(d1, d2)
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


def masked_hamming_matrix(d1, valid1, d2, valid2):
    """Distance matrix with invalid rows/cols forced to MAX_DIST."""
    dm = hamming_matrix(d1, d2)
    return jnp.where(
        valid1[:, None] & valid2[None, :], dm, MAX_DIST
    )
