"""Micro-benchmark Hamming-distance-matrix strategies on the real chip.

Candidates:
- xla:      XOR + popcount over (N1, N2, 8) (current ops/hamming.py)
- pallas:   (128,128)-tiled VPU popcount kernel (ops/pallas_kernels.py)
- mxu_pm1:  d = (256 - a.b)/2 with a,b in {-1,+1}^256 bf16 -> MXU matmul
- mxu_int8: d = wa + wb - 2 a.b with a,b in {0,1}^256 int8 -> MXU matmul
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import orb_slam3_modified_tpu  # noqa: F401
import jax
import jax.numpy as jnp


def unpack_bits(d):
    """(N, 8) uint32 -> (N, 256) float/int bit matrix."""
    w = d[:, :, None]  # (N, 8, 1)
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    bits = (w >> shifts) & jnp.uint32(1)
    return bits.reshape(d.shape[0], 256)


def ham_xla(d1, d2):
    x = jnp.bitwise_xor(d1[:, None, :], d2[None, :, :])
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


def ham_mxu_pm1(d1, d2):
    a = unpack_bits(d1).astype(jnp.bfloat16) * 2 - 1
    b = unpack_bits(d2).astype(jnp.bfloat16) * 2 - 1
    dot = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    return ((256 - dot) * 0.5).astype(jnp.int32)


def ham_mxu_int8(d1, d2):
    a = unpack_bits(d1).astype(jnp.int8)
    b = unpack_bits(d2).astype(jnp.int8)
    dot = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )
    wa = jnp.sum(jax.lax.population_count(d1), axis=-1).astype(jnp.int32)
    wb = jnp.sum(jax.lax.population_count(d2), axis=-1).astype(jnp.int32)
    return wa[:, None] + wb[None, :] - 2 * dot


def bench(name, fn, d1, d2, n=20):
    """Time n applications INSIDE one jit (lax.scan) so tunnel dispatch
    latency amortizes away; reports pure device time per application."""

    @jax.jit
    def many(d1, d2):
        def body(c, x):
            # fold the iteration index in so XLA cannot CSE the loop body
            out = fn(jnp.bitwise_xor(d1, x), d2)
            return c + out[0, 0], None

        c, _ = jax.lax.scan(
            body, jnp.int32(0), jnp.arange(n, dtype=jnp.uint32)[:, None, None]
        )
        return c

    jax.block_until_ready(many(d1, d2))
    t0 = time.perf_counter()
    jax.block_until_ready(many(d1, d2))
    dt = (time.perf_counter() - t0) / n
    print(f"  {name:10s}: {dt*1e3:8.3f} ms/apply")
    out = jax.block_until_ready(jax.jit(fn)(d1, d2))
    return np.asarray(out)


def main():
    rng = np.random.default_rng(0)
    for n1, n2 in [(4096, 1024)]:
        d1 = jnp.asarray(rng.integers(0, 2**32, (n1, 8), dtype=np.uint32))
        d2 = jnp.asarray(rng.integers(0, 2**32, (n2, 8), dtype=np.uint32))
        print(f"shape ({n1}, 8) x ({n2}, 8):")
        ref = bench("xla", ham_xla, d1, d2)
        try:
            from orb_slam3_modified_tpu.ops.pallas_kernels import (
                hamming_matrix_pallas,
            )

            out = bench("pallas", hamming_matrix_pallas, d1, d2)
            assert (out == ref).all(), "pallas mismatch"
        except Exception as e:
            print(f"  pallas    : FAILED {type(e).__name__}: {e}")
        out = bench("mxu_pm1", ham_mxu_pm1, d1, d2)
        assert (out == ref).all(), f"pm1 mismatch {np.abs(out-ref).max()}"
        out = bench("mxu_int8", ham_mxu_int8, d1, d2)
        assert (out == ref).all(), "int8 mismatch"


if __name__ == "__main__":
    main()
