"""Pallas kernel equivalence tests (interpreter mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam3_modified_tpu.ops.hamming import hamming_matrix


def _pallas_interpret_hamming(d1, d2):
    """Run the tiled kernel in interpreter mode for CPU validation."""
    try:
        from jax.experimental import pallas as pl

        from orb_slam3_modified_tpu.ops.pallas_kernels import TILE, _hamming_kernel
    except Exception:
        pytest.skip("pallas unavailable")
    n1, n2 = d1.shape[0], d2.shape[0]
    return pl.pallas_call(
        _hamming_kernel,
        out_shape=jax.ShapeDtypeStruct((n1, n2), jnp.int32),
        grid_spec=pl.GridSpec(
            grid=(n1 // TILE, n2 // TILE),
            in_specs=[
                pl.BlockSpec((TILE, 8), lambda i, j: (i, 0)),
                pl.BlockSpec((TILE, 8), lambda i, j: (j, 0)),
            ],
            out_specs=pl.BlockSpec((TILE, TILE), lambda i, j: (i, j)),
        ),
        interpret=True,
    )(d1, d2)


class TestPallasHamming:
    def test_matches_xla(self):
        rng = np.random.default_rng(0)
        d1 = jnp.asarray(rng.integers(0, 2**32, (128, 8), dtype=np.uint32))
        d2 = jnp.asarray(rng.integers(0, 2**32, (256, 8), dtype=np.uint32))
        ref = np.asarray(hamming_matrix(d1, d2))
        out = np.asarray(_pallas_interpret_hamming(d1, d2))
        np.testing.assert_array_equal(out, ref)

    def test_zero_distance_diagonal(self):
        rng = np.random.default_rng(1)
        d = jnp.asarray(rng.integers(0, 2**32, (128, 8), dtype=np.uint32))
        out = np.asarray(_pallas_interpret_hamming(d, d))
        assert (np.diag(out) == 0).all()
