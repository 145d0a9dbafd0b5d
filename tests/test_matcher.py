"""Matcher tests: synthetic descriptors with known correspondences."""
import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_modified_tpu.features.matcher import (
    mutual_best_match,
    resolve_duplicate_targets,
    rotation_consistency_mask,
    search_by_projection,
    search_for_initialization,
)
from orb_slam3_modified_tpu.ops.hamming import hamming_matrix, hamming_pairs


def random_desc(n, rng):
    return jnp.asarray(rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32))


def flip_bits(desc, n_bits, rng):
    """Flip n_bits random bits in each descriptor."""
    d = np.array(desc)
    for i in range(d.shape[0]):
        for _ in range(n_bits):
            w = rng.integers(0, 8)
            b = rng.integers(0, 32)
            d[i, w] ^= np.uint32(1 << b)
    return jnp.asarray(d)


class TestHamming:
    def test_identical_zero(self):
        rng = np.random.default_rng(0)
        d = random_desc(16, rng)
        assert np.all(np.asarray(hamming_pairs(d, d)) == 0)

    def test_known_flips(self):
        rng = np.random.default_rng(1)
        d = random_desc(16, rng)
        d2 = flip_bits(d, 5, rng)
        dist = np.asarray(hamming_pairs(d, d2))
        assert (dist <= 5).all() and (dist >= 1).all()

    def test_matrix_agrees_with_pairs(self):
        rng = np.random.default_rng(2)
        a, b = random_desc(8, rng), random_desc(8, rng)
        dm = np.asarray(hamming_matrix(a, b))
        for i in range(8):
            for j in range(8):
                d = np.asarray(hamming_pairs(a[i : i + 1], b[j : j + 1]))[0]
                assert dm[i, j] == d


class TestMutualBest:
    def test_perfect_permutation(self):
        rng = np.random.default_rng(3)
        d1 = random_desc(64, rng)
        perm = rng.permutation(64)
        d2 = jnp.asarray(np.array(d1)[perm])
        v = jnp.ones(64, bool)
        idx, ok, dist = mutual_best_match(d1, v, d2, v, max_dist=50)
        assert np.all(np.asarray(ok))
        # idx should invert the permutation
        assert np.array_equal(np.asarray(idx), np.argsort(perm)[np.arange(64)] * 0 + np.array([np.where(perm == i)[0][0] for i in range(64)]))

    def test_noise_tolerance(self):
        rng = np.random.default_rng(4)
        d1 = random_desc(64, rng)
        d2 = flip_bits(d1, 10, rng)
        v = jnp.ones(64, bool)
        idx, ok, dist = mutual_best_match(d1, v, d2, v, max_dist=50)
        frac = np.mean(np.asarray(ok) & (np.asarray(idx) == np.arange(64)))
        assert frac > 0.95

    def test_invalid_masked_out(self):
        rng = np.random.default_rng(5)
        d1 = random_desc(16, rng)
        v1 = jnp.ones(16, bool).at[3].set(False)
        idx, ok, _ = mutual_best_match(d1, v1, d1, jnp.ones(16, bool), max_dist=50)
        assert not bool(ok[3])

    def test_unmatched_below_threshold(self):
        rng = np.random.default_rng(6)
        d1 = random_desc(32, rng)
        d2 = random_desc(32, rng)  # unrelated: expected dist ~128
        v = jnp.ones(32, bool)
        idx, ok, _ = mutual_best_match(d1, v, d2, v, max_dist=50)
        assert np.asarray(ok).sum() == 0


class TestSearches:
    def test_initialization_search(self):
        rng = np.random.default_rng(7)
        n = 128
        uv1 = jnp.asarray(rng.uniform(50, 400, (n, 2)).astype(np.float32))
        uv2 = uv1 + jnp.asarray(rng.uniform(-20, 20, (n, 2)).astype(np.float32))
        d1 = random_desc(n, rng)
        d2 = flip_bits(d1, 8, rng)
        ang = jnp.zeros(n)
        v = jnp.ones(n, bool)
        idx, ok, _ = search_for_initialization(uv1, ang, d1, v, uv2, ang, d2, v)
        good = np.asarray(ok) & (np.asarray(idx) == np.arange(n))
        assert good.mean() > 0.9

    def test_projection_search_window(self):
        rng = np.random.default_rng(8)
        n = 64
        uv_pred = jnp.asarray(rng.uniform(100, 300, (n, 2)).astype(np.float32))
        # frame features: same points jittered by 2px + decoys far away
        f_uv = jnp.concatenate(
            [uv_pred + 2.0, uv_pred + 500.0], axis=0
        )
        d = random_desc(n, rng)
        f_desc = jnp.concatenate([flip_bits(d, 5, rng), random_desc(n, rng)], 0)
        lvls = jnp.zeros(n, jnp.int32)
        f_lvl = jnp.zeros(2 * n, jnp.int32)
        v = jnp.ones(n, bool)
        fv = jnp.ones(2 * n, bool)
        radius = jnp.full((8,), 15.0)
        idx, ok, _ = search_by_projection(
            uv_pred, lvls, d, v, f_uv, f_lvl, f_desc, fv, radius
        )
        good = np.asarray(ok) & (np.asarray(idx) == np.arange(n))
        assert good.mean() > 0.9

    def test_rotation_consistency(self):
        rng = np.random.default_rng(9)
        n = 100
        # 90 matches rotated by 0.5 rad, 10 outliers rotated randomly
        a1 = jnp.asarray(rng.uniform(0, 2 * np.pi, n).astype(np.float32))
        a2 = np.array(a1) - 0.5
        a2[:10] = rng.uniform(0, 2 * np.pi, 10)
        idx = jnp.arange(n)
        ok = jnp.ones(n, bool)
        keep = rotation_consistency_mask(a1, jnp.asarray(a2), idx, ok)
        kept = np.asarray(keep)
        assert kept[10:].mean() > 0.95  # inliers kept
        assert kept[:10].mean() < 0.5  # most outliers dropped

    def test_duplicate_resolution(self):
        # two sources claim the same target; closer one wins
        idx = jnp.array([5, 5, 3])
        ok = jnp.array([True, True, True])
        dist = jnp.array([10, 4, 7])
        keep = resolve_duplicate_targets(idx, ok, dist, 8)
        assert list(np.asarray(keep)) == [False, True, True]
