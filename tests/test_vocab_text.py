"""ORBvoc.txt format fidelity: write + re-load the upstream text format.

The reference distributes its vocabulary as the DBoW2 text export consumed
by TemplatedVocabulary::loadFromTextFile (TemplatedVocabulary.h:1338);
these gates prove load_orbvoc_text parses that exact format (header,
per-node parent/leaf/32-byte/weight lines) by round-tripping a trained
vocabulary through it and checking behavioral equivalence.
"""
import numpy as np
import pytest

from orb_slam3_modified_tpu.bow.vocabulary import (
    build_vocabulary,
    load_orbvoc_text,
    save_orbvoc_text,
)


@pytest.fixture(scope="module")
def voc():
    rng = np.random.default_rng(3)
    descs = rng.integers(0, 2**32, (4000, 8), dtype=np.uint32)
    return build_vocabulary(descs, k=6, depth=3, seed=0)


class TestOrbvocText:
    def test_roundtrip_structure(self, voc, tmp_path):
        path = str(tmp_path / "voc.txt")
        save_orbvoc_text(path, voc)
        v2 = load_orbvoc_text(path)
        assert v2.k == voc.k and v2.depth == voc.depth
        assert v2.n_words == voc.n_words
        assert len(v2.node_desc) == len(voc.node_desc)
        # descriptor bytes preserved exactly
        np.testing.assert_array_equal(v2.node_desc, voc.node_desc)

    def test_roundtrip_behavior(self, voc, tmp_path):
        """Word assignment + tf-idf scoring identical through the file."""
        path = str(tmp_path / "voc.txt")
        save_orbvoc_text(path, voc)
        v2 = load_orbvoc_text(path)
        rng = np.random.default_rng(7)
        q = rng.integers(0, 2**32, (512, 8), dtype=np.uint32)
        w1 = voc.transform_np(q)
        w2 = v2.transform_np(q)
        np.testing.assert_array_equal(w1, w2)
        # weights survive (float32 -> text -> float32)
        np.testing.assert_allclose(
            v2.word_weight, voc.word_weight, rtol=1e-6, atol=1e-6
        )
        b1 = voc.bow_vector(w1[:200])
        b2 = v2.bow_vector(w2[:200])
        s = voc.score_l1(b1, b2)
        assert s > 0.999

    def test_header_validation_matches_reference(self, voc, tmp_path):
        """The written header passes the reference loader's gates
        (k in [0,20], L in [1,10], scoring in [0,5], weighting in [0,3] —
        TemplatedVocabulary.h:1358)."""
        path = str(tmp_path / "voc.txt")
        save_orbvoc_text(path, voc)
        with open(path) as f:
            k, L, n1, n2 = (int(x) for x in f.readline().split())
        assert 0 <= k <= 20 and 1 <= L <= 10 and 0 <= n1 <= 5 and 0 <= n2 <= 3
        # every node line carries parent, leaf flag, 32 bytes, weight
        with open(path) as f:
            f.readline()
            for line in f:
                parts = line.split()
                assert len(parts) == 35
                assert all(0 <= int(b) <= 255 for b in parts[2:34])
