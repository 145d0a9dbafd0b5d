"""Atlas save/load roundtrip tests."""
import dataclasses

import numpy as np
import pytest

from orb_slam3_modified_tpu.bow.vocabulary import build_vocabulary
from orb_slam3_modified_tpu.slam_map.map_state import MapState
from orb_slam3_modified_tpu.slam_map.serialization import load_atlas, save_atlas


def make_map():
    m = MapState.create(max_kf=16, max_mp=256, feat_cap=32)
    k = m.alloc_keyframe()
    m.kf_t[k] = [1, 2, 3]
    mp = m.alloc_points(10)
    m.mp_pos[mp] = np.arange(30).reshape(10, 3)
    m.kf_obs[k, :10] = mp
    return m


class TestAtlasSerialization:
    def test_roundtrip(self, tmp_path):
        m = make_map()
        p = str(tmp_path / "atlas")
        save_atlas(p, m)
        m2 = load_atlas(p)
        for f in dataclasses.fields(m):
            a = getattr(m, f.name)
            if isinstance(a, np.ndarray):
                np.testing.assert_array_equal(a, getattr(m2, f.name), err_msg=f.name)
        assert m2.n_keyframes() == 1
        assert m2.n_points() == 10

    def test_vocab_checksum_gate(self, tmp_path):
        rng = np.random.default_rng(0)
        voc1 = build_vocabulary(
            rng.integers(0, 2**32, (500, 8), dtype=np.uint32), k=4, depth=2
        )
        voc2 = build_vocabulary(
            rng.integers(0, 2**32, (500, 8), dtype=np.uint32), k=4, depth=2, seed=9
        )
        m = make_map()
        p = str(tmp_path / "atlas")
        save_atlas(p, m, voc=voc1)
        load_atlas(p, voc=voc1)  # ok
        with pytest.raises(ValueError, match="checksum"):
            load_atlas(p, voc=voc2)
