"""Native C++ engine vs numpy fallback equivalence."""
import numpy as np
import pytest

from orb_slam3_modified_tpu import native
from orb_slam3_modified_tpu.slam_map.map_state import NO_POINT, MapState


@pytest.fixture(scope="module")
def arena():
    rng = np.random.default_rng(0)
    m = MapState.create(max_kf=32, max_mp=512, feat_cap=64)
    for _ in range(10):
        k = m.alloc_keyframe()
        n = rng.integers(20, 60)
        mp = rng.choice(512, n, replace=False)
        m.mp_valid[mp] = True
        slots = rng.choice(64, n, replace=False)
        m.kf_obs[k, slots] = mp
    return m


class TestNative:
    def test_lib_builds(self):
        assert native.get_lib() is not None, "g++ build failed"

    def test_covis_matches_numpy(self, arena):
        m = arena
        for k in m.keyframe_indices():
            w_native = native.covis_weights(m.kf_obs, m.kf_valid, 512, int(k))
            # numpy reference
            mp = m.kf_obs[int(k)]
            observed = np.zeros(513, bool)
            observed[mp[mp != NO_POINT]] = True
            hits = observed[np.where(m.kf_obs == NO_POINT, 512, m.kf_obs)]
            w_np = (hits & (m.kf_obs != NO_POINT)).sum(axis=1).astype(np.int32)
            w_np[int(k)] = 0
            w_np[~m.kf_valid] = 0
            np.testing.assert_array_equal(w_native, w_np)

    def test_obs_counts_match(self, arena):
        m = arena
        c_native = native.obs_counts(m.kf_obs, m.kf_valid, 512)
        c_np = np.zeros(512, np.int64)
        flat = m.kf_obs[m.kf_valid].ravel()
        flat = flat[flat != NO_POINT]
        np.add.at(c_np, flat, 1)
        np.testing.assert_array_equal(c_native, c_np)

    def test_point_observers_match(self, arena):
        m = arena
        pts = m.point_indices()[:20]
        o_native = native.point_observers(m.kf_obs, m.kf_valid, 512, pts)
        mask = np.zeros(513, bool)
        mask[pts] = True
        safe = np.where(m.kf_obs == NO_POINT, 512, m.kf_obs)
        o_np = (mask[safe] & (m.kf_obs != NO_POINT)).any(axis=1) & m.kf_valid
        np.testing.assert_array_equal(o_native, o_np)
