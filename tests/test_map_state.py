"""MapState regression tests (round-4 ADVICE fixes).

Covers two silent-corruption bugs:
- update_point_stats fed feature-slot-order (non-monotonic) point lists to
  np.add.reduceat, corrupting mp_normal for nearly every refreshed point.
- the accelerator branch of local_mapper._pad_problem hard-capped pads, so a
  global-BA problem over >32 keyframes raised instead of growing.
"""
import numpy as np

from orb_slam3_modified_tpu.slam_map.map_state import NO_POINT, MapState


def _make_map(n_kf=4, n_pts=24, feat_cap=64, seed=0):
    rng = np.random.default_rng(seed)
    m = MapState.create(max_kf=16, max_mp=256, feat_cap=feat_cap)
    pts = m.alloc_points(n_pts)
    m.mp_pos[pts] = rng.normal(0, 1, (n_pts, 3)).astype(np.float32) + [0, 0, 5]
    for i in range(n_kf):
        k = m.alloc_keyframe()
        m.kf_t[k] = np.array([0.4 * i, 0.1 * i, 0], np.float32)
        m.kf_frame_id[k] = i
        # each keyframe observes a shuffled subset of the points, so the
        # slot-order observation list is NOT sorted by point id
        sel = rng.permutation(n_pts)[: n_pts - 2 * i]
        m.kf_obs[k, : len(sel)] = pts[sel]
        m.kf_feat_valid[k, : len(sel)] = True
        m.kf_level[k, : len(sel)] = rng.integers(0, 4, len(sel))
        m.kf_desc[k] = rng.integers(0, 2**32, (feat_cap, 8), dtype=np.uint32)
    return m, pts


def _ref_normals(m, mp_idx):
    out = {}
    for mp in np.atleast_1d(mp_idx):
        ks, slots = np.where((m.kf_obs == mp) & m.kf_valid[:, None])
        if len(ks) == 0:
            continue
        centers = np.stack([-m.kf_R[k].T @ m.kf_t[k] for k in ks])
        vec = m.mp_pos[mp] - centers
        unit = vec / np.linalg.norm(vec, axis=-1, keepdims=True)
        s = unit.sum(0)
        out[int(mp)] = s / np.linalg.norm(s)
    return out


class TestUpdatePointStats:
    def test_unsorted_point_list_normals(self):
        """Slot-order (unsorted) mp_idx must produce the same normals as the
        per-point reference loop — the reduceat segment bounds are only
        valid for sorted ids."""
        m, pts = _make_map()
        sf = 1.2 ** np.arange(4)
        # exactly what local_mapper.on_keyframe passes: slot-order obs list
        _, mps = m.observations_of_kf(0)
        assert not np.all(np.diff(mps) > 0), "fixture should be unsorted"
        m.update_point_stats(mps, sf)
        ref = _ref_normals(m, mps)
        for mp, n_ref in ref.items():
            np.testing.assert_allclose(
                m.mp_normal[mp], n_ref, atol=1e-5,
                err_msg=f"normal corrupted for point {mp}",
            )

    def test_duplicate_ids_ok(self):
        m, pts = _make_map()
        sf = 1.2 ** np.arange(4)
        dup = np.concatenate([pts[:5], pts[:5], pts[4::-1]])
        m.update_point_stats(dup, sf)
        ref = _ref_normals(m, pts[:5])
        for mp, n_ref in ref.items():
            np.testing.assert_allclose(m.mp_normal[mp], n_ref, atol=1e-5)


class TestPadProblemGrowth:
    def test_accelerator_pads_grow_past_cap(self, monkeypatch):
        """A GBA-sized problem (K>32, P>8192, O>16384) must grow its pad
        buckets on accelerator backends instead of raising (round-3 ADVICE
        high: broadcast error once the map exceeded the static pads)."""
        import jax

        from orb_slam3_modified_tpu.lie.se3 import SE3
        from orb_slam3_modified_tpu.mapping import local_mapper
        from orb_slam3_modified_tpu.optim.ba import BAProblem

        K, P, O = 40, 9000, 20000
        prob = BAProblem(
            T_cw=SE3(
                np.tile(np.eye(3, dtype=np.float32), (K, 1, 1)),
                np.zeros((K, 3), np.float32),
            ),
            cam_fixed=np.zeros(K, bool),
            points=np.zeros((P, 3), np.float32),
            pt_valid=np.ones(P, bool),
            obs_cam=np.zeros(O, np.int32),
            obs_pt=np.zeros(O, np.int32),
            obs_uv=np.zeros((O, 2), np.float32),
            obs_inv_s2=np.ones(O, np.float32),
            obs_valid=np.ones(O, bool),
        )
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        out = local_mapper._pad_problem(prob)
        assert out.T_cw.t.shape[0] >= K
        assert out.points.shape[0] >= P
        assert out.obs_cam.shape[0] >= O
        # real rows preserved, padding masked off
        assert np.asarray(out.obs_valid)[:O].all()
        assert not np.asarray(out.obs_valid)[O:].any()
        assert not np.asarray(out.pt_valid)[P:].any()
        assert np.asarray(out.cam_fixed)[K:].all()
