"""Tests for place recognition, Sim3 solving and pose-graph optimization."""
import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_modified_tpu.bow.kfdb import KeyFrameDatabase
from orb_slam3_modified_tpu.bow.vocabulary import Vocabulary, build_vocabulary
from orb_slam3_modified_tpu.lie import se3, sim3 as sim3m, so3
from orb_slam3_modified_tpu.lie.sim3 import Sim3
from orb_slam3_modified_tpu.loop.sim3_solver import horn_sim3, solve_sim3_ransac
from orb_slam3_modified_tpu.optim.pose_graph import (
    PoseGraphProblem,
    make_relative,
    optimize_pose_graph,
)


def random_desc(n, rng):
    return rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)


class TestVocabulary:
    def test_build_and_transform(self):
        rng = np.random.default_rng(0)
        train = random_desc(2000, rng)
        voc = build_vocabulary(train, k=8, depth=3)
        assert voc.n_words > 50
        w = voc.transform_np(train[:100])
        assert (w >= 0).all() and (w < voc.n_words).all()

    def test_similar_descriptors_same_word(self):
        rng = np.random.default_rng(1)
        train = random_desc(2000, rng)
        voc = build_vocabulary(train, k=8, depth=3)
        d = train[:50]
        d_noisy = d.copy()
        # flip 2 bits
        for i in range(len(d_noisy)):
            for _ in range(2):
                w_ = rng.integers(0, 8)
                d_noisy[i, w_] ^= np.uint32(1 << rng.integers(0, 32))
        w1 = voc.transform_np(d)
        w2 = voc.transform_np(d_noisy)
        assert (w1 == w2).mean() > 0.8

    def test_bow_score_self_max(self):
        rng = np.random.default_rng(2)
        train = random_desc(3000, rng)
        voc = build_vocabulary(train, k=8, depth=3)
        a = voc.bow_vector(voc.transform_np(random_desc(200, rng)))
        b = voc.bow_vector(voc.transform_np(random_desc(200, rng)))
        self_score = Vocabulary.score_l1(a, a)
        cross = Vocabulary.score_l1(a, b)
        assert abs(self_score - 1.0) < 1e-6
        assert cross < self_score


class TestKFDB:
    def test_query_finds_revisit(self):
        rng = np.random.default_rng(3)
        train = random_desc(3000, rng)
        voc = build_vocabulary(train, k=8, depth=3)
        db = KeyFrameDatabase(voc, max_kf=32)
        # 10 distinct "places"
        places = [random_desc(150, rng) for _ in range(10)]
        for k, d in enumerate(places):
            db.add(k, voc.transform_np(d))
        # query = noisy copy of place 4
        q = places[4].copy()
        for i in range(len(q)):
            w_ = rng.integers(0, 8)
            q[i, w_] ^= np.uint32(1 << rng.integers(0, 32))
        cands = db.query(voc.transform_np(q), exclude=set(), n_best=3)
        assert 4 in cands, f"candidates {cands}"


class TestSim3Solver:
    def test_horn_exact(self):
        rng = np.random.default_rng(4)
        p2 = jnp.asarray(rng.uniform(-2, 2, (30, 3)).astype(np.float32))
        S_gt = Sim3(
            jnp.asarray(1.7),
            so3.exp(jnp.asarray([0.2, -0.3, 0.5])),
            jnp.asarray([0.5, -1.0, 2.0]),
        )
        p1 = S_gt.apply(p2)
        S = horn_sim3(p1, p2)
        np.testing.assert_allclose(float(S.s), 1.7, atol=1e-4)
        np.testing.assert_allclose(np.asarray(S.R), np.asarray(S_gt.R), atol=1e-5)
        np.testing.assert_allclose(np.asarray(S.t), np.asarray(S_gt.t), atol=1e-4)

    def test_ransac_with_outliers(self):
        rng = np.random.default_rng(5)
        n = 100
        p2 = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
        S_gt = Sim3(
            jnp.asarray(0.8),
            so3.exp(jnp.asarray([-0.1, 0.4, 0.2])),
            jnp.asarray([1.0, 0.5, -0.7]),
        )
        p1 = np.array(S_gt.apply(jnp.asarray(p2)))
        out = rng.choice(n, 30, replace=False)
        p1[out] += rng.uniform(1, 3, (30, 3))
        res = solve_sim3_ransac(
            jnp.asarray(p1), jnp.asarray(p2), jnp.ones(n, bool),
            jax.random.PRNGKey(0),
        )
        assert bool(res.success)
        assert abs(float(res.S_12.s) - 0.8) < 0.05
        inl = np.asarray(res.inliers)
        assert inl[out].mean() < 0.2
        np.testing.assert_allclose(np.asarray(res.S_12.R), np.asarray(S_gt.R), atol=0.02)


class TestPoseGraph:
    def _chain_problem(self, n=12, drift=0.03, seed=0, four_dof=False):
        """Odometry chain with drift + one loop-closure edge back to start."""
        rng = np.random.default_rng(seed)
        # ground truth: circle
        S_gt = []
        for k in range(n):
            a = 2 * np.pi * k / n
            R = np.asarray(so3.exp(jnp.asarray([0.0, 0.0, a])))
            t = np.array([np.cos(a), np.sin(a), 0.0], np.float32)
            S_gt.append(Sim3(jnp.asarray(1.0), jnp.asarray(R), jnp.asarray(t)))
        # noisy odometry integration (accumulate drift)
        S_est = [S_gt[0]]
        for k in range(1, n):
            rel = S_gt[k] @ S_gt[k - 1].inverse()
            noise = sim3m.exp(jnp.asarray(
                np.concatenate([rng.normal(0, drift, 6), [rng.normal(0, drift * 0.3)]]).astype(np.float32)
            ))
            S_est.append((noise @ rel) @ S_est[-1])
        S = Sim3(
            jnp.stack([s.s for s in S_est]),
            jnp.stack([s.R for s in S_est]),
            jnp.stack([s.t for s in S_est]),
        )
        # edges: odometry (from noisy estimates' own relatives is exact);
        # use TRUE relative for odometry edges and the loop edge
        ei, ej = [], []
        rels = []
        for k in range(1, n):
            ei.append(k - 1)
            ej.append(k)
            rels.append(S_gt[k] @ S_gt[k - 1].inverse())
        # loop edge n-1 -> 0
        ei.append(n - 1)
        ej.append(0)
        rels.append(S_gt[0] @ S_gt[n - 1].inverse())
        S_meas = Sim3(
            jnp.stack([r.s for r in rels]),
            jnp.stack([r.R for r in rels]),
            jnp.stack([r.t for r in rels]),
        )
        fixed = np.zeros(n, bool)
        fixed[0] = True
        prob = PoseGraphProblem(
            S=S,
            fixed=jnp.asarray(fixed),
            edge_i=jnp.asarray(np.array(ei, np.int32)),
            edge_j=jnp.asarray(np.array(ej, np.int32)),
            S_ji_meas=S_meas,
            edge_weight=jnp.ones(len(ei)),
            edge_valid=jnp.ones(len(ei), bool),
        )
        return prob, S_gt

    def test_corrects_drift(self):
        prob, S_gt = self._chain_problem()
        S_opt = optimize_pose_graph(prob, False, 25)
        t_gt = np.stack([np.asarray(s.t) for s in S_gt])
        err_before = np.linalg.norm(np.asarray(prob.S.t) - t_gt, axis=-1)
        err_after = np.linalg.norm(np.asarray(S_opt.t) - t_gt, axis=-1)
        assert err_after.mean() < err_before.mean() * 0.3, (
            f"{err_before.mean()} -> {err_after.mean()}"
        )
        assert err_after.mean() < 0.03

    def test_scale_recovered(self):
        prob, S_gt = self._chain_problem(drift=0.05, seed=2)
        S_opt = optimize_pose_graph(prob, False, 25)
        np.testing.assert_allclose(np.asarray(S_opt.s), 1.0, atol=0.02)

    def test_fixed_vertex_unchanged(self):
        prob, _ = self._chain_problem()
        S_opt = optimize_pose_graph(prob, False, 10)
        np.testing.assert_allclose(
            np.asarray(S_opt.t[0]), np.asarray(prob.S.t[0]), atol=1e-5
        )

    def test_four_dof(self):
        prob, S_gt = self._chain_problem(drift=0.02, seed=3)
        S_opt = optimize_pose_graph(prob, True, 25)
        t_gt = np.stack([np.asarray(s.t) for s in S_gt])
        err_before = np.linalg.norm(np.asarray(prob.S.t) - t_gt, axis=-1)
        err_after = np.linalg.norm(np.asarray(S_opt.t) - t_gt, axis=-1)
        assert err_after.mean() < err_before.mean()
        # scale untouched in 4-dof mode
        np.testing.assert_allclose(np.asarray(S_opt.s), np.asarray(prob.S.s), atol=1e-6)


class TestVocabularyIO:
    def _tiny_orbvoc_text(self, path, rng):
        """Write a small tree in the upstream ORBvoc.txt format (reference:
        TemplatedVocabulary::loadFromTextFile, TemplatedVocabulary.h:1338):
        header 'k L score weight', then '<parent> <is_leaf> <32 bytes> <w>'
        per node in BFS order."""
        k, L = 3, 2
        lines = [f"{k} {L} 0 0"]
        # level 1: 3 children of root (internal), level 2: 3 leaves each
        node_id = 0
        for p in range(3):
            b = " ".join(str(int(x)) for x in rng.integers(0, 256, 32))
            lines.append(f"0 0 {b} 0.0")
        for p in range(1, 4):
            for c in range(3):
                b = " ".join(str(int(x)) for x in rng.integers(0, 256, 32))
                lines.append(f"{p} 1 {b} {0.1 * (c + 1):.3f}")
        with open(path, "w") as f:
            f.write("\n".join(lines) + "\n")

    def test_load_orbvoc_text(self, tmp_path):
        from orb_slam3_modified_tpu.bow.vocabulary import load_orbvoc_text

        rng = np.random.default_rng(3)
        p = str(tmp_path / "voc.txt")
        self._tiny_orbvoc_text(p, rng)
        voc = load_orbvoc_text(p)
        assert voc.k == 3 and voc.depth == 2
        assert voc.n_words == 9
        assert (voc.word_weight > 0).all()
        # transform must land every descriptor on a real word
        w = voc.transform_np(random_desc(50, rng))
        assert (w >= 0).all() and (w < 9).all()

    def test_npz_roundtrip(self, tmp_path):
        from orb_slam3_modified_tpu.bow.vocabulary import (
            load_vocabulary_npz,
            save_vocabulary_npz,
        )

        rng = np.random.default_rng(4)
        voc = build_vocabulary(random_desc(1000, rng), k=5, depth=2)
        p = str(tmp_path / "voc.npz")
        save_vocabulary_npz(p, voc)
        voc2 = load_vocabulary_npz(p)
        descs = random_desc(64, rng)
        np.testing.assert_array_equal(voc.transform_np(descs), voc2.transform_np(descs))

    def test_default_vocabulary_asset(self):
        """The packaged corpus-trained vocabulary must load and have real
        (non-degenerate) idf weights."""
        import pytest

        from orb_slam3_modified_tpu.bow.vocabulary import default_vocabulary

        voc = default_vocabulary()
        if voc is None:
            pytest.skip("default vocabulary asset not built")
        assert voc.n_words >= 1000
        assert float(voc.word_weight.std()) > 0.01  # trained, not uniform


class TestLoopEdges:
    """Persistent loop edges (reference: KeyFrame::AddLoopEdge — every later
    essential-graph build re-includes historical closures,
    src/Optimizer.cc:1570 region)."""

    def test_valid_loop_edges_survive_and_invalidate(self):
        from orb_slam3_modified_tpu.slam_map.map_state import MapState

        m = MapState.create(max_kf=8, max_mp=64, feat_cap=16)
        a = m.alloc_keyframe(); m.kf_frame_id[a] = 10
        b = m.alloc_keyframe(); m.kf_frame_id[b] = 20
        c = m.alloc_keyframe(); m.kf_frame_id[c] = 30
        m.add_loop_edge(a, c)
        m.add_loop_edge(b, c)
        assert m.valid_loop_edges() == [(a, c), (b, c)]
        # cull b: its edge must drop out
        m.kf_valid[b] = False
        assert m.valid_loop_edges() == [(a, c)]
        # slot reuse: a new keyframe lands in b's slot with a new frame id
        b2 = m.alloc_keyframe(); m.kf_frame_id[b2] = 99
        assert b2 == b
        assert m.valid_loop_edges() == [(a, c)]

    def test_loop_edges_serialize(self, tmp_path):
        from orb_slam3_modified_tpu.slam_map.map_state import MapState
        from orb_slam3_modified_tpu.slam_map.serialization import (
            load_atlas,
            save_atlas,
        )

        m = MapState.create(max_kf=8, max_mp=64, feat_cap=16)
        a = m.alloc_keyframe(); m.kf_frame_id[a] = 1
        b = m.alloc_keyframe(); m.kf_frame_id[b] = 2
        m.add_loop_edge(a, b)
        p = str(tmp_path / "atlas")
        save_atlas(p, m)
        m2 = load_atlas(p, check_vocab=False)
        assert m2.valid_loop_edges() == [(a, b)]
