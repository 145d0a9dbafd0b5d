"""Staged IMU init execution modes: stage-4 periodic mono scale refinement
(reference: LocalMapping::ScaleRefinement at mTinit 25-75 s,
/root/reference/src/LocalMapping.cc:232-244, :1429) and the async job
protocol that runs the solves on the mapper worker instead of the tracker's
critical path (reference: InitializeIMU on the LocalMapping thread,
/root/reference/src/LocalMapping.cc:200-230). VERDICT r4 next-round #1/#2.
"""
import threading

import jax.numpy as jnp
import numpy as np

from orb_slam3_modified_tpu.lie.se3 import SE3
from orb_slam3_modified_tpu.slam_map.map_state import MapState
from orb_slam3_modified_tpu.tracking.imu_frontend import ImuConfig, ImuFrontend

from test_inertial import circle_sim


def _frontend_with_chain(mis_scale=1.0, stage=3, elapsed=26.0, n_kf=10):
    """ImuFrontend + MapState holding a circle-trajectory keyframe chain
    whose poses are mis-scaled by `mis_scale` (positions stored /mis_scale)
    while the preintegrations are metric — the exact residual-scale state
    ScaleRefinement exists to correct."""
    kf_states, pres = circle_sim(n_kf=n_kf)
    m = MapState.create(64, 256, 64)
    imu = ImuFrontend(ImuConfig(mono=True))
    imu.stage = stage
    imu.initialized = stage >= 1
    from orb_slam3_modified_tpu.imu.preintegration import Preintegrated

    chain = []
    for i, (R_wb, p_wb, v, _a) in enumerate(kf_states):
        k = m.alloc_keyframe()
        R_cw = R_wb.T
        t_cw = -R_wb.T @ (p_wb / mis_scale)
        m.kf_R[k] = R_cw.astype(np.float32)
        m.kf_t[k] = t_cw.astype(np.float32)
        m.kf_ts[k] = i * 0.5
        m.kf_frame_id[k] = i * 10
        m.kf_vel[k] = (v / mis_scale).astype(np.float32)
        pre = Preintegrated.identity(imu.bias) if i == 0 else pres[i - 1]
        chain.append((k, i * 10, pre))
    imu.kf_chain = chain
    imu.first_kf_ts = m.kf_ts[chain[-1][0]] - elapsed
    imu.v_w = (kf_states[-1][2] / mis_scale).astype(np.float32)
    return imu, m


class _DummyTracker:
    def __init__(self):
        from orb_slam3_modified_tpu.cameras import Camera
        from orb_slam3_modified_tpu.tracking.tracker import (
            FrameRecord,
            TrackerConfig,
        )

        self.cfg = TrackerConfig(
            cam=Camera.pinhole(300.0, 300.0, 160.0, 120.0, width=320, height=240)
        )
        self.last = FrameRecord(
            features=None,
            T_cw=SE3(jnp.eye(3), jnp.zeros(3)),
            obs_mp=np.zeros(0, np.int32),
            ts=0.0,
            frame_id=999,
        )
        self.velocity = None
        self.ref_kf = -1


class TestScaleRefinement:
    def test_refinement_corrects_residual_scale(self):
        """A stage-3 map left 6% off metric must be pulled back by the
        25-s refinement event (reference applies when |s-1| > 0.002,
        src/LocalMapping.cc:1451 region)."""
        mis = 1.06
        imu, m = _frontend_with_chain(mis_scale=mis)
        t_before = m.kf_t[imu.kf_chain[-1][0]].copy()
        ok = imu.maybe_initialize(m, _DummyTracker())
        assert ok, "refinement event did not fire/apply"
        assert imu.stage == 3, "refinement must not advance the stage"
        assert imu.refine_idx == 1
        assert len(imu.align_log) == 1
        A, s = imu.align_log[0]
        assert abs(s - mis) / mis < 0.03, f"applied scale {s} vs expected {mis}"
        # map translations rescaled toward metric
        ratio = np.linalg.norm(m.kf_t[imu.kf_chain[-1][0]]) / max(
            np.linalg.norm(t_before), 1e-9
        )
        assert abs(ratio - mis) / mis < 0.03
        assert imu.init_log and imu.init_log[-1]["kind"] == "refine"
        assert imu.init_log[-1]["applied"]

    def test_save_debug_data_dump(self, tmp_path):
        """SaveDebugData parity (reference: System::SaveDebugData,
        src/System.cc:1305): init traces dump as JSON lines with the solved
        scale / gravity rotation / solve time per event."""
        import json

        from orb_slam3_modified_tpu.system.slam_system import SlamSystem

        imu, m = _frontend_with_chain(mis_scale=1.06)
        assert imu.maybe_initialize(m, _DummyTracker())
        sys_obj = SlamSystem.__new__(SlamSystem)  # facade saver only

        class _T:
            pass

        sys_obj.tracker = _T()
        sys_obj.tracker.imu = imu
        p = str(tmp_path / "debug.jsonl")
        n = sys_obj.save_debug_data(p)
        assert n == len(imu.init_log) >= 1
        rows = [json.loads(line) for line in open(p)]
        assert rows[-1]["kind"] == "refine" and rows[-1]["applied"]
        assert len(rows[-1]["R_wg"]) == 9
        assert rows[-1]["t_solve"] >= 0

    def test_refinement_noop_when_metric(self):
        """Once the map is metric, later events must measure s~1 and leave
        the world untouched (|s-1| <= 0.002 gate)."""
        imu, m = _frontend_with_chain(mis_scale=1.0)
        t_before = m.kf_t[imu.kf_chain[-1][0]].copy()
        ok = imu.maybe_initialize(m, _DummyTracker())
        assert not ok, "metric map must not be realigned"
        assert imu.refine_idx == 1, "the scheduled event still advances"
        assert len(imu.align_log) == 0
        np.testing.assert_allclose(m.kf_t[imu.kf_chain[-1][0]], t_before)

    def test_schedule_exhausts(self):
        """Exactly len(refine_schedule) events run, then the frontend goes
        quiet (reference: the 25/35/45/55/65/75 s ladder ends)."""
        imu, m = _frontend_with_chain(mis_scale=1.0, elapsed=100.0)
        tr = _DummyTracker()
        for i in range(len(imu.refine_schedule)):
            imu.maybe_initialize(m, tr)
            assert imu.refine_idx == i + 1
        assert imu._init_due(m) is None

    def test_not_scheduled_for_stereo(self):
        """Stereo/RGB-D-inertial maps are metric from the baseline — no
        periodic scale refinement (reference: mono-only ScaleRefinement
        call sites, src/LocalMapping.cc:232)."""
        imu, m = _frontend_with_chain(mis_scale=1.0, elapsed=100.0)
        imu.cfg.mono = False
        assert imu._init_due(m) is None


class TestAsyncInitProtocol:
    def test_async_refine_commits_under_lock(self):
        """run_pending_init (the mapper-worker entry) must solve unlocked
        and commit the alignment + align_log entry under the map lock."""
        mis = 1.05
        imu, m = _frontend_with_chain(mis_scale=mis)
        imu.async_init = True
        imu.map_lock = threading.RLock()
        tr = _DummyTracker()
        # tracker-side maybe_initialize is a NO-OP in async mode
        assert not imu.maybe_initialize(m, tr)
        assert imu.refine_idx == 0 and not imu.align_log
        ok = imu.run_pending_init(m, tr)
        assert ok
        assert imu.refine_idx == 1
        assert len(imu.align_log) == 1
        _, s = imu.align_log[0]
        assert abs(s - mis) / mis < 0.03
        # the tracker's last pose followed the transform
        assert tr.velocity is None

    def test_stale_epoch_aborts_commit(self):
        """A reset/loss between snapshot and commit must discard the solve
        (the world it was computed in no longer exists)."""
        imu, m = _frontend_with_chain(mis_scale=1.05)
        imu.async_init = True
        imu.map_lock = threading.RLock()
        orig = imu._solve_inertial

        def solve_and_reset(snap, kind):
            res = orig(snap, kind)
            imu._epoch += 1  # loss lands mid-solve
            return res

        imu._solve_inertial = solve_and_reset
        ok = imu.run_pending_init(m, _DummyTracker())
        assert not ok
        assert len(imu.align_log) == 0
        assert imu.refine_idx == 0
