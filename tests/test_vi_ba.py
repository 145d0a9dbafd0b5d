"""Joint visual-inertial BA tests (FullInertialBA / LocalInertialBA parity).

Simulated circular trajectory with exact IMU preintegration + projected
landmarks; the solver must pull perturbed poses/velocities/biases/points
back to ground truth. Reference: Optimizer::FullInertialBA
(src/Optimizer.cc:392), LocalInertialBA (:2383).
"""
import jax.numpy as jnp
import numpy as np

from orb_slam3_modified_tpu.cameras import Camera, project_np
from orb_slam3_modified_tpu.lie.se3 import SE3
from orb_slam3_modified_tpu.optim.inertial import InertialChain
from orb_slam3_modified_tpu.optim.vi_ba import (
    VIBAProblem,
    vi_bundle_adjust,
)

from test_inertial import circle_sim

CAM = Camera.pinhole(458.654, 457.296, 367.215, 248.375, width=752, height=480)


def _make_problem(n_kf=8, seed=0, bias_g=None, pert=True, init_bias=None):
    rng = np.random.default_rng(seed)
    kf_states, pres = circle_sim(n_kf=n_kf, kf_dt=0.5, bias_g=bias_g)
    R_wb = np.stack([s[0] for s in kf_states]).astype(np.float32)
    p_wb = np.stack([s[1] for s in kf_states]).astype(np.float32)
    v_gt = np.stack([s[2] for s in kf_states]).astype(np.float32)
    # camera == body: T_cw = (R_wb, p)^-1
    R_cw = np.swapaxes(R_wb, -1, -2)
    t_cw = -np.einsum("kij,kj->ki", R_cw, p_wb)

    # landmarks: cloud above the circle (circle_sim bodies yaw in-plane, so
    # the camera optical axis stays aligned with world +z)
    P = 256
    pts_gt = rng.normal(0, 1.5, (P, 3)).astype(np.float32)
    pts_gt[:, 2] = 5.0 + rng.normal(0, 1.0, P)

    obs_cam, obs_pt, obs_uv = [], [], []
    for k in range(n_kf):
        pc = pts_gt @ R_cw[k].T + t_cw[k]
        uv = project_np(CAM, pc)
        ok = (
            (pc[:, 2] > 0.3)
            & (uv[:, 0] > 5) & (uv[:, 0] < CAM.width - 5)
            & (uv[:, 1] > 5) & (uv[:, 1] < CAM.height - 5)
        )
        idx = np.flatnonzero(ok)
        obs_cam.append(np.full(len(idx), k, np.int32))
        obs_pt.append(idx.astype(np.int32))
        obs_uv.append(uv[idx] + rng.normal(0, 0.3, (len(idx), 2)))
    obs_cam = np.concatenate(obs_cam)
    obs_pt = np.concatenate(obs_pt)
    obs_uv = np.concatenate(obs_uv).astype(np.float32)
    assert len(obs_cam) > 4 * P, "simulation produced too few observations"

    # perturb everything except the anchor
    R0, t0 = R_cw.copy(), t_cw.copy()
    pts0 = pts_gt.copy()
    v0 = v_gt.copy()
    if pert:
        from orb_slam3_modified_tpu.lie import so3 as so3m

        for k in range(1, n_kf):
            dR = np.asarray(so3m.exp(jnp.asarray(rng.normal(0, 0.01, 3).astype(np.float32))))
            R0[k] = dR @ R0[k]
            t0[k] = t0[k] + rng.normal(0, 0.03, 3)
        pts0 = pts_gt + rng.normal(0, 0.02, pts_gt.shape).astype(np.float32)
        v0 = v_gt + rng.normal(0, 0.1, v_gt.shape).astype(np.float32)

    chain = InertialChain.from_preintegrated(pres)
    E = n_kf - 1
    fixed = np.zeros(n_kf, bool)
    fixed[0] = True
    b0 = np.zeros((n_kf, 3), np.float32)
    if init_bias is not None:
        b0 = np.tile(np.asarray(init_bias, np.float32), (n_kf, 1))
    prob = VIBAProblem(
        T_cw=SE3(jnp.asarray(R0), jnp.asarray(t0)),
        cam_fixed=jnp.asarray(fixed),
        points=jnp.asarray(pts0),
        pt_valid=jnp.ones(P, bool),
        obs_cam=jnp.asarray(obs_cam),
        obs_pt=jnp.asarray(obs_pt),
        obs_uv=jnp.asarray(obs_uv),
        obs_inv_s2=jnp.ones(len(obs_cam), jnp.float32),
        obs_valid=jnp.ones(len(obs_cam), bool),
        v_w=jnp.asarray(v0),
        bg=jnp.asarray(b0),
        ba=jnp.zeros((n_kf, 3), jnp.float32),
        chain=chain,
        edge_i=jnp.arange(E, dtype=jnp.int32),
        edge_j=jnp.arange(1, E + 1, dtype=jnp.int32),
        bg_lin=jnp.zeros((E, 3), jnp.float32),
        ba_lin=jnp.zeros((E, 3), jnp.float32),
        rw_info_g=jnp.full(E, 1.0 / (1.9e-3**2 * 0.5), jnp.float32),
        rw_info_a=jnp.full(E, 1.0 / (3.0e-2**2 * 0.5), jnp.float32),
        prior_g=jnp.asarray(0.0, jnp.float32),
        prior_a=jnp.asarray(1e5, jnp.float32),
        R_bc=jnp.eye(3),
        t_bc=jnp.zeros(3),
        state_fixed=jnp.zeros(n_kf, bool),  # velocities/biases free everywhere
    )
    return prob, R_cw, t_cw, v_gt, pts_gt


class TestVIBA:
    def test_converges_from_perturbation(self):
        prob, R_gt, t_gt, v_gt, pts_gt = _make_problem()
        res = vi_bundle_adjust(prob, CAM, 2, 10)
        R = np.asarray(res.T_cw.R)
        t = np.asarray(res.T_cw.t)
        rot_err = np.array(
            [np.linalg.norm(R[k] @ R_gt[k].T - np.eye(3)) for k in range(len(R))]
        )
        # camera centers
        c_est = -np.einsum("kji,kj->ki", R, t)
        c_gt = -np.einsum("kji,kj->ki", R_gt, t_gt)
        assert rot_err.max() < 5e-3, f"rot err {rot_err.max()}"
        assert np.abs(c_est - c_gt).max() < 2e-2, (
            f"center err {np.abs(c_est - c_gt).max()}"
        )
        v_err = np.linalg.norm(np.asarray(res.v_w) - v_gt, axis=-1)
        assert v_err.mean() < 0.05, f"vel err {v_err.mean()}"
        assert float(res.cost_inertial) < 10.0

    def test_improves_vs_visual_only_velocities(self):
        """The joint solve must estimate velocities (pure visual BA cannot)."""
        prob, R_gt, t_gt, v_gt, pts_gt = _make_problem(seed=3)
        res = vi_bundle_adjust(prob, CAM, 2, 10)
        v_err0 = np.linalg.norm(np.asarray(prob.v_w) - v_gt, axis=-1).mean()
        v_err1 = np.linalg.norm(np.asarray(res.v_w) - v_gt, axis=-1).mean()
        assert v_err1 < 0.5 * v_err0

    def test_gyro_bias_propagates_through_rw(self):
        """Anchor bias pinned at truth; other KFs start at zero and must be
        pulled to the true bias through preintegration + random-walk edges."""
        bg_gt = np.array([0.015, -0.01, 0.02])
        prob, R_gt, t_gt, v_gt, pts_gt = _make_problem(
            seed=1, bias_g=bg_gt, pert=False
        )
        # anchor knows the true bias, the rest start at zero
        bg0 = np.zeros((len(R_gt), 3), np.float32)
        bg0[0] = bg_gt
        prob = prob._replace(bg=jnp.asarray(bg0))
        res = vi_bundle_adjust(prob, CAM, 2, 10)
        bg = np.asarray(res.bg)
        err = np.linalg.norm(bg[1:] - bg_gt[None], axis=-1)
        assert err.max() < 4e-3, f"bias err {err}"

    def test_fixed_anchor_untouched(self):
        prob, R_gt, t_gt, v_gt, pts_gt = _make_problem(seed=2)
        prob = prob._replace(state_fixed=prob.cam_fixed)  # window-mode pinning
        res = vi_bundle_adjust(prob, CAM, 1, 5)
        np.testing.assert_allclose(
            np.asarray(res.T_cw.R)[0], np.asarray(prob.T_cw.R)[0], atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(res.v_w)[0], np.asarray(prob.v_w)[0], atol=1e-6
        )
