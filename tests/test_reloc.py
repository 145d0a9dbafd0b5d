"""PnP RANSAC relocalization solver tests."""
import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_modified_tpu.cameras import Camera, project
from orb_slam3_modified_tpu.lie.se3 import SE3
from orb_slam3_modified_tpu.lie import so3
from orb_slam3_modified_tpu.loop.relocalization import pnp_ransac

CAM = Camera.pinhole(458.654, 457.296, 367.215, 248.375, width=752, height=480)


def make_case(n=120, noise=0.5, outliers=0, seed=0):
    rng = np.random.default_rng(seed)
    pw = np.concatenate(
        [rng.uniform(-3, 3, (n, 2)), rng.uniform(4, 10, (n, 1))], axis=1
    ).astype(np.float32)
    R = np.asarray(so3.exp(jnp.asarray([0.1, -0.2, 0.15])))
    t = np.array([0.3, -0.1, 0.2], np.float32)
    T = SE3(jnp.asarray(R), jnp.asarray(t))
    pc = pw @ R.T + t
    uv = np.array(project(CAM, jnp.asarray(pc)))
    uv += rng.normal(0, noise, uv.shape)
    if outliers:
        sel = rng.choice(n, outliers, replace=False)
        uv[sel] += rng.uniform(30, 100, (outliers, 2))
    return pw, uv.astype(np.float32), T


class TestPnP:
    def test_clean(self):
        pw, uv, T_gt = make_case()
        res = pnp_ransac(
            CAM, jnp.asarray(pw), jnp.asarray(uv), jnp.ones(len(pw), bool),
            jax.random.PRNGKey(0),
        )
        assert bool(res.success)
        dR = np.asarray(res.T_cw.R) @ np.asarray(T_gt.R).T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 1.0, f"rot err {ang}"
        assert np.linalg.norm(np.asarray(res.T_cw.t) - np.asarray(T_gt.t)) < 0.1

    def test_outliers(self):
        pw, uv, T_gt = make_case(outliers=30, seed=1)
        res = pnp_ransac(
            CAM, jnp.asarray(pw), jnp.asarray(uv), jnp.ones(len(pw), bool),
            jax.random.PRNGKey(1),
        )
        assert bool(res.success)
        dR = np.asarray(res.T_cw.R) @ np.asarray(T_gt.R).T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 2.0, f"rot err {ang}"

    def test_degenerate_fails(self):
        # all points coplanar AND collinear-ish -> should not return garbage success
        rng = np.random.default_rng(2)
        pw = np.zeros((50, 3), np.float32)
        pw[:, 0] = np.linspace(-1, 1, 50)
        pw[:, 2] = 5.0
        uv = np.array(project(CAM, jnp.asarray(pw)))
        res = pnp_ransac(
            CAM, jnp.asarray(pw), jnp.asarray(uv.astype(np.float32)),
            jnp.ones(50, bool), jax.random.PRNGKey(2),
        )
        # collinear geometry is degenerate; either it fails or still explains
        # the data (pose may differ from any particular gt) — just require
        # finiteness
        assert np.isfinite(np.asarray(res.T_cw.t)).all()
