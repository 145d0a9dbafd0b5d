"""Distributed BA on a virtual 8-device CPU mesh (SURVEY.md §4 multi-host
test strategy: xla_force_host_platform_device_count)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from orb_slam3_modified_tpu.cameras import Camera
from orb_slam3_modified_tpu.parallel.dist_ba import dist_bundle_adjust
from tests.test_ba import CAM, build_problem, reproj_rmse


@pytest.fixture(scope="module")
def mesh8():
    devs = np.array(jax.devices()[:8])
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(devs, ("ba",))


class TestDistributedBA:
    def test_matches_single_device_quality(self, mesh8):
        prob, scene = build_problem(noise_px=0.4)
        before = reproj_rmse(prob.T_cw, prob.points, prob)
        T, pts = dist_bundle_adjust(prob, CAM, mesh8, iters=12)
        # score on the original (unpadded) problem
        after = reproj_rmse(T, pts[: prob.points.shape[0]], prob)
        assert after < before * 0.25, f"{before} -> {after}"
        assert after < 1.0

    def test_fixed_camera_respected(self, mesh8):
        prob, _ = build_problem()
        T, pts = dist_bundle_adjust(prob, CAM, mesh8, iters=6)
        np.testing.assert_allclose(
            np.asarray(T.R[0]), np.asarray(prob.T_cw.R[0]), atol=1e-5
        )
