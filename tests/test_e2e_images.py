"""Full image-pipeline end-to-end: rendered PNG sequence -> CLI-style run.

Exercises the real frontend (pyramid/FAST/BRIEF extractor) + dataset loader
+ SlamSystem, not the synthetic-feature shortcut.
"""
import numpy as np
import pytest

from orb_slam3_modified_tpu.cameras import Camera
from orb_slam3_modified_tpu.eval.ate import ate_rmse

CAM = Camera.pinhole(458.654, 457.296, 367.215, 248.375, width=752, height=480)


@pytest.fixture(scope="module")
def image_run(tmp_path_factory):
    from orb_slam3_modified_tpu.features.extractor import ExtractorConfig
    from orb_slam3_modified_tpu.io.datasets import EurocDataset
    from orb_slam3_modified_tpu.system.slam_system import SlamSystem, SystemConfig
    from orb_slam3_modified_tpu.utils.synthetic_dataset import write_euroc_sequence

    root = str(tmp_path_factory.mktemp("euroc_synth"))
    gts = write_euroc_sequence(root, CAM, n_frames=16, radius=3.0)
    ds = EurocDataset(root)
    assert len(ds) == 16
    slam = SlamSystem(
        SystemConfig(
            cam=CAM,
            feat_cap=512,
            extractor=ExtractorConfig(n_features=512, n_levels=4),
            use_loop_closing=False,
        )
    )
    import jax.numpy as jnp

    n_tracked = 0
    for frame in ds:
        T = slam.track_monocular(jnp.asarray(frame.image), frame.ts)
        if T is not None:
            n_tracked += 1
    return slam, gts, n_tracked


class TestImagePipeline:
    def test_dataset_roundtrip(self, image_run):
        slam, gts, n_tracked = image_run
        assert n_tracked >= 8, f"tracked only {n_tracked} frames"

    def test_trajectory_sane(self, image_run, tmp_path):
        slam, gts, n_tracked = image_run
        traj = slam.tracker.absolute_trajectory()
        if len(traj) < 8:
            pytest.skip("too few tracked frames for ATE")
        est, gt = [], []
        for ts, fid, T in traj:
            est.append(np.linalg.inv(T)[:3, 3])
            gt.append(np.linalg.inv(gts[fid])[:3, 3])
        rmse, s = ate_rmse(np.array(est), np.array(gt))
        # textured-plane scene: expect coarse but sane tracking
        assert rmse < 0.25, f"ATE {rmse}"
        p = str(tmp_path / "traj.txt")
        slam.save_trajectory_tum(p)
        assert len(open(p).readlines()) == len(traj)
