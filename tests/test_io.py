"""IO tests: settings YAML parsing (both reference generations), loaders."""
import numpy as np

from orb_slam3_modified_tpu.cameras import FISHEYE_KB8, PINHOLE
from orb_slam3_modified_tpu.io.settings import load_settings


class TestSettings:
    def test_pinhole_config(self):
        st = load_settings("configs/euroc_mono.yaml")
        assert st.cam.kind == PINHOLE
        p = np.asarray(st.cam.params)
        assert abs(p[0] - 458.654) < 1e-3
        assert st.cam.width == 752 and st.cam.height == 480
        assert st.extractor.n_features == 1000
        assert st.extractor.n_levels == 8
        assert st.imu is None

    def test_inertial_config(self):
        st = load_settings("configs/euroc_mono_inertial.yaml")
        assert st.imu is not None
        assert abs(st.imu.freq - 200.0) < 1e-6
        assert st.imu.T_bc.shape == (4, 4)
        # EuRoC Tbc rotation should be orthonormal
        R = st.imu.T_bc[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)

    def test_fisheye_config(self):
        st = load_settings("configs/tum_vi_fisheye.yaml")
        assert st.cam.kind == FISHEYE_KB8
        p = np.asarray(st.cam.params)
        assert abs(p[4] - 0.00348238) < 1e-8

    def test_opencv_yaml_directive(self, tmp_path):
        # the reference configs carry a %YAML:1.0 directive + --- separator
        p = tmp_path / "cfg.yaml"
        p.write_text(
            "%YAML:1.0\n---\nCamera.type: PinHole\nCamera.fx: 100.0\n"
            "Camera.fy: 100.0\nCamera.cx: 50.0\nCamera.cy: 50.0\n"
            "Camera.width: 100\nCamera.height: 100\n"
        )
        st = load_settings(str(p))
        assert abs(float(np.asarray(st.cam.params)[0]) - 100.0) < 1e-6


class TestEurocLoader:
    def test_roundtrip_with_synthetic(self, tmp_path):
        from orb_slam3_modified_tpu.cameras import Camera
        from orb_slam3_modified_tpu.io.datasets import EurocDataset
        from orb_slam3_modified_tpu.utils.synthetic_dataset import (
            write_euroc_sequence,
        )

        cam = Camera.pinhole(458.0, 457.0, 367.0, 248.0, width=752, height=480)
        root = str(tmp_path)
        write_euroc_sequence(root, cam, n_frames=4)
        ds = EurocDataset(root)
        assert len(ds) == 4
        frames = list(ds)
        assert frames[0].image.shape == (480, 752)
        assert frames[1].ts > frames[0].ts
