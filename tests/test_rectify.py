"""Golden tests for radtan undistortion + stereo rectification vs OpenCV.

Covers the reference's Frame::UndistortKeyPoints (src/Frame.cc:746) and
Settings rectification-map precompute (include/Settings.h:44-121). cv2 is a
test-only dependency; the runtime path is numpy + jitted device remap.
"""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from orb_slam3_modified_tpu.cameras.rectify import (  # noqa: E402
    build_rectification,
    init_undistort_rectify_map,
    make_keypoint_undistorter,
    remap_bilinear,
    stereo_rectify,
    undistort_points,
)

# EuRoC cam0-like intrinsics/distortion
K1 = np.array([[458.654, 0, 367.215], [0, 457.296, 248.375], [0, 0, 1]])
D1 = np.array([-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05, 0.0])
K2 = np.array([[457.587, 0, 379.999], [0, 456.134, 255.238], [0, 0, 1]])
D2 = np.array([-0.28368365, 0.07451284, -0.00010473, -3.55590700e-05, 0.0])
SIZE = (752, 480)


def _relative_pose():
    # EuRoC-like cam0->cam1: ~11cm baseline along x with a small rotation
    rv = np.array([0.003, -0.002, 0.001])
    R, _ = cv2.Rodrigues(rv)
    t = np.array([[-0.1100738], [0.000399121], [-0.000853703]])
    return R, t


def test_undistort_points_matches_cv2():
    """cv2 stops at 5 fixed-point iterations (~0.25px residual on EuRoC
    distortion); we iterate to convergence. Gate: loose agreement with cv2
    plus an exact round-trip through the forward model."""
    from orb_slam3_modified_tpu.cameras.rectify import radtan_distort_normalized

    rng = np.random.default_rng(0)
    pts = rng.uniform([30, 30], [720, 450], size=(200, 2))
    ours = undistort_points(pts, K1, D1)
    ref = cv2.undistortPoints(
        pts.reshape(-1, 1, 2).astype(np.float64), K1, D1
    ).reshape(-1, 2)
    assert np.allclose(ours, ref, atol=2e-3)
    back = radtan_distort_normalized(ours, D1)
    px = back * [K1[0, 0], K1[1, 1]] + [K1[0, 2], K1[1, 2]]
    assert np.abs(px - pts).max() < 1e-9


def test_undistort_points_with_RP_matches_cv2():
    rng = np.random.default_rng(1)
    pts = rng.uniform([30, 30], [720, 450], size=(100, 2))
    R, t = _relative_pose()
    R1, R2, P1, P2, Q = cv2.stereoRectify(
        K1, D1, K2, D2, SIZE, R, t, flags=cv2.CALIB_ZERO_DISPARITY, alpha=-1
    )[:5]
    ours = undistort_points(pts, K1, D1, R=R1, P=P1)
    ref = cv2.undistortPoints(
        pts.reshape(-1, 1, 2).astype(np.float64), K1, D1, R=R1, P=P1
    ).reshape(-1, 2)
    # cv2's 5-iteration convergence error dominates (~0.25px worst-case)
    assert np.allclose(ours, ref, atol=0.5)


def test_keypoint_undistorter_device():
    rng = np.random.default_rng(2)
    pts = rng.uniform([30, 30], [720, 450], size=(300, 2)).astype(np.float32)
    fn = make_keypoint_undistorter(K1, D1)
    ours = np.asarray(fn(pts))
    ref = undistort_points(pts.astype(np.float64), K1, D1, P=K1)
    assert np.abs(ours - ref).max() < 0.05  # float32 + 8 fixed-point iters


def test_stereo_rectify_matches_cv2():
    R, t = _relative_pose()
    oR1, oR2, oP1, oP2, oQ = stereo_rectify(K1, D1, K2, D2, SIZE, R, t)
    rR1, rR2, rP1, rP2, rQ = cv2.stereoRectify(
        K1, D1, K2, D2, SIZE, R, t, flags=cv2.CALIB_ZERO_DISPARITY, alpha=-1
    )[:5]
    assert np.allclose(oR1, rR1, atol=1e-8)
    assert np.allclose(oR2, rR2, atol=1e-8)
    # cc_new depends on undistorted corner positions; cv2's undistort stops
    # at 5 iterations (~0.25px residual), so pixel-scale agreement only.
    assert np.allclose(oP1, rP1, atol=0.05)
    assert np.allclose(oP2, rP2, atol=0.05)


def test_rectify_maps_match_cv2():
    R, t = _relative_pose()
    R1, R2, P1, P2, _ = stereo_rectify(K1, D1, K2, D2, SIZE, R, t)
    mx, my = init_undistort_rectify_map(K1, D1, R1, P1, SIZE)
    rmx, rmy = cv2.initUndistortRectifyMap(
        K1, D1, R1, P1[:3, :3] if P1.shape == (3, 3) else P1, SIZE, cv2.CV_32FC1
    )
    assert np.allclose(mx, rmx, atol=1e-2)
    assert np.allclose(my, rmy, atol=1e-2)


def test_remap_bilinear_matches_cv2():
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 255, (480, 752)).astype(np.float32)
    R, t = _relative_pose()
    rect = build_rectification(K1, D1, K2, D2, SIZE, R, t)
    ours = np.asarray(remap_bilinear(img, rect.map_lx, rect.map_ly))
    ref = cv2.remap(img, rect.map_lx, rect.map_ly, cv2.INTER_LINEAR,
                    borderMode=cv2.BORDER_CONSTANT, borderValue=0)
    # interior pixels should agree to float tolerance
    err = np.abs(ours - ref)
    assert np.quantile(err, 0.999) < 0.5


def test_rectified_pair_row_aligned():
    """A 3-D point projected through both rectified cameras lands on the
    same row — the property stereo matching depends on."""
    R, t = _relative_pose()
    R1, R2, P1, P2, _ = stereo_rectify(K1, D1, K2, D2, SIZE, R, t)
    rng = np.random.default_rng(4)
    X = rng.uniform([-1, -1, 2], [1, 1, 8], size=(50, 3))  # in cam1 frame
    Xr1 = X @ R1.T
    u1 = Xr1[:, :2] / Xr1[:, 2:3] * P1[0, 0] + P1[:2, 2]
    X2 = X @ R.T + t.ravel()
    Xr2 = X2 @ R2.T  # equals Xr1 + t_new: R2 @ R == R1
    u2 = Xr2[:, :2] / Xr2[:, 2:3] * P2[0, 0] + P2[:2, 2]
    assert np.allclose(u1[:, 1], u2[:, 1], atol=1e-6)
    # disparity positive and consistent with depth
    disp = u1[:, 0] - u2[:, 0]
    assert np.all(disp > 0)
    depth = abs(P2[0, 3]) / disp
    assert np.allclose(depth, Xr1[:, 2], rtol=1e-6)


def test_settings_builds_rectification():
    """New-style Camera1/Camera2 + Stereo.T_c1_c2 config (the real EuRoC
    calibration) produces rectification maps and a rectified camera with
    ~0.11m baseline (reference: Settings needToRectify path)."""
    import os

    from orb_slam3_modified_tpu.io.settings import load_settings

    cfg = os.path.join(os.path.dirname(__file__), "..", "configs",
                       "euroc_stereo.yaml")
    st = load_settings(cfg)
    assert st.rect is not None
    assert st.dist is None  # consumed by rectification
    assert 45.0 < st.baseline < 55.0  # 0.110m * ~457px
    assert st.rect.map_lx.shape == (480, 752)
    # rectified intrinsics took over the camera
    assert abs(float(np.asarray(st.cam.params)[0]) - st.rect.fx) < 1e-3


def test_settings_mono_distortion():
    """Legacy-style mono config with Camera.k1.. yields dist coefficients."""
    import tempfile

    from orb_slam3_modified_tpu.io.settings import load_settings

    text = """%YAML:1.0
---
Camera.type: "PinHole"
Camera.fx: 458.654
Camera.fy: 457.296
Camera.cx: 367.215
Camera.cy: 248.375
Camera.k1: -0.28340811
Camera.k2: 0.07395907
Camera.p1: 0.00019359
Camera.p2: 1.76187114e-05
Camera.width: 752
Camera.height: 480
Camera.fps: 20
Camera.RGB: 1
ORBextractor.nFeatures: 1000
"""
    with tempfile.NamedTemporaryFile("w", suffix=".yaml", delete=False) as f:
        f.write(text)
        path = f.name
    st = load_settings(path)
    assert st.rect is None
    assert st.dist is not None and abs(st.dist[0] + 0.28340811) < 1e-9


def test_system_undistorts_keypoints():
    """SlamSystem with dist set moves extracted keypoint coords by the
    undistortion (Frame::UndistortKeyPoints parity)."""
    from orb_slam3_modified_tpu.cameras import Camera
    from orb_slam3_modified_tpu.system.slam_system import (
        SlamSystem,
        SystemConfig,
    )

    rng = np.random.default_rng(5)
    img = rng.uniform(0, 255, (480, 752)).astype(np.float32)
    cam = Camera.pinhole(458.654, 457.296, 367.215, 248.375,
                         width=752, height=480)
    sys_plain = SlamSystem(SystemConfig(cam=cam, feat_cap=256,
                                        use_loop_closing=False))
    sys_dist = SlamSystem(SystemConfig(cam=cam, feat_cap=256,
                                       use_loop_closing=False, dist=D1))
    from orb_slam3_modified_tpu.features.extractor import extract

    feats = extract(img, sys_dist.ecfg)
    f_plain = sys_plain._post_extract(feats)
    f_und = sys_dist._post_extract(feats)
    uv0 = np.asarray(f_plain.uv)[np.asarray(feats.valid)]
    uv1 = np.asarray(f_und.uv)[np.asarray(feats.valid)]
    ref = undistort_points(uv0, K1, D1, P=K1)
    assert np.abs(uv1 - ref).max() < 0.05
    assert np.abs(uv1 - uv0).max() > 1.0  # it actually moved things
