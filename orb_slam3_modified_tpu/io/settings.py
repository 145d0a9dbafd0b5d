"""Settings / configuration parsing.

TPU-native replacement for the reference's YAML config system (reference:
include/Settings.h:44-121 new-style "File.version 1.0" configs, and the
legacy per-key parsing in Tracking::ParseCamParamFile src/Tracking.cc:621,
ParseORBParamFile :1219, ParseIMUParamFile :1303).

Parses BOTH generations of the reference YAML schema (the example configs in
Examples/*/EuRoC.yaml etc. use the OpenCV-YAML dialect with a %YAML directive
and Camera.fx-style dotted keys), producing Camera / extractor / IMU configs.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import yaml

from ..cameras import Camera
from ..features.extractor import ExtractorConfig


@dataclasses.dataclass
class ImuSettings:
    noise_gyro: float
    noise_acc: float
    walk_gyro: float
    walk_acc: float
    freq: float
    T_bc: np.ndarray  # (4, 4) camera-to-body


@dataclasses.dataclass
class Settings:
    cam: Camera
    extractor: ExtractorConfig
    imu: Optional[ImuSettings]
    fps: float
    rgb: bool
    baseline: float = 0.0  # stereo: b*fx (ThDepth domain)
    th_depth: float = 35.0
    # discard depth/stereo points beyond this range (meters); 0 = disabled
    # (reference: thFarPoints YAML flag, src/System.cc:199-209)
    th_far_points: float = 0.0
    sensor: str = "monocular"
    # pinhole radtan distortion (k1,k2,p1,p2,k3) of the (left) camera; None
    # when the images are pre-rectified or the model is KB8
    dist: Optional[np.ndarray] = None
    # stereo rectification maps (reference Settings.h:44-121 needToRectify);
    # when set, `cam`/`baseline` already describe the rectified pair
    rect: object = None
    # non-rectified (KB8 fisheye) stereo rig: right camera + left->right
    # extrinsics (reference: Settings KannalaBrandt stereo branch — no
    # rectification, ComputeStereoFishEyeMatches src/Frame.cc:1126)
    cam_right: object = None
    T_rl: Optional[np.ndarray] = None  # (4,4): p_right = R p_left + t


def _cv_mat(d, key):
    """Parse an opencv-matrix node ({rows, cols, data}) if present."""
    v = d.get(key)
    if isinstance(v, dict) and "data" in v:
        rows = int(v.get("rows", 1))
        cols = int(v.get("cols", len(v["data"]) // max(rows, 1)))
        return np.array(v["data"], np.float64).reshape(rows, cols)
    if isinstance(v, (list, tuple)):
        return np.array(v, np.float64)
    return None


def _load_opencv_yaml(path: str) -> dict:
    """OpenCV FileStorage YAML: strip the %YAML:1.0 directive, keep dotted keys."""
    with open(path) as f:
        text = f.read()
    lines = [
        ln for ln in text.splitlines()
        if not ln.startswith("%YAML") and not ln.strip() == "---"
    ]
    # opencv matrices appear as '!!opencv-matrix' tagged maps; neutralize tags
    text = "\n".join(lines).replace("!!opencv-matrix", "")
    return yaml.safe_load(text) or {}


def load_settings(path: str) -> Settings:
    d = _load_opencv_yaml(path)

    def get(key, default=None):
        if key in d:
            return d[key]
        # new-style nested access (File.version 1.0 uses same dotted keys)
        return default

    version = str(get("File.version", ""))
    cam_type = get("Camera.type", get("Camera1.type", "PinHole"))
    prefix = "Camera" if "Camera.fx" in d else "Camera1"
    fx = float(get(f"{prefix}.fx", 458.654))
    fy = float(get(f"{prefix}.fy", 457.296))
    cx = float(get(f"{prefix}.cx", 367.215))
    cy = float(get(f"{prefix}.cy", 248.375))
    w = int(get("Camera.width", get("Camera1.width", 752)))
    h = int(get("Camera.height", get("Camera1.height", 480)))
    dist = None
    rect = None
    cam_right = None
    T_rl = None
    is_kb8 = str(cam_type).lower().startswith(("kannala", "fisheye"))
    if is_kb8:
        k0 = float(get(f"{prefix}.k1", 0.0))
        k1 = float(get(f"{prefix}.k2", 0.0))
        k2 = float(get(f"{prefix}.k3", 0.0))
        k3 = float(get(f"{prefix}.k4", 0.0))
        cam = Camera.kb8(fx, fy, cx, cy, k0, k1, k2, k3, width=w, height=h)
        if "Camera2.fx" in d:
            # KB8 stereo rig (TUM-VI style): no rectification — the right
            # camera + T_c1_c2 drive general left<->right bearing matching
            # (reference: Settings KannalaBrandt8 branch keeps both cameras,
            # include/Settings.h:44-121; ComputeStereoFishEyeMatches
            # src/Frame.cc:1126)
            cam_right = Camera.kb8(
                float(d["Camera2.fx"]), float(d["Camera2.fy"]),
                float(d["Camera2.cx"]), float(d["Camera2.cy"]),
                float(d.get("Camera2.k1", 0.0) or 0.0),
                float(d.get("Camera2.k2", 0.0) or 0.0),
                float(d.get("Camera2.k3", 0.0) or 0.0),
                float(d.get("Camera2.k4", 0.0) or 0.0),
                width=w, height=h,
            )
            T12 = _cv_mat(d, "Stereo.T_c1_c2")
            if T12 is not None:
                T12 = np.vstack([T12[:3], [0, 0, 0, 1.0]])
                # T_c1_c2 = pose of cam2 in cam1; we need p_r = R p_l + t
                Rrel = T12[:3, :3].T
                trel = -Rrel @ T12[:3, 3]
                T_rl = np.eye(4)
                T_rl[:3, :3] = Rrel
                T_rl[:3, 3] = trel
    else:
        cam = Camera.pinhole(fx, fy, cx, cy, width=w, height=h)
        dvec = np.array(
            [float(get(f"{prefix}.{k}", 0.0) or 0.0)
             for k in ("k1", "k2", "p1", "p2", "k3")], np.float64
        )
        if np.any(dvec != 0):
            dist = dvec

    # ---- stereo rectification (reference: include/Settings.h:44-121
    # needToRectify / precomputed LEFT./RIGHT. maps, src/Tracking.cc:621)
    lk = _cv_mat(d, "LEFT.K")
    if lk is not None:
        # legacy EuRoC stereo block: K/D/R/P given per camera
        from ..cameras.rectify import build_rectification_legacy

        size = (int(d.get("LEFT.width", w)), int(d.get("LEFT.height", h)))
        rect = build_rectification_legacy(
            lk, _cv_mat(d, "LEFT.D"), _cv_mat(d, "LEFT.R"), _cv_mat(d, "LEFT.P"),
            _cv_mat(d, "RIGHT.K"), _cv_mat(d, "RIGHT.D"),
            _cv_mat(d, "RIGHT.R"), _cv_mat(d, "RIGHT.P"), size,
        )
    elif "Camera2.fx" in d and dist is not None:
        # new-style two-pinhole-with-distortion rig: rectify from calibration
        from ..cameras.rectify import build_rectification

        K1m = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]])
        K2m = np.array(
            [[float(d["Camera2.fx"]), 0, float(d["Camera2.cx"])],
             [0, float(d["Camera2.fy"]), float(d["Camera2.cy"])],
             [0, 0, 1]]
        )
        D2 = np.array(
            [float(d.get(f"Camera2.{k}", 0.0) or 0.0)
             for k in ("k1", "k2", "p1", "p2", "k3")], np.float64
        )
        T12 = _cv_mat(d, "Stereo.T_c1_c2")
        if T12 is not None:
            T12 = np.vstack([T12[:3], [0, 0, 0, 1]])
            # x_c2 = R x_c1 + t with T_c1_c2 the pose of cam2 in cam1
            Rrel = T12[:3, :3].T
            trel = -Rrel @ T12[:3, 3]
            rect = build_rectification(K1m, dist, K2m, D2, (w, h), Rrel, trel)
    if rect is not None:
        # the pipeline sees the rectified pair: rectified intrinsics, no
        # distortion, metric bf from the rectified projection
        cam = Camera.pinhole(rect.fx, rect.fy, rect.cx, rect.cy,
                             width=w, height=h)
        dist = None

    ext = ExtractorConfig(
        n_features=int(get("ORBextractor.nFeatures", 1000)),
        n_levels=int(get("ORBextractor.nLevels", 8)),
        scale=float(get("ORBextractor.scaleFactor", 1.2)),
        ini_th=float(get("ORBextractor.iniThFAST", 20)),
        min_th=float(get("ORBextractor.minThFAST", 7)),
    )

    imu = None
    if "IMU.NoiseGyro" in d:
        Tbc = d.get("IMU.T_b_c1", d.get("Tbc"))
        if isinstance(Tbc, dict) and "data" in Tbc:
            Tbc = np.array(Tbc["data"], np.float64).reshape(4, 4)
        else:
            Tbc = np.eye(4)
        imu = ImuSettings(
            noise_gyro=float(d["IMU.NoiseGyro"]),
            noise_acc=float(d.get("IMU.NoiseAcc", 2e-3)),
            walk_gyro=float(d.get("IMU.GyroWalk", 1.9e-5)),
            walk_acc=float(d.get("IMU.AccWalk", 3e-3)),
            freq=float(d.get("IMU.Frequency", 200.0)),
            T_bc=Tbc,
        )

    baseline = float(get("Camera.bf", get("Stereo.b", 0.0)) or 0.0)
    if rect is not None and rect.bf > 0:
        baseline = rect.bf
    if T_rl is not None and baseline <= 0:
        # KB8 rig: bf from the stereo baseline and the left focal length
        # (reference: Settings::readCamera2 computes b from Tlr and bf = b*fx)
        baseline = float(np.linalg.norm(T_rl[:3, 3])) * fx
    return Settings(
        cam_right=cam_right,
        T_rl=T_rl,
        cam=cam,
        extractor=ext,
        imu=imu,
        fps=float(get("Camera.fps", get("Camera.fps", 20.0)) or 20.0),
        rgb=bool(int(get("Camera.RGB", 1) or 1)),
        baseline=baseline,
        th_depth=float(get("ThDepth", get("Stereo.ThDepth", 35.0)) or 35.0),
        th_far_points=float(get("thFarPoints", 0.0) or 0.0),
        dist=dist,
        rect=rect,
    )
