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
    sensor: str = "monocular"


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
    if str(cam_type).lower().startswith(("kannala", "fisheye")):
        k0 = float(get(f"{prefix}.k1", 0.0))
        k1 = float(get(f"{prefix}.k2", 0.0))
        k2 = float(get(f"{prefix}.k3", 0.0))
        k3 = float(get(f"{prefix}.k4", 0.0))
        cam = Camera.kb8(fx, fy, cx, cy, k0, k1, k2, k3, width=w, height=h)
    else:
        cam = Camera.pinhole(fx, fy, cx, cy, width=w, height=h)

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

    return Settings(
        cam=cam,
        extractor=ext,
        imu=imu,
        fps=float(get("Camera.fps", get("Camera.fps", 20.0)) or 20.0),
        rgb=bool(int(get("Camera.RGB", 1) or 1)),
        baseline=float(get("Camera.bf", get("Stereo.b", 0.0)) or 0.0),
        th_depth=float(get("ThDepth", get("Stereo.ThDepth", 35.0)) or 35.0),
    )
