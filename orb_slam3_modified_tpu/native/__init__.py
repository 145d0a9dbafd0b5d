"""Native (C++) runtime components, loaded via ctypes with numpy fallbacks.

The reference's runtime is wholly native C++ (SURVEY.md §2); this package
holds the TPU framework's native pieces for host-side bookkeeping that
doesn't belong on the device. Built lazily with g++ on first use; every
entry point has a pure-numpy fallback so the framework runs without a
toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(__file__)
_LIB_PATH = os.path.join(_HERE, "libcovis.so")
_lib = None
_tried = False


def _build():
    src = os.path.join(_HERE, "covis.cc")
    # portable baseline ISA: the library may outlive the machine it was
    # built on (a checked-in or cached -march=native binary can SIGILL on
    # a different CPU); -O3 auto-vectorizes the hot loops regardless
    cmd = ["g++", "-O3", "-shared", "-fPIC", src, "-o", _LIB_PATH]
    subprocess.run(cmd, check=True, capture_output=True)


def _smoke_test(lib) -> bool:
    """One tiny call per entry point: a stale/foreign binary fails here
    instead of deep inside tracking."""
    obs = np.full((2, 4), -1, np.int32)
    obs[0, 0] = 0
    obs[1, 1] = 0
    valid = np.ones(2, bool)
    out = np.empty(2, np.int32)
    lib.covis_weights(obs, valid.view(np.uint8), 2, 4, 4, 0, out)
    return out[1] == 1 and out[0] == 0


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(
            _LIB_PATH
        ) < os.path.getmtime(os.path.join(_HERE, "covis.cc")):
            _build()
        lib = ctypes.CDLL(_LIB_PATH)
        i64 = ctypes.c_int64
        p32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        pu8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.covis_weights.argtypes = [p32, pu8, i64, i64, i64, i64, p32]
        lib.obs_counts.argtypes = [p32, pu8, i64, i64, i64, p32]
        lib.point_observers.argtypes = [p32, pu8, i64, i64, i64, p32, i64, pu8]
        lib.observers_of_point.argtypes = [p32, pu8, i64, i64, ctypes.c_int32, p32, p32, i64]
        lib.observers_of_point.restype = i64
        if not _smoke_test(lib):
            raise RuntimeError("native covis smoke test failed")
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def covis_weights(obs: np.ndarray, valid: np.ndarray, n_points: int, k: int):
    lib = get_lib()
    K, F = obs.shape
    if lib is None:
        return None
    out = np.empty(K, np.int32)
    lib.covis_weights(
        np.ascontiguousarray(obs), np.ascontiguousarray(valid.view(np.uint8)),
        K, F, n_points, k, out,
    )
    return out


def obs_counts(obs: np.ndarray, valid: np.ndarray, n_points: int):
    lib = get_lib()
    if lib is None:
        return None
    K, F = obs.shape
    out = np.empty(n_points, np.int32)
    lib.obs_counts(
        np.ascontiguousarray(obs), np.ascontiguousarray(valid.view(np.uint8)),
        K, F, n_points, out,
    )
    return out


def point_observers(obs: np.ndarray, valid: np.ndarray, n_points: int, pts: np.ndarray):
    lib = get_lib()
    if lib is None:
        return None
    K, F = obs.shape
    out = np.empty(K, np.uint8)
    pts32 = np.ascontiguousarray(pts.astype(np.int32))
    lib.point_observers(
        np.ascontiguousarray(obs), np.ascontiguousarray(valid.view(np.uint8)),
        K, F, n_points, pts32, len(pts32), out,
    )
    return out.astype(bool)
