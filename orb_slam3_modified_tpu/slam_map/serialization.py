"""Atlas checkpoint / resume.

TPU-native replacement for System::SaveAtlas/LoadAtlas (reference:
src/System.cc:1443,1487 — boost binary archives with PreSave/PostLoad
pointer<->id swizzling, include/Atlas.h:127-128, vocab MD5 gate :1550).

The SoA map needs none of the reference's swizzling machinery: the arena IS
flat arrays, so a checkpoint is a single compressed npz plus a small JSON
manifest with a vocabulary checksum.
"""
from __future__ import annotations

import dataclasses
import hashlib
import json
import os

import numpy as np

from .map_state import MapState

FORMAT_VERSION = 1


def _voc_checksum(voc) -> str:
    if voc is None:
        return ""
    h = hashlib.md5()
    h.update(voc.node_desc.tobytes())
    h.update(voc.word_weight.tobytes())
    return h.hexdigest()


def save_atlas(path: str, m: MapState, voc=None, extra: dict | None = None):
    """Write <path>.npz + <path>.json manifest."""
    arrays = {
        f.name: getattr(m, f.name)
        for f in dataclasses.fields(m)
        if isinstance(getattr(m, f.name), np.ndarray)
    }
    np.savez_compressed(path + ".npz", **arrays)
    manifest = {
        "format_version": FORMAT_VERSION,
        "voc_md5": _voc_checksum(voc),
        "active_map": int(m.active_map),
        "n_maps": int(m.n_maps),
        "n_inertial_ba": int(m.n_inertial_ba),
        "imu_initialized": bool(m.imu_initialized),
        # persistent loop/merge edges (reference: KeyFrame::AddLoopEdge is
        # serialized with the keyframe and survives Save/LoadAtlas)
        "loop_edges": [[int(x) for x in e] for e in m.loop_edges],
        "extra": extra or {},
    }
    with open(path + ".json", "w") as f:
        json.dump(manifest, f, indent=2)


def load_atlas(path: str, voc=None, check_vocab: bool = True) -> MapState:
    with open(path + ".json") as f:
        manifest = json.load(f)
    if manifest["format_version"] != FORMAT_VERSION:
        raise ValueError(f"unsupported atlas format {manifest['format_version']}")
    if check_vocab and voc is not None and manifest["voc_md5"]:
        if manifest["voc_md5"] != _voc_checksum(voc):
            raise ValueError(
                "vocabulary checksum mismatch — atlas was built with a "
                "different vocabulary (reference gate: src/System.cc:1522)"
            )
    data = np.load(path + ".npz")
    kwargs = {k: data[k] for k in data.files}
    m = MapState(
        **kwargs,
        active_map=manifest["active_map"],
        n_maps=manifest["n_maps"],
        n_inertial_ba=manifest["n_inertial_ba"],
        imu_initialized=manifest["imu_initialized"],
        loop_edges=[tuple(e) for e in manifest.get("loop_edges", [])],
    )
    return m
