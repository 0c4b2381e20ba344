"""Map checkpoint / resume.

The reference scaffolds boost-serialization of the whole Atlas but ships
it disabled (reference: SaveAtlas/LoadAtlas commented out,
src/System.cc:115-191; serialize() members across include/KeyFrame.h:149-
230, include/Atlas.h:57-76).  In the array-native design the entire map
state IS a dict of numpy arrays, so checkpointing is one compressed npz
per map — trivially exact, versioned, and resumable.
"""
from __future__ import annotations

import json
import os
from typing import Dict

import numpy as np

from .mapstore import Atlas, MapStore

FORMAT_VERSION = 1

_ARRAY_FIELDS = [
    "kf_valid", "kf_timestamp", "kf_pose_cw", "kf_pose_wb", "kf_vel",
    "kf_bias_g", "kf_bias_a", "kf_feat_uv", "kf_feat_uv_raw",
    "kf_feat_octave",
    "kf_feat_angle", "kf_feat_desc", "kf_feat_valid", "kf_match_pt",
    "kf_line_ep", "kf_line_desc", "kf_line_valid", "kf_match_ln",
    "kf_prev", "kf_next",
    "pt_valid", "pt_xyz", "pt_desc", "pt_normal", "pt_min_dist",
    "pt_max_dist", "pt_first_kf", "pt_n_obs", "pt_found", "pt_visible",
    "ln_valid", "ln_ep", "ln_desc", "ln_first_kf", "ln_n_obs",
    "ln_found", "ln_visible", "covis",
]
_SCALAR_FIELDS = ["map_id", "n_kf", "n_pt", "n_ln", "change_index",
                  "imu_initialized", "imu_ba1", "imu_ba2"]


def save_map(m: MapStore, path: str) -> None:
    arrays = {k: getattr(m, k) for k in _ARRAY_FIELDS}
    # preintegration windows: stacked raw IMU per KF
    for kf, raw in m.kf_imu_raw.items():
        arrays[f"imu_raw_g_{kf}"] = raw[0]
        arrays[f"imu_raw_a_{kf}"] = raw[1]
        arrays[f"imu_raw_d_{kf}"] = raw[2]
    meta = {k: (bool(getattr(m, k)) if isinstance(getattr(m, k), (bool, np.bool_))
                else int(getattr(m, k))) for k in _SCALAR_FIELDS}
    meta["version"] = FORMAT_VERSION
    meta["caps"] = dict(max_kf=m.max_kf, max_pts=m.max_pts,
                        max_lines=m.max_lines, n_feat=m.n_feat,
                        n_line_feat=m.n_line_feat)
    meta["imu_raw_kfs"] = sorted(int(k) for k in m.kf_imu_raw)
    np.savez_compressed(path, __meta__=json.dumps(meta), **arrays)


def load_map(path: str) -> MapStore:
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    assert meta["version"] == FORMAT_VERSION
    caps = meta["caps"]
    m = MapStore(max_kf=caps["max_kf"], max_pts=caps["max_pts"],
                 max_lines=caps["max_lines"], n_feat=caps["n_feat"],
                 n_line_feat=caps["n_line_feat"], map_id=meta["map_id"])
    for k in _ARRAY_FIELDS:
        if k in data.files:
            getattr(m, k)[...] = data[k]
    if "kf_feat_uv_raw" not in data.files:   # pre-raw-uv checkpoints
        m.kf_feat_uv_raw[...] = m.kf_feat_uv
    for k in _SCALAR_FIELDS:
        setattr(m, k, meta[k])
    for kf in meta.get("imu_raw_kfs", []):
        m.kf_imu_raw[kf] = (data[f"imu_raw_g_{kf}"],
                            data[f"imu_raw_a_{kf}"],
                            data[f"imu_raw_d_{kf}"])
    return m


def save_atlas(atlas: Atlas, directory: str) -> None:
    os.makedirs(directory, exist_ok=True)
    meta = {"n_maps": len(atlas.maps), "active": atlas.active}
    with open(os.path.join(directory, "atlas.json"), "w") as f:
        json.dump(meta, f)
    for i, m in enumerate(atlas.maps):
        save_map(m, os.path.join(directory, f"map_{i}.npz"))


def load_atlas(directory: str) -> Atlas:
    with open(os.path.join(directory, "atlas.json")) as f:
        meta = json.load(f)
    maps = [load_map(os.path.join(directory, f"map_{i}.npz"))
            for i in range(meta["n_maps"])]
    a = Atlas(maps=maps, active=meta["active"])
    return a
