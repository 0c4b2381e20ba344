"""ctypes bindings for the native host runtime (libmapops.so).

Builds on demand with the in-tree Makefile; every entry point has a pure
numpy fallback so the package works without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(__file__)
_LIB_PATH = os.path.join(_DIR, "libmapops.so")
_lib: Optional[ctypes.CDLL] = None


def _ensure_built() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _DIR, "-s"], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.covis_row.argtypes = [i32p, i32p, u8p] + [ctypes.c_int32] * 6 + [i32p]
    lib.covis_row.restype = None
    lib.build_obs_table.argtypes = [
        i32p, ctypes.c_int32, i32p, ctypes.c_int32, i32p, f32p, i32p,
        ctypes.c_int32, ctypes.c_float, ctypes.c_int32, i32p, i32p, f32p, f32p]
    lib.build_obs_table.restype = ctypes.c_int32
    lib.compact_valid.argtypes = [i32p, ctypes.c_int32, u8p,
                                  ctypes.c_int32, i32p]
    lib.compact_valid.restype = ctypes.c_int32
    _lib = lib
    return _lib


def available() -> bool:
    return _ensure_built() is not None


def covis_row(match_pt: np.ndarray, match_ln: np.ndarray,
              kf_valid: np.ndarray, kf: int,
              max_pts: int, max_lines: int) -> np.ndarray:
    """Native covisibility row; falls back to vectorized numpy."""
    lib = _ensure_built()
    K, F = match_pt.shape
    L = match_ln.shape[1]
    if lib is not None:
        out = np.zeros(K, np.int32)
        lib.covis_row(np.ascontiguousarray(match_pt, np.int32),
                      np.ascontiguousarray(match_ln, np.int32),
                      np.ascontiguousarray(kf_valid, np.uint8),
                      K, F, L, max_pts, max_lines, kf, out)
        return out
    # numpy fallback
    counts = np.zeros(K, np.int32)
    pts = match_pt[kf]
    pts = pts[pts >= 0]
    if len(pts):
        member = np.zeros(max_pts, bool)
        member[pts] = True
        hit = (match_pt >= 0) & member[np.clip(match_pt, 0, max_pts - 1)]
        counts += hit.sum(axis=1, dtype=np.int32)
    lns = match_ln[kf]
    lns = lns[lns >= 0]
    if len(lns):
        member = np.zeros(max_lines, bool)
        member[lns] = True
        hit = (match_ln >= 0) & member[np.clip(match_ln, 0, max_lines - 1)]
        counts += hit.sum(axis=1, dtype=np.int32)
    counts[~kf_valid.astype(bool)] = 0
    counts[kf] = 0
    return counts


def build_obs_table(window: np.ndarray, pt_slot: np.ndarray,
                    match_pt: np.ndarray, feat_uv: np.ndarray,
                    feat_oct: np.ndarray, scale_factor: float, cap: int):
    """Native BA observation-table build.  Returns (n, obs_kf, obs_pt,
    obs_uv, obs_is2) with padded fixed-size arrays."""
    lib = _ensure_built()
    obs_kf = np.zeros(cap, np.int32)
    obs_pt = np.zeros(cap, np.int32)
    obs_uv = np.zeros((cap, 2), np.float32)
    obs_is2 = np.zeros(cap, np.float32)
    if lib is not None:
        n = lib.build_obs_table(
            np.ascontiguousarray(window, np.int32), len(window),
            np.ascontiguousarray(pt_slot, np.int32), len(pt_slot),
            np.ascontiguousarray(match_pt, np.int32),
            np.ascontiguousarray(feat_uv, np.float32),
            np.ascontiguousarray(feat_oct, np.int32), match_pt.shape[1],
            float(scale_factor), cap, obs_kf, obs_pt,
            obs_uv.reshape(-1), obs_is2)
        return int(n), obs_kf, obs_pt, obs_uv, obs_is2
    # numpy fallback
    n = 0
    for w, k in enumerate(window):
        match = match_pt[k]
        feat = np.nonzero((match >= 0) & (pt_slot[np.clip(match, 0, len(pt_slot) - 1)] >= 0))[0]
        take = feat[:cap - n]
        m = len(take)
        if m == 0:
            continue
        obs_kf[n:n + m] = w
        obs_pt[n:n + m] = pt_slot[match[take]]
        obs_uv[n:n + m] = feat_uv[k, take]
        obs_is2[n:n + m] = 1.0 / scale_factor ** (2.0 * feat_oct[k, take])
        n += m
        if n >= cap:
            break
    return n, obs_kf, obs_pt, obs_uv, obs_is2
