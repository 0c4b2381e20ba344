"""Native C++ runtime (libmapops.so) vs numpy reference parity."""
import numpy as np
import pytest

from plvio_tpu import native
from plvio_tpu.models.mapstore import MapStore


def test_native_builds():
    assert native.available(), "libmapops.so failed to build"


def test_covis_row_parity(rng):
    K, F, L = 32, 128, 32
    max_pts, max_lines = 512, 128
    match_pt = rng.integers(-1, max_pts, (K, F)).astype(np.int32)
    match_ln = rng.integers(-1, max_lines, (K, L)).astype(np.int32)
    kf_valid = (rng.random(K) > 0.2).astype(np.uint8)
    kf_valid[5] = 1
    out_c = native.covis_row(match_pt, match_ln, kf_valid, 5,
                             max_pts, max_lines)
    # numpy reference through the MapStore path
    m = MapStore(max_kf=K, max_pts=max_pts, max_lines=max_lines,
                 n_feat=F, n_line_feat=L)
    m.kf_match_pt[...] = match_pt
    m.kf_match_ln[...] = match_ln
    m.kf_valid[...] = kf_valid.astype(bool)
    m.update_covisibility(5)
    np.testing.assert_array_equal(out_c, m.covis[5])


def test_build_obs_table_parity(rng):
    K, F = 8, 64
    max_pts = 256
    match_pt = rng.integers(-1, max_pts, (K, F)).astype(np.int32)
    feat_uv = rng.uniform(0, 700, (K, F, 2)).astype(np.float32)
    feat_oct = rng.integers(0, 8, (K, F)).astype(np.int32)
    window = np.array([1, 3, 6], np.int32)
    pt_slot = np.full(max_pts, -1, np.int32)
    chosen = rng.choice(max_pts, 100, replace=False)
    pt_slot[chosen] = np.arange(100)
    cap = 512
    n, okf, opt, ouv, ois2 = native.build_obs_table(
        window, pt_slot, match_pt, feat_uv, feat_oct, 1.2, cap)
    assert n > 0
    # verify against direct recomputation
    exp = []
    for w, k in enumerate(window):
        for i in range(F):
            p = match_pt[k, i]
            if p >= 0 and pt_slot[p] >= 0:
                exp.append((w, pt_slot[p], feat_uv[k, i, 0], feat_uv[k, i, 1],
                            1.0 / 1.2 ** (2.0 * feat_oct[k, i])))
    exp = exp[:cap]
    assert n == len(exp)
    for j, (w, slot, u, v, is2) in enumerate(exp):
        assert okf[j] == w
        assert opt[j] == slot
        np.testing.assert_allclose(ouv[j], [u, v], rtol=1e-6)
        np.testing.assert_allclose(ois2[j], is2, rtol=1e-4)
