"""Map checkpoint/resume roundtrip."""
import numpy as np

from plvio_tpu.models.mapstore import Atlas, MapStore
from plvio_tpu.models import serialization as S


def test_atlas_roundtrip(tmp_path, rng):
    m = MapStore(max_kf=16, max_pts=256, max_lines=64, n_feat=64,
                 n_line_feat=16)
    for _ in range(3):
        kf = m.alloc_kf()
        m.kf_pose_cw[kf] = rng.normal(size=(3, 4)).astype(np.float32)
        m.kf_feat_uv[kf] = rng.uniform(0, 700, (64, 2)).astype(np.float32)
        m.kf_feat_valid[kf] = rng.random(64) > 0.3
    pts = m.alloc_points(40)
    m.pt_xyz[pts] = rng.normal(size=(40, 3)).astype(np.float32)
    m.kf_match_pt[0, :40] = pts
    m.update_covisibility(0)
    m.imu_initialized = True
    m.kf_imu_raw[1] = (rng.normal(size=(10, 3)).astype(np.float32),
                       rng.normal(size=(10, 3)).astype(np.float32),
                       np.full(10, 0.005, np.float32))

    atlas = Atlas(maps=[m], active=0)
    S.save_atlas(atlas, str(tmp_path / "ckpt"))
    atlas2 = S.load_atlas(str(tmp_path / "ckpt"))
    m2 = atlas2.current
    np.testing.assert_array_equal(m2.kf_pose_cw, m.kf_pose_cw)
    np.testing.assert_array_equal(m2.pt_xyz, m.pt_xyz)
    np.testing.assert_array_equal(m2.kf_match_pt, m.kf_match_pt)
    np.testing.assert_array_equal(m2.covis, m.covis)
    assert m2.imu_initialized == m.imu_initialized
    assert m2.n_kf == m.n_kf and m2.n_pt == m.n_pt
    np.testing.assert_array_equal(m2.kf_imu_raw[1][0], m.kf_imu_raw[1][0])
