"""Map checkpoint/resume roundtrip."""
import numpy as np
import pytest

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


def test_load_atlas_rebuilds_preintegrations(tmp_path, rng):
    """A resumed VI session must have inertial edges immediately: the
    saved raw IMU windows are reintegrated at the stored per-KF biases
    on load (reference Preintegrated serialization,
    include/ImuTypes.h:184-208)."""
    from plvio_tpu.config import SystemConfig, CameraConfig, ImuConfig, Sensor
    from plvio_tpu.models.system import System

    IDENT = tuple(np.eye(4).flatten().tolist())
    cfg = SystemConfig(sensor=Sensor.IMU_MONOCULAR,
                       camera=CameraConfig(dist=(0., 0., 0., 0.)),
                       imu=ImuConfig(Tbc=IDENT))
    src = System(cfg)
    m = src.atlas.current
    for _ in range(3):
        m.alloc_kf()
    n = 12
    m.kf_imu_raw[1] = (rng.normal(0, 0.01, (n, 3)).astype(np.float32),
                       (rng.normal(0, 0.01, (n, 3))
                        + [0, 0, 9.81]).astype(np.float32),
                       np.full(n, 0.005, np.float32))
    m.kf_bias_g[1] = [0.01, -0.02, 0.005]
    m.kf_bias_a[1] = [0.05, 0.0, -0.03]
    m.imu_initialized = True
    src.save_atlas(str(tmp_path / "atlas"))

    dst = System(cfg)
    dst.load_atlas(str(tmp_path / "atlas"))
    m2 = dst.atlas.current
    assert 1 in m2.kf_preint, "preintegration not rebuilt on load"
    p = m2.kf_preint[1]
    assert float(p.dT) == pytest.approx(n * 0.005, rel=1e-5)
    # reintegrated at the stored bias
    np.testing.assert_allclose(np.asarray(p.bias_gyro),
                               m.kf_bias_g[1], atol=1e-6)
