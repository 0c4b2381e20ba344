"""Prior-map relocalization end-to-end against the reference's shipped
prior keyframe sets.

The reference fork's new feature is a Relocalization thread that aligns
the live session to a prior RGB-D keyframe set and re-expresses keyframe
poses in the prior world (reference: src/Relocalization/Relocalization.cpp
:16-62 LoadImages, :100-170 Run, :298-313 UpdatePose3;
src/System.cc:959 SaveKeyFrameTrajectoryByRelocalization).  The actual
prior sets it ships are mounted at /root/reference/data and data2
(color/<i+1>.png, depth/<i+1>.pgm, pose.txt with x y z qx qy qz qw rows,
prior intrinsics hardcoded at Relocalization.cpp:8).

These tests drive our PriorMapRelocalizer on that real data: the live
map's keyframes carry features extracted from the same color images but
poses expressed in a rigidly-offset "live" world; the relocalizer must
recover the offset from BoW retrieval + descriptor matching + PnP on
depth-backprojected prior points, then export an R_KeyFrameTrajectory-
convention TUM file.
"""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from plvio_tpu.config import SystemConfig, CameraConfig, RelocConfig
from plvio_tpu.io import trajectory as TIO
from plvio_tpu.io.euroc import load_image_gray
from plvio_tpu.models import vocabulary as V
from plvio_tpu.models.mapstore import Atlas, MapStore
from plvio_tpu.models.relocalization import PriorMapRelocalizer
from plvio_tpu.ops import frontend as FE
from plvio_tpu.ops import matching as M
from plvio_tpu.utils import lie

DATA = "/root/reference/data"
REF_TRAJ = "/root/reference/R_KeyFrameTrajectory.txt"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference prior data not mounted")


def _prior_cfg():
    # live camera = the prior set's camera (640x480 RGB-D rig)
    return SystemConfig(
        camera=CameraConfig(width=640, height=480, fx=518.0, fy=519.0,
                            cx=325.5, cy=253.5, dist=()),
        reloc=RelocConfig(enabled=True, prior_data_dir=DATA))


def test_load_prior_dir_real_data():
    """All 5 shipped prior frames load: real features, real depth,
    plausible backprojected structure."""
    cfg = _prior_cfg()
    voc = V.random_vocabulary(seed=0, k=10, depth=4)
    atlas = Atlas()
    r = PriorMapRelocalizer(cfg, atlas, voc, atlas.current.n_feat)
    assert r.load_prior_dir(DATA) == 5
    for p in r.prior_frames:
        assert p.valid.sum() > 200       # real image -> real keypoints
        assert p.has_depth.sum() > 100   # most keypoints carry depth
        # backprojected points sit at sane camera distances (indoor rig)
        cam_pos = p.T_wc[:, 3]
        d = np.linalg.norm(p.xyz_w[p.has_depth] - cam_pos, axis=1)
        assert np.median(d) > 0.3 and np.median(d) < 10.0


def test_prior_reloc_alignment_and_export(tmp_path):
    cfg = _prior_cfg()
    voc = V.random_vocabulary(seed=0, k=10, depth=4)
    extract, specs = FE.make_extractor(480, 640, cfg.orb.n_features)
    n_feat = sum(s.n_keep for s in specs)
    atlas = Atlas(maps=[MapStore(max_kf=16, n_feat=n_feat)])
    r = PriorMapRelocalizer(cfg, atlas, voc, n_feat)
    assert r.load_prior_dir(DATA) == 5

    # known rigid offset between the live world and the prior world
    # (0.4 rad about a unit axis + a translation)
    axis = np.array([0.36, -0.48, 0.8], np.float32)
    R_lp = np.asarray(lie.quat_to_rot(jnp.asarray(
        np.concatenate([np.sin(0.2) * axis, [np.cos(0.2)]]), jnp.float32)),
        np.float32)
    t_lp = np.array([0.3, -0.2, 0.5], np.float32)

    m = atlas.current
    m.imu_ba2 = True   # maturity gate (reference aligns once BA2 is done)
    kfs = []
    for i in range(5):
        img = load_image_gray(os.path.join(DATA, "color", f"{i + 1}.png"))
        f = extract(jnp.asarray(img, jnp.float32))
        kf = m.alloc_kf()
        m.kf_feat_uv[kf] = np.asarray(f.uv)
        m.kf_feat_valid[kf] = np.asarray(f.valid)
        m.kf_feat_desc[kf] = np.asarray(M.pack_bits_u32(f.desc))
        p = r.prior_frames[i]
        R_wc, t_wc = p.T_wc[:, :3], p.T_wc[:, 3]
        R_lc = R_lp @ R_wc                     # camera in live world
        t_lc = R_lp @ t_wc + t_lp
        m.kf_pose_cw[kf, :, :3] = R_lc.T
        m.kf_pose_cw[kf, :, 3] = -R_lc.T @ t_lc
        m.kf_timestamp[kf] = float(i)
        kfs.append(kf)

    for i, kf in enumerate(kfs):
        r.process_keyframe(kf, float(i))

    assert r.T_prior_from_live is not None, "alignment failed on real data"
    R_T, t_T = r.T_prior_from_live[:, :3], r.T_prior_from_live[:, 3]
    # T_prior_from_live must invert the synthetic offset
    ang = np.arccos(np.clip((np.trace(R_T @ R_lp) - 1) / 2, -1, 1))
    assert ang < 0.05, f"rotation error {np.degrees(ang):.2f} deg"
    t_true = -R_lp.T @ t_lp
    assert np.linalg.norm(t_T - t_true) < 0.08

    # every keyframe lands back on its own prior pose
    for i in range(5):
        T = r.relocalized_poses[float(i)]
        p = r.prior_frames[i]
        assert np.linalg.norm(T[:, 3] - p.T_wc[:, 3]) < 0.10
        ang_i = np.arccos(np.clip(
            (np.trace(T[:, :3].T @ p.T_wc[:, :3]) - 1) / 2, -1, 1))
        assert ang_i < 0.06

    # exported file matches the committed R_KeyFrameTrajectory.txt
    # convention: TUM rows `t x y z qx qy qz qw`
    out = tmp_path / "R_KeyFrameTrajectory.txt"
    r.save_trajectory(str(out))
    traj = TIO.read_tum(str(out))
    assert len(traj) == 5
    with open(out) as f:
        got_cols = len(f.readline().split())
    assert got_cols == 8
    if os.path.exists(REF_TRAJ):
        with open(REF_TRAJ) as f:
            ref_cols = len(f.readline().split())
        assert got_cols == ref_cols


def test_load_prior_dir_data2():
    """The second shipped prior set loads through the same path."""
    data2 = "/root/reference/data2"
    if not os.path.isdir(data2):
        pytest.skip("data2 not mounted")
    cfg = _prior_cfg()
    voc = V.random_vocabulary(seed=0, k=10, depth=4)
    atlas = Atlas()
    r = PriorMapRelocalizer(cfg, atlas, voc, atlas.current.n_feat)
    assert r.load_prior_dir(data2) >= 1
    assert all(p.valid.sum() > 100 for p in r.prior_frames)
