"""KB8 fisheye NATIVE hot path: the projection matcher and pose
optimizer run against RAW (distorted) pixels through the equidistant
theta-polynomial (reference KannalaBrandt8::project/projectJac,
src/CameraModels/KannalaBrandt8.cpp — dispatched via GeometricCamera in
every matcher/optimizer).  TUM-VI-class coefficients."""
import numpy as np
import jax.numpy as jnp
import pytest

from plvio_tpu.config import SystemConfig, CameraConfig
from plvio_tpu.models import kernels as KN
from plvio_tpu.ops import matching as M
from plvio_tpu.solver.residuals import KB8K, kb8_project_single
from plvio_tpu.utils import lie

K8 = KB8K(fx=190.97, fy=190.9, cx=254.93, cy=256.9,
          k1=0.0034823894022493434, k2=0.0007150348452162257,
          k3=-0.0020532361418706202, k4=0.00020293673591811182)


def _project_np(pose, X):
    pc = X @ pose[:, :3].T + pose[:, 3]
    return np.asarray(jnp.stack([kb8_project_single(K8, jnp.asarray(p))
                                 for p in pc]))


def _scene(rng, n=200):
    """Wide-FOV cloud: many points at >60 deg off-axis, where a pinhole
    proxy of a fisheye is badly wrong."""
    theta = rng.uniform(0, 1.2, n)          # up to ~69 deg off-axis
    phi = rng.uniform(0, 2 * np.pi, n)
    d = rng.uniform(1.5, 5.0, n)
    X = np.stack([np.sin(theta) * np.cos(phi),
                  np.sin(theta) * np.sin(phi),
                  np.cos(theta)], -1) * d[:, None]
    return X.astype(np.float32)


def test_kb8_pose_optimizer_recovers_pose():
    rng = np.random.default_rng(0)
    X = _scene(rng)
    n = len(X)
    pose_true = np.concatenate(
        [np.asarray(lie.so3_exp(jnp.asarray([0.03, -0.05, 0.02]))),
         np.array([[0.1], [-0.1], [0.15]], np.float32)], 1).astype(np.float32)
    uv = _project_np(pose_true, X) + rng.normal(0, 0.3, (n, 2))

    dx = rng.normal(0, 0.03, 6).astype(np.float32)
    Rp, tp = lie.se3_exp(jnp.asarray(dx))
    pose0 = np.concatenate(
        [np.asarray(Rp) @ pose_true[:, :3],
         (np.asarray(Rp) @ pose_true[:, 3] + np.asarray(tp))[:, None]],
        1).astype(np.float32)

    cap = 256
    uv_p = np.zeros((cap, 2), np.float32)
    X_p = np.zeros((cap, 3), np.float32)
    v = np.zeros(cap, bool)
    uv_p[:n] = uv
    X_p[:n] = X
    v[:n] = True
    opt = KN.make_pose_optimizer_kb8(K8, cap)
    pose, inl, n_inl = opt(jnp.asarray(pose0), jnp.asarray(uv_p),
                           jnp.asarray(X_p), jnp.asarray(v),
                           jnp.ones(cap, jnp.float32))
    pose = np.asarray(pose)
    assert int(n_inl) > 0.9 * n
    ang = np.arccos(np.clip(
        (np.trace(pose[:, :3] @ pose_true[:, :3].T) - 1) / 2, -1, 1))
    assert ang < 2e-3, ang
    assert np.linalg.norm(pose[:, 3] - pose_true[:, 3]) < 5e-3


def test_kb8_projection_matcher_matches_raw_pixels():
    rng = np.random.default_rng(1)
    X = _scene(rng, 150)
    n = len(X)
    pose = np.concatenate([np.eye(3, dtype=np.float32),
                           np.zeros((3, 1), np.float32)], 1)
    uv_raw = _project_np(pose, X)
    inb = (uv_raw[:, 0] > 5) & (uv_raw[:, 0] < 505) \
        & (uv_raw[:, 1] > 5) & (uv_raw[:, 1] < 505)

    cap, n_feat = 256, 256
    desc = rng.integers(0, 2 ** 32, (n, 8), dtype=np.uint32)
    pt_xyz = np.zeros((cap, 3), np.float32)
    pt_desc = np.zeros((cap, 8), np.uint32)
    pt_valid = np.zeros(cap, bool)
    pt_xyz[:n] = X
    pt_desc[:n] = desc
    pt_valid[:n] = True
    feat_uv = np.zeros((n_feat, 2), np.float32)
    feat_desc = np.zeros((n_feat, 8), np.uint32)
    feat_valid = np.zeros(n_feat, bool)
    feat_uv[:n] = uv_raw + rng.normal(0, 0.5, (n, 2))
    feat_desc[:n] = desc            # identical descriptors = oracle match
    feat_valid[:n] = inb

    match = KN.make_projection_matcher_kb8(K8, n_feat, cap)
    uv_m, pt_feat, matched, feat_pt = match(
        jnp.asarray(pose), jnp.asarray(pt_xyz), jnp.asarray(pt_desc),
        jnp.asarray(pt_valid), jnp.asarray(feat_uv),
        jnp.asarray(feat_desc), jnp.zeros(n_feat, jnp.int32),
        jnp.asarray(feat_valid), jnp.float32(8.0))
    matched = np.asarray(matched)
    pt_feat_np = np.asarray(pt_feat)
    n_in = int(inb.sum())
    assert matched[:n][inb].sum() > 0.9 * n_in
    # matches land on the right features
    good = np.nonzero(matched[:n] & inb)[0]
    assert (pt_feat_np[good] == good).all()


def test_kb8_tracker_selects_native_kernels():
    from plvio_tpu.config import SystemConfig, CameraConfig
    from plvio_tpu.models.mapstore import Atlas
    from plvio_tpu.models.tracking import Tracker

    cfg = SystemConfig(camera=CameraConfig(
        model="kb8", width=512, height=512, fx=190.97, fy=190.9,
        cx=254.93, cy=256.9,
        dist=(0.0034823894, 0.00071503484, -0.0020532361, 0.00020293674)),
        use_lines=False)
    t = Tracker(cfg, Atlas(), 256)
    assert t.kb8 is not None
    assert abs(t.kb8.k3 + 0.0020532361) < 1e-9


@pytest.mark.slow
def test_kb8_fisheye_e2e_ate(rng):
    """Fisheye end-to-end: mono SLAM on KB8-rendered raw images with the
    native lens through the WHOLE stack — tracking (matcher + pose opt),
    triangulation on exact undistorted rays, and LBA with the
    equidistant reprojection edge on raw pixels (reference
    KannalaBrandt8::projectJac used by every optimizer edge,
    src/CameraModels/KannalaBrandt8.cpp)."""
    from plvio_tpu.io import synthetic as syn
    from plvio_tpu.io import trajectory as TIO
    from plvio_tpu.models.system import System
    from plvio_tpu.utils import lie
    import jax.numpy as jnp

    k = (0.01, -0.005, 0.002, 0.0)
    n_frames = 30
    scene = syn.make_room_scene(rng, n_points=4000, n_lines=10)
    traj = syn.make_orbit_trajectory(duration=n_frames / 20.0, fps=20.0,
                                     radius=0.6)
    cfg = SystemConfig(camera=CameraConfig(
        model="kb8", fx=380.0, fy=380.0, cx=376.0, cy=240.0, dist=k),
        use_lines=False)
    slam = System(cfg)
    # the BA kernels must carry the native lens, not the pinhole proxy
    from plvio_tpu.solver.residuals import KB8K
    assert isinstance(slam.mapper.ba_K, KB8K)
    assert isinstance(slam.loop_closer.ba_K, KB8K)

    n_ok = 0
    for i in range(n_frames):
        img = syn.render_frame_kb8(scene, traj.R_wb[i], traj.p_wb[i],
                                   k=k, rng=rng)
        pose = slam.track_monocular(img, traj.timestamps[i])
        n_ok += pose is not None
    assert n_ok >= n_frames - 5, f"only {n_ok}/{n_frames} frames tracked"

    est = slam.trajectory()
    q = np.asarray(lie.rot_to_quat(jnp.asarray(traj.R_wb, jnp.float32)))
    gt = TIO.Trajectory(traj.timestamps, traj.p_wb, q)
    ate = TIO.ate_rmse(est, gt, with_scale=True)
    assert ate < 0.06, f"fisheye ATE {ate:.4f} m"
