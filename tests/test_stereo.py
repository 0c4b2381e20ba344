"""Stereo pipeline: metric-scale tracking on synthetic stereo pairs."""
import numpy as np
import jax.numpy as jnp
import pytest

from plvio_tpu.config import SystemConfig, CameraConfig, Sensor
from plvio_tpu.io import synthetic as syn
from plvio_tpu.io import trajectory as TIO
from plvio_tpu.models.system import System
from plvio_tpu.utils import lie


@pytest.mark.slow
def test_stereo_metric_tracking(rng):
    scene = syn.make_room_scene(rng, n_points=4000, n_lines=60)
    traj = syn.make_orbit_trajectory(duration=1.0, radius=0.6)
    baseline = 0.11
    cfg = SystemConfig(sensor=Sensor.STEREO,
                       camera=CameraConfig(dist=(0., 0., 0., 0.),
                                           baseline=baseline),
                       use_lines=False, use_loop_closing=False)
    slam = System(cfg)
    n_ok = 0
    n_frames = 15
    for i in range(n_frames):
        R, p = traj.R_wb[i], traj.p_wb[i]
        imgL = syn.render_frame(scene, R, p, rng=rng)
        imgR = syn.render_frame(scene, R, p + R[:, 0] * baseline, rng=rng)
        pose = slam.track_stereo(imgL, imgR, traj.timestamps[i])
        n_ok += pose is not None
    assert n_ok >= n_frames - 1
    est = slam.trajectory()
    q = np.asarray(lie.rot_to_quat(jnp.asarray(traj.R_wb, jnp.float32)))
    gt = TIO.Trajectory(traj.timestamps, traj.p_wb, q)
    # SE3 (no scale) alignment: stereo must recover METRIC scale
    ate = TIO.ate_rmse(est, gt, with_scale=False)
    assert ate < 0.05, ate


@pytest.mark.slow
def test_rgbd_tracking(rng):
    scene = syn.make_room_scene(rng, n_points=4000, n_lines=0)
    traj = syn.make_orbit_trajectory(duration=1.0, radius=0.6)
    cfg = SystemConfig(sensor=Sensor.RGBD,
                       camera=CameraConfig(dist=(0., 0., 0., 0.)),
                       use_lines=False, use_loop_closing=False)
    slam = System(cfg)
    K = cfg.camera
    n_ok = 0
    n_frames = 12
    for i in range(n_frames):
        R, p = traj.R_wb[i], traj.p_wb[i]
        img = syn.render_frame(scene, R, p, rng=rng)
        # oracle depth image from scene points (sparse -> fill with plane
        # distance approximation): render a dense-ish depth by z-buffer of
        # scene points splatted with small disks
        depth = np.full(img.shape, 0.0, np.float32)
        uv, z, vis, _, _ = syn.project_scene(
            scene, R, p, K.fx, K.fy, K.cx, K.cy, K.width, K.height)
        for j in np.nonzero(vis)[0]:
            x0, y0 = int(uv[j, 0]), int(uv[j, 1])
            depth[max(0, y0 - 3):y0 + 4, max(0, x0 - 3):x0 + 4] = z[j]
        pose = slam.track_rgbd(img, depth, traj.timestamps[i])
        n_ok += pose is not None
    assert n_ok >= n_frames - 1
    est = slam.trajectory()
    q = np.asarray(lie.rot_to_quat(jnp.asarray(traj.R_wb, jnp.float32)))
    gt = TIO.Trajectory(traj.timestamps, traj.p_wb, q)
    ate = TIO.ate_rmse(est, gt, with_scale=False)
    assert ate < 0.08, ate


def test_match_stereo_lines_depth(rng):
    """Rectified stereo line matching recovers endpoint depths
    (reference Frame::ComputeStereoMatches_Lines src/Frame.cc:1408)."""
    import jax.numpy as jnp
    from plvio_tpu.ops import stereo as ST

    fx, fy, cx, cy = 458.0, 457.0, 376.0, 240.0
    b = 0.11
    bf = b * fx
    L = 32
    n_real = 12
    # random 3D segments, mostly vertical-ish so they are stereo-matchable
    z0 = rng.uniform(2.0, 8.0, n_real)
    z1 = z0 + rng.uniform(-0.3, 0.3, n_real)
    x0 = rng.uniform(-1.5, 1.5, n_real)
    y0 = rng.uniform(-1.0, 0.2, n_real)
    x1 = x0 + rng.uniform(-0.3, 0.3, n_real)
    y1 = y0 + rng.uniform(0.5, 1.2, n_real)   # guaranteed vertical extent

    def proj(X, Y, Z, tx=0.0):
        return np.stack([fx * (X - tx) / Z + cx, fy * Y / Z + cy], -1)

    epL = np.zeros((L, 4), np.float32)
    epR = np.zeros((L, 4), np.float32)
    epL[:n_real, :2] = proj(x0, y0, z0)
    epL[:n_real, 2:] = proj(x1, y1, z1)
    epR[:n_real, :2] = proj(x0, y0, z0, tx=b)
    epR[:n_real, 2:] = proj(x1, y1, z1, tx=b)
    ang = np.zeros(L, np.float32)
    for e, a in ((epL, ang), ):
        d = e[:, 2:] - e[:, :2]
        a[:] = np.arctan2(d[:, 1], d[:, 0]) % np.pi
    angR = ang.copy()
    valid = np.zeros(L, bool)
    valid[:n_real] = True
    # descriptors: identical for true pairs, random elsewhere
    desc = rng.choice([-1.0, 1.0], size=(L, 256)).astype(np.float32)
    descL = jnp.asarray(desc, jnp.bfloat16)
    descR = jnp.asarray(desc, jnp.bfloat16)

    ds, de, has = ST.match_stereo_lines(
        jnp.asarray(epL), descL, jnp.asarray(ang), jnp.asarray(valid),
        jnp.asarray(epR), descR, jnp.asarray(angR), jnp.asarray(valid), bf)
    ds, de, has = np.asarray(ds), np.asarray(de), np.asarray(has)
    assert has[:n_real].sum() >= n_real - 2, has[:n_real]
    assert not has[n_real:].any()
    got = has[:n_real]
    np.testing.assert_allclose(ds[:n_real][got], z0[got], rtol=0.02)
    np.testing.assert_allclose(de[:n_real][got], z1[got], rtol=0.02)


def test_stereo_pose_opt_right_eye_residual(rng):
    """The stereo pose optimizer uses the right-eye residual
    u_R = u - bf/z (reference EdgeStereoSE3ProjectXYZOnlyPose,
    src/Optimizer.cc:2399 stereo branch): with it, depth-axis
    translation is recovered far better than mono-only under noisy
    observations of a shallow point field."""
    from plvio_tpu.models import kernels as KN
    from plvio_tpu.solver.residuals import PinholeK

    K = PinholeK(fx=458.0, fy=457.0, cx=376.0, cy=240.0)
    bf = 0.11 * 458.0
    cap = 256
    X = rng.uniform([-3, -2, 4], [3, 2, 10], (cap, 3)).astype(np.float32)
    phi = np.array([0.02, -0.03, 0.01], np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray(phi)))
    t = np.array([0.1, -0.05, 0.3], np.float32)
    pc = X @ R.T + t
    uv = np.stack([K.fx * pc[:, 0] / pc[:, 2] + K.cx,
                   K.fy * pc[:, 1] / pc[:, 2] + K.cy], -1)
    ur = uv[:, 0] - bf / pc[:, 2]
    uvr = np.concatenate([uv, ur[:, None]], 1).astype(np.float32)
    uvr[::3, 2] = -1.0                      # a third are mono-only edges
    valid = np.ones(cap, bool)
    is2 = np.ones(cap, np.float32)

    opt = KN.make_pose_optimizer_stereo(K, bf, cap)
    pose0 = np.eye(3, 4, dtype=np.float32)
    pose, inl, n = opt(jnp.asarray(pose0), jnp.asarray(uvr),
                       jnp.asarray(X), jnp.asarray(valid),
                       jnp.asarray(is2))
    pose = np.asarray(pose)
    err_R = np.linalg.norm(np.asarray(
        lie.so3_log(jnp.asarray(pose[:, :3] @ R.T))))
    err_t = np.linalg.norm(pose[:, 3] - t)
    assert int(n) > 200 and err_R < 1e-3 and err_t < 2e-3

    # the tracker actually builds + uses it in stereo mode
    cfg = SystemConfig(sensor=Sensor.STEREO,
                       camera=CameraConfig(dist=(0., 0., 0., 0.),
                                           baseline=0.11),
                       use_lines=False)
    slam = System(cfg)
    assert slam.tracker.pose_opt_stereo is not None
