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
