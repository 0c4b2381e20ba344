"""Stereo-line-inertial end-to-end (sensor=4, IMU_STEREO): the
reference's flagship stereo binary (reference CMakeLists.txt:172-175
stereo_line_inertial_euroc3; stereo line matching src/Frame.cc:1408;
EdgeStereo in the inertial pose optimization src/Optimizer.cc:13585ff).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from plvio_tpu.config import SystemConfig, CameraConfig, ImuConfig, Sensor
from plvio_tpu.io import synthetic as syn
from plvio_tpu.io import trajectory as TIO
from plvio_tpu.models.system import System
from plvio_tpu.utils import lie

IDENTITY_TBC = tuple(np.eye(4).flatten().tolist())


@pytest.mark.slow
def test_stereo_inertial_lines_e2e(rng):
    """Full System run on synthetic stereo pairs + IMU with lines
    enabled: metric tracking, IMU initialization, stereo u_R residuals
    live in the VI pose optimization (kernel built with bf > 0)."""
    duration = 3.0
    scene = syn.make_room_scene(rng, n_points=4000, n_lines=60)
    traj = syn.make_orbit_trajectory(duration=duration, radius=0.6)
    imu = syn.synthesize_imu(rng, duration, radius=0.6,
                             noise_gyro=1e-5, noise_acc=1e-4,
                             bias_gyro_mag=0.0, bias_acc_mag=0.0)
    baseline = 0.11
    cfg = SystemConfig(sensor=Sensor.IMU_STEREO,
                       camera=CameraConfig(dist=(0., 0., 0., 0.),
                                           baseline=baseline),
                       imu=ImuConfig(Tbc=IDENTITY_TBC),
                       use_lines=True, use_loop_closing=False)
    slam = System(cfg)
    # the stereo residual must be wired into the VI pose opt and the
    # PL pose opt (reference builds EdgeStereo* alongside mono/line
    # edges) — the factory gates assert the config reached the kernels
    assert slam.tracker.pl_stereo
    assert slam.tracker.bf > 0

    n_ok = 0
    last_t = None
    n_frames = min(len(traj.timestamps), 30)
    for i in range(n_frames):
        t = traj.timestamps[i]
        R, p = traj.R_wb[i], traj.p_wb[i]
        imgL = syn.render_frame(scene, R, p, rng=rng)
        imgR = syn.render_frame(scene, R, p + R[:, 0] * baseline, rng=rng)
        if last_t is None:
            batch = None
        else:
            msel = (imu.timestamps > last_t) & (imu.timestamps <= t)
            ts = imu.timestamps[msel]
            dts = np.diff(np.concatenate([[last_t], ts]))
            batch = (imu.gyro[msel], imu.acc[msel], dts)
        pose = slam.track_stereo(imgL, imgR, t, imu=batch)
        last_t = t
        n_ok += pose is not None

    assert n_ok >= n_frames - 2, f"tracked {n_ok}/{n_frames}"
    est = slam.trajectory()
    q = np.asarray(lie.rot_to_quat(jnp.asarray(traj.R_wb, jnp.float32)))
    gt = TIO.Trajectory(traj.timestamps, traj.p_wb, q)
    # stereo pins metric scale from frame one: SE3 (no scale) ATE
    ate = TIO.ate_rmse(est, gt, with_scale=False)
    assert ate < 0.08, f"ATE SE3 {ate}"
    # lines triangulated into the map alongside points
    m = slam.atlas.current
    assert int(m.ln_valid.sum()) > 0
