"""Mono-inertial SLAM on the synthetic orbit: checks IMU initialization
(gravity + metric scale) and final ATE WITHOUT scale alignment — the
point of visual-inertial fusion.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import time

import jax

if "cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from plvio_tpu.config import SystemConfig, CameraConfig, ImuConfig, Sensor
from plvio_tpu.io import synthetic as syn
from plvio_tpu.io import trajectory as TIO
from plvio_tpu.models.system import System
from plvio_tpu.utils import lie

IDENTITY_TBC = tuple(np.eye(4).flatten().tolist())


def main(n_frames: int = 80):
    rng = np.random.default_rng(0)
    scene = syn.make_room_scene(rng, n_points=4000, n_lines=60)
    dur = n_frames / 20.0 + 0.2
    traj = syn.make_orbit_trajectory(duration=dur, fps=20.0, radius=0.6)
    imu = syn.synthesize_imu(rng, dur, radius=0.6,
                             noise_gyro=1.7e-4, noise_acc=2e-3,
                             bias_gyro_mag=0.002, bias_acc_mag=0.01)

    use_lines = "--nolines" not in sys.argv
    cfg = SystemConfig(sensor=Sensor.IMU_MONOCULAR,
                       camera=CameraConfig(dist=(0., 0., 0., 0.)),
                       imu=ImuConfig(Tbc=IDENTITY_TBC),
                       use_lines=use_lines)
    slam = System(cfg)

    n_ok = 0
    last_t = None
    init_frame = None
    for i in range(min(n_frames, len(traj.timestamps))):
        t = traj.timestamps[i]
        img = syn.render_frame(scene, traj.R_wb[i], traj.p_wb[i], rng=rng)
        if last_t is None:
            batch = None
        else:
            msel = (imu.timestamps > last_t) & (imu.timestamps <= t)
            ts = imu.timestamps[msel]
            dts = np.diff(np.concatenate([[last_t], ts]))
            batch = (imu.gyro[msel], imu.acc[msel], dts)
        pose = slam.track_monocular(img, t, imu=batch)
        last_t = t
        n_ok += pose is not None
        m = slam.atlas.current
        if m.imu_initialized and init_frame is None:
            init_frame = i
            print(f"IMU initialized at frame {i}")
        if i % 10 == 0:
            print(f"frame {i:3d} state={slam.state.name:15s} kf={m.n_kf} "
                  f"pts={m.n_pt} imu_init={m.imu_initialized}")

    est = slam.trajectory()
    q = np.asarray(lie.rot_to_quat(jnp.asarray(traj.R_wb, jnp.float32)))
    gt = TIO.Trajectory(traj.timestamps, traj.p_wb, q)
    ate_sim3 = TIO.ate_rmse(est, gt, with_scale=True)
    ate_se3 = TIO.ate_rmse(est, gt, with_scale=False)
    print(f"\nframes tracked: {n_ok}/{n_frames}")
    print(f"ATE RMSE Sim3-aligned: {ate_sim3:.4f} m")
    print(f"ATE RMSE SE3-aligned (metric scale!): {ate_se3:.4f} m")
    m = slam.atlas.current
    print(f"imu_initialized: {m.imu_initialized}")
    # per-frame SE3-aligned error profile
    ia, ib = TIO.associate(est.timestamps, gt.timestamps)
    if len(ia) > 3:
        s_, R_, t_ = TIO.umeyama(est.positions[ia], gt.positions[ib],
                                 with_scale=False)
        aligned = (s_ * (R_ @ est.positions[ia].T)).T + t_
        err = np.linalg.norm(aligned - gt.positions[ib], axis=-1)
        for k in range(0, len(err), 5):
            print(f"  t={est.timestamps[ia[k]]:5.2f}  err={err[k]:.4f}")
    return ate_se3


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 80
    main(n)
