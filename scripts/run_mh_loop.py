"""EuRoC-realism CLOSED-CIRCUIT replay: mono-inertial point+line SLAM
around a full orbit of the machine hall that returns to its starting
view — unlike the MH sweep, this trajectory REVISITS, so loop closing
(BoW detection, Sim3 verification, inertial 4DoF essential graph, GBA)
is exercised end-to-end on realistic imagery and its effect shows up in
the final ATE.

Usage: python scripts/run_mh_loop.py [n_seconds] [cpu]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

if "cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from plvio_tpu.config import (SystemConfig, CameraConfig, ImuConfig,
                              Sensor)
from plvio_tpu.io import synthetic as syn
from plvio_tpu.io import trajectory as TIO
from plvio_tpu.models.system import System
from plvio_tpu.utils import lie
from plvio_tpu.utils.metrics import Metrics

IDENTITY_TBC = tuple(np.eye(4).flatten().tolist())


def main(duration: float = 22.0):
    rng = np.random.default_rng(7)
    t0 = time.time()
    scene = syn.make_hall_scene(rng, n_points=9000, n_lines=500)
    t_frames = np.arange(0.0, duration, 1.0 / 20.0)
    traj = syn._eval_mh_loop(t_frames)
    imu = syn.synthesize_imu_mh(rng, duration + 0.3,
                                eval_fn=syn._eval_mh_loop)
    print(f"world built in {time.time()-t0:.0f}s: "
          f"{len(scene.points)} pts, {len(scene.lines)} lines, "
          f"{len(imu.timestamps)} IMU samples")

    cfg = SystemConfig(sensor=Sensor.IMU_MONOCULAR,
                       camera=CameraConfig(dist=(0., 0., 0., 0.)),
                       imu=ImuConfig(Tbc=IDENTITY_TBC))
    slam = System(cfg)
    met = Metrics()

    n_frames = len(traj.timestamps)
    n_ok = 0
    last_t = None
    t_start = time.time()
    for i in range(n_frames):
        t = traj.timestamps[i]
        with met.stage("render"):
            img = syn.render_frame_realistic(scene, syn._eval_mh_loop,
                                             t, rng)
        if last_t is None:
            batch = None
        else:
            msel = (imu.timestamps > last_t) & (imu.timestamps <= t)
            ts = imu.timestamps[msel]
            dts = np.diff(np.concatenate([[last_t], ts]))
            batch = (imu.gyro[msel], imu.acc[msel], dts)
        with met.stage("track"):
            pose = slam.track_monocular(img, t, imu=batch)
        last_t = t
        n_ok += pose is not None
        m = slam.atlas.current
        if i % 25 == 0:
            el = time.time() - t_start
            nl = slam.loop_closer.n_loops_closed if slam.loop_closer else 0
            print(f"frame {i:4d}/{n_frames} state={slam.state.name:14s} "
                  f"kf={m.n_kf} pts={m.n_pt} loops={nl} ({el:.0f}s)")

    q = np.asarray(lie.rot_to_quat(jnp.asarray(traj.R_wb, jnp.float32)))
    gt = TIO.Trajectory(traj.timestamps, traj.p_wb, q)
    ate_pre = TIO.ate_rmse(slam.trajectory(), gt, with_scale=False)
    slam.global_refine()
    est = slam.trajectory()
    ate_sim3 = TIO.ate_rmse(est, gt, with_scale=True)
    ate_se3 = TIO.ate_rmse(est, gt, with_scale=False)
    m = slam.atlas.current
    n_loops = slam.loop_closer.n_loops_closed if slam.loop_closer else 0

    print(f"\nframes tracked : {n_ok}/{n_frames}")
    print(f"keyframes      : {m.n_kf}   maps: {len(slam.atlas.maps)}")
    print(f"loops closed   : {n_loops}")
    print(f"ATE SE3 before final refine: {ate_pre:.4f} m")
    print(f"ATE RMSE Sim3  : {ate_sim3:.4f} m")
    print(f"ATE RMSE SE3   : {ate_se3:.4f} m   (metric scale)")

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "RESULTS.md")
    row = (f"| MH-loop {duration:.0f} s (closed circuit) | "
           f"mono-inertial point+line, {n_loops} loop(s) closed | "
           f"{n_ok}/{n_frames} | {m.n_kf} | {int(m.ln_valid.sum())} | "
           f"{ate_sim3:.3f} | {ate_se3:.3f} |\n")
    with open(path, "a") as f:
        f.write(row)
    print(f"appended to RESULTS.md: {row.strip()}")
    import json
    print("stage summary (script):",
          json.dumps(met.summary(), indent=1))
    print("stage summary (system):",
          json.dumps(slam.metrics_summary(), indent=1))
    return ate_se3


if __name__ == "__main__":
    dur = 22.0
    for a in sys.argv[1:]:
        if a.replace(".", "").isdigit():
            dur = float(a)
    main(dur)
