"""EuRoC-realism replay run: mono-inertial point+line SLAM end-to-end.

Stands in for EuRoC MH01 (the image has no dataset and zero egress —
VERDICT r1 #1): machine-hall-scale world, MH-style trajectory with a
stationary start + excitation shake, 752x480 @ 20 fps frames with motion
blur / exposure jitter / vignetting / sensor noise, 200 Hz IMU with
EuRoC-class noise AND bias random walk.  Reports metric (SE3) ATE — the
visual-inertial north star — plus Sim3 ATE and per-stage timing, and
appends a row to RESULTS.md.

Usage: python scripts/run_mh_replay.py [n_seconds] [cpu]
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
                              Sensor, TrackingConfig)
from plvio_tpu.io import synthetic as syn
from plvio_tpu.io import trajectory as TIO
from plvio_tpu.models.system import System
from plvio_tpu.utils import lie
from plvio_tpu.utils.metrics import Metrics

IDENTITY_TBC = tuple(np.eye(4).flatten().tolist())


def main(duration: float = 60.0):
    rng = np.random.default_rng(7)
    t0 = time.time()
    scene = syn.make_hall_scene(rng, n_points=9000, n_lines=500)
    traj = syn.make_mh_trajectory(duration + 0.3, fps=20.0)
    imu = syn.synthesize_imu_mh(rng, duration + 0.3)
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
    init_frame = None
    t_start = time.time()
    for i in range(n_frames):
        t = traj.timestamps[i]
        with met.stage("render"):
            img = syn.render_frame_realistic(scene, syn._eval_mh, t, rng)
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
        if m.imu_initialized and init_frame is None:
            init_frame = i
            print(f"IMU initialized at frame {i} (t={t:.1f}s)")
        if i % 25 == 0:
            el = time.time() - t_start
            print(f"frame {i:4d}/{n_frames} state={slam.state.name:14s} "
                  f"kf={m.n_kf} pts={m.n_pt} lns={int(m.ln_valid.sum())} "
                  f"({el:.0f}s)")

    q = np.asarray(lie.rot_to_quat(jnp.asarray(traj.R_wb, jnp.float32)))
    gt_pre = TIO.Trajectory(traj.timestamps, traj.p_wb, q)
    ate_pre = TIO.ate_rmse(slam.trajectory(), gt_pre, with_scale=False)
    # consolidate before export: full inertial BA over the whole map
    # (the state the reference reaches via its VIBA2 + loop-GBA stages)
    slam.global_refine()
    est = slam.trajectory()
    print(f"ATE SE3 before final refine: {ate_pre:.4f} m")
    gt = TIO.Trajectory(traj.timestamps, traj.p_wb, q)
    ate_sim3 = TIO.ate_rmse(est, gt, with_scale=True)
    ate_se3 = TIO.ate_rmse(est, gt, with_scale=False)
    m = slam.atlas.current
    wall = time.time() - t_start
    summ = met.summary()
    track_ms = summ.get("track", {}).get("mean_ms", -1)

    print(f"\nframes tracked : {n_ok}/{n_frames}")
    print(f"keyframes      : {m.n_kf} (capacity {m.max_kf})")
    print(f"map points     : {m.n_pt}   map lines: {int(m.ln_valid.sum())}")
    print(f"ATE RMSE Sim3  : {ate_sim3:.4f} m")
    print(f"ATE RMSE SE3   : {ate_se3:.4f} m   (metric scale)")
    print(f"wall           : {wall:.0f}s  track {track_ms:.0f} ms/frame "
          f"(host+device, incl. python orchestration)")

    slam.save_trajectory("/tmp/mh_CameraTrajectory.txt")
    slam.save_keyframe_trajectory("/tmp/mh_KeyFrameTrajectory.txt")

    # append to RESULTS.md
    row = (f"| MH-replay {duration:.0f} s | mono-inertial point+line | "
           f"{n_ok}/{n_frames} | {m.n_kf} | {int(m.ln_valid.sum())} | "
           f"{ate_sim3:.3f} | {ate_se3:.3f} |\n")
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "RESULTS.md")
    if not os.path.exists(path):
        with open(path, "w") as f:
            f.write(
                "# RESULTS — end-to-end runs\n\n"
                "EuRoC itself is not present in the image (zero egress); "
                "the MH-replay sequence reproduces its regime: machine-"
                "hall scale, 752x480 @ 20 fps with motion blur/exposure "
                "jitter/vignette/noise, 200 Hz IMU with EuRoC-class "
                "noise + bias random walk, stationary start + shake "
                "(scripts/run_mh_replay.py).  Reference class on real "
                "MH01: ~0.03-0.06 m ATE RMSE (Campos et al., TRO 2021); "
                "the reference fork publishes no numbers (BASELINE.md).\n\n"
                "| sequence | config | tracked | KFs | map lines | "
                "ATE Sim3 (m) | ATE SE3 (m) | track/frame |\n"
                "|---|---|---|---|---|---|---|---|\n")
    with open(path, "a") as f:
        f.write(row)
    print(f"appended to RESULTS.md: {row.strip()}")
    return ate_se3


if __name__ == "__main__":
    dur = 60.0
    for a in sys.argv[1:]:
        if a.replace(".", "").isdigit():
            dur = float(a)
    main(dur)
