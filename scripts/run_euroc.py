"""EuRoC dataset runner — the reference's dataset mains, unified.

Equivalent of mono_inertial_euroc3 / stereo_line_inertial_euroc3
(reference: Examples/Monocular-Inertial/mono_inertial_euroc.cc:124-244,
CMakeLists.txt:168-183): load ASL images+IMU, feed the System at dataset
order, save TUM trajectories, report ATE vs ground truth if present.

Usage:
  python scripts/run_euroc.py <seq_dir> [--mode mono|mono_vi|stereo|stereo_vi]
      [--settings EuRoC.yaml] [--timestamps ts.txt] [--max-frames N]
      [--out-dir .]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from plvio_tpu.config import SystemConfig, Sensor, load_config
from plvio_tpu.io import euroc as EU
from plvio_tpu.io import trajectory as TIO
from plvio_tpu.models.system import System


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("seq_dir")
    ap.add_argument("--mode", default="mono_vi",
                    choices=["mono", "mono_vi", "stereo", "stereo_vi"])
    ap.add_argument("--settings", default=None)
    ap.add_argument("--timestamps", default=None)
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--out-dir", default=".")
    args = ap.parse_args()

    sensor = {"mono": Sensor.MONOCULAR, "mono_vi": Sensor.IMU_MONOCULAR,
              "stereo": Sensor.STEREO, "stereo_vi": Sensor.IMU_STEREO}[args.mode]
    if args.settings:
        cfg = load_config(args.settings, sensor=sensor)
    else:
        cfg = SystemConfig(sensor=sensor)

    seq = EU.load_euroc(args.seq_dir, stereo="stereo" in args.mode,
                        timestamps_file=args.timestamps)
    n = len(seq.image_paths)
    if args.max_frames:
        n = min(n, args.max_frames)
    print(f"{n} frames; imu: {'yes' if seq.imu else 'no'}; "
          f"gt: {'yes' if seq.gt_timestamps is not None else 'no'}")

    slam = System(cfg)
    last_t = None
    n_ok = 0
    t_start = time.time()
    for i in range(n):
        t = seq.image_timestamps[i]
        img = EU.load_image_gray(seq.image_paths[i])
        imu = None
        if seq.imu is not None and last_t is not None:
            ts, gyro, acc = seq.imu_between(last_t, t)
            if len(ts):
                dts = np.diff(np.concatenate([[last_t], ts]))
                imu = (gyro, acc, dts)
        if "stereo" in args.mode:
            imgR = EU.load_image_gray(seq.image_paths_right[i])
            pose = slam.track_stereo(img, imgR, t, imu=imu)
        else:
            pose = slam.track_monocular(img, t, imu=imu)
        n_ok += pose is not None
        last_t = t
        if i % 100 == 0:
            m = slam.atlas.current
            print(f"frame {i}/{n} state={slam.state.name} kf={m.n_kf} "
                  f"pts={m.n_pt} lines={m.n_ln}")
    wall = time.time() - t_start

    os.makedirs(args.out_dir, exist_ok=True)
    slam.save_trajectory(os.path.join(args.out_dir, "CameraTrajectory.txt"))
    slam.save_keyframe_trajectory(
        os.path.join(args.out_dir, "KeyFrameTrajectory.txt"))
    print(f"tracked {n_ok}/{n} frames in {wall:.1f}s ({n/wall:.1f} fps)")

    if seq.gt_timestamps is not None:
        est = slam.trajectory()
        gt = TIO.Trajectory(seq.gt_timestamps, seq.gt_positions,
                            seq.gt_quaternions)
        print(f"ATE RMSE Sim3: {TIO.ate_rmse(est, gt, True):.4f} m")
        print(f"ATE RMSE SE3:  {TIO.ate_rmse(est, gt, False):.4f} m")


if __name__ == "__main__":
    main()
