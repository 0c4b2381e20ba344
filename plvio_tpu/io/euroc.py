"""EuRoC ASL dataset loader.

Replaces the per-example `LoadImages`/`LoadIMU` CSV parsers in the
reference's dataset mains (reference:
Examples/Monocular-Inertial/mono_inertial_euroc.cc:248-309) with one
loader for the ASL directory layout:

    <seq>/mav0/cam0/data.csv + data/<stamp>.png
    <seq>/mav0/cam1/...                      (stereo)
    <seq>/mav0/imu0/data.csv                 (w_xyz, a_xyz @ 200 Hz)
    <seq>/mav0/state_groundtruth_estimate0/data.csv

Timestamps are nanoseconds in the CSVs; we convert to float64 seconds.
Also supports the reference's external timestamp lists
(Examples/Monocular-Inertial/EuRoC_TimeStamps/<SEQ>.txt).
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np


@dataclass
class ImuData:
    timestamps: np.ndarray  # [M] seconds
    gyro: np.ndarray        # [M,3] rad/s
    acc: np.ndarray         # [M,3] m/s^2


@dataclass
class EurocSequence:
    image_paths: List[str]
    image_timestamps: np.ndarray       # [N] seconds
    imu: Optional[ImuData]
    image_paths_right: Optional[List[str]] = None
    gt_timestamps: Optional[np.ndarray] = None
    gt_positions: Optional[np.ndarray] = None
    gt_quaternions: Optional[np.ndarray] = None  # (x,y,z,w)

    def imu_between(self, t0: float, t1: float) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """IMU samples with t0 < t <= t1 (the per-frame batch the tracker
        preintegrates; reference: src/Tracking.cc:1394 PreintegrateIMU)."""
        m = (self.imu.timestamps > t0) & (self.imu.timestamps <= t1)
        return self.imu.timestamps[m], self.imu.gyro[m], self.imu.acc[m]


def _read_csv(path: str) -> np.ndarray:
    return np.loadtxt(path, delimiter=",", comments="#", ndmin=2)


def load_euroc(seq_dir: str, stereo: bool = False,
               timestamps_file: Optional[str] = None) -> EurocSequence:
    mav = os.path.join(seq_dir, "mav0")
    cam0 = os.path.join(mav, "cam0")
    cam_csv = _read_csv(os.path.join(cam0, "data.csv"))
    stamps_ns = cam_csv[:, 0].astype(np.int64)
    if timestamps_file:
        sel = np.loadtxt(timestamps_file, dtype=np.int64, ndmin=1)
        keep = np.isin(stamps_ns, sel)
        stamps_ns = stamps_ns[keep]
    paths = [os.path.join(cam0, "data", f"{s}.png") for s in stamps_ns]

    paths_r = None
    if stereo:
        cam1 = os.path.join(mav, "cam1")
        paths_r = [os.path.join(cam1, "data", f"{s}.png") for s in stamps_ns]

    imu = None
    imu_csv_path = os.path.join(mav, "imu0", "data.csv")
    if os.path.exists(imu_csv_path):
        imu_csv = _read_csv(imu_csv_path)
        imu = ImuData(
            timestamps=imu_csv[:, 0] * 1e-9,
            gyro=imu_csv[:, 1:4].astype(np.float64),
            acc=imu_csv[:, 4:7].astype(np.float64),
        )

    gt_t = gt_p = gt_q = None
    gt_path = os.path.join(mav, "state_groundtruth_estimate0", "data.csv")
    if os.path.exists(gt_path):
        gt = _read_csv(gt_path)
        gt_t = gt[:, 0] * 1e-9
        gt_p = gt[:, 1:4]
        # EuRoC GT quaternions are (w,x,y,z) -> convert to (x,y,z,w)
        gt_q = np.concatenate([gt[:, 5:8], gt[:, 4:5]], axis=1)

    return EurocSequence(
        image_paths=paths,
        image_timestamps=stamps_ns.astype(np.float64) * 1e-9,
        imu=imu,
        image_paths_right=paths_r,
        gt_timestamps=gt_t, gt_positions=gt_p, gt_quaternions=gt_q,
    )


def load_image_gray(path: str) -> np.ndarray:
    """Load one grayscale image as float32 [H,W] in [0,255]."""
    from PIL import Image

    img = Image.open(path)
    if img.mode != "L":
        img = img.convert("L")
    return np.asarray(img, np.float32)
