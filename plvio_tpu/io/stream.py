"""Online streaming front door — the reference's ROS-node layer, made
transport-agnostic.

The reference ships ROS nodes (Examples/ROS/ORB_SLAM3/src: Mono,
Mono_Inertial, Stereo, RGBD) whose entire job is: buffer IMU messages,
buffer image messages, and when an image is older than the newest IMU
sample, hand (image, timestamp, imu-batch-since-last-image) to
System::Track*.  `StreamFeeder` reproduces exactly that synchronization
contract as plain callables so any transport (ROS, a socket, a camera
driver thread) can push into it; `scripts/ros_node.py` is the thin rospy
binding on top (import-gated — ROS isn't required).

Thread-safe: producers push from their own threads, `spin_once` drains
on the consumer thread (the reference's SyncWithImu loop,
ros_mono_inertial.cc).
"""
from __future__ import annotations

import threading
from collections import deque
from typing import Callable, Optional

import numpy as np


class StreamFeeder:
    """Synchronizes image/IMU/depth streams into System.track_* calls.

    mode: "mono" | "mono_vi" | "stereo" | "stereo_vi" | "rgbd".
    on_pose(pose_cw [3,4] | None, timestamp) fires after every frame.
    """

    def __init__(self, system, mode: str = "mono_vi",
                 on_pose: Optional[Callable] = None,
                 max_queue: int = 64):
        self.system = system
        self.mode = mode
        self.on_pose = on_pose
        self._lock = threading.Lock()
        self._images: deque = deque(maxlen=max_queue)   # (t, img[, img2])
        self._imu: deque = deque(maxlen=4096)           # (t, gyro, acc)
        self._last_img_t: Optional[float] = None
        self.n_processed = 0
        self.n_dropped = 0

    # ---- producer side (any thread) ----------------------------------
    def push_image(self, img: np.ndarray, t: float) -> None:
        with self._lock:
            if len(self._images) == self._images.maxlen:
                self.n_dropped += 1
            self._images.append((float(t), img))

    def push_stereo(self, left: np.ndarray, right: np.ndarray,
                    t: float) -> None:
        with self._lock:
            if len(self._images) == self._images.maxlen:
                self.n_dropped += 1
            self._images.append((float(t), left, right))

    def push_rgbd(self, img: np.ndarray, depth: np.ndarray,
                  t: float) -> None:
        self.push_stereo(img, depth, t)

    def push_imu(self, gyro: np.ndarray, acc: np.ndarray,
                 t: float) -> None:
        with self._lock:
            self._imu.append((float(t), np.asarray(gyro, np.float32),
                              np.asarray(acc, np.float32)))

    # ---- consumer side ------------------------------------------------
    def _imu_batch(self, t0: float, t1: float):
        """IMU samples in (t0, t1] as (gyro [N,3], acc [N,3], dt [N])."""
        samples = [s for s in self._imu if t0 < s[0] <= t1]
        if not samples:
            return None
        ts = np.array([s[0] for s in samples])
        gyro = np.stack([s[1] for s in samples])
        acc = np.stack([s[2] for s in samples])
        dt = np.diff(np.concatenate([[t0], ts])).astype(np.float32)
        # drop consumed samples
        while self._imu and self._imu[0][0] <= t1:
            self._imu.popleft()
        return gyro, acc, dt

    def spin_once(self) -> bool:
        """Process at most one frame; returns True if one was processed.

        Inertial modes wait until IMU has caught up past the image
        timestamp (the reference's SyncWithImu gate)."""
        with self._lock:
            if not self._images:
                return False
            t = self._images[0][0]
            inertial = self.mode.endswith("_vi")
            if inertial and (not self._imu or self._imu[-1][0] < t):
                return False                 # IMU not caught up yet
            item = self._images.popleft()
            imu = None
            if inertial and self._last_img_t is not None:
                imu = self._imu_batch(self._last_img_t, t)
            elif inertial:
                # first frame: drop stale IMU
                while self._imu and self._imu[0][0] <= t:
                    self._imu.popleft()
            self._last_img_t = t

        if self.mode in ("mono", "mono_vi"):
            pose = self.system.track_monocular(item[1], t, imu=imu)
        elif self.mode in ("stereo", "stereo_vi"):
            pose = self.system.track_stereo(item[1], item[2], t, imu=imu)
        elif self.mode == "rgbd":
            pose = self.system.track_rgbd(item[1], item[2], t)
        else:
            raise ValueError(f"unknown mode {self.mode}")
        self.n_processed += 1
        if self.on_pose is not None:
            self.on_pose(pose, t)
        return True

    def spin(self, stop_event: Optional[threading.Event] = None,
             idle_sleep: float = 0.002) -> None:
        """Consumer loop (the node's main loop)."""
        import time
        while stop_event is None or not stop_event.is_set():
            if not self.spin_once():
                time.sleep(idle_sleep)
