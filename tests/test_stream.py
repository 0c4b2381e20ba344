"""StreamFeeder: the transport-agnostic online front door (reference
ROS nodes' ImuGrabber/ImageGrabber/SyncWithImu synchronization,
Examples/ROS/ORB_SLAM3/src/ros_mono_inertial.cc)."""
import threading

import numpy as np
import pytest

from plvio_tpu.io.stream import StreamFeeder


class FakeSystem:
    def __init__(self):
        self.calls = []

    def track_monocular(self, img, t, imu=None):
        self.calls.append(("mono", t, None if imu is None else len(imu[2])))
        return np.eye(3, 4, dtype=np.float32)

    def track_stereo(self, l, r, t, imu=None):
        self.calls.append(("stereo", t, None))
        return np.eye(3, 4, dtype=np.float32)

    def track_rgbd(self, img, d, t):
        self.calls.append(("rgbd", t, None))
        return np.eye(3, 4, dtype=np.float32)


def test_mono_vi_waits_for_imu():
    sys_ = FakeSystem()
    f = StreamFeeder(sys_, mode="mono_vi")
    img = np.zeros((8, 8), np.float32)
    f.push_image(img, 1.0)
    # IMU hasn't caught up to the image stamp yet -> no processing
    f.push_imu([0, 0, 0], [0, 0, 9.81], 0.5)
    assert not f.spin_once()
    f.push_imu([0, 0, 0], [0, 0, 9.81], 1.0)
    assert f.spin_once()
    assert sys_.calls[0][0] == "mono"
    # first frame gets no IMU batch (nothing before it)
    assert sys_.calls[0][2] is None


def test_imu_batched_between_frames():
    sys_ = FakeSystem()
    f = StreamFeeder(sys_, mode="mono_vi")
    img = np.zeros((8, 8), np.float32)
    f.push_image(img, 1.0)
    for k in range(10):
        f.push_imu([0, 0, 0], [0, 0, 9.81], -8.0 + float(k))
    assert f.spin_once()
    f.push_image(img, 11.0)
    for k in range(10):
        f.push_imu([0, 0, 0], [0, 0, 9.81], 2.0 + float(k))
    assert f.spin_once()
    # second frame received exactly the samples in (1.0, 11.0]
    kind, t, n_imu = sys_.calls[1]
    assert t == 11.0 and n_imu == 10, sys_.calls


def test_threaded_producer_drains():
    sys_ = FakeSystem()
    f = StreamFeeder(sys_, mode="mono")
    img = np.zeros((8, 8), np.float32)
    stop = threading.Event()

    def produce():
        for i in range(25):
            f.push_image(img, float(i))
        stop.set()

    th = threading.Thread(target=produce)
    th.start()
    f.spin(stop_event=stop)
    th.join()
    while f.spin_once():
        pass
    assert len(sys_.calls) == 25
    assert [c[1] for c in sys_.calls] == [float(i) for i in range(25)]


def test_queue_overflow_drops():
    sys_ = FakeSystem()
    f = StreamFeeder(sys_, mode="mono", max_queue=4)
    img = np.zeros((8, 8), np.float32)
    for i in range(10):
        f.push_image(img, float(i))
    assert f.n_dropped == 6
    while f.spin_once():
        pass
    assert len(sys_.calls) == 4
