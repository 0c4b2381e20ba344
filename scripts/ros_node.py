"""ROS node binding — equivalent of Examples/ROS/ORB_SLAM3 in the
reference (Mono / Mono_Inertial / Stereo / RGBD nodes).

Import-gated on rospy: the transport glue is ~50 lines because all
synchronization lives in plvio_tpu.io.stream.StreamFeeder (the
reference's ImuGrabber/ImageGrabber/SyncWithImu pattern,
Examples/ROS/ORB_SLAM3/src/ros_mono_inertial.cc).

Usage:
  rosrun <pkg> ros_node.py --settings EuRoC.yaml --mode mono_vi \
      [--image-topic /cam0/image_raw] [--imu-topic /imu0]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from plvio_tpu.config import SystemConfig, Sensor, load_config
from plvio_tpu.io.stream import StreamFeeder
from plvio_tpu.models.system import System

SENSORS = {"mono": Sensor.MONOCULAR, "mono_vi": Sensor.IMU_MONOCULAR,
           "stereo": Sensor.STEREO, "stereo_vi": Sensor.IMU_STEREO,
           "rgbd": Sensor.RGBD}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--settings", default=None)
    ap.add_argument("--mode", default="mono_vi", choices=sorted(SENSORS))
    ap.add_argument("--image-topic", default="/cam0/image_raw")
    ap.add_argument("--image-topic-right", default="/cam1/image_raw")
    ap.add_argument("--depth-topic", default="/camera/depth/image_raw")
    ap.add_argument("--imu-topic", default="/imu0")
    ap.add_argument("--out", default="CameraTrajectory.txt")
    args = ap.parse_args()

    try:
        import rospy
        from sensor_msgs.msg import Image, Imu
    except ImportError:
        print("rospy not available — this binding needs a ROS "
              "environment; use scripts/run_euroc.py for datasets or "
              "plvio_tpu.io.stream.StreamFeeder for custom transports.",
              file=sys.stderr)
        return 2

    sensor = SENSORS[args.mode]
    cfg = (load_config(args.settings, sensor=sensor) if args.settings
           else SystemConfig(sensor=sensor))
    slam = System(cfg)
    feeder = StreamFeeder(slam, mode=args.mode)

    def img_to_np(msg):
        a = np.frombuffer(msg.data, np.uint8)
        a = a.reshape(msg.height, msg.step)[:, :msg.width * (
            3 if "rgb" in msg.encoding or "bgr" in msg.encoding else 1)]
        if a.shape[1] == msg.width * 3:
            a = a.reshape(msg.height, msg.width, 3).mean(-1)
        return a.astype(np.float32)

    rospy.init_node("plvio_tpu", anonymous=True)
    two_stream = args.mode.startswith("stereo") or args.mode == "rgbd"
    if not two_stream:
        rospy.Subscriber(
            args.image_topic, Image,
            lambda m: feeder.push_image(img_to_np(m),
                                        m.header.stamp.to_sec()),
            queue_size=16)
    else:
        # nearest-stamp pairing of the two streams: primary frames wait
        # in `primary` until a partner within `slop` arrives (and vice
        # versa through `pending`); stale entries are evicted
        topic2 = (args.depth_topic if args.mode == "rgbd"
                  else args.image_topic_right)
        pending = {}    # stamp -> second-stream image
        primary = {}    # stamp -> primary image
        slop = 0.01
        push_pair = (feeder.push_rgbd if args.mode == "rgbd"
                     else feeder.push_stereo)

        def evict(d, now):
            for k in [k for k in d if now - k > 1.0]:
                del d[k]

        def try_pair(t1):
            if t1 not in primary:
                return
            near = [t2 for t2 in pending if abs(t2 - t1) <= slop]
            if near:
                t2 = min(near, key=lambda x: abs(x - t1))
                push_pair(primary.pop(t1), pending.pop(t2), t1)

        def on_primary(m):
            t = m.header.stamp.to_sec()
            primary[t] = img_to_np(m)
            try_pair(t)
            evict(primary, t)
            evict(pending, t)

        def on_second(m):
            t2 = m.header.stamp.to_sec()
            pending[t2] = img_to_np(m)
            for t1 in sorted(primary, key=lambda x: abs(x - t2)):
                try_pair(t1)

        rospy.Subscriber(args.image_topic, Image, on_primary, queue_size=16)
        rospy.Subscriber(topic2, Image, on_second, queue_size=16)
    if args.mode.endswith("_vi"):
        rospy.Subscriber(
            args.imu_topic, Imu,
            lambda m: feeder.push_imu(
                [m.angular_velocity.x, m.angular_velocity.y,
                 m.angular_velocity.z],
                [m.linear_acceleration.x, m.linear_acceleration.y,
                 m.linear_acceleration.z],
                m.header.stamp.to_sec()),
            queue_size=512)

    rate = rospy.Rate(500)
    while not rospy.is_shutdown():
        if not feeder.spin_once():
            rate.sleep()
    slam.save_trajectory(args.out)
    print(f"saved {args.out}; {feeder.n_processed} frames, "
          f"{feeder.n_dropped} dropped")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
