"""Monocular ROS node (Examples/ROS/ORB_SLAM2/src/ros_mono.cc).

Usage: rosrun <pkg> ros_mono.py path_to_vocabulary path_to_settings
Subscribes /camera/image_raw; on shutdown saves KeyFrameTrajectory.txt
(ros_mono.cc:55-86).
"""

import sys

from ros_common import build_system, require_ros, to_gray


def main():
    if len(sys.argv) != 3:
        print("Usage: ros_mono.py path_to_vocabulary path_to_settings")
        return 1
    rospy, bridge = require_ros()
    system, _ = build_system(sys.argv[1], sys.argv[2], "monocular")

    from sensor_msgs.msg import Image

    def grab(msg):
        img = to_gray(bridge.imgmsg_to_cv2(msg, desired_encoding="passthrough"))
        system.track_monocular(img, msg.header.stamp.to_sec())

    rospy.init_node("Mono")
    rospy.Subscriber("/camera/image_raw", Image, grab, queue_size=1)
    rospy.spin()
    system.shutdown()
    system.save_keyframe_trajectory_tum("KeyFrameTrajectory.txt")
    return 0


if __name__ == "__main__":
    sys.exit(main())
