"""cv_bridge stand-in: messages carry numpy arrays directly."""


class CvBridge:
    def imgmsg_to_cv2(self, msg, desired_encoding="passthrough"):
        return msg.data

    def cv2_to_imgmsg(self, arr, encoding="passthrough"):
        from sensor_msgs.msg import Image

        return Image(arr, 0.0)
