"""Shared plumbing for the ROS nodes (Examples/ROS/ORB_SLAM2/src/*.cc).

The reference ships four ROS integration nodes (mono, monoAR, stereo,
rgbd). These equivalents subscribe to the same topics and drive the same
System API. rospy + cv_bridge are not part of this image, so import is
gated with a clear error; everything else (rectification, AR overlay) is
plain numpy and unit-testable without ROS.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))


def require_ros():
    try:
        import rospy  # noqa: F401
        from cv_bridge import CvBridge  # noqa: F401
    except ImportError as e:  # pragma: no cover - no ROS in CI image
        raise SystemExit(
            "ROS (rospy + cv_bridge) is not available in this environment. "
            "These nodes mirror Examples/ROS/ORB_SLAM2/src/*.cc and run "
            "under a standard ROS1 install: "
            f"({e})"
        )
    import rospy
    from cv_bridge import CvBridge

    return rospy, CvBridge()


def to_gray(img):
    import numpy as np

    if img.ndim == 2:
        return img
    # ITU-601, matching the reference's cvtColor (Tracking.cc:172-197)
    return (
        0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    ).astype(np.float32)


def build_system(vocabulary_path, settings_path, sensor):
    from orb_slam2_comment_tpu.models.system import System
    from orb_slam2_comment_tpu.utils.config import load_yaml_settings

    cfg = load_yaml_settings(settings_path, sensor)
    voc = None if vocabulary_path in ("-", "", None) else vocabulary_path
    return System(cfg, vocabulary_path=voc), cfg
