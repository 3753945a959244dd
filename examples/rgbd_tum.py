"""rgbd_tum — argv parity with Examples/RGB-D/rgbd_tum.cc:
usage: rgbd_tum.py path_to_vocabulary path_to_settings path_to_sequence path_to_association
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from examples.run_dataset import run  # noqa: E402

if __name__ == "__main__":
    voc, settings, seq, assoc = sys.argv[1:5]
    run("rgbd", "tum_rgbd", seq, settings=settings,
        vocabulary=None if voc in ("-", "none") else voc, associations=assoc,
        out_prefix="CameraTrajectory")
