"""stereo_kitti — argv parity with Examples/Stereo/stereo_kitti.cc:
usage: stereo_kitti.py path_to_vocabulary path_to_settings path_to_sequence
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from examples.run_dataset import run  # noqa: E402

if __name__ == "__main__":
    voc, settings, seq = sys.argv[1:4]
    run("stereo", "kitti", seq, settings=settings,
        vocabulary=None if voc in ("-", "none") else voc,
        out_prefix="CameraTrajectory")
