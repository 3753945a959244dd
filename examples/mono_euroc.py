"""mono_euroc — argv parity with Examples/Monocular/mono_euroc.cc:
usage: mono_euroc.py path_to_vocabulary path_to_settings path_to_sequence path_to_timestamps
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from examples.run_dataset import run  # noqa: E402

if __name__ == "__main__":
    voc, settings, seq, ts = sys.argv[1:5]
    run("monocular", "euroc", seq, settings=settings,
        vocabulary=None if voc in ("-", "none") else voc, timestamps=ts,
        out_prefix="KeyFrameTrajectory")
