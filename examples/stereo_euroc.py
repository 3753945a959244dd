"""stereo_euroc — argv parity with Examples/Stereo/stereo_euroc.cc
(usage: stereo_euroc.py vocabulary settings sequence timestamps).
Performs online rectification when the settings file carries the
LEFT./RIGHT. K,D,R,P blocks (stereo_euroc.cc:63-98)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from examples.run_dataset import run  # noqa: E402

if __name__ == "__main__":
    voc, settings, seq, ts = sys.argv[1:5]
    run("stereo", "euroc", seq, settings=settings,
        vocabulary=None if voc in ("-", "none") else voc, timestamps=ts,
        out_prefix="CameraTrajectory")
