"""Accuracy regression smoke on the rendered head-to-head data
(VERDICT r2 item 2: accuracy regressions must fail CI, not just the
benchmark round).

Runs the first 90 frames of the desk sequence — the same on-disk imagery
the C++ reference is measured on (BENCH_ACCURACY.md) — at the REFERENCE
thresholds (match_th_scale=1.0) and asserts full coverage and mm-class
ATE. Catches the round-2 class of failures: the 0.29m trajectory-saver
bursts (dead-KF re-parenting), tracking loss, and BA-window collapse all
blow the threshold by an order of magnitude.

Skips when data/synth is absent (regenerate with tools/make_datasets.py).
"""

import os

import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")
SEQ = os.path.join(REPO, "data", "synth", "desk")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SEQ), reason="rendered datasets not on disk"
)

N_FRAMES = 90
ATE_LIMIT_M = 0.030  # measured ~0.008-0.012 on this head; reference 0.0054


def test_desk_head_ate():
    from orb_slam2_comment_tpu.models.system import System
    from orb_slam2_comment_tpu.utils import datasets as ds
    from orb_slam2_comment_tpu.utils.config import load_yaml_settings

    cfg = load_yaml_settings(os.path.join(SEQ, "settings.yaml"), "rgbd")
    items = ds.load_tum_rgbd(
        SEQ, os.path.join(SEQ, "associations.txt"))[:N_FRAMES]
    system = System(cfg)
    for i, f in enumerate(ds.FramePrefetcher(items, lookahead=8, threads=4)):
        system.track_rgbd(f["image"], f["depth"], f["timestamp"])
    system.shutdown()

    # evaluate against ground truth with the h2h harness's own machinery
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from head_to_head import associate, evaluate_ate, load_tum_traj

    fp = system._frame_poses()
    assert len(fp) >= N_FRAMES - 2, f"coverage {len(fp)}/{N_FRAMES}"
    ts = np.array([t for t, _ in fp])
    centers = np.stack([np.linalg.inv(T)[:3, 3] for _, T in fp])
    gt_ts, gt_T = load_tum_traj(os.path.join(SEQ, "groundtruth.txt"))
    ia, ib = associate(ts, gt_ts)
    rmse, _ = evaluate_ate(centers[ia], gt_T[ib][:, :3, 3])
    assert rmse < ATE_LIMIT_M, f"desk head ATE {rmse*1000:.1f} mm"
