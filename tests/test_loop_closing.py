"""Loop closing on an orbit trajectory + monocular pipeline integration."""

import numpy as np
import pytest

from orb_slam2_comment_tpu.models.system import System
from orb_slam2_comment_tpu.utils import synthetic as syn
from orb_slam2_comment_tpu.utils import trajectory as traj
from orb_slam2_comment_tpu.utils.config import SlamConfig

K = syn.DEFAULT_K
B = syn.DEFAULT_BASELINE


class TestLoopClosing:
    def test_orbit_closes_loop(self):
        """Full circle + 12-frame overshoot: tracking must survive the
        whole 8-deg/frame loop and the loop closer must detect +
        geometrically verify + correct at least one loop
        (DetectLoop->ComputeSim3->CorrectLoop chain). The overshoot
        re-traverses the start of the loop, which is what satisfies the
        reference's 3-consecutive-detection consistency check
        (mnCovisibilityConsistencyTh=3, src/LoopClosing.cc:43,152-211) —
        the same way KITTI loop sequences re-drive a visited street."""
        cfg = SlamConfig(
            sensor="rgbd",
            fx=K[0], fy=K[1], cx=K[2], cy=K[3],
            bf=K[0] * B,
            n_features=600,
            n_levels=4,
            max_keyframes=80,
            max_points=24576,
            match_th_scale=1.5,
            fused_tracking=False,  # staged ladder (also exercised here;
                                    # the fused path runs in test_pipeline)
        )
        system = System(cfg)
        scene = syn.make_scene(n_points=1800, seed=0, extent=(14.0, 8.0, 20.0))
        base = syn.make_trajectory("orbit", n_frames=44)
        poses = np.concatenate([base, base[:12]])
        est, gt = [], []
        for f in syn.render_sequence(scene, poses, K=K, depth=True):
            out = system.track_rgbd(f["image"], f["depth"], f["timestamp"])
            if out.Tcw is not None:
                est.append(out.Tcw)
                gt.append(f["Tcw_gt"])
        assert len(est) == len(poses), f"tracked {len(est)}/{len(poses)}"
        assert system.n_loops >= 1, "no loop closed on a full orbit"
        ate = traj.ate_rmse(est, gt)
        assert ate < 0.10, f"ATE {ate*100:.1f} cm"


class TestMonocularPipeline:
    def test_mono_init_and_track(self):
        cfg = SlamConfig(
            sensor="monocular",
            fx=K[0], fy=K[1], cx=K[2], cy=K[3],
            bf=K[0] * B,
            n_features=600,
            n_levels=4,
            max_keyframes=48,
            max_points=12288,
            match_th_scale=1.5,
        )
        system = System(cfg)
        scene = syn.make_scene(n_points=1600, seed=0, extent=(8.0, 6.0, 8.0), z_near=1.5)
        poses = []
        for i in range(14):
            T = np.eye(4, dtype=np.float32)
            T[:3, 3] = [-0.12 * i, 0.0, -0.02 * i]
            poses.append(T)
        est, gt = [], []
        for f in syn.render_sequence(scene, np.stack(poses), K=K):
            out = system.track_monocular(f["image"], f["timestamp"])
            if out.Tcw is not None:
                est.append(out.Tcw)
                gt.append(f["Tcw_gt"])
        assert system.tracker.n_kfs >= 2, "monocular init failed"
        assert len(est) >= 8, f"tracked only {len(est)}"
        # monocular is up-to-scale: align with Umeyama (scale included)
        ate = traj.ate_rmse(est, gt, align="umeyama")
        assert ate < 0.05, f"ATE {ate*100:.1f} cm"
        # triangulation grew the map beyond the two init keyframes
        assert system.tracker.n_pts > 150
