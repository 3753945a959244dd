"""End-to-end tracking integration tests on synthetic sequences
(the deterministic-sequence tier of the test pyramid, SURVEY.md §4)."""

import numpy as np
import pytest

from orb_slam2_comment_tpu.models import frame as fr
from orb_slam2_comment_tpu.models.tracking import OK, Tracker
from orb_slam2_comment_tpu.utils import synthetic as syn
from orb_slam2_comment_tpu.utils import trajectory as traj
from orb_slam2_comment_tpu.utils.config import SlamConfig

K = syn.DEFAULT_K
B = syn.DEFAULT_BASELINE
N_FRAMES = 8


def _cfg(sensor):
    return SlamConfig(
        sensor=sensor,
        fx=K[0], fy=K[1], cx=K[2], cy=K[3],
        bf=K[0] * B,
        n_features=600,
        n_levels=4,
        max_keyframes=32,
        max_points=8192,
        match_th_scale=1.5,
    )


def _run(sensor, n_frames=N_FRAMES, trajectory="jitter", step=0.05):
    cfg = _cfg(sensor)
    scene = syn.make_scene(n_points=1400, seed=0)
    poses = syn.make_trajectory(trajectory, n_frames=n_frames, step=step)
    tracker = Tracker(cfg)
    est, gt = [], []
    frames = syn.render_sequence(
        scene, poses, K=K, stereo=sensor == "stereo",
        depth=sensor == "rgbd", baseline=B,
    )
    for i, f in enumerate(frames):
        if sensor == "rgbd":
            frame = fr.build_frame_rgbd(i, f["timestamp"], f["image"], f["depth"], cfg)
        else:
            frame = fr.build_frame_stereo(
                i, f["timestamp"], f["image"], f["image_right"], cfg
            )
        out = tracker.track(frame)
        if out.Tcw is not None:
            est.append(out.Tcw)
            gt.append(f["Tcw_gt"])
    return tracker, est, gt


class TestRGBDPipeline:
    def test_tracks_sequence(self):
        # forward motion: the camera genuinely leaves the initial view, so
        # the keyframe policy must fire (small jitter around the origin
        # correctly creates NO new keyframes now that matching recall is
        # reference-grade — tracking vs KF0 stays above the 0.4 ratio)
        tracker, est, gt = _run("rgbd", trajectory="forward", step=0.25)
        assert len(est) == N_FRAMES, f"tracked {len(est)}/{N_FRAMES}"
        assert tracker.state == OK
        assert tracker.n_kfs >= 2
        assert tracker.n_pts > 300
        ate = traj.ate_rmse(est, gt)
        assert ate < 0.05, f"ATE {ate*100:.1f} cm"


class TestStereoPipeline:
    def test_tracks_sequence(self):
        tracker, est, gt = _run("stereo")
        assert len(est) == N_FRAMES, f"tracked {len(est)}/{N_FRAMES}"
        assert tracker.state == OK
        ate = traj.ate_rmse(est, gt)
        assert ate < 0.05, f"ATE {ate*100:.1f} cm"


class TestTrajectoryIO:
    def test_tum_format(self, tmp_path):
        poses = [np.eye(4, dtype=np.float32)]
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [1, 2, 3]
        poses.append(T)
        p = tmp_path / "traj.txt"
        traj.save_tum(str(p), [0.0, 0.05], poses)
        lines = p.read_text().strip().split("\n")
        assert len(lines) == 2
        vals = [float(v) for v in lines[1].split()]
        assert len(vals) == 8
        # camera center of Tcw with t=(1,2,3), R=I is (-1,-2,-3)
        np.testing.assert_allclose(vals[1:4], [-1, -2, -3], atol=1e-5)
        # identity quaternion (x,y,z,w)
        np.testing.assert_allclose(vals[4:8], [0, 0, 0, 1], atol=1e-5)

    def test_kitti_format(self, tmp_path):
        p = tmp_path / "traj_kitti.txt"
        traj.save_kitti(str(p), [np.eye(4, dtype=np.float32)])
        vals = [float(v) for v in p.read_text().split()]
        assert len(vals) == 12
        np.testing.assert_allclose(
            np.asarray(vals).reshape(3, 4), np.eye(4)[:3], atol=1e-8
        )

    def test_umeyama(self):
        r = np.random.default_rng(0)
        src = r.normal(size=(20, 3))
        s, ang = 1.7, 0.4
        R = np.array(
            [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]]
        )
        dst = s * (R @ src.T).T + [1, 2, 3]
        aligned, (s_est, R_est, t_est) = traj.umeyama_align(src, dst, with_scale=True)
        np.testing.assert_allclose(aligned, dst, atol=1e-8)
        assert abs(s_est - s) < 1e-8
