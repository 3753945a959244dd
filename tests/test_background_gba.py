"""Chunked, interruptible background GBA (VERDICT r1 item 4 — the
reference's transient GBA thread + mbStopGBA abort, P2/P6)."""

import numpy as np

from orb_slam2_comment_tpu.models.system import System
from orb_slam2_comment_tpu.utils import synthetic as syn
from orb_slam2_comment_tpu.utils import trajectory as traj
from orb_slam2_comment_tpu.utils.config import SlamConfig

K = syn.DEFAULT_K
B = syn.DEFAULT_BASELINE


def _orbit_system():
    cfg = SlamConfig(
        sensor="rgbd",
        fx=K[0], fy=K[1], cx=K[2], cy=K[3],
        bf=K[0] * B,
        n_features=600,
        n_levels=4,
        max_keyframes=80,
        max_points=24576,
        match_th_scale=1.5,
        fused_tracking=False,
    )
    return System(cfg)


def test_background_gba_chunks_and_applies():
    """A loop closure starts a chunked GBA instead of blocking the frame
    loop; per-frame pumps drain it; the applied correction keeps keyframe
    accuracy at the synchronous path's level."""
    system = _orbit_system()
    lc = system.loop_closer
    assert lc.gba_background  # default on
    scene = syn.make_scene(n_points=1800, seed=0, extent=(14.0, 8.0, 20.0))
    base = syn.make_trajectory("orbit", n_frames=44)
    poses = np.concatenate([base, base[:12]])
    saw_inflight = False
    for f in syn.render_sequence(scene, poses, K=K, depth=True):
        system.track_rgbd(f["image"], f["depth"], f["timestamp"])
        if lc._bg is not None:
            saw_inflight = True
    assert system.n_loops >= 1, "no loop closed on a full orbit"
    assert saw_inflight, "GBA never went in flight (chunking inactive?)"
    system.shutdown()
    assert lc._bg is None, "shutdown did not drain the background GBA"
    # keyframe map accuracy after the applied GBA
    m = system.tracker.map
    valid = np.where(np.asarray(m.kf_valid))[0]
    kf_poses = np.asarray(m.kf_pose)[valid]
    kf_fids = np.asarray(m.kf_frame_id)[valid]
    gt = [np.asarray(poses[i]) for i in kf_fids]
    ate = traj.ate_rmse(list(kf_poses), gt)
    assert ate < 0.10, f"KF ATE after background GBA {ate*100:.1f} cm"


def test_background_gba_abort():
    """abort_background drops the in-flight chunks without touching the
    map (mbStopGBA, src/LoopClosing.cc:410-423)."""
    system = _orbit_system()
    lc = system.loop_closer
    scene = syn.make_scene(n_points=1800, seed=0, extent=(14.0, 8.0, 20.0))
    base = syn.make_trajectory("orbit", n_frames=44)
    poses = np.concatenate([base, base[:6]])
    for f in syn.render_sequence(scene, poses, K=K, depth=True):
        system.track_rgbd(f["image"], f["depth"], f["timestamp"])
        if lc._bg is not None:
            break
    if lc._bg is None:  # loop may complete before overshoot ends
        return
    m_before = np.asarray(system.tracker.map.kf_pose)
    lc.abort_background()
    assert lc._bg is None
    assert np.array_equal(np.asarray(system.tracker.map.kf_pose), m_before)
