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
        fused_tracking=False,  # donation safety covered by
                               # test_snapshot_survives_donated_map below
    )
    return System(cfg)


def test_snapshot_survives_donated_map():
    """Regression: the background-GBA snapshot aliased live map buffers;
    when the fused tracking kernels (donate_argnums on the map) consumed
    them, pending chunks crashed with 'Buffer has been deleted'. The
    snapshot must hold copies (loop_closing._build_gba_problem)."""
    import jax.numpy as jnp

    from orb_slam2_comment_tpu.models import map_state as ms
    from orb_slam2_comment_tpu.models.loop_closing import _build_gba_problem
    from orb_slam2_comment_tpu.ops import optim

    cfg = SlamConfig(sensor="rgbd", max_keyframes=16, max_points=8192,
                     n_features=64, n_levels=4)
    m = ms.empty_map(16, 8192, 64)
    rng = np.random.RandomState(0)
    obs = np.full((16, 64), -1, np.int64)
    for k in range(4):
        obs[k] = np.arange(64) + 16 * k
    m = m._replace(
        kf_valid=jnp.asarray(np.arange(16) < 4),
        kf_obs=jnp.asarray(obs, jnp.int32),
        kf_feat_valid=jnp.asarray(obs >= 0),
        kf_xy=jnp.asarray(rng.uniform(0, 400, (16, 64, 2)).astype(np.float32)),
        pt_valid=jnp.asarray(np.arange(8192) < 16 * 4 + 48),
        pt_pos=jnp.asarray(
            rng.uniform(-3, 3, (8192, 3)).astype(np.float32) + [0, 0, 8]),
    )
    prob, inv_s2 = _build_gba_problem(m, cfg)
    carry = optim.gba_init_carry(prob, inv_s2, cfg.K, cfg.bf)
    # simulate the fused pipeline donating (deleting) the live map buffers
    for leaf in m:
        leaf.delete()
    carry = optim.gba_chunk(prob, inv_s2, carry, jnp.asarray(0, jnp.int32),
                            cfg.K, cfg.bf, n_iters=1)
    res = optim.gba_result(prob, inv_s2, cfg.K, cfg.bf, carry)
    assert np.isfinite(float(res.cost))


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
