"""Capacity tiers + large-map solvers (VERDICT r1 item 3).

Covers: MapState growth (grow_map / KeyFrameDatabase.grow / tracker
auto-grow), the all-pairs covisibility matrix, the device essential-edge
builder, and the sparse (edge-indexed PCG) essential-graph optimizer at
KITTI-00 scale against the dense reference implementation.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam2_comment_tpu.models import map_state as ms
from orb_slam2_comment_tpu.ops import optim
from orb_slam2_comment_tpu.utils import synthetic as syn
from orb_slam2_comment_tpu.utils.config import SlamConfig

K = syn.DEFAULT_K
B = syn.DEFAULT_BASELINE


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _random_map(kmax=8, pmax=64, n_feat=16, n_valid_kf=6, seed=0):
    rng = np.random.RandomState(seed)
    m = ms.empty_map(kmax, pmax, n_feat)
    obs = np.full((kmax, n_feat), -1, np.int64)
    for k in range(kmax):
        pts = rng.choice(pmax, size=12, replace=False)
        obs[k, :12] = pts
    pt_valid = rng.rand(pmax) > 0.2
    parent = np.full(kmax, -1, np.int64)
    parent[1:n_valid_kf] = np.arange(n_valid_kf - 1)
    poses = np.tile(np.eye(4, dtype=np.float32), (kmax, 1, 1))
    poses[:, :3, 3] = rng.randn(kmax, 3).astype(np.float32)
    return m._replace(
        kf_obs=jnp.asarray(obs, jnp.int32),
        kf_valid=jnp.asarray(np.arange(kmax) < n_valid_kf),
        kf_feat_valid=jnp.asarray(obs >= 0),
        kf_parent=jnp.asarray(parent, jnp.int32),
        kf_pose=jnp.asarray(poses),
        pt_valid=jnp.asarray(pt_valid),
    )


def _pose_graph_loop(Kn, drift=0.02, seed=0):
    """Circular trajectory, drifting odometry chain + one perfect loop
    edge — the canonical loop-closure pose-graph problem."""
    rng = np.random.RandomState(seed)
    th = np.linspace(0, 2 * np.pi, Kn, endpoint=False)
    Twc = np.tile(np.eye(4), (Kn, 1, 1))
    r = 5.0
    for k in range(Kn):
        c, s = np.cos(th[k]), np.sin(th[k])
        Twc[k, :3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        Twc[k, :3, 3] = [r * c, 0, r * s]
    Tcw_gt = np.linalg.inv(Twc)
    est = [Tcw_gt[0]]
    for k in range(1, Kn):
        rel = Tcw_gt[k] @ np.linalg.inv(Tcw_gt[k - 1])
        noise = np.eye(4)
        noise[:3, 3] = rng.randn(3) * drift
        est.append(noise @ rel @ est[-1])
    S0 = np.stack(est).astype(np.float32)
    ei = np.arange(Kn - 1, dtype=np.int32)
    ej = ei + 1
    Sji = np.stack([
        Tcw_gt[j] @ np.linalg.inv(Tcw_gt[i]) for i, j in zip(ei, ej)
    ]).astype(np.float32)
    ei = np.concatenate([ei, [0]]).astype(np.int32)
    ej = np.concatenate([ej, [Kn - 1]]).astype(np.int32)
    Sji = np.concatenate([
        Sji, (Tcw_gt[Kn - 1] @ np.linalg.inv(Tcw_gt[0]))[None].astype(np.float32)
    ])
    ok = np.ones(len(ei), bool)
    valid = np.ones(Kn, bool)
    fixed = np.zeros(Kn, bool)
    fixed[0] = True
    return S0, valid, fixed, ei, ej, Sji, ok, Tcw_gt


def _ate(S, gt):
    c_est = np.stack([np.linalg.inv(T)[:3, 3] for T in np.asarray(S)])
    c_gt = np.stack([np.linalg.inv(T)[:3, 3] for T in gt])
    return float(np.sqrt(np.mean(np.sum((c_est - c_gt) ** 2, -1))))


# ---------------------------------------------------------------------------
# covisibility matrix + growth primitives
# ---------------------------------------------------------------------------

def test_covisibility_matrix_matches_per_kf():
    m = _random_map()
    W = np.asarray(ms.covisibility_matrix(m))
    assert np.array_equal(W, W.T)
    for k in range(6):
        wk = np.asarray(ms.covisibility_weights(m, jnp.asarray(k)))
        assert np.array_equal(W[k], wk)
    # invalid KFs contribute nothing
    assert W[6:].sum() == 0 and W[:, 6:].sum() == 0


def test_grow_map_preserves_content():
    m = _random_map()
    g = ms.grow_map(m, 32, 256)
    assert g.kf_obs.shape == (32, 16)
    assert g.pt_pos.shape == (256, 3)
    assert np.array_equal(np.asarray(g.kf_obs[:8]), np.asarray(m.kf_obs))
    assert np.array_equal(np.asarray(g.pt_valid[:64]), np.asarray(m.pt_valid))
    assert not bool(np.asarray(g.kf_valid[8:]).any())
    assert np.array_equal(np.asarray(g.kf_Tcp[20]), np.eye(4))
    # no shrink
    with pytest.raises(ValueError):
        ms.grow_map(m, 4, 256)
    # same-size is identity
    assert ms.grow_map(m, 8, 64) is m


# ---------------------------------------------------------------------------
# device essential-edge builder
# ---------------------------------------------------------------------------

def test_essential_edges_kernel_semantics():
    from orb_slam2_comment_tpu.models.loop_closing import _essential_edges
    from orb_slam2_comment_tpu import constants as C

    m = _random_map(kmax=8, pmax=64, n_feat=48, n_valid_kf=8, seed=3)
    # force a strong covisibility pair: KFs 2 and 5 share >=100 obs slots
    obs = np.asarray(m.kf_obs).copy()
    big = np.arange(40)
    obs[2, :40] = big
    obs[5, :40] = big
    m = m._replace(
        kf_obs=jnp.asarray(obs),
        kf_feat_valid=jnp.asarray(obs >= 0),
        pt_valid=jnp.ones(64, bool),
    )
    # ESSENTIAL_MIN_WEIGHT is 100 in the reference; our fixture shares 40,
    # so check against the actual constant by scaling the expectation
    S12 = np.eye(4, dtype=np.float32)
    ei, ej, Sji, ok = _essential_edges(
        m, m.kf_pose, 8, kf_id=7, cand=0, S12=S12,
        past_loop_edges=[(1, 6, None)],
    )
    ei, ej, ok = np.asarray(ei), np.asarray(ej), np.asarray(ok)
    Sji = np.asarray(Sji)
    pairs = {(int(a), int(b)) for a, b, o in zip(ei, ej, ok) if o}
    # spanning-tree edges present
    parent = np.asarray(m.kf_parent)
    for k in range(8):
        if parent[k] >= 0:
            assert (int(parent[k]), k) in pairs
    # past loop edge + new loop edge present
    assert (1, 6) in pairs
    assert (0, 7) in pairs
    # covis pair (2,5) present iff 40 >= threshold
    assert ((2, 5) in pairs) == (40 >= C.ESSENTIAL_MIN_WEIGHT)
    # every non-loop measurement equals pose[j] @ inv(pose[i])
    poses = np.asarray(m.kf_pose)
    for idx in range(len(ei)):
        if not ok[idx]:
            continue
        a, b = int(ei[idx]), int(ej[idx])
        if (a, b) == (0, 7):
            assert np.allclose(Sji[idx], S12, atol=1e-5)
        else:
            want = poses[b] @ np.linalg.inv(poses[a])
            assert np.allclose(Sji[idx], want, atol=1e-4)


# ---------------------------------------------------------------------------
# sparse essential-graph optimizer
# ---------------------------------------------------------------------------

def test_sparse_pose_graph_matches_dense():
    S0, valid, fixed, ei, ej, Sji, ok, gt = _pose_graph_loop(48)
    args = (jnp.asarray(S0), jnp.asarray(valid), jnp.asarray(fixed),
            jnp.asarray(ei), jnp.asarray(ej), jnp.asarray(Sji),
            jnp.asarray(ok))
    rd = optim.essential_graph_optimize(*args, fix_scale=True)
    rs = optim.essential_graph_optimize_sparse(*args, fix_scale=True,
                                               cg_iters=150)
    ate0 = _ate(S0, gt)
    ate_d = _ate(rd.S, gt)
    ate_s = _ate(rs.S, gt)
    assert ate_d < 0.02 * ate0
    assert ate_s < 0.02 * ate0
    # same optimum within solver tolerance
    assert abs(ate_d - ate_s) < 5e-3


def test_sparse_pose_graph_kitti00_scale():
    """~1.3k KFs — the scale the dense [7K,7K] assembly cannot reach
    (VERDICT r1 missing #3). Bounded memory (O(E) blocks) and converges."""
    Kn = 1300
    S0, valid, fixed, ei, ej, Sji, ok, gt = _pose_graph_loop(Kn, drift=0.01)
    rs = optim.essential_graph_optimize_sparse(
        jnp.asarray(S0), jnp.asarray(valid), jnp.asarray(fixed),
        jnp.asarray(ei), jnp.asarray(ej), jnp.asarray(Sji), jnp.asarray(ok),
        fix_scale=True, cg_iters=1600,
    )
    ate0 = _ate(S0, gt)
    ate1 = _ate(rs.S, gt)
    assert ate1 < 0.05 * ate0, (ate0, ate1)


# ---------------------------------------------------------------------------
# end-to-end auto-grow
# ---------------------------------------------------------------------------

@pytest.mark.skipif(
    __import__("os").environ.get("RUN_SLOW_TESTS", "") in ("", "0"),
    reason="135s e2e growth run is opt-in (RUN_SLOW_TESTS=1); "
           "grow_map/KFDB growth stay covered by the unit tests above",
)
def test_tracker_auto_grow_e2e():
    """Drive the full system with tiny starting tiers and force growth
    mid-sequence; tracking stays OK and the grown map keeps its content."""
    from orb_slam2_comment_tpu.models.system import System
    from orb_slam2_comment_tpu.models.tracking import OK

    # 16 is the smallest tier above the fixed BA-window constants
    # (NC_FREE/NC_FIXED=12); LOCAL_POINTS_CAP=8192 floors max_points
    cfg = SlamConfig(
        sensor="rgbd",
        fx=K[0], fy=K[1], cx=K[2], cy=K[3],
        bf=K[0] * B,
        n_features=600, n_levels=4,
        max_keyframes=16, max_points=8192,
        max_keyframes_cap=64, max_points_cap=32768,
        match_th_scale=1.5,
        enable_loop_closing=False,
    )
    system = System(cfg)
    scene = syn.make_scene(n_points=1400, seed=0)
    poses = syn.make_trajectory("orbit", n_frames=60, step=0.1)
    states = []
    for f in syn.render_sequence(scene, poses, K=K, depth=True, baseline=B):
        out = system.track_rgbd(f["image"], f["depth"], f["timestamp"])
        states.append(out.state)
    system.tracker._flush_all()
    trk = system.tracker
    assert trk.cfg.max_keyframes > 16, "growth never triggered"
    assert trk.map.kf_obs.shape[0] == trk.cfg.max_keyframes
    assert system.cfg.max_keyframes == trk.cfg.max_keyframes
    assert system.db.bow.shape[0] == trk.cfg.max_keyframes
    assert system.get_tracking_state() == OK
    # KFs created before growth survive (slot cursor passed the old tier;
    # culling may have invalidated some, so compare >=)
    assert trk.n_kfs >= 13
    assert int(np.asarray(trk.map.kf_valid).sum()) >= 10


def test_point_compaction_preserves_graph():
    """ms.compact_points: live points move to rank slots, kf_obs entries
    remap, dead observations clear (round-3 slot-churn fix: the cursor
    used to exhaust the arena while ~20% of slots were live)."""
    import jax.numpy as jnp
    import numpy as np
    from orb_slam2_comment_tpu.models import map_state as ms

    m = ms.empty_map(4, 32, 8)  # 4 KFs, 32 point slots, 8 features
    # live points at scattered high slots
    live = [3, 10, 17, 29]
    pos = np.zeros((32, 3), np.float32)
    for i, p in enumerate(live):
        pos[p] = [i + 1.0, 0, 0]
    obs = np.full((4, 8), -1, np.int32)
    obs[0, :4] = [3, 10, 17, 29]
    obs[1, 0] = 10
    obs[1, 1] = 5            # dead point observation -> must clear
    m = m._replace(
        kf_valid=m.kf_valid.at[:2].set(True),
        pt_valid=m.pt_valid.at[jnp.asarray(live)].set(True),
        pt_pos=jnp.asarray(pos),
        kf_obs=jnp.asarray(obs),
    )
    m2, n_live, remap = ms.compact_points(m)
    assert int(n_live) == 4
    pv = np.asarray(m2.pt_valid)
    assert pv[:4].all() and not pv[4:].any()
    # positions moved with their ids
    np.testing.assert_allclose(
        np.asarray(m2.pt_pos[:4, 0]), [1.0, 2.0, 3.0, 4.0])
    o2 = np.asarray(m2.kf_obs)
    assert o2[0, :4].tolist() == [0, 1, 2, 3]
    assert o2[1, 0] == 1
    assert o2[1, 1] == -1
