"""Viewer/FrameDrawer/MapDrawer equivalents (utils/viz.py)."""

import numpy as np
import pytest

from orb_slam2_comment_tpu.models import map_state as ms
from orb_slam2_comment_tpu.utils import viz


class FakeFeats:
    def __init__(self, n=30, seed=0):
        r = np.random.RandomState(seed)
        self.xy = r.uniform(10, 100, (n, 2)).astype(np.float32)
        self.valid = np.ones(n, bool)


def _small_map():
    m = ms.empty_map(8, 256, 128)
    kf_pose = np.asarray(m.kf_pose).copy()
    kf_valid = np.asarray(m.kf_valid).copy()
    kf_parent = np.asarray(m.kf_parent).copy()
    pt_pos = np.asarray(m.pt_pos).copy()
    pt_valid = np.asarray(m.pt_valid).copy()
    kf_obs = np.asarray(m.kf_obs).copy()
    for i in range(3):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = -0.5 * i
        kf_pose[i] = T
        kf_valid[i] = True
        kf_parent[i] = i - 1
        kf_obs[i, :120] = np.arange(120)  # 120 shared points
    pt_pos[:150] = np.random.RandomState(0).uniform(-2, 2, (150, 3))
    pt_valid[:150] = True
    import jax.numpy as jnp

    return m._replace(
        kf_pose=jnp.asarray(kf_pose), kf_valid=jnp.asarray(kf_valid),
        kf_parent=jnp.asarray(kf_parent), pt_pos=jnp.asarray(pt_pos),
        pt_valid=jnp.asarray(pt_valid), kf_obs=jnp.asarray(kf_obs),
    )


def test_annotate_frame_overlay_and_statusbar():
    img = np.full((120, 160), 100, np.uint8)
    f = FakeFeats()
    assoc = np.full(30, -1)
    assoc[:10] = np.arange(10)
    out = viz.annotate_frame(img, f, assoc, state=1, n_kfs=3, n_pts=150)
    assert out.shape[1] == 160 and out.shape[0] >= 120  # + status bar
    # green tracked markers present
    assert ((out[..., 1] == 220) & (out[..., 0] == 0)).sum() > 20


def test_covisibility_edges_counts_shared_points():
    m = _small_map()
    edges = viz.covisibility_edges(m, min_weight=100)
    # all three KFs share 120 points pairwise
    assert len(edges) == 3
    assert all(w == 120 for _, _, w in edges)


def test_plot_map_writes_png(tmp_path):
    m = _small_map()
    p = str(tmp_path / "map.png")
    out = viz.plot_map(m, trajectory=[np.eye(4)], out_path=p,
                       current_Tcw=np.eye(4), loop_edges=[(0, 2)])
    import os

    assert os.path.exists(out) and os.path.getsize(out) > 1000
