"""Replay a snapshotted local-BA window offline (street divergence diag).

Usage: python tools/diag_ba_replay.py /tmp/snap_kf12.npz 12 [--x64]
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
if "--x64" in sys.argv:
    jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp
from orb_slam2_comment_tpu.models import map_state as ms
from orb_slam2_comment_tpu.models import local_mapping as lm
from orb_slam2_comment_tpu.ops import optim, geometry as geo
from orb_slam2_comment_tpu.utils.config import load_yaml_settings

path = sys.argv[1]
kf_id = int(sys.argv[2])
z = np.load(path)
fields = {k[2:]: jnp.asarray(v) for k, v in z.items() if k.startswith("m_")}
m = ms.MapState(**fields)
cfg = load_yaml_settings("data/synth/street/settings.yaml", "stereo")

prob, cam_ids, pt_ids = lm.build_ba_window(m, jnp.asarray(kf_id), cfg)
prob = jax.tree_util.tree_map(np.asarray, prob)
prob = jax.tree_util.tree_map(jnp.asarray, prob)
nv = int(np.sum(np.asarray(prob.obs_valid)))
ncam = int(np.sum(np.asarray(cam_ids) >= 0))
npt = int(np.sum(np.asarray(pt_ids) >= 0))
print(f"window: {ncam} cams, {npt} pts, {nv} valid obs "
      f"(caps {prob.cam_T.shape[0]} cams {prob.pts.shape[0]} pts)")
# how many in-window candidate points were truncated?
kmax = m.kf_pose.shape[0]
pmax = m.pt_pos.shape[0]
print("total valid pts in map:", int(np.sum(np.asarray(m.pt_valid))))

# per-point observation counts inside the window
obs_pt = np.asarray(prob.obs_pt)
ok = np.asarray(prob.obs_valid)
cnt = np.bincount(obs_pt[ok], minlength=prob.pts.shape[0])
sel = np.asarray(pt_ids) >= 0
print("window pts by #obs: 1:", int(((cnt == 1) & sel).sum()),
      " 2:", int(((cnt == 2) & sel).sum()),
      " >=3:", int(((cnt >= 3) & sel).sum()),
      " 0:", int(((cnt == 0) & sel).sum()))

inv_s2 = lm._inv_sigma2(cfg)
res = optim.local_bundle_adjustment(prob, inv_s2, cfg.K, cfg.bf)
pts0 = np.asarray(prob.pts); pts1 = np.asarray(res.pts)
d = np.linalg.norm(pts1 - pts0, axis=1)[sel[:len(pts0)] if len(sel)==len(pts0) else slice(None)]
d = np.linalg.norm(pts1 - pts0, axis=1)
dsel = d[np.asarray(pt_ids) >= 0] if len(d) == prob.pts.shape[0] else d
print(f"pt move p50={np.median(dsel):.4f} p90={np.percentile(dsel,90):.3f} "
      f"max={dsel.max():.2f}")
T0 = np.asarray(prob.cam_T); T1 = np.asarray(res.cam_T)
free = ~np.asarray(prob.cam_fixed) & np.asarray(prob.cam_valid)
dp = np.abs(T1 - T0).reshape(len(T0), -1).max(1)
print("cam dpose (free):", np.round(dp[free], 4))
print("cost:", float(res.cost))
# which points moved the most, and their window obs counts + depths
w = np.argsort(-d)[:10]
for i in w:
    print(f"  pt {i}: moved {d[i]:9.2f} obs_in_window={cnt[i]} "
          f"pos0={np.round(pts0[i],1)} pos1={np.round(pts1[i],1)}")
