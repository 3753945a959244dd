"""Diagnose the full-trajectory burst errors (VERDICT r2 item 1).

Runs the RGB-D pipeline on a head of data/synth/desk with an instrumented
tracker that records, per frame, the FRAME-TIME pose (Tcw as tracked) and
the (Tcr, ref) pair used by the saver; then compares
  (a) frame-time Tcw vs GT   — was tracking itself bad on burst frames?
  (b) saved composition vs GT — or did save-time composition break?
Alignment is anchored on the keyframe trajectory only.
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
if os.environ.get("DIAG_CPU", "1") == "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np
from orb_slam2_comment_tpu.models import tracking as trk
from orb_slam2_comment_tpu.models.system import System
from orb_slam2_comment_tpu.utils import datasets as ds
from orb_slam2_comment_tpu.utils.config import load_yaml_settings
from orb_slam2_comment_tpu.utils import trajectory as traj

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100
SEQ = sys.argv[2] if len(sys.argv) > 2 else "desk"
seq_dir = f"data/synth/{SEQ}"
KIND = "kitti_stereo" if SEQ == "street" else "tum_rgbd"

records = []  # (fid, ts, Tcw, Tcr, ref, tracked)
orig = trk.Tracker._resolve_entry

def patched(self, fid, ts, s):
    Tcw = s[trk.X_TCW:trk.X_TCW + 16].reshape(4, 4).copy()
    Tcr = s[trk.X_TCR:trk.X_TCR + 16].reshape(4, 4).copy()
    records.append((fid, ts, Tcw, Tcr, int(s[trk.X_REF_KF]),
                    s[trk.X_TRACKED] > 0))
    print(f"  stats f{fid}: inl={int(s[trk.S_N_INL])} "
          f"motion={int(s[trk.S_N_MOTION])} ref={int(s[trk.S_N_REF])} "
          f"inlM={int(s[trk.S_INL_M])} inlR={int(s[trk.S_INL_R])} "
          f"coarse={int(s[trk.S_COARSE_OK])} usedM={int(s[trk.S_USED_MOTION])} "
          f"needKF={int(s[trk.S_NEED_KF])} trackedclose={int(s[trk.S_TRACKED_CLOSE])} "
          f"tracked={int(s[trk.X_TRACKED])}", flush=True)
    return orig(self, fid, ts, s)

trk.Tracker._resolve_entry = patched

# mapper-pass instrumentation: print how much each pass moves the map
from orb_slam2_comment_tpu.models import local_mapping as lmod
_orig_process = lmod.LocalMapper.process

SNAP_KFS = {int(x) for x in os.environ.get("DIAG_SNAP_KF", "").split(",")
            if x.strip().isdigit()}

def process_patched(self, kf_id):
    m0 = self.tracker.map
    if kf_id in SNAP_KFS:
        d = {f"m_{k}": np.asarray(v)
             for k, v in m0._asdict().items()}
        d["pt_base"] = np.asarray(self.tracker.n_pts_dev)
        np.savez(f"/tmp/snap_kf{kf_id}.npz", **d)
        print(f"  [snap] saved /tmp/snap_kf{kf_id}.npz", flush=True)
    pose0 = np.asarray(m0.kf_pose).copy()
    valid0 = np.asarray(m0.kf_valid).copy()
    pos0 = np.asarray(m0.pt_pos).copy()
    pv0 = np.asarray(m0.pt_valid).copy()
    r = _orig_process(self, kf_id)
    m1 = self.tracker.map
    pose1 = np.asarray(m1.kf_pose)
    valid1 = np.asarray(m1.kf_valid)
    pos1 = np.asarray(m1.pt_pos)
    pv1 = np.asarray(m1.pt_valid)
    both = valid0 & valid1
    dpose = np.abs(pose1[both] - pose0[both]).max() if both.any() else 0.0
    pboth = pv0 & pv1
    dpt = np.linalg.norm(pos1[pboth] - pos0[pboth], axis=1)
    print(f"  [mapper kf={kf_id}] pts {pv0.sum()}->{pv1.sum()} "
          f"kfs {valid0.sum()}->{valid1.sum()} max|dpose|={dpose:.3f} "
          f"pt_move p50={np.median(dpt) if len(dpt) else 0:.3f} "
          f"max={dpt.max() if len(dpt) else 0:.3f}", flush=True)
    return r

lmod.LocalMapper.process = process_patched

sensor = "stereo" if KIND == "kitti_stereo" else "rgbd"
cfg = load_yaml_settings(f"{seq_dir}/settings.yaml", sensor)
if KIND == "kitti_stereo":
    items = ds.load_kitti(seq_dir, stereo=True)[:N]
else:
    items = ds.load_tum_rgbd(seq_dir, f"{seq_dir}/associations.txt")[:N]
system = System(cfg)
import time as _time
for i, f in enumerate(ds.FramePrefetcher(items, lookahead=8, threads=4)):
    t0 = _time.perf_counter()
    if sensor == "stereo":
        out = system.track_stereo(f["image"], f["image_right"], f["timestamp"])
    else:
        out = system.track_rgbd(f["image"], f["depth"], f["timestamp"])
    if i % 5 == 0:
        print(f"frame {i} state={out.state} inl={out.n_inliers} "
              f"{(_time.perf_counter()-t0)*1e3:.0f}ms", flush=True)
system.shutdown()

m = system.tracker.map
kf_pose = np.asarray(m.kf_pose)
kf_valid = np.asarray(m.kf_valid)
kf_ts = system.tracker.kf_ts_host

# GT
if KIND == "kitti_stereo":
    from tools.head_to_head import load_kitti_traj
    gt_T = load_kitti_traj(f"{seq_dir}/poses_gt.txt")
    fps = cfg.fps or 10.0
    gt_ts = np.arange(len(gt_T)) / fps
else:
    from tools.head_to_head import load_tum_traj
    gt_ts, gt_T = load_tum_traj(f"{seq_dir}/groundtruth.txt")

def gt_at(t):
    return gt_T[int(np.argmin(np.abs(gt_ts - t)))]

# align on final KF poses (Twc centers)
kidx = np.where(kf_valid)[0]
kc = np.stack([np.linalg.inv(kf_pose[i])[:3, 3] for i in kidx])
gc = np.stack([gt_at(kf_ts[i])[:3, 3] for i in kidx])
_, (sc, R, t) = traj.umeyama_align(kc, gc, with_scale=False)
print(f"KF-anchored alignment over {len(kidx)} KFs")

print(" fid    t   ref  frameTimeErr  savedErr   (mm)")
for fid, ts, Tcw, Tcr, ref, tracked in records:
    if not tracked:
        print(f"{fid:4d} {ts:6.2f}  LOST")
        continue
    c_frame = np.linalg.inv(Tcw)[:3, 3]
    T_saved = Tcr @ kf_pose[ref]
    c_saved = np.linalg.inv(T_saved)[:3, 3]
    g = gt_at(ts)[:3, 3]
    e_f = np.linalg.norm(R @ c_frame + t - g) * 1000
    e_s = np.linalg.norm(R @ c_saved + t - g) * 1000
    flag = " <== " if max(e_f, e_s) > 50 else ""
    print(f"{fid:4d} {ts:6.2f} {ref:4d} {e_f:10.1f} {e_s:10.1f}{flag}")
