import time
import numpy as np
import jax, jax.numpy as jnp
from orb_slam2_comment_tpu.models.system import System
from orb_slam2_comment_tpu.models import tracking as T
from orb_slam2_comment_tpu.utils import synthetic as syn
from orb_slam2_comment_tpu.utils.config import SlamConfig

K = syn.DEFAULT_K
cfg = SlamConfig(sensor="rgbd", fx=K[0], fy=K[1], cx=K[2], cy=K[3],
    bf=K[0]*syn.DEFAULT_BASELINE, n_features=1000, n_levels=8,
    max_keyframes=128, max_points=32768, match_th_scale=1.5, depth_map_factor=1000.0)
scene = syn.make_scene(n_points=1600, seed=0, extent=(6.0,4.0,6.0), z_near=1.0)
poses = syn.make_trajectory("jitter", n_frames=80, step=0.04)
frames = []
for f in syn.render_sequence(scene, poses, K=K, depth=True):
    f["image"] = np.clip(f["image"],0,255).astype(np.uint8)
    f["depth"] = np.clip(f["depth"]*1000.0,0,65535).astype(np.uint16)
    frames.append(f)
system = System(cfg)
for f in frames[:8]:
    system.track_rgbd(f["image"], f["depth"], f["timestamp"])
system.tracker._flush_all()
for f in frames[8:12]:
    system.track_rgbd(f["image"], f["depth"], f["timestamp"])
system.tracker._flush_all()
trk = system.tracker

acc = dict(flush=0., futwait=0., samp=0., dispatch=0., upload=0., n=0)
orig = trk.track_rgbd_arrays
def patched(frame_id, ts, image, depth_map):
    t0=time.perf_counter(); trk._flush_ready(); t1=time.perf_counter()
    img = jnp.asarray(image); t2=time.perf_counter()
    if len(trk._stageA) >= 2:
        fid0, ts0, feats0, dm0, fut0 = trk._stageA.popleft()
        xy = fut0.result(); t3=time.perf_counter()
        samples = trk._sample_depth_host(dm0, xy); t4=time.perf_counter()
        meta0 = jnp.asarray(np.asarray([fid0, ts0, fid0 - trk.last_reloc_frame_id], np.float32))
        trk.map, trk.ds, out0, feats = T._step_and_extract_rgbd(
            trk.map, trk.ds, feats0, jnp.asarray(samples), meta0, img, trk.cfg)
        t5=time.perf_counter()
        trk.n_pts_dev = trk.ds.n_pts
        trk._pending.append((fid0, ts0, out0))
        trk._pull_async(fid0, out0)
        acc["futwait"]+=t3-t2; acc["samp"]+=t4-t3; acc["dispatch"]+=t5-t4
    else:
        feats = T._extract_stage(img, trk.cfg)
    fut = trk._io_pool.submit(np.asarray, feats.xy)
    trk._stageA.append((frame_id, ts, feats, depth_map, fut))
    acc["flush"]+=t1-t0; acc["upload"]+=t2-t1; acc["n"]+=1
    return T.LazyTrackOutput(trk, frame_id)
trk.track_rgbd_arrays = patched

t0=time.perf_counter(); n=0
for f in frames[12:]:
    system.track_rgbd(f["image"], f["depth"], f["timestamp"]); n+=1
trk._flush_all()
tot=time.perf_counter()-t0
print({k:(round(v/n*1e3,2) if k!="n" else v) for k,v in acc.items()}, f"total={tot/n*1e3:.2f}ms")
