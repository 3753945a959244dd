"""Host-side per-frame overhead breakdown of the steady-state RGB-D loop
(current upQ pipeline), with pre-staged device images like bench.py."""
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
    max_keyframes=128, max_points=32768, match_th_scale=1.5,
    depth_map_factor=1000.0)
scene = syn.make_scene(n_points=1600, seed=0, extent=(6.0, 4.0, 6.0), z_near=1.0)
poses = syn.make_trajectory("jitter", n_frames=100, step=0.04)
frames = []
for f in syn.render_sequence(scene, poses, K=K, depth=True):
    frames.append((
        jax.device_put(np.clip(f["image"], 0, 255).astype(np.uint8)),
        np.clip(f["depth"] * 1000.0, 0, 65535).astype(np.uint16),
        f["timestamp"],
    ))
system = System(cfg)
for im, dm, ts in frames[:8]:
    out = system.track_rgbd(im, dm, ts)
    _ = out.state
for im, dm, ts in frames[8:14]:
    system.track_rgbd(im, dm, ts)
system.tracker._flush_all()
trk = system.tracker

acc = dict(flush=0.0, asarray=0.0, queue=0.0, futwait=0.0, samp=0.0,
           meta=0.0, step=0.0, pull=0.0, stagea=0.0, n=0)

orig_dispatch = trk._dispatch_rgbd_upload


def patched_dispatch(fid, ts, img, depth_map):
    t0 = time.perf_counter()
    if len(trk._stageA) >= trk.STAGE_A_LAG:
        fid0, ts0, feats0, dm0, fut0 = trk._stageA.popleft()
        xy = fut0.result(); t1 = time.perf_counter()
        samples = trk._sample_depth_host(dm0, xy); t2 = time.perf_counter()
        meta0 = jnp.asarray(np.asarray(
            [fid0, ts0, fid0 - trk.last_reloc_frame_id], np.float32))
        t3 = time.perf_counter()
        trk.map, trk.ds, out0, feats = T._step_and_extract_rgbd(
            trk.map, trk.ds, feats0, jnp.asarray(samples), meta0, img, trk.cfg)
        t4 = time.perf_counter()
        trk.n_pts_dev = trk.ds.n_pts
        trk._pending.append((fid0, ts0, out0))
        trk._pull_async(fid0, out0)
        t5 = time.perf_counter()
        acc["futwait"] += t1 - t0; acc["samp"] += t2 - t1
        acc["meta"] += t3 - t2; acc["step"] += t4 - t3; acc["pull"] += t5 - t4
        t0 = t5
    else:
        feats = T._extract_stage(img, trk.cfg)
    fut = trk._io_pool.submit(np.asarray, feats.xy)
    trk._stageA.append((fid, ts, feats, depth_map, fut))
    acc["stagea"] += time.perf_counter() - t0


trk._dispatch_rgbd_upload = patched_dispatch

orig_arrays = trk.track_rgbd_arrays


def patched_arrays(frame_id, ts, image, depth_map):
    t0 = time.perf_counter()
    trk._flush_ready(); t1 = time.perf_counter()
    assert trk._fused_ok()
    img = jnp.asarray(image); t2 = time.perf_counter()
    trk._upQ.append((trk._dispatch_rgbd_upload, (frame_id, ts, img, depth_map)))
    trk._drain_upload(n_keep=1)
    t3 = time.perf_counter()
    acc["flush"] += t1 - t0; acc["asarray"] += t2 - t1
    acc["queue"] += t3 - t2; acc["n"] += 1
    return T.LazyTrackOutput(trk, frame_id)


trk.track_rgbd_arrays = patched_arrays

t0 = time.perf_counter()
for im, dm, ts in frames[14:]:
    system.track_rgbd(im, dm, ts)
trk._flush_all()
tot = time.perf_counter() - t0
n = acc.pop("n")
print({k: round(v / n * 1e3, 3) for k, v in acc.items()},
      f"total={tot/n*1e3:.2f}ms over {n} frames")
