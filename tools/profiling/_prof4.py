import time, functools
import numpy as np
import jax, jax.numpy as jnp
from orb_slam2_comment_tpu.models.system import System
from orb_slam2_comment_tpu.models import tracking as T
from orb_slam2_comment_tpu.ops import orb
from orb_slam2_comment_tpu.utils import synthetic as syn
from orb_slam2_comment_tpu.utils.config import SlamConfig

K = syn.DEFAULT_K
cfg = SlamConfig(sensor="rgbd", fx=K[0], fy=K[1], cx=K[2], cy=K[3],
    bf=K[0]*syn.DEFAULT_BASELINE, n_features=1000, n_levels=8,
    max_keyframes=128, max_points=32768, match_th_scale=1.5, depth_map_factor=1000.0)
scene = syn.make_scene(n_points=1600, seed=0, extent=(6.0,4.0,6.0), z_near=1.0)
poses = syn.make_trajectory("jitter", n_frames=14, step=0.04)
frames = []
for f in syn.render_sequence(scene, poses, K=K, depth=True):
    f["image"] = np.clip(f["image"],0,255).astype(np.uint8)
    f["depth"] = np.clip(f["depth"]*1000.0,0,65535).astype(np.uint16)
    frames.append(f)
system = System(cfg)
for f in frames[:12]:
    system.track_rgbd(f["image"], f["depth"], f["timestamp"])
system.tracker._flush_all()
trk = system.tracker
m, ds = trk.map, trk.ds
img = jnp.asarray(frames[12]["image"])
feats = T._extract_stage(img, cfg)
xy = np.asarray(feats.xy)
samples = jnp.asarray(trk._sample_depth_host(frames[12]["depth"], xy))
meta = jnp.asarray(np.asarray([12, 0.6, 100], np.float32))

def chain(name, fn, n=25):
    c = jnp.float32(0); np.asarray(fn(c)); 
    t0=time.perf_counter()
    c = jnp.float32(0)
    for _ in range(n): c = fn(c)
    np.asarray(c)
    print(f"{name:46s} {(time.perf_counter()-t0)/n*1e3:8.2f} ms")

# extract alone (new MXU path)
ex = jax.jit(functools.partial(orb._extract_impl, cfg=cfg.orb, shape=(480,640)))
chain("extract (MXU path)", lambda c: ex(img.astype(jnp.float32) + c)[0].response.sum()*0 + c + 1)

# track stage alone (no donation: copy m/ds once outside)
ts_j = jax.jit(lambda m_, ds_, f_, s_, mt_, c: (
    T._track_stage_rgbd_core(m_, ds_, f_, s_, mt_, cfg)[2][T.S_N_INL] * 0 + c + 1
), static_argnames=())
chain("track stage B", lambda c: ts_j(m, ds, feats, samples, meta, c))

# full fused program equivalent
fu = jax.jit(lambda m_, ds_, f_, s_, mt_, im_, c: (
    T._track_stage_rgbd_core(m_, ds_, f_, s_, mt_, cfg)[2][T.S_N_INL] * 0
    + orb._extract_impl(im_.astype(jnp.float32), cfg.orb, (480,640))[0].response.sum() * 0
    + c + 1
))
chain("fused B+extract", lambda c: fu(m, ds, feats, samples, meta, img, c))
