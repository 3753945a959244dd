"""Track-stage sub-part timing on the real TPU."""
import time
import numpy as np
import jax, jax.numpy as jnp
from orb_slam2_comment_tpu.models.system import System
from orb_slam2_comment_tpu.models import tracking as T
from orb_slam2_comment_tpu.models import map_state as ms
from orb_slam2_comment_tpu.ops import optim, geometry as geo
from orb_slam2_comment_tpu.utils import synthetic as syn
from orb_slam2_comment_tpu.utils.config import SlamConfig

K = syn.DEFAULT_K
cfg = SlamConfig(sensor="rgbd", fx=K[0], fy=K[1], cx=K[2], cy=K[3],
    bf=K[0]*syn.DEFAULT_BASELINE, n_features=1000, n_levels=8,
    max_keyframes=128, max_points=32768, match_th_scale=1.5,
    depth_map_factor=1000.0)
scene = syn.make_scene(n_points=1600, seed=0, extent=(6.0,4.0,6.0), z_near=1.0)
poses = syn.make_trajectory("jitter", n_frames=14, step=0.04)
frames = []
for f in syn.render_sequence(scene, poses, K=K, depth=True):
    f["image"] = np.clip(f["image"],0,255).astype(np.uint8)
    f["depth"] = np.clip(f["depth"]*1000.0,0,65535).astype(np.uint16)
    frames.append(f)
system = System(cfg)
for f in frames[:12]:
    out = system.track_rgbd(f["image"], f["depth"], f["timestamp"])
    _ = out.state
system.tracker._flush_all()
trk = system.tracker
m = trk.map
from orb_slam2_comment_tpu.models.frame import build_frame_rgbd
fr = build_frame_rgbd(12, 0.6, frames[12]["image"], frames[12]["depth"], cfg)
feats, uright, depth = fr.feats, fr.uright, fr.depth
T_last = jnp.asarray(trk.last_Tcw, jnp.float32)
last_assoc = jnp.asarray(trk.last_frame.assoc, jnp.int32)


def chain(name, fn, n=25):
    c = jnp.float32(0)
    np.asarray(fn(c))
    t0 = time.perf_counter()
    c = jnp.float32(0)
    for _ in range(n):
        c = fn(c)
    np.asarray(c)
    print(f"{name:44s} {(time.perf_counter()-t0)/n*1e3:8.3f} ms")


inv_s2 = T._inv_sigma2(cfg)

@jax.jit
def match_fn(c):
    a, nm, vis = T._match_against_points(
        m, last_assoc, T_last, feats, uright, jnp.asarray(7.0) + c * 0, cfg,
        use_frustum_band=False)
    return nm.astype(jnp.float32) * 0 + c + 1

chain("match vs last assoc (motion branch)", match_fn)

a0, _, _ = T._match_against_points(
    m, last_assoc, T_last, feats, uright, jnp.asarray(7.0), cfg,
    use_frustum_band=False)

@jax.jit
def popt_fn(c):
    pid = jnp.clip(a0, 0, cfg.max_points - 1)
    obs = jnp.concatenate([feats.xy, uright[:, None]], -1)
    out = optim.pose_optimize(
        T_last, m.pt_pos[pid] + c * 0, obs, feats.octave, uright >= 0,
        (a0 >= 0) & feats.valid, inv_s2, cfg.K, cfg.bf)
    return out.n_inliers.astype(jnp.float32) * 0 + c + 1

chain("pose_optimize (4x10)", popt_fn)

@jax.jit
def popt1_fn(c):
    pid = jnp.clip(a0, 0, cfg.max_points - 1)
    obs = jnp.concatenate([feats.xy, uright[:, None]], -1)
    out = optim.pose_optimize(
        T_last, m.pt_pos[pid] + c * 0, obs, feats.octave, uright >= 0,
        (a0 >= 0) & feats.valid, inv_s2, cfg.K, cfg.bf, rounds=1, iters=10)
    return out.n_inliers.astype(jnp.float32) * 0 + c + 1

chain("pose_optimize (1x10)", popt1_fn)

@jax.jit
def sel_fn(c):
    kf_ids, pt_ids = T._select_local_map(m, jnp.clip(a0 + c.astype(jnp.int32) * 0, -1, None))
    return pt_ids[0].astype(jnp.float32) * 0 + c + 1

chain("select_local_map", sel_fn)

kf_ids, pt_ids = T._select_local_map(m, a0)

@jax.jit
def match2_fn(c):
    a, nm, vis = T._match_against_points(
        m, pt_ids, T_last, feats, uright, jnp.asarray(3.0) + c * 0, cfg)
    return nm.astype(jnp.float32) * 0 + c + 1

chain("match vs local map", match2_fn)

@jax.jit
def counters_fn(c):
    m2 = T._update_point_counters(m, pt_ids, jnp.ones(pt_ids.shape[0], bool), a0)
    return m2.pt_visible[0].astype(jnp.float32) * 0 + c + 1

chain("update point counters", counters_fn)

@jax.jit
def full_fn(c):
    m2, Tcw, assoc, stats = T._track_core(
        m, feats, uright, depth, T_last, T_last, jnp.asarray(True),
        last_assoc, jnp.asarray(trk.ref_kf, jnp.int32),
        jnp.asarray(12, jnp.int32), jnp.asarray(8, jnp.int32),
        jnp.asarray(trk.n_kfs, jnp.int32), cfg,
        obs_counts=ms.point_observation_counts(m))
    return stats[T.S_N_INL] * 0 + c + 1

chain("FULL _track_core", full_fn)
