"""Per-stage timing of ORB extraction on the real TPU (tunnel)."""
import time, functools
import numpy as np
import jax, jax.numpy as jnp
from orb_slam2_comment_tpu.ops import orb
from orb_slam2_comment_tpu.utils.config import SlamConfig
from orb_slam2_comment_tpu.utils import synthetic as syn

K = syn.DEFAULT_K
cfg = SlamConfig(sensor="rgbd", fx=K[0], fy=K[1], cx=K[2], cy=K[3],
    bf=K[0]*syn.DEFAULT_BASELINE, n_features=1000, n_levels=8,
    max_keyframes=128, max_points=32768, depth_map_factor=1000.0)
oc = cfg.orb
shape = (480, 640)
sizes = oc.level_sizes(*shape)
budgets = oc.level_budgets()

scene = syn.make_scene(n_points=1600, seed=0)
pose = syn.make_trajectory("jitter", n_frames=1, step=0.04)
frame = next(syn.render_sequence(scene, pose, K=K, depth=True))
img = jnp.asarray(np.clip(frame["image"], 0, 255).astype(np.float32))


def chain(name, fn, n=30):
    c = jnp.float32(0)
    np.asarray(fn(c))
    t0 = time.perf_counter()
    c = jnp.float32(0)
    for _ in range(n):
        c = fn(c)
    np.asarray(c)
    print(f"{name:40s} {(time.perf_counter()-t0)/n*1e3:8.3f} ms")


# stage 1: pyramid
@jax.jit
def pyr_fn(c):
    im = img + c
    levels = [im]
    for l in range(1, oc.n_levels):
        levels.append(orb._resize_level(levels[-1], sizes[l]))
    return sum(jnp.sum(x[::64, ::64]) for x in levels) * 0 + c + 1

chain("pyramid (8 resizes)", pyr_fn)

pyr = [img]
for l in range(1, oc.n_levels):
    pyr.append(orb._resize_level(pyr[-1], sizes[l]))
pyr = [jax.device_put(np.asarray(p)) for p in pyr]

# stage 2: fast score all levels
@jax.jit
def fast_fn(c):
    s = c
    for p in pyr:
        s = s + jnp.sum(orb.fast_score_map(p + c)[::64, ::64]) * 0
    return s + 1

chain("fast_score_map x8", fast_fn)

# stage 3: nms all levels
scores = [jax.device_put(np.asarray(orb.fast_score_map(p))) for p in pyr]

@jax.jit
def nms_fn(c):
    s = c
    for sc in scores:
        s = s + jnp.sum(orb._nms3(sc + c)[::64, ::64]) * 0
    return s + 1

chain("nms3 x8", nms_fn)

# stage 4: select_keypoints all levels
@jax.jit
def sel_fn(c):
    s = c
    for l, sc in enumerate(scores):
        xy, resp, valid = orb._select_keypoints(sc + c, budgets[l], oc.cell, oc.min_th)
        s = s + jnp.sum(xy[0]) * 0
    return s + 1

chain("select_keypoints (top_k) x8", sel_fn)

# stage 5+6: patch slice + matmul + pack (the full tail after selection)
feats0, _ = orb._extract_impl(img, oc, shape)
xy_lvl = []  # reuse: run selection once to get xy per level concat


@jax.jit
def tail_fn(c):
    # full extract minus nothing — for reference
    f, _ = orb._extract_impl(img + c, oc, shape)
    return jnp.sum(f.response) * 0 + c + 1

chain("FULL _extract_impl", tail_fn)

# isolate the patch-gather + descriptor tail by timing a jit that does
# only dense stages (score/nms/select) to subtract
@jax.jit
def dense_fn(c):
    im = img + c
    s = c
    level_img = im
    for lvl in range(oc.n_levels):
        if lvl > 0:
            level_img = orb._resize_level(level_img, sizes[lvl])
        score = orb.fast_score_map(level_img)
        score = orb._nms3(score)
        xy_l, resp, valid = orb._select_keypoints(score, budgets[lvl], oc.cell, oc.min_th)
        s = s + jnp.sum(xy_l[0]) * 0 + jnp.sum(resp[:8]) * 0
    return s + 1

chain("dense stages (pyr+fast+nms+sel)", dense_fn)
print("-> descriptor tail ~= FULL - dense")
