"""Break down the descriptor tail + host loop overhead on the TPU."""
import time
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
n_lvls = oc.n_levels

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
    print(f"{name:44s} {(time.perf_counter()-t0)/n*1e3:8.3f} ms")


# reproduce the tail inputs once
feats, pyramid = orb._extract_impl(img, oc, shape)
import functools
h, w = shape
pd = orb._PATCH_PAD
padded_np = np.zeros((n_lvls, h + 2 * pd, w + 2 * pd), np.float32)
for l in range(n_lvls):
    padded_np[l, pd:pd + sizes[l][0], pd:pd + sizes[l][1]] = np.asarray(pyramid[l])
padded = jnp.asarray(padded_np)
oct_np = np.concatenate([np.full(budgets[l], l, np.int32) for l in range(n_lvls)])
oct_dev = jnp.asarray(oct_np)
n_slots = oct_np.shape[0]
r = np.random.default_rng(0)
ys0 = jnp.asarray(r.integers(0, h - orb._PATCH_W, n_slots).astype(np.int32))
xs0 = jnp.asarray(r.integers(0, w - orb._PATCH_W, n_slots).astype(np.int32))

W_ = orb._PATCH_W


@jax.jit
def patches_fn(c):
    def one(l, y, x):
        return jax.lax.dynamic_slice(padded, (l, y, x), (1, W_, W_))[0]
    p = jax.vmap(one)(oct_dev, ys0 + c.astype(jnp.int32), xs0)
    return jnp.sum(p[:, 0, 0]) * 0 + c + 1

chain("patch gather (vmap dynamic_slice)", patches_fn)

def one(l, y, x):
    return jax.lax.dynamic_slice(padded, (l, y, x), (1, W_, W_))[0]
patches = jax.vmap(one)(oct_dev, ys0, xs0)
patches = jax.device_put(np.asarray(patches))
S = orb._brief_matrix()


@jax.jit
def mm_fn(c):
    out = jnp.dot(
        (patches + c).reshape(n_slots, W_ * W_).astype(jnp.bfloat16), S,
        preferred_element_type=jnp.float32)
    return out[0, 0] * 0 + c + 1

chain("BRIEF matmul (f32 out)", mm_fn)


@jax.jit
def mm_bf_fn(c):
    out = jnp.dot(
        (patches + c).reshape(n_slots, W_ * W_).astype(jnp.bfloat16), S,
        preferred_element_type=jnp.bfloat16)
    return out[0, 0].astype(jnp.float32) * 0 + c + 1

chain("BRIEF matmul (bf16 out)", mm_bf_fn)

out_big = jnp.dot(patches.reshape(n_slots, W_ * W_).astype(jnp.bfloat16), S,
                  preferred_element_type=jnp.float32)
out_big = jax.device_put(np.asarray(out_big))
qb = orb._BRIEF_Q
bucket = jnp.asarray(r.integers(0, qb, n_slots).astype(np.int32))


@jax.jit
def sel_fn(c):
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (n_slots, qb), 1)
              == bucket[:, None]).astype(jnp.float32)
    sel = jnp.einsum("nqb,nq->nb",
                     (out_big + c)[:, :qb * 256].reshape(n_slots, qb, 256),
                     onehot)
    d = orb.pack_bits(sel > 0)
    return d[0, 0].astype(jnp.float32) * 0 + c + 1

chain("bucket select einsum + pack", sel_fn)

# whole tail fused as in _extract_impl
@jax.jit
def tail_fn(c):
    def one(l, y, x):
        return jax.lax.dynamic_slice(padded, (l, y, x), (1, W_, W_))[0]
    p = jax.vmap(one)(oct_dev, ys0 + c.astype(jnp.int32), xs0)
    out = jnp.dot(p.reshape(n_slots, W_ * W_).astype(jnp.bfloat16), S,
                  preferred_element_type=jnp.float32)
    ang = jnp.arctan2(out[:, -1], out[:, -2])
    bk = jnp.mod(jnp.round(ang / (2.0 * jnp.pi / qb)).astype(jnp.int32), qb)
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (n_slots, qb), 1)
              == bk[:, None]).astype(jnp.float32)
    sel = jnp.einsum("nqb,nq->nb", out[:, :qb * 256].reshape(n_slots, qb, 256), onehot)
    d = orb.pack_bits(sel > 0)
    return d[0, 0].astype(jnp.float32) * 0 + c + 1

chain("tail fused (gather+mm+select+pack)", tail_fn)
