"""pose_optimize latency experiments on the real TPU: loop overhead vs
compute. Variants: stock 4x10, unrolled inner loop, 1x10."""
import time
import numpy as np
import jax, jax.numpy as jnp
from orb_slam2_comment_tpu.ops import optim, geometry as geo

N = 1024
r = np.random.default_rng(0)
Xw = jnp.asarray(r.uniform(-3, 3, (N, 3)).astype(np.float32) + [0, 0, 8])
T_gt = np.asarray(geo.se3_exp(jnp.asarray([0.05, -0.02, 0.03, 0.01, -0.02, 0.005], jnp.float32)))
Xc = np.asarray(geo.transform_points(jnp.asarray(T_gt), Xw))
K = (500.0, 500.0, 320.0, 240.0)
BF = 50.0
uvr = np.asarray(geo.project_stereo(K, BF, jnp.asarray(Xc)))
uvr += r.normal(0, 0.5, uvr.shape)
obs = jnp.asarray(uvr.astype(np.float32))
octave = jnp.zeros(N, jnp.int32)
stereo = jnp.ones(N, bool)
valid = jnp.ones(N, bool)
inv_s2 = jnp.asarray([1.0 / (1.2 ** (2 * l)) for l in range(8)])
T0 = jnp.eye(4)


def chain(name, fn, n=30):
    c = jnp.float32(0)
    np.asarray(fn(c))
    t0 = time.perf_counter()
    c = jnp.float32(0)
    for _ in range(n):
        c = fn(c)
    np.asarray(c)
    print(f"{name:40s} {(time.perf_counter()-t0)/n*1e3:8.3f} ms")


def run(name, rounds, iters, unroll=None):
    import orb_slam2_comment_tpu.ops.optim as O
    orig = jax.lax.fori_loop
    if unroll:
        def fl(lo, hi, body, init):
            return orig(lo, hi, body, init, unroll=True)
        jax.lax.fori_loop = fl
    try:
        f = jax.jit(lambda c: O.pose_optimize.__wrapped__(
            T0, Xw + c * 0, obs, octave, stereo, valid, inv_s2, K, BF,
            rounds=rounds, iters=iters,
        ).n_inliers.astype(jnp.float32) * 0 + c + 1)
        chain(name, f)
    finally:
        jax.lax.fori_loop = orig


run("pose_opt 4x10 (stock)", 4, 10)
run("pose_opt 4x10 unrolled", 4, 10, unroll=True)
run("pose_opt 1x10", 1, 10)
run("pose_opt 4x3", 4, 3)
