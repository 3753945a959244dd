"""LM kernel on real TPU: correctness + latency vs the XLA path."""
import time
import numpy as np
import jax, jax.numpy as jnp
from orb_slam2_comment_tpu.ops import geometry as geo, optim
from orb_slam2_comment_tpu.ops.lm_pallas import pose_optimize_pallas

K = (500.0, 500.0, 320.0, 240.0)
BF = 50.0
inv_s2 = jnp.asarray([1.0 / (1.2 ** (2 * l)) for l in range(8)])
r = np.random.default_rng(3)
N = 1024
Xw = jnp.asarray(r.uniform(-3, 3, (N, 3)).astype(np.float32) + [0, 0, 8])
T_gt = geo.se3_exp(jnp.asarray([0.1, -0.05, 0.08, 0.02, -0.03, 0.01], jnp.float32))
uvr = np.array(geo.project_stereo(K, BF, geo.transform_points(T_gt, Xw)))
uvr += r.normal(0, 0.4, uvr.shape)
obs = jnp.asarray(uvr.astype(np.float32))
octave = jnp.asarray(r.integers(0, 4, N).astype(np.int32))
stereo = jnp.asarray(r.random(N) < 0.7)
valid = jnp.ones(N, bool)
T0 = geo.se3_exp(jnp.asarray([0.08, -0.04, 0.06, 0.015, -0.02, 0.006], jnp.float32))

import sys
print("compiling XLA path...", flush=True)
ref = optim.pose_optimize(T0, Xw, obs, octave, stereo, valid, inv_s2, K, BF)
print("XLA done, n_inl:", int(ref.n_inliers), flush=True)
print("compiling PALLAS path...", flush=True)
got = pose_optimize_pallas(T0, Xw, obs, octave, stereo, valid, inv_s2, K, BF)
d = np.asarray(geo.se3_log(got.Tcw @ geo.inv_T(ref.Tcw)))
print("pose delta vs XLA:", np.linalg.norm(d),
      "inliers:", int(got.n_inliers), "vs", int(ref.n_inliers))
assert np.linalg.norm(d) < 5e-3

def chain(name, fn, n=30):
    c = jnp.float32(0)
    np.asarray(fn(c))
    t0 = time.perf_counter()
    c = jnp.float32(0)
    for _ in range(n):
        c = fn(c)
    np.asarray(c)
    print(f"{name:34s} {(time.perf_counter()-t0)/n*1e3:8.3f} ms")

xla_fn = jax.jit(lambda c: optim.pose_optimize(
    T0, Xw + c * 0, obs, octave, stereo, valid, inv_s2, K, BF
).n_inliers.astype(jnp.float32) * 0 + c + 1)
pls_fn = jax.jit(lambda c: pose_optimize_pallas(
    T0, Xw + c * 0, obs, octave, stereo, valid, inv_s2, K, BF
).n_inliers.astype(jnp.float32) * 0 + c + 1)
chain("pose_optimize XLA 4x10", xla_fn)
chain("pose_optimize PALLAS 4x10", pls_fn)
