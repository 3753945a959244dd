"""Pallas LBA assemble kernel: hardware parity vs XLA path + latency.

Usage: python tools/profiling/_prof_lba_pallas.py [N_per]
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2_comment_tpu.ops import geometry as geo, optim
from orb_slam2_comment_tpu.ops import lba_pallas

NC, NP = 32, 2048
N_PER = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
O = NC * N_PER
K = (500.0, 500.0, 320.0, 240.0)
BF = 50.0
F = 16
inv_s2 = jnp.asarray([1.0 / (1.2 ** (2 * l)) for l in range(8)])

r = np.random.default_rng(0)
pts = r.uniform(-6, 6, (NP, 3)).astype(np.float32) + [0, 0, 10]
cam_T = np.tile(np.eye(4, dtype=np.float32), (NC, 1, 1))
cam_T[:, 0, 3] = -np.linspace(0, 2, NC).astype(np.float32)
obs_pt = r.integers(0, NP, (NC, N_PER)).astype(np.int32)
uvs = []
for c in range(NC):
    X = geo.transform_points(jnp.asarray(cam_T[c]), jnp.asarray(pts[obs_pt[c]]))
    uvs.append(np.asarray(geo.project_stereo(K, BF, X)))
uvr = np.stack(uvs).reshape(O, 3) + r.normal(0, 0.4, (O, 3)).astype(np.float32)

cam_fixed = np.zeros(NC, bool)
cam_fixed[F:] = True
cam_fixed[3] = True  # one dynamically-fixed slot inside the free prefix
prob = optim.BAProblem(
    cam_T=jnp.asarray(cam_T),
    cam_fixed=jnp.asarray(cam_fixed),
    cam_valid=jnp.ones(NC, bool),
    pts=jnp.asarray(pts),
    pt_valid=jnp.ones(NP, bool),
    obs_cam=jnp.repeat(jnp.arange(NC, dtype=jnp.int32), N_PER),
    obs_pt=jnp.asarray(obs_pt.reshape(-1)),
    obs_uvr=jnp.asarray(uvr.astype(np.float32)),
    obs_oct=jnp.asarray(r.integers(0, 4, O).astype(np.int32)),
    obs_stereo=jnp.asarray(r.random(O) < 0.7),
    obs_valid=jnp.asarray(r.random(O) < 0.95),
)

# ---- parity: build XLA system and Pallas system, compare ----------------
import orb_slam2_comment_tpu.ops.optim as om
om.USE_PALLAS_LBA = False
bs_x, _, _ = optim._lba_core(prob, inv_s2, K, BF, cam_major=True, n_free=F)
om.USE_PALLAS_LBA = True
bs_p, _, _ = optim._lba_core(prob, inv_s2, K, BF, cam_major=True, n_free=F)

for robust in (True, False):
    sx = jax.jit(lambda: bs_x(prob.cam_T, prob.pts, prob.obs_valid, robust))()
    sp = jax.jit(lambda: bs_p(prob.cam_T, prob.pts, prob.obs_valid, robust))()
    for fld in sx._fields:
        a = np.asarray(getattr(sx, fld), np.float64)
        b = np.asarray(getattr(sp, fld), np.float64)
        scale = max(np.abs(a).max(), 1e-6)
        err = np.abs(a - b).max() / scale
        print(f"robust={robust} {fld:5s} max_rel={err:.3e} "
              f"(|a|max={np.abs(a).max():.3e})", flush=True)
        assert err < 1e-3, (fld, err)
print("PARITY OK", flush=True)


def chain(name, fn, n=20):
    c = jnp.float32(0)
    np.asarray(fn(c))
    t0 = time.perf_counter()
    c = jnp.float32(0)
    for _ in range(n):
        c = fn(c)
    np.asarray(c)
    print(f"{name:34s} {(time.perf_counter()-t0)/n*1e3:8.3f} ms", flush=True)


def f_x(c):
    s = bs_x(prob.cam_T, prob.pts + c * 0, prob.obs_valid, True)
    return s.cost * 0 + c + 1


def f_p(c):
    s = bs_p(prob.cam_T, prob.pts + c * 0, prob.obs_valid, True)
    return s.cost * 0 + c + 1


chain("build_system XLA", jax.jit(f_x))
chain("build_system PALLAS", jax.jit(f_p))

# full iterate through each path
for flag, name in ((False, "iterate5 XLA"), (True, "iterate5 PALLAS")):
    om.USE_PALLAS_LBA = flag
    carry0 = optim.lba_init(prob, inv_s2, K, BF)

    def f_it(c):
        out = optim.lba_iterate(prob, inv_s2,
                                (carry0[0], carry0[1] + c * 0, carry0[2],
                                 carry0[3], carry0[4], carry0[5]),
                                K, BF, 5, robust=True, n_free=F)
        return out[3] * 0 + c + 1

    chain(name, jax.jit(f_it))
    out = jax.jit(lambda: optim.lba_iterate(
        prob, inv_s2, carry0, K, BF, 5, robust=True, n_free=F))()
    print(f"  {name}: cost {float(carry0[3]):.2f} -> {float(out[3]):.2f} "
          f"n_in {int(out[4])}", flush=True)
