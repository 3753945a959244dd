"""Local-BA LM iteration cost breakdown on the live device.

Builds a synthetic cam-major BAProblem at the bench window shape
(NC=32 cams x NP=2048 pts x NC*N obs) and times the pieces of one LM
iteration separately: assemble (residuals+Jacobians), the one-hot
block-assembly einsum, the Schur reduction + dense solve, one full
solve_step, and the production lba_iterate at 1/5 iterations.

Measurement pattern per tools/profiling/README.md: value-chained jit
calls with one pull at the end.

Usage: python tools/profiling/_prof_lba.py [N_per]
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2_comment_tpu.ops import geometry as geo, optim

NC, NP = 32, 2048
N_PER = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
O = NC * N_PER
K = (500.0, 500.0, 320.0, 240.0)
BF = 50.0
inv_s2 = jnp.asarray([1.0 / (1.2 ** (2 * l)) for l in range(8)])

r = np.random.default_rng(0)
pts = r.uniform(-6, 6, (NP, 3)).astype(np.float32) + [0, 0, 10]
cam_t = np.linspace(0, 2, NC).astype(np.float32)
cam_T = np.tile(np.eye(4, dtype=np.float32), (NC, 1, 1))
cam_T[:, 0, 3] = -cam_t
obs_pt = r.integers(0, NP, (NC, N_PER)).astype(np.int32)
uvs = []
for c in range(NC):
    X = geo.transform_points(jnp.asarray(cam_T[c]), jnp.asarray(pts[obs_pt[c]]))
    uvs.append(np.asarray(geo.project_stereo(K, BF, X)))
uvr = np.stack(uvs).reshape(O, 3) + r.normal(0, 0.4, (O, 3)).astype(np.float32)

prob = optim.BAProblem(
    cam_T=jnp.asarray(cam_T),
    cam_fixed=jnp.asarray(np.arange(NC) >= NC // 2),
    cam_valid=jnp.ones(NC, bool),
    pts=jnp.asarray(pts),
    pt_valid=jnp.ones(NP, bool),
    obs_cam=jnp.repeat(jnp.arange(NC, dtype=jnp.int32), N_PER),
    obs_pt=jnp.asarray(obs_pt.reshape(-1)),
    obs_uvr=jnp.asarray(uvr.astype(np.float32)),
    obs_oct=jnp.asarray(r.integers(0, 4, O).astype(np.int32)),
    obs_stereo=jnp.asarray(r.random(O) < 0.7),
    obs_valid=jnp.ones(O, bool),
)

carry0 = optim.lba_init(prob, inv_s2, K, BF)
print("cost0:", float(carry0[3]), "n_in0:", int(carry0[4]), flush=True)


def chain(name, fn, n=20):
    c = jnp.float32(0)
    np.asarray(fn(c))  # compile
    t0 = time.perf_counter()
    c = jnp.float32(0)
    for _ in range(n):
        c = fn(c)
    np.asarray(c)
    print(f"{name:30s} {(time.perf_counter()-t0)/n*1e3:8.3f} ms", flush=True)


def perturb(c):
    return (carry0[0] + 0, carry0[1] + c * 0, carry0[2], carry0[3],
            carry0[4], carry0[5])


# full production path
for ni in (1, 5, 10):
    def f_it(c, ni=ni):
        out = optim.lba_iterate(prob, inv_s2, perturb(c), K, BF, ni,
                                robust=True)
        return out[3] * 0 + c + 1
    chain(f"lba_iterate n={ni}", jax.jit(f_it))


# pieces (re-create the closures at the same shapes)
lm_step, cost_of, _ = optim._lba_core(prob, inv_s2, K, BF, cam_major=True)


def f_cost(c):
    cost, n_in = cost_of(carry0[0], carry0[1] + c * 0, prob.obs_valid, True)
    return cost * 0 + c + 1


def f_step(c):
    out = lm_step((carry0[0], carry0[1] + c * 0, carry0[2], carry0[3],
                   carry0[4], prob.obs_valid), True)
    return out[3] * 0 + c + 1


chain("cost_of (residual pass)", jax.jit(f_cost))
chain("lm_step (assemble+solve+eval)", jax.jit(f_step))

# isolate: assemble-equivalent (jacobians) and the one-hot einsum and schur
batched_jac = jax.vmap(optim._edge_jacobians, in_axes=(0, 0, 0, None, None))


def f_jac(c):
    T_o = carry0[0][prob.obs_cam]
    X_o = (carry0[1] + c * 0)[prob.obs_pt]
    r_, Jc, Jp, depth = batched_jac(T_o, X_o, prob.obs_uvr, K, BF)
    return jnp.sum(r_) * 0 + c + 1


chain("jacobian pass only", jax.jit(f_jac))

pl_ = prob.obs_pt.reshape(NC, N_PER)
onehot = (pl_[:, :, None] == jnp.arange(NP)[None, None, :]).astype(jnp.bfloat16)
packed = jnp.asarray(r.normal(0, 1, (NC, N_PER, 30)).astype(np.float32))


def f_onehot(c):
    out = jnp.einsum("cnp,cnk->cpk", onehot, packed + c * 0,
                     preferred_element_type=jnp.float32)
    return jnp.sum(out[0, 0]) * 0 + c + 1


chain("one-hot einsum [c,n,p]x[c,n,30]", jax.jit(f_onehot))

# schur: from a fixed assembled system
Hcc = jnp.asarray(r.normal(0, 1, (NC, 6, 6)).astype(np.float32))
Hcc = Hcc @ Hcc.transpose(0, 2, 1) + 10 * jnp.eye(6)
bc = jnp.asarray(r.normal(0, 1, (NC, 6)).astype(np.float32))
Hpp = jnp.asarray(r.normal(0, 1, (NP, 3, 3)).astype(np.float32))
Hpp = Hpp @ Hpp.transpose(0, 2, 1) + 10 * jnp.eye(3)
bp = jnp.asarray(r.normal(0, 1, (NP, 3)).astype(np.float32))
E = jnp.asarray(r.normal(0, 0.1, (NC, NP, 6, 3)).astype(np.float32))


def f_schur(c):
    Hpp_inv = optim._inv33(Hpp + c * 0)
    EH = jnp.einsum("cpij,pjk->cpik", E, Hpp_inv)
    EH_f = EH.transpose(0, 2, 1, 3).reshape(NC * 6, NP * 3)
    E_f = E.transpose(0, 2, 1, 3).reshape(NC * 6, NP * 3)
    ci = jnp.arange(NC)
    Hcc_embed = jnp.zeros((NC * 6, NC * 6)).at[
        (ci[:, None, None] * 6 + jnp.arange(6)[None, :, None]),
        (ci[:, None, None] * 6 + jnp.arange(6)[None, None, :]),
    ].set(Hcc)
    S_mat = Hcc_embed - EH_f @ E_f.T
    rhs = bc.reshape(-1) - EH_f @ bp.reshape(-1)
    dc = jnp.linalg.solve(S_mat + 1e-9 * jnp.eye(NC * 6), rhs)
    Etdc = jnp.einsum("cpij,ci->pj", E, dc.reshape(NC, 6))
    dp = jnp.einsum("pij,pj->pi", optim._inv33(Hpp), bp - Etdc)
    return jnp.sum(dp) * 0 + c + 1


chain("schur reduce + solve + backsub", jax.jit(f_schur))


def f_solve_only(c):
    S = jnp.asarray(np.eye(NC * 6, dtype=np.float32)) * (10 + c * 0)
    dc = jnp.linalg.solve(S, bc.reshape(-1))
    return jnp.sum(dc) * 0 + c + 1


chain("linalg.solve 192x192 alone", jax.jit(f_solve_only))
