"""Micro-costs of the map-table primitives at bench shapes (TPU)."""
import sys
import time

sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp

KMAX, N, PMAX = 128, 1000, 32768
r = np.random.default_rng(0)
kf_obs = jnp.asarray(
    np.where(r.random((KMAX, N)) < 0.7,
             r.integers(0, PMAX, (KMAX, N)), -1).astype(np.int32))
kf_valid = jnp.asarray(r.random(KMAX) < 0.6)
feat_valid = jnp.asarray(r.random((KMAX, N)) < 0.95)
pt_valid = jnp.asarray(r.random(PMAX) < 0.5)
oct_ = jnp.asarray(r.integers(0, 8, (KMAX, N)).astype(np.int32))


def chain(name, fn, n=20):
    c = jnp.float32(0)
    np.asarray(fn(c))
    t0 = time.perf_counter()
    c = jnp.float32(0)
    for _ in range(n):
        c = fn(c)
    np.asarray(c)
    print(f"{name:38s} {(time.perf_counter()-t0)/n*1e3:8.3f} ms", flush=True)


def f_counts(c):
    flat = kf_obs.reshape(-1) + jnp.int32(c * 0)
    ok = (flat >= 0) & kf_valid.repeat(N)
    out = jnp.zeros(PMAX, jnp.int32).at[jnp.clip(flat, 0, PMAX - 1)].add(
        jnp.where(ok, 1, 0))
    return out[0].astype(jnp.float32) * 0 + c + 1


def f_counts_matmul(c):
    # incidence-matmul formulation: chunked one-hot over points,
    # ones-vector contraction over the KF axis
    flat = kf_obs + jnp.int32(c * 0)
    ok = (flat >= 0) & kf_valid[:, None]
    CH = 8192
    outs = []
    for lo in range(0, PMAX, CH):
        rel = flat - lo
        inc = (rel[:, :, None] == jnp.arange(CH)[None, None, :])
        contrib = jnp.sum(inc & ok[:, :, None], axis=(0, 1))
        outs.append(contrib)
    out = jnp.concatenate(outs)
    return out[0].astype(jnp.float32) * 0 + c + 1


def f_hist8(c):
    flat = kf_obs.reshape(-1) + jnp.int32(c * 0)
    ok = (flat >= 0) & kf_valid.repeat(N) & feat_valid.reshape(-1)
    out = jnp.zeros((PMAX, 8), jnp.int32).at[
        jnp.clip(flat, 0, PMAX - 1), oct_.reshape(-1)].add(
        jnp.where(ok, 1, 0))
    return out[0, 0].astype(jnp.float32) * 0 + c + 1


def f_inc_scatter(c):
    rows = jnp.repeat(jnp.arange(KMAX, dtype=jnp.int32), N)
    fp = jnp.clip(kf_obs.reshape(-1), 0, PMAX - 1) + jnp.int32(c * 0)
    ok = (kf_obs.reshape(-1) >= 0) & kf_valid.repeat(N)
    inc = jnp.zeros((KMAX, PMAX), jnp.bfloat16).at[rows, fp].max(
        jnp.where(ok, 1.0, 0.0).astype(jnp.bfloat16))
    W = jnp.dot(inc, inc.T, preferred_element_type=jnp.float32)
    return W[0, 0] * 0 + c + 1


def f_covis_row(c):
    obs_k = kf_obs[3] + jnp.int32(c * 0)
    in_k = jnp.zeros(PMAX, bool).at[jnp.clip(obs_k, 0, PMAX - 1)].set(
        obs_k >= 0)
    in_k = in_k & pt_valid
    shared = in_k[jnp.clip(kf_obs, 0, PMAX - 1)] & (kf_obs >= 0)
    w = jnp.sum(shared, axis=1).astype(jnp.int32)
    return w[0].astype(jnp.float32) * 0 + c + 1


def f_gather_full(c):
    rep = jnp.arange(PMAX, dtype=jnp.int32) + jnp.int32(c * 0)
    out = jnp.where(kf_obs >= 0, rep[jnp.clip(kf_obs, 0, PMAX - 1)], -1)
    return out[0, 0].astype(jnp.float32) * 0 + c + 1


chain("point_observation_counts (scatter)", jax.jit(f_counts))
chain("counts via chunked one-hot reduce", jax.jit(f_counts_matmul))
chain("octave histogram [PMAX,8] scatter", jax.jit(f_hist8))
chain("incidence scatter + W matmul", jax.jit(f_inc_scatter))
chain("covisibility_weights one row", jax.jit(f_covis_row))
chain("full-table gather (rep apply)", jax.jit(f_gather_full))
