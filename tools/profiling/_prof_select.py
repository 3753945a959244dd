"""Bucket-selection variants for the rBRIEF descriptor tail."""
import time
import numpy as np
import jax, jax.numpy as jnp

N, Q, B = 1024, 64, 256
r = np.random.default_rng(0)
out_big = jnp.asarray(r.normal(size=(N, Q * B + 2)).astype(np.float32))
bucket = jnp.asarray(r.integers(0, Q, N).astype(np.int32))


def chain(name, fn, n=30):
    c = jnp.float32(0)
    np.asarray(fn(c))
    t0 = time.perf_counter()
    c = jnp.float32(0)
    for _ in range(n):
        c = fn(c)
    np.asarray(c)
    print(f"{name:36s} {(time.perf_counter()-t0)/n*1e3:8.3f} ms")


@jax.jit
def v_einsum(c):
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (N, Q), 1)
              == bucket[:, None]).astype(jnp.float32)
    sel = jnp.einsum("nqb,nq->nb",
                     (out_big + c)[:, :Q * B].reshape(N, Q, B), onehot)
    return sel[0, 0] * 0 + c + 1


@jax.jit
def v_wheresum(c):
    o = (out_big + c)[:, :Q * B].reshape(N, Q, B)
    mask = (jax.lax.broadcasted_iota(jnp.int32, (N, Q), 1)
            == bucket[:, None])
    sel = jnp.sum(jnp.where(mask[:, :, None], o, 0.0), axis=1)
    return sel[0, 0] * 0 + c + 1


@jax.jit
def v_take(c):
    o = (out_big + c)[:, :Q * B].reshape(N, Q, B)
    sel = jnp.take_along_axis(o, bucket[:, None, None], axis=1)[:, 0]
    return sel[0, 0] * 0 + c + 1


@jax.jit
def v_dynslice(c):
    o = (out_big + c)[:, :Q * B]
    def one(row, bk):
        return jax.lax.dynamic_slice(row, (bk * B,), (B,))
    sel = jax.vmap(one)(o, bucket)
    return sel[0, 0] * 0 + c + 1


chain("einsum onehot (current)", v_einsum)
chain("where + sum over q", v_wheresum)
chain("take_along_axis", v_take)
chain("vmap dynamic_slice", v_dynslice)
