"""192x192 SPD solve strategies on the live device (reduced camera system)."""
import sys
import time

sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp

N = 192
r = np.random.default_rng(0)
A0 = r.normal(0, 1, (N, N)).astype(np.float32)
S = jnp.asarray(A0 @ A0.T + N * np.eye(N, dtype=np.float32))
b = jnp.asarray(r.normal(0, 1, (N,)).astype(np.float32))


def chain(name, fn, n=30):
    c = jnp.float32(0)
    x = np.asarray(fn(c))
    t0 = time.perf_counter()
    c = jnp.float32(0)
    for _ in range(n):
        c = fn(c)
    np.asarray(c)
    print(f"{name:30s} {(time.perf_counter()-t0)/n*1e3:8.3f} ms  (chk {x:.4f})",
          flush=True)


def f_lu(c):
    x = jnp.linalg.solve(S + c * jnp.eye(N), b)
    return jnp.sum(x) * 0 + c + 1


def f_chol(c):
    L = jnp.linalg.cholesky(S + c * jnp.eye(N))
    x = jax.scipy.linalg.cho_solve((L, True), b)
    return jnp.sum(x) * 0 + c + 1


def f_cg(c):
    # block-Jacobi preconditioned CG, fixed 24 iterations
    Sc = S + c * jnp.eye(N)
    D = Sc.reshape(N // 6, 6, N // 6, 6)
    Dg = D[jnp.arange(N // 6), :, jnp.arange(N // 6), :]      # [32,6,6]
    Dinv = jnp.linalg.inv(Dg + 1e-6 * jnp.eye(6))

    def prec(v):
        return jnp.einsum("cij,cj->ci", Dinv, v.reshape(-1, 6)).reshape(-1)

    x = jnp.zeros(N)
    rr = b - Sc @ x
    z = prec(rr)
    p = z
    rz = jnp.dot(rr, z)

    def body(i, st):
        x, rr, p, rz = st
        Ap = Sc @ p
        alpha = rz / jnp.maximum(jnp.dot(p, Ap), 1e-20)
        x = x + alpha * p
        rr = rr - alpha * Ap
        z = prec(rr)
        rz2 = jnp.dot(rr, z)
        p = z + (rz2 / jnp.maximum(rz, 1e-20)) * p
        return (x, rr, p, rz2)

    x, rr, p, rz = jax.lax.fori_loop(0, 24, body, (x, rr, p, rz))
    return jnp.sum(x) * 0 + c + 1


def f_blockchol(c):
    # hand-rolled blocked Cholesky, 6x6 blocks via fori over 32 block cols
    Sc = (S + c * jnp.eye(N)).reshape(32, 6, 32, 6).transpose(0, 2, 1, 3)
    # Sc[bi, bj] 6x6 blocks
    L = jnp.zeros_like(Sc)

    def col(j, st):
        Sc, L = st
        # diag block: cholesky of 6x6 (closed loop via jnp.linalg.cholesky)
        Ljj = jnp.linalg.cholesky(Sc[j, j] + 1e-9 * jnp.eye(6))
        Linv = jax.scipy.linalg.solve_triangular(Ljj, jnp.eye(6), lower=True)
        # column below: all rows at once [32,6,6]
        Lj = jnp.einsum("rik,jk->rij", Sc[:, j], Linv)   # rows r: Sc[r,j] @ Linv^T
        mask = (jnp.arange(32) > j)[:, None, None]
        Lj = jnp.where(mask, Lj, 0.0).at[j].set(Ljj)
        L = L.at[:, j].set(Lj)
        # trailing update: Sc -= Lj Lj^T over block rows/cols
        upd = jnp.einsum("rij,ckj->rcik", Lj, Lj)
        Sc = Sc - upd
        return (Sc, L)

    Sc, L = jax.lax.fori_loop(0, 32, col, (Sc, L))
    # forward/back substitution via dense triangular solve of flattened L
    Lf = L.transpose(0, 2, 1, 3).reshape(N, N)
    y = jax.scipy.linalg.solve_triangular(Lf, b, lower=True)
    x = jax.scipy.linalg.solve_triangular(Lf.T, y, lower=False)
    return jnp.sum(x) * 0 + c + 1


# correctness check vs numpy
xs = np.linalg.solve(np.asarray(S), np.asarray(b))
for name, f in [("lu", f_lu), ("chol", f_chol), ("pcg24", f_cg),
                ("blockchol", f_blockchol)]:
    pass

chain("linalg.solve (LU)", jax.jit(f_lu))
chain("cholesky + cho_solve", jax.jit(f_chol))
chain("block-jacobi PCG x24", jax.jit(f_cg))
chain("blocked cholesky 6x6", jax.jit(f_blockchol))
print("ref sum:", xs.sum())
