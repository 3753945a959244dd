"""Pose-only LM as ONE Pallas TPU kernel.

`optim.pose_optimize` (the reference's Optimizer::PoseOptimization,
src/Optimizer.cc:239-451) runs 4 rounds x 10 LM iterations. As XLA ops the
40 sequential iterations cost ~8-10 small kernels each — on a TPU the
per-kernel pipeline bubbles dominate the (tiny) [N]-edge math. This kernel
keeps the WHOLE optimization on-core: edge arrays live in VMEM as [1, N]
rows, the pose is 12 scalars, each LM iteration is ~150 vector ops plus a
hand-unrolled 6x6 Cholesky — one kernel launch for all 40 iterations.

Matches optim.pose_optimize semantics exactly (same damping schedule,
Huber rounds, chi2 reclassification between rounds, accept/reject rule);
numerics agree to float tolerance (Jacobians here are closed-form, there
via jacfwd). Validated against the XLA path in tests/test_optim.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from orb_slam2_comment_tpu import constants as C
from orb_slam2_comment_tpu.ops import geometry as geo
from orb_slam2_comment_tpu.ops.optim import PoseOptResult

_EPS = 1e-12


def _chol6_solve(H, b):
    """Solve H x = b for symmetric positive-definite 6x6 given as a dict
    of scalars H[(i,j)] (i>=j) and list b; fully unrolled Cholesky."""
    L = {}
    for i in range(6):
        s = H[(i, i)]
        for k in range(i):
            s = s - L[(i, k)] * L[(i, k)]
        L[(i, i)] = jnp.sqrt(jnp.maximum(s, 1e-12))
        inv_d = 1.0 / L[(i, i)]
        for j in range(i + 1, 6):
            s = H[(j, i)]
            for k in range(i):
                s = s - L[(j, k)] * L[(i, k)]
            L[(j, i)] = s * inv_d
    y = [None] * 6
    for i in range(6):
        s = b[i]
        for k in range(i):
            s = s - L[(i, k)] * y[k]
        y[i] = s / L[(i, i)]
    x = [None] * 6
    for i in reversed(range(6)):
        s = y[i]
        for k in range(i + 1, 6):
            s = s - L[(k, i)] * x[k]
        x[i] = s / L[(i, i)]
    return x


def _se3_exp_scalars(dx):
    """geometry.se3_exp (T = [[R, J rho], [0,1]]) on 6 scalars.
    Returns (R as nested 3x3 list, t as list of 3)."""
    rho = dx[:3]
    wx, wy, wz = dx[3], dx[4], dx[5]
    th2 = wx * wx + wy * wy + wz * wz
    th = jnp.sqrt(th2 + _EPS)
    small = th2 <= _EPS
    a = jnp.where(small, 1.0 - th2 / 6.0, jnp.sin(th) / th)
    bb = jnp.where(
        small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(th)) / (th2 + _EPS)
    )
    cc = jnp.where(
        small, 1.0 / 6.0 - th2 / 120.0,
        (th - jnp.sin(th)) / (th2 * th + _EPS),
    )
    W = [[0.0 * th, -wz, wy], [wz, 0.0 * th, -wx], [-wy, wx, 0.0 * th]]

    def matmul3(A, B):
        return [
            [sum(A[i][k] * B[k][j] for k in range(3)) for j in range(3)]
            for i in range(3)
        ]

    W2 = matmul3(W, W)
    eye = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    R = [
        [eye[i][j] + a * W[i][j] + bb * W2[i][j] for j in range(3)]
        for i in range(3)
    ]
    J = [
        [eye[i][j] + bb * W[i][j] + cc * W2[i][j] for j in range(3)]
        for i in range(3)
    ]
    t = [sum(J[i][k] * rho[k] for k in range(3)) for i in range(3)]
    return R, t


def _compose(Rd, td, R, t):
    Rn = [
        [sum(Rd[i][k] * R[k][j] for k in range(3)) for j in range(3)]
        for i in range(3)
    ]
    tn = [sum(Rd[i][k] * t[k] for k in range(3)) + td[i] for i in range(3)]
    return Rn, tn


def _make_kernel(K, bf, rounds, iters, robust_rounds):
    fx, fy, cx, cy = K

    def kernel(
        xw_ref, obs_ref, invs2_ref, comp_ref, valid_ref, delta_ref,
        chi2th_ref, t0_ref, tout_ref, inl_ref,
    ):
        X = xw_ref[:]
        O = obs_ref[:]
        invs2 = invs2_ref[0:1, :]
        comp = comp_ref[0:1, :]
        valid0 = valid_ref[0:1, :]
        delta = delta_ref[0:1, :]
        chi2_th = chi2th_ref[0:1, :]
        x_r, y_r, z_r = X[0:1, :], X[1:2, :], X[2:3, :]
        u_o, v_o, ur_o = O[0:1, :], O[1:2, :], O[2:3, :]
        zero_row = jnp.zeros_like(x_r)

        def residuals(pose):
            (R00, R01, R02, R10, R11, R12, R20, R21, R22, t0, t1, t2) = pose
            xc = R00 * x_r + R01 * y_r + R02 * z_r + t0
            yc = R10 * x_r + R11 * y_r + R12 * z_r + t1
            zc = R20 * x_r + R21 * y_r + R22 * z_r + t2
            zi = 1.0 / jnp.where(jnp.abs(zc) < 1e-9, 1e-9, zc)
            up = fx * xc * zi + cx
            vp = fy * yc * zi + cy
            urp = up - bf * zi
            return (u_o - up, v_o - vp, ur_o - urp), (xc, yc, zc, zi)

        def chi2_of(r):
            ru, rv, rur = r
            return invs2 * (ru * ru + rv * rv + comp * rur * rur)

        def robust_cost(r, mask, robust: bool):
            c2 = chi2_of(r) * mask
            if not robust:
                return jnp.sum(c2)
            d2 = delta * delta
            rho = jnp.where(
                c2 <= d2 * mask,
                c2,
                2.0 * delta * jnp.sqrt(jnp.maximum(c2, _EPS)) - d2,
            )
            return jnp.sum(jnp.where(mask > 0, rho, 0.0))

        def lm_round(pose, mask, robust: bool):
            def body(it, carry):
                pose, lam, cost = carry
                r, (xc, yc, zc, zi) = residuals(pose)
                ru, rv, rur = r
                c2 = chi2_of(r) * mask
                if robust:
                    hw = jnp.minimum(
                        1.0, delta / jnp.sqrt(jnp.maximum(c2, _EPS))
                    )
                else:
                    hw = 1.0
                w = invs2 * hw * mask
                # closed-form dr/dxi (r = obs - pred, left-increment se3,
                # dXc/dxi = [I | -[Xc]_x]); derivation checked against the
                # jacfwd path in tests
                gxu = fx * zi
                gzu = -fx * xc * zi * zi
                gyv = fy * zi
                gzv = -fy * yc * zi * zi
                gzur = gzu + bf * zi * zi
                Ju = [
                    -gxu, zero_row, -gzu,
                    -gzu * yc, -(gxu * zc - gzu * xc), gxu * yc,
                ]
                Jv = [
                    zero_row, -gyv, -gzv,
                    gyv * zc - gzv * yc, gzv * xc, -gyv * xc,
                ]
                Jur = [
                    -gxu, zero_row, -gzur,
                    -gzur * yc, -(gxu * zc - gzur * xc), gxu * yc,
                ]
                wc = w * comp
                H = {}
                b = [None] * 6
                for i2 in range(6):
                    for j2 in range(i2 + 1):
                        H[(i2, j2)] = jnp.sum(
                            w * (Ju[i2] * Ju[j2] + Jv[i2] * Jv[j2])
                            + wc * Jur[i2] * Jur[j2]
                        )
                    b[i2] = -jnp.sum(
                        w * (Ju[i2] * ru + Jv[i2] * rv) + wc * Jur[i2] * rur
                    )
                for i2 in range(6):
                    H[(i2, i2)] = H[(i2, i2)] * (1.0 + lam) + 1e-9
                dx = _chol6_solve(H, b)
                Rd, td = _se3_exp_scalars(dx)
                R = [list(pose[0:3]), list(pose[3:6]), list(pose[6:9])]
                t = list(pose[9:12])
                Rn, tn = _compose(Rd, td, R, t)
                pose_new = tuple(
                    Rn[0] + Rn[1] + Rn[2] + tn
                )
                r_new, _ = residuals(pose_new)
                new_cost = robust_cost(r_new, mask, robust)
                accept = new_cost < cost
                pose = tuple(
                    jnp.where(accept, pn, po)
                    for pn, po in zip(pose_new, pose)
                )
                lam = jnp.where(
                    accept,
                    jnp.maximum(lam * 0.5, 1e-9),
                    jnp.minimum(lam * 4.0, 1e6),
                )
                cost = jnp.where(accept, new_cost, cost)
                return (pose, lam, cost)

            r0, _ = residuals(pose)
            cost0 = robust_cost(r0, mask, robust)
            pose, _, _ = jax.lax.fori_loop(
                0, iters, body, (pose, jnp.float32(1e-3), cost0)
            )
            # chi2 reclassification (src/Optimizer.cc:391-428)
            r, (_, _, zc, _) = residuals(pose)
            c2 = chi2_of(r)
            new_mask = (
                (c2 <= chi2_th) & (zc > 0) & (valid0 > 0)
            ).astype(jnp.float32)
            return pose, new_mask

        pose = tuple(t0_ref[0, i] for i in range(12))
        mask = valid0
        for rd in range(rounds):
            pose, mask = lm_round(pose, mask, robust=rd < robust_rounds)
        # Mosaic forbids scalar stores to VMEM; scatter the 12 pose scalars
        # into one lane-indexed row and store it with a single vector write.
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        out_row = jnp.zeros((1, 128), jnp.float32)
        for i in range(12):
            out_row = jnp.where(lane == i, pose[i], out_row)
        tout_ref[:] = out_row
        inl_ref[:] = mask

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("K", "bf", "rounds", "iters", "interpret"),
)
def pose_optimize_pallas(
    Tcw0: jax.Array,
    Xw: jax.Array,             # [N, 3]
    obs: jax.Array,            # [N, 3] (u, v, ur)
    octave: jax.Array,         # [N]
    is_stereo: jax.Array,      # [N] bool
    valid: jax.Array,          # [N] bool
    inv_sigma2_levels: jax.Array,
    K: tuple,
    bf: float,
    rounds: int = C.POSE_OPT_ROUNDS,
    iters: int = C.POSE_OPT_ITS_PER_ROUND,
    interpret: bool = False,
) -> PoseOptResult:
    """Drop-in replacement for optim.pose_optimize as one Pallas kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = Xw.shape[0]
    n_pad = -(-n // 128) * 128

    def row8(x, fill=0.0):
        x = jnp.pad(
            x.astype(jnp.float32), ((0, n_pad - n),), constant_values=fill
        )
        return jnp.zeros((8, n_pad), jnp.float32).at[0].set(x)

    XwT = jnp.zeros((8, n_pad), jnp.float32).at[:3, :n].set(
        Xw.astype(jnp.float32).T
    )
    obsT = jnp.zeros((8, n_pad), jnp.float32).at[:3, :n].set(
        obs.astype(jnp.float32).T
    )
    inv_s2 = inv_sigma2_levels[
        jnp.clip(octave, 0, inv_sigma2_levels.shape[0] - 1)
    ]
    delta = jnp.where(is_stereo, C.HUBER_STEREO, C.HUBER_MONO)
    chi2th = jnp.where(is_stereo, C.CHI2_STEREO, C.CHI2_MONO)

    T = geo.orthonormalize_T(Tcw0)
    t0 = jnp.zeros((1, 128), jnp.float32).at[0, :12].set(
        jnp.concatenate([T[:3, :3].reshape(-1), T[:3, 3]])
    )

    kernel = _make_kernel(K, bf, rounds, iters, C.POSE_OPT_ROBUST_ROUNDS)
    tout, inl = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, 128), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.VMEM)] * 8,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.MemorySpace.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.VMEM),
        ),
        interpret=interpret,
    )(
        XwT, obsT, row8(inv_s2), row8(is_stereo.astype(jnp.float32)),
        row8(valid.astype(jnp.float32)), row8(delta, 1.0),
        row8(chi2th, 1.0), t0,
    )
    p = tout[0, :12]
    Tcw = geo.orthonormalize_T(geo.make_T(p[:9].reshape(3, 3), p[9:12]))
    inliers = (inl[0, :n] > 0) & valid
    return PoseOptResult(Tcw=Tcw, inliers=inliers, n_inliers=jnp.sum(inliers))
