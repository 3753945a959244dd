"""Pallas TPU kernel: local-BA system assembly in ONE pass.

Replaces the XLA build_system path of ops/optim._lba_core for the
camera-major window layout. Per LM iteration the XLA path paid ~4.5 ms
(measured, tools/profiling/_prof_lba.py): a jacobian pass on [O,3,6]
tensors whose 6-wide last dim pads to 128 lanes, a separate residual/cost
pass, and a [Nc,N_per,Np] one-hot einsum that streams a 131 MB HBM
buffer. This kernel fuses residuals, analytic Jacobians
(src/types_six_dof_expmap.cpp linearizeOplus semantics — see
optim._edge_jacobians), Huber weighting, cost/inlier reduction, and ALL
block reductions (Hcc, bc, Hpp, bp, E) into one grid-over-cameras
program: the one-hot point-scatter matrix is generated on the fly in
VMEM (never touches HBM) and every per-observation quantity lives in
[1, Npad] rows that tile the (8,128) VPU exactly.

Semantics match optim.build_system_xla (the CPU/test reference path);
parity is asserted on hardware by tests/test_tpu_parity.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from orb_slam2_comment_tpu import constants as C

_NP_TILE = 512  # one-hot matmul tile along the point axis


def _round_up(x, m):
    return (x + m - 1) // m * m


def prep_problem(prob, inv_sigma2_levels, F):
    """Static (per-window) tensors in camera-major 2D layouts."""
    Nc = prob.cam_T.shape[0]
    Np = prob.pts.shape[0]
    O = prob.obs_cam.shape[0]
    N_per = O // Nc
    Npad = _round_up(N_per, 128)

    def pad2(x, fill):
        x = x.reshape(Nc, N_per)
        return jnp.pad(x, ((0, 0), (0, Npad - N_per)), constant_values=fill)

    inv_s2 = inv_sigma2_levels[
        jnp.clip(prob.obs_oct, 0, inv_sigma2_levels.shape[0] - 1)]
    uvr = prob.obs_uvr.reshape(Nc, N_per, 3)
    uvr = jnp.pad(uvr, ((0, 0), (0, Npad - N_per), (0, 0)))
    return dict(
        Nc=Nc, Np=Np, N_per=N_per, Npad=Npad, F=F,
        uvr3=uvr.transpose(0, 2, 1),                      # [Nc, 3, Npad]
        ptl=jnp.clip(pad2(prob.obs_pt, 0), 0, Np - 1),    # [Nc, Npad]
        inv_s2=pad2(inv_s2, 0.0),                         # [Nc, Npad]
        urmask=pad2(prob.obs_stereo.astype(jnp.float32), 0.0),
        obs_pt_flat=jnp.clip(prob.obs_pt, 0, Np - 1),
        cam_free=((~prob.cam_fixed) & prob.cam_valid).astype(jnp.int32),
        pt_valid=prob.pt_valid,
    )


def _kernel(K, bf, Np, Npad,
            free_ref, robust_ref,
            cam_ref, xo_ref, uvr_ref, wb_ref, urm_ref, ptl_ref,
            cam_out_ref, pp_ref, e_ref,
            rows_ref, crows_ref, out30_ref):
    fx, fy, cx, cy = K
    c = pl.program_id(0)

    # camera rotation/translation scalars (row-major 4x4 flattened; the
    # cam matrix rides whole — a (1,16) block violates the (8,128) rule)
    R00, R01, R02, t0 = (cam_ref[c, 0], cam_ref[c, 1], cam_ref[c, 2],
                         cam_ref[c, 3])
    R10, R11, R12, t1 = (cam_ref[c, 4], cam_ref[c, 5], cam_ref[c, 6],
                         cam_ref[c, 7])
    R20, R21, R22, t2 = (cam_ref[c, 8], cam_ref[c, 9], cam_ref[c, 10],
                         cam_ref[c, 11])

    px = xo_ref[0, 0:1, :]
    py = xo_ref[0, 1:2, :]
    pz = xo_ref[0, 2:3, :]
    x = R00 * px + R01 * py + R02 * pz + t0
    y = R10 * px + R11 * py + R12 * pz + t1
    z = R20 * px + R21 * py + R22 * pz + t2

    invz = 1.0 / jnp.maximum(z, 1e-9)
    invz2 = invz * invz
    u_obs = uvr_ref[0, 0:1, :]
    v_obs = uvr_ref[0, 1:2, :]
    r_obs = uvr_ref[0, 2:3, :]
    pred_u = fx * x * invz + cx
    pred_v = fy * y * invz + cy
    r0 = u_obs - pred_u
    r1 = v_obs - pred_v
    r2 = r_obs - (pred_u - bf * invz)

    wb = wb_ref[0, 0:1, :]
    urm = urm_ref[0, 0:1, :]
    chi2 = wb * (r0 * r0 + r1 * r1 + urm * r2 * r2)
    ok = (wb > 0.0).astype(jnp.float32)
    delta = jnp.where(urm > 0.0, C.HUBER_STEREO, C.HUBER_MONO)
    d2 = delta * delta
    th = jnp.where(urm > 0.0, C.CHI2_STEREO, C.CHI2_MONO)
    robust = robust_ref[0] > 0
    hw = jnp.where(
        jnp.logical_and(robust, chi2 > d2),
        delta * jax.lax.rsqrt(jnp.maximum(chi2, 1e-12)),
        1.0,
    )
    rho = jnp.where(
        chi2 <= d2,
        chi2,
        2.0 * delta * jnp.sqrt(jnp.maximum(chi2, 1e-12)) - d2,
    )
    cost_row = jnp.where(robust, rho, chi2)
    nin_row = ok * (chi2 <= th).astype(jnp.float32)

    w0 = wb * hw          # residual rows 0,1 weight
    w2 = w0 * urm         # stereo row weight
    free = (free_ref[c] > 0).astype(jnp.float32)

    # dr/dXc sparse entries (optim._edge_jacobians)
    D00 = -fx * invz
    D02 = fx * x * invz2
    D11 = -fy * invz
    D12 = fy * y * invz2
    D20 = -fx * invz
    D22 = (fx * x - bf) * invz2
    M00 = -D02 * y
    M01 = -D00 * z + D02 * x
    M02 = D00 * y
    M10 = D11 * z - D12 * y
    M11 = D12 * x
    M12 = -D11 * x
    M20 = -D22 * y
    M21 = -D20 * z + D22 * x
    M22 = D20 * y

    zr = jnp.zeros_like(x)
    # Jc rows
    Jc0 = (D00, zr, D02, -M00, -M01, -M02)
    Jc1 = (zr, D11, D12, -M10, -M11, -M12)
    Jc2 = (D20, zr, D22, -M20, -M21, -M22)
    # Jp rows
    Jp0 = (D00 * R00 + D02 * R20, D00 * R01 + D02 * R21,
           D00 * R02 + D02 * R22)
    Jp1 = (D11 * R10 + D12 * R20, D11 * R11 + D12 * R21,
           D11 * R12 + D12 * R22)
    Jp2 = (D20 * R00 + D22 * R20, D20 * R01 + D22 * R21,
           D20 * R02 + D22 * R22)
    # Weighted copies FIRST (matches the XLA product order): on masked
    # lanes w=0 while the raw Jacobian entries can be ~1e21 from the
    # depth clamp — J*J would overflow to inf and 0*inf = NaN, whereas
    # (w*J)*J is 0*finite.
    fw0 = free * w0
    fw2 = free * w2
    JcW0 = tuple(fw0 * v for v in Jc0)
    JcW1 = tuple(fw0 * v for v in Jc1)
    JcW2 = tuple(fw2 * v for v in Jc2)
    JpW0 = tuple(w0 * v for v in Jp0)
    JpW1 = tuple(w0 * v for v in Jp1)
    JpW2 = tuple(w2 * v for v in Jp2)

    # --- per-point rows (go through the one-hot matmul) ----------------
    # rows 0-8: Hpp_ij; rows 9-11: bp_i; rows 12-29: E_ij (i cam, j pt)
    for i in range(3):
        for j in range(3):
            k = 3 * i + j
            rows_ref[k:k + 1, :] = (
                JpW0[i] * Jp0[j] + JpW1[i] * Jp1[j] + JpW2[i] * Jp2[j]
            )
    for i in range(3):
        rows_ref[9 + i:10 + i, :] = (
            -(JpW0[i] * r0 + JpW1[i] * r1 + JpW2[i] * r2)
        )
    for i in range(6):
        for j in range(3):
            k = 12 + 3 * i + j
            rows_ref[k:k + 1, :] = (
                JcW0[i] * Jp0[j] + JcW1[i] * Jp1[j] + JcW2[i] * Jp2[j]
            )
    rows_ref[30:32, :] = jnp.zeros((2, rows_ref.shape[1]), jnp.float32)

    # --- camera-side rows (plain reductions) ---------------------------
    for i in range(6):
        for j in range(6):
            k = 6 * i + j
            crows_ref[k:k + 1, :] = (
                JcW0[i] * Jc0[j] + JcW1[i] * Jc1[j] + JcW2[i] * Jc2[j]
            )
    for i in range(6):
        crows_ref[36 + i:37 + i, :] = (
            -(JcW0[i] * r0 + JcW1[i] * r1 + JcW2[i] * r2)
        )
    crows_ref[42:43, :] = cost_row
    crows_ref[43:44, :] = nin_row
    crows_ref[44:48, :] = jnp.zeros((4, crows_ref.shape[1]), jnp.float32)

    cam_out_ref[0] = jnp.sum(crows_ref[:, :], axis=1, keepdims=True)

    # --- one-hot scatter along the point axis (MXU, VMEM-resident) -----
    pid = ptl_ref[0, :, :]                                # [Npad, 1] i32
    for t in range(Np // _NP_TILE):
        iot = jax.lax.broadcasted_iota(
            jnp.int32, (Npad, _NP_TILE), 1) + t * _NP_TILE
        oh = (pid == iot).astype(jnp.float32)
        out30_ref[:, t * _NP_TILE:(t + 1) * _NP_TILE] = jnp.dot(
            rows_ref[:, :], oh, preferred_element_type=jnp.float32)

    @pl.when(c == 0)
    def _():
        pp_ref[:, :] = jnp.zeros_like(pp_ref)

    pp_ref[0:12, :] = pp_ref[0:12, :] + out30_ref[0:12, :]
    e_ref[0, 0:18, :] = out30_ref[12:30, :]
    e_ref[0, 18:24, :] = jnp.zeros((6, Np), jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("K", "bf", "dims"))
def _build_system_call(cam_flat, xo, wbase, cam_free, robust_i32,
                       uvr3, urmask, ptl3, K, bf, dims):
    Nc, Np, Npad, F = dims
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Nc,),
        in_specs=[
            pl.BlockSpec((Nc, 16), lambda c, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, Npad), lambda c, *_: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, Npad), lambda c, *_: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Npad), lambda c, *_: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Npad), lambda c, *_: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Npad, 1), lambda c, *_: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 48, 1), lambda c, *_: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, Np), lambda c, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 24, Np), lambda c, *_: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((32, Npad), jnp.float32),
            pltpu.VMEM((48, Npad), jnp.float32),
            pltpu.VMEM((32, Np), jnp.float32),
        ],
    )
    kernel = functools.partial(_kernel, K, bf, Np, Npad)
    cam_out, pp, e = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Nc, 48, 1), jnp.float32),
            jax.ShapeDtypeStruct((16, Np), jnp.float32),
            jax.ShapeDtypeStruct((Nc, 24, Np), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(cam_free, robust_i32, cam_flat, xo, uvr3,
      wbase[:, None, :], urmask[:, None, :], ptl3)
    return cam_out, pp, e


def build_system(prepped, cam_T, pts, obs_ok, robust, K, bf):
    """Drop-in for optim.build_system_xla on TPU (camera-major layout)."""
    from orb_slam2_comment_tpu.ops.optim import LBASystem

    Nc, Np = prepped["Nc"], prepped["Np"]
    Npad, N_per, F = prepped["Npad"], prepped["N_per"], prepped["F"]
    wbase = prepped["inv_s2"] * jnp.pad(
        obs_ok.reshape(Nc, N_per).astype(jnp.float32),
        ((0, 0), (0, Npad - N_per)))
    Xo = pts[prepped["obs_pt_flat"]].reshape(Nc, N_per, 3)
    Xo = jnp.pad(Xo, ((0, 0), (0, Npad - N_per), (0, 0))).transpose(0, 2, 1)
    cam_flat = cam_T.reshape(Nc, 16)
    robust_i32 = jnp.asarray(robust, jnp.int32).reshape(1)
    cam_out, pp, e = _build_system_call(
        cam_flat, Xo, wbase, prepped["cam_free"], robust_i32,
        prepped["uvr3"], prepped["urmask"],
        prepped["ptl"][:, :, None],
        tuple(float(k) for k in K), float(bf),
        (Nc, Np, Npad, F),
    )
    cam = cam_out[:, :, 0]
    Hcc = cam[:F, :36].reshape(F, 6, 6)
    bc = cam[:F, 36:42]
    cost = jnp.sum(cam[:, 42])
    n_in = jnp.sum(cam[:, 43]).astype(jnp.int32)
    return LBASystem(
        Hcc=Hcc, bc=bc, Hpp9=pp[:9], bp3=pp[9:12],
        E=e[:F, :18, :].reshape(F, 6, 3, Np),
        cost=cost, n_in=n_in,
    )
