"""Hardware parity for the shipped Pallas TPU kernels (VERDICT r2 item 5).

The default suite forces an 8-device virtual CPU mesh (conftest), so the
TPU-only dispatch branches — the Pallas pose-LM, the fused FAST+NMS
kernel, and the tile-aligned patch gather — get no coverage there, and
Mosaic constraints (DMA alignment, scalar-prefetch SMEM, scoped VMEM)
are NOT caught by interpret mode. This module runs them on the real chip
against their XLA reference paths:

    RUN_TPU_TESTS=1 python -m pytest tests/test_tpu_parity.py -q

Every test skips unless the active backend is a TPU, so the module is a
no-op inside the CPU suite.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

on_tpu = jax.default_backend() == "tpu"
pytestmark = pytest.mark.skipif(
    not on_tpu, reason="requires the real TPU backend (RUN_TPU_TESTS=1)"
)


def test_pose_lm_pallas_matches_xla():
    """Pallas pose LM vs the XLA path (tools/check_tpu_parity.py, now in
    the suite)."""
    import orb_slam2_comment_tpu  # noqa: F401
    from orb_slam2_comment_tpu.ops import optim
    from orb_slam2_comment_tpu.ops.lm_pallas import pose_optimize_pallas

    rng = np.random.RandomState(0)
    N = 512
    K = (520.0, 520.0, 320.0, 240.0)
    bf = 40.0
    Xw = rng.uniform([-3, -2, 2.0], [3, 2, 8.0], size=(N, 3)).astype(np.float32)
    T_gt = np.eye(4, dtype=np.float32)
    T_gt[:3, 3] = [0.1, -0.05, 0.2]
    Xc = Xw @ T_gt[:3, :3].T + T_gt[:3, 3]
    u = K[0] * Xc[:, 0] / Xc[:, 2] + K[2]
    v = K[1] * Xc[:, 1] / Xc[:, 2] + K[3]
    ur = u - bf / Xc[:, 2]
    obs = np.stack([u, v, ur], -1).astype(np.float32)
    obs[:, :2] += rng.randn(N, 2).astype(np.float32) * 0.5
    out_idx = rng.choice(N, N // 20, replace=False)
    obs[out_idx, :2] += rng.randn(len(out_idx), 2).astype(np.float32) * 40.0
    octave = rng.randint(0, 8, N).astype(np.int32)
    is_stereo = rng.rand(N) > 0.5
    inv_s2 = (1.0 / 1.44 ** np.arange(8)).astype(np.float32)
    T0 = np.eye(4, dtype=np.float32)
    T0[:3, 3] = [0.05, 0.0, 0.1]
    args = (jnp.asarray(T0), jnp.asarray(Xw), jnp.asarray(obs),
            jnp.asarray(octave), jnp.asarray(is_stereo),
            jnp.ones(N, bool), jnp.asarray(inv_s2), K, bf)
    os.environ["USE_PALLAS_LM"] = "0"
    r_xla = optim.pose_optimize(*args)
    r_pal = pose_optimize_pallas(*args)
    dT = np.abs(np.asarray(r_xla.Tcw) - np.asarray(r_pal.Tcw)).max()
    din = abs(int(r_xla.n_inliers) - int(r_pal.n_inliers))
    err_p = np.abs(np.asarray(r_pal.Tcw) - T_gt).max()
    assert dT < 5e-3 and din <= 5 and err_p < 5e-3, (dT, din, err_p)


@pytest.mark.parametrize("shape,n_feat", [((480, 640), 1000), ((376, 1241), 2000)])
def test_extraction_pallas_matches_xla(shape, n_feat):
    """Fused FAST+NMS + Pallas patch gather vs the pure-XLA fallback on
    the same image: keypoint sets and descriptors must agree. Covers both
    the default TUM config and the wide-pyramid 2000-feature KITTI config
    (the SMEM/VMEM overflow regression class)."""
    from orb_slam2_comment_tpu.ops import orb
    from orb_slam2_comment_tpu.ops.orb import ORBConfig

    rng = np.random.default_rng(1)
    # textured random image: piecewise blocks + noise so FAST fires
    h, w = shape
    img = rng.integers(0, 255, (h // 8 + 1, w // 8 + 1)).astype(np.float32)
    img = np.kron(img, np.ones((8, 8), np.float32))[:h, :w]
    img += rng.normal(0, 8, (h, w)).astype(np.float32)
    img = np.clip(img, 0, 255)

    cfg = ORBConfig(n_features=n_feat, n_levels=8)

    f_pal, _ = jax.jit(
        lambda x: orb._extract_impl(x, cfg, shape))(img)
    # XLA fallback path
    orb._USE_PALLAS_GATHER = False
    try:
        jax.clear_caches()
        f_xla, _ = jax.jit(
            lambda x: orb._extract_impl(x, cfg, shape))(img)
    finally:
        orb._USE_PALLAS_GATHER = True
        jax.clear_caches()

    va, vb = np.asarray(f_pal.valid), np.asarray(f_xla.valid)
    assert va.sum() == vb.sum()
    np.testing.assert_allclose(
        np.asarray(f_pal.xy)[va], np.asarray(f_xla.xy)[vb], atol=1e-3)
    da, db = np.asarray(f_pal.desc)[va], np.asarray(f_xla.desc)[vb]
    # descriptors bit-exact between gather paths
    mismatch = (da != db).any(axis=1).mean()
    assert mismatch < 0.01, f"{mismatch*100:.2f}% descriptor rows differ"


def test_lba_pallas_matches_xla():
    """Pallas local-BA system assembly vs the XLA build_system path on a
    bench-shaped window (32 cams x 2048 pts x 32k obs), both robust
    phases, plus one lba_iterate(5) trajectory comparison."""
    import orb_slam2_comment_tpu  # noqa: F401
    import orb_slam2_comment_tpu.ops.optim as om
    from orb_slam2_comment_tpu.ops import geometry as geo, optim

    NC, NP, N_PER, F = 32, 2048, 1000, 16
    O = NC * N_PER
    K = (500.0, 500.0, 320.0, 240.0)
    BF = 50.0
    inv_s2 = jnp.asarray([1.0 / (1.2 ** (2 * l)) for l in range(8)])
    r = np.random.default_rng(0)
    pts = r.uniform(-6, 6, (NP, 3)).astype(np.float32) + [0, 0, 10]
    cam_T = np.tile(np.eye(4, dtype=np.float32), (NC, 1, 1))
    cam_T[:, 0, 3] = -np.linspace(0, 2, NC).astype(np.float32)
    obs_pt = r.integers(0, NP, (NC, N_PER)).astype(np.int32)
    uvs = []
    for c in range(NC):
        X = geo.transform_points(jnp.asarray(cam_T[c]),
                                 jnp.asarray(pts[obs_pt[c]]))
        uvs.append(np.asarray(geo.project_stereo(K, BF, X)))
    uvr = (np.stack(uvs).reshape(O, 3)
           + r.normal(0, 0.4, (O, 3)).astype(np.float32))
    cam_fixed = np.zeros(NC, bool)
    cam_fixed[F:] = True
    cam_fixed[3] = True
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
    saved = om.USE_PALLAS_LBA
    try:
        om.USE_PALLAS_LBA = False
        bs_x, _, _ = optim._lba_core(prob, inv_s2, K, BF,
                                     cam_major=True, n_free=F)
        om.USE_PALLAS_LBA = True
        bs_p, _, _ = optim._lba_core(prob, inv_s2, K, BF,
                                     cam_major=True, n_free=F)
        for robust in (True, False):
            sx = jax.jit(lambda r=robust: bs_x(
                prob.cam_T, prob.pts, prob.obs_valid, r))()
            sp = jax.jit(lambda r=robust: bs_p(
                prob.cam_T, prob.pts, prob.obs_valid, r))()
            for fld in sx._fields:
                a = np.asarray(getattr(sx, fld), np.float64)
                b = np.asarray(getattr(sp, fld), np.float64)
                err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-6)
                assert err < 1e-3, (fld, err)
        # trajectory: same cost decrease + inlier count after 5 iters
        outs = {}
        for flag in (False, True):
            om.USE_PALLAS_LBA = flag
            carry = optim.lba_init(prob, inv_s2, K, BF)
            outs[flag] = jax.jit(lambda c=carry: optim.lba_iterate(
                prob, inv_s2, c, K, BF, 5, robust=True, n_free=F))()
        c_x, c_p = float(outs[False][3]), float(outs[True][3])
        assert abs(c_x - c_p) / max(abs(c_x), 1.0) < 1e-3, (c_x, c_p)
        assert int(outs[False][4]) == int(outs[True][4])
    finally:
        om.USE_PALLAS_LBA = saved
