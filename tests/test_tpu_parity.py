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
