"""Hardware parity check for the Pallas pose-LM kernel (ADVICE r1 item 2).

The test suite forces CPU (tests/conftest.py), so the default TPU dispatch
branch of pose_optimize (ops/optim.py USE_PALLAS_LM) gets no automated
coverage, and Mosaic constraints (DMA alignment, dynamic-offset tiles) are
NOT caught by interpret mode. Run this on the real chip after touching
ops/lm_pallas.py or the dispatch — it is part of the verify workflow
(.claude/skills/verify/SKILL.md).

usage: python tools/check_tpu_parity.py   # expects [TPU v5 lite0]
exit 0 = parity holds, nonzero = mismatch or kernel failure.
"""

import os
import sys

os.environ["USE_PALLAS_LM"] = "0"  # make pose_optimize take the XLA path

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    import orb_slam2_comment_tpu  # noqa: F401  (precision config)
    from orb_slam2_comment_tpu.ops import geometry as geo
    from orb_slam2_comment_tpu.ops import optim
    from orb_slam2_comment_tpu.ops.lm_pallas import pose_optimize_pallas

    backend = jax.default_backend()
    print(f"backend: {backend}  devices: {jax.devices()}")
    if backend != "tpu":
        print("NOT ON TPU — this check is meaningless off-chip", flush=True)
        return 2

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
    # 5% outliers
    out_idx = rng.choice(N, N // 20, replace=False)
    obs[out_idx, :2] += rng.randn(len(out_idx), 2).astype(np.float32) * 40.0
    octave = rng.randint(0, 8, N).astype(np.int32)
    is_stereo = rng.rand(N) > 0.5
    valid = np.ones(N, bool)
    inv_s2 = (1.0 / 1.44 ** np.arange(8)).astype(np.float32)
    T0 = np.eye(4, dtype=np.float32)
    T0[:3, 3] = [0.05, 0.0, 0.1]

    args = (jnp.asarray(T0), jnp.asarray(Xw), jnp.asarray(obs),
            jnp.asarray(octave), jnp.asarray(is_stereo), jnp.asarray(valid),
            jnp.asarray(inv_s2), K, bf)
    r_xla = optim.pose_optimize(*args)
    r_pal = pose_optimize_pallas(*args)
    T_x = np.asarray(r_xla.Tcw)
    T_p = np.asarray(r_pal.Tcw)
    dT = np.abs(T_x - T_p).max()
    din = abs(int(r_xla.n_inliers) - int(r_pal.n_inliers))
    err_x = np.abs(T_x - T_gt).max()
    err_p = np.abs(T_p - T_gt).max()
    print(f"XLA   : n_inl={int(r_xla.n_inliers)} err_vs_gt={err_x:.5f}")
    print(f"Pallas: n_inl={int(r_pal.n_inliers)} err_vs_gt={err_p:.5f}")
    print(f"|T_xla - T_pallas|_max = {dT:.6f}   d_inliers = {din}")
    ok = dT < 5e-3 and din <= 5 and err_p < 5e-3
    print("PARITY OK" if ok else "PARITY FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
