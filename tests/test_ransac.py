"""Batched RANSAC solver tests."""

import jax.numpy as jnp
import numpy as np

from orb_slam2_comment_tpu.ops import geometry as geo
from orb_slam2_comment_tpu.ops import ransac

K = (500.0, 500.0, 320.0, 240.0)
SIGMA2 = jnp.asarray([1.2 ** (2 * l) for l in range(8)])


class TestPnP:
    def _problem(self, n=80, outlier_frac=0.3, noise=0.5, seed=0):
        r = np.random.default_rng(seed)
        X = r.uniform(-3, 3, (n, 3)).astype(np.float32) + [0, 0, 8]
        T_gt = np.asarray(geo.se3_exp(jnp.asarray([0.3, -0.1, 0.2, 0.1, -0.2, 0.05], jnp.float32)))
        Xc = np.asarray(geo.transform_points(jnp.asarray(T_gt), jnp.asarray(X)))
        uv = np.array(geo.project(K, jnp.asarray(Xc)))
        uv += r.normal(0, noise, uv.shape)
        n_out = int(n * outlier_frac)
        out_idx = r.choice(n, n_out, replace=False)
        uv[out_idx] = r.uniform([0, 0], [640, 480], (n_out, 2))
        return T_gt, X, uv.astype(np.float32), out_idx

    def test_recovers_pose_with_outliers(self):
        T_gt, X, uv, out_idx = self._problem()
        res = ransac.pnp_ransac(
            jnp.asarray(X), jnp.asarray(uv), jnp.zeros(len(X), jnp.int32),
            jnp.ones(len(X), bool), SIGMA2, K,
        )
        assert bool(res.ok)
        d = np.asarray(geo.se3_log(res.Tcw @ geo.inv_T(jnp.asarray(T_gt))))
        assert np.linalg.norm(d) < 0.05, d
        inl = np.asarray(res.inliers)
        assert not inl[out_idx].any() or inl[out_idx].mean() < 0.1

    def test_epnp_minimal_exact(self):
        """Noise-free data: the EPnP minimal solver (PnPsolver.cc EPnP
        path) must recover the pose to numerical precision."""
        T_gt, X, uv, _ = self._problem(n=60, outlier_frac=0.0, noise=0.0)
        res = ransac.pnp_ransac(
            jnp.asarray(X), jnp.asarray(uv), jnp.zeros(len(X), jnp.int32),
            jnp.ones(len(X), bool), SIGMA2, K,
        )
        assert bool(res.ok)
        assert int(res.n_inliers) >= 55
        d = np.asarray(geo.se3_log(res.Tcw @ geo.inv_T(jnp.asarray(T_gt))))
        assert np.linalg.norm(d) < 2e-3, d

    def test_epnp_low_inlier_ratio(self):
        """60% outliers: 4-point minimal sets keep the hypothesis hit rate
        workable (the reason the reference uses EPnP over 6-point DLT)."""
        T_gt, X, uv, out_idx = self._problem(
            n=120, outlier_frac=0.6, noise=0.4, seed=3
        )
        res = ransac.pnp_ransac(
            jnp.asarray(X), jnp.asarray(uv), jnp.zeros(len(X), jnp.int32),
            jnp.ones(len(X), bool), SIGMA2, K,
        )
        assert bool(res.ok)
        d = np.asarray(geo.se3_log(res.Tcw @ geo.inv_T(jnp.asarray(T_gt))))
        assert np.linalg.norm(d) < 0.05, d

    def test_fails_gracefully_on_garbage(self):
        r = np.random.default_rng(1)
        X = r.uniform(-3, 3, (40, 3)).astype(np.float32) + [0, 0, 5]
        uv = r.uniform([0, 0], [640, 480], (40, 2)).astype(np.float32)
        res = ransac.pnp_ransac(
            jnp.asarray(X), jnp.asarray(uv), jnp.zeros(40, jnp.int32),
            jnp.ones(40, bool), SIGMA2, K,
        )
        assert int(res.n_inliers) < 20  # no consistent pose should emerge


class TestSim3:
    def test_recovers_sim3_with_outliers(self):
        r = np.random.default_rng(2)
        n = 60
        zeta = np.array([0.4, -0.2, 0.3, 0.1, -0.1, 0.2, 0.3], np.float32)
        S12_gt = np.asarray(geo.sim3_exp(jnp.asarray(zeta)))
        Xc2 = r.uniform(-2, 2, (n, 3)).astype(np.float32) + [0, 0, 6]
        Xc1 = np.asarray(geo.transform_points(jnp.asarray(S12_gt), jnp.asarray(Xc2)))
        uv1 = np.array(geo.project(K, jnp.asarray(Xc1)))
        uv2 = np.array(geo.project(K, jnp.asarray(Xc2)))
        # corrupt 30%
        n_out = n * 3 // 10
        idx = r.choice(n, n_out, replace=False)
        Xc2_noisy = Xc2.copy()
        Xc2_noisy[idx] += r.uniform(1, 3, (n_out, 3)).astype(np.float32)
        res = ransac.sim3_ransac(
            jnp.asarray(Xc1), jnp.asarray(Xc2_noisy),
            jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.zeros(n, jnp.int32), jnp.zeros(n, jnp.int32),
            jnp.ones(n, bool), SIGMA2, K, K,
        )
        assert bool(res.ok)
        s_est = float(geo.sim3_scale(res.S12))
        assert abs(s_est - np.exp(0.3)) < 0.05
        d = np.asarray(geo.sim3_log(res.S12 @ geo.inv_T(jnp.asarray(S12_gt))))
        assert np.linalg.norm(d) < 0.1, d

    def test_fix_scale(self):
        r = np.random.default_rng(3)
        n = 40
        xi = np.array([0.2, 0.1, -0.3, 0.05, 0.1, -0.05], np.float32)
        T_gt = np.asarray(geo.se3_exp(jnp.asarray(xi)))
        Xc2 = r.uniform(-2, 2, (n, 3)).astype(np.float32) + [0, 0, 6]
        Xc1 = np.asarray(geo.transform_points(jnp.asarray(T_gt), jnp.asarray(Xc2)))
        uv1 = np.array(geo.project(K, jnp.asarray(Xc1)))
        uv2 = np.array(geo.project(K, jnp.asarray(Xc2)))
        res = ransac.sim3_ransac(
            jnp.asarray(Xc1), jnp.asarray(Xc2), jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.zeros(n, jnp.int32), jnp.zeros(n, jnp.int32),
            jnp.ones(n, bool), SIGMA2, K, K, fix_scale=True,
        )
        assert bool(res.ok)
        assert abs(float(geo.sim3_scale(res.S12)) - 1.0) < 1e-4
