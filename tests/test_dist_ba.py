"""Distributed / matrix-free global BA tests on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_comment_tpu.ops import geometry as geo
from orb_slam2_comment_tpu.ops import optim
from orb_slam2_comment_tpu.parallel import dist_ba

K = (500.0, 500.0, 320.0, 240.0)
BF = 100.0
INV_S2 = jnp.asarray([1.0 / (1.2 ** (2 * l)) for l in range(8)])


def _pose_err(Ta, Tb):
    d = np.asarray(geo.se3_log(jnp.asarray(Ta) @ geo.inv_T(jnp.asarray(Tb))))
    return np.linalg.norm(d)


class TestGlobalBA:
    def test_pcg_converges(self):
        prob, cams_gt, X_gt = dist_ba.make_synthetic_ba_problem(
            n_cams=8, n_pts=128, obs_per_cam=64, perturb=0.03
        )
        res = optim.global_bundle_adjustment(prob, INV_S2, K, BF, iters=8)
        for c in range(2, 8):
            before = _pose_err(np.asarray(prob.cam_T[c]), cams_gt[c])
            after = _pose_err(np.asarray(res.cam_T[c]), cams_gt[c])
            assert after < before * 0.25, (c, before, after)
        assert float(np.asarray(res.obs_inlier).mean()) > 0.95

    def test_matches_dense_schur(self):
        """PCG path and dense-Schur local BA should land on comparable
        solutions for the same problem."""
        prob, cams_gt, _ = dist_ba.make_synthetic_ba_problem(
            n_cams=6, n_pts=96, obs_per_cam=48, perturb=0.02, seed=3
        )
        res_pcg = optim.global_bundle_adjustment(prob, INV_S2, K, BF, iters=10)
        res_dense = optim.local_bundle_adjustment(prob, INV_S2, K, BF)
        for c in range(2, 6):
            d = _pose_err(np.asarray(res_pcg.cam_T[c]), np.asarray(res_dense.cam_T[c]))
            assert d < 5e-3, (c, d)


class TestDistributedBA:
    def test_multi_device_matches_single(self):
        assert len(jax.devices()) >= 8, "conftest should provide 8 cpu devices"
        mesh = dist_ba.make_mesh(jax.devices()[:8])
        prob, cams_gt, _ = dist_ba.make_synthetic_ba_problem(
            n_cams=8, n_pts=128, obs_per_cam=64, perturb=0.03
        )
        res_1 = optim.global_bundle_adjustment(prob, INV_S2, K, BF, iters=6)
        res_8 = dist_ba.distributed_global_ba(prob, INV_S2, K, BF, mesh, iters=6)
        for c in range(8):
            d = _pose_err(np.asarray(res_8.cam_T[c]), np.asarray(res_1.cam_T[c]))
            assert d < 1e-3, (c, d)
        # and it actually improved toward ground truth
        for c in range(2, 8):
            before = _pose_err(np.asarray(prob.cam_T[c]), cams_gt[c])
            after = _pose_err(np.asarray(res_8.cam_T[c]), cams_gt[c])
            assert after < before * 0.3

    def test_padding(self):
        prob, _, _ = dist_ba.make_synthetic_ba_problem(
            n_cams=4, n_pts=32, obs_per_cam=17  # 68 obs, not divisible by 8
        )
        padded = dist_ba.pad_problem(prob, 8)
        assert padded.obs_cam.shape[0] % 8 == 0
        assert int(padded.obs_valid.sum()) == int(prob.obs_valid.sum())


class TestDistributedEssentialGraph:
    def _circle_graph(self, n_kf=12, seed=4):
        r = np.random.default_rng(seed)
        S_gt = []
        for i in range(n_kf):
            th = 2 * np.pi * i / n_kf
            xi = np.array(
                [np.sin(th) * 2, 0, (1 - np.cos(th)) * 2, 0, th, 0],
                np.float32,
            )
            S_gt.append(np.asarray(geo.se3_exp(jnp.asarray(xi))))
        S_gt = np.stack(S_gt)
        S_est = [S_gt[0]]
        for i in range(1, n_kf):
            rel_gt = S_gt[i] @ np.linalg.inv(S_gt[i - 1])
            noise = np.asarray(geo.se3_exp(jnp.asarray(
                r.normal(0, 0.02, 6).astype(np.float32))))
            S_est.append(noise @ rel_gt @ S_est[i - 1])
        ei, ej, Sji = [], [], []
        for i in range(n_kf - 1):
            ei.append(i); ej.append(i + 1)
            Sji.append(S_gt[i + 1] @ np.linalg.inv(S_gt[i]))
        ei.append(n_kf - 1); ej.append(0)
        Sji.append(S_gt[0] @ np.linalg.inv(S_gt[n_kf - 1]))
        return (np.stack(S_est), S_gt, np.asarray(ei, np.int32),
                np.asarray(ej, np.int32), np.stack(Sji).astype(np.float32))

    def test_matches_single_device(self):
        """Edge-sharded pose-graph optimization over the 8-device mesh
        must agree with the single-device solve (GSPMD psum assembly)."""
        S_est, S_gt, ei, ej, Sji = self._circle_graph()
        n_kf = S_est.shape[0]
        args = (
            jnp.asarray(S_est), jnp.ones(n_kf, bool),
            jnp.asarray([True] + [False] * (n_kf - 1)),
            jnp.asarray(ei), jnp.asarray(ej), jnp.asarray(Sji),
            jnp.ones(len(ei), bool),
        )
        res_1 = optim.essential_graph_optimize(*args)
        mesh = dist_ba.make_mesh()
        assert mesh.devices.size == 8  # conftest forces the virtual mesh
        res_n = dist_ba.distributed_essential_graph(*args, mesh=mesh)
        np.testing.assert_allclose(
            np.asarray(res_n.S), np.asarray(res_1.S), atol=1e-4
        )
        # and it actually solved the problem
        for i in range(n_kf):
            d = np.asarray(geo.sim3_log(jnp.asarray(
                np.asarray(res_n.S)[i] @ np.linalg.inv(S_gt[i]))))
            assert np.linalg.norm(d) < 0.02, (i, d)
