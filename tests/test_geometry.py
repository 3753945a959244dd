"""Unit tests for the Lie-group / camera geometry core."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam2_comment_tpu.ops import geometry as geo


def rng(seed=0):
    return np.random.default_rng(seed)


class TestSO3:
    def test_exp_identity(self):
        R = geo.so3_exp(jnp.zeros(3))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-6)

    def test_exp_log_roundtrip(self):
        r = rng(1)
        for _ in range(20):
            phi = r.normal(size=3) * 1.5
            R = geo.so3_exp(jnp.asarray(phi, jnp.float32))
            phi2 = geo.so3_log(R)
            if np.linalg.norm(phi) < np.pi - 1e-3:
                np.testing.assert_allclose(phi2, phi, atol=1e-4)
            else:
                # log returns the principal value; compare rotations instead
                R2 = geo.so3_exp(phi2)
                np.testing.assert_allclose(R2, R, atol=1e-4)

    def test_log_near_pi(self):
        axis = np.array([1.0, 0.3, -0.5])
        axis /= np.linalg.norm(axis)
        phi = axis * (np.pi - 1e-3)
        R = geo.so3_exp(jnp.asarray(phi, jnp.float32))
        phi2 = np.asarray(geo.so3_log(R))
        np.testing.assert_allclose(np.abs(phi2), np.abs(phi), atol=2e-3)

    def test_orthonormal(self):
        phi = jnp.asarray(rng(2).normal(size=3), jnp.float32)
        R = geo.so3_exp(phi)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        assert abs(float(jnp.linalg.det(R)) - 1.0) < 1e-5


class TestSE3:
    def test_exp_log_roundtrip(self):
        r = rng(3)
        for _ in range(20):
            xi = r.normal(size=6)
            xi[3:] *= 0.9  # keep rotation below pi for principal-value compare
            xi = jnp.asarray(xi, jnp.float32)
            T = geo.se3_exp(xi)
            xi2 = geo.se3_log(T)
            np.testing.assert_allclose(xi2, xi, atol=1e-4)

    def test_inv(self):
        xi = jnp.asarray(rng(4).normal(size=6), jnp.float32)
        T = geo.se3_exp(xi)
        np.testing.assert_allclose(T @ geo.inv_T(T), np.eye(4), atol=1e-5)

    def test_compose(self):
        a = jnp.asarray(rng(5).normal(size=6) * 0.01, jnp.float32)
        b = jnp.asarray(rng(6).normal(size=6) * 0.01, jnp.float32)
        # BCH first-order: exp(a)exp(b) ~ exp(a+b) for small a,b
        T = geo.se3_exp(a) @ geo.se3_exp(b)
        np.testing.assert_allclose(geo.se3_log(T), a + b, atol=5e-4)


class TestSim3:
    def test_exp_identity(self):
        S = geo.sim3_exp(jnp.zeros(7))
        np.testing.assert_allclose(S, np.eye(4), atol=1e-6)

    def test_scale(self):
        z = jnp.zeros(7).at[6].set(0.7)
        S = geo.sim3_exp(z)
        assert abs(float(geo.sim3_scale(S)) - np.exp(0.7)) < 1e-4

    def test_exp_log_roundtrip(self):
        r = rng(7)
        for _ in range(20):
            zeta = jnp.asarray(r.normal(size=7) * 0.8, jnp.float32)
            S = geo.sim3_exp(zeta)
            zeta2 = geo.sim3_log(S)
            np.testing.assert_allclose(zeta2, zeta, atol=2e-3)

    def test_sim3_reduces_to_se3(self):
        xi = jnp.asarray(rng(8).normal(size=6), jnp.float32)
        zeta = jnp.concatenate([xi, jnp.zeros(1)])
        np.testing.assert_allclose(geo.sim3_exp(zeta), geo.se3_exp(xi), atol=1e-5)

    def test_inv(self):
        zeta = jnp.asarray(rng(9).normal(size=7) * 0.5, jnp.float32)
        S = geo.sim3_exp(zeta)
        np.testing.assert_allclose(S @ geo.inv_T(S), np.eye(4), atol=1e-4)


class TestCamera:
    K = (500.0, 500.0, 320.0, 240.0)

    def test_project_backproject(self):
        r = rng(10)
        X = jnp.asarray(r.uniform(-1, 1, size=(50, 3)) + [0, 0, 3], jnp.float32)
        uv = geo.project(self.K, X)
        X2 = geo.backproject(self.K, uv, X[:, 2])
        np.testing.assert_allclose(X2, X, atol=1e-4)

    def test_stereo_disparity(self):
        bf = 50.0
        X = jnp.asarray([[0.5, -0.2, 2.0]], jnp.float32)
        uvr = geo.project_stereo(self.K, bf, X)
        # disparity = bf / z
        assert abs(float(uvr[0, 0] - uvr[0, 2]) - bf / 2.0) < 1e-5

    def test_triangulate(self):
        r = rng(11)
        fx, fy, cx, cy = self.K
        Km = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
        T1 = np.eye(4, dtype=np.float32)
        T2 = np.asarray(geo.se3_exp(jnp.asarray([0.5, 0.02, 0.01, 0.01, -0.05, 0.02], jnp.float32)))
        X = r.uniform(-1, 1, size=(40, 3)).astype(np.float32) + [0, 0, 4]
        uv1 = np.asarray(geo.project(self.K, jnp.asarray(X)))
        Xc2 = np.asarray(geo.transform_points(jnp.asarray(T2), jnp.asarray(X)))
        uv2 = np.asarray(geo.project(self.K, jnp.asarray(Xc2)))
        P1 = Km @ T1[:3]
        P2 = Km @ T2[:3]
        Xt = geo.triangulate_linear(jnp.asarray(P1), jnp.asarray(P2), jnp.asarray(uv1), jnp.asarray(uv2))
        np.testing.assert_allclose(Xt, X, atol=1e-2)

    def test_fundamental(self):
        T1 = np.eye(4, dtype=np.float32)
        T2 = np.asarray(geo.se3_exp(jnp.asarray([0.3, 0.0, 0.0, 0.0, 0.1, 0.0], jnp.float32)))
        X = rng(12).uniform(-1, 1, size=(30, 3)).astype(np.float32) + [0, 0, 4]
        uv1 = np.asarray(geo.project(self.K, jnp.asarray(X)))
        Xc2 = np.asarray(geo.transform_points(jnp.asarray(T2), jnp.asarray(X)))
        uv2 = np.asarray(geo.project(self.K, jnp.asarray(Xc2)))
        F12 = np.asarray(geo.fundamental_from_poses(self.K, jnp.asarray(T1), self.K, jnp.asarray(T2)))
        h1 = np.concatenate([uv1, np.ones((30, 1), np.float32)], 1)
        h2 = np.concatenate([uv2, np.ones((30, 1), np.float32)], 1)
        resid = np.abs(np.sum(h1 @ F12 * h2, axis=1))
        assert resid.max() < 1e-3


class TestQuat:
    def test_roundtrip(self):
        r = rng(13)
        for _ in range(30):
            phi = jnp.asarray(r.normal(size=3) * 2, jnp.float32)
            R = geo.so3_exp(phi)
            q = geo.rot_to_quat(R)
            R2 = geo.quat_to_rot(q)
            np.testing.assert_allclose(R2, R, atol=1e-5)


class TestHuber:
    def test_weight(self):
        delta = 2.0
        assert float(geo.huber_weight(jnp.asarray(1.0), delta)) == 1.0
        w = float(geo.huber_weight(jnp.asarray(16.0), delta))
        np.testing.assert_allclose(w, 2.0 / 4.0, atol=1e-6)


class TestJit:
    def test_all_jittable(self):
        xi = jnp.ones(6) * 0.1

        @jax.jit
        def f(x):
            T = geo.se3_exp(x)
            return geo.se3_log(geo.inv_T(T))

        np.testing.assert_allclose(f(xi), -xi, atol=1e-5)
