"""Matching + stereo correspondence tests on rendered scenes."""

import jax.numpy as jnp
import numpy as np

from orb_slam2_comment_tpu.ops import geometry as geo
from orb_slam2_comment_tpu.ops import matching, orb, stereo
from orb_slam2_comment_tpu.utils import synthetic as syn

CFG = orb.ORBConfig(n_features=600, n_levels=4)
K = syn.DEFAULT_K
HW = syn.DEFAULT_HW


def _two_views(dt=(0.05, 0.0, 0.1), seed=5, n_points=350):
    scene = syn.make_scene(n_points=n_points, seed=seed)
    T1 = np.eye(4, dtype=np.float32)
    T2 = np.eye(4, dtype=np.float32)
    T2[:3, 3] = dt
    img1 = syn.render(scene, T1, K, HW, noise=1.0, seed=1)
    img2 = syn.render(scene, T2, K, HW, noise=1.0, seed=2)
    f1, p1 = orb.extract(jnp.asarray(img1), CFG)
    f2, p2 = orb.extract(jnp.asarray(img2), CFG)
    return scene, T1, T2, f1, f2, p1, p2


def _gt_proj(scene, T):
    fx, fy, cx, cy = K
    Xc = scene.points @ T[:3, :3].T + T[:3, 3]
    u = fx * Xc[:, 0] / Xc[:, 2] + cx
    v = fy * Xc[:, 1] / Xc[:, 2] + cy
    return u, v, Xc[:, 2]


def _precision(scene, T1, T2, f1, f2, idx, ok, tol=6.0):
    """Fraction of accepted matches that link the same landmark."""
    u1, v1, _ = _gt_proj(scene, T1)
    u2, v2, _ = _gt_proj(scene, T2)
    xy1, xy2 = np.asarray(f1.xy), np.asarray(f2.xy)
    idx, ok = np.asarray(idx), np.asarray(ok)
    good = tot = 0
    for i in np.where(ok)[0]:
        d1 = (u1 - xy1[i, 0]) ** 2 + (v1 - xy1[i, 1]) ** 2
        lm = d1.argmin()
        if d1[lm] > tol**2:
            continue
        tot += 1
        dx = u2[lm] - xy2[idx[i], 0]
        dy = v2[lm] - xy2[idx[i], 1]
        if dx * dx + dy * dy < tol**2:
            good += 1
    return good, tot


class TestHamming:
    def test_matches_popcount(self):
        r = np.random.default_rng(0)
        a = r.integers(0, 2**32, (16, 8), dtype=np.uint32)
        b = r.integers(0, 2**32, (12, 8), dtype=np.uint32)
        d = np.asarray(matching.hamming_from_packed(jnp.asarray(a), jnp.asarray(b)))
        # reference popcount
        abits = np.unpackbits(a.view(np.uint8), axis=1)
        bbits = np.unpackbits(b.view(np.uint8), axis=1)
        ref = (abits[:, None, :] != bbits[None, :, :]).sum(-1)
        np.testing.assert_array_equal(d.astype(np.int32), ref)


class TestWindowMatch:
    def test_precision(self):
        scene, T1, T2, f1, f2, _, _ = _two_views()
        res = matching.match_window(f1, f2)
        good, tot = _precision(scene, T1, T2, f1, f2, res.idx, res.ok)
        assert tot > 30
        assert good / tot > 0.9, f"{good}/{tot}"


class TestProjectionMatch:
    def test_projection_search(self):
        scene, T1, T2, f1, f2, _, _ = _two_views()
        # project landmarks into view 2 with ground truth, search features
        u2, v2, z2 = _gt_proj(scene, T2)
        vis = (z2 > 0.3) & (u2 > 20) & (u2 < 620) & (v2 > 20) & (v2 < 460)
        # use descriptors observed in view 1 as the "map point descriptors"
        u1, v1, _ = _gt_proj(scene, T1)
        xy1 = np.asarray(f1.xy)
        val1 = np.asarray(f1.valid)
        desc1 = np.asarray(f1.desc)
        oct1 = np.asarray(f1.octave)
        pt_desc = np.zeros((len(scene.points), 8), np.uint32)
        pt_oct = np.zeros(len(scene.points), np.int32)
        has_desc = np.zeros(len(scene.points), bool)
        # keypoints sit on marker corners, up to ~7px+sqrt2 from the center
        for lm in range(len(scene.points)):
            d = (xy1[:, 0] - u1[lm]) ** 2 + (xy1[:, 1] - v1[lm]) ** 2
            d[~val1] = 1e12
            i = d.argmin()
            if d[i] < 100:
                pt_desc[lm] = desc1[i]
                pt_oct[lm] = oct1[i]
                has_desc[lm] = True
        res = matching.match_projection(
            proj_xy=jnp.asarray(np.stack([u2, v2], 1), jnp.float32),
            proj_valid=jnp.asarray(vis & has_desc),
            proj_desc=jnp.asarray(pt_desc),
            proj_octave=jnp.asarray(pt_oct),
            feats=f2,
            radius=12.0,
            scale_factors=jnp.asarray(CFG.scales),
        )
        ok = np.asarray(res.ok)
        idx = np.asarray(res.idx)
        assert ok.sum() > 60, ok.sum()
        # matched feature should be near the projected landmark (within the
        # marker footprint)
        xy2 = np.asarray(f2.xy)
        err = np.hypot(
            xy2[idx[ok], 0] - u2[ok], xy2[idx[ok], 1] - v2[ok]
        )
        assert np.median(err) < 9.0, np.median(err)


class TestEpipolar:
    def test_epipolar_match(self):
        scene, T1, T2, f1, f2, _, _ = _two_views(dt=(0.3, 0.02, 0.05))
        F12 = geo.fundamental_from_poses(K, jnp.asarray(T1), K, jnp.asarray(T2))
        res = matching.match_epipolar(
            f1, f2, F12,
            sigma2_levels=jnp.asarray(CFG.sigma2),
            unmatched_a=f1.valid,
            unmatched_b=f2.valid,
        )
        good, tot = _precision(scene, T1, T2, f1, f2, res.idx, res.ok)
        assert tot > 30
        assert good / tot > 0.85, f"{good}/{tot}"


class TestStereo:
    def test_depth_recovery(self):
        scene = syn.make_scene(n_points=350, seed=9)
        T = np.eye(4, dtype=np.float32)
        b = syn.DEFAULT_BASELINE
        imgL, depL = syn.render(scene, T, K, HW, noise=1.0, seed=1, depth_map=True)
        imgR = syn.render(scene, T, K, HW, baseline=b, noise=1.0, seed=2)
        fL, pL = orb.extract(jnp.asarray(imgL), CFG)
        fR, pR = orb.extract(jnp.asarray(imgR), CFG)
        bf = K[0] * b
        ur, z = stereo.stereo_match(
            fL, fR, pL, pR, tuple(CFG.scales), bf, min_z=2 * b, n_levels=CFG.n_levels
        )
        z = np.asarray(z)
        xy = np.asarray(fL.xy)
        got = 0
        errs = []
        for i in np.where((z > 0) & np.asarray(fL.valid))[0]:
            x, y = int(round(xy[i, 0])), int(round(xy[i, 1]))
            gt = depL[y, x]
            if gt <= 0:
                continue
            got += 1
            errs.append(abs(z[i] - gt) / gt)
        errs = np.asarray(errs)
        assert got > 80, f"only {got} stereo depths"
        assert np.median(errs) < 0.05, f"median rel depth err {np.median(errs)}"

    def test_rgbd_uright(self):
        xy = jnp.asarray([[100.0, 50.0], [200.0, 80.0]])
        depth = jnp.asarray([2.0, -1.0])
        ur, d = stereo.depth_to_uright(xy, depth, bf=60.0)
        assert abs(float(ur[0]) - (100.0 - 30.0)) < 1e-5
        assert float(ur[1]) == -1.0
