"""ORB extraction kernel tests on synthetic corner-rich scenes."""

import jax.numpy as jnp
import numpy as np

from orb_slam2_comment_tpu.ops import orb
from orb_slam2_comment_tpu.utils import synthetic as syn


def _frame(seed=0, n_points=400, pose=None):
    scene = syn.make_scene(n_points=n_points, seed=seed)
    Tcw = np.eye(4, dtype=np.float32) if pose is None else pose
    img = syn.render(scene, Tcw, syn.DEFAULT_K, syn.DEFAULT_HW, noise=1.0)
    return scene, img


CFG = orb.ORBConfig(n_features=500, n_levels=4)


class TestFastScore:
    def test_flat_image_no_corners(self):
        img = jnp.full((64, 64), 100.0)
        s = orb.fast_score_map(img)
        assert float(s.max()) <= 0.0 + 1e-6

    def test_bright_dot_is_corner(self):
        img = np.full((64, 64), 100.0, np.float32)
        img[32, 32] = 200.0
        s = orb.fast_score_map(jnp.asarray(img))
        assert float(s[32, 32]) > 20.0

    def test_square_corner_detected(self):
        img = np.full((64, 64), 100.0, np.float32)
        img[20:40, 20:40] = 200.0
        s = np.asarray(orb.fast_score_map(jnp.asarray(img)))
        # corners of the square should score high, edge midpoints low
        assert s[20, 20] > 20.0
        assert s[20, 30] <= 7.0  # straight edge: not a corner


class TestExtract:
    def test_finds_features(self):
        _, img = _frame()
        feats, pyr = orb.extract(jnp.asarray(img), CFG)
        n = int(feats.valid.sum())
        assert n > 200, f"only {n} features"
        assert len(pyr) == CFG.n_levels
        # all valid features in bounds
        xy = np.asarray(feats.xy)[np.asarray(feats.valid)]
        assert xy[:, 0].min() >= 0 and xy[:, 0].max() < 640
        assert xy[:, 1].min() >= 0 and xy[:, 1].max() < 480

    def test_deterministic(self):
        _, img = _frame(seed=3)
        f1, _ = orb.extract(jnp.asarray(img), CFG)
        f2, _ = orb.extract(jnp.asarray(img), CFG)
        np.testing.assert_array_equal(np.asarray(f1.desc), np.asarray(f2.desc))
        np.testing.assert_array_equal(np.asarray(f1.xy), np.asarray(f2.xy))

    def test_descriptors_distinct(self):
        _, img = _frame(seed=4)
        feats, _ = orb.extract(jnp.asarray(img), CFG)
        v = np.asarray(feats.valid)
        d = np.asarray(feats.desc)[v]
        # unpack and check bit diversity: descriptors shouldn't be constant
        bits = np.unpackbits(d.view(np.uint8), axis=1)
        frac = bits.mean()
        assert 0.2 < frac < 0.8

    def test_pack_unpack_roundtrip(self):
        r = np.random.default_rng(0)
        bits = r.random((10, 256)) < 0.5
        packed = orb.pack_bits(jnp.asarray(bits))
        signed = np.asarray(orb.unpack_descriptors_signed(packed, jnp.float32))
        np.testing.assert_array_equal(signed > 0, bits)

    def test_matching_across_views(self):
        """Descriptors of the same landmark in two nearby views should match."""
        scene = syn.make_scene(n_points=350, seed=5)
        T1 = np.eye(4, dtype=np.float32)
        T2 = np.eye(4, dtype=np.float32)
        T2[:3, 3] = [0.05, 0.0, 0.1]  # small translation
        img1 = syn.render(scene, T1, syn.DEFAULT_K, syn.DEFAULT_HW, noise=1.0, seed=1)
        img2 = syn.render(scene, T2, syn.DEFAULT_K, syn.DEFAULT_HW, noise=1.0, seed=2)
        f1, _ = orb.extract(jnp.asarray(img1), CFG)
        f2, _ = orb.extract(jnp.asarray(img2), CFG)
        s1 = orb.unpack_descriptors_signed(f1.desc, jnp.float32)
        s2 = orb.unpack_descriptors_signed(f2.desc, jnp.float32)
        # hamming = (256 - s1 @ s2.T) / 2
        ham = np.array((256.0 - s1 @ s2.T) / 2.0)
        v1, v2 = np.asarray(f1.valid), np.asarray(f2.valid)
        ham[~v1] = 999
        ham[:, ~v2] = 999
        best = ham.min(axis=1)
        j = ham.argmin(axis=1)
        good = (best < 50) & v1
        assert good.sum() > 60, f"only {good.sum()} putative matches"
        # verify geometrically: matched keypoints should correspond to the
        # same 3D location (project f1 kp into view2 via ground truth depth)
        # use nearest scene point as the landmark identity
        xy1 = np.asarray(f1.xy)
        xy2 = np.asarray(f2.xy)
        fx, fy, cx, cy = syn.DEFAULT_K
        Xc1 = scene.points  # T1 = I
        u1 = fx * Xc1[:, 0] / Xc1[:, 2] + cx
        vv1 = fy * Xc1[:, 1] / Xc1[:, 2] + cy
        Xc2 = scene.points @ T2[:3, :3].T + T2[:3, 3]
        u2 = fx * Xc2[:, 0] / Xc2[:, 2] + cx
        vv2 = fy * Xc2[:, 1] / Xc2[:, 2] + cy
        ok = 0
        tot = 0
        for i in np.where(good)[0]:
            # landmark nearest to kp in view 1
            d1 = (u1 - xy1[i, 0]) ** 2 + (vv1 - xy1[i, 1]) ** 2
            lm = d1.argmin()
            if d1[lm] > 36:
                continue
            tot += 1
            # where that landmark falls in view 2 vs matched kp
            dx = u2[lm] - xy2[j[i], 0]
            dy = vv2[lm] - xy2[j[i], 1]
            # 10px gate: landmark identity is the marker CENTER but matched
            # features are marker corners, legitimately ~5-8px off-center;
            # wrong-marker matches land >= a marker spacing (~20px) away
            if dx * dx + dy * dy < 100:
                ok += 1
        assert tot > 40
        assert ok / tot > 0.8, f"match precision {ok}/{tot}"

    def test_orientation_semantics(self):
        """IC angle points toward the intensity centroid."""
        img = np.full((64, 64), 100.0, np.float32)
        img[30:35, 36:45] = 250.0  # bright mass to the +x side of (32,32)
        a = float(orb._ic_angle(jnp.asarray(img), jnp.asarray([[32, 32]]))[0])
        assert abs(a) < 0.5, a
        img2 = np.full((64, 64), 100.0, np.float32)
        img2[36:45, 30:35] = 250.0  # bright mass below (+y in image coords)
        a2 = float(orb._ic_angle(jnp.asarray(img2), jnp.asarray([[32, 32]]))[0])
        assert abs(a2 - np.pi / 2) < 0.5, a2

    def test_descriptor_rotation_invariance(self):
        """The same textured blob rotated 90deg should produce a close
        descriptor for the keypoint at its center (steered pattern)."""
        r = np.random.default_rng(7)
        img = np.full((128, 128), 128.0, np.float32)
        img[56:73, 56:73] = r.uniform(0, 255, (17, 17)).astype(np.float32)
        imgr = np.rot90(img, k=1).copy()
        cfg = orb.ORBConfig(n_features=64, n_levels=1)
        f1, _ = orb.extract(jnp.asarray(img), cfg)
        f2, _ = orb.extract(jnp.asarray(imgr), cfg)
        v1, v2 = np.asarray(f1.valid), np.asarray(f2.valid)
        xy1, xy2 = np.asarray(f1.xy), np.asarray(f2.xy)
        # keypoint nearest the blob center (64,64) in both
        i = np.where(v1)[0][np.argmin(((xy1[v1] - 64) ** 2).sum(1))]
        jj = np.where(v2)[0][np.argmin(((xy2[v2] - 64) ** 2).sum(1))]
        s1 = np.asarray(orb.unpack_descriptors_signed(f1.desc, jnp.float32))[i]
        s2 = np.asarray(orb.unpack_descriptors_signed(f2.desc, jnp.float32))[jj]
        ham = (256 - float(s1 @ s2)) / 2
        assert ham < 80, f"rotated-self hamming {ham}"


class TestFastNmsPallas:
    def test_matches_jnp_reference(self):
        """The fused Pallas FAST+NMS kernel (interpret mode on CPU) must
        reproduce the jnp path bit-for-bit: same score map after border
        mask and 3x3 NMS."""
        import jax
        import jax.numpy as jnp

        from orb_slam2_comment_tpu import constants as C
        from orb_slam2_comment_tpu.ops import orb

        r = np.random.default_rng(0)
        for h, w in [(480, 640), (134, 178), (96, 128)]:
            img = jnp.asarray(
                r.integers(0, 255, (h, w)).astype(np.float32)
            )
            ref = orb.fast_score_map(img)
            ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
            xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
            m = C.EDGE_THRESHOLD
            inb = (ys >= m) & (ys < h - m) & (xs >= m) & (xs < w - m)
            ref = orb._nms3(jnp.where(inb, ref, 0.0))
            got = orb.fast_nms_pallas(img, interpret=True)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=0, atol=1e-5,
                err_msg=f"shape {(h, w)}",
            )


class TestGatherPatchesPallas:
    def test_matches_dynamic_slice(self):
        """The pipelined-DMA patch gather must produce exactly the blocks
        the XLA dynamic_slice path produces."""
        import jax
        import jax.numpy as jnp

        from orb_slam2_comment_tpu.ops import orb

        r = np.random.default_rng(1)
        L, Hp, Wp = 4, 160, 640
        padded = jnp.asarray(r.normal(size=(L, Hp, Wp)).astype(np.float32))
        n = 37  # deliberately not a multiple of the chunk size
        # keep y0_aligned+56 and x0_aligned+256 in bounds, as the caller's
        # over-padded pyramid stack guarantees
        lyx = np.stack(
            [
                r.integers(0, L, n),
                r.integers(0, Hp - orb._GATHER_BH, n),
                r.integers(0, Wp - orb._GATHER_BW, n),
            ],
            axis=1,
        ).astype(np.int32)
        got = orb.gather_patches_pallas(
            padded, jnp.asarray(lyx), interpret=True
        )
        def one(l, y, x):
            return jax.lax.dynamic_slice(
                padded, (l, y, x), (1, orb._PATCH_HP, orb._GATHER_BW)
            )[0]
        ref = jax.vmap(one)(
            jnp.asarray(lyx[:, 0]), jnp.asarray(lyx[:, 1]), jnp.asarray(lyx[:, 2])
        )
        # the patch content (first 48x48) must match exactly; beyond 175
        # columns the barrel shifter may wrap, which callers never read
        np.testing.assert_array_equal(
            np.asarray(got)[:, :, :orb._PATCH_WX],
            np.asarray(ref)[:, :, :orb._PATCH_WX],
        )
