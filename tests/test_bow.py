"""Vocabulary training / transform / scoring tests."""

import jax.numpy as jnp
import numpy as np

from orb_slam2_comment_tpu.ops import bow, orb
from orb_slam2_comment_tpu.utils import synthetic as syn


def _corpus(n_imgs=4, seed=0):
    scene = syn.make_scene(n_points=800, seed=seed)
    cfg = orb.ORBConfig(n_features=500, n_levels=3)
    descs = []
    feats_list = []
    for i in range(n_imgs):
        # yaw + translate so late frames view genuinely different content
        # (with true 3D markers, pure small translations keep the visible
        # marker set nearly identical and near/far scores converge)
        yaw = 0.45 * i
        cz, sz = np.cos(yaw), np.sin(yaw)
        Rwc = np.array([[cz, 0, sz], [0, 1, 0], [-sz, 0, cz]], np.float32)
        twc = np.array([1.0 * i, 0.0, 0.3 * i], np.float32)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = Rwc.T
        T[:3, 3] = -Rwc.T @ twc
        img = syn.render(scene, T, syn.DEFAULT_K, syn.DEFAULT_HW, seed=10 + i)
        f, _ = orb.extract(jnp.asarray(img), cfg)
        v = np.asarray(f.valid)
        descs.append(np.asarray(f.desc)[v])
        feats_list.append(f)
    return np.concatenate(descs), feats_list


class TestVocabulary:
    def test_train_and_transform(self):
        corpus, feats = _corpus()
        voc = bow.train_vocabulary(corpus, k=8, depth=3, seed=0)
        assert voc.n_words > 50
        f = feats[0]
        words, group, vec = bow.transform(voc, f.desc, f.valid)
        words = np.asarray(words)
        v = np.asarray(f.valid)
        assert (words[v] >= 0).all()
        assert (words[~v] == -1).all()
        # BoW vector is L1-normalized
        assert abs(float(jnp.sum(jnp.abs(vec))) - 1.0) < 1e-4

    def test_same_image_high_score(self):
        corpus, feats = _corpus()
        voc = bow.train_vocabulary(corpus, k=8, depth=3, seed=0)
        vecs = [bow.transform(voc, f.desc, f.valid)[2] for f in feats]
        self_score = float(bow.l1_score(vecs[0], vecs[0]))
        near_score = float(bow.l1_score(vecs[0], vecs[1]))  # overlapping view
        far_score = float(bow.l1_score(vecs[0], vecs[3]))
        assert self_score > 0.999
        assert near_score > far_score, (near_score, far_score)

    def test_save_load_roundtrip(self, tmp_path):
        corpus, feats = _corpus(n_imgs=2)
        voc = bow.train_vocabulary(corpus, k=5, depth=2, seed=1)
        p = str(tmp_path / "voc.npz")
        bow.save_vocabulary(p, voc)
        voc2 = bow.load_vocabulary(p)
        f = feats[0]
        w1, g1, v1 = bow.transform(voc, f.desc, f.valid)
        w2, g2, v2 = bow.transform(voc2, f.desc, f.valid)
        np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2))

    def test_pack_consistency(self):
        """numpy and device bit orders must agree."""
        r = np.random.default_rng(0)
        desc = r.integers(0, 2**32, (5, 8), dtype=np.uint32)
        nb = bow.np_unpack_bits(desc)
        db = np.asarray(orb.unpack_descriptors_signed(jnp.asarray(desc), jnp.float32))
        np.testing.assert_array_equal(nb, (db > 0).astype(np.uint8))
        np.testing.assert_array_equal(bow.np_pack_bits(nb), desc)

    def test_group_ids_shared_for_similar_descriptors(self):
        corpus, feats = _corpus(n_imgs=2)
        voc = bow.train_vocabulary(corpus, k=8, depth=3, seed=0)
        f = feats[0]
        words, group, _ = bow.transform(voc, f.desc, f.valid)
        # identical descriptors must land in identical words/groups
        words2, group2, _ = bow.transform(voc, f.desc, f.valid)
        np.testing.assert_array_equal(np.asarray(words), np.asarray(words2))
        g = np.asarray(group)[np.asarray(f.valid)]
        # groups should be a coarser partition than words
        assert len(np.unique(g)) <= voc.n_words

    def test_group_ids_matches_transform_groups(self):
        """bow.group_ids (the tracking node gate's 2-level descent) must
        agree with transform()'s FeatureVector groups when the vocabulary's
        group_depth equals the descent depth."""
        corpus, feats = _corpus(n_imgs=2)
        voc = bow.train_vocabulary(corpus, k=6, depth=3, levels_up=1, seed=0)
        assert voc.group_depth == 2
        f = feats[0]
        _, g_transform, _ = bow.transform(voc, f.desc, f.valid)
        ch, signed = bow.gate_arrays(voc)
        g_gate = bow.group_ids(ch, signed, f.desc, f.valid, levels=2)
        np.testing.assert_array_equal(np.asarray(g_transform), np.asarray(g_gate))

    def test_dummy_gate_is_noop_partition(self):
        """Without a vocabulary the gate tree is 1 node: every valid
        feature lands in group 0 (node mask == all-true)."""
        r = np.random.default_rng(3)
        desc = jnp.asarray(r.integers(0, 2**32, (32, 8), dtype=np.uint32))
        valid = jnp.asarray(np.arange(32) < 30)
        ch, signed = bow.gate_arrays(None)
        g = np.asarray(bow.group_ids(ch, signed, desc, valid, levels=2))
        assert (g[:30] == 0).all() and (g[30:] == -1).all()

    def test_shipped_vocabulary_asset(self):
        """The packaged offline vocabulary (tools/train_our_vocab.py) loads
        and has the documented shape (k=10, depth=4, groups at depth 2)."""
        import os
        asset = os.path.join(os.path.dirname(bow.__file__), "..",
                             "assets", "voc_synth.npz")
        if not os.path.exists(asset):
            import pytest
            pytest.skip("vocabulary asset not built")
        voc = bow.load_vocabulary(asset)
        assert voc.k == 10 and voc.depth == 4 and voc.group_depth == 2
        assert voc.n_words > 5000
        corpus, feats = _corpus(n_imgs=1)
        f = feats[0]
        words, groups, vec = bow.transform(voc, f.desc, f.valid)
        w = np.asarray(words)[np.asarray(f.valid)]
        assert (w >= 0).all()
        # a real vocabulary spreads descriptors over many words
        assert len(np.unique(w)) > len(w) * 0.3


class TestSparseInvertedFile:
    """Sparse BoW + inverted file (the >16k-word KeyFrameDatabase mode)
    must reproduce the dense path's L1 scores and shared-word counts."""

    def test_matches_dense_scores(self):
        import jax.numpy as jnp
        import numpy as np
        from orb_slam2_comment_tpu.ops import bow

        r = np.random.default_rng(0)
        W, N, K = 3000, 120, 12
        weight = jnp.asarray(r.uniform(0.2, 1.0, W).astype(np.float32))
        kf_words, kf_w, dense = [], [], []
        for k in range(K):
            words = np.where(r.random(N) < 0.9,
                             r.integers(0, W, N), -1).astype(np.int32)
            uw, ww = bow.sparse_bow(weight, jnp.asarray(words))
            kf_words.append(uw)
            kf_w.append(ww)
            dense.append(bow._bow_vector_impl(weight, jnp.asarray(words)))
        kf_words = jnp.stack(kf_words)
        kf_w = jnp.stack(kf_w)
        dense = jnp.stack(dense)
        valid = jnp.asarray(r.random(K) < 0.8)

        pw, pk, pv = bow.build_postings(kf_words, kf_w, valid)
        q_words = np.where(r.random(N) < 0.9,
                           r.integers(0, W, N), -1).astype(np.int32)
        qu, qw = bow.sparse_bow(weight, jnp.asarray(q_words))
        qd = bow._bow_vector_impl(weight, jnp.asarray(q_words))
        scores, common, dropped = bow.inverted_file_query(
            pw, pk, pv, qu, qw, kmax=K)
        assert int(dropped) == 0
        ref_scores = np.asarray(bow.l1_score(dense, qd[None, :]))
        ref_common = np.asarray(
            jnp.sum((dense > 0) & (qd[None, :] > 0), axis=1))
        v = np.asarray(valid)
        np.testing.assert_allclose(
            np.asarray(scores)[v], ref_scores[v], atol=1e-5)
        np.testing.assert_array_equal(
            np.asarray(common)[v], ref_common[v])
        assert (np.asarray(scores)[~v] == 0).all()
