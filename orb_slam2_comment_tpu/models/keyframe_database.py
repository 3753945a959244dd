"""Place-recognition database — the reference's KeyFrameDatabase
(src/KeyFrameDatabase.cc) over dense BoW matrices.

The reference keeps an inverted file (word -> list<KeyFrame*>). With the
dense [Kmax, W] BoW matrix this framework stores, the inverted-file
queries become matmuls:
  shared-word counts  = binarize(q) @ binarize(DB)^T
  L1 scores           = 1 - 0.5 * |q - DB|_1   (row-wise)
followed by the same candidate gating the reference applies
(>=0.8*maxCommonWords, minScore, covisibility-group accumulation,
>0.75*bestAccScore — DetectLoopCandidates, src/KeyFrameDatabase.cc:76-197).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_comment_tpu import constants as C
from orb_slam2_comment_tpu.models import map_state as ms
from orb_slam2_comment_tpu.ops import bow


@jax.jit
def _scores_kernel(db_bow, db_valid, query):
    scores = bow.l1_score(db_bow, query[None, :])
    common = jnp.sum((db_bow > 0) & (query[None, :] > 0), axis=1)
    scores = jnp.where(db_valid, scores, -1.0)
    common = jnp.where(db_valid, common, 0)
    return scores, common


@functools.partial(jax.jit, static_argnames=("kmax",))
def _sparse_scores_kernel(post_word, post_kf, post_w, db_valid,
                          q_words, q_w, kmax):
    scores, common, _ = bow.inverted_file_query(
        post_word, post_kf, post_w, q_words, q_w, kmax=kmax)
    scores = jnp.where(db_valid, scores, -1.0)
    common = jnp.where(db_valid, common, 0)
    return scores, common


# Vocabularies beyond this word count switch the database to the
# inverted-file representation (the reference's design point: its ORBvoc
# has ~1M words, src/KeyFrameDatabase.cc:33-37) — a dense [Kmax, W]
# matrix at that scale is ~4 GB per 1k keyframes.
SPARSE_W_THRESHOLD = 16384


class KeyFrameDatabase:
    """Holds per-KF BoW vectors + feature word/group tables."""

    def __init__(self, voc: bow.Vocabulary, max_kfs: int, n_feat: int):
        self.voc = voc
        self.sparse = voc.n_words > SPARSE_W_THRESHOLD
        if self.sparse:
            self.bow = None
            self.sp_word = jnp.full((max_kfs, n_feat), voc.n_words,
                                    jnp.int32)
            self.sp_w = jnp.zeros((max_kfs, n_feat), jnp.float32)
        else:
            self.bow = jnp.zeros((max_kfs, voc.n_words), jnp.float32)
        self.groups = jnp.full((max_kfs, n_feat), -1, jnp.int32)
        self.words = jnp.full((max_kfs, n_feat), -1, jnp.int32)
        self.valid = jnp.zeros(max_kfs, bool)
        self._postings = None

    def add(self, kf_id: int, desc, feat_valid):
        """Transform a keyframe's descriptors and index it (add(),
        src/KeyFrameDatabase.cc:40-47)."""
        words, groups, vec = bow.transform(self.voc, desc, feat_valid)
        if self.sparse:
            uw, ww = bow.sparse_bow(self.voc.word_weight, words)
            self.sp_word = self.sp_word.at[kf_id].set(uw)
            self.sp_w = self.sp_w.at[kf_id].set(ww)
            self._postings = None
        else:
            self.bow = self.bow.at[kf_id].set(vec)
        self.groups = self.groups.at[kf_id].set(groups)
        self.words = self.words.at[kf_id].set(words)
        self.valid = self.valid.at[kf_id].set(True)
        return vec

    def erase(self, kf_id: int):
        self.valid = self.valid.at[kf_id].set(False)
        self._postings = None

    def postings(self):
        """Lazy inverted file: rebuilt (one device sort) after DB edits."""
        if self._postings is None:
            self._postings = bow.build_postings(
                self.sp_word, self.sp_w, self.valid)
        return self._postings

    def scores_device(self, q_words_feat=None, kf_id=None):
        """(scores [Kmax], common [Kmax]) as DEVICE arrays for either a
        stored keyframe (kf_id) or per-feature word ids (q_words_feat)."""
        kmax = self.valid.shape[0]
        if self.sparse:
            if kf_id is not None:
                qw, qweight = self.sp_word[kf_id], self.sp_w[kf_id]
            else:
                qw, qweight = bow.sparse_bow(
                    self.voc.word_weight, q_words_feat)
            pw, pk, pv = self.postings()
            return _sparse_scores_kernel(
                pw, pk, pv, self.valid, qw, qweight, kmax=kmax)
        if kf_id is not None:
            query = self.bow[kf_id]
        else:
            query = bow.bow_vector(self.voc, q_words_feat)
        return _scores_kernel(self.bow, self.valid, query)

    def grow(self, new_max_kfs: int):
        """Widen to a larger KF capacity tier (see MapState.grow_map)."""
        kmax = self.valid.shape[0]
        if new_max_kfs <= kmax:
            return
        dk = new_max_kfs - kmax

        def pad(x, fill):
            return jnp.concatenate(
                [x, jnp.full((dk,) + x.shape[1:], fill, x.dtype)], axis=0)

        if self.sparse:
            self.sp_word = pad(self.sp_word, self.voc.n_words)
            self.sp_w = pad(self.sp_w, 0)
            self._postings = None
        else:
            self.bow = pad(self.bow, 0)
        self.groups = pad(self.groups, -1)
        self.words = pad(self.words, -1)
        self.valid = pad(self.valid, False)

    def _candidates(self, query_vec, exclude_mask, min_score,
                    query_words=None):
        if self.sparse:
            scores, common = self.scores_device(q_words_feat=query_words)
        else:
            scores, common = _scores_kernel(self.bow, self.valid, query_vec)
        scores = np.array(scores)
        common = np.array(common)
        scores[exclude_mask] = -1.0
        common[exclude_mask] = 0
        if common.max() == 0:
            return np.empty(0, np.int64), scores
        min_common = 0.8 * common.max()  # BOW_COMMON_WORD_RATIO
        cand = np.where((common >= min_common) & (scores >= min_score))[0]
        return cand, scores

    def detect_loop_candidates(self, m: ms.MapState, kf_id: int, min_score: float,
                               max_out: int = 8, W=None, scores_common=None,
                               kf_valid=None):
        """DetectLoopCandidates (src/KeyFrameDatabase.cc:76-197): exclude
        covisible neighbors, gate by shared words and minScore, accumulate
        scores over top-10 covisibility groups, keep > 0.75*bestAcc.

        W / scores_common are optional precomputed pulls (all-pairs
        covisibility; (scores, common) vs the whole DB) — LoopCloser
        passes them so one keyframe's full detection costs two device
        pulls total instead of one per neighbor/candidate."""
        query = None if self.sparse else self.bow[kf_id]
        # ONE all-pairs covisibility program covers the exclusion row and
        # every candidate's accumulation group (the old per-candidate
        # covisibility_weights loop paid a device round-trip per candidate)
        if W is None:
            W = np.asarray(ms.covisibility_matrix(m))
        w = W[kf_id]
        exclude = w >= C.COVIS_MIN_WEIGHT
        exclude[kf_id] = True
        # culled keyframes (KeyFrame::SetBadFlag -> mpKeyFrameDB->erase)
        exclude |= ~np.asarray(m.kf_valid if kf_valid is None else kf_valid)
        if scores_common is None:
            cand, scores = self._candidates(
                query, exclude, min_score,
                query_words=self.words[kf_id] if self.sparse else None)
        else:
            scores = np.array(scores_common[0], copy=True)
            common = np.array(scores_common[1], copy=True)
            scores[exclude] = -1.0
            common[exclude] = 0
            if common.max() == 0:
                cand = np.empty(0, np.int64)
            else:
                cand = np.where((common >= 0.8 * common.max())
                                & (scores >= min_score))[0]
        if len(cand) == 0:
            return []
        cand_set = set(int(c) for c in cand)
        acc = []
        for c in cand:
            cw = W[int(c)]
            group = list(np.argsort(-cw)[: C.BOW_COVIS_GROUP])
            group = [g for g in group if cw[g] > 0] + [int(c)]
            acc_score = sum(scores[g] for g in group if g in cand_set)
            best_in_group = max(
                (g for g in group if g in cand_set), key=lambda g: scores[g]
            )
            acc.append((acc_score, best_in_group))
        best_acc = max(a for a, _ in acc)
        keep = sorted(
            {b for a, b in acc if a > C.BOW_ACC_SCORE_RATIO * best_acc},
            key=lambda b: -scores[b],
        )
        return keep[:max_out]

    def detect_reloc_candidates(self, query_vec, max_out: int = 5,
                                valid_mask=None, m: "ms.MapState" = None,
                                query_words=None):
        """DetectRelocalizationCandidates (src/KeyFrameDatabase.cc:199-311):
        same word/score gating as the loop path but without the minScore
        floor or covisibility exclusion, then score accumulation over each
        candidate's top-10 covisibility group; keep the best KF of every
        group whose accumulated score > 0.75 * bestAccScore."""
        exclude = np.zeros(self.valid.shape[0], bool)
        if valid_mask is not None:
            exclude |= ~np.asarray(valid_mask)
        cand, scores = self._candidates(query_vec, exclude, min_score=-1.0,
                                        query_words=query_words)
        if len(cand) == 0:
            return []
        if m is None:
            # no map (pre-init): rank raw scores
            order = cand[np.argsort(-scores[cand])]
            best = scores[order[0]]
            out = [int(c) for c in order
                   if scores[c] > C.BOW_ACC_SCORE_RATIO * best]
            return out[:max_out]
        cand_set = set(int(c) for c in cand)
        W = np.asarray(ms.covisibility_matrix(m))  # one program, all rows
        acc = []
        for c in cand:
            cw = W[int(c)]
            group = list(np.argsort(-cw)[: C.BOW_COVIS_GROUP])
            group = [g for g in group if cw[g] > 0] + [int(c)]
            acc_score = sum(scores[g] for g in group if g in cand_set)
            best_in_group = max(
                (g for g in group if g in cand_set), key=lambda g: scores[g]
            )
            acc.append((acc_score, best_in_group))
        best_acc = max(a for a, _ in acc)
        keep = sorted(
            {b for a, b in acc if a > C.BOW_ACC_SCORE_RATIO * best_acc},
            key=lambda b: -scores[b],
        )
        return keep[:max_out]
