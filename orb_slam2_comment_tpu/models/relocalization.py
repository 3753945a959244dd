"""Relocalization after tracking loss — Tracking::Relocalization
(src/Tracking.cc:1341-1502).

Pipeline per candidate keyframe from the BoW database:
  1. BoW-node-gated descriptor matching to the KF's map points
     (SearchByBoW; >=15 matches)
  2. batched PnP RANSAC for an initial pose (the EPnP role)
  3. pose_optimize; if inliers < 50, a widened projective re-search
     (SearchByProjection(F, KF, ...), src/ORBmatcher.cc:1472) and a final
     optimization; accept at >=50 inliers.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from orb_slam2_comment_tpu import constants as C
from orb_slam2_comment_tpu.models import map_state as ms
from orb_slam2_comment_tpu.models.tracking import (
    _inv_sigma2,
    _match_against_points,
    _pose_opt_from_assoc,
)
from orb_slam2_comment_tpu.ops import matching, ransac
from orb_slam2_comment_tpu.utils.config import SlamConfig


def relocalize(m: ms.MapState, db, frame, cfg: SlamConfig):
    """Try to recover the camera pose of a lost frame.

    Returns (success, Tcw, assoc)."""
    from orb_slam2_comment_tpu.ops import bow as bow_mod

    words, groups, vec = bow_mod.transform(
        db.voc, frame.feats.desc, frame.feats.valid
    )
    candidates = db.detect_reloc_candidates(vec, valid_mask=m.kf_valid, m=m)
    inv_s2 = _inv_sigma2(cfg)
    for kf in candidates:
        kf_j = jnp.asarray(kf)
        # BoW-node-gated matching (SearchByBoW). Note the node mask is not
        # just a CPU pruning: it also scopes the Lowe ratio test to
        # same-node candidates, which is what lets true matches survive on
        # repetitive scenes — keep the reference semantics.
        kf_obs = m.kf_obs[kf_j]
        kf_ok = m.kf_feat_valid[kf_j] & (kf_obs >= 0)
        res = matching.match_nodes(
            desc_a=m.kf_desc[kf_j],
            nodes_a=db.groups[kf],
            valid_a=kf_ok,
            feats_b=frame.feats,
            nodes_b=groups,
            max_dist=cfg.th_low,
            nn_ratio=0.75,
            angles_a=m.kf_angle[kf_j],
        )
        n = frame.n_feat
        assoc = jnp.full((n,), -1, jnp.int32)
        assoc = assoc.at[res.idx].set(jnp.where(res.ok, kf_obs, -1))
        assoc = jnp.where(frame.feats.valid, assoc, -1)
        if int(jnp.sum(assoc >= 0)) < 15:
            continue
        # PnP RANSAC on the putative 2D-3D matches
        pid = jnp.clip(assoc, 0, cfg.max_points - 1)
        valid = (assoc >= 0) & m.pt_valid[pid]
        pnp = ransac.pnp_ransac(
            m.pt_pos[pid],
            frame.feats.xy,
            frame.feats.octave,
            valid,
            jnp.asarray([cfg.scale_factor ** (2 * l) for l in range(cfg.n_levels)]),
            cfg.K,
        )
        if not bool(pnp.ok):
            continue
        Tcw, assoc2, n_inl = _pose_opt_from_assoc(
            m, pnp.Tcw, frame.feats, frame.uright, assoc, cfg
        )
        if int(n_inl) < 10:
            continue
        if int(n_inl) < C.RELOC_MIN_INLIERS:
            # widened projective re-search against the KF's points
            pt_ids = m.kf_obs[kf_j]
            assoc3, n3, _ = _match_against_points(
                m, pt_ids, Tcw, frame.feats, frame.uright,
                jnp.asarray(10.0), cfg, use_frustum_band=False,
            )
            merged = jnp.where(assoc2 >= 0, assoc2, assoc3)
            Tcw, assoc2, n_inl = _pose_opt_from_assoc(
                m, Tcw, frame.feats, frame.uright, merged, cfg
            )
        if int(n_inl) >= C.RELOC_MIN_INLIERS:
            return True, Tcw, assoc2
    return False, None, None
