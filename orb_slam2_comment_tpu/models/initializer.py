"""Monocular map bootstrap — Tracking::MonocularInitialization +
CreateInitialMapMonocular (src/Tracking.cc:563-737).

Keeps a reference frame with >=100 features; each new frame is matched
with a 100px window search; on >=100 matches the batched two-view solver
(ops.twoview) runs; on success the initial map is built: two keyframes,
the triangulated points, a 20-iteration global BA, and median-depth scale
normalization.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from orb_slam2_comment_tpu import constants as C
from orb_slam2_comment_tpu.models import map_state as ms
from orb_slam2_comment_tpu.models.frame import Frame
from orb_slam2_comment_tpu.ops import geometry as geo
from orb_slam2_comment_tpu.ops import matching, optim, twoview
from orb_slam2_comment_tpu.utils.config import SlamConfig


class MonocularInitializer:
    def __init__(self, cfg: SlamConfig):
        self.cfg = cfg
        self.ref: Optional[Frame] = None

    def reset(self):
        self.ref = None

    def try_initialize(self, tracker, frame: Frame) -> bool:
        """Returns True when the initial two-keyframe map was created."""
        cfg = self.cfg
        n_valid = int(jnp.sum(frame.feats.valid))
        if self.ref is None:
            if n_valid > 100:
                self.ref = frame
                # last matched position per ref feature — the reference's
                # mvbPrevMatched (Tracking.cc:597-598): the window search
                # tracks features FRAME TO FRAME, so the reference frame
                # can persist while the baseline grows
                self.prev_xy = self.ref.feats.xy
            return False
        if n_valid <= 100:
            self.ref = None
            return False

        # window search around each ref feature's LAST matched position
        # (SearchForInitialization semantics, src/ORBmatcher.cc:405-520 +
        # mvbPrevMatched update Tracking.cc:625-630). The reference drops
        # its initializer only when matching fails — NOT on age: capping
        # the pair separation capped the baseline and accepted ~1-degree
        # parallax geometry (49deg translation-direction error, r5).
        ref_feats = self.ref.feats._replace(xy=self.prev_xy)
        res = matching.match_window(ref_feats, frame.feats, max_dist=cfg.th_low)
        ok_np = np.asarray(res.ok)
        idx_np = np.asarray(res.idx)
        n_matches = int(ok_np.sum())
        # the reference demands 100 matches AT ITS DOUBLED init budget of
        # 2*nFeatures=2000 (Tracking.cc:117,612); with a single fixed
        # budget the equivalent coverage gate scales with it (100 matches
        # out of 2000 candidates = 5%)
        min_matches = max(40, cfg.n_features // 20)
        if n_matches < min_matches:
            # (Tracking.cc:600-607: below the floor -> drop the reference)
            self.ref = None
            return False
        # advance the tracked positions of matched features
        cur_xy = np.asarray(frame.feats.xy)
        prev = np.asarray(self.prev_xy).copy()
        prev[ok_np] = cur_xy[idx_np[ok_np]]
        self.prev_xy = jnp.asarray(prev)

        # correspondences ref->cur
        xy1 = self.ref.feats.xy
        xy2 = frame.feats.xy[res.idx]
        tv = twoview.two_view_init(xy1, xy2, res.ok, cfg.K)
        if not bool(tv.ok):
            return False

        # ---- create the initial map (CreateInitialMapMonocular) --------
        good = np.asarray(tv.good)
        X = np.asarray(tv.X)
        # median-depth scale normalization (Tracking.cc:686-712)
        med_depth = float(np.median(X[good][:, 2]))
        if med_depth <= 0:
            return False
        inv_med = 1.0 / med_depth
        X = X * inv_med
        T1 = np.eye(4, dtype=np.float32)
        T2 = np.eye(4, dtype=np.float32)
        T2[:3, :3] = np.asarray(tv.R21)
        T2[:3, 3] = np.asarray(tv.t21) * inv_med

        m = tracker.map
        nf = frame.n_feat
        pmax = self.cfg.max_points

        # insert both keyframes with their feature tables
        def insert_kf(m, slot, f: Frame, T, obs_row):
            return m._replace(
                kf_pose=m.kf_pose.at[slot].set(jnp.asarray(T)),
                kf_valid=m.kf_valid.at[slot].set(True),
                kf_frame_id=m.kf_frame_id.at[slot].set(f.frame_id),
                kf_timestamp=m.kf_timestamp.at[slot].set(f.timestamp),
                kf_xy=m.kf_xy.at[slot].set(f.feats.xy),
                kf_octave=m.kf_octave.at[slot].set(f.feats.octave),
                kf_angle=m.kf_angle.at[slot].set(f.feats.angle),
                kf_uright=m.kf_uright.at[slot].set(f.uright),
                kf_depth=m.kf_depth.at[slot].set(f.depth),
                kf_desc=m.kf_desc.at[slot].set(f.feats.desc),
                kf_feat_valid=m.kf_feat_valid.at[slot].set(f.feats.valid),
                kf_obs=m.kf_obs.at[slot].set(jnp.asarray(obs_row)),
                kf_parent=m.kf_parent.at[slot].set(0 if slot else -1),
            )

        # point slots: one per good match
        good_idx = np.where(good)[0]
        n_new = len(good_idx)
        ids = np.arange(n_new)
        obs0 = np.full(self.ref.n_feat, -1, np.int32)
        obs1 = np.full(nf, -1, np.int32)
        obs0[good_idx] = ids
        idx2 = np.asarray(res.idx)
        obs1[idx2[good_idx]] = ids

        desc0 = np.asarray(self.ref.feats.desc)
        oct0 = np.asarray(self.ref.feats.octave)
        Xn = X[good_idx]
        dist = np.linalg.norm(Xn, axis=1)
        lvl = oct0[good_idx].astype(np.float32)
        max_dist = dist * cfg.scale_factor ** lvl
        min_dist = max_dist / cfg.scale_factor ** (cfg.n_levels - 1)

        def pad(a, fill=0.0):
            out = np.full((pmax,) + a.shape[1:], fill, a.dtype)
            out[:n_new] = a
            return out

        m = m._replace(
            pt_pos=jnp.asarray(pad(Xn.astype(np.float32))),
            pt_valid=jnp.asarray(pad(np.ones(n_new, bool), False)),
            pt_desc=jnp.asarray(pad(desc0[good_idx])),
            pt_normal=jnp.asarray(
                pad((Xn / np.maximum(dist[:, None], 1e-9)).astype(np.float32))
            ),
            pt_min_dist=jnp.asarray(pad(min_dist.astype(np.float32))),
            pt_max_dist=jnp.asarray(pad(max_dist.astype(np.float32), 1e9)),
            pt_ref_kf=jnp.asarray(pad(np.zeros(n_new, np.int32), -1)),
            pt_first_kf=jnp.asarray(pad(np.zeros(n_new, np.int32), -1)),
            pt_visible=jnp.asarray(pad(np.ones(n_new, np.int32))),
            pt_found=jnp.asarray(pad(np.ones(n_new, np.int32))),
        )
        m = insert_kf(m, 0, self.ref, T1, obs0)
        m = insert_kf(m, 1, frame, T2, obs1)

        # 20-iteration global BA on the 2-KF map (Tracking.cc:686)
        inv_s2 = jnp.asarray(
            [1.0 / (cfg.scale_factor ** (2 * l)) for l in range(cfg.n_levels)]
        )
        NC = 2
        N = nf
        uvr0 = jnp.concatenate(
            [m.kf_xy[0], m.kf_uright[0][:, None]], axis=-1
        )
        uvr1 = jnp.concatenate(
            [m.kf_xy[1], m.kf_uright[1][:, None]], axis=-1
        )
        prob = optim.BAProblem(
            cam_T=m.kf_pose[:2],
            cam_fixed=jnp.asarray([True, False]),
            cam_valid=jnp.ones(2, bool),
            pts=m.pt_pos[: max(n_new, 8)],
            pt_valid=m.pt_valid[: max(n_new, 8)],
            obs_cam=jnp.repeat(jnp.arange(2, dtype=jnp.int32), N),
            obs_pt=jnp.clip(
                jnp.concatenate([m.kf_obs[0], m.kf_obs[1]]), 0, max(n_new, 8) - 1
            ),
            obs_uvr=jnp.concatenate([uvr0, uvr1]),
            obs_oct=jnp.concatenate([m.kf_octave[0], m.kf_octave[1]]),
            obs_stereo=jnp.zeros(2 * N, bool),
            obs_valid=jnp.concatenate([m.kf_obs[0] >= 0, m.kf_obs[1] >= 0]),
        )
        res_ba = optim.global_bundle_adjustment(
            prob, inv_s2, cfg.K, cfg.bf, iters=C.INIT_GBA_ITERS
        )
        m = m._replace(
            kf_pose=m.kf_pose.at[1].set(res_ba.cam_T[1]),
            pt_pos=m.pt_pos.at[: max(n_new, 8)].set(res_ba.pts),
        )

        tracker.map = m
        tracker.n_kfs = 2
        tracker.n_pts = n_new
        tracker.ref_kf = 1
        tracker.last_kf_frame_id = frame.frame_id
        frame.Tcw = m.kf_pose[1]
        frame.assoc = jnp.asarray(obs1)
        tracker.last_Tcw = np.asarray(m.kf_pose[1])
        tracker.last_frame = frame
        for cb in tracker.new_kf_callbacks:
            cb(0)
            cb(1)
        return n_new >= C.INIT_MIN_TRIANGULATED
