"""Public API facade — the reference's System class (include/System.h:49-177).

Wires Tracking + LocalMapping + LoopClosing + KeyFrameDatabase, exposes
the per-frame Track* entry points, mode switches, reset, trajectory
savers, state queries, and (unlike the reference, whose SaveMap/LoadMap
are a TODO at System.h:115-117) real map save/load.

The reference boots three pthreads (src/System.cc:84-103); here the
stages run synchronously per frame/keyframe — the pipeline-parallel
scheduler is a planned layer on top (SURVEY.md §2c).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from orb_slam2_comment_tpu.models import frame as fr
from orb_slam2_comment_tpu.models import map_state as ms
from orb_slam2_comment_tpu.models.keyframe_database import KeyFrameDatabase
from orb_slam2_comment_tpu.models.local_mapping import LocalMapper
from orb_slam2_comment_tpu.models.loop_closing import LoopCloser
from orb_slam2_comment_tpu.models.relocalization import relocalize
from orb_slam2_comment_tpu.models.tracking import LOST, OK, Tracker
from orb_slam2_comment_tpu.ops import bow as bow_mod
from orb_slam2_comment_tpu.utils import trajectory as traj
from orb_slam2_comment_tpu.utils.config import MONOCULAR, RGBD, STEREO, SlamConfig


class System:
    def __init__(
        self,
        cfg: SlamConfig,
        vocabulary: Optional[bow_mod.Vocabulary] = None,
        vocabulary_path: Optional[str] = None,
        enable_loop_closing: Optional[bool] = None,
    ):
        self.cfg = cfg
        self.tracker = Tracker(cfg)
        self.mapper = LocalMapper(cfg, self.tracker)
        self.tracker.new_kf_callbacks.append(self.mapper.process)

        if vocabulary is None and vocabulary_path:
            if vocabulary_path.endswith(".txt"):
                vocabulary = bow_mod.load_orb_vocab(vocabulary_path)
            else:
                vocabulary = bow_mod.load_vocabulary(vocabulary_path)
        self.voc = vocabulary
        self.db: Optional[KeyFrameDatabase] = None
        self.loop_closer: Optional[LoopCloser] = None
        self._loop_enabled = (
            cfg.enable_loop_closing
            if enable_loop_closing is None
            else enable_loop_closing
        )
        if self.voc is not None:
            self._init_db()
        else:
            # bootstrap vocabulary from the first keyframe's descriptors
            self.tracker.new_kf_callbacks.append(self._maybe_bootstrap_vocab)
        self.tracker.new_kf_callbacks.append(self._on_new_kf)

        self.frame_id = 0
        self.trajectory = []  # (timestamp, Tcr, ref_kf, state)
        self.n_loops = 0

    # -- vocabulary / database wiring --------------------------------------
    def _init_db(self):
        self.db = KeyFrameDatabase(
            self.voc, self.cfg.max_keyframes, self.tracker._n_slots()
        )
        if self._loop_enabled:
            self.loop_closer = LoopCloser(self.cfg, self.tracker, self.db)
        self.tracker.reloc_fn = self._relocalize

    def _maybe_bootstrap_vocab(self, kf_id: int):
        if self.voc is not None:
            return
        m = self.tracker.map
        desc = np.asarray(m.kf_desc[kf_id])
        valid = np.asarray(m.kf_feat_valid[kf_id])
        self.voc = bow_mod.train_vocabulary(desc[valid], k=8, depth=3, seed=0)
        self._init_db()

    def _on_new_kf(self, kf_id: int):
        if self.db is None:
            return
        m = self.tracker.map
        self.db.add(kf_id, m.kf_desc[kf_id], m.kf_feat_valid[kf_id])
        if self.loop_closer is not None:
            if self.loop_closer.process(kf_id):
                self.n_loops += 1

    def _relocalize(self, frame):
        if self.db is None:
            return False, None, None
        return relocalize(self.tracker.map, self.db, frame, self.cfg)

    # -- per-frame entry points (System.cc:116-265) -------------------------
    def track_stereo(self, image_left, image_right, timestamp):
        assert self.cfg.sensor == STEREO
        f = fr.build_frame_stereo(
            self.frame_id, timestamp, image_left, image_right, self.cfg
        )
        return self._track(f, timestamp)

    def track_rgbd(self, image, depth_map, timestamp):
        assert self.cfg.sensor == RGBD
        f = fr.build_frame_rgbd(
            self.frame_id, timestamp, image, depth_map, self.cfg
        )
        return self._track(f, timestamp)

    def track_monocular(self, image, timestamp):
        assert self.cfg.sensor == MONOCULAR
        # Note: the reference extracts 2x features while NOT_INITIALIZED
        # (Tracking.cc:243-247). The fixed-shape map keeps one budget for
        # every frame instead; raise n_features in the config if the
        # initializer needs more texture.
        f = fr.build_frame_mono(self.frame_id, timestamp, image, self.cfg)
        return self._track(f, timestamp)

    def _track(self, f, timestamp):
        out = self.tracker.track(f)
        self.frame_id += 1
        # per-frame relative pose record for trajectory recovery
        # (Tracking.cc:488-504)
        if out.Tcw is not None and out.relative_to_kf is not None:
            self.trajectory.append(
                (timestamp, out.relative_to_kf, out.ref_kf, out.state)
            )
        elif out.Tcw is not None:
            self.trajectory.append((timestamp, np.eye(4), out.ref_kf, out.state))
        return out

    # -- mode switches (System.cc:268-299) ----------------------------------
    def activate_localization_mode(self):
        import dataclasses

        self.cfg = dataclasses.replace(self.cfg, localization_only=True)
        self.tracker.cfg = self.cfg

    def deactivate_localization_mode(self):
        import dataclasses

        self.cfg = dataclasses.replace(self.cfg, localization_only=False)
        self.tracker.cfg = self.cfg

    def reset(self):
        """Full reset (System::Reset + Tracking::Reset,
        src/Tracking.cc:1504-1550): clears the map, the database, and the
        tracking state."""
        cfg = self.cfg
        self.tracker = Tracker(cfg)
        self.mapper = LocalMapper(cfg, self.tracker)
        self.tracker.new_kf_callbacks.append(self.mapper.process)
        if self.voc is not None:
            self._init_db()
        self.tracker.new_kf_callbacks.append(self._on_new_kf)
        self.trajectory = []

    def shutdown(self):
        """No threads to join in the synchronous pipeline; kept for API
        parity (System::Shutdown, src/System.cc:301-320)."""

    # -- state queries (System.cc:282-299, 474-491) --------------------------
    def get_tracking_state(self):
        return self.tracker.state

    def get_tracked_map_points(self):
        lf = self.tracker.last_frame
        if lf is None or lf.assoc is None:
            return np.empty(0, np.int64)
        a = np.asarray(lf.assoc)
        return a[a >= 0]

    def map_changed(self):
        return self.n_loops > 0

    # -- trajectory savers (System.cc:322-472) -------------------------------
    def _frame_poses(self):
        m = self.tracker.map
        kf_pose = np.asarray(m.kf_pose)
        out = []
        for ts, Tcr, ref, state in self.trajectory:
            if state != OK or ref < 0:
                continue
            out.append((ts, Tcr @ kf_pose[ref]))
        return out

    def save_trajectory_tum(self, path):
        fp = self._frame_poses()
        traj.save_tum(path, [t for t, _ in fp], [T for _, T in fp])

    def save_trajectory_kitti(self, path):
        fp = self._frame_poses()
        traj.save_kitti(path, [T for _, T in fp])

    def save_keyframe_trajectory_tum(self, path):
        m = self.tracker.map
        valid = np.asarray(m.kf_valid)
        ts = np.asarray(m.kf_timestamp)
        poses = np.asarray(m.kf_pose)
        idx = np.where(valid)[0]
        traj.save_tum(path, ts[idx].tolist(), [poses[i] for i in idx])

    # -- map save/load (real, unlike the reference's TODO) -------------------
    def save_map(self, path):
        m = self.tracker.map
        np.savez_compressed(
            path,
            **{f: np.asarray(getattr(m, f)) for f in m._fields},
            n_kfs=self.tracker.n_kfs,
            n_pts=self.tracker.n_pts,
        )

    def load_map(self, path):
        z = np.load(path)
        m = ms.MapState(**{f: jnp.asarray(z[f]) for f in ms.MapState._fields})
        self.tracker.map = m
        self.tracker.n_kfs = int(z["n_kfs"])
        self.tracker.n_pts = int(z["n_pts"])
        # re-index the database
        if self.db is not None:
            for k in range(self.tracker.n_kfs):
                self.db.add(k, m.kf_desc[k], m.kf_feat_valid[k])
        self.tracker.state = LOST if self.tracker.n_kfs else -1
        self.tracker.ref_kf = max(self.tracker.n_kfs - 1, -1)
