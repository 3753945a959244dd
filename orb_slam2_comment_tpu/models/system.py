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
        # chunked+fused: the LocalMapping pass runs as per-frame device
        # chunks inside the frame program (tracking._frame_step_core /
        # local_mapping.mapper_machine_step) — the host callback would
        # double-map every keyframe. The monolithic host callback remains
        # the staged-mode / chunked_mapper=False path.
        if not (cfg.chunked_mapper and cfg.fused_tracking):
            self.tracker.new_kf_callbacks.append(self.mapper.process)

        if vocabulary is None and vocabulary_path:
            if vocabulary_path.endswith(".txt"):
                vocabulary = bow_mod.load_orb_vocab(vocabulary_path)
            else:
                vocabulary = bow_mod.load_vocabulary(vocabulary_path)
        if vocabulary is None and vocabulary_path is None:
            # packaged offline vocabulary (tools/train_our_vocab.py) — the
            # System ctor's ORBVocabulary::loadFromTextFile equivalent
            # (src/System.cc:64-65); fall back to first-KF bootstrap when
            # the asset is absent
            import os

            asset = os.path.join(os.path.dirname(__file__), "..",
                                 "assets", "voc_synth.npz")
            if os.path.exists(asset):
                vocabulary = bow_mod.load_vocabulary(asset)
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
        self.tracker.grow_callbacks.append(self._on_grow)
        # point-arena compaction invalidates every point id held outside
        # the map; the background GBA snapshot is the only such holder
        # (mirrors mbStopGBA aborting on map interference,
        # src/LoopClosing.cc:410-423)
        self.tracker.compact_callbacks.append(self._on_compact)

        self.frame_id = 0
        self._loops_closed_prev = 0  # across resets
        self.n_resets = 0
        self._last_seen_big_change = 0

    # -- vocabulary / database wiring --------------------------------------
    def _init_db(self):
        self.db = KeyFrameDatabase(
            self.voc, self.cfg.max_keyframes, self.tracker._n_slots()
        )
        if self._loop_enabled:
            self.loop_closer = LoopCloser(self.cfg, self.tracker, self.db)
        self.tracker.reloc_fn = self._relocalize
        self._gate_active = self.voc.group_depth == self.cfg.voc_levels
        if self._gate_active:
            self.tracker.set_vocabulary_gate(self.voc)
        else:
            # frame-side group ids descend cfg.voc_levels levels; they must
            # key the same tree depth as the DB's stored KF groups or the
            # node gate would silently reject everything — leave the gate
            # as the no-op dummy instead
            print(f"[system] vocabulary group_depth={self.voc.group_depth} "
                  f"!= cfg.voc_levels={self.cfg.voc_levels}; "
                  "BoW tracking gate disabled")

    def _on_compact(self):
        if self.loop_closer is not None:
            self.loop_closer.abort_background()

    def _on_grow(self, new_cfg: SlamConfig):
        """Capacity-tier growth (Tracker._maybe_grow): propagate the new
        cfg — capacities ride in it as static jit args — to every
        component, and widen the KF database."""
        self.cfg = new_cfg
        self.mapper.cfg = new_cfg
        if self.loop_closer is not None:
            self.loop_closer.cfg = new_cfg
        if self.db is not None:
            self.db.grow(new_cfg.max_keyframes)

    def _maybe_bootstrap_vocab(self, kf_id: int):
        if self.voc is not None:
            return
        m = self.tracker.map
        desc = np.asarray(m.kf_desc[kf_id])
        valid = np.asarray(m.kf_feat_valid[kf_id])
        self.voc = bow_mod.train_vocabulary(desc[valid], k=8, depth=3, seed=0)
        self._init_db()

    @property
    def n_loops(self):
        """Loops closed so far (detection is asynchronous, so closures
        land during pump_background — count from the closer itself)."""
        n = self._loops_closed_prev
        if self.loop_closer is not None:
            n += self.loop_closer.n_loops_closed
        return n

    def _on_new_kf(self, kf_id: int):
        if self.db is None or self.loop_closer is None:
            # nobody will harvest a detection for this KF: release the
            # creation-time SetNotErase hold immediately
            self.tracker.set_kf_erasable(kf_id)
        if self.db is None:
            return
        m = self.tracker.map
        self.db.add(kf_id, m.kf_desc[kf_id], m.kf_feat_valid[kf_id])
        # m.kf_group feeds ONLY the tracking node gate (_match_ref_kf), so
        # it must key the same tree as the gate's frame_groups: backfill
        # only when the gate is active (device-created KFs in chunked mode
        # already carry identical rows — the overwrite is a no-op; this
        # fills host-path KFs). Loop closing / reloc use db.groups.
        if getattr(self, "_gate_active", False):
            self.tracker.set_kf_groups(kf_id, self.db.groups[kf_id])
        if self.loop_closer is not None:
            self.loop_closer.process(kf_id)

    def _relocalize(self, frame):
        if self.db is None:
            return False, None, None
        if not hasattr(self, "_adaptive_reloc"):
            from orb_slam2_comment_tpu.models.relocalization import (
                AdaptiveRelocalizer,
            )

            self._adaptive_reloc = AdaptiveRelocalizer()
        return self._adaptive_reloc(
            self.tracker.map, self.db, frame, self.cfg)

    def _maybe_auto_reset(self):
        """Lost soon after initialization with <=5 KFs in the map: the map
        is unusable, start over (Tracking::Track, src/Tracking.cc:472-480)."""
        t = self.tracker
        if (
            t.state == LOST
            and 0 < t.n_kfs <= 5
            and not self.cfg.localization_only
        ):
            print("Track lost soon after initialisation, resetting...")
            self.reset()

    # -- per-frame entry points (System.cc:116-265) -------------------------
    def _pump_background(self):
        # advance any in-flight chunked GBA by one bounded device program
        # (the reference's concurrent GBA thread, LoopClosing.cc:575-579)
        if self.loop_closer is not None:
            self.loop_closer.pump_background()

    def track_stereo(self, image_left, image_right, timestamp):
        assert self.cfg.sensor == STEREO
        self._maybe_auto_reset()
        out = self.tracker.track_stereo_arrays(
            self.frame_id, timestamp, image_left, image_right
        )
        self._pump_background()
        self.frame_id += 1
        return out

    def track_rgbd(self, image, depth_map, timestamp):
        assert self.cfg.sensor == RGBD
        self._maybe_auto_reset()
        # KF_PROF wraps the single production path (no duplicate dispatch
        # sequence; profiled runs measure shipped behavior)
        import os
        import time as _t
        prof = os.environ.get("KF_PROF", "") not in ("", "0")
        t0 = _t.perf_counter() if prof else 0.0
        out = self.tracker.track_rgbd_arrays(
            self.frame_id, timestamp, image, depth_map
        )
        t1 = _t.perf_counter() if prof else 0.0
        self._pump_background()
        if prof:
            t2 = _t.perf_counter()
            if t2 - t0 > 0.05:
                print(f"# frame_prof fid={self.frame_id} "
                      f"track={(t1-t0)*1e3:.1f}ms pump={(t2-t1)*1e3:.1f}ms",
                      flush=True)
        self.frame_id += 1
        return out

    def track_monocular(self, image, timestamp):
        assert self.cfg.sensor == MONOCULAR
        # Note: the reference extracts 2x features while NOT_INITIALIZED
        # (Tracking.cc:243-247). The fixed-shape map keeps one budget for
        # every frame instead; raise n_features in the config if the
        # initializer needs more texture.
        self._maybe_auto_reset()
        out = self.tracker.track_mono_arrays(self.frame_id, timestamp, image)
        self._pump_background()
        self.frame_id += 1
        return out

    @property
    def trajectory(self):
        """Per-frame (timestamp, Tcr, ref_kf, state) records, resolved up
        to the async pipeline's lag; flush via tracker before saving."""
        return self.tracker.trajectory

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
        self.n_resets += 1
        if self.loop_closer is not None:
            self._loops_closed_prev += self.loop_closer.n_loops_closed
            self.loop_closer.abort_background()
        self.tracker._flush_all()
        self.tracker._io_pool.shutdown(wait=False)  # stop the old pull pool
        self.tracker = Tracker(cfg)
        self.mapper = LocalMapper(cfg, self.tracker)
        # same guard as __init__: under chunked+fused the mapper machine
        # runs inside the frame program; the host callback would
        # double-map every keyframe after a reset.
        if not (cfg.chunked_mapper and cfg.fused_tracking):
            self.tracker.new_kf_callbacks.append(self.mapper.process)
        if self.voc is not None:
            self._init_db()
        self.tracker.new_kf_callbacks.append(self._on_new_kf)
        self.tracker.grow_callbacks.append(self._on_grow)
        self.tracker.compact_callbacks.append(self._on_compact)

    def shutdown(self):
        """Drain the async tracking pipeline and any in-flight background
        GBA (the analogue of the reference's thread-join barrier,
        System::Shutdown, src/System.cc:301-320: spins on isFinished &&
        !isRunningGBA)."""
        self.tracker._flush_all()
        if self.loop_closer is not None:
            self.loop_closer.finish_background()
        self.tracker._flush_all()

    # -- state queries (System.cc:282-299, 474-491) --------------------------
    def get_tracking_state(self):
        return self.tracker.state

    def get_tracked_map_points(self):
        t = self.tracker
        t._flush_all()
        if t.ds is not None:
            a = np.asarray(t.ds.last_assoc)
        elif t.last_frame is not None and t.last_frame.assoc is not None:
            a = np.asarray(t.last_frame.assoc)
        else:
            return np.empty(0, np.int64)
        return a[a >= 0]

    def get_tracked_keypoints(self):
        """Undistorted keypoints of the last frame that carry a map-point
        association (System::GetTrackedKeyPointsUn, src/System.cc:484-491)."""
        t = self.tracker
        t._flush_all()
        if t.last_frame is None:
            return np.empty((0, 2), np.float32)
        a = np.asarray(t.last_frame.assoc)
        xy = np.asarray(t.last_frame.feats.xy)
        return xy[a >= 0]

    def map_changed(self):
        """Latched big-change poll (System::MapChanged, src/System.cc:282-293
        + Map::InformNewBigChange): True once per loop correction / global
        BA / reset since the previous call."""
        idx = self._big_change_idx()
        if idx > self._last_seen_big_change:
            self._last_seen_big_change = idx
            return True
        return False

    def _big_change_idx(self):
        return self.n_resets + self.n_loops

    # -- trajectory savers (System.cc:322-472) -------------------------------
    def _frame_poses(self):
        self.tracker._flush_all()
        if self.loop_closer is not None:
            self.loop_closer.finish_background()
        m = self.tracker.map
        kf_pose = np.asarray(m.kf_pose)
        kf_valid = np.asarray(m.kf_valid)
        kf_parent = np.asarray(m.kf_parent)
        kf_Tcp = np.asarray(m.kf_Tcp)
        out = []
        for ts, Tcr, ref, state in self.trajectory:
            if state != OK or ref < 0:
                continue
            # walk the spanning tree through culled reference keyframes
            # (System::SaveTrajectoryTUM bad-KF walk, src/System.cc:350-360)
            Trw = np.eye(4)
            while ref >= 0 and not kf_valid[ref]:
                Trw = Trw @ kf_Tcp[ref]
                ref = kf_parent[ref]
            if ref < 0:
                continue
            out.append((ts, Tcr @ Trw @ kf_pose[ref]))
        return out

    def save_trajectory_tum(self, path):
        fp = self._frame_poses()
        traj.save_tum(path, [t for t, _ in fp], [T for _, T in fp])

    def save_trajectory_kitti(self, path):
        fp = self._frame_poses()
        traj.save_kitti(path, [T for _, T in fp])

    def save_keyframe_trajectory_tum(self, path):
        self.tracker._flush_all()
        if self.loop_closer is not None:
            self.loop_closer.finish_background()
        m = self.tracker.map
        valid = np.asarray(m.kf_valid)
        # host-side float64 timestamps (the on-device copy is f32, which
        # quantizes TUM epoch stamps to ~128s)
        ts = self.tracker.kf_ts_host
        poses = np.asarray(m.kf_pose)
        idx = np.where(valid)[0]
        traj.save_tum(path, ts[idx].tolist(), [poses[i] for i in idx])

    # -- map save/load (real, unlike the reference's TODO) -------------------
    def save_map(self, path):
        self.tracker._flush_all()
        if self.loop_closer is not None:
            self.loop_closer.finish_background()
        m = self.tracker.map
        extra = {}
        if self.loop_closer is not None and self.loop_closer.loop_edges:
            le = self.loop_closer.loop_edges
            extra["loop_edge_ids"] = np.asarray(
                [(a, b) for a, b, _ in le], np.int32
            )
            extra["loop_edge_S"] = np.stack([S for _, _, S in le])
        np.savez_compressed(
            path,
            **{f: np.asarray(getattr(m, f)) for f in m._fields},
            n_kfs=self.tracker.n_kfs,
            n_pts=self.tracker.n_pts,
            **extra,
        )

    def load_map(self, path):
        z = np.load(path)
        empty = ms.empty_map(self.cfg.max_keyframes, self.cfg.max_points,
                             self.tracker._n_slots())
        m = ms.MapState(**{
            f: jnp.asarray(z[f]) if f in z else getattr(empty, f)
            for f in ms.MapState._fields
        })
        self.tracker.map = m
        self.tracker.n_kfs = int(z["n_kfs"])
        self.tracker.n_pts = int(z["n_pts"])
        if self.loop_closer is not None and "loop_edge_ids" in z:
            self.loop_closer.loop_edges = [
                (int(a), int(b), S)
                for (a, b), S in zip(z["loop_edge_ids"], z["loop_edge_S"])
            ]
        # re-index the database (+ BoW node-gate groups)
        if self.db is not None:
            for k in range(self.tracker.n_kfs):
                self.db.add(k, m.kf_desc[k], m.kf_feat_valid[k])
                self.tracker.set_kf_groups(k, self.db.groups[k])
        self.tracker.state = LOST if self.tracker.n_kfs else -1
        self.tracker.ref_kf = max(self.tracker.n_kfs - 1, -1)
