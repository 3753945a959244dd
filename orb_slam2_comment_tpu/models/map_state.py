"""Struct-of-arrays map state — the reference's shared-pointer map as
fixed-capacity device arrays.

Replaces the L2 data model of the reference (Frame/KeyFrame/MapPoint/Map,
SURVEY.md §1): instead of heap objects under fine-grained mutexes
(KeyFrame.h:232-234, Map.h:62), the map is one immutable pytree of padded
arrays. Updates are functional (`.at[].set`) inside jitted kernels; the
host orchestrator owns the authoritative reference and swaps it — the
single-writer equivalent of the reference's Map::mMutexMapUpdate.

"Deletion" (MapPoint::SetBadFlag / KeyFrame::SetBadFlag) is a cleared
validity bit; capacity is static (SlamConfig.max_keyframes/max_points).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam2_comment_tpu import constants as C


class MapState(NamedTuple):
    # --- keyframes (capacity Kmax, feature slots N) ----------------------
    kf_pose: jax.Array       # [Kmax, 4, 4] Tcw
    kf_valid: jax.Array      # [Kmax] bool
    kf_frame_id: jax.Array   # [Kmax] int32 source frame id
    kf_timestamp: jax.Array  # [Kmax] f32
    kf_xy: jax.Array         # [Kmax, N, 2] keypoint pixels (undistorted)
    kf_octave: jax.Array     # [Kmax, N] int32
    kf_angle: jax.Array      # [Kmax, N] f32
    kf_uright: jax.Array     # [Kmax, N] f32 (-1 = mono)
    kf_depth: jax.Array      # [Kmax, N] f32 (-1 = none)
    kf_desc: jax.Array       # [Kmax, N, 8] uint32
    kf_feat_valid: jax.Array  # [Kmax, N] bool
    kf_obs: jax.Array        # [Kmax, N] int32 point id or -1
    kf_group: jax.Array      # [Kmax, N] int32 BoW FeatureVector node id
                             # (-1 = none/not yet indexed; an all -1 row
                             # disables node gating for that KF)
    kf_parent: jax.Array     # [Kmax] int32 spanning-tree parent (-1 = root)
    kf_Tcp: jax.Array        # [Kmax, 4, 4] pose relative to parent, frozen at
                             # cull time (KeyFrame::mTcp, src/KeyFrame.cc:540;
                             # identity while the KF is alive)
    # --- map points (capacity Pmax) ---------------------------------------
    pt_pos: jax.Array        # [Pmax, 3]
    pt_valid: jax.Array      # [Pmax] bool
    pt_desc: jax.Array       # [Pmax, 8] uint32 representative descriptor
    pt_normal: jax.Array     # [Pmax, 3] mean viewing direction
    pt_min_dist: jax.Array   # [Pmax] scale-invariance band
    pt_max_dist: jax.Array   # [Pmax]
    pt_ref_kf: jax.Array     # [Pmax] int32
    pt_first_kf: jax.Array   # [Pmax] int32 (culling window anchor)
    pt_visible: jax.Array    # [Pmax] int32 tracking 'visible' counter
    pt_found: jax.Array      # [Pmax] int32 tracking 'found' counter


def empty_map(max_kfs: int, max_pts: int, n_feat: int) -> MapState:
    return MapState(
        kf_pose=jnp.tile(jnp.eye(4), (max_kfs, 1, 1)),
        kf_valid=jnp.zeros(max_kfs, bool),
        kf_frame_id=jnp.full(max_kfs, -1, jnp.int32),
        kf_timestamp=jnp.zeros(max_kfs, jnp.float32),
        kf_xy=jnp.zeros((max_kfs, n_feat, 2), jnp.float32),
        kf_octave=jnp.zeros((max_kfs, n_feat), jnp.int32),
        kf_angle=jnp.zeros((max_kfs, n_feat), jnp.float32),
        kf_uright=jnp.full((max_kfs, n_feat), -1.0, jnp.float32),
        kf_depth=jnp.full((max_kfs, n_feat), -1.0, jnp.float32),
        kf_desc=jnp.zeros((max_kfs, n_feat, 8), jnp.uint32),
        kf_feat_valid=jnp.zeros((max_kfs, n_feat), bool),
        kf_obs=jnp.full((max_kfs, n_feat), -1, jnp.int32),
        kf_group=jnp.full((max_kfs, n_feat), -1, jnp.int32),
        kf_parent=jnp.full(max_kfs, -1, jnp.int32),
        kf_Tcp=jnp.tile(jnp.eye(4), (max_kfs, 1, 1)),
        pt_pos=jnp.zeros((max_pts, 3), jnp.float32),
        pt_valid=jnp.zeros(max_pts, bool),
        pt_desc=jnp.zeros((max_pts, 8), jnp.uint32),
        pt_normal=jnp.zeros((max_pts, 3), jnp.float32),
        pt_min_dist=jnp.zeros(max_pts, jnp.float32),
        pt_max_dist=jnp.full(max_pts, 1e9, jnp.float32),
        pt_ref_kf=jnp.full(max_pts, -1, jnp.int32),
        pt_first_kf=jnp.full(max_pts, -1, jnp.int32),
        pt_visible=jnp.zeros(max_pts, jnp.int32),
        pt_found=jnp.zeros(max_pts, jnp.int32),
    )


@jax.jit
def covisibility_weights(m: MapState, k: jax.Array) -> jax.Array:
    """Shared-observation counts between keyframe k and every other KF
    (KeyFrame::UpdateConnections counting pass, src/KeyFrame.cc:289-330)."""
    obs_k = m.kf_obs[k]                       # [N]
    pmax = m.pt_pos.shape[0]
    in_k = jnp.zeros(pmax, bool).at[jnp.clip(obs_k, 0, pmax - 1)].set(obs_k >= 0)
    in_k = in_k & m.pt_valid
    shared = in_k[jnp.clip(m.kf_obs, 0, pmax - 1)] & (m.kf_obs >= 0)  # [Kmax, N]
    w = jnp.sum(shared, axis=1).astype(jnp.int32)
    w = jnp.where(m.kf_valid, w, 0)
    return w.at[k].set(0)


@jax.jit
def point_observation_counts(m: MapState) -> jax.Array:
    """[Pmax] observation count per point; a stereo observation counts as 2,
    matching MapPoint::AddObservation (src/MapPoint.cc:98-110: nObs += 2
    when mvuRight >= 0)."""
    pmax = m.pt_pos.shape[0]
    flat = m.kf_obs.reshape(-1)
    ok = (flat >= 0) & m.kf_valid.repeat(m.kf_obs.shape[1])
    wgt = jnp.where(m.kf_uright.reshape(-1) >= 0, 2, 1)
    return jnp.zeros(pmax, jnp.int32).at[jnp.clip(flat, 0, pmax - 1)].add(
        jnp.where(ok, wgt, 0).astype(jnp.int32)
    )


@jax.jit
def update_point_stats(m: MapState) -> MapState:
    """Refresh normals and scale bands for all valid points from their
    current observations — batched MapPoint::UpdateNormalAndDepth
    (src/MapPoint.cc:330-371). Representative descriptors are refreshed
    separately by local_mapping.update_point_descriptors (the min-median
    ComputeDistinctiveDescriptors equivalent, src/MapPoint.cc:242-307).
    """
    Kmax, N = m.kf_obs.shape
    pmax = m.pt_pos.shape[0]
    flat_pt = m.kf_obs.reshape(-1)
    valid_obs = (flat_pt >= 0) & m.kf_valid.repeat(N) & m.kf_feat_valid.reshape(-1)
    pt_idx = jnp.clip(flat_pt, 0, pmax - 1)

    # --- normals: mean of unit vectors from camera centers to point -------
    # camera center in world = -R^T t
    Rt = m.kf_pose[:, :3, :3].transpose(0, 2, 1)
    cam_centers = -jnp.einsum("kij,kj->ki", Rt, m.kf_pose[:, :3, 3])
    centers_per_obs = jnp.repeat(cam_centers, N, axis=0)     # [Kmax*N, 3]
    vec = m.pt_pos[pt_idx] - centers_per_obs
    dist = jnp.linalg.norm(vec, axis=-1, keepdims=True)
    unit = vec / jnp.maximum(dist, 1e-9)
    nsum = jnp.zeros((pmax, 3)).at[pt_idx].add(jnp.where(valid_obs[:, None], unit, 0.0))
    cnt = jnp.zeros(pmax).at[pt_idx].add(valid_obs.astype(jnp.float32))
    normal = nsum / jnp.maximum(cnt[:, None], 1.0)

    # --- scale band from the reference KF observation ---------------------
    ref = jnp.clip(m.pt_ref_kf, 0, Kmax - 1)
    ref_center = cam_centers[ref]
    ref_dist = jnp.linalg.norm(m.pt_pos - ref_center, axis=-1)
    # octave of the observation in the ref KF: find feature index via kf_obs
    # (approximation: use level 0 band scaled by max factor — refined below)
    # locate this point's slot in its ref KF
    pids = jnp.arange(pmax)
    slot_match = m.kf_obs[ref] == pids[:, None]             # [Pmax, N]
    slot = jnp.argmax(slot_match, axis=1)
    has_slot = jnp.any(slot_match, axis=1)
    octv = jnp.where(has_slot, m.kf_octave[ref, slot], 0)
    scale = 1.2 ** octv.astype(jnp.float32)
    max_dist = ref_dist * scale
    n_levels = 8.0
    min_dist = max_dist / (1.2 ** (n_levels - 1.0))

    return m._replace(
        pt_normal=jnp.where(m.pt_valid[:, None], normal, m.pt_normal),
        pt_max_dist=jnp.where(m.pt_valid & has_slot, max_dist * 1.2, m.pt_max_dist),
        pt_min_dist=jnp.where(m.pt_valid & has_slot, min_dist / 1.2, m.pt_min_dist),
    )


def predict_scale(dist, max_dist, scale_factor: float, n_levels: int):
    """Scale level prediction from distance (MapPoint::PredictScale,
    src/MapPoint.cc:385-417)."""
    ratio = jnp.maximum(max_dist / jnp.maximum(dist, 1e-9), 1e-9)
    lvl = jnp.ceil(jnp.log(ratio) / jnp.log(scale_factor)).astype(jnp.int32)
    return jnp.clip(lvl, 0, n_levels - 1)
