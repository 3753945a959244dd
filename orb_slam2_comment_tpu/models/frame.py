"""Per-image frame construction (the reference's Frame value type,
src/Frame.cc:61-228: ORB extraction, undistortion, stereo/RGB-D depth).

The reference extracts L/R features on two std::threads (Frame.cc:78-81);
here both extractions are independent jitted calls that XLA can overlap,
and the rest of frame construction is one fused program.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_comment_tpu.ops import orb, stereo
from orb_slam2_comment_tpu.ops.geometry import project
from orb_slam2_comment_tpu.utils.config import MONOCULAR, RGBD, STEREO, SlamConfig


@dataclass
class Frame:
    """One tracked frame. `assoc` maps feature slot -> map point id (-1)."""

    frame_id: int
    timestamp: float
    feats: orb.FrameFeatures
    uright: jax.Array          # [N] f32, -1 where mono/no match
    depth: jax.Array           # [N] f32, -1 where unknown
    Tcw: Optional[jax.Array] = None     # [4,4] estimated pose
    assoc: Optional[jax.Array] = None   # [N] int32 map point ids
    pyramid: Optional[list] = None      # per-level images (for viz/SAD)

    @property
    def n_feat(self):
        return self.feats.xy.shape[0]


def undistort_points(xy: jax.Array, cfg: SlamConfig) -> jax.Array:
    """Iterative inversion of the radial-tangential distortion model —
    same model cv::undistortPoints solves (Frame::UndistortKeyPoints,
    src/Frame.cc:404-464). No-op when all coefficients are zero."""
    if not cfg.has_distortion:
        return xy
    fx, fy, cx, cy = cfg.K
    x = (xy[:, 0] - cx) / fx
    y = (xy[:, 1] - cy) / fy
    x0, y0 = x, y

    def body(_, xy_):
        x_, y_ = xy_
        r2 = x_ * x_ + y_ * y_
        radial = 1.0 + r2 * (cfg.k1 + r2 * (cfg.k2 + r2 * cfg.k3))
        dx = 2 * cfg.p1 * x_ * y_ + cfg.p2 * (r2 + 2 * x_ * x_)
        dy = cfg.p1 * (r2 + 2 * y_ * y_) + 2 * cfg.p2 * x_ * y_
        return ((x0 - dx) / radial, (y0 - dy) / radial)

    x, y = jax.lax.fori_loop(0, 10, body, (x, y))
    return jnp.stack([x * fx + cx, y * fy + cy], axis=-1)


def build_frame_stereo(
    frame_id: int,
    timestamp: float,
    image_left: np.ndarray,
    image_right: np.ndarray,
    cfg: SlamConfig,
) -> Frame:
    feats_l, pyr_l = orb.extract(jnp.asarray(image_left), cfg.orb)
    feats_r, pyr_r = orb.extract(jnp.asarray(image_right), cfg.orb)
    uright, depth = stereo.stereo_match(
        feats_l,
        feats_r,
        pyr_l,
        pyr_r,
        tuple(cfg.orb.scales),
        cfg.bf,
        min_z=cfg.baseline,
        n_levels=cfg.n_levels,
        th_stereo=min(75.0 * cfg.match_th_scale, 100.0),
    )
    feats_l = feats_l._replace(xy=undistort_points(feats_l.xy, cfg))
    return Frame(frame_id, timestamp, feats_l, uright, depth, pyramid=pyr_l)


def build_frame_rgbd(
    frame_id: int,
    timestamp: float,
    image: np.ndarray,
    depth_map: np.ndarray,
    cfg: SlamConfig,
) -> Frame:
    feats, pyr = orb.extract(jnp.asarray(image), cfg.orb)
    d = stereo.sample_depth_at(jnp.asarray(depth_map), feats.xy).astype(jnp.float32)
    if cfg.depth_map_factor != 1.0:
        d = d / cfg.depth_map_factor
    uright, depth = stereo.depth_to_uright(feats.xy, d, cfg.bf)
    feats = feats._replace(xy=undistort_points(feats.xy, cfg))
    return Frame(frame_id, timestamp, feats, uright, depth, pyramid=pyr)


def build_frame_mono(
    frame_id: int,
    timestamp: float,
    image: np.ndarray,
    cfg: SlamConfig,
    double_features: bool = False,
) -> Frame:
    """Monocular frame; during initialization the reference extracts 2x
    features (Tracking.cc:243-247, mpIniORBextractor)."""
    ocfg = cfg.orb
    if double_features:
        ocfg = ocfg._replace(n_features=2 * ocfg.n_features)
    feats, pyr = orb.extract(jnp.asarray(image), ocfg)
    n = feats.xy.shape[0]
    feats = feats._replace(xy=undistort_points(feats.xy, cfg))
    return Frame(
        frame_id,
        timestamp,
        feats,
        uright=jnp.full((n,), -1.0),
        depth=jnp.full((n,), -1.0),
        pyramid=pyr,
    )
