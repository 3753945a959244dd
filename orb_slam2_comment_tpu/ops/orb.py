"""Oriented multi-scale FAST + rotated binary descriptors, TPU-native.

Replaces the reference `ORBextractor` (src/ORBextractor.cc:1043-1105
pipeline: ComputePyramid -> gridded FAST -> quadtree distribution ->
IC_Angle -> Gaussian blur -> rotated 256-bit descriptors), redesigned for
XLA:

- FAST corner detection is a *dense score map*: the score of a pixel is the
  maximum threshold t for which the segment test (>=9 contiguous of 16 ring
  pixels all brighter/darker by t) still passes. One map serves both the
  reference's dual thresholds (iniThFAST=20 strict / minThFAST=7 fallback,
  src/ORBextractor.cc:784-816): ranking by score naturally prefers
  strict-threshold corners, and the acceptance floor is minTh.
- The quadtree spatial distribution (DistributeOctTree,
  src/ORBextractor.cc:539-763) becomes bucketed top-k: per 32x32 cell top-k
  after 3x3 NMS, then a global top-n_l by score. Behavior-equivalent
  spatial spreading without pointer trees; validated downstream by
  trajectory error, not per-corner identity (SURVEY.md "Hard parts").
- Orientation is the intensity-centroid angle over the radius-15 circular
  patch (IC_Angle, src/ORBextractor.cc:77-106) computed with a dense disk
  mask instead of per-row umax tables.
- The descriptor is a rotated-BRIEF: 256 pixel-pair comparisons on the
  7x7 sigma=2 blurred level image (src/ORBextractor.cc:1086-1090). The
  sampling pattern is NOT the reference's learned table; it is generated
  from a fixed-seed Gaussian (sigma = patch/5, the classic BRIEF choice)
  because descriptors here only need self-consistency — the vocabulary is
  trained on these descriptors too (the reference's ORBvoc.txt is absent
  from the mirror).

Everything is static-shape: each pyramid level yields exactly its budget
of slots, invalid slots are masked. All per-level work is traced once per
(image-shape, config).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_comment_tpu import constants as C

# FAST 9-16 ring offsets (dx, dy), standard Bresenham circle radius 3,
# ordered around the circle.
_RING = [
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
]
_ARC = 9  # contiguous ring pixels required


def _brief_pattern(
    seed: int = 42, n_bits: int = 256, clip: int = 13, min_sep: float = 5.0
) -> np.ndarray:
    """[n_bits, 4] int32 (x1, y1, x2, y2) Gaussian test pattern.

    Test endpoints are N(0, (PATCH/5)^2) clipped to +-13 so rotated offsets
    stay within the 19px border (13*sqrt2 ~ 18.4 < EDGE_THRESHOLD), with a
    minimum separation between the two points of each pair: after the 7x7
    sigma=2 pre-blur, endpoints closer than ~2 sigma compare nearly equal
    intensities and their bits flip under pixel noise (measured: enforcing
    >=5px separation drops the median true-match Hamming distance
    substantially on low-frequency texture). The reference gets the same
    effect from its offline-learned bit_pattern_31_
    (src/ORBextractor.cc:150-408), which is not copied here by design.
    """
    r = np.random.default_rng(seed)
    sigma = C.PATCH_SIZE / 5.0
    out = np.zeros((n_bits, 4), np.int32)
    n = 0
    while n < n_bits:
        p = np.clip(np.round(r.normal(0.0, sigma, size=4)), -clip, clip)
        if np.hypot(p[0] - p[2], p[1] - p[3]) >= min_sep:
            out[n] = p
            n += 1
    return out


_PATTERN = _brief_pattern()

# radius-15 disk mask and coordinate grids for IC_Angle
_R = C.HALF_PATCH_SIZE
_dy, _dx = np.mgrid[-_R:_R + 1, -_R:_R + 1]
_DISK = ((_dx * _dx + _dy * _dy) <= _R * _R).astype(np.float32)
_DISK_X = (_dx * _DISK).astype(np.float32)
_DISK_Y = (_dy * _DISK).astype(np.float32)

# 7x7 sigma=2 Gaussian (separable), matching cv::GaussianBlur(7,7,2,2)
_g = np.exp(-0.5 * (np.arange(-3, 4) / 2.0) ** 2)
_GAUSS7 = (_g / _g.sum()).astype(np.float32)


class ORBConfig(NamedTuple):
    """Static extraction config (Examples/*/ *.yaml ORBextractor.* keys)."""

    n_features: int = C.DEFAULT_N_FEATURES
    n_levels: int = C.DEFAULT_N_LEVELS
    scale_factor: float = C.DEFAULT_SCALE_FACTOR
    ini_th: float = float(C.DEFAULT_INI_TH_FAST)
    min_th: float = float(C.DEFAULT_MIN_TH_FAST)
    cell: int = 32  # spatial-distribution bucket size (px)

    @property
    def scales(self):
        return [self.scale_factor ** l for l in range(self.n_levels)]

    @property
    def sigma2(self):
        return [s * s for s in self.scales]

    def level_sizes(self, h: int, w: int):
        return [
            (max(int(round(h / s)), 64), max(int(round(w / s)), 64))
            for s in self.scales
        ]

    def level_budgets(self):
        """Geometric per-level feature budget (src/ORBextractor.cc:200-221)."""
        f = 1.0 / self.scale_factor
        n0 = self.n_features * (1 - f) / (1 - f ** self.n_levels)
        budgets = [max(int(round(n0 * f ** l)), 8) for l in range(self.n_levels)]
        budgets[-1] = max(self.n_features - sum(budgets[:-1]), 8)
        return budgets


class FrameFeatures(NamedTuple):
    """Fixed-shape per-image feature set (the reference's keypoint vectors +
    descriptor Mat, include/Frame.h keypoint/descriptor members)."""

    xy: jax.Array        # [N, 2] level-0 pixel coords (x, y)
    response: jax.Array  # [N] FAST score
    angle: jax.Array     # [N] orientation, radians
    octave: jax.Array    # [N] int32 pyramid level
    desc: jax.Array      # [N, 8] uint32 packed 256-bit descriptors
    valid: jax.Array     # [N] bool

    @property
    def n_max(self):
        return self.xy.shape[0]


def unpack_descriptors_signed(desc: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """[N, 8] uint32 -> [N, 256] +-1 (dtype) for MXU Hamming matmuls."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc[..., None] >> shifts) & jnp.uint32(1)  # [N, 8, 32]
    bits = bits.reshape(desc.shape[:-1] + (256,))
    return (2.0 * bits.astype(dtype) - 1.0).astype(dtype)


def pack_bits(bits: jax.Array) -> jax.Array:
    """[..., 256] bool -> [..., 8] uint32."""
    b = bits.reshape(bits.shape[:-1] + (8, 32)).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(b << shifts, axis=-1, dtype=jnp.uint32)


def fast_score_map(img: jax.Array) -> jax.Array:
    """Dense FAST 9-16 score: max threshold at which the pixel is a corner.

    score(p) = max over the 16 length-9 contiguous arcs of
               min over arc of (ring - center)   [bright arcs]
           or  min over arc of (center - ring)   [dark arcs]
    A pixel is a FAST corner at threshold t iff score > t — so this single
    map subsumes the reference's dual-threshold retry
    (src/ORBextractor.cc:784-816).
    """
    h, w = img.shape
    p = jnp.pad(img, 3, mode="edge")
    d = jnp.stack(
        [p[3 + dy:3 + dy + h, 3 + dx:3 + dx + w] - img for (dx, dy) in _RING]
    )  # [16, H, W] ring minus center
    dcat = jnp.concatenate([d, d[: _ARC - 1]], axis=0)  # wraparound
    m_bright = dcat[0:16]
    m_dark = -dcat[0:16]
    for j in range(1, _ARC):
        m_bright = jnp.minimum(m_bright, dcat[j:j + 16])
        m_dark = jnp.minimum(m_dark, -dcat[j:j + 16])
    return jnp.maximum(jnp.max(m_bright, axis=0), jnp.max(m_dark, axis=0))


def _nms3(score: jax.Array) -> jax.Array:
    """3x3 non-maximum suppression; keeps strict local maxima (ties broken
    towards the top-left via an epsilon index ramp)."""
    h, w = score.shape
    eps = (
        jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) * w
        + jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ) * -1e-6
    s = score + eps
    mx = jax.lax.reduce_window(
        s, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    return jnp.where(s >= mx, score, 0.0)


def _blur7(img: jax.Array) -> jax.Array:
    """Separable 7x7 sigma=2 Gaussian blur (src/ORBextractor.cc:1086)."""
    k = jnp.asarray(_GAUSS7)
    x = img[None, None]  # [1,1,H,W]
    x = jax.lax.conv_general_dilated(
        x, k.reshape(1, 1, 7, 1), (1, 1), [(3, 3), (0, 0)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    x = jax.lax.conv_general_dilated(
        x, k.reshape(1, 1, 1, 7), (1, 1), [(0, 0), (3, 3)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return x[0, 0]


def _resize_level(img: jax.Array, hw) -> jax.Array:
    return jax.image.resize(img, hw, method="linear")


def _select_keypoints(score: jax.Array, budget: int, cell: int, min_th: float):
    """Bucketed top-k spatial distribution (quadtree equivalent).

    Returns (xy [budget,2] int32 level coords, response [budget], valid).
    """
    h, w = score.shape
    ch, cw = -(-h // cell), -(-w // cell)
    pad_h, pad_w = ch * cell - h, cw * cell - w
    s = jnp.pad(score, ((0, pad_h), (0, pad_w)))
    cells = s.reshape(ch, cell, cw, cell).transpose(0, 2, 1, 3).reshape(ch * cw, cell * cell)
    n_cells = ch * cw
    k_cell = min(max(-(-3 * budget // n_cells), 1), cell * cell)
    vals, idx = jax.lax.top_k(cells, k_cell)  # [n_cells, k_cell]
    # decode level coords
    cell_row = (jnp.arange(n_cells) // cw)[:, None]
    cell_col = (jnp.arange(n_cells) % cw)[:, None]
    yy = cell_row * cell + idx // cell
    xx = cell_col * cell + idx % cell
    vals = vals.reshape(-1)
    yy, xx = yy.reshape(-1), xx.reshape(-1)
    ok = vals > min_th
    # Spread bonus: the best corner of each cell outranks all non-best
    # corners, approximating the quadtree's one-per-leaf coverage.
    is_best = (jnp.arange(n_cells * k_cell) % k_cell) == 0
    rank_key = jnp.where(ok, vals + jnp.where(is_best, 1e4, 0.0), -jnp.inf)
    top_vals, top_idx = jax.lax.top_k(rank_key, budget)
    sel_valid = jnp.isfinite(top_vals)
    sel_x = jnp.where(sel_valid, xx[top_idx], 0)
    sel_y = jnp.where(sel_valid, yy[top_idx], 0)
    sel_resp = jnp.where(sel_valid, vals[top_idx], 0.0)
    return jnp.stack([sel_x, sel_y], axis=-1).astype(jnp.int32), sel_resp, sel_valid


def _ic_angle(img: jax.Array, xy: jax.Array) -> jax.Array:
    """Intensity-centroid orientation (src/ORBextractor.cc:77-106).

    xy: [N,2] int level coords. Border must already be respected.
    """
    h, w = img.shape
    x = jnp.clip(xy[:, 0], _R, w - 1 - _R)
    y = jnp.clip(xy[:, 1], _R, h - 1 - _R)
    yy = y[:, None, None] + jnp.asarray(_dy)[None]
    xx = x[:, None, None] + jnp.asarray(_dx)[None]
    patch = img[yy, xx]  # [N, 31, 31]
    m10 = jnp.sum(patch * jnp.asarray(_DISK_X), axis=(1, 2))
    m01 = jnp.sum(patch * jnp.asarray(_DISK_Y), axis=(1, 2))
    return jnp.arctan2(m01, m10)


def _descriptors(blurred: jax.Array, xy: jax.Array, angle: jax.Array) -> jax.Array:
    """Rotated binary test pattern on the blurred level image.

    Returns [N, 8] uint32 packed descriptors
    (computeOrbDescriptor, src/ORBextractor.cc:108-148).
    """
    h, w = blurred.shape
    pat = jnp.asarray(_PATTERN, jnp.float32)  # [256, 4]
    ca, sa = jnp.cos(angle), jnp.sin(angle)  # [N]

    def rot(px, py):
        rx = jnp.round(ca[:, None] * px[None] - sa[:, None] * py[None]).astype(jnp.int32)
        ry = jnp.round(sa[:, None] * px[None] + ca[:, None] * py[None]).astype(jnp.int32)
        return rx, ry

    r1x, r1y = rot(pat[:, 0], pat[:, 1])
    r2x, r2y = rot(pat[:, 2], pat[:, 3])
    x0, y0 = xy[:, 0][:, None], xy[:, 1][:, None]
    gx1 = jnp.clip(x0 + r1x, 0, w - 1)
    gy1 = jnp.clip(y0 + r1y, 0, h - 1)
    gx2 = jnp.clip(x0 + r2x, 0, w - 1)
    gy2 = jnp.clip(y0 + r2y, 0, h - 1)
    i1 = blurred[gy1, gx1]  # [N, 256]
    i2 = blurred[gy2, gx2]
    return pack_bits(i1 < i2)


@functools.partial(jax.jit, static_argnames=("cfg", "shape"))
def _extract_impl(image: jax.Array, cfg: ORBConfig, shape):
    h, w = shape
    sizes = cfg.level_sizes(h, w)
    budgets = cfg.level_budgets()
    margin = C.EDGE_THRESHOLD

    out = []
    pyramid = []
    level_img = image
    for lvl in range(cfg.n_levels):
        if lvl > 0:
            level_img = _resize_level(level_img, sizes[lvl])
        pyramid.append(level_img)
        lh, lw = sizes[lvl]
        score = fast_score_map(level_img)
        # mask borders so patches/descriptors stay in-bounds
        ys = jax.lax.broadcasted_iota(jnp.int32, (lh, lw), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (lh, lw), 1)
        inb = (ys >= margin) & (ys < lh - margin) & (xs >= margin) & (xs < lw - margin)
        score = jnp.where(inb, score, 0.0)
        score = _nms3(score)
        xy_l, resp, valid = _select_keypoints(score, budgets[lvl], cfg.cell, cfg.min_th)
        ang = _ic_angle(level_img, xy_l)
        desc = _descriptors(_blur7(level_img), xy_l, ang)
        scale = cfg.scales[lvl]
        xy0 = xy_l.astype(jnp.float32) * scale
        out.append(
            (
                xy0,
                resp,
                ang,
                jnp.full((budgets[lvl],), lvl, jnp.int32),
                desc,
                valid,
            )
        )

    feats = FrameFeatures(
        xy=jnp.concatenate([o[0] for o in out]),
        response=jnp.concatenate([o[1] for o in out]),
        angle=jnp.concatenate([o[2] for o in out]),
        octave=jnp.concatenate([o[3] for o in out]),
        desc=jnp.concatenate([o[4] for o in out]),
        valid=jnp.concatenate([o[5] for o in out]),
    )
    return feats, pyramid


def extract(image: jax.Array, cfg: ORBConfig):
    """Extract features from a [H, W] float32 grayscale image (0..255).

    Returns (FrameFeatures, pyramid list of per-level images). The pyramid
    is consumed by stereo SAD refinement (ops.stereo), mirroring the
    reference's mvImagePyramid reuse in Frame::ComputeStereoMatches
    (src/Frame.cc:540-560).
    """
    return _extract_impl(image.astype(jnp.float32), cfg, image.shape)
