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

# radius-15 disk for IC_Angle: per-row half-width (the reference's umax
# table, src/ORBextractor.cc:410-470, in closed form)
_R = C.HALF_PATCH_SIZE
_DISK_W = [int(math.floor(math.sqrt(_R * _R - dy * dy))) for dy in range(_R + 1)]

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


# ---------------------------------------------------------------------------
# fused FAST + border mask + NMS as a Pallas TPU kernel
#
# The jnp path (fast_score_map -> mask -> _nms3) materializes the [16, H, W]
# ring stack and its running minima in HBM — ~25 full-image HBM passes per
# level. The Pallas kernel keeps the whole working set of a row tile in
# VMEM: one HBM read of the tile (+halo) and one write of the result.
#
# Halo handling: the same image is passed three times with block index
# maps (i-1, i, i+1, edge-clamped); the kernel assembles a [TILE+8, W]
# strip. At the first/last tile the assembled halo rows are wrong, but
# every affected output row lies inside the EDGE_THRESHOLD=19 border the
# kernel masks to zero anyway — same for the column wraparound introduced
# by pltpu.roll lane shifts (|dx| <= 3 < 19).
# ---------------------------------------------------------------------------

_FAST_TILE = 48


def _fast_nms_kernel(h: int, w: int, tile: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def lroll(x, dx):
        """Shift columns so out[:, j] = x[:, j + dx] (pltpu.roll wants a
        non-negative shift; wraparound lands in the masked border)."""
        return pltpu.roll(x, shift=(-dx) % x.shape[1], axis=1)

    def kernel(prev_ref, cur_ref, next_ref, out_ref):
        i = pl.program_id(0)
        strip = jnp.concatenate(
            [prev_ref[tile - 4:], cur_ref[:], next_ref[:4]], axis=0
        )  # [tile+8, W]; strip row r = image row i*tile - 4 + r
        th2 = tile + 2
        c = strip[3:3 + th2]  # centers for score rows i*tile-1 .. i*tile+tile
        ds = []
        for dx, dy in _RING:
            sh = lroll(strip, dx) if dx else strip
            ds.append(sh[3 + dy:3 + dy + th2] - c)
        dcat = ds + ds[:_ARC - 1]
        m_b = list(ds)
        m_d = [-d for d in ds]
        for j in range(1, _ARC):
            for k in range(16):
                m_b[k] = jnp.minimum(m_b[k], dcat[k + j])
                m_d[k] = jnp.minimum(m_d[k], -dcat[k + j])
        score = m_b[0]
        for k in range(1, 16):
            score = jnp.maximum(score, m_b[k])
        for k in range(16):
            score = jnp.maximum(score, m_d[k])
        # border mask (EDGE_THRESHOLD) on global coordinates, applied
        # BEFORE NMS exactly like the jnp path
        margin = C.EDGE_THRESHOLD
        gy = (
            jax.lax.broadcasted_iota(jnp.int32, score.shape, 0)
            + i * tile - 1
        )
        gx = jax.lax.broadcasted_iota(jnp.int32, score.shape, 1)
        inb = (
            (gy >= margin) & (gy < h - margin)
            & (gx >= margin) & (gx < w - margin)
        )
        score = jnp.where(inb, score, 0.0)
        # 3x3 NMS with the same lexicographic (score desc, index asc)
        # tie-break as _nms3. Row neighbors come from sublane slices (an
        # axis-0 roll would wrap rows across the tile boundary); column
        # neighbors from lane rolls, whose wraparound lands in the masked
        # border (where scores are already zero).
        idx = gy * score.shape[1] + gx  # [th2, W] global-ish index: any
        # strictly increasing row-major key works for the tie-break; using
        # the padded width keeps it monotone across the wrapped columns
        best_v = score[1:1 + tile]
        best_i = idx[1:1 + tile]
        for dy in (-1, 0, 1):
            v_base = score[1 + dy:1 + dy + tile]
            i_base = idx[1 + dy:1 + dy + tile]
            for dx in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                v = lroll(v_base, dx) if dx else v_base
                i2 = lroll(i_base, dx) if dx else i_base
                take = (v > best_v) | ((v == best_v) & (i2 < best_i))
                best_v = jnp.where(take, v, best_v)
                best_i = jnp.where(take, i2, best_i)
        out_ref[:] = jnp.where(
            best_i == idx[1:1 + tile], score[1:1 + tile], 0.0
        )

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def fast_nms_pallas(img: jax.Array, interpret: bool = False) -> jax.Array:
    """Fused FAST score + border mask + 3x3 NMS (Pallas TPU kernel).

    Numerically equivalent to
    `_nms3(where(inb, fast_score_map(img), 0))` — validated against that
    path in tests/test_orb.py."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w = img.shape
    tile = _FAST_TILE
    hp = -(-h // tile) * tile
    wp = -(-w // 128) * 128
    imp = jnp.pad(img, ((0, hp - h), (0, wp - w)))
    n_tiles = hp // tile

    def idx_prev(i):
        return (jnp.maximum(i - 1, 0), 0)

    def idx_cur(i):
        return (i, 0)

    def idx_next(i):
        return (jnp.minimum(i + 1, n_tiles - 1), 0)

    spec = lambda im: pl.BlockSpec((tile, wp), im, memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _fast_nms_kernel(h, w, tile),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        grid=(n_tiles,),
        in_specs=[spec(idx_prev), spec(idx_cur), spec(idx_next)],
        out_specs=pl.BlockSpec((tile, wp), idx_cur, memory_space=pltpu.VMEM),
        interpret=interpret,
    )(imp, imp, imp)
    return out[:h, :w]


def _nms3(score: jax.Array) -> jax.Array:
    """3x3 non-maximum suppression; keeps the lexicographic (score desc,
    index asc) maximum of each window — exact tie-break towards the
    top-left. (An epsilon index ramp added to the score is NOT exact: the
    1e-6 steps fall below the f32 ulp at score magnitudes >= 32, so equal
    scores could tie or not depending on how the compiler fuses the
    arithmetic.)"""
    h, w = score.shape
    idx = (
        jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
        + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    )
    big = jnp.int32(1 << 30)
    best_v, best_i = score, idx
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            v = jnp.full((h, w), -jnp.inf, score.dtype)
            i2 = jnp.full((h, w), big, jnp.int32)
            ys = slice(max(dy, 0), h + min(dy, 0))
            yd = slice(max(-dy, 0), h + min(-dy, 0))
            xs = slice(max(dx, 0), w + min(dx, 0))
            xd = slice(max(-dx, 0), w + min(-dx, 0))
            v = v.at[yd, xd].set(score[ys, xs])
            i2 = i2.at[yd, xd].set(idx[ys, xs])
            take = (v > best_v) | ((v == best_v) & (i2 < best_i))
            best_v = jnp.where(take, v, best_v)
            best_i = jnp.where(take, i2, best_i)
    return jnp.where(best_i == idx, score, 0.0)


def _blur7(img: jax.Array) -> jax.Array:
    """Separable 7x7 sigma=2 Gaussian blur (src/ORBextractor.cc:1086).

    Shift-and-add instead of conv: a 1-channel NCHW conv cannot use the
    MXU and runs ~70x slower on TPU (measured 3.6ms vs 0.05ms at 480x640);
    14 fused multiply-adds on the dense map are pure VPU work.
    """
    h, w = img.shape
    p = jnp.pad(img, ((3, 3), (0, 0)))
    v = sum(float(_GAUSS7[i]) * p[i:i + h, :] for i in range(7))
    p2 = jnp.pad(v, ((0, 0), (3, 3)))
    return sum(float(_GAUSS7[i]) * p2[:, i:i + w] for i in range(7))


def _moment_maps(img: jax.Array):
    """Dense IC_Angle moments (m10, m01) over the radius-15 disk at every
    pixel (src/ORBextractor.cc:77-106), via row cumulative sums.

    For each row offset dy the disk contributes a centered window of
    half-width w(dy); window sums come from one prefix-sum per row
    (box filter) and x-weighted sums from a second prefix-sum of x*I.
    This replaces the [N,31,31] patch gather (TPU gathers serialize; the
    dense formulation is ~50 vector ops + 2 cumsums).
    """
    h, w = img.shape
    P = jnp.pad(img, _R)  # zero pad; keypoints are >= EDGE_THRESHOLD inside
    hp, wp = h + 2 * _R, w + 2 * _R
    # prefix sums along x with a leading zero column: sum over [a..b] is
    # Cz[:, b+1] - Cz[:, a]
    zero = jnp.zeros((hp, 1), img.dtype)
    Cz = jnp.concatenate([zero, jnp.cumsum(P, axis=1)], axis=1)
    xabs = jnp.arange(wp, dtype=img.dtype)
    Tz = jnp.concatenate([zero, jnp.cumsum(P * xabs, axis=1)], axis=1)
    xc = jnp.arange(w, dtype=img.dtype) + _R  # output centers, padded coords

    def win(A, row0, wd):
        # A[row0 : row0+h, xc-wd .. xc+wd] summed along x, for all outputs
        blk = A[row0:row0 + h]
        return blk[:, _R + wd + 1:_R + wd + 1 + w] - blk[:, _R - wd:_R - wd + w]

    m10 = jnp.zeros((h, w), img.dtype)
    m01 = jnp.zeros((h, w), img.dtype)
    for dy in range(0, _R + 1):
        wd = _DISK_W[dy]
        box_p = win(Cz, _R + dy, wd)
        ramp_p = win(Tz, _R + dy, wd) - xc[None, :] * box_p
        if dy == 0:
            m10 = m10 + ramp_p
        else:
            box_m = win(Cz, _R - dy, wd)
            ramp_m = win(Tz, _R - dy, wd) - xc[None, :] * box_m
            m10 = m10 + ramp_p + ramp_m
            m01 = m01 + dy * (box_p - box_m)
    return m10, m01


@functools.lru_cache(maxsize=None)
def _resize_matrix(n_in: int, n_out: int):
    """Bilinear interpolation as a dense [n_out, n_in] matrix (half-pixel
    centers, edge-clamped — matches jax.image.resize(method='linear')).

    Resizing becomes two matmuls on the MXU instead of a gather-based
    resize: ~8x faster for the 8-level pyramid at 480x640."""
    scale = n_in / n_out
    x = (np.arange(n_out) + 0.5) * scale - 0.5
    x0 = np.floor(x).astype(np.int64)
    frac = (x - x0).astype(np.float32)
    lo = np.clip(x0, 0, n_in - 1)
    hi = np.clip(x0 + 1, 0, n_in - 1)
    M = np.zeros((n_out, n_in), np.float32)
    M[np.arange(n_out), lo] += 1.0 - frac
    M[np.arange(n_out), hi] += frac
    return M


def _resize_level(img: jax.Array, hw) -> jax.Array:
    h1, w1 = img.shape
    h2, w2 = hw
    Ry = jnp.asarray(_resize_matrix(h1, h2))
    Rx = jnp.asarray(_resize_matrix(w1, w2))
    return (Ry @ img) @ Rx.T


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
    m10, m01 = _moment_maps(img)
    x = jnp.clip(xy[:, 0], _R, w - 1 - _R)
    y = jnp.clip(xy[:, 1], _R, h - 1 - _R)
    return jnp.arctan2(m01[y, x], m10[y, x])


def _rotated_test_indices(xy, angle, wl, hl, base):
    """Flat sample indices of the rotated BRIEF test pattern.

    xy: [N,2] int level coords; wl/hl/base: [N] per-keypoint level width,
    height and flat offset into the concatenated pyramid. Returns [N, 512]
    int32 (256 first endpoints, then 256 second endpoints).
    """
    pat = jnp.asarray(_PATTERN, jnp.float32)  # [256, 4]
    ca, sa = jnp.cos(angle), jnp.sin(angle)   # [N]

    def rot(px, py):
        rx = jnp.round(ca[:, None] * px[None] - sa[:, None] * py[None]).astype(jnp.int32)
        ry = jnp.round(sa[:, None] * px[None] + ca[:, None] * py[None]).astype(jnp.int32)
        return rx, ry

    r1x, r1y = rot(pat[:, 0], pat[:, 1])
    r2x, r2y = rot(pat[:, 2], pat[:, 3])
    x0, y0 = xy[:, 0][:, None], xy[:, 1][:, None]
    rx = jnp.concatenate([r1x, r2x], axis=1)  # [N, 512]
    ry = jnp.concatenate([r1y, r2y], axis=1)
    gx = jnp.clip(x0 + rx, 0, wl[:, None] - 1)
    gy = jnp.clip(y0 + ry, 0, hl[:, None] - 1)
    return base[:, None] + gy * wl[:, None] + gx


# ---------------------------------------------------------------------------
# MXU descriptor path
#
# TPU element gathers run at ~200M elem/s, so sampling 512 rotated BRIEF
# points per keypoint (the reference's computeOrbDescriptor,
# src/ORBextractor.cc:108-148) costs ~4ms/frame as a gather. Instead:
#   1. extract one 37x37 RAW patch per keypoint (vmapped dynamic_slice —
#      a block transfer, ~2.5x faster than element gathers), and
#   2. multiply by a static matrix S [1369, Q*256+2] whose columns hold
#      +/- 7x7 Gaussian stamps at the rotated test offsets — one bf16
#      matmul on the MXU computes blur + sampling + comparison input for
#      ALL Q rotation buckets at once, plus the IC_Angle disk moments
#      (m10, m01) in the last two columns.
# The per-keypoint bucket (from the exact moment-based angle) then selects
# its 256 bits. Rotation is quantized to Q=64 buckets (5.6 deg); the
# reference itself rounds rotated offsets to the pixel grid (~0.5px), so
# at radius <=13px the added error (<=0.64px) is at the same scale.
# ---------------------------------------------------------------------------

_PATCH_R = 21          # pattern radius <=17.7 rotated -> +/-18, +3 blur taps
_PATCH_W = 2 * _PATCH_R + 1
# stored patch extent: [48, 48] — 5 extra rows/columns of real pixels so
# the patch is a DMA/tile-friendly block (the BRIEF matrix rows at the pad
# positions are zero, so the extra pixels never contribute)
_PATCH_WX = _PATCH_W + 5
_PATCH_HP = _PATCH_W + 5
# keypoints keep EDGE_THRESHOLD=19 from level borders; the patch reaches
# 21px, so the padded level stack carries this much extra zero margin
_PATCH_PAD = _PATCH_R - C.EDGE_THRESHOLD + 1  # = 3 (1 slack for rounding)
_BRIEF_Q = 64


@functools.lru_cache(maxsize=None)
def _brief_matrix_np(qb: int = _BRIEF_Q, stride: int = _PATCH_WX) -> np.ndarray:
    """The S matrix over a row-major [_PATCH_HP, stride] patch layout:
    row index of pixel (y, x) is y*stride + x; rows/columns beyond
    _PATCH_W stay zero."""
    P, W = _PATCH_R, _PATCH_W
    g = _GAUSS7.astype(np.float64)
    pat = _PATTERN.astype(np.float64)  # [256, 4] = (x1, y1, x2, y2)
    S = np.zeros((_PATCH_HP * stride, qb * 256 + 2), np.float64)

    th = 2.0 * np.pi * np.arange(qb) / qb
    ca, sa = np.cos(th)[:, None], np.sin(th)[:, None]  # [Q,1]
    # reference rounding of rotated offsets (cvRound)
    rx = np.rint(np.stack([ca * pat[:, 0] - sa * pat[:, 1],
                           ca * pat[:, 2] - sa * pat[:, 3]], axis=-1)).astype(int)
    ry = np.rint(np.stack([sa * pat[:, 0] + ca * pat[:, 1],
                           sa * pat[:, 2] + ca * pat[:, 3]], axis=-1)).astype(int)
    # rx/ry: [Q, 256, 2] (endpoint 0 = first test point, subtracted)
    dyx = np.arange(-3, 4)
    gw = np.outer(g, g)  # [7,7]
    yy = (P + ry[..., None, None] + dyx[None, None, None, :, None])  # [Q,256,2,7,1]
    xx = (P + rx[..., None, None] + dyx[None, None, None, None, :])  # [Q,256,2,1,7]
    full = (qb, 256, 2, 7, 7)
    rows = np.broadcast_to(yy * stride + xx, full).ravel()
    cols = np.broadcast_to(
        (np.arange(qb)[:, None] * 256 + np.arange(256)[None, :])[..., None, None, None],
        full,
    ).ravel()
    sign = np.broadcast_to(
        np.asarray([-1.0, 1.0])[None, None, :, None, None], full
    ).ravel()
    wts = np.broadcast_to(gw[None, None, None], full).ravel() * sign
    np.add.at(S, (rows, cols), wts)

    # IC_Angle disk moments on the 31x31 subgrid (src/ORBextractor.cc:77-106)
    dy, dx = np.mgrid[-_R:_R + 1, -_R:_R + 1]
    disk = (dx * dx + dy * dy) <= _R * _R
    ys, xs = np.nonzero(disk)
    rr = (ys - _R + P) * stride + (xs - _R + P)
    S[rr, -2] = dx[disk]
    S[rr, -1] = dy[disk]
    return S.astype(np.float32)


_BRIEF_S_DEV: dict = {}


def _brief_matrix(qb: int = _BRIEF_Q) -> jax.Array:
    """S as a committed device array. The bf16 cast happens in numpy
    (ml_dtypes) and device_put takes the numpy buffer, so this stays
    concrete even when first reached inside a jit trace (a traced astype
    here would leak a tracer into the cache) and the ~60MB matrix is
    hoisted as a buffer instead of inlined into every HLO."""
    if qb not in _BRIEF_S_DEV:
        import ml_dtypes

        # escape any enclosing trace: the cache must hold a CONCRETE array
        # (a cached tracer poisons every later trace)
        with jax.ensure_compile_time_eval():
            _BRIEF_S_DEV[qb] = jnp.asarray(
                _brief_matrix_np(qb).astype(ml_dtypes.bfloat16)
            )
    return _BRIEF_S_DEV[qb]


# ---------------------------------------------------------------------------
# Pallas patch gather: XLA lowers the vmapped dynamic_slice to a gather
# that costs ~2.5ms/frame for 1000 patches (latency-bound, one at a time).
# Mosaic DMA slices must be tile-aligned — (8, 128) for f32 — so the
# kernel copies the aligned [56, 256] superblock containing each patch
# (start rounded DOWN to the tile grid), keeps 8 DMAs in flight, and
# realigns in VMEM: the row residual dy in [0,8) by an 8-way static-slice
# select, the lane residual dx in [0,128) by 7 conditional power-of-two
# lane rolls (a vectorized barrel shifter across the chunk).
# Output is [N, 48, 256] with the patch at the origin; the caller slices
# the first 48 columns (cheap in XLA).
# ---------------------------------------------------------------------------

_GATHER_CHUNK = 64
_GATHER_DEPTH = 8
_GATHER_BH = 56    # 48 patch rows + up to 7 residual = 55 -> 56 (x8)
_GATHER_BW = 256   # 48 patch cols + up to 127 residual = 175 -> 256
_USE_PALLAS_GATHER = True


@functools.partial(jax.jit, static_argnames=("interpret", "chunk"))
def gather_patches_pallas(padded, lyx, interpret: bool = False,
                          chunk: int = _GATHER_CHUNK):
    """padded [L, Hp, Wp] f32 (Hp multiple of 8 and >= y0a+56, Wp multiple
    of 128 and >= x0a+256 for every keypoint); lyx [N, 3] int32 rows
    (level, y0, x0). Returns [N, _PATCH_HP, _GATHER_BW] f32 with the
    patch at [:, :48, :48]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = lyx.shape[0]
    # Mosaic keeps a scalar-prefetch SMEM copy of the index operands per
    # grid step; past ~1024 keypoints the 1MB SMEM budget overflows
    # (street's 2000-feature config: "Used 1.00M of 1.00M smem, exceeded
    # by 1.1K"). A single-call [1024, 48, 256] f32 out buffer also sits
    # at 12.6MB of scoped VMEM, which overflows the 16MB limit once the
    # surrounding fused program (extraction + tracking + a mapper chunk,
    # r4) claims its own share — the monocular desk config hit exactly
    # this. Inputs past 512 rows therefore split into 512-row sub-calls,
    # KEEPING the hardware-validated ch=64 DMA chunk inside each (the old
    # >1024 path dropped to chunk=32, whose 16ms grids once stalled the
    # pipeline into a keyframe storm when applied broadly).
    if n > 512:
        step = 512
        outs = [
            gather_patches_pallas(padded, lyx[i:i + step], interpret,
                                  chunk=chunk)
            for i in range(0, n, step)
        ]
        return jnp.concatenate(outs, axis=0)
    ch, depth = chunk, _GATHER_DEPTH
    n_pad = -(-n // ch) * ch
    if n_pad != n:
        lyx = jnp.concatenate([lyx, jnp.zeros((n_pad - n, 3), lyx.dtype)])
    n_chunks = n_pad // ch

    lvl = lyx[:, 0]
    y0a = (lyx[:, 1] // 8) * 8
    x0a = (lyx[:, 2] // 128) * 128
    aligned = jnp.stack([lvl, y0a, x0a], axis=1)
    # residuals ride a VMEM input: the vectorized realign selects need
    # them as vectors, which scalar-prefetch SMEM reads cannot broadcast
    res = jnp.stack(
        [lyx[:, 1] - y0a, lyx[:, 2] - x0a], axis=1
    ).astype(jnp.int32)

    def kernel(al_ref, res_ref, src_ref, out_ref, scratch, sems):
        i = pl.program_id(0)

        def get_dma(k):
            idx = i * ch + k
            # the caller floors these starts to the tile grid; the hint is
            # what lets Mosaic accept a dynamic tile-aligned DMA offset
            y0 = pl.multiple_of(al_ref[idx, 1], 8)
            x0 = pl.multiple_of(al_ref[idx, 2], 128)
            return pltpu.make_async_copy(
                src_ref.at[
                    al_ref[idx, 0],
                    pl.ds(y0, _GATHER_BH),
                    pl.ds(x0, _GATHER_BW),
                ],
                scratch.at[k],
                sems.at[k % depth],
            )

        for k in range(depth):
            get_dma(k).start()

        def body(k, carry):
            get_dma(k).wait()

            @pl.when(k + depth < ch)
            def _():
                get_dma(k + depth).start()

            return carry

        jax.lax.fori_loop(0, ch, body, 0)

        blocks = scratch[:]                       # [ch, 56, 256]
        dy = res_ref[:, 0][:, None, None]         # [ch, 1, 1]
        dx = res_ref[:, 1]
        cur = blocks[:, 0:_PATCH_HP, :]
        for d in range(1, 8):
            cur = jnp.where(dy == d, blocks[:, d:d + _PATCH_HP, :], cur)
        for bit in range(7):
            amt = 1 << bit
            rolled = pltpu.roll(cur, shift=(-amt) % _GATHER_BW, axis=2)
            take = (((dx >> bit) & 1) == 1)[:, None, None]
            cur = jnp.where(take, rolled, cur)
        out_ref[:] = cur

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(
                (ch, 2), lambda i, *_: (i, 0),
                memory_space=pltpu.MemorySpace.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec(
            (ch, _PATCH_HP, _GATHER_BW),
            lambda i, *_: (i, 0, 0),
            memory_space=pltpu.MemorySpace.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((ch, _GATHER_BH, _GATHER_BW), jnp.float32),
            pltpu.SemaphoreType.DMA((depth,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (n_pad, _PATCH_HP, _GATHER_BW), jnp.float32
        ),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # the default 16MB scoped-vmem budget is 0.9MB short when this
            # kernel compiles inside the 2000-feature stereo frame program
            # (r5: the street h2h run died with "scoped allocation 16.90M
            # ... limit 16.00M"); the standalone kernel fits, the fused
            # module's layout choices pad the window
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
    )(aligned, res, padded)
    return out[:n]


@functools.partial(jax.jit, static_argnames=("cfg", "shape"))
def _extract_impl(image: jax.Array, cfg: ORBConfig, shape):
    h, w = shape
    sizes = cfg.level_sizes(h, w)
    budgets = cfg.level_budgets()
    margin = C.EDGE_THRESHOLD

    # Per-level dense stages (score/NMS/select) are plain vector work; the
    # orientation + descriptor stage runs once across all levels on the
    # MXU (see _brief_matrix above).
    xy_lvl, resp_all, valid_all = [], [], []
    pyramid = []
    level_img = image
    for lvl in range(cfg.n_levels):
        if lvl > 0:
            level_img = _resize_level(level_img, sizes[lvl])
        pyramid.append(level_img)
        lh, lw = sizes[lvl]
        if jax.default_backend() == "tpu":
            # fused Pallas kernel: one HBM round trip per level instead of
            # ~25 (ring stack + running minima stay in VMEM)
            score = fast_nms_pallas(level_img)
        else:
            score = fast_score_map(level_img)
            # mask borders so patches/descriptors stay in-bounds
            ys = jax.lax.broadcasted_iota(jnp.int32, (lh, lw), 0)
            xs = jax.lax.broadcasted_iota(jnp.int32, (lh, lw), 1)
            inb = (
                (ys >= margin) & (ys < lh - margin)
                & (xs >= margin) & (xs < lw - margin)
            )
            score = jnp.where(inb, score, 0.0)
            score = _nms3(score)
        xy_l, resp, valid = _select_keypoints(score, budgets[lvl], cfg.cell, cfg.min_th)
        xy_lvl.append(xy_l)
        resp_all.append(resp)
        valid_all.append(valid)

    n_lvls = cfg.n_levels
    wl_np = np.concatenate(
        [np.full(budgets[l], sizes[l][1], np.int32) for l in range(n_lvls)]
    )
    hl_np = np.concatenate(
        [np.full(budgets[l], sizes[l][0], np.int32) for l in range(n_lvls)]
    )
    oct_np = np.concatenate(
        [np.full(budgets[l], l, np.int32) for l in range(n_lvls)]
    )
    wl, hl = jnp.asarray(wl_np), jnp.asarray(hl_np)
    oct_dev = jnp.asarray(oct_np)
    xy_all = jnp.concatenate(xy_lvl)                       # [N, 2] level coords
    n_slots = xy_all.shape[0]

    # one [48, 48] raw patch per keypoint from the zero-padded level stack
    # (selection enforces EDGE_THRESHOLD=19 > 18, so patches never cross a
    # level boundary into the padding; the 5 extra rows/columns carry real
    # pixels that multiply zero rows of S). The stack is over-padded so the
    # Pallas gather's tile-ALIGNED [56, 256] superblock reads stay in
    # bounds for every keypoint: height to a multiple of 8 with 8 rows of
    # headroom, width to a multiple of 128 with x0_aligned + 256 in range.
    pd = _PATCH_PAD
    hi_y = h + 2 * pd - _PATCH_HP + (_PATCH_HP - _PATCH_W)  # legit top-left max
    hi_x = w + 2 * pd + (_PATCH_WX - _PATCH_W) - _PATCH_WX
    hp2 = -(-(h + 2 * pd + 16) // 8) * 8  # y0_aligned + 56 stays in range
    wp2 = -(-(hi_x + 128 + _GATHER_BW) // 128) * 128
    padded = jnp.zeros((n_lvls, hp2, wp2), jnp.float32)
    for l in range(n_lvls):
        padded = padded.at[
            l, pd : pd + sizes[l][0], pd : pd + sizes[l][1]
        ].set(pyramid[l])
    ys0 = jnp.clip(xy_all[:, 1] - _PATCH_R + pd, 0, hi_y)
    xs0 = jnp.clip(xy_all[:, 0] - _PATCH_R + pd, 0, hi_x)

    if _USE_PALLAS_GATHER and jax.default_backend() == "tpu":
        lyx = jnp.stack([oct_dev, ys0, xs0], axis=1).astype(jnp.int32)
        blocks = gather_patches_pallas(padded, lyx)        # [N, 48, 256]
        patches = blocks[:, :, :_PATCH_WX]                 # [N, 48, 48]
    else:
        def _one_patch(l, y, x):
            return jax.lax.dynamic_slice(
                padded, (l, y, x), (1, _PATCH_HP, _PATCH_WX)
            )[0]

        patches = jax.vmap(_one_patch)(oct_dev, ys0, xs0)  # [N, 48, 48]
    S = _brief_matrix()
    out = jnp.dot(
        patches.reshape(n_slots, _PATCH_HP * _PATCH_WX).astype(jnp.bfloat16),
        S,
        preferred_element_type=jnp.float32,
    )                                                      # [N, Q*256 + 2]
    # exact IC_Angle moments (u8 pixels and +/-15 coords are bf16-exact,
    # f32 accumulation)
    ang_all = jnp.arctan2(out[:, -1], out[:, -2])
    qb = _BRIEF_Q
    bucket = jnp.mod(
        jnp.round(ang_all / (2.0 * jnp.pi / qb)).astype(jnp.int32), qb
    )
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (n_slots, qb), 1) == bucket[:, None]
    ).astype(jnp.float32)
    sel = jnp.einsum(
        "nqb,nq->nb", out[:, : qb * 256].reshape(n_slots, qb, 256), onehot
    )
    desc_all = pack_bits(sel > 0)

    scale_per_slot = jnp.asarray(
        np.concatenate(
            [np.full(budgets[l], cfg.scales[l], np.float32) for l in range(n_lvls)]
        )
    )
    feats = FrameFeatures(
        xy=xy_all.astype(jnp.float32) * scale_per_slot[:, None],
        response=jnp.concatenate(resp_all),
        angle=ang_all,
        octave=oct_dev,
        desc=desc_all,
        valid=jnp.concatenate(valid_all),
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
