"""Stereo correspondence: row-band Hamming search + SAD subpixel refinement.

Replaces Frame::ComputeStereoMatches (src/Frame.cc:466-640): for every left
keypoint, search right keypoints in the same row band (radius scaled by the
right keypoint's octave), accept the best Hamming match under
(TH_HIGH+TH_LOW)/2, then refine the right u-coordinate by sliding an 11px
SAD window +-5px at the keypoint's pyramid level and fitting a parabola to
the minimum; finally reject matches whose SAD exceeds a median-based
threshold (src/Frame.cc:625-639).

Also provides depth_to_uright for RGB-D frames
(Frame::ComputeStereoFromRGBD, src/Frame.cc:643-664).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

from orb_slam2_comment_tpu import constants as C
from orb_slam2_comment_tpu.ops.matching import hamming_from_packed

_W = 5          # SAD half-window (src/Frame.cc:540 'const int w = 5')
_L = 5          # slide range (src/Frame.cc:555 '-L to +L')
_INF = 1e9


def _gather_patch_rows(img, yc, xc, half, width):
    """[N] centers -> [N, 2*half+1, width] patches (row strip)."""
    h, w = img.shape
    dy = jnp.arange(-half, half + 1)
    dx = jnp.arange(width) - (width - 1) // 2
    yy = jnp.clip(yc[:, None, None] + dy[None, :, None], 0, h - 1)
    xx = jnp.clip(xc[:, None, None] + dx[None, None, :], 0, w - 1)
    return img[yy, xx]


@functools.partial(jax.jit, static_argnames=("scale_factors", "bf", "min_z", "n_levels", "th_stereo"))
def stereo_match(
    feats_l,
    feats_r,
    pyramid_l: Sequence[jax.Array],
    pyramid_r: Sequence[jax.Array],
    scale_factors: tuple,       # static per-level scales, e.g. (1.0, 1.2, ...)
    bf: float,
    min_z: float,
    n_levels: int = C.DEFAULT_N_LEVELS,
    th_stereo: float = float(C.TH_STEREO),
):
    """Returns (u_right [N], depth [N]) for left features; -1 where unmatched.

    min_z sets the max disparity (the reference uses minD=0, maxD=bf/b i.e.
    min depth = baseline, src/Frame.cc:485-487).
    """
    sf = jnp.asarray(scale_factors, jnp.float32)
    uL, vL = feats_l.xy[:, 0], feats_l.xy[:, 1]
    uR, vR = feats_r.xy[:, 0], feats_r.xy[:, 1]
    oct_l, oct_r = feats_l.octave, feats_r.octave

    # --- candidate mask: same row band, disparity in range ---------------
    # row radius = 2 * scale of the RIGHT keypoint's octave (src/Frame.cc:478)
    r_band = 2.0 * sf[jnp.clip(oct_r, 0, n_levels - 1)]
    row_ok = jnp.abs(vL[:, None] - vR[None, :]) <= r_band[None, :]
    max_d = bf / min_z
    disp = uL[:, None] - uR[None, :]
    disp_ok = (disp >= -2.0) & (disp <= max_d)
    # octave band +-1 (src/Frame.cc:504-507)
    d_oct = jnp.abs(oct_l[:, None] - oct_r[None, :])
    oct_ok = d_oct <= 1
    mask = row_ok & disp_ok & oct_ok & feats_l.valid[:, None] & feats_r.valid[None, :]

    dist = jnp.where(mask, hamming_from_packed(feats_l.desc, feats_r.desc), _INF)
    best = jnp.argmin(dist, axis=1)
    best_d = jnp.take_along_axis(dist, best[:, None], axis=1)[:, 0]
    matched = best_d < th_stereo

    # --- SAD subpixel refinement at the left keypoint's level ------------
    # (src/Frame.cc:527-621). We slide the right window +-L around the
    # scaled right coordinate and fit a parabola to the SAD minimum.
    scale_l = sf[jnp.clip(oct_l, 0, n_levels - 1)]
    inv_scale = 1.0 / scale_l
    u0R = uR[best]

    sads_per_level = []
    for lvl in range(n_levels):
        img_l = pyramid_l[lvl]
        img_r = pyramid_r[lvl]
        sc = 1.0 / scale_factors[lvl]
        xl = jnp.round(uL * sc).astype(jnp.int32)
        yl = jnp.round(vL * sc).astype(jnp.int32)
        xr = jnp.round(u0R * sc).astype(jnp.int32)
        # left patch [N, 11, 11]; right strip [N, 11, 11 + 2L]
        pl = _gather_patch_rows(img_l, yl, xl, _W, 2 * _W + 1)
        pr = _gather_patch_rows(img_r, yl, xr, _W, 2 * _W + 1 + 2 * _L)
        # mean-normalize by center value like the reference (it subtracts
        # the window center, src/Frame.cc:550-551,570)
        pl = pl - pl[:, _W, _W][:, None, None]
        offs = []
        for k in range(2 * _L + 1):
            win = pr[:, :, k:k + 2 * _W + 1]
            win = win - win[:, _W, _W][:, None, None]
            offs.append(jnp.sum(jnp.abs(pl - win), axis=(1, 2)))
        sads_per_level.append(jnp.stack(offs, axis=1))  # [N, 2L+1]

    sad_all = jnp.stack(sads_per_level, axis=0)  # [L, N, 2L+1]
    lvl_idx = jnp.clip(oct_l, 0, n_levels - 1)
    sad = jnp.take_along_axis(
        sad_all, lvl_idx[None, :, None], axis=0
    )[0]  # [N, 2L+1]

    k_best = jnp.argmin(sad, axis=1)
    interior = (k_best > 0) & (k_best < 2 * _L)
    k_safe = jnp.clip(k_best, 1, 2 * _L - 1)
    s_m = jnp.take_along_axis(sad, (k_safe - 1)[:, None], axis=1)[:, 0]
    s_0 = jnp.take_along_axis(sad, k_safe[:, None], axis=1)[:, 0]
    s_p = jnp.take_along_axis(sad, (k_safe + 1)[:, None], axis=1)[:, 0]
    denom = jnp.maximum(2.0 * (s_m + s_p - 2.0 * s_0), 1e-6)
    delta = (s_m - s_p) / denom  # parabola vertex in [-1, 1]
    delta_ok = jnp.abs(delta) <= 1.0
    # refined right-u at level 0
    u_ref = (jnp.round(u0R * inv_scale).astype(jnp.float32)
             + (k_safe.astype(jnp.float32) - _L) + delta) * scale_l

    disparity = uL - u_ref
    good = (
        matched
        & interior
        & delta_ok
        & (disparity > 0.01)
        & (disparity < max_d)
    )

    # --- median-SAD outlier rejection (src/Frame.cc:625-639) -------------
    best_sad = s_0
    sad_vals = jnp.where(good, best_sad, jnp.nan)
    med = jnp.nanmedian(sad_vals)
    med = jnp.where(jnp.isnan(med), _INF, med)
    good = good & (best_sad <= 1.5 * 1.4 * med)

    u_right = jnp.where(good, u_ref, -1.0)
    depth = jnp.where(good, bf / jnp.maximum(disparity, 1e-6), -1.0)
    return u_right, depth


def depth_to_uright(xy: jax.Array, depth: jax.Array, bf: float):
    """RGB-D: synthesize the right-image u from measured depth
    (Frame::ComputeStereoFromRGBD, src/Frame.cc:643-664)."""
    valid = depth > 0
    u_right = jnp.where(valid, xy[:, 0] - bf / jnp.maximum(depth, 1e-6), -1.0)
    d = jnp.where(valid, depth, -1.0)
    return u_right, d


def sample_depth_at(depth_map: jax.Array, xy: jax.Array):
    """Nearest-neighbor depth lookup at keypoint locations."""
    h, w = depth_map.shape
    x = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32), 0, w - 1)
    y = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32), 0, h - 1)
    return depth_map[y, x]
