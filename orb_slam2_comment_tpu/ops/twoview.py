"""Monocular two-view bootstrap: batched H/F RANSAC + reconstruction.

Replaces the reference `Initializer` (src/Initializer.cc): 200 RANSAC
sets scored for both a homography and a fundamental matrix (the reference
computes them in two std::threads; here both are single batched programs),
model selection by RH = SH/(SH+SF) > 0.40, then pose recovery:
- ReconstructF: E = K^T F K -> 4 (R,t) candidates -> cheirality vote
- ReconstructH: Faugeras 1988 8-solution decomposition -> cheirality vote
with the reference's acceptance gates (clear winner, >=50 triangulated,
parallax >= 1 deg — Initializer::ReconstructF/ReconstructH).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam2_comment_tpu import constants as C
from orb_slam2_comment_tpu.ops import geometry as geo


def _normalize(pts, mask):
    """Hartley normalization (Initializer::Normalize): zero-mean, unit
    mean absolute deviation. Returns (normalized pts, T [3,3])."""
    wsum = jnp.maximum(jnp.sum(mask), 1.0)
    mean = jnp.sum(pts * mask[:, None], axis=0) / wsum
    d = jnp.abs(pts - mean) * mask[:, None]
    md = jnp.sum(d, axis=0) / wsum
    s = 1.0 / jnp.maximum(md, 1e-9)
    T = jnp.asarray(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    )
    T = T.at[0, 0].set(s[0]).at[1, 1].set(s[1])
    T = T.at[0, 2].set(-mean[0] * s[0]).at[1, 2].set(-mean[1] * s[1])
    return (pts - mean) * s, T


class TwoViewResult(NamedTuple):
    ok: jax.Array          # scalar bool
    R21: jax.Array         # [3,3] rotation frame1 -> frame2
    t21: jax.Array         # [3]
    X: jax.Array           # [N,3] triangulated points (frame-1 coords)
    good: jax.Array        # [N] bool triangulated + inlier
    is_homography: jax.Array
    # diagnostics
    n_good: jax.Array
    n_inliers: jax.Array
    parallax_deg: jax.Array
    distinct: jax.Array


@functools.partial(jax.jit, static_argnames=("K", "n_hyp"))
def two_view_init(
    xy1: jax.Array,        # [N,2] matched pixels in frame 1
    xy2: jax.Array,        # [N,2] corresponding pixels in frame 2
    valid: jax.Array,      # [N] bool
    K: tuple,
    seed: int = 0,
    n_hyp: int = C.INIT_RANSAC_ITERS,
    sigma: float = C.INIT_SIGMA,
) -> TwoViewResult:
    fx, fy, cx, cy = K
    n = xy1.shape[0]
    key = jax.random.PRNGKey(seed)
    logits = jnp.where(valid, 0.0, -jnp.inf)
    idx8 = jax.random.categorical(key, logits[None], shape=(n_hyp, 8))

    p1n, T1 = _normalize(xy1, valid.astype(xy1.dtype))
    p2n, T2 = _normalize(xy2, valid.astype(xy1.dtype))

    def h1(p):
        return jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)

    # ---------------- Fundamental: batched 8-point ----------------------
    a1 = p1n[idx8]
    a2 = p2n[idx8]
    # rows: x2 x1 terms such that h2^T F h1 = 0 (ComputeF21)
    A_F = jnp.stack(
        [
            a2[..., 0] * a1[..., 0], a2[..., 0] * a1[..., 1], a2[..., 0],
            a2[..., 1] * a1[..., 0], a2[..., 1] * a1[..., 1], a2[..., 1],
            a1[..., 0], a1[..., 1], jnp.ones_like(a1[..., 0]),
        ],
        axis=-1,
    )  # [H, 8, 9]
    AtA = jnp.einsum("hki,hkj->hij", A_F, A_F)
    _, vecs = jnp.linalg.eigh(AtA)
    Fn = vecs[..., 0].reshape(-1, 3, 3)
    # rank-2 enforcement
    U, S, Vt = jnp.linalg.svd(Fn)
    S = S.at[:, 2].set(0.0)
    Fn = U @ (S[:, :, None] * Vt)
    F = jnp.einsum("ij,hjk,kl->hil", T2.T, Fn, T1)          # denormalize

    # symmetric epipolar chi2 score (CheckFundamental)
    h1a = h1(xy1)
    h2a = h1(xy2)
    l2 = jnp.einsum("hij,nj->hni", F, h1a)                   # line in img2
    l1 = jnp.einsum("hji,nj->hni", F, h2a)                   # line in img1
    num2 = jnp.sum(l2 * h2a[None], axis=-1)
    num1 = jnp.sum(l1 * h1a[None], axis=-1)
    d2 = num2 * num2 / jnp.maximum(l2[..., 0] ** 2 + l2[..., 1] ** 2, 1e-12)
    d1 = num1 * num1 / jnp.maximum(l1[..., 0] ** 2 + l1[..., 1] ** 2, 1e-12)
    inv_s2 = 1.0 / (sigma * sigma)
    chi1 = d1 * inv_s2
    chi2_ = d2 * inv_s2
    inl_F = (chi1 < 3.841) & (chi2_ < 3.841) & valid[None]
    score_F_per = jnp.where(chi1 < 3.841, 5.991 - chi1, 0.0) + jnp.where(
        chi2_ < 3.841, 5.991 - chi2_, 0.0
    )
    score_F = jnp.sum(jnp.where(valid[None], score_F_per, 0.0), axis=1)
    bF = jnp.argmax(score_F)
    SF = score_F[bF]
    F_best = F[bF]
    inl_F_best = inl_F[bF]

    # ---------------- Homography: batched 4-point DLT --------------------
    idx4 = idx8[:, :4]
    b1 = p1n[idx4]
    b2 = p2n[idx4]
    o = jnp.ones_like(b1[..., 0])
    z = jnp.zeros_like(o)
    r1 = jnp.stack(
        [b1[..., 0], b1[..., 1], o, z, z, z,
         -b2[..., 0] * b1[..., 0], -b2[..., 0] * b1[..., 1], -b2[..., 0]],
        axis=-1,
    )
    r2 = jnp.stack(
        [z, z, z, b1[..., 0], b1[..., 1], o,
         -b2[..., 1] * b1[..., 0], -b2[..., 1] * b1[..., 1], -b2[..., 1]],
        axis=-1,
    )
    A_H = jnp.concatenate([r1, r2], axis=1)                 # [H, 8, 9]
    AtA_H = jnp.einsum("hki,hkj->hij", A_H, A_H)
    _, vecsH = jnp.linalg.eigh(AtA_H)
    Hn = vecsH[..., 0].reshape(-1, 3, 3)
    Hm = jnp.einsum("ij,hjk,kl->hil", jnp.linalg.inv(T2), Hn, T1)

    # symmetric transfer error (CheckHomography)
    Hx1 = jnp.einsum("hij,nj->hni", Hm, h1a)
    w1 = jnp.maximum(jnp.abs(Hx1[..., 2]), 1e-9) * jnp.sign(
        jnp.where(Hx1[..., 2] == 0, 1.0, Hx1[..., 2])
    )
    p12 = Hx1[..., :2] / w1[..., None]
    Hinv = jnp.linalg.inv(Hm)
    Hx2 = jnp.einsum("hij,nj->hni", Hinv, h2a)
    w2 = jnp.maximum(jnp.abs(Hx2[..., 2]), 1e-9) * jnp.sign(
        jnp.where(Hx2[..., 2] == 0, 1.0, Hx2[..., 2])
    )
    p21 = Hx2[..., :2] / w2[..., None]
    e2 = jnp.sum((p12 - xy2[None]) ** 2, axis=-1) * inv_s2
    e1 = jnp.sum((p21 - xy1[None]) ** 2, axis=-1) * inv_s2
    inl_H = (e1 < 5.991) & (e2 < 5.991) & valid[None]
    score_H_per = jnp.where(e1 < 5.991, 5.991 - e1, 0.0) + jnp.where(
        e2 < 5.991, 5.991 - e2, 0.0
    )
    score_H = jnp.sum(jnp.where(valid[None], score_H_per, 0.0), axis=1)
    bH = jnp.argmax(score_H)
    SH = score_H[bH]
    H_best = Hm[bH]
    inl_H_best = inl_H[bH]

    # ---------------- model selection + reconstruction -------------------
    RH = SH / jnp.maximum(SH + SF, 1e-9)
    use_H = RH > C.INIT_MODEL_SELECT_RH

    Km = jnp.asarray([[fx, 0, cx], [0, fy, cy], [0, 0, 1]])
    Kinv = jnp.linalg.inv(Km)

    # F path: E = K^T F K -> 4 candidates
    E = Km.T @ F_best @ Km
    Ue, Se, Vte = jnp.linalg.svd(E)
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    # ensure proper rotations
    def mk_R(U_, M, Vt_):
        R = U_ @ M @ Vt_
        return R * jnp.sign(jnp.linalg.det(R))

    R1 = mk_R(Ue, W, Vte)
    R2 = mk_R(Ue, W.T, Vte)
    tE = Ue[:, 2]
    tE = tE / jnp.maximum(jnp.linalg.norm(tE), 1e-9)
    cand_F = jnp.stack(
        [
            jnp.concatenate([R1, tE[:, None]], axis=1),
            jnp.concatenate([R1, -tE[:, None]], axis=1),
            jnp.concatenate([R2, tE[:, None]], axis=1),
            jnp.concatenate([R2, -tE[:, None]], axis=1),
        ]
    )  # [4, 3, 4]

    # H path: Faugeras 8 candidates from A = K^-1 H K
    A = Kinv @ H_best @ Km
    Ua, Sa, Vta = jnp.linalg.svd(A)
    s_det = jnp.linalg.det(Ua) * jnp.linalg.det(Vta)
    d1_, d2_, d3_ = Sa[0], Sa[1], Sa[2]
    denom = jnp.maximum(d1_ * d1_ - d3_ * d3_, 1e-12)
    x1 = jnp.sqrt(jnp.maximum((d1_ * d1_ - d2_ * d2_) / denom, 0.0))
    x3 = jnp.sqrt(jnp.maximum((d2_ * d2_ - d3_ * d3_) / denom, 0.0))
    cands_H = []
    for eps1 in (1.0, -1.0):
        for eps3 in (1.0, -1.0):
            # d' = d2 case
            st = (
                (d1_ - d3_) * x1 * x3 * eps1 * eps3 / jnp.maximum(d2_, 1e-12)
            )
            ct = (d2_ * d2_ + d1_ * d3_ * 0.0 + d1_ * d3_) / jnp.maximum(
                (d1_ + d3_) * d2_, 1e-12
            )
            # (standard Faugeras: ct = (d2^2 + d1 d3)/((d1+d3) d2) is for
            # the d'=-d2 case; for d'=+d2: ct=(d1 x3^2 + d3 x1^2)/d2 — use
            # the rotation-about-y parameterization directly instead)
            st_p = (d1_ - d3_) * x1 * x3 * eps1 * eps3 / d2_
            ct_p = (d1_ * x3 * x3 + d3_ * x1 * x1) / d2_
            Rp = jnp.asarray(
                [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
            )
            Rp = Rp.at[0, 0].set(ct_p).at[0, 2].set(-st_p)
            Rp = Rp.at[2, 0].set(st_p).at[2, 2].set(ct_p)
            tp = jnp.asarray([eps1 * x1, 0.0, -eps3 * x3]) * (d1_ - d3_)
            R = s_det * Ua @ Rp @ Vta
            t = Ua @ tp
            t = t / jnp.maximum(jnp.linalg.norm(t), 1e-9)
            cands_H.append(jnp.concatenate([R, t[:, None]], axis=1))
            # d' = -d2 case (rotation about y by phi with reflection)
            sp = (d1_ + d3_) * x1 * x3 * eps1 * eps3 / d2_
            cp = (d3_ * x1 * x1 - d1_ * x3 * x3) / d2_
            Rn = jnp.asarray(
                [[1.0, 0.0, 0.0], [0.0, -1.0, 0.0], [0.0, 0.0, 1.0]]
            )
            Rn = Rn.at[0, 0].set(cp).at[0, 2].set(sp)
            Rn = Rn.at[2, 0].set(sp).at[2, 2].set(-cp)
            tn = jnp.asarray([eps1 * x1, 0.0, eps3 * x3]) * (d1_ + d3_)
            Rf = s_det * Ua @ Rn @ Vta
            tf = Ua @ tn
            tf = tf / jnp.maximum(jnp.linalg.norm(tf), 1e-9)
            cands_H.append(jnp.concatenate([Rf, tf[:, None]], axis=1))
    cand_H = jnp.stack(cands_H)  # [8, 3, 4]

    # pad F candidates to 8 so both branches share one evaluation program;
    # the duplicate half is masked out of the vote below (it would otherwise
    # defeat the clear-winner uniqueness check)
    cand_F8 = jnp.concatenate([cand_F, cand_F], axis=0)
    cands = jnp.where(use_H, cand_H, cand_F8)
    cand_valid = jnp.where(
        use_H,
        jnp.ones(8, bool),
        jnp.asarray([True] * 4 + [False] * 4),
    )
    inliers = jnp.where(use_H, inl_H_best, inl_F_best)

    # ---------------- cheirality vote (CheckRT) --------------------------
    def check_rt(Rt):
        R, t = Rt[:, :3], Rt[:, 3]
        P1 = Km @ jnp.eye(4)[:3]
        T21 = geo.make_T(R, t)
        P2 = Km @ T21[:3]
        X = geo.triangulate_linear(P1, P2, xy1, xy2)
        z1 = X[:, 2]
        Xc2 = geo.transform_points(T21, X)
        z2 = Xc2[:, 2]
        # parallax
        r1v = X
        r2v = X - (-R.T @ t)
        cosp = jnp.sum(r1v * r2v, -1) / jnp.maximum(
            jnp.linalg.norm(r1v, axis=-1) * jnp.linalg.norm(r2v, axis=-1), 1e-9
        )
        # reprojection gate
        e1p = xy1 - geo.project(K, X)
        e2p = xy2 - geo.project(K, Xc2)
        okp = (
            inliers
            & (z1 > 0) & (z2 > 0)
            & (jnp.sum(e1p * e1p, -1) < 4.0 * sigma * sigma)
            & (jnp.sum(e2p * e2p, -1) < 4.0 * sigma * sigma)
            & (cosp < 0.99998)
        )
        # median parallax of good points (approx of the reference's
        # 50th-smallest-angle check)
        par = jnp.where(okp, jnp.degrees(jnp.arccos(jnp.clip(cosp, -1, 1))), 0.0)
        return jnp.sum(okp), X, okp, par

    n_good, Xs, goods, pars = jax.vmap(check_rt)(cands)
    n_good = jnp.where(cand_valid, n_good, -1)
    best_c = jnp.argmax(n_good)
    n_best = n_good[best_c]
    # uniqueness: no other candidate close to the winner (ReconstructF's
    # nsimilar check)
    sorted_good = jnp.sort(n_good)
    second = sorted_good[-2]
    distinct = n_best > 1.33 * jnp.maximum(second, 1)
    par_best = pars[best_c]
    # parallax of the ~50th best point
    par_sorted = jnp.sort(jnp.where(goods[best_c], par_best, 0.0))
    k50 = jnp.maximum(par_sorted.shape[0] - 50, 0)
    med_par = par_sorted[k50]
    n_inl_total = jnp.sum(inliers)
    ok = (
        (n_best >= C.INIT_MIN_TRIANGULATED)
        # the reference demands 90% of the RANSAC inliers triangulate
        # cleanly (nMinGood = max(0.9*N, minTriangulated),
        # Initializer.cc:504,721) — the earlier 0.75 accepted frame pairs
        # whose winning (R,t) hypothesis had a ~50deg translation
        # direction error (r5 mono diagnosis: KF0 anchored 85mm off)
        & (n_best > 0.9 * n_inl_total)
        & distinct
        & (med_par > C.INIT_MIN_PARALLAX_DEG)
    )
    Rt = cands[best_c]
    return TwoViewResult(
        ok=ok,
        R21=Rt[:, :3],
        t21=Rt[:, 3],
        X=Xs[best_c],
        good=goods[best_c],
        is_homography=use_H,
        n_good=n_best,
        n_inliers=n_inl_total,
        parallax_deg=med_par,
        distinct=distinct,
    )
