"""Learn a BRIEF test pattern from the on-disk renders (VERDICT r2 item 1:
"A/B the generated BRIEF pattern against a learned/better-separated
pattern").

The reference ships an offline-learned 256x4 table (bit_pattern_31_,
src/ORBextractor.cc:150-408) produced by the ORB paper's greedy search
(Rublee et al. 2011 §4.3): candidates with mean response near 0.5,
greedily accepted under a max-correlation budget. That table is NOT
copied here; this tool learns our own, with one addition the paper's
objective lacks: a VIEWPOINT-STABILITY term. Ground-truth RGB-D
correspondences (unproject with GT depth+pose, reproject into a frame ~12
steps away) give matched keypoint pairs; a candidate's flip rate across
those pairs measures how viewpoint-sensitive its bit is. Round-3
motivation: true loop-revisit pairs ran a median 33-bit Hamming distance
(adjacent frames: 17), starving Sim3 RANSAC of inliers.

Candidates are evaluated through the REAL extraction path (same blur,
steering, rounding): the module pattern is swapped per 256-test batch and
descriptors re-extracted.

usage: python tools/learn_brief_pattern.py [out.npy]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

N_CANDIDATES = 2048          # 8 batches of 256
N_SELECT = 256
CORR_START = 0.25            # greedy correlation budget (relaxed as needed)
PAIR_GAP = 12                # frames between correspondence views
MAX_KP_STORE = 12000         # response-vector subsample for correlation


def candidate_pattern(seed=7, n=N_CANDIDATES):
    """Gaussian candidates, same envelope/separation rules as the deployed
    generator (ops/orb._brief_pattern)."""
    from orb_slam2_comment_tpu import constants as C

    r = np.random.default_rng(seed)
    sigma = C.PATCH_SIZE / 5.0
    out = np.zeros((n, 4), np.int32)
    k = 0
    while k < n:
        p = np.clip(np.round(r.normal(0.0, sigma, size=4)), -13, 13)
        if np.hypot(p[0] - p[2], p[1] - p[3]) >= 5.0:
            out[k] = p
            k += 1
    return out


def load_pairs():
    """(imgA, imgB, K, T_A, T_B, depthA) tuples from desk + room_loop."""
    from orb_slam2_comment_tpu.utils import datasets as ds
    from tools.head_to_head import load_tum_traj

    root = os.path.join(os.path.dirname(__file__), "..", "data", "synth")
    pairs = []
    for seq, step in [("desk", 25), ("room_loop", 30)]:
        sd = os.path.join(root, seq)
        items = ds.load_tum_rgbd(sd, os.path.join(sd, "associations.txt"))
        ts_g, T_g = load_tum_traj(os.path.join(sd, "groundtruth.txt"))

        def gt_at(t):
            return T_g[int(np.argmin(np.abs(ts_g - t)))]

        for i in range(0, len(items) - PAIR_GAP, step):
            a, b = items[i], items[i + PAIR_GAP]
            pairs.append((sd, a, b, gt_at(a.timestamp), gt_at(b.timestamp)))
    return pairs


def main():
    from orb_slam2_comment_tpu.ops import orb
    from orb_slam2_comment_tpu.utils import datasets as ds
    from orb_slam2_comment_tpu.utils.config import load_yaml_settings

    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "..",
        "orb_slam2_comment_tpu", "assets", "brief_pattern.npy")

    cand = candidate_pattern()
    pairs = load_pairs()
    print(f"{len(pairs)} correspondence pairs, {N_CANDIDATES} candidates")

    n_batches = N_CANDIDATES // 256
    # accumulators per candidate
    ones = np.zeros(N_CANDIDATES, np.int64)       # bits set (for mean)
    count = np.zeros(N_CANDIDATES, np.int64)
    flips = np.zeros(N_CANDIDATES, np.int64)      # across GT matches
    nmatch = np.zeros(N_CANDIDATES, np.int64)
    resp_store = [None] * n_batches               # [n_kp_sub, 256] bits

    orig_pattern = orb._PATTERN

    def set_pattern(p):
        orb._PATTERN = p
        orb._brief_matrix_np.cache_clear()
        orb._BRIEF_S_DEV.clear()
        jax.clear_caches()

    cfg_cache = {}

    def cfg_of(sd):
        if sd not in cfg_cache:
            cfg_cache[sd] = load_yaml_settings(
                os.path.join(sd, "settings.yaml"), "rgbd")
        return cfg_cache[sd]

    t0 = time.time()
    for b in range(n_batches):
        set_pattern(cand[b * 256:(b + 1) * 256])
        # ONE jitted extractor per batch (a fresh jax.jit per call would
        # recompile for every frame)
        extractors = {}

        def extract(sd, img):
            cfg = cfg_of(sd)
            key = (sd, img.shape)
            if key not in extractors:
                extractors[key] = jax.jit(
                    lambda x: orb._extract_impl(
                        x.astype(np.float32), cfg.orb, img.shape))
            return extractors[key](np.asarray(img))

        batch_resp = []
        for sd, a, fb, Ta, Tb in pairs:
            cfg = cfg_of(sd)
            im_a = ds.load_image_gray(a.image)
            im_b = ds.load_image_gray(fb.image)
            dp_a = ds.load_depth(a.depth, cfg.depth_map_factor)
            fa, _ = extract(sd, im_a)
            fb_, _ = extract(sd, im_b)
            bits_a = np.asarray(orb.unpack_descriptors_signed(fa.desc)) > 0
            bits_b = np.asarray(orb.unpack_descriptors_signed(fb_.desc)) > 0
            va = np.asarray(fa.valid)
            vb = np.asarray(fb_.valid)
            xya = np.asarray(fa.xy)
            xyb = np.asarray(fb_.xy)
            # bit statistics over all valid keypoints of frame A
            ones[b * 256:(b + 1) * 256] += bits_a[va].sum(0)
            count[b * 256:(b + 1) * 256] += va.sum()
            batch_resp.append(bits_a[va])
            # GT correspondence: unproject A, reproject into B
            z = np.asarray(dp_a)[
                np.clip(xya[:, 1].astype(int), 0, dp_a.shape[0] - 1),
                np.clip(xya[:, 0].astype(int), 0, dp_a.shape[1] - 1)]
            okz = va & (z > 0.05)
            fx, fy, cx, cy = cfg.K
            Xc = np.stack([(xya[:, 0] - cx) / fx * z,
                           (xya[:, 1] - cy) / fy * z, z], -1)
            # groundtruth.txt stores Twc; point to world then into B
            Ra, ta = Ta[:3, :3], Ta[:3, 3]
            Rb, tb = Tb[:3, :3], Tb[:3, 3]
            Xw = Xc @ Ra.T + ta
            Xb = (Xw - tb) @ Rb
            good = okz & (Xb[:, 2] > 0.05)
            ub = Xb[:, 0] / np.maximum(Xb[:, 2], 1e-9) * fx + cx
            vb_ = Xb[:, 1] / np.maximum(Xb[:, 2], 1e-9) * fy + cy
            # nearest B keypoint within 1.5 px
            d2 = (ub[:, None] - xyb[None, :, 0]) ** 2 + (
                vb_[:, None] - xyb[None, :, 1]) ** 2
            d2[:, ~vb] = 1e9
            j = np.argmin(d2, axis=1)
            match = good & (d2[np.arange(len(j)), j] < 1.5 ** 2)
            if match.sum() > 0:
                fa_bits = bits_a[match]
                fb_bits = bits_b[j[match]]
                flips[b * 256:(b + 1) * 256] += (fa_bits != fb_bits).sum(0)
                nmatch[b * 256:(b + 1) * 256] += match.sum()
        resp = np.concatenate(batch_resp, 0)
        if len(resp) > MAX_KP_STORE:
            sel = np.random.default_rng(0).choice(
                len(resp), MAX_KP_STORE, replace=False)
            resp = resp[sel]
        resp_store[b] = resp
        print(f"batch {b + 1}/{n_batches} done ({time.time() - t0:.0f}s), "
              f"kp={count[b * 256]} matches={nmatch[b * 256]}", flush=True)

    set_pattern(orig_pattern)

    mean = ones / np.maximum(count, 1)
    flip = flips / np.maximum(nmatch, 1)
    # score: discriminative (mean near .5) and stable (low flip rate)
    score = np.abs(mean - 0.5) + 2.0 * flip
    order = np.argsort(score)

    # align response subsamples to one common keypoint count
    n_common = min(len(r) for r in resp_store)
    R = np.concatenate([r[:n_common] for r in resp_store], axis=1)  # [n, M]
    Rf = R.astype(np.float32)
    mu = Rf.mean(0)
    sd = Rf.std(0) + 1e-6

    selected = []
    th = CORR_START
    while len(selected) < N_SELECT and th <= 1.0:
        for c in order:
            if len(selected) >= N_SELECT:
                break
            if c in selected:
                continue
            if not selected:
                selected.append(c)
                continue
            v = (Rf[:, c] - mu[c]) / sd[c]
            ok = True
            for s in selected:
                corr = float(np.mean(v * (Rf[:, s] - mu[s]) / sd[s]))
                if abs(corr) > th:
                    ok = False
                    break
            if ok:
                selected.append(c)
        th += 0.05
        print(f"corr<= {th:.2f}: {len(selected)} selected", flush=True)

    sel = np.array(selected[:N_SELECT])
    pat = cand[sel]
    np.savez("/tmp/pattern_stats.npz", cand=cand, mean=mean, flip=flip,
             sel=sel, R=R.astype(np.uint8))
    print(f"selected {len(sel)}: mean|m-0.5|={np.abs(mean[sel]-0.5).mean():.3f} "
          f"flip={flip[sel].mean():.3f}  "
          f"(all candidates: {np.abs(mean-0.5).mean():.3f} / {flip.mean():.3f}; "
          f"deployed-generator baseline flip would need separate run)")
    np.save(out_path, pat.astype(np.int32))
    print("saved", out_path)


if __name__ == "__main__":
    main()
