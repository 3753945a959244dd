"""Loop-detection precision/recall at vocabulary scale (VERDICT r4 #5/#weak6).

Builds a >=500-keyframe place-recognition workload from the textured room
renderer: two traversals of the same room orbit (the second with pose
jitter, so revisits are near- but not exact-duplicates), extracts ORB per
"keyframe", indexes the FIRST traversal in a KeyFrameDatabase, and
queries every SECOND-traversal keyframe. A query is a hit if the
top-scoring candidate's ground-truth pose lies within (0.35m, 12deg) of
the query's. Reports recall@1 and the DetectLoopCandidates-style gate
stats for the shipped ~10k vocabulary AND the 100k inverted-file one.

usage: python tools/eval_vocab_pr.py [n_kfs] [voc.npz ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    import jax.numpy as jnp
    from orb_slam2_comment_tpu.models.keyframe_database import KeyFrameDatabase
    from orb_slam2_comment_tpu.ops import bow, orb
    from orb_slam2_comment_tpu.utils import render as rr

    n_kfs = int(sys.argv[1]) if len(sys.argv) > 1 else 560
    vocs = sys.argv[2:] or [
        "orb_slam2_comment_tpu/assets/voc_synth.npz",
        "orb_slam2_comment_tpu/assets/voc_synth_100k.npz",
    ]
    half = n_kfs // 2
    K = (520.0, 520.0, 320.0, 240.0)

    scene = rr.make_room(seed=3, size=(8.0, 3.0, 8.0), n_boxes=6)
    base = rr.room_loop_trajectory(half, radius=1.6, loops=1.0)
    r = np.random.default_rng(7)
    jit = []
    for T in base:
        d = np.eye(4, dtype=np.float32)
        d[:3, :3] = _rotvec(r.normal(0, 0.004, 3))
        d[:3, 3] = r.normal(0, 0.05, 3)
        jit.append((d @ T).astype(np.float32))
    poses = np.concatenate([base, np.stack(jit)])

    cfg = orb.ORBConfig(n_features=1000, n_levels=8)
    cache = f"/tmp/eval_vocab_pr_desc_{n_kfs}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        descs = list(z["descs"])
        valids = list(z["valids"])
        print(f"loaded cached descriptors {cache}", flush=True)
    else:
        descs, valids = [], []
        t0 = time.time()
        for i, T in enumerate(poses):
            img, _ = rr.render_quads(scene, T, K)
            ff, _ = orb.extract(jnp.asarray(img.astype(np.float32)), cfg)
            descs.append(np.asarray(ff.desc))
            valids.append(np.asarray(ff.valid))
            if i % 50 == 0:
                print(f"  render+extract {i}/{len(poses)} "
                      f"({time.time()-t0:.0f}s)", flush=True)
        np.savez_compressed(cache, descs=np.stack(descs),
                            valids=np.stack(valids))

    def centers(Ts):
        return np.stack([-T[:3, :3].T @ T[:3, 3] for T in Ts])

    c_all = centers(poses)
    fwd_all = np.stack([T[:3, :3].T @ [0, 0, 1] for T in poses])

    for vpath in vocs:
        if not os.path.exists(vpath):
            print(f"[skip] {vpath} missing", flush=True)
            continue
        voc = bow.load_vocabulary(vpath)
        db = KeyFrameDatabase(voc, max_kfs=half,
                              n_feat=descs[0].shape[0])
        for k in range(half):
            db.add(k, jnp.asarray(descs[k]), jnp.asarray(valids[k]))
        hits = at2 = 0
        n_q = 0
        margins = []
        tq0 = time.time()
        for q in range(half, len(poses)):
            words, _, vec = bow.transform(
                voc, jnp.asarray(descs[q]), jnp.asarray(valids[q]))
            if db.sparse:
                sc, cm = db.scores_device(q_words_feat=words)
            else:
                from orb_slam2_comment_tpu.models.keyframe_database import (
                    _scores_kernel)
                sc, cm = _scores_kernel(db.bow, db.valid, vec)
            sc = np.asarray(sc)[:half]
            top = int(np.argmax(sc))
            order = np.argsort(-sc)
            d = np.linalg.norm(c_all[:half] - c_all[q], axis=1)
            ang = np.degrees(np.arccos(np.clip(
                fwd_all[:half] @ fwd_all[q], -1, 1)))
            good = (d < 0.35) & (ang < 12.0)
            if not good.any():
                continue
            n_q += 1
            hits += bool(good[top])
            at2 += bool(good[order[:2]].any())
            # score margin of best-true over best-false
            st = sc[good].max()
            sf = sc[~good].max()
            margins.append(st - sf)
        mode = "sparse/inverted-file" if db.sparse else "dense"
        print(f"[{os.path.basename(vpath)}] W={voc.n_words} mode={mode} "
              f"queries={n_q} recall@1={hits/max(n_q,1):.3f} "
              f"recall@2={at2/max(n_q,1):.3f} "
              f"median_margin={np.median(margins):+.4f} "
              f"({(time.time()-tq0)/max(n_q,1)*1e3:.1f} ms/query)",
              flush=True)


def _rotvec(v):
    th = np.linalg.norm(v)
    if th < 1e-12:
        return np.eye(3, dtype=np.float32)
    k = v / th
    Kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return (np.eye(3) + np.sin(th) * Kx
            + (1 - np.cos(th)) * Kx @ Kx).astype(np.float32)


if __name__ == "__main__":
    main()
