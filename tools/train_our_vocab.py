"""Train this framework's offline ORB vocabulary (VERDICT r1 item 5).

Extracts descriptors with OUR extractor (ops/orb.py — the vocabulary must
match the deployed descriptor distribution, which uses a generated BRIEF
pattern, not the reference's bit_pattern_31_) from the on-disk textured
sequences, trains a k=10 depth=4 binary k-medians tree (~10k words,
FeatureVector grouping at depth 2 — the same group granularity as the
reference's L=6/levelsup=4 ORBvoc, TemplatedVocabulary.h:135-146), and
ships it as a committed asset.

usage: python tools/train_our_vocab.py [out.npz]
"""

import glob
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    from orb_slam2_comment_tpu.ops import bow, orb
    from orb_slam2_comment_tpu.utils.datasets import load_image_gray

    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "..",
        "orb_slam2_comment_tpu", "assets", "voc_synth.npz")
    root = os.path.join(os.path.dirname(__file__), "..", "data", "synth")

    paths = (
        sorted(glob.glob(os.path.join(root, "desk", "rgb", "*.png")))[::2]
        + sorted(glob.glob(os.path.join(root, "room_loop", "rgb", "*.png")))[::3]
        + sorted(glob.glob(os.path.join(root, "street", "image_0", "*.png")))[::2]
    )
    if not paths:
        sys.exit("no training images; run tools/make_datasets.py first")
    print(f"extracting from {len(paths)} images ...", flush=True)

    cfg = orb.ORBConfig(n_features=1000, n_levels=8)
    descs = []
    t0 = time.time()
    for i, p in enumerate(paths):
        img = load_image_gray(p)
        ff, _ = orb.extract(jax.numpy.asarray(img), cfg)
        d = np.asarray(ff.desc)[np.asarray(ff.valid)]
        descs.append(d)
        if i % 50 == 0:
            print(f"  {i}/{len(paths)} ({time.time() - t0:.0f}s)", flush=True)
    all_desc = np.concatenate(descs)
    print(f"total descriptors: {len(all_desc)}", flush=True)

    t0 = time.time()
    voc = bow.train_vocabulary(all_desc, k=10, depth=4, levels_up=2,
                               seed=0, iters=6)
    print(f"trained {voc.n_words} words / {voc.n_nodes} nodes "
          f"in {time.time() - t0:.0f}s", flush=True)
    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    bow.save_vocabulary(out, voc)
    print("saved", out, os.path.getsize(out) // 1024, "KB")


if __name__ == "__main__":
    main()
