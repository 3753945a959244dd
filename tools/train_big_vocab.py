"""Train the LARGE (~100k-word) vocabulary (VERDICT r4 item 5): the
reference's ORBvoc operating point is ~1M words from ~16M descriptors
(TemplatedVocabulary.h:241); this trains k=10 depth=5 (100k leaves) from
every frame of the on-disk synthetic sequences — the same ~7:1
descriptor:leaf ratio — for the inverted-file KeyFrameDatabase path.

usage: python tools/train_big_vocab.py [out.npz]
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
        "orb_slam2_comment_tpu", "assets", "voc_synth_100k.npz")
    root = os.path.join(os.path.dirname(__file__), "..", "data", "synth")

    paths = (
        sorted(glob.glob(os.path.join(root, "desk", "rgb", "*.png")))
        + sorted(glob.glob(os.path.join(root, "room_loop", "rgb", "*.png")))
        + sorted(glob.glob(os.path.join(root, "street", "image_0", "*.png")))
        + sorted(glob.glob(os.path.join(root, "street", "image_1", "*.png")))
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
        if i % 100 == 0:
            print(f"  {i}/{len(paths)} ({time.time() - t0:.0f}s)", flush=True)
    all_desc = np.concatenate(descs)
    print(f"total descriptors: {len(all_desc)}", flush=True)

    t0 = time.time()
    voc = bow.train_vocabulary(all_desc, k=10, depth=5, levels_up=3,
                               seed=0, iters=4)
    print(f"trained {voc.n_words} words / {voc.n_nodes} nodes "
          f"in {time.time() - t0:.0f}s", flush=True)
    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    bow.save_vocabulary(out, voc)
    print("saved", out, os.path.getsize(out) // 1024, "KB", flush=True)

    # round-trip through the DBoW2 text format (the csrc parser path)
    txt = out.replace(".npz", ".txt")
    bow.save_orb_vocab_text(txt, voc)
    print("text export:", txt, os.path.getsize(txt) // 1024, "KB", flush=True)


if __name__ == "__main__":
    main()
