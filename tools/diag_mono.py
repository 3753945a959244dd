"""Monocular accuracy diagnosis (VERDICT r4 item 3).

Runs the monocular pipeline on data/synth/desk (the r3 mono h2h setup),
saves trajectories, and prints Sim3-aligned ATE for both the full and the
keyframe trajectory plus per-segment error structure, so the 276mm-class
failure can be localized (init scale, drift, or bursts).

Usage: DIAG_CPU=1 python tools/diag_mono.py [n_frames] [seq]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

if os.environ.get("DIAG_CPU", "1") == "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 400
SEQ = sys.argv[2] if len(sys.argv) > 2 else "desk"


def main():
    from examples.run_dataset import run
    from tools.head_to_head import eval_tum, load_tum_traj, associate

    seq_dir = f"data/synth/{SEQ}"
    out = "/tmp/mono_diag"
    os.makedirs(out, exist_ok=True)
    system = run(
        "monocular", "tum_mono", seq_dir,
        settings=os.path.join(seq_dir, "settings.yaml"),
        vocabulary=None,
        out_prefix=os.path.join(out, "traj"),
        max_frames=N,
    )
    t = system.tracker
    print(f"# kfs={t.n_kfs} pts={int(np.asarray(t.map.pt_valid).sum())} "
          f"resets={system.n_resets}")

    gt = os.path.join(seq_dir, "groundtruth.txt")
    for name, path in [("full", os.path.join(out, "traj_tum.txt")),
                       ("kf", os.path.join(out, "traj_kf_tum.txt"))]:
        res = eval_tum(path, gt, with_scale=True)
        print(f"# {name}: {res}")

    # per-frame aligned error profile (where is the error?)
    from orb_slam2_comment_tpu.utils import trajectory as traj
    ts_e, T_e = load_tum_traj(os.path.join(out, "traj_tum.txt"))
    ts_g, T_g = load_tum_traj(gt)
    ia, ib = associate(ts_e, ts_g)
    ce, cg = T_e[ia][:, :3, 3], T_g[ib][:, :3, 3]
    aligned, (s, _, _) = traj.umeyama_align(ce, cg, with_scale=True)
    err = np.linalg.norm(aligned - cg, axis=1)
    print(f"# scale={s:.3f} err p50={np.median(err)*1e3:.1f}mm "
          f"p90={np.percentile(err, 90)*1e3:.1f}mm "
          f"max={err.max()*1e3:.1f}mm at frame {ia[err.argmax()]}")
    step = max(len(err) // 40, 1)
    for i in range(0, len(err), step):
        print(f"  f{ia[i]:4d} err={err[i]*1e3:8.1f}mm")


if __name__ == "__main__":
    main()
