"""Mono init experiments: run diag_mono's pipeline with variations.

Usage: python tools/diag_mono_exp.py <variant> [n_frames]
variants: base | feats2000 | gate100
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

VAR = sys.argv[1] if len(sys.argv) > 1 else "base"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 400


def main():
    from orb_slam2_comment_tpu import constants as C
    from examples.run_dataset import run
    from tools.head_to_head import eval_tum, load_tum_traj, associate
    from orb_slam2_comment_tpu.utils import trajectory as traj

    settings = "data/synth/desk/settings.yaml"
    if VAR == "feats2000":
        settings = "/tmp/mono_exp/settings2000.yaml"
    elif VAR == "gate100":
        C.INIT_MIN_TRIANGULATED = 100
    elif VAR in ("free32", "nn20", "free32nn20"):
        import dataclasses
        from orb_slam2_comment_tpu.utils import config as cfgmod
        orig_load = cfgmod.load_yaml_settings

        def patched(path, sensor):
            cfg = orig_load(path, sensor)
            kw = {}
            if "free32" in VAR:
                kw.update(ba_free_kfs=32)
            if "nn20" in VAR:
                kw.update(tri_neighbors=20, fuse_neighbors=20)
            return dataclasses.replace(cfg, **kw)

        cfgmod.load_yaml_settings = patched
        import examples.run_dataset as rd
        # run_dataset imported load_yaml_settings inside run() from
        # utils.config, so the monkeypatch above is picked up.

    out = f"/tmp/mono_exp/{VAR}"
    os.makedirs(out, exist_ok=True)
    system = run(
        "monocular", "tum_mono", "data/synth/desk",
        settings=settings, vocabulary=None,
        out_prefix=os.path.join(out, "traj"), max_frames=N,
    )
    gt = "data/synth/desk/groundtruth.txt"
    res = eval_tum(os.path.join(out, "traj_tum.txt"), gt, with_scale=True)
    print(f"# [{VAR}] full: {res}")
    ts_e, T_e = load_tum_traj(os.path.join(out, "traj_tum.txt"))
    ts_g, T_g = load_tum_traj(gt)
    ia, ib = associate(ts_e, ts_g)
    ce, cg = T_e[ia][:, :3, 3], T_g[ib][:, :3, 3]
    aligned, (s, _, _) = traj.umeyama_align(ce, cg, with_scale=True)
    err = np.linalg.norm(aligned - cg, axis=1)
    head = err[: len(err) // 4]
    tail = err[len(err) // 4:]
    print(f"# [{VAR}] p50={np.median(err)*1e3:.1f} p90="
          f"{np.percentile(err,90)*1e3:.1f} max={err.max()*1e3:.1f}mm; "
          f"head_q 50/90: {np.median(head)*1e3:.1f}/"
          f"{np.percentile(head,90)*1e3:.1f} tail_q: "
          f"{np.median(tail)*1e3:.1f}/{np.percentile(tail,90)*1e3:.1f}")


if __name__ == "__main__":
    main()
