"""Minimal repro for a shape-specific XLA:TPU runtime fault.

The (n_features=600, n_levels=4, max_keyframes=64, max_points=16384)
capacity combination deterministically faults the XLA:TPU runtime inside
the plain-XLA keyframe-create program (`tracking._create_keyframe_kernel`)
on a v5e (reproduced 2026-08-21; jax 0.9.0 over the axon attachment).
Each half of the combination — (600, 4) features with other capacities,
or (64, 16384) capacities with other feature budgets — compiles and runs
fine alone, which points at an upstream compiler/runtime fault rather
than anything in this repo's program.

`SlamConfig.__post_init__` guards the combination (warns + bumps
max_keyframes to 128). Run this script on a TPU host to re-check whether
a newer jaxlib still faults:

    python tools/repro_xla_kfcreate_fault.py          # guarded (should run)
    python tools/repro_xla_kfcreate_fault.py --raw    # unguarded repro

Exit 0 = no fault. A hard runtime abort/segfault = still broken upstream.
"""

import argparse
import dataclasses
import sys

sys.path.insert(0, ".")

import jax.numpy as jnp
import numpy as np

from orb_slam2_comment_tpu.models import map_state as ms
from orb_slam2_comment_tpu.models import tracking as trk
from orb_slam2_comment_tpu.ops.orb import FrameFeatures
from orb_slam2_comment_tpu.utils.config import SlamConfig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--raw", action="store_true",
                    help="bypass the __post_init__ guard (real repro)")
    args = ap.parse_args()

    cfg = SlamConfig(
        sensor="rgbd", n_features=600, n_levels=4,
        max_keyframes=64, max_points=16384, grow_capacity=False,
    )
    if args.raw:
        # undo the guard's auto-bump to reproduce the fault
        object.__setattr__(cfg, "max_keyframes", 64)
    print(f"capacities: kmax={cfg.max_keyframes} pmax={cfg.max_points}")

    n_slots = sum(cfg.orb.level_budgets())
    m = ms.empty_map(cfg.max_keyframes, cfg.max_points, n_slots)
    rng = np.random.default_rng(0)
    feats = FrameFeatures(
        xy=jnp.asarray(rng.uniform(0, 400, (n_slots, 2)), jnp.float32),
        response=jnp.zeros(n_slots, jnp.float32),
        angle=jnp.zeros(n_slots, jnp.float32),
        octave=jnp.zeros(n_slots, jnp.int32),
        desc=jnp.asarray(rng.integers(0, 2**32, (n_slots, 8), dtype=np.uint32)),
        valid=jnp.ones(n_slots, bool),
    )
    depth = jnp.asarray(rng.uniform(0.5, 5.0, n_slots), jnp.float32)
    uright = feats.xy[:, 0] - cfg.bf / depth
    m, n_created, _ = trk._create_keyframe_kernel(
        m,
        jnp.asarray(0, jnp.int32),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(0.0, jnp.float32),
        jnp.eye(4),
        feats,
        uright,
        depth,
        jnp.full(n_slots, -1, jnp.int32),
        jnp.asarray(-1, jnp.int32),
        cfg,
        max_new=n_slots,
        create_all_depth=True,
    )
    print(f"kf-create OK: {int(n_created)} points")


if __name__ == "__main__":
    main()
