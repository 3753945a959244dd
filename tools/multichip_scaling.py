"""Multi-chip scaling evidence on the virtual CPU mesh (VERDICT r1 item 8).

Real multi-chip hardware is not reachable from this environment, so this
tool produces the two honest proxies available:

1. **Collective inventory** — for each mesh size, compile the distributed
   GBA / sparse pose graph and count the GSPMD-inserted collectives and
   their per-iteration byte volume from the optimized HLO. This is the
   quantity that rides ICI on a real slice; constant volume per device
   count (O(state), not O(observations)) is what makes weak scaling work.
2. **Wall-time trend** — executed on the virtual CPU mesh. NOTE: this
   host has 2 physical cores, so times measure overhead trends, not
   speedup; the collective inventory is the load-bearing evidence.

usage: python tools/multichip_scaling.py [max_devices]
Prints one JSON line per mesh size + a summary.
"""

import json
import os
import sys
import time

N_MAX = int(sys.argv[1]) if len(sys.argv) > 1 else 8
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={N_MAX}"
    ).strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_compilation_cache", False)  # see conftest.py

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import re  # noqa: E402

from orb_slam2_comment_tpu.ops import optim  # noqa: E402
from orb_slam2_comment_tpu.parallel import dist_ba  # noqa: E402

DTYPE_BYTES = {"f32": 4, "f64": 8, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
               "pred": 1, "s8": 1, "u8": 1}


def collective_bytes(hlo_text):
    """Count collectives and their payload bytes in optimized HLO."""
    out = {"all-reduce": [0, 0], "all-gather": [0, 0],
           "reduce-scatter": [0, 0], "collective-permute": [0, 0]}
    pat = re.compile(
        r"=\s*(?:\(([^)]*)\)|(\S+))\s+"
        r"(all-reduce|all-gather|reduce-scatter|collective-permute)\b")
    for m in pat.finditer(hlo_text):
        shapes = m.group(1) if m.group(1) else m.group(2)
        kind = m.group(3)
        total = 0
        for sm in re.finditer(r"(\w+)\[([\d,]*)\]", shapes):
            dt, dims = sm.group(1), sm.group(2)
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            total += n * DTYPE_BYTES.get(dt, 4)
        out[kind][0] += 1
        out[kind][1] += total
    return {k: {"ops": v[0], "bytes": v[1]} for k, v in out.items()
            if v[0] > 0}


def main():
    K = (500.0, 500.0, 320.0, 240.0)
    bf = 100.0
    inv_s2 = jnp.asarray([1.0 / (1.2 ** (2 * l)) for l in range(8)])
    # KITTI-00-ish scale: 256 KFs, 16k points, ~64k observations
    prob, _, _ = dist_ba.make_synthetic_ba_problem(
        n_cams=256, n_pts=16384, obs_per_cam=256)
    GBA_ITERS, CG = 2, 10

    # sparse pose graph at 1.3k KFs
    Kn = 1300
    S0 = jnp.tile(jnp.eye(4), (Kn, 1, 1))
    ei = jnp.concatenate([jnp.arange(Kn - 1, dtype=jnp.int32),
                          jnp.zeros(1, jnp.int32)])
    ej = jnp.concatenate([jnp.arange(1, Kn, dtype=jnp.int32),
                          jnp.asarray([Kn - 1], jnp.int32)])
    Sji = jnp.tile(jnp.eye(4), (Kn, 1, 1))
    ev = jnp.ones(Kn, bool)
    kfv = jnp.ones(Kn, bool)
    kff = jnp.zeros(Kn, bool).at[0].set(True)

    results = []
    for n in [1, 2, 4, 8]:
        if n > N_MAX or n > len(jax.devices()):
            break
        mesh = dist_ba.make_mesh(jax.devices()[:n])
        sharded = dist_ba.shard_problem(prob, mesh)
        with jax.set_mesh(mesh):
            lowered = optim.global_bundle_adjustment.lower(
                sharded, inv_s2, K, bf, iters=GBA_ITERS, cg_iters=CG)
            compiled = lowered.compile()
            txt = compiled.as_text()
            t0 = time.perf_counter()
            r = compiled(sharded, inv_s2)
            jax.tree.map(
                lambda x: x.block_until_ready() if hasattr(
                    x, "block_until_ready") else x, r)
            gba_t = time.perf_counter() - t0
        gba_coll = collective_bytes(txt)

        t0 = time.perf_counter()
        pg = dist_ba.distributed_essential_graph_sparse(
            S0, kfv, kff, ei, ej, Sji, ev, mesh, fix_scale=True,
            iters=1, cg_iters=50)
        pg_t = time.perf_counter() - t0
        row = {
            "mesh": n,
            "gba_wall_s": round(gba_t, 3),
            "gba_collectives": gba_coll,
            "pg_sparse_wall_s": round(pg_t, 3),
            "obs_per_device": int(sharded.obs_cam.shape[0] // n),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    print("\nsummary (per LM iter, GBA 256 KF / 16k pts / 64k obs):")
    for r in results:
        ar = r["gba_collectives"].get("all-reduce", {"ops": 0, "bytes": 0})
        print(f"  mesh={r['mesh']}: all-reduce ops={ar['ops']} "
              f"bytes={ar['bytes']/1e6:.2f}MB "
              f"obs/device={r['obs_per_device']} wall={r['gba_wall_s']}s")


if __name__ == "__main__":
    main()
