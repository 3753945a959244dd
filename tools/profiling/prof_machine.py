"""Per-phase timing of the chunked mapper machine on the live device.

Builds a realistic map with the bench workload, then pumps the machine
phase-by-phase with blocking timing. Each number includes one tunnel
round trip (~25ms on the dev attachment); compare phases against each
other, not against zero. Second sweep is the warm one.

Usage: python tools/profiling/prof_machine.py [n_frames]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from orb_slam2_comment_tpu.models import local_mapping as lm
    from orb_slam2_comment_tpu.models import tracking as trk
    from orb_slam2_comment_tpu.models.system import System
    from orb_slam2_comment_tpu.utils import synthetic as syn
    from orb_slam2_comment_tpu.utils.config import SlamConfig

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 70
    K = syn.DEFAULT_K
    cfg = SlamConfig(
        sensor="rgbd",
        fx=K[0], fy=K[1], cx=K[2], cy=K[3],
        bf=K[0] * syn.DEFAULT_BASELINE,
        n_features=1000, n_levels=8,
        max_keyframes=128, max_points=32768,
        grow_capacity=False, match_th_scale=1.5,
        depth_map_factor=1000.0,
    )
    scene = syn.make_scene(n_points=3200, seed=0, extent=(8.0, 5.0, 8.0),
                           z_near=1.0)
    poses = syn.make_trajectory("forward", n_frames=n_frames, step=0.025)
    system = System(cfg)
    for f in syn.render_sequence(scene, poses, K=K, depth=True):
        im = np.clip(f["image"], 0, 255).astype(np.uint8)
        dm = np.clip(f["depth"] * 1000.0, 0, 65535).astype(np.uint16)
        system.track_rgbd(im, dm, f["timestamp"])
    t = system.tracker
    t._flush_all()
    print(f"map: kfs={t.n_kfs} pts={int(np.asarray(t.map.pt_valid).sum())}")

    names = lm._phase_list(t.cfg)
    for sweep in range(2):
        t.ds = t.ds._replace(mp=t.ds.mp._replace(
            phase=jnp.asarray(1, jnp.int32),
            kf=jnp.asarray(t.ref_kf, jnp.int32)))
        total = 0.0
        for nm in names:
            t0 = time.perf_counter()
            m2, n2, oc2, mp2 = trk._mapper_pump(
                t.map, t.ds.n_pts, t.ds.obs_counts, t.ds.mp, t.cfg)
            jax.block_until_ready(m2.kf_pose)
            dt = (time.perf_counter() - t0) * 1e3
            total += dt
            t.map = m2
            t.ds = t.ds._replace(n_pts=n2, obs_counts=oc2, mp=mp2)
            if sweep:
                print(f"  {str(nm):24s} {dt:7.1f} ms")
        print(f"sweep {sweep}: total {total:.0f} ms over {len(names)} phases")

    # reference point: one empty (idle) pump = dispatch + RTT floor
    for _ in range(2):
        t0 = time.perf_counter()
        m2, n2, oc2, mp2 = trk._mapper_pump(
            t.map, t.ds.n_pts, t.ds.obs_counts, t.ds.mp, t.cfg)
        jax.block_until_ready(m2.kf_pose)
        print(f"idle pump: {(time.perf_counter() - t0) * 1e3:.1f} ms")
        t.map = m2
        t.ds = t.ds._replace(n_pts=n2, obs_counts=oc2, mp=mp2)


if __name__ == "__main__":
    main()
