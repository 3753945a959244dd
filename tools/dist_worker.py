"""Multi-process distributed-BA worker (SURVEY §4.4's jax.distributed
CPU test): one OS process per "host", each owning 4 virtual CPU devices,
joined into one 8-device global mesh over the distributed runtime — the
actual multi-host initialization/codepath the single-process dryrun
cannot exercise.

Usage (spawned by tests/test_multiprocess.py):
  python tools/dist_worker.py <proc_id> <n_proc> <coordinator_port>
"""
import os
import sys

proc_id = int(sys.argv[1])
n_proc = int(sys.argv[2])
port = sys.argv[3]

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}",
    num_processes=n_proc,
    process_id=proc_id,
)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

assert jax.process_count() == n_proc, jax.process_count()
assert jax.device_count() == 4 * n_proc, jax.device_count()
assert jax.local_device_count() == 4

from orb_slam2_comment_tpu.parallel import dist_ba  # noqa: E402
from orb_slam2_comment_tpu.ops import optim  # noqa: E402

# identical problem on every process (same seed)
prob, cams_gt, X_gt = dist_ba.make_synthetic_ba_problem(
    n_cams=8, n_pts=256, obs_per_cam=96, seed=0)
inv_s2 = jnp.asarray([1.0 / (1.2 ** (2 * l)) for l in range(8)])
K = (500.0, 500.0, 320.0, 240.0)
BF = 100.0

mesh = dist_ba.make_mesh()  # all 8 global devices, 2 processes
res = dist_ba.distributed_global_ba(prob, inv_s2, K, BF, mesh, iters=4)

# pose error vs ground truth must shrink vs the perturbed start
from orb_slam2_comment_tpu.ops import geometry as geo  # noqa: E402

def pose_err(T):
    d = 0.0
    for c in range(8):
        d += float(np.linalg.norm(
            np.asarray(T[c][:3, 3]) - cams_gt[c][:3, 3]))
    return d

e0 = pose_err(np.asarray(prob.cam_T))
e1 = pose_err(np.asarray(res.cam_T))
print(f"proc {proc_id}: pose err {e0:.4f} -> {e1:.4f}", flush=True)
assert e1 < 0.5 * e0, (e0, e1)
print(f"DIST_OK {proc_id} {e1:.6f}", flush=True)
