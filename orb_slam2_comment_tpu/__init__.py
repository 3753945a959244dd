"""orb_slam2_comment_tpu — a TPU-native visual SLAM framework.

A from-scratch redesign of the capabilities of ORB-SLAM2 (reference:
vigorbird/ORB_SLAM2_comment, C++/pthreads/OpenCV/g2o) as a JAX/XLA/Pallas
framework:

- Feature extraction (oriented multi-scale FAST + rotated binary descriptors)
  as dense, fixed-shape batched kernels (`ops.orb`).
- All data association (the reference's ORBmatcher Hamming searches) as
  masked Hamming-distance matrix ops that ride the MXU (`ops.matching`).
- The reference's g2o optimizer stack (pose-only BA, local BA with Schur
  complement on landmarks, Sim3, essential-graph pose optimization) as a
  batched Levenberg–Marquardt solver with autodiff Jacobians (`ops.optim`).
- The Tracking / LocalMapping / LoopClosing pthread pipeline as a functional
  keyframe pipeline over a struct-of-arrays map state (`models.*`).
- Distributed bundle adjustment across a `jax.sharding.Mesh` with
  psum-reduced Schur systems (`parallel.*`).

Reference parity notes cite the C++ source as `<file>:<line>` relative to
the reference repo root.
"""

import jax as _jax
import os as _os0

# Escape hatch for tunnel-TPU outages and CPU-only CI: setting
# ORB_SLAM2_TPU_FORCE_CPU=1 pins the CPU backend before any jax use
# (the env var JAX_PLATFORMS alone is ignored here — sitecustomize
# registers the axon TPU backend first; see CLAUDE.md).
if _os0.environ.get("ORB_SLAM2_TPU_FORCE_CPU", "") not in ("", "0"):
    _jax.config.update("jax_platforms", "cpu")
    # XLA:CPU executable serialization segfaults on this host; the
    # persistent cache is for the tunnel-TPU backend only
    _jax.config.update("jax_enable_compilation_cache", False)

# Geometry/solver math is float32 and relies on exact f32 matmuls (3x3/6x6
# Lie-group and normal-equation blocks). On TPU the default matmul precision
# lowers f32 to bf16 passes, which destroys SO3 log/exp roundtrips and LM
# convergence. Force full-precision f32 matmuls globally; the FLOP-heavy
# kernels (Hamming matching, Schur outer products) opt into bf16 explicitly
# by casting their inputs, so MXU throughput is unaffected where it matters.
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the per-frame fused programs take 30-150s
# to compile per (sensor, resolution, budget) config; caching makes every
# process after the first start in seconds.
import os as _os  # noqa: E402

# The cache dir is fingerprinted by host CPU features + jaxlib version:
# XLA:CPU entries are AOT machine code, and loading an executable compiled
# on a host with different ISA extensions segfaults (observed as 'Fatal
# Python error' inside compilation_cache.get_executable_and_time when a
# cache dir migrates across dev machines).
def _host_fingerprint():
    import hashlib

    key = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    key = line
                    break
    except OSError:
        pass
    try:
        import jaxlib

        key += jaxlib.__version__
    except Exception:
        pass
    return hashlib.md5(key.encode()).hexdigest()[:10]


_cache_dir = _os.environ.get(
    "ORB_SLAM2_TPU_JIT_CACHE",
    _os.path.join(_os.path.expanduser("~"), ".cache", "orb_slam2_tpu_jit",
                  _host_fingerprint()),
)
try:  # pragma: no cover - best effort
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass

from orb_slam2_comment_tpu import constants  # noqa: F401,E402

__version__ = "0.1.0"
