"""Test environment: force CPU backend with an 8-device virtual mesh.

Multi-chip sharding paths are validated on a virtual CPU mesh (the standard
JAX way to test pjit/shard_map without a pod); the driver separately
dry-run-compiles the multichip path via __graft_entry__.dryrun_multichip.

Note: this environment pre-registers a TPU ('axon') backend via
sitecustomize before conftest runs, so setting JAX_PLATFORMS in os.environ
is not enough — we must override through jax.config before any backend is
instantiated.
"""

import os

RUN_TPU_TESTS = os.environ.get("RUN_TPU_TESTS", "") not in ("", "0")

flags = os.environ.get("XLA_FLAGS", "")
if not RUN_TPU_TESTS and "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not RUN_TPU_TESTS:
    # default suite: forced 8-device virtual CPU mesh. RUN_TPU_TESTS=1
    # leaves the real backend registered so tests/test_tpu_parity.py can
    # validate the shipped Pallas kernels on hardware (the verify
    # workflow runs exactly that module on the chip).
    jax.config.update("jax_platforms", "cpu")
# XLA:CPU executable serialization segfaults on this host (observed inside
# compilation_cache.put_executable_and_time during test_optim); the
# persistent cache only pays off for the tunnel-TPU backend anyway.
jax.config.update("jax_enable_compilation_cache", False)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """XLA:CPU segfaults inside backend_compile once enough programs have
    accumulated in one process (reproducibly at the same point of a full
    run, while every module passes in isolation). Dropping the in-process
    executable caches between modules keeps the compiler healthy at the
    cost of recompiling shared kernels per module."""
    yield
    jax.clear_caches()
