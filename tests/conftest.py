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

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
