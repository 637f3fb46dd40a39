"""Test configuration: run everything on the JAX CPU backend with 8 virtual
devices so multi-chip sharding tests need no real TPU (SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell may preset axon/tpu
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache: XLA recompiles are the dominant test cost.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
