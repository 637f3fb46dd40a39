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
# (This JAX build ignores the env vars, so configure programmatically.)
import jax  # noqa: E402

# The environment's sitecustomize (PYTHONPATH=/root/.axon_site, gated on
# PALLAS_AXON_POOL_IPS) has already run jax.config.update("jax_platforms",
# "axon,cpu") at interpreter startup — config outranks the env var, so the
# JAX_PLATFORMS=cpu above is silently ignored and the whole suite would run
# on the single remote TPU chip through the tunnel.  Override the config
# directly; this is the only reliable in-process fix.
jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
try:
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
except Exception:
    pass


import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _clear_scene_build_cache():
    """The scene-build cache restores identical-content builds from a
    snapshot; tests that compare two build paths (staged vs inline, reset
    vs fresh, sharded vs not) must not have the second build
    short-circuit into the first's output.  Tests that want the cache
    (test_scene_build_cache_*) opt back in explicitly."""
    from coherence_tpu.scene import fastframe as _ff

    _ff.scene_build_cache_clear()
    old_max = _ff._SCENE_BUILD_CACHE_MAX
    _ff._SCENE_BUILD_CACHE_MAX = 0  # disabled by default inside tests
    yield
    _ff._SCENE_BUILD_CACHE_MAX = old_max
    _ff.scene_build_cache_clear()
