import os

# Tests ALWAYS run on a virtual 8-device CPU mesh (SURVEY §2.3) — force it
# even when the environment presets JAX_PLATFORMS (e.g. to the TPU tunnel).
os.environ["JAX_PLATFORMS"] = "cpu"

# The axon site wrapper intercepts backend resolution and can still route
# compute to the TPU tunnel despite the env var.  RAPIER_TPU_TESTS_CPU=1
# pins the platform through jax.config (the only override the wrapper
# honors) — use it when the tunnel is down or contended.
if os.environ.get("RAPIER_TPU_TESTS_CPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache: step-function compiles (~30s each on CPU)
# dominate suite runtime; cache them across runs.
# MIN_COMPILE_TIME must be 0: through the axon TPU tunnel JAX's *measured*
# compile time is sub-second (the real compile happens remotely), so any
# positive threshold silently skips every write — the round-3 "cache held 2
# entries" mystery.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rapier_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

# ---------------------------------------------------------------------------
# Test tiers.  The full suite cold-compiles for well over an hour; these
# modules carry the long-horizon scene simulations (hundreds of full steps
# each).  Marking them `slow` gives CI a fast tier: `pytest -m "not slow"`
# still covers every kernel, query, loader, and API surface at the unit
# level.  Cold-cache the fast tier takes tens of minutes (step compiles
# dominate); with a warm JAX_COMPILATION_CACHE_DIR (run
# `python tools/warm_cache.py` once per machine) it drops to a few minutes.
_SLOW_MODULES = {
    "test_e2e_basic", "test_s2d", "test_debug_scenes", "test_stress_scenes",
    "test_multibody", "test_joints", "test_ccd", "test_controllers",
    "test_sharding", "test_mutation", "test_solver_compaction",
    "test_2d_core", "test_convex_fallback", "test_convex_shapes",
    "test_mesh", "test_nan_guard", "test_large_scene_routing",
    "test_quadruped", "test_example_scenes",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-horizon scene simulations (full-step compiles)"
    )


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        mod = getattr(item, "module", None)
        if mod is not None and mod.__name__ in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
