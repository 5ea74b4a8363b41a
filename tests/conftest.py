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
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rapier_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
