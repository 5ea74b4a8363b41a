"""Warm the persistent JAX compilation cache for the test suite.

Step-function compiles dominate test-suite wall time (each full `step`
config is a ~30 s XLA compile on CPU).  This script compiles the handful of
step configurations the fast tier (`pytest -m "not slow"`) exercises, using
the SAME platform/mesh setup as tests/conftest.py, so a subsequent pytest
run hits the persistent cache (JAX_COMPILATION_CACHE_DIR) instead of
recompiling.  Run once per machine / per JAX upgrade:

    python tools/warm_cache.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Mirror tests/conftest.py exactly — cache keys include the platform and
# device count.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rapier_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def _warm(name, fn):
    t0 = time.time()
    try:
        fn()
        print(f"  {name:40s} {time.time() - t0:6.1f} s")
    except Exception as e:  # keep warming the rest
        print(f"  {name:40s} FAILED: {e}")


def main():
    print(f"cache dir: {os.environ['JAX_COMPILATION_CACHE_DIR']}")
    from rapier_tpu.scenes import mixed_primitives_world, pyramid_world

    def mixed():
        w = mixed_primitives_world(num_layers=2, grid=3)
        w.build()
        w.step(2)

    def pyramid():
        w = pyramid_world(base_count=6)
        w.build()
        w.step(2)

    _warm("mixed_primitives step", mixed)
    _warm("pyramid step", pyramid)

    # Joint + multibody configs (distinct step signatures).
    def joints():
        from tests import test_joints as tj  # reuse the suite's builders
        for name in dir(tj):
            if name.startswith("_world"):
                getattr(tj, name)()
                break

    _warm("joint step", joints)
    print("done — subsequent pytest runs reuse these compiles")


if __name__ == "__main__":
    main()
