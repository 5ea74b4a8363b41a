"""Headline benchmark: env-steps/sec of 4096 vmapped ~100-body scenes.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): the reference (rapier3d) cannot be built in this image
(no Rust toolchain), so the single-scene CPU baseline is the documented
estimate of 5,000 steps/sec (0.2 ms/step) for a ~100-body mixed-primitives
scene on one modern CPU core — consistent with the benchbot's published
per-scene millisecond range for comparable stress scenes.  vs_baseline =
(our total env-steps/sec) / (baseline steps/sec): >1 means one TPU chip
simulates faster than one rapier CPU instance; 4096 means per-env parity.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

BASELINE_SINGLE_SCENE_STEPS_PER_SEC = 5000.0


def main():
    # 4096 scenes needs ~28GB HBM at the current memory footprint (>16GB on a
    # single v5e chip); 2048 fits.  Multi-chip sharding reaches 4096+.
    n_scenes = int(os.environ.get("BENCH_SCENES", "2048"))
    n_steps = int(os.environ.get("BENCH_STEPS", "50"))

    from rapier_tpu.pipeline.physics_pipeline import step
    from rapier_tpu.scenes import mixed_primitives_world, replicate_scene

    # ~100 bodies: 4 layers x 5x5 grid + ground.  max_pairs sized to the
    # scene's real contact count (~400) — the warmstart join is O(P^2).
    world = mixed_primitives_world(num_layers=4, grid=5, max_pairs=512)
    state0 = world.build()
    batch = jax.device_put(
        jax.tree.map(jnp.asarray, replicate_scene(state0, n_scenes)),
        jax.devices()[0],
    )
    params = world.params

    # Chunk the scan: one long device program (50 steps x ~1s at 2048 scenes)
    # can exceed the TPU tunnel's RPC deadline (UNAVAILABLE device errors).
    chunk = min(n_steps, 10)
    n_chunks = max(n_steps // chunk, 1)

    @jax.jit
    def run_chunk(state, params):
        def body(s, _):
            s2, _ev = jax.vmap(step, in_axes=(0, None))(s, params)
            return s2, ()
        state, _ = jax.lax.scan(body, state, None, length=chunk)
        return state

    # Warmup / compile.
    t0 = time.time()
    out = run_chunk(batch, params)
    jax.block_until_ready(out)
    compile_and_first = time.time() - t0

    t0 = time.time()
    for _ in range(n_chunks):
        out = run_chunk(out, params)
    jax.block_until_ready(out)
    elapsed = time.time() - t0
    n_steps = chunk * n_chunks

    env_steps_per_sec = n_scenes * n_steps / elapsed
    vs_baseline = env_steps_per_sec / BASELINE_SINGLE_SCENE_STEPS_PER_SEC

    print(json.dumps({
        "metric": f"env-steps/sec, {n_scenes} vmapped ~100-body scenes",
        "value": round(env_steps_per_sec, 1),
        "unit": "env-steps/sec",
        "vs_baseline": round(vs_baseline, 2),
    }))
    # Diagnostics on stderr-adjacent extra lines are avoided: single JSON line
    # only, per driver contract.


if __name__ == "__main__":
    main()
