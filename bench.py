"""Headline benchmark: env-steps/sec of vmapped ~100-body scenes.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): the reference (rapier3d) cannot be built in this image
(no Rust toolchain), so the single-scene CPU baseline is the documented
estimate of 5,000 steps/sec (0.2 ms/step) for a ~100-body mixed-primitives
scene on one modern CPU core.  vs_baseline = (our total env-steps/sec) /
(baseline steps/sec): >1 means one TPU chip simulates faster than one rapier
CPU instance; 4096 means per-env parity.

TIMING HONESTY (critical on the axon TPU tunnel): `jax.block_until_ready`
does NOT actually wait while the process is in async-dispatch mode —
executions merely enqueue.  The only reliable sync is a device->host
transfer.  This bench therefore (a) keeps ALL scene construction host-side
(numpy) so the process stays in fast async mode, (b) drains the pipeline
with a D2H checksum fetch immediately before starting the clock, and
(c) fetches a checksum INSIDE the timed region to force completion of the
timed work.  Benchmarks are measured on SETTLED scenes (contacts active) —
steps on airborne scenes skip all solver work and flatter the numbers.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

BASELINE_SINGLE_SCENE_STEPS_PER_SEC = 5000.0


def main():
    mode = os.environ.get("BENCH_MODE", "vmapped")
    n_scenes = int(os.environ.get("BENCH_SCENES", "4096"))
    n_steps = int(os.environ.get("BENCH_STEPS", "50"))
    settle_steps = int(os.environ.get("BENCH_SETTLE", "150"))

    from rapier_tpu.pipeline.physics_pipeline import step
    from rapier_tpu.scenes import (
        mixed_primitives_world, pyramid3_world, replicate_scene,
    )
    from rapier_tpu.types import BroadPhaseKind

    if mode == "robots":
        # Batched articulated-robot rollout (BASELINE.json config #5;
        # reference examples3d/mujoco_menagerie3.rs): vmapped 8-dof
        # quadrupeds standing on four feet with PD servos — the jointed /
        # multibody path the contacts-only modes never exercise.
        from rapier_tpu.scenes import quadruped_world

        n_scenes = int(os.environ.get("BENCH_SCENES", "512"))
        world, _robot = quadruped_world(use_multibody=True)
        state0 = world.build()
        batch = jax.device_put(
            jax.tree.map(jnp.asarray, replicate_scene(state0, n_scenes)),
            jax.devices()[0],
        )
        label = (f"env-steps/sec, {n_scenes} vmapped quadruped scenes "
                 f"(8-dof articulation, 4 foot contacts, PD servos)")
    elif mode == "pyramid":
        # Single-scene box-pyramid stress (BASELINE.json metric #1; reference
        # examples3d/stress_tests/pyramid3.rs, stack 24 = 4900 boxes).
        stack = int(os.environ.get("BENCH_STACK", "16"))
        n_scenes = 1
        world = pyramid3_world(stack_height=stack)
        # Solver-lane compaction: a settled box pyramid touches ~5 pairs per
        # box; the cap bounds the O(substeps x colors) sweep width.
        n_boxes = sum((stack - i) ** 2 for i in range(stack))
        # 8 touching pairs per box: a settled 24-stack needs ~7/box (the
        # round-4 default of 6 silently dropped ~4.5k pairs — caught by the
        # max_overflow assertion below).
        cap = int(os.environ.get(
            "BENCH_SOLVER_PAIRS", -((-8 * n_boxes) // 128) * 128))
        # GRID broad phase: windowed SAP is incomplete on dense 3D piles
        # (same-xz boxes separated along z sit a whole sort-slab apart —
        # the round-5 overflow assertion caught ~4.5k dropped pairs at
        # stack 24); the uniform grid covers the full 26-neighbourhood.
        world.params = world.params.replace(
            broad_phase=int(BroadPhaseKind.GRID),
            max_solver_pairs=cap,
        )
        state0 = world.build()
        batch = jax.device_put(
            jax.tree.map(jnp.asarray, replicate_scene(state0, 1)),
            jax.devices()[0],
        )
        label = (f"steps/sec, {stack}-stack pyramid "
                 f"({state0.bodies.n - 1} boxes, single scene)")
    else:
        # ~100 bodies: 4 layers x 5x5 grid + ground.  max_pairs=512: the
        # measured settle-phase candidate peak is 329; 384 would fit but
        # disables the census box-box bucket (cap*2 <= P) and nets slower.
        world = mixed_primitives_world(
            num_layers=4, grid=5,
            max_pairs=int(os.environ.get("BENCH_MAX_PAIRS", "512")))
        # Solver-lane compaction: the scene peaks at ~182 touching pairs
        # (1.4x headroom); overflow would surface in StepEvents and is
        # asserted zero by tests/test_solver_compaction.py on this scene.
        world.params = world.params.replace(
            max_solver_pairs=int(os.environ.get("BENCH_SOLVER_PAIRS", "256")),
            solver_backend=os.environ.get("BENCH_BACKEND", "auto"),
        )
        state0 = world.build()      # numpy leaves: no device transfers yet
        batch = jax.device_put(
            jax.tree.map(jnp.asarray, replicate_scene(state0, n_scenes)),
            jax.devices()[0],
        )
        label = f"env-steps/sec, {n_scenes} vmapped ~100-body scenes (settled)"
    params = world.params           # numpy-leaf pytree (passed as explicit arg)

    chunk = min(n_steps, 10)
    n_chunks = max(n_steps // chunk, 1)

    @jax.jit
    def run_chunk(state, params):
        def body(s, _):
            s2, _ev = jax.vmap(step, in_axes=(0, None))(s, params)
            return s2, ()
        state, _ = jax.lax.scan(body, state, None, length=chunk)
        return state

    @jax.jit
    def checksum(state):
        return jnp.sum(state.bodies.pos) + jnp.sum(jnp.abs(state.bodies.linvel))

    @jax.jit
    def max_overflow(state):
        # One extra step whose events certify the bench config is honest:
        # a solver/broad-phase overflow would mean dropped contacts (faster,
        # but not the same physics).
        _, ev = jax.vmap(step, in_axes=(0, None))(state, params)
        return jnp.maximum(jnp.max(ev.solver_overflow),
                           jnp.max(ev.broadphase_overflow))

    # Warmup/compile + settle so contacts exist (solver does real work).
    out = run_chunk(batch, params)
    for _ in range(max(settle_steps // chunk - 1, 0)):
        out = run_chunk(out, params)
    # Drain everything queued so far (D2H sync; flips the process into
    # synchronous dispatch, which only adds ~0.3-25 ms per *chunk* — noise
    # against chunk runtimes).
    float(checksum(out))

    ovf = int(max_overflow(out))
    assert ovf == 0, f"bench config overflows ({ovf} pairs dropped) — not honest"

    t0 = time.time()
    for _ in range(n_chunks):
        out = run_chunk(out, params)
    cs = float(checksum(out))       # forces completion of the timed work
    elapsed = time.time() - t0
    assert jnp.isfinite(cs), "non-finite state after bench run"
    total_steps = chunk * n_chunks

    env_steps_per_sec = n_scenes * total_steps / elapsed
    vs_baseline = env_steps_per_sec / BASELINE_SINGLE_SCENE_STEPS_PER_SEC

    print(json.dumps({
        "metric": label,
        "value": round(env_steps_per_sec, 1),
        "unit": "env-steps/sec",
        "vs_baseline": round(vs_baseline, 2),
    }))


if __name__ == "__main__":
    main()
