"""Per-stage step timers: the reference Counters taxonomy on XLA.

The reference maintains hierarchical stage timers (src/counters/mod.rs:20-35:
collision-detection broad/narrow, solver assembly/resolution/writeback, CCD).
Under XLA the fused step cannot be timed per-stage from inside, so this module
offers two observability paths:

1. `profile_step(state, params)` — runs the stages as separate jitted
   programs with blocking timers; slower than the fused step but gives the
   reference-style breakdown (use for diagnostics, not production).
2. `trace_step(state, params, logdir)` — wraps the fused step in a
   jax.profiler trace whose annotations land in TensorBoard/XProf.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp


@dataclass
class StageTimings:
    """Milliseconds per stage — the reference Counters schema."""

    broad_phase_ms: float = 0.0
    narrow_phase_ms: float = 0.0
    solver_ms: float = 0.0
    total_fused_ms: float = 0.0
    extra: dict = field(default_factory=dict)

    def as_dict(self):
        d = {
            "broad_phase_ms": self.broad_phase_ms,
            "narrow_phase_ms": self.narrow_phase_ms,
            "solver_ms": self.solver_ms,
            "total_fused_ms": self.total_fused_ms,
        }
        d.update(self.extra)
        return d


def _timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    return out, (time.perf_counter() - t0) * 1000.0


def profile_step(state, params) -> StageTimings:
    """Stage-by-stage timing of one step (compiles each stage separately)."""
    from rapier_tpu.geometry import broadphase, shapes
    from rapier_tpu.geometry.dispatch import collider_world_poses, compute_manifolds
    from rapier_tpu.pipeline.physics_pipeline import step

    timings = StageTimings()

    @jax.jit
    def bp(state):
        w_pos, w_rot = collider_world_poses(state.bodies, state.colliders)
        mins, maxs = shapes.compute_aabbs(
            state.colliders.shape_type, state.colliders.shape_params,
            w_pos, w_rot,
        )
        return broadphase.find_pairs(
            mins, maxs, state.colliders, state.bodies.body_type,
            state.contacts.max_pairs, params.broad_phase, params.sap_window,
        )

    (c1, c2, valid, _), timings.broad_phase_ms = _timed(bp, state)

    @jax.jit
    def nphase(state, c1, c2, valid):
        return compute_manifolds(
            state.bodies, state.colliders, c1, c2, valid,
            params.prediction_distance(),
        )

    _, timings.narrow_phase_ms = _timed(nphase, state, c1, c2, valid)

    fused = jax.jit(step)
    _, timings.total_fused_ms = _timed(fused, state, params)
    timings.solver_ms = max(
        timings.total_fused_ms - timings.broad_phase_ms - timings.narrow_phase_ms,
        0.0,
    )
    return timings


def trace_step(state, params, logdir: str, steps: int = 10):
    """Capture a jax.profiler trace of the fused step for XProf/TensorBoard."""
    from rapier_tpu.pipeline.physics_pipeline import step

    fused = jax.jit(step)
    out = fused(state, params)
    jax.block_until_ready(out)
    with jax.profiler.trace(logdir):
        s = state
        for _ in range(steps):
            s, _ = fused(s, params)
        jax.block_until_ready(s)
    return logdir
