"""Solver-lane compaction (SimParams.max_solver_pairs).

The touching pairs are stream-compacted to K lanes before coloring + the
contact solve and the impulse block is scattered back (physics_pipeline.step,
"compact_solve").  These tests pin:
- exact parity with the full-width solve when nothing overflows,
- the StepEvents.solver_overflow counter when the cap is too small,
- that an overflowing step degrades (drops contacts for one step) without
  going non-finite.

The reference allocates constraints exactly (no cap — velocity_solver.rs
builds from the live contact graph); the cap is the static-shape TPU analog.
"""

import jax
import jax.numpy as jnp
import numpy as np

from rapier_tpu.pipeline.physics_pipeline import step
from rapier_tpu.scenes import stack_world


def _roll(cap, n_steps=40):
    world = stack_world(n=6)
    state = jax.tree.map(jnp.asarray, world.build())
    params = world.params.replace(
        solver_backend="pallas", max_solver_pairs=cap
    )

    @jax.jit
    def r(s, p):
        def body(s, _):
            s2, ev = step(s, p)
            return s2, ev.solver_overflow
        return jax.lax.scan(body, s, None, length=n_steps)

    s, ov = r(state, params)
    return np.asarray(s.bodies.pos), int(np.max(np.asarray(ov)))


def test_compaction_matches_full_width():
    pos_full, ov_full = _roll(0)
    pos_cap, ov_cap = _roll(32)   # 6-stack: ~7 touching pairs, ample room
    assert ov_full == 0 and ov_cap == 0
    # Tolerance is behavioral, not bitwise: the capped solve runs a
    # different lane order (compaction renumbers lanes -> different Luby
    # hashes/colors) and a lane count below the tile-aligned fused-routing
    # threshold, so matmul accumulation orders differ; 40 steps of stiff
    # stack dynamics amplify the ~1e-7 per-op rounding to a few 1e-4.
    np.testing.assert_allclose(pos_cap, pos_full, rtol=1e-3, atol=2e-3)


def test_compaction_overflow_counted_and_finite():
    pos, ov = _roll(2)            # cap below the touching-pair count
    assert ov > 0                 # drops surfaced, not silent
    assert np.all(np.isfinite(pos))


def _roll_jax(cap, n_steps=40):
    world = stack_world(n=6)
    state = jax.tree.map(jnp.asarray, world.build())
    params = world.params.replace(
        solver_backend="jax", max_solver_pairs=cap
    )

    @jax.jit
    def r(s, p):
        def body(s, _):
            s2, ev = step(s, p)
            return s2, ev.solver_overflow
        return jax.lax.scan(body, s, None, length=n_steps)

    s, ov = r(state, params)
    return np.asarray(s.bodies.pos), int(np.max(np.asarray(ov)))


def test_jax_path_compaction_matches_full_width():
    # The pure-JAX path (large scenes where the Pallas kernel is
    # VMEM-infeasible) compacts the same way ("compact_jax").
    pos_full, ov_full = _roll_jax(0)
    pos_cap, ov_cap = _roll_jax(32)
    assert ov_full == 0 and ov_cap == 0
    np.testing.assert_allclose(pos_cap, pos_full, rtol=1e-4, atol=1e-4)


def test_jax_path_compaction_overflow_finite():
    pos, ov = _roll_jax(2)
    assert ov > 0
    assert np.all(np.isfinite(pos))
