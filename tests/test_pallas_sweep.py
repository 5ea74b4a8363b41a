"""Parity: the VMEM-resident Pallas contact sweep vs the pure-JAX color loop.

Runs the SAME scene through both solver backends (the Pallas kernel in
interpret mode on the CPU test mesh) and asserts trajectory agreement.  This
pins the kernel's semantics to the reference-behavioral JAX path
(velocity_solver.rs:151-211) without needing TPU hardware in CI.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rapier_tpu.pipeline.physics_pipeline import step
from rapier_tpu.scenes import stack_world


def _rollout(backend: str, n_steps: int = 30):
    world = stack_world(n=5)
    state = world.build()
    params = world.params.replace(solver_backend=backend)
    state = jax.tree.map(jnp.asarray, state)

    @jax.jit
    def roll(state, params):
        def body(s, _):
            s, _ev = step(s, params)
            return s, (s.bodies.pos, s.bodies.linvel)
        return jax.lax.scan(body, state, None, length=n_steps)

    final, traj = roll(state, params)
    return final, traj


def test_pallas_matches_jax_path():
    f_jax, (pos_jax, vel_jax) = _rollout("jax")
    f_pal, (pos_pal, vel_pal) = _rollout("pallas")

    # Interpret-mode Pallas runs the same jnp ops; tolerances cover
    # accumulation-order differences only.
    np.testing.assert_allclose(
        np.asarray(pos_pal), np.asarray(pos_jax), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(vel_pal), np.asarray(vel_jax), rtol=1e-3, atol=1e-3
    )
    # Warmstart caches round-trip identically too (same contact identities).
    np.testing.assert_allclose(
        np.asarray(f_pal.contacts.warmstart_impulse),
        np.asarray(f_jax.contacts.warmstart_impulse),
        rtol=1e-3, atol=1e-3,
    )


def test_pallas_stack_stays_standing():
    final, (pos, _vel) = _rollout("pallas", n_steps=60)
    pos = np.asarray(final.bodies.pos)
    # Boxes of the 5-stack remain stacked (y spacing ~1.0, nothing fell over).
    ys = np.sort(pos[1:6, 1])
    assert np.all(np.isfinite(pos))
    assert ys[-1] > 3.5, f"top box fell: {ys}"
