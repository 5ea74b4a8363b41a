"""Multi-device sharding tests on the virtual 8-CPU mesh (conftest.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rapier_tpu.scenes import replicate_scene, stack_world


def test_vmap_batch_steps():
    from rapier_tpu.pipeline.physics_pipeline import step

    world = stack_world(n=2)
    s0 = world.build()
    batch = jax.tree.map(jnp.asarray, replicate_scene(s0, 4))
    new_state, ev = jax.vmap(step, in_axes=(0, None))(batch, world.params)
    assert new_state.bodies.pos.shape[0] == 4
    # All scenes identical => identical results.
    p = np.asarray(new_state.bodies.pos)
    np.testing.assert_array_equal(p[0], p[1])


def test_sharded_step_8_devices():
    from rapier_tpu.parallel.sharding import make_mesh, make_sharded_step, shard_batch

    # Explicitly use the virtual CPU mesh: the TPU tunnel plugin can override
    # JAX_PLATFORMS and make jax.devices() return the single real chip.
    cpus = jax.devices("cpu")
    assert len(cpus) >= 8, "conftest must force 8 CPU devices"
    mesh = make_mesh(cpus[:8])
    world = stack_world(n=2)
    s0 = world.build()
    batch = jax.tree.map(jnp.asarray, replicate_scene(s0, 16))
    batch = shard_batch(batch, mesh)
    step_fn = make_sharded_step(mesh, donate=False)
    new_state, _ = step_fn(batch, world.params)
    jax.block_until_ready(new_state)
    assert np.isfinite(np.asarray(new_state.bodies.pos)).all()


def test_graft_entry_dryrun():
    import __graft_entry__ as ge

    ge.dryrun_multichip(4)


def test_graft_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert np.isfinite(np.asarray(out.bodies.pos)).all()
