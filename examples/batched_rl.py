"""Batched RL-style rollout: N scenes stepped in lockstep under vmap,
optionally sharded over every available device."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


import time

import jax
import jax.numpy as jnp

from rapier_tpu.parallel.sharding import make_mesh, make_sharded_step, shard_batch
from rapier_tpu.scenes import mixed_primitives_world, replicate_scene


def main(n_scenes: int = 256, n_steps: int = 60):
    world = mixed_primitives_world(num_layers=3, grid=3, max_pairs=512)
    state0 = world.build()
    batch = jax.tree.map(jnp.asarray, replicate_scene(state0, n_scenes))

    mesh = make_mesh(jax.devices())  # pass YOUR device list explicitly
    stepper = make_sharded_step(mesh, donate=False)
    batch = shard_batch(batch, mesh)

    batch, _ = stepper(batch, world.params)  # compile
    jax.block_until_ready(batch)
    t0 = time.time()
    for _ in range(n_steps):
        batch, events = stepper(batch, world.params)
    jax.block_until_ready(batch)
    dt = time.time() - t0
    print(f"{n_scenes} scenes x {n_steps} steps in {dt:.2f}s "
          f"= {n_scenes * n_steps / dt:,.0f} env-steps/s "
          f"on {len(mesh.devices.flat)} device(s)")


if __name__ == "__main__":
    main()
