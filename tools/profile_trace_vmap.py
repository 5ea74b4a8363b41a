"""Device trace of the vmapped bench step (4096 scenes) + optimized-HLO dump
for source attribution via tools/attribute_trace.py.

Usage: python tools/profile_trace_vmap.py [n_scenes] [n_timed_steps]
"""
import glob
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
np.asarray(jax.device_put(np.ones(1)))  # sync dispatch

from rapier_tpu.pipeline.physics_pipeline import step
from rapier_tpu.scenes import mixed_primitives_world, replicate_scene

n_scenes = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
n_timed = int(sys.argv[2]) if len(sys.argv) > 2 else 5

world = mixed_primitives_world(num_layers=4, grid=5, max_pairs=512)
world.params = world.params.replace(
    max_solver_pairs=int(os.environ.get("BENCH_SOLVER_PAIRS", "256")))
state0 = world.build()
params = world.params
batch = jax.device_put(
    jax.tree.map(jnp.asarray, replicate_scene(state0, n_scenes)),
    jax.devices()[0])
print(f"n_scenes={n_scenes} bodies={state0.bodies.n} "
      f"max_pairs={state0.contacts.max_pairs}")


@jax.jit
def full(state):
    s2, _ = jax.vmap(step, in_axes=(0, None))(state, params)
    return s2


# Dump optimized HLO with metadata for attribution.
lowered = full.lower(batch)
compiled = lowered.compile()
with open("/tmp/hlo_opt.txt", "w") as f:
    f.write(compiled.as_text())
print("wrote /tmp/hlo_opt.txt")

for _ in range(150):
    batch = full(batch)
jax.block_until_ready(batch)
t0 = time.time()
for _ in range(5):
    batch = full(batch)
jax.block_until_ready(batch)
print(f"settled FULL vmapped step {(time.time()-t0)/5*1000:.2f} ms")

logdir = "/tmp/rapier_trace"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    for _ in range(n_timed):
        batch = full(batch)
    jax.block_until_ready(batch)
print(sorted(glob.glob(f"{logdir}/plugins/profile/*/*.trace.json.gz")))
