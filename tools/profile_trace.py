"""On-device op-level profile of the pyramid step via jax.profiler + the
tensorboard profile plugin's xplane converter.  Unlike wall-clock stage
timing (which the axon tunnel's ~2 ms/dispatch overhead swamps), this reads
the device trace itself.

Usage: python tools/profile_trace.py [stack] [n_timed_steps]
"""
import glob
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

np.asarray(jax.device_put(np.ones(1)))  # sync dispatch

from rapier_tpu.pipeline.physics_pipeline import step
from rapier_tpu.scenes import pyramid3_world
from rapier_tpu.types import BroadPhaseKind

stack = int(sys.argv[1]) if len(sys.argv) > 1 else 24
n_timed = int(sys.argv[2]) if len(sys.argv) > 2 else 5

world = pyramid3_world(stack_height=stack)
world.params = world.params.replace(
    broad_phase=int(BroadPhaseKind.SAP), sap_window=96)
state0 = world.build()
params = world.params
state = jax.device_put(jax.tree.map(jnp.asarray, state0), jax.devices()[0])
print(f"stack={stack} bodies={state0.bodies.n} max_pairs={state0.contacts.max_pairs} "
      f"max_solver_pairs={params.max_solver_pairs}")


@jax.jit
def full(state):
    s2, _ = step(state, params)
    return s2


for _ in range(150):
    state = full(state)
jax.block_until_ready(state)
t0 = time.time()
for _ in range(10):
    state = full(state)
jax.block_until_ready(state)
print(f"settled FULL step {(time.time()-t0)/10*1000:.2f} ms")

logdir = "/tmp/rapier_trace"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    for _ in range(n_timed):
        state = full(state)
    jax.block_until_ready(state)

# Parse the xplane into framework-op totals.
xs = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
print("xplane:", xs)
from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

for tool in ("framework_op_stats", "hlo_stats"):
    try:
        data, _ = rtd.xspace_to_tool_data(xs, tool, {})
        out = f"/tmp/rapier_trace/{tool}.csv"
        if isinstance(data, bytes):
            data = data.decode()
        with open(out, "w") as f:
            f.write(data)
        print(f"wrote {out} ({len(data)} bytes)")
    except Exception as e:
        print(f"{tool}: FAILED {type(e).__name__}: {e}")
