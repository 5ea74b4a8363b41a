"""Dump the optimized HLO (with source metadata) of the pyramid step to
/tmp/hlo_opt.txt for tools/attribute_trace.py.

Usage: python tools/dump_hlo.py [stack]
"""
import sys

import jax
import jax.numpy as jnp

from rapier_tpu.pipeline.physics_pipeline import step
from rapier_tpu.scenes import pyramid3_world
from rapier_tpu.types import BroadPhaseKind

stack = int(sys.argv[1]) if len(sys.argv) > 1 else 24
world = pyramid3_world(stack_height=stack)
world.params = world.params.replace(
    broad_phase=int(BroadPhaseKind.SAP), sap_window=96)
state0 = world.build()
txt = (
    jax.jit(lambda s: step(s, world.params)[0])
    .lower(jax.tree.map(jnp.asarray, state0))
    .compile()
    .as_text()
)
open("/tmp/hlo_opt.txt", "w").write(txt)
print("HLO bytes:", len(txt))
