"""Stage profile of a single large pyramid scene (stack N)."""
import sys, time
import jax, jax.numpy as jnp
import numpy as np

np.asarray(jax.device_put(np.ones(1)))  # sync dispatch

from rapier_tpu.geometry import broadphase, shapes
from rapier_tpu.geometry.dispatch import collider_world_poses, compute_manifolds
from rapier_tpu.dynamics.solver import contact_constraints as cc
from rapier_tpu.dynamics.solver import velocity_solver as vs
from rapier_tpu.dynamics.solver.coloring import color_constraints
from rapier_tpu.pipeline.physics_pipeline import _match_previous, step
from rapier_tpu.scenes import pyramid3_world
from rapier_tpu.types import BroadPhaseKind

def timeit(name, fn, *args, n=5):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args); jax.block_until_ready(out)
    print(f"{name:28s} {(time.time()-t0)/n*1000:9.2f} ms")
    return out

stack = int(sys.argv[1]) if len(sys.argv) > 1 else 16
world = pyramid3_world(stack_height=stack)
world.params = world.params.replace(broad_phase=int(BroadPhaseKind.SAP), sap_window=96)
state0 = world.build()
params = world.params
state = jax.device_put(jax.tree.map(jnp.asarray, state0), jax.devices()[0])
print(f"stack={stack} bodies={state0.bodies.n} colliders={state0.colliders.n} max_pairs={state0.contacts.max_pairs}")

@jax.jit
def full(state):
    s2, _ = step(state, params)
    return s2

for _ in range(60):
    state = full(state)
jax.block_until_ready(state)
timeit("FULL step", full, state)

def _bp(state):
    bodies, colliders = state.bodies, state.colliders
    w_pos, w_rot = collider_world_poses(bodies, colliders)
    mins, maxs = shapes.compute_aabbs(colliders.shape_type, colliders.shape_params, w_pos, w_rot)
    margin = (colliders.contact_skin[:, None] + 0.5 * params.prediction_distance() + 0.01 * params.length_unit)
    mins, maxs = mins - margin, maxs + margin
    return broadphase.find_pairs(mins, maxs, colliders, state.bodies.body_type,
                                 state.contacts.max_pairs, params.broad_phase, params.sap_window)
bp = timeit("broadphase", jax.jit(_bp), state)
c1, c2, pair_valid, _ = bp

def _np(state, c1, c2, pv):
    return compute_manifolds(state.bodies, state.colliders, c1, c2, pv,
                             params.prediction_distance(), present=params.shape_types_present)
man = timeit("narrowphase", jax.jit(_np), state, c1, c2, pair_valid)

match = timeit("match_previous", jax.jit(lambda s, m: _match_previous(s.contacts, m)), state, man)
ws_n, ws_t, ws_tw, prev_imp, prev_touch, _m, _still = match

def _color(man):
    return color_constraints(man.body1, man.body2, man.dyn1, man.dyn2, man.solver_pair,
                             state0.bodies.n, params.max_colors)
col = timeit("coloring", jax.jit(_color), man)
color, num_colors = col
print(f"  num_colors={num_colors}, pairs={int(jnp.sum(man.solver_pair))}, touching={int(jnp.sum(man.touching))}")

def _gen(state, man, prev_imp, color):
    active = state.bodies.enabled & ~state.bodies.sleeping
    sb = vs.make_solver_bodies(state.bodies, active, params)
    cons = cc.generate(man, sb, prev_imp, color, state.bodies.n)
    return sb, cons
gen = timeit("make_sb + generate", jax.jit(_gen), state, man, prev_imp, color)
sb, cons = gen

def _solve(state, sb, cons, num_colors):
    active = state.bodies.enabled & ~state.bodies.sleeping
    sb2, cons2, _ = vs.solve(state.bodies, sb, cons, num_colors, active, params)
    return sb2, cons2
timeit("solve (TGS loop)", jax.jit(_solve), state, sb, cons, num_colors)
