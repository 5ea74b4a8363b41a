"""Stage-level timing of the vmapped step on the real device.

Splits step() into jitted stage functions and times each with
block_until_ready. Usage: python tools/profile_stages.py [n_scenes]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

from rapier_tpu.math import quat
from rapier_tpu.geometry import broadphase, shapes
from rapier_tpu.geometry.dispatch import collider_world_poses, compute_manifolds
from rapier_tpu.dynamics.solver import contact_constraints as cc
from rapier_tpu.dynamics.solver import velocity_solver as vs
from rapier_tpu.dynamics.solver.coloring import color_constraints
from rapier_tpu.pipeline.physics_pipeline import _match_previous, step
from rapier_tpu.scenes import mixed_primitives_world, replicate_scene
from rapier_tpu.types import BodyType


def timeit(name, fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{name:28s} {dt*1000:9.2f} ms")
    return out


def main():
    # Flip the process into synchronous dispatch up front (one D2H): in the
    # tunnel's async mode block_until_ready does NOT wait and every timing
    # below would be fiction.  Sync mode adds ~20 ms dispatch overhead per
    # call — noise against >100 ms stage costs at 512 scenes.
    import numpy as np
    np.asarray(jax.device_put(np.ones(1)))

    n_scenes = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    world = mixed_primitives_world(num_layers=4, grid=5, max_pairs=512)
    state0 = world.build()
    batch = jax.device_put(
        jax.tree.map(jnp.asarray, replicate_scene(state0, n_scenes)),
        jax.devices()[0],
    )
    params = world.params
    print(f"n_scenes={n_scenes} bodies={state0.bodies.n} "
          f"colliders={state0.colliders.n} max_pairs={state0.contacts.max_pairs}")

    @jax.jit
    def full(state):
        s2, _ = jax.vmap(step, in_axes=(0, None))(state, params)
        return s2

    # Settle: contacts must exist for the solver/coloring stages to do work.
    for _ in range(150):
        batch = full(batch)
    jax.block_until_ready(batch)

    timeit("FULL step", full, batch)

    # --- stage: broadphase ---
    def _bp(state):
        bodies, colliders = state.bodies, state.colliders
        w_pos, w_rot = collider_world_poses(bodies, colliders)
        mins, maxs = shapes.compute_aabbs(
            colliders.shape_type, colliders.shape_params, w_pos, w_rot)
        margin = (colliders.contact_skin[:, None]
                  + 0.5 * params.prediction_distance()
                  + 0.01 * params.length_unit)
        mins, maxs = mins - margin, maxs + margin
        return broadphase.find_pairs(
            mins, maxs, colliders, bodies.body_type,
            state.contacts.max_pairs, params.broad_phase, params.sap_window)

    bp = timeit("broadphase", jax.jit(jax.vmap(_bp)), batch)
    c1, c2, pair_valid, _ = bp

    # --- stage: narrowphase ---
    def _np(state, c1, c2, pv):
        return compute_manifolds(
            state.bodies, state.colliders, c1, c2, pv,
            params.prediction_distance(), present=params.shape_types_present)

    man = timeit("narrowphase", jax.jit(jax.vmap(_np)), batch, c1, c2, pair_valid)

    # --- stage: warmstart match join ---
    match = timeit("match_previous", jax.jit(jax.vmap(
        lambda s, m: _match_previous(s.contacts, m))), batch, man)
    ws_n, ws_t, ws_tw, prev_imp, prev_touch, _m, _still = match

    # --- stage: coloring ---
    def _color(man):
        return color_constraints(
            man.body1, man.body2, man.dyn1, man.dyn2, man.solver_pair,
            state0.bodies.n, params.max_colors)

    col = timeit("coloring", jax.jit(jax.vmap(_color)), man)
    color, num_colors = col
    print(f"  num_colors[0] = {num_colors[0]}, pairs[0] = {int(jnp.sum(man.solver_pair[0]))}, touching[0] = {int(jnp.sum(man.touching[0]))}")

    # --- stage: solver bodies + generate ---
    def _gen(state, man, prev_imp, color):
        active = state.bodies.enabled & ~state.bodies.sleeping
        sb = vs.make_solver_bodies(state.bodies, active, params)
        cons = cc.generate(man, sb, prev_imp, color, state.bodies.n)
        return sb, cons

    gen = timeit("make_sb + generate", jax.jit(jax.vmap(
        _gen, in_axes=(0, 0, 0, 0))), batch, man, prev_imp, color)
    sb, cons = gen

    # --- stage: solve (substep loop) ---
    def _solve(state, sb, cons, num_colors):
        active = state.bodies.enabled & ~state.bodies.sleeping
        sb2, cons2, _ = vs.solve(
            state.bodies, sb, cons, num_colors, active, params)
        return sb2, cons2

    timeit("solve (TGS loop)", jax.jit(jax.vmap(
        _solve, in_axes=(0, 0, 0, 0))), batch, sb, cons, num_colors)


if __name__ == "__main__":
    main()
