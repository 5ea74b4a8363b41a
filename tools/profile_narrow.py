"""Sub-stage timing of compute_manifolds at the vmapped bench config.

Usage: python tools/profile_narrow.py [n_scenes]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from rapier_tpu.geometry import broadphase, shapes
from rapier_tpu.geometry import narrowphase as nph
from rapier_tpu.geometry.dispatch import (
    collider_world_poses, compute_manifolds, _PAIR_KERNELS,
)
from rapier_tpu.pipeline.physics_pipeline import step
from rapier_tpu.scenes import mixed_primitives_world, replicate_scene
from rapier_tpu.types import ShapeType


def timeit(name, fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{name:32s} {dt*1000:9.2f} ms")
    return out


def main():
    np.asarray(jax.device_put(np.ones(1)))  # flip to sync dispatch

    n_scenes = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    world = mixed_primitives_world(num_layers=4, grid=5, max_pairs=512)
    state0 = world.build()
    batch = jax.device_put(
        jax.tree.map(jnp.asarray, replicate_scene(state0, n_scenes)),
        jax.devices()[0],
    )
    params = world.params

    @jax.jit
    def full(state):
        s2, _ = jax.vmap(step, in_axes=(0, None))(state, params)
        return s2

    for _ in range(100):
        batch = full(batch)
    jax.block_until_ready(batch)

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

    # full narrowphase
    def _np(state, c1, c2, pv):
        return compute_manifolds(
            state.bodies, state.colliders, c1, c2, pv,
            params.prediction_distance(), present=params.shape_types_present,
            dt=params.dt)
    timeit("narrowphase FULL", jax.jit(jax.vmap(_np)), batch, c1, c2,
           pair_valid)

    # staging table only
    def _stage(state, c1, c2, pv):
        from rapier_tpu.geometry.dispatch import _soft_ccd_cols
        from rapier_tpu.types import BodyType
        bodies, colliders = state.bodies, state.colliders
        w_pos, w_rot = collider_world_poses(bodies, colliders)
        s1 = jnp.maximum(c1, 0)
        s2 = jnp.maximum(c2, 0)
        parent = colliders.parent
        safe_p = jnp.maximum(parent, 0)
        cols = jnp.concatenate([
            w_pos, w_rot, colliders.shape_params,
            colliders.shape_type[:, None].astype(jnp.float32),
            colliders.friction[:, None],
            _soft_ccd_cols(bodies, colliders, safe_p, parent, params.dt),
        ], axis=1)
        ids_c = jnp.arange(colliders.parent.shape[0])
        oh_s1 = (s1[:, None] == ids_c[None, :]).astype(jnp.float32)
        oh_s2 = (s2[:, None] == ids_c[None, :]).astype(jnp.float32)
        T1 = cols.T @ oh_s1.T
        T2 = cols.T @ oh_s2.T
        return T1, T2
    timeit("  staging table (24 cols)", jax.jit(jax.vmap(_stage)), batch,
           c1, c2, pair_valid)

    # individual kernels at full lane width
    def _mk_kernel_probe(kern, lane_last):
        def probe(state, c1, c2):
            bodies, colliders = state.bodies, state.colliders
            w_pos, w_rot = collider_world_poses(bodies, colliders)
            s1 = jnp.maximum(c1, 0)
            s2 = jnp.maximum(c2, 0)
            pA = w_pos[s1].T
            rA = w_rot[s1].T
            prmA = colliders.shape_params[s1].T
            pB = w_pos[s2].T
            rB = w_rot[s2].T
            prmB = colliders.shape_params[s2].T
            if lane_last:
                man = kern(pA, rA, prmA, pB, rB, prmB)
            else:
                man = jax.vmap(kern, in_axes=-1, out_axes=-1)(
                    pA, rA, prmA, pB, rB, prmB)
            return man.dist
        return probe

    for (ta, tb), kern in _PAIR_KERNELS.items():
        ll = getattr(kern, "lane_last", False)
        timeit(f"  kernel {ShapeType(ta).name}-{ShapeType(tb).name}"
               f"{' (lane-last)' if ll else ''}",
               jax.jit(jax.vmap(_mk_kernel_probe(kern, ll), in_axes=(0, 0, 0))),
               batch, c1, c2)

    # halfspace generic
    def _hs(state, c1, c2):
        bodies, colliders = state.bodies, state.colliders
        w_pos, w_rot = collider_world_poses(bodies, colliders)
        s1 = jnp.maximum(c1, 0)
        s2 = jnp.maximum(c2, 0)
        pA = w_pos[s1].T
        rA = w_rot[s1].T
        tA = colliders.shape_type[s1]
        prmA = colliders.shape_params[s1].T
        pB = w_pos[s2].T
        rB = w_rot[s2].T
        prmB = colliders.shape_params[s2].T
        man = jax.vmap(nph.convex_halfspace, in_axes=-1, out_axes=-1)(
            pA, rA, tA, prmA, pB, rB, prmB)
        return man.dist
    timeit("  kernel convex_halfspace", jax.jit(jax.vmap(_hs)), batch, c1, c2)

    def _bb(state, c1, c2):
        bodies, colliders = state.bodies, state.colliders
        w_pos, w_rot = collider_world_poses(bodies, colliders)
        s1 = jnp.maximum(c1, 0)
        s2 = jnp.maximum(c2, 0)
        pA = w_pos[s1].T
        rA = w_rot[s1].T
        prmA = colliders.shape_params[s1].T
        pB = w_pos[s2].T
        rB = w_rot[s2].T
        prmB = colliders.shape_params[s2].T
        from rapier_tpu.geometry.narrowphase_boxbox import cuboid_cuboid_cl
        man = cuboid_cuboid_cl(pA, rA, prmA, pB, rB, prmB)
        return man.dist
    timeit("  kernel boxbox full-width", jax.jit(jax.vmap(_bb)), batch, c1, c2)

    # bucket route cost (census cap for boxbox)
    def _bucket(state, c1, c2, pv):
        from rapier_tpu.geometry.dispatch import _bucket_route
        mask = pv & (c1 >= 0)
        oh, bvalid, ovf = _bucket_route(mask, 256)
        return oh.sum()
    timeit("  bucket route (cap 256)", jax.jit(jax.vmap(_bucket)), batch,
           c1, c2, pair_valid)


if __name__ == "__main__":
    main()
