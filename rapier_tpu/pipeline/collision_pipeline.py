"""Collision-detection-only pipeline facade.

The TPU analog of the reference CollisionPipeline
(src/pipeline/collision_pipeline.rs:29 `step`): run broad phase + narrow
phase + event extraction WITHOUT dynamics — no solver, no integration, no
sleep management.  Use it to drive sensors/intersections and contact events
on externally-animated scenes (the reference positions this for
"applications not using any physics like gameplay triggers").

`collide(state, params, hooks=None) -> (state, StepEvents)` is jittable and
updates only `state.contacts` (the persistent pair cache that started /
stopped events diff against); body state passes through untouched.
"""

from __future__ import annotations

import jax.numpy as jnp

from rapier_tpu.geometry import broadphase, shapes
from rapier_tpu.geometry.dispatch import (
    collider_world_poses,
    compute_manifolds,
    compute_mesh_manifolds,
    concat_manifolds,
)
from rapier_tpu.pipeline.physics_pipeline import StepEvents, _match_previous
from rapier_tpu.types import (
    ACTIVE_EVENTS_COLLISION,
    BodyType,
    Contacts,
    SceneState,
    SimParams,
)


def collide(state: SceneState, params: SimParams, hooks=None):
    """One collision-detection pass (collision_pipeline.rs:66-229).

    Mirrors physics_pipeline.step's CD sections exactly (same AABB margins,
    same pair filters, same manifold kernels) so a scene stepped by either
    pipeline sees identical contact/intersection lanes.
    """
    bodies = state.bodies
    colliders = state.colliders

    w_pos, w_rot = collider_world_poses(bodies, colliders)
    mins, maxs = shapes.compute_aabbs(
        colliders.shape_type, colliders.shape_params, w_pos, w_rot
    )
    margin = (
        colliders.contact_skin[:, None]
        + 0.5 * params.prediction_distance()
        + 0.01 * params.length_unit
    )
    mins = mins - margin
    maxs = maxs + margin

    max_pairs = state.contacts.max_pairs
    has_meshes = state.meshes is not None
    mesh_lanes = params.max_mesh_pairs * params.tris_per_pair if has_meshes else 0
    convex_pairs = max_pairs - mesh_lanes
    bp_body_type = jnp.where(
        bodies.mb_link, int(BodyType.DYNAMIC), bodies.body_type
    )
    c1, c2, pair_valid, bp_overflow = broadphase.find_pairs(
        mins, maxs, colliders, bp_body_type, convex_pairs,
        params.broad_phase, params.sap_window,
    )

    man = compute_manifolds(
        bodies, colliders, c1, c2, pair_valid, params.prediction_distance(),
        present=params.shape_types_present, hulls=state.hulls, dt=params.dt,
    )
    if has_meshes:
        man_mesh = compute_mesh_manifolds(
            bodies, colliders, state.meshes, c1, c2, pair_valid,
            params.prediction_distance(), params.max_mesh_pairs,
            params.tris_per_pair,
        )
        man = concat_manifolds(man, man_mesh)

    if hooks is not None and hooks.filter_contact_pair is not None:
        from rapier_tpu.types import ACTIVE_HOOKS_FILTER_CONTACT_PAIR

        gate = (man.active_hooks_or & ACTIVE_HOOKS_FILTER_CONTACT_PAIR) != 0
        keep = hooks.filter_contact_pair(bodies, colliders, man)
        man = man._replace(touching=man.touching & (keep | ~gate))

    (_ws_n, _ws_t, _ws_tw, _prev_imp, prev_touch, _matched, still) = (
        _match_previous(state.contacts, man)
    )
    started = man.touching & ~prev_touch
    prev_c = state.contacts
    stopped = prev_c.touching & ~still & (prev_c.pair_key >= 0)

    contacts = Contacts(
        pair_key=jnp.where(man.valid, man.pair_key, -1),
        body1=man.body1, body2=man.body2,
        collider1=man.collider1, collider2=man.collider2,
        normal=man.normal, point=man.point, dist=man.dist,
        feature_id=man.fid, point_active=man.point_active,
        num_points=jnp.sum(man.point_active.astype(jnp.int32), axis=0),
        active=man.valid, touching=man.touching,
        # No solve ran: carry matched warmstart caches through unchanged so
        # a later physics step warmstarts correctly.
        warmstart_impulse=_ws_n * man.point_active,
        warmstart_tangent_impulse=_ws_t,
        warmstart_twist_impulse=_ws_tw,
        impulse=jnp.zeros_like(man.dist),
        tangent_impulse=jnp.zeros_like(_ws_t),
        friction=man.friction, restitution=man.restitution,
        events_or=man.active_events_or,
    )

    collision_gate = (man.active_events_or & ACTIVE_EVENTS_COLLISION) != 0
    zero_p = jnp.zeros_like(man.touching)
    events = StepEvents(
        started_pairs=started & collision_gate,
        stopped_keys=prev_c.pair_key,
        stopped=stopped & ((prev_c.events_or & ACTIVE_EVENTS_COLLISION) != 0),
        force_events=zero_p,
        force_magnitude=jnp.zeros_like(man.friction),
        total_force=jnp.zeros_like(man.normal),
        max_force_direction=man.normal,
        max_force_magnitude=jnp.zeros_like(man.friction),
        sensor_pairs=man.sensor,
        intersecting=man.sensor & man.touching,
        broadphase_overflow=bp_overflow,
        unsupported_pairs=man.unsupported,
        ccd_overflow=jnp.int32(0),
        solver_overflow=jnp.int32(0),
    )
    return state.replace(contacts=contacts), events
