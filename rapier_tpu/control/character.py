"""Kinematic character controller: collide-and-slide via shape casts.

Behavioral port of the reference KinematicCharacterController
(src/control/character_controller.rs:173, move_shape :267): an iterative
shape-cast loop with a contact offset, sliding along obstacle tangents,
max-slope handling, and grounded detection — recast as a fixed-iteration
branch-free loop over batched shape casts.

Autostep (lift -> advance -> settle, committed only when every leg of the
maneuver is clear) and snap-to-ground follow character_controller.rs:68.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from rapier_tpu.geometry import queries


@dataclass(frozen=True)
class CharacterControllerOptions:
    """Mirrors the reference controller's knobs (character_controller.rs:68+)."""

    offset: float = 0.01                 # gap kept between character and world
    up: tuple = (0.0, 1.0, 0.0)
    max_slope_climb_angle: float = 0.8   # radians (~45deg)
    min_slope_slide_angle: float = 0.2
    slide: bool = True
    max_iterations: int = 6
    snap_to_ground: float = 0.2          # max snap distance (0 disables)
    # Autostep (CharacterAutostep, character_controller.rs:68): step onto
    # obstacles no taller than max_height if there is min_width of clear
    # landing.  0 disables.
    autostep_max_height: float = 0.0
    autostep_min_width: float = 0.1


class CharacterMovement(NamedTuple):
    translation: jax.Array  # [3] effective movement
    grounded: jax.Array     # bool
    hit_obstacle: jax.Array # bool — any cast hit during the solve
    remaining: jax.Array = None  # [3] blocked translation (for push impulses)


def move_shape(bodies, colliders, shape_type, shape_params, pos, rot,
               desired_translation,
               options: CharacterControllerOptions = CharacterControllerOptions(),
               exclude_collider: int = -1, exclude_body: int = -1,
               flags: int = 0, meshes=None, hulls=None) -> CharacterMovement:
    """Compute the achievable movement for a kinematic character shape."""
    up = jnp.asarray(options.up)
    desired = jnp.asarray(desired_translation, jnp.float32)

    total = jnp.zeros(3)
    remaining = desired
    any_hit = jnp.zeros((), bool)

    # One traced body shared across max_iterations (the round-4 exact-GJK
    # casts make each traced cast site expensive to compile; the unrolled
    # loop multiplied it by max_iterations).
    def iteration(_i, carry):
        total, remaining, any_hit = carry
        dist = jnp.linalg.norm(remaining)
        unit = remaining / jnp.maximum(dist, 1e-9)
        hit = queries.cast_shape(
            bodies, colliders, shape_type, shape_params,
            pos + total, rot, unit, dist + options.offset,
            flags=flags, exclude_collider=exclude_collider,
            exclude_body=exclude_body, meshes=meshes, hulls=hulls,
        )
        active = dist > 1e-7
        blocked = hit.hit & active
        allowed = jnp.where(blocked, jnp.maximum(hit.toi - options.offset, 0.0), dist)
        step_vec = unit * allowed
        total = total + jnp.where(active, step_vec, 0.0)
        left = remaining - step_vec

        # Slide: remove the into-surface component (character_controller.rs
        # slide pass), unless the surface is a climbable floor.
        n = hit.normal
        angle_from_up = jnp.arccos(jnp.clip(jnp.dot(n, up), -1.0, 1.0))
        is_wall_or_steep = angle_from_up > options.max_slope_climb_angle
        into = jnp.minimum(jnp.dot(left, n), 0.0)
        slid = left - n * into
        new_remaining = jnp.where(
            blocked & options.slide & is_wall_or_steep, slid,
            jnp.where(blocked, slid, jnp.zeros(3)),
        )
        remaining = jnp.where(blocked, new_remaining, jnp.zeros(3))
        any_hit = any_hit | blocked

        # Autostep (character_controller.rs:68 handle_stairs analog): when a
        # steep obstacle blocks horizontal motion, try lift -> advance ->
        # settle; commit the whole maneuver only if every leg is clear.
        if options.autostep_max_height > 0.0:
            horiz = left - up * jnp.dot(left, up)
            h_dist = jnp.linalg.norm(horiz)
            h_unit = horiz / jnp.maximum(h_dist, 1e-9)
            want_step = blocked & is_wall_or_steep & (h_dist > 1e-6)

            up_hit = queries.cast_shape(
                bodies, colliders, shape_type, shape_params, pos + total, rot,
                up, options.autostep_max_height,
                flags=flags, exclude_collider=exclude_collider,
                exclude_body=exclude_body, meshes=meshes, hulls=hulls,
            )
            lift = jnp.where(
                up_hit.hit,
                jnp.maximum(up_hit.toi - options.offset, 0.0),
                options.autostep_max_height,
            )
            lifted = pos + total + up * lift
            fwd_hit = queries.cast_shape(
                bodies, colliders, shape_type, shape_params, lifted, rot,
                h_unit, options.autostep_min_width + options.offset,
                flags=flags, exclude_collider=exclude_collider,
                exclude_body=exclude_body, meshes=meshes, hulls=hulls,
            )
            fwd_clear = ~fwd_hit.hit | (
                fwd_hit.toi >= options.autostep_min_width
            )
            advanced = lifted + h_unit * options.autostep_min_width
            down_hit = queries.cast_shape(
                bodies, colliders, shape_type, shape_params, advanced, rot,
                -up, lift + options.offset,
                flags=flags, exclude_collider=exclude_collider,
                exclude_body=exclude_body, meshes=meshes, hulls=hulls,
            )
            land_angle = jnp.arccos(
                jnp.clip(jnp.dot(down_hit.normal, up), -1.0, 1.0)
            )
            land_ok = down_hit.hit & (
                land_angle <= options.max_slope_climb_angle
            )
            do_step = want_step & (lift > options.offset) & fwd_clear & land_ok
            settle = jnp.maximum(down_hit.toi - options.offset, 0.0)
            step_delta = (
                up * (lift - settle) + h_unit * options.autostep_min_width
            )
            total = total + jnp.where(do_step, step_delta, jnp.zeros(3))
            # The stepped width consumes that much of the remaining motion.
            rem_after = left - h_unit * jnp.minimum(
                options.autostep_min_width, h_dist
            )
            remaining = jnp.where(do_step, rem_after, remaining)
        return total, remaining, any_hit

    total, remaining, any_hit = jax.lax.fori_loop(
        0, options.max_iterations, iteration, (total, remaining, any_hit)
    )

    # Grounded test + snap-to-ground: short downward cast.
    down_hit = queries.cast_shape(
        bodies, colliders, shape_type, shape_params, pos + total, rot,
        -up, options.offset * 3.0 + options.snap_to_ground,
        flags=flags, exclude_collider=exclude_collider,
        exclude_body=exclude_body, meshes=meshes, hulls=hulls,
    )
    floor_angle = jnp.arccos(jnp.clip(jnp.dot(down_hit.normal, up), -1.0, 1.0))
    grounded = down_hit.hit & (down_hit.toi <= options.offset * 3.0) & (
        floor_angle <= options.max_slope_climb_angle
    )
    # Snap: only when moving down-ish and close to the floor.
    moving_up = jnp.dot(desired, up) > 1e-6
    can_snap = (
        (options.snap_to_ground > 0.0)
        & down_hit.hit
        & ~moving_up
        & (down_hit.toi > options.offset)
        & (down_hit.toi <= options.offset + options.snap_to_ground)
        & (floor_angle <= options.max_slope_climb_angle)
    )
    snap = jnp.where(can_snap, -up * (down_hit.toi - options.offset), jnp.zeros(3))
    total = total + snap
    grounded = grounded | can_snap

    return CharacterMovement(
        translation=total, grounded=grounded, hit_obstacle=any_hit,
        remaining=desired - total,
    )


def solve_character_collision_impulses(
    bodies, colliders, shape_type, shape_params, pos, rot,
    translation_remaining, dt, character_mass,
    options: CharacterControllerOptions = CharacterControllerOptions(),
    exclude_collider: int = -1, exclude_body: int = -1,
    hulls=None, shape_hull=None,
):
    """Push dynamic bodies the character collided with.

    Port of KinematicCharacterController::solve_character_collision_impulses
    (reference src/control/character_controller.rs:840-933): for every
    dynamic collider within the contact prediction of the character's final
    pose, transfer the blocked movement as a velocity along the contact
    normal, weighted by the reduced mass m_b*m_c/(m_b+m_c), applied at the
    closest point (the reference applies per-manifold-point impulses; one
    exact-GJK closest point per collider is the batched recast — same
    total impulse, approximate torque arm, both documented "approximate").

    Returns an updated `bodies` (linvel/angvel deltas applied); the caller
    writes it back into the world (PhysicsWorld.move_character does).
    """
    import jax.numpy as jnp

    from rapier_tpu.geometry import gjk as _gjk
    from rapier_tpu.geometry.dispatch import collider_world_poses
    from rapier_tpu.geometry.queries import (
        EXCLUDE_FIXED, EXCLUDE_KINEMATIC, EXCLUDE_SENSORS,
        _as_device, _filter_mask, _hull_table,
    )
    from rapier_tpu.types import BodyType

    bodies = _as_device(bodies)
    colliders = _as_device(colliders)
    hulls = _as_device(hulls)
    shape_hull = _as_device(shape_hull)
    pos = jnp.asarray(pos, jnp.float32)
    rot = jnp.asarray(rot, jnp.float32)
    rem = jnp.asarray(translation_remaining, jnp.float32)
    st = jnp.int32(shape_type)
    prm = jnp.asarray(shape_params, jnp.float32)

    w_pos, w_rot = collider_world_poses(bodies, colliders)
    ok = _filter_mask(
        colliders, bodies.body_type,
        EXCLUDE_FIXED | EXCLUDE_KINEMATIC | EXCLUDE_SENSORS,
        exclude_collider, exclude_body,
    )
    hv_table = _hull_table(colliders, hulls)
    c = colliders.parent.shape[0]
    prediction = options.offset * 3.0

    def per_collider(cidx, valid):
        tB = colliders.shape_type[cidx]
        prmB = colliders.shape_params[cidx]
        hvB = None if hv_table is None else hv_table[cidx]
        supp = _gjk.make_support(
            pos, rot, st, prm, w_pos[cidx], w_rot[cidx], tB, prmB,
            hullA=shape_hull, hullB=hvB,
        )
        d0 = w_pos[cidx] - pos
        d0 = jnp.where(jnp.linalg.norm(d0) < 1e-9,
                       jnp.array([0.0, 1.0, 0.0]), d0)
        g = _gjk.gjk(supp, d0)
        b = _gjk._border_radius(st, prm) + _gjk._border_radius(tB, prmB)
        gap = jnp.where(g["intersect"], 0.0, g["dist"] - b)
        # Normal: character -> obstacle; contact point on the obstacle side.
        n = g["normal"]
        point = g["cpB"] - n * _gjk._border_radius(tB, prmB)
        touching = valid & (gap <= prediction)
        return touching, n, point

    touching, n_c, p_c = jax.vmap(per_collider)(jnp.arange(c), ok)

    parent = jnp.maximum(colliders.parent, 0)
    dyn = (bodies.body_type[parent] == BodyType.DYNAMIC) & (
        colliders.parent >= 0)
    push = touching & dyn

    # Velocity to transfer along each contact normal (reference :874+911).
    inv_dt = jnp.where(dt == 0, 0.0, 1.0 / jnp.asarray(dt, jnp.float32))
    v_transfer = (n_c @ rem) * inv_dt                       # [C] along n

    # Body velocity at the contact point.
    from rapier_tpu.math import quat as _q

    com_w = bodies.pos + _q.rotate(bodies.rot, bodies.local_com)
    arm = p_c - com_w[parent]
    v_at = bodies.linvel[parent] + jnp.cross(bodies.angvel[parent], arm)
    delta = v_transfer - jnp.sum(v_at * n_c, axis=-1)       # [C]

    m_body = jnp.where(
        bodies.inv_mass[parent] > 0, 1.0 / jnp.maximum(
            bodies.inv_mass[parent], 1e-12), 0.0)
    m_char = jnp.asarray(character_mass, jnp.float32)
    mass_ratio = m_body * m_char / jnp.maximum(m_body + m_char, 1e-9)
    imp = n_c * (jnp.maximum(delta, 0.0) * mass_ratio * push)[:, None]

    # Apply at point: dv = im * imp; dw = I_w^-1 (arm x imp).
    from rapier_tpu.dynamics.solver.velocity_solver import (
        effective_world_inv_inertia,
    )

    ii = effective_world_inv_inertia(bodies, jnp.ones((bodies.n,), bool))
    dv = jnp.zeros_like(bodies.linvel).at[parent].add(
        imp * bodies.inv_mass[parent][:, None])
    torque = jnp.cross(arm, imp)
    dw_body = jnp.zeros_like(bodies.angvel).at[parent].add(torque)
    dw = jnp.einsum("nij,nj->ni", ii, dw_body)
    # Pushed bodies wake up (reference apply_impulse_at_point wakes).
    woke = jnp.zeros((bodies.n,), bool).at[parent].max(push)
    return bodies.replace(
        linvel=bodies.linvel + dv,
        angvel=bodies.angvel + dw,
        sleeping=bodies.sleeping & ~woke,
        sleep_timer=jnp.where(woke, 0.0, bodies.sleep_timer),
    )
