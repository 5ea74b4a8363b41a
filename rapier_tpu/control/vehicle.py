"""Raycast vehicle controller (Bullet-style), batched and functional.

Behavioral port of the reference DynamicRayCastVehicleController
(src/control/ray_cast_vehicle_controller.rs:17): per-wheel suspension
raycasts, spring/damper suspension impulses, engine/brake forward impulses,
and side/forward friction resolution (resolve_single_unilateral :802, the
skid clamp :660-700) — as one pure function updating the chassis body's
velocity.  All W wheels are processed as vectorized lanes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from rapier_tpu.math import quat
from rapier_tpu.geometry import queries
from rapier_tpu.dynamics.solver.velocity_solver import effective_world_inv_inertia


@struct.dataclass
class WheelDesc:
    """Per-wheel static configuration, leading axis W (WheelTuning defaults,
    ray_cast_vehicle_controller.rs:60-70)."""

    chassis_connection: jax.Array   # [W, 3] chassis-local hard point
    direction: jax.Array            # [W, 3] chassis-local down
    axle: jax.Array                 # [W, 3] chassis-local axle
    radius: jax.Array               # [W]
    suspension_rest_length: jax.Array  # [W]
    suspension_stiffness: jax.Array    # [W]  (default 5.88)
    damping_compression: jax.Array     # [W]  (default 0.83)
    damping_relaxation: jax.Array      # [W]  (default 0.88)
    max_suspension_travel: jax.Array   # [W]  (default 5.0)
    max_suspension_force: jax.Array    # [W]  (default 6000)
    friction_slip: jax.Array           # [W]  (default 10.5)
    side_friction_stiffness: jax.Array # [W]  (default 1.0)
    roll_influence: jax.Array          # [W]  (default 0.1)


def default_wheels(connections, direction=(0, -1, 0), axle=(1, 0, 0),
                   radius=0.3, rest_length=0.4) -> WheelDesc:
    conns = jnp.asarray(connections, jnp.float32)
    w = conns.shape[0]
    ones = jnp.ones((w,), jnp.float32)
    return WheelDesc(
        chassis_connection=conns,
        direction=jnp.broadcast_to(jnp.asarray(direction, jnp.float32), (w, 3)),
        axle=jnp.broadcast_to(jnp.asarray(axle, jnp.float32), (w, 3)),
        radius=ones * radius,
        suspension_rest_length=ones * rest_length,
        suspension_stiffness=ones * 5.88,
        damping_compression=ones * 0.83,
        damping_relaxation=ones * 0.88,
        max_suspension_travel=ones * 5.0,
        max_suspension_force=ones * 6000.0,
        friction_slip=ones * 10.5,
        side_friction_stiffness=ones * 1.0,
        roll_influence=ones * 0.1,
    )


class VehicleUpdate(NamedTuple):
    linvel: jax.Array        # [3] new chassis linear velocity
    angvel: jax.Array        # [3] new chassis angular velocity
    in_contact: jax.Array    # [W]
    suspension_length: jax.Array  # [W]
    ground_collider: jax.Array    # [W] int32


def update_vehicle(bodies, colliders, chassis: int, wheels: WheelDesc,
                   engine_force, brake, steering, dt,
                   forward_axis: int = 2, up_axis: int = 1,
                   meshes=None, hulls=None) -> VehicleUpdate:
    """One vehicle control update; returns new chassis velocities.

    Mirrors update_vehicle (ray_cast_vehicle_controller.rs:408-486): suspension
    raycast per wheel -> suspension impulse -> side/forward friction impulses
    with the combined skid clamp.
    """
    pos = bodies.pos[chassis]
    rot = bodies.rot[chassis]
    com = pos + quat.rotate(rot, bodies.local_com[chassis])
    linvel = bodies.linvel[chassis]
    angvel = bodies.angvel[chassis]
    inv_mass = bodies.inv_mass[chassis]
    mass = jnp.where(inv_mass > 0, 1.0 / jnp.maximum(inv_mass, 1e-12), 0.0)
    ii = effective_world_inv_inertia(bodies, jnp.ones(bodies.n, bool))[chassis]

    up_w = quat.rotate(rot, jnp.zeros(3).at[up_axis].set(1.0))

    # Steering rotates direction/axle around the wheel's "up" (reference
    # update_wheel_transform).
    def wheel_frames(k):
        steer_q = quat.from_axis_angle(-wheels.direction[k], steering[k])
        dir_w = quat.rotate(rot, quat.rotate(steer_q, wheels.direction[k]))
        axle_w = quat.rotate(rot, quat.rotate(steer_q, wheels.axle[k]))
        hard_pt = pos + quat.rotate(rot, wheels.chassis_connection[k])
        return dir_w, axle_w, hard_pt

    w = wheels.radius.shape[0]
    dir_w, axle_w, hard_pt = jax.vmap(wheel_frames)(jnp.arange(w))

    # Suspension raycasts.
    def ray(k):
        maxlen = wheels.suspension_rest_length[k] + wheels.radius[k]
        hit = queries.cast_ray(
            bodies, colliders, hard_pt[k], dir_w[k], max_toi=maxlen,
            exclude_body=chassis, meshes=meshes, hulls=hulls,
        )
        return hit.hit, hit.toi, hit.normal, hit.collider

    in_contact, toi, contact_n, ground = jax.vmap(ray)(jnp.arange(w))
    susp_len = jnp.where(
        in_contact,
        jnp.clip(
            toi - wheels.radius,
            wheels.suspension_rest_length - wheels.max_suspension_travel,
            wheels.suspension_rest_length + wheels.max_suspension_travel,
        ),
        wheels.suspension_rest_length,
    )
    contact_pt = hard_pt + dir_w * toi[:, None]
    contact_n = jnp.where(in_contact[:, None], contact_n, -dir_w)

    def vel_at(p):
        return linvel + jnp.cross(angvel, p - com)

    # Suspension force (update_suspension, :493-531).
    denom = jnp.einsum("wj,wj->w", contact_n, dir_w)
    clipped_inv = jnp.where(denom >= -0.1, 10.0, -1.0 / denom)
    proj_vel = jnp.einsum("wj,wj->w", contact_n, jax.vmap(vel_at)(contact_pt))
    rel_vel = jnp.where(denom >= -0.1, 0.0, proj_vel * (-1.0 / denom))

    length_diff = wheels.suspension_rest_length - susp_len
    force = wheels.suspension_stiffness * length_diff * clipped_inv
    damping = jnp.where(rel_vel < 0, wheels.damping_compression,
                        wheels.damping_relaxation)
    force = force - damping * rel_vel
    susp_force = jnp.where(in_contact, jnp.maximum(force * mass, 0.0), 0.0)
    susp_force = jnp.minimum(susp_force, wheels.max_suspension_force)

    def apply_impulse_at(lv, av, imp, point):
        lv = lv + imp * inv_mass
        av = av + ii @ jnp.cross(point - com, imp)
        return lv, av

    lv, av = linvel, angvel
    for k in range(int(w)):
        imp = contact_n[k] * susp_force[k] * dt
        lv, av = apply_impulse_at(lv, av, imp, contact_pt[k])

    # Friction (update_friction, :534-700).
    proj_a = jnp.einsum("wj,wj->w", axle_w, contact_n)
    axle_t = axle_w - contact_n * proj_a[:, None]
    axle_t = axle_t / jnp.maximum(jnp.linalg.norm(axle_t, axis=-1, keepdims=True), 1e-9)
    fwd_t = jnp.cross(contact_n, axle_t)
    fwd_t = fwd_t / jnp.maximum(jnp.linalg.norm(fwd_t, axis=-1, keepdims=True), 1e-9)

    def impulse_denominator(p, n):
        dpt = p - com
        gcross = jnp.cross(dpt, n)
        v = jnp.cross(ii @ gcross, dpt)
        return inv_mass + jnp.dot(n, v)

    def side_imp(k):
        # resolve_single_unilateral (:802-818): static ground assumed.
        rel = jnp.dot(axle_t[k], lv + jnp.cross(av, contact_pt[k] - com))
        inv_den = 1.0 / jnp.maximum(impulse_denominator(contact_pt[k], axle_t[k]), 1e-9)
        return -0.2 * rel * inv_den * wheels.side_friction_stiffness[k]

    side = jnp.where(in_contact, jax.vmap(side_imp)(jnp.arange(w)), 0.0)

    # Forward impulse: engine, or brake/rolling friction.
    def rolling(k):
        rel = jnp.dot(fwd_t[k], lv + jnp.cross(av, contact_pt[k] - com))
        inv_den = 1.0 / jnp.maximum(impulse_denominator(contact_pt[k], fwd_t[k]), 1e-9)
        imp = -rel * inv_den
        return jnp.clip(imp, -brake[k], brake[k])

    fwd_imp = jnp.where(
        engine_force != 0.0, engine_force * dt,
        jax.vmap(rolling)(jnp.arange(w)),
    )
    fwd_imp = jnp.where(in_contact, fwd_imp, 0.0)

    # Combined skid clamp (:660-700).
    max_imp = susp_force * dt * wheels.friction_slip
    x = fwd_imp * 0.5
    y = side * 1.0
    imp_sq = x * x + y * y
    skid = jnp.where(
        imp_sq > max_imp * max_imp,
        max_imp / jnp.maximum(jnp.sqrt(imp_sq), 1e-9), 1.0,
    )
    fwd_imp = fwd_imp * skid
    side = side * skid

    for k in range(int(w)):
        lv, av = apply_impulse_at(lv, av, fwd_t[k] * fwd_imp[k], contact_pt[k])
        # Side impulse point raised towards the COM by roll_influence.
        p = contact_pt[k]
        p = p - up_w * (jnp.dot(up_w, p - com) * (1.0 - wheels.roll_influence[k]))
        lv, av = apply_impulse_at(lv, av, axle_t[k] * side[k], p)

    return VehicleUpdate(
        linvel=lv, angvel=av, in_contact=in_contact,
        suspension_length=susp_len, ground_collider=ground,
    )
