"""Character / vehicle / PD controller tests."""

import jax.numpy as jnp
import numpy as np
import pytest

import jax

from rapier_tpu.control.character import CharacterControllerOptions
from rapier_tpu.control.character import move_shape as _move_shape
from rapier_tpu.control.pid import PdGains, pd_force_and_torque
from rapier_tpu.control.vehicle import default_wheels
from rapier_tpu.control.vehicle import update_vehicle as _update_vehicle
from rapier_tpu.types import ShapeType
from rapier_tpu.world import ColliderBuilder, PhysicsWorld, RigidBodyBuilder

# Controllers build large eager graphs (iterated shape casts); jit them.
move_shape = jax.jit(
    _move_shape,
    static_argnames=("options", "exclude_collider", "exclude_body", "flags"),
)
update_vehicle = jax.jit(
    _update_vehicle, static_argnames=("chassis", "forward_axis", "up_axis")
)


@pytest.fixture(scope="module")
def walled_scene():
    w = PhysicsWorld()
    g = w.insert_body(RigidBodyBuilder.fixed())
    w.insert_collider(ColliderBuilder.halfspace((0, 1, 0)), g)
    wall = w.insert_body(RigidBodyBuilder.fixed().with_translation((3, 1, 0)))
    w.insert_collider(ColliderBuilder.cuboid(0.2, 2.0, 5.0), wall)
    w.build()
    return w


def _capsule_params():
    return jnp.array([0.0, -0.4, 0.0, 0.0, 0.4, 0.0, 0.3] + [0.0] * 5)


def test_character_free_move(walled_scene):
    s = walled_scene.state
    mv = move_shape(
        s.bodies, s.colliders, int(ShapeType.CAPSULE), _capsule_params(),
        jnp.array([0.0, 1.0, 0.0]), jnp.array([0.0, 0.0, 0.0, 1.0]),
        jnp.array([0.5, 0.0, 0.0]),
        CharacterControllerOptions(snap_to_ground=0.0),
    )
    np.testing.assert_allclose(mv.translation, [0.5, 0, 0], atol=1e-3)


def test_character_blocked_by_wall(walled_scene):
    s = walled_scene.state
    mv = move_shape(
        s.bodies, s.colliders, int(ShapeType.CAPSULE), _capsule_params(),
        jnp.array([0.0, 1.0, 0.0]), jnp.array([0.0, 0.0, 0.0, 1.0]),
        jnp.array([5.0, 0.0, 0.0]),
        CharacterControllerOptions(snap_to_ground=0.0),
    )
    # Stops at the wall (x = 3 - 0.2 - 0.3 = 2.5) minus the offset.
    assert bool(mv.hit_obstacle)
    assert 2.3 < float(mv.translation[0]) < 2.52
    assert abs(float(mv.translation[2])) < 1e-3


def test_character_slides_along_wall(walled_scene):
    s = walled_scene.state
    mv = move_shape(
        s.bodies, s.colliders, int(ShapeType.CAPSULE), _capsule_params(),
        jnp.array([2.3, 1.0, 0.0]), jnp.array([0.0, 0.0, 0.0, 1.0]),
        jnp.array([1.0, 0.0, 1.0]),
        CharacterControllerOptions(snap_to_ground=0.0),
    )
    # x blocked at the wall, z slides through.
    assert float(mv.translation[2]) > 0.8
    assert float(mv.translation[0]) < 0.25


def test_character_grounded_and_snap(walled_scene):
    s = walled_scene.state
    mv = move_shape(
        s.bodies, s.colliders, int(ShapeType.CAPSULE), _capsule_params(),
        jnp.array([0.0, 0.8, 0.0]), jnp.array([0.0, 0.0, 0.0, 1.0]),
        jnp.array([0.2, 0.0, 0.0]),
        CharacterControllerOptions(snap_to_ground=0.3),
    )
    assert bool(mv.grounded)
    # Snapped down towards the floor (capsule bottom at y=0.8-0.7=0.1).
    assert float(mv.translation[1]) < -0.05


def test_pd_controller_drives_to_target():
    w = PhysicsWorld(gravity=(0, 0, 0))
    b = w.insert_body(RigidBodyBuilder.dynamic())
    w.insert_collider(ColliderBuilder.ball(0.5), b)
    w.build()
    target = jnp.zeros((8, 3)).at[b, 0].set(2.0)
    idq = jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0, 1.0]), (8, 4))
    for _ in range(120):
        force, torque = pd_force_and_torque(
            w.state.bodies, target, idq, jnp.zeros((8, 3)), jnp.zeros((8, 3)),
            PdGains(lin_kp=30.0, lin_kd=10.0),
        )
        w.state = w.state.replace(bodies=w.state.bodies.replace(force=force))
        w.step()
    assert abs(w.body_translation(b)[0] - 2.0) < 0.1


def test_vehicle_drives_forward():
    w = PhysicsWorld()
    g = w.insert_body(RigidBodyBuilder.fixed())
    w.insert_collider(ColliderBuilder.halfspace((0, 1, 0)).with_friction(1.0), g)
    chassis = w.insert_body(
        RigidBodyBuilder.dynamic().with_translation((0, 0.6, 0))
    )
    w.insert_collider(ColliderBuilder.cuboid(0.6, 0.2, 1.0), chassis)
    w.build()

    wheels = default_wheels(
        [(-0.5, 0.0, -0.8), (0.5, 0.0, -0.8), (-0.5, 0.0, 0.8), (0.5, 0.0, 0.8)],
        radius=0.25, rest_length=0.3,
    )
    nw = 4
    for i in range(90):
        upd = update_vehicle(
            w.state.bodies, w.state.colliders, chassis, wheels,
            engine_force=jnp.full((nw,), 8.0),
            brake=jnp.zeros((nw,)),
            steering=jnp.zeros((nw,)),
            dt=w.params.dt,
        )
        b = w.state.bodies
        # build() leaves are numpy; jnp.asarray makes .at[] updates work on
        # both the first (host) iteration and subsequent device iterations.
        w.state = w.state.replace(bodies=b.replace(
            linvel=jnp.asarray(b.linvel).at[chassis].set(upd.linvel),
            angvel=jnp.asarray(b.angvel).at[chassis].set(upd.angvel),
            sleeping=jnp.asarray(b.sleeping).at[chassis].set(False),
        ))
        w.step()
    p = w.body_translation(chassis)
    # Reference convention: forward = contact_normal x axle; with up normal
    # and +x axles that is -z.
    assert p[2] < -1.0, f"vehicle should drive forward (-z), at {p}"
    assert 0.2 < p[1] < 1.0  # suspension holds it off the ground
    assert bool(np.asarray(upd.in_contact).all())
