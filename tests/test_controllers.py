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


def test_character_autostep_onto_ledge():
    """CharacterAutostep (character_controller.rs:68): a capsule walking into
    a 0.2-high ledge steps up onto it when autostep is enabled, and is
    blocked when it is not."""
    w = PhysicsWorld()
    g = w.insert_body(RigidBodyBuilder.fixed().with_translation((0, -0.5, 0)))
    w.insert_collider(ColliderBuilder.cuboid(20, 0.5, 20), g)
    ledge = w.insert_body(RigidBodyBuilder.fixed().with_translation((2.0, 0.1, 0)))
    w.insert_collider(ColliderBuilder.cuboid(1.0, 0.1, 5.0), ledge)
    w.build()

    shape = (ShapeType.CAPSULE, jnp.asarray(
        [0.0, -0.3, 0.0, 0.0, 0.3, 0.0, 0.25] + [0.0] * 5, jnp.float32))
    start = jnp.asarray([0.0, 0.56, 0.0])
    want = jnp.asarray([1.6, 0.0, 0.0])

    blocked = _move_shape(
        w.state.bodies, w.state.colliders, shape[0], shape[1],
        start, jnp.asarray([0.0, 0.0, 0.0, 1.0]), want,
        CharacterControllerOptions(autostep_max_height=0.0),
    )
    stepped = _move_shape(
        w.state.bodies, w.state.colliders, shape[0], shape[1],
        start, jnp.asarray([0.0, 0.0, 0.0, 1.0]), want,
        CharacterControllerOptions(
            autostep_max_height=0.35, autostep_min_width=0.3
        ),
    )
    xb = float(np.asarray(blocked.translation)[0])
    xs = float(np.asarray(stepped.translation)[0])
    ys = float(np.asarray(stepped.translation)[1])
    assert xb < 1.2, f"should be blocked without autostep, moved {xb}"
    assert xs > xb + 0.2, f"autostep should advance further: {xs} vs {xb}"
    assert ys > 0.1, f"autostep should lift the character: dy={ys}"


def test_vehicle_holds_curve():
    """Side-friction resolution (ray_cast_vehicle_controller.rs:409-486):
    with steering applied, the vehicle yaws and follows a curve instead of
    plowing straight."""
    w = PhysicsWorld()
    g = w.insert_body(RigidBodyBuilder.fixed().with_translation((0, -0.5, 0)))
    w.insert_collider(ColliderBuilder.cuboid(200, 0.5, 200).with_friction(1.0), g)
    chassis = w.insert_body(
        RigidBodyBuilder.dynamic().with_translation((0, 0.6, 0))
    )
    w.insert_collider(
        ColliderBuilder.cuboid(0.6, 0.2, 1.0).with_density(3.0), chassis
    )
    w.build()
    wheels = default_wheels(
        [(-0.5, 0.0, -0.8), (0.5, 0.0, -0.8), (-0.5, 0.0, 0.8), (0.5, 0.0, 0.8)],
        radius=0.25, rest_length=0.3,
    )
    nw = 4
    steer = jnp.asarray([0.35, 0.35, 0.0, 0.0])   # front-wheel steering
    for i in range(150):
        upd = _update_vehicle(
            w.state.bodies, w.state.colliders, chassis, wheels,
            engine_force=jnp.full((nw,), 6.0),
            brake=jnp.zeros((nw,)),
            steering=steer,
            dt=w.params.dt,
        )
        b = w.state.bodies
        w.state = w.state.replace(bodies=b.replace(
            linvel=jnp.asarray(b.linvel).at[chassis].set(upd.linvel),
            angvel=jnp.asarray(b.angvel).at[chassis].set(upd.angvel),
            sleeping=jnp.asarray(b.sleeping).at[chassis].set(False),
        ))
        w.step()
    p = np.asarray(w.body_translation(chassis))
    assert np.isfinite(p).all()
    # Curved path: significant lateral displacement relative to forward travel.
    assert abs(p[0]) > 0.8, f"vehicle did not turn: {p}"
    assert 0.2 < p[1] < 1.0


def test_character_pushes_dynamic_box():
    """Character push impulses (reference character_controller.rs:840
    solve_character_collision_impulses): walking into a dynamic box
    transfers momentum along the contact normal, shoving it forward; a
    massless character (impulses off) leaves it asleep-still."""
    from rapier_tpu.world import ColliderBuilder, PhysicsWorld, RigidBodyBuilder
    from rapier_tpu.types import ShapeType

    def build():
        w = PhysicsWorld()
        g = w.insert_body(RigidBodyBuilder.fixed().with_translation((0, -1, 0)))
        w.insert_collider(ColliderBuilder.cuboid(20, 1, 20).with_friction(0.1), g)
        box = w.insert_body(
            RigidBodyBuilder.dynamic().with_translation((1.0, 0.4, 0.0)))
        w.insert_collider(
            ColliderBuilder.cuboid(0.4, 0.4, 0.4).with_friction(0.1), box)
        w.build()
        return w, box

    cap = [0.0, -0.4, 0.0, 0.0, 0.4, 0.0, 0.3]

    # Push: character at x=0 walks +x into the box with 80 kg behind it.
    w, box = build()
    v0 = np.asarray(w.body_linvel(box)).copy()
    mv = w.move_character(
        ShapeType.CAPSULE, cap, (0.0, 0.75, 0.0), (0, 0, 0, 1),
        (0.6, 0.0, 0.0), character_mass=80.0, dt=1.0 / 60.0,
    )
    assert bool(np.asarray(mv.hit_obstacle))
    v1 = np.asarray(w.body_linvel(box))
    assert v1[0] > 0.3, f"box not pushed: {v0} -> {v1}"
    # A few steps later the box has actually moved away.
    x0 = float(np.asarray(w.body_translation(box))[0])
    w.step(30)
    assert float(np.asarray(w.body_translation(box))[0]) > x0 + 0.05

    # No impulses: same move with apply_impulses=False leaves it still.
    w2, box2 = build()
    w2.move_character(
        ShapeType.CAPSULE, cap, (0.0, 0.75, 0.0), (0, 0, 0, 1),
        (0.6, 0.0, 0.0), character_mass=80.0, apply_impulses=False,
    )
    assert abs(float(np.asarray(w2.body_linvel(box2))[0])) < 1e-6
