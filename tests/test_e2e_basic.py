"""End-to-end behavioral tests mirroring the reference's inline regression
suite (SURVEY §4: finiteness, resting stability, sleeping, force persistence,
snapshot determinism)."""

import jax
import numpy as np
import pytest

from rapier_tpu.world import ColliderBuilder, PhysicsWorld, RigidBodyBuilder


def make_ground_world(**kw):
    w = PhysicsWorld(**kw)
    g = w.insert_body(RigidBodyBuilder.fixed())
    w.insert_collider(ColliderBuilder.halfspace((0, 1, 0)), g)
    return w


def test_free_fall_velocity():
    w = PhysicsWorld()
    b = w.insert_body(RigidBodyBuilder.dynamic().with_translation((0, 100, 0)))
    w.insert_collider(ColliderBuilder.ball(0.5), b)
    w.build()
    w.step(60)  # 1 second
    v = w.body_linvel(b)
    assert abs(v[1] + 9.81) < 0.2
    assert np.isfinite(w.body_translation(b)).all()


def test_ball_rests_on_ground_no_drift():
    w = make_ground_world()
    b = w.insert_body(RigidBodyBuilder.dynamic().with_translation((0, 2, 0)))
    w.insert_collider(ColliderBuilder.ball(0.5), b)
    w.build()
    w.step(240)
    p = w.body_translation(b)
    assert abs(p[0]) < 1e-3 and abs(p[2]) < 1e-3
    assert abs(p[1] - 0.5) < 5e-3


def test_box_rests_on_ground():
    w = make_ground_world()
    b = w.insert_body(RigidBodyBuilder.dynamic().with_translation((0, 2, 0)))
    w.insert_collider(ColliderBuilder.cuboid(0.5, 0.5, 0.5), b)
    w.build()
    w.step(240)
    p = w.body_translation(b)
    assert abs(p[1] - 0.5) < 5e-3
    assert abs(p[0]) < 1e-2 and abs(p[2]) < 1e-2


def test_box_stack_stable():
    w = PhysicsWorld()
    g = w.insert_body(RigidBodyBuilder.fixed().with_translation((0, -1, 0)))
    w.insert_collider(ColliderBuilder.cuboid(50, 1, 50), g)
    boxes = []
    for i in range(5):
        b = w.insert_body(
            RigidBodyBuilder.dynamic().with_translation((0, 0.5 + i * 1.001, 0))
        )
        w.insert_collider(ColliderBuilder.cuboid(0.5, 0.5, 0.5).with_friction(0.7), b)
        boxes.append(b)
    w.build()
    w.step(300)
    for i, b in enumerate(boxes):
        p = w.body_translation(b)
        assert abs(p[1] - (0.5 + i)) < 0.05, f"box {i} at {p}"
        assert abs(p[0]) < 0.05 and abs(p[2]) < 0.05


def test_capsule_rests_on_ground_cuboid():
    # Regression: the (CUBOID, CAPSULE) canonical pair must dispatch to the
    # capsule-cuboid kernel (capsules used to fall through box grounds).
    w = PhysicsWorld()
    g = w.insert_body(RigidBodyBuilder.fixed().with_translation((0, -1, 0)))
    w.insert_collider(ColliderBuilder.cuboid(50, 1, 50), g)
    b = w.insert_body(RigidBodyBuilder.dynamic().with_translation((0, 2, 0)))
    w.insert_collider(ColliderBuilder.capsule_x(0.5, 0.25), b)
    w.build()
    w.step(240)
    p = w.body_translation(b)
    assert abs(p[1] - 0.25) < 2e-2
    assert int(w.last_events.unsupported_pairs) == 0


def test_restitution_bounce():
    # Combined restitution (AVERAGE rule, reference coefficient_combine_rule.rs)
    # = (0.8 + 1.0) / 2 = 0.9: impact at ~5.4 m/s must bounce at ~4.9 m/s.
    w = PhysicsWorld()
    g = w.insert_body(RigidBodyBuilder.fixed())
    w.insert_collider(ColliderBuilder.halfspace((0, 1, 0)).with_restitution(1.0), g)
    b = w.insert_body(RigidBodyBuilder.dynamic().with_translation((0, 2.0, 0)))
    w.insert_collider(ColliderBuilder.ball(0.5).with_restitution(0.8), b)
    w.build()
    prev_vy, ratio = 0.0, None
    for _ in range(60):
        w.step()
        vy = float(w.body_linvel(b)[1])
        if prev_vy < -1.0 and vy > 0.0:
            ratio = -vy / prev_vy
            break
        prev_vy = vy
    assert ratio is not None and 0.85 < ratio < 0.95


def test_sleeping_and_wake_up():
    w = make_ground_world()
    b = w.insert_body(RigidBodyBuilder.dynamic().with_translation((0, 1, 0)))
    w.insert_collider(ColliderBuilder.ball(0.5), b)
    w.build()
    w.step(240)
    assert w.body_is_sleeping(b)
    w.apply_impulse(b, (2.0, 0, 0))
    w.step(5)
    assert not w.body_is_sleeping(b)
    assert w.body_linvel(b)[0] > 0.5


def test_friction_stops_sliding_box():
    w = PhysicsWorld()
    g = w.insert_body(RigidBodyBuilder.fixed().with_translation((0, -1, 0)))
    w.insert_collider(ColliderBuilder.cuboid(100, 1, 100).with_friction(0.8), g)
    b = w.insert_body(
        RigidBodyBuilder.dynamic().with_translation((0, 0.5, 0)).with_linvel((4, 0, 0))
    )
    w.insert_collider(ColliderBuilder.cuboid(0.5, 0.5, 0.5).with_friction(0.8), b)
    w.build()
    w.step(180)
    v = w.body_linvel(b)
    assert np.linalg.norm(v) < 0.05  # friction brought it to rest
    assert w.body_translation(b)[0] > 0.3  # after sliding some distance


def test_zero_friction_keeps_sliding():
    w = PhysicsWorld()
    g = w.insert_body(RigidBodyBuilder.fixed().with_translation((0, -1, 0)))
    w.insert_collider(ColliderBuilder.cuboid(100, 1, 100).with_friction(0.0), g)
    b = w.insert_body(
        RigidBodyBuilder.dynamic().with_translation((0, 0.5, 0)).with_linvel((4, 0, 0))
    )
    w.insert_collider(ColliderBuilder.cuboid(0.5, 0.5, 0.5).with_friction(0.0), b)
    w.build()
    w.step(60)
    assert w.body_linvel(b)[0] > 3.5


def test_determinism_same_inputs_same_trajectory():
    def run():
        w = make_ground_world()
        b = w.insert_body(
            RigidBodyBuilder.dynamic()
            .with_translation((0.1, 2, 0.2))
            .with_angvel((1.0, 2.0, 3.0))
        )
        w.insert_collider(ColliderBuilder.cuboid(0.4, 0.3, 0.5), b)
        w.build()
        w.step(120)
        return np.concatenate([w.body_translation(b), w.body_rotation(b)])

    a = run()
    c = run()
    np.testing.assert_array_equal(a, c)


def test_snapshot_restore_identical_continuation():
    w = make_ground_world()
    b = w.insert_body(
        RigidBodyBuilder.dynamic().with_translation((0, 3, 0)).with_angvel((0, 0, 2))
    )
    w.insert_collider(ColliderBuilder.cuboid(0.5, 0.5, 0.5), b)
    w.build()
    w.step(30)
    snap = w.snapshot()
    w.step(60)
    after_a = w.body_translation(b).copy()
    w.restore(snap)
    w.step(60)
    after_b = w.body_translation(b)
    np.testing.assert_array_equal(after_a, after_b)


def test_force_persistence():
    """Forces persist across steps until reset (reference
    physics_pipeline.rs:1336-1415)."""
    w = PhysicsWorld(gravity=(0, 0, 0))
    b = w.insert_body(RigidBodyBuilder.dynamic())
    w.insert_collider(ColliderBuilder.ball(0.5), b)
    w.build()
    mass = 4.0 / 3.0 * np.pi * 0.5**3 * 1.0
    w.add_force(b, (mass, 0.0, 0.0))  # 1 m/s^2
    w.step(60)
    v1 = w.body_linvel(b)[0]
    assert abs(v1 - 1.0) < 0.05
    w.reset_forces(b)
    w.step(60)
    assert abs(w.body_linvel(b)[0] - v1) < 1e-5


def test_locked_rotations():
    # Locked axes zero the effective inverse inertia: contact/friction torques
    # must not rotate the body (reference LockedAxes semantics — a user-SET
    # angvel still integrates, so we drive rotation through contacts instead).
    w = make_ground_world()
    b = w.insert_body(
        RigidBodyBuilder.dynamic()
        .with_translation((0, 1.5, 0))
        .with_linvel((3, 0, 0))
        .lock_rotations()
    )
    w.insert_collider(ColliderBuilder.cuboid(0.5, 0.5, 0.5).with_friction(0.9), b)
    w.build()
    w.step(120)
    q = w.body_rotation(b)
    np.testing.assert_allclose(q, [0, 0, 0, 1], atol=1e-3)
    assert np.allclose(w.body_angvel(b), 0.0, atol=1e-4)


def test_kinematic_velocity_body_moves():
    w = PhysicsWorld(gravity=(0, 0, 0))
    b = w.insert_body(
        RigidBodyBuilder.kinematic_velocity_based().with_linvel((1, 0, 0))
    )
    w.insert_collider(ColliderBuilder.cuboid(0.5, 0.5, 0.5), b)
    w.build()
    w.step(60)
    assert abs(w.body_translation(b)[0] - 1.0) < 1e-3


def test_dt_zero_is_finite():
    import jax.numpy as jnp

    w = make_ground_world()
    b = w.insert_body(RigidBodyBuilder.dynamic().with_translation((0, 0.4, 0)))
    w.insert_collider(ColliderBuilder.ball(0.5), b)
    w.build()
    w.params = w.params.replace(dt=jnp.float32(0.0))
    w.step(3)
    assert np.isfinite(w.body_translation(b)).all()
    assert np.isfinite(w.body_linvel(b)).all()
