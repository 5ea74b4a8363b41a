"""Joint behavior tests mirroring joints3 / joint_motor_position3 semantics
(SURVEY Appendix A)."""

import numpy as np
import pytest

from rapier_tpu.math import quat
from rapier_tpu.world import (
    ColliderBuilder,
    GenericJointBuilder,
    PhysicsWorld,
    RigidBodyBuilder,
    SphericalJointBuilder,
)


def test_fixed_joint_holds_bodies():
    w = PhysicsWorld()
    a = w.insert_body(RigidBodyBuilder.fixed().with_translation((0, 5, 0)))
    w.insert_collider(ColliderBuilder.cuboid(0.2, 0.2, 0.2), a)
    b = w.insert_body(RigidBodyBuilder.dynamic().with_translation((1, 5, 0)))
    w.insert_collider(ColliderBuilder.cuboid(0.2, 0.2, 0.2), b)
    w.insert_impulse_joint(
        a, b,
        GenericJointBuilder.fixed()
        .with_local_anchor1((1, 0, 0))
        .with_local_anchor2((0, 0, 0)),
    )
    w.build()
    w.step(120)
    p = w.body_translation(b)
    np.testing.assert_allclose(p, [1, 5, 0], atol=2e-2)
    np.testing.assert_allclose(w.body_rotation(b), [0, 0, 0, 1], atol=1e-2)


def test_spherical_pendulum_conserves_anchor():
    w = PhysicsWorld()
    a = w.insert_body(RigidBodyBuilder.fixed().with_translation((0, 5, 0)))
    w.insert_collider(ColliderBuilder.ball(0.1), a)
    b = w.insert_body(RigidBodyBuilder.dynamic().with_translation((1, 5, 0)))
    w.insert_collider(ColliderBuilder.ball(0.2), b)
    w.insert_impulse_joint(
        a, b,
        GenericJointBuilder.spherical().with_local_anchor2((-1, 0, 0)),
    )
    w.build()
    for _ in range(10):
        w.step(30)
        p = w.body_translation(b)
        q = w.body_rotation(b)
        anchor = p + np.asarray(quat.rotate(q, np.array([-1.0, 0.0, 0.0])))
        np.testing.assert_allclose(anchor, [0, 5, 0], atol=3e-2)
    # It must actually swing (gravity converts to velocity).
    assert w.body_translation(b)[1] < 4.9


def test_revolute_restricts_to_plane():
    w = PhysicsWorld()
    a = w.insert_body(RigidBodyBuilder.fixed().with_translation((0, 5, 0)))
    b = w.insert_body(RigidBodyBuilder.dynamic().with_translation((1, 5, 0))
                      .with_linvel((0, 0, 1)))  # out-of-plane kick
    w.insert_collider(ColliderBuilder.cuboid(0.2, 0.2, 0.2), b)
    # Revolute about Z through the fixed body's origin.
    w.insert_impulse_joint(
        a, b,
        GenericJointBuilder.revolute((0, 0, 1)).with_local_anchor2((-1, 0, 0)),
    )
    w.build()
    w.step(120)
    # Motion stays in the XY plane despite the kick.
    assert abs(w.body_translation(b)[2]) < 2e-2
    assert w.body_translation(b)[1] < 5.0  # swung down


def test_revolute_motor_velocity():
    w = PhysicsWorld(gravity=(0, 0, 0))
    a = w.insert_body(RigidBodyBuilder.fixed())
    b = w.insert_body(RigidBodyBuilder.dynamic().with_translation((1, 0, 0)))
    w.insert_collider(ColliderBuilder.cuboid(0.2, 0.2, 0.2), b)
    jb = (
        GenericJointBuilder.revolute((0, 0, 1))
        .with_local_anchor2((-1, 0, 0))
        .with_motor_velocity(3, 1.5, 300.0)  # axis 3 = ANG_X of the frame
    )
    w.insert_impulse_joint(a, b, jb)
    w.build()
    # The spin-up time constant is set by the orbit inertia (m r^2) vs the
    # motor damping — physical, matches the reference's motor model.
    w.step(240)
    wv = w.body_angvel(b)
    assert abs(wv[2] - 1.5) < 0.1


def test_revolute_motor_position_reaches_target():
    # joint_motor_position3-style: position motor drives to target angle.
    w = PhysicsWorld(gravity=(0, 0, 0))
    a = w.insert_body(RigidBodyBuilder.fixed())
    b = w.insert_body(RigidBodyBuilder.dynamic().with_translation((1, 0, 0)))
    w.insert_collider(ColliderBuilder.cuboid(0.2, 0.2, 0.2), b)
    target = np.pi / 4
    jb = (
        GenericJointBuilder.revolute((0, 0, 1))
        .with_local_anchor2((-1, 0, 0))
        .with_motor_position(3, target, 1000.0, 150.0)
    )
    w.insert_impulse_joint(a, b, jb)
    w.build()
    w.step(300)
    q = w.body_rotation(b)
    angle = 2.0 * np.arctan2(q[2], q[3])
    assert abs(angle - target) < 0.05
    # Anchor held.
    p = w.body_translation(b)
    anchor = p + np.asarray(quat.rotate(q, np.array([-1.0, 0.0, 0.0])))
    np.testing.assert_allclose(anchor, [0, 0, 0], atol=2e-2)


def test_revolute_limits_enforced():
    w = PhysicsWorld()
    a = w.insert_body(RigidBodyBuilder.fixed().with_translation((0, 5, 0)))
    b = w.insert_body(RigidBodyBuilder.dynamic().with_translation((1, 5, 0)))
    w.insert_collider(ColliderBuilder.cuboid(0.2, 0.2, 0.2), b)
    jb = (
        GenericJointBuilder.revolute((0, 0, 1))
        .with_local_anchor2((-1, 0, 0))
        .with_limits(3, -0.2, 0.2)
    )
    w.insert_impulse_joint(a, b, jb)
    w.build()
    w.step(240)
    q = w.body_rotation(b)
    angle = 2.0 * np.arctan2(q[2], q[3])
    assert -0.3 < angle < 0.3  # small overshoot tolerated


def test_rope_joint_limits_distance():
    w = PhysicsWorld()
    a = w.insert_body(RigidBodyBuilder.fixed().with_translation((0, 5, 0)))
    b = w.insert_body(RigidBodyBuilder.dynamic().with_translation((0.5, 5, 0)))
    w.insert_collider(ColliderBuilder.ball(0.2), b)
    w.insert_impulse_joint(a, b, GenericJointBuilder.rope(2.0))
    w.build()
    w.step(300)
    d = np.linalg.norm(w.body_translation(b) - np.array([0, 5, 0]))
    assert d < 2.1


def test_prismatic_slides_on_axis_only():
    w = PhysicsWorld(gravity=(0, 0, 0))
    a = w.insert_body(RigidBodyBuilder.fixed())
    b = w.insert_body(RigidBodyBuilder.dynamic().with_linvel((1.0, 2.0, 3.0)))
    w.insert_collider(ColliderBuilder.cuboid(0.2, 0.2, 0.2), b)
    w.insert_impulse_joint(a, b, GenericJointBuilder.prismatic((1, 0, 0)))
    w.build()
    w.step(60)
    p = w.body_translation(b)
    assert p[0] > 0.5  # slid along x
    assert abs(p[1]) < 1e-2 and abs(p[2]) < 1e-2
    np.testing.assert_allclose(w.body_rotation(b), [0, 0, 0, 1], atol=1e-3)


def test_spring_joint_oscillates_to_rest_length():
    w = PhysicsWorld(gravity=(0, 0, 0))
    a = w.insert_body(RigidBodyBuilder.fixed())
    b = w.insert_body(RigidBodyBuilder.dynamic().with_translation((3, 0, 0)))
    w.insert_collider(ColliderBuilder.ball(0.2), b)
    w.insert_impulse_joint(a, b, GenericJointBuilder.spring(1.0, 50.0, 8.0))
    w.build()
    w.step(600)
    d = np.linalg.norm(w.body_translation(b))
    assert abs(d - 1.0) < 0.1


def test_joint_disables_contacts_between_attached():
    w = PhysicsWorld(gravity=(0, 0, 0))
    a = w.insert_body(RigidBodyBuilder.dynamic())
    w.insert_collider(ColliderBuilder.ball(0.5), a)
    # Overlapping body, joined with contacts disabled: no separation impulse.
    b = w.insert_body(RigidBodyBuilder.dynamic().with_translation((0.3, 0, 0)))
    w.insert_collider(ColliderBuilder.ball(0.5), b)
    w.insert_impulse_joint(
        a, b,
        GenericJointBuilder.spherical()
        .with_local_anchor2((-0.3, 0, 0))
        .with_contacts_enabled(False),
    )
    w.build()
    w.step(60)
    assert np.linalg.norm(w.body_linvel(a)) < 1e-4
    assert np.linalg.norm(w.body_linvel(b)) < 1e-4


def test_spherical_swing_limit():
    """Coupled angular limit (joint_constraint_builder.rs:814): a spherical
    pendulum with a 0.4-rad swing limit must not exceed it (much)."""
    w = PhysicsWorld()
    anchor = w.insert_body(RigidBodyBuilder.fixed().with_translation((0, 2, 0)))
    bob = w.insert_body(RigidBodyBuilder.dynamic().with_translation((0, 1, 0))
                        .with_linvel((2.5, 0, 0)))
    w.insert_collider(ColliderBuilder.ball(0.1).with_density(50.0), bob)
    jb = SphericalJointBuilder().with_local_anchor1((0, 0, 0)) \
        .with_local_anchor2((0, 1, 0)).with_swing_limits(0.0, 0.4)
    w.insert_impulse_joint(anchor, bob, jb)
    w.build()
    max_angle = 0.0
    for _ in range(30):
        w.step(4)
        p = np.asarray(w.body_translation(bob))
        d = np.asarray([0, 2, 0]) - p
        ang = float(np.arccos(np.clip(d[1] / np.linalg.norm(d), -1, 1)))
        max_angle = max(max_angle, ang)
    # Without the limit the kick reaches ~1.2 rad; the soft limit caps it.
    assert max_angle < 0.65, f"swing limit failed: {max_angle}"
    assert max_angle > 0.2, f"pendulum never swung: {max_angle}"
