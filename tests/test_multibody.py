"""Reduced-coordinate multibody tests.

Mirrors the reference's multibody regression/integration suites
(src/dynamics/joint/multibody_joint/multibody_regression_tests.rs and
crates/rapier3d/tests: armature, springs, dof couplings) with numeric
assertions on generalized-coordinate dynamics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rapier_tpu.dynamics import multibody as mbmod
from rapier_tpu.world import (
    ColliderBuilder,
    GenericJointBuilder,
    PhysicsWorld,
    RigidBodyBuilder,
)

G = 9.81
_ALL = 0b111111


def _rev_z():
    """Revolute about +z with identity frames (free slot = ANG_Z = bit 5)."""
    return GenericJointBuilder(locked_axes=_ALL & ~(1 << 5))


def _pendulum_world(armature=0.0, theta0=0.0, r=1.0):
    w = PhysicsWorld()
    root = w.insert_body(RigidBodyBuilder.fixed())
    bob = w.insert_body(RigidBodyBuilder.dynamic().with_translation((0, -r, 0)))
    w.insert_collider(ColliderBuilder.ball(0.1).with_density(100.0), bob)
    jb = _rev_z().with_local_anchor2((0.0, r, 0.0))
    if armature:
        jb = jb.with_armature(5, armature)
    w.insert_multibody_joint(root, bob, jb)
    state = w.build()
    if theta0:
        mb = state.multibodies
        q = np.asarray(mb.q).copy()
        q[0, 1, 5] = theta0
        jr = np.asarray(mb.joint_rot).copy()
        jr[0, 1] = [0, 0, np.sin(theta0 / 2), np.cos(theta0 / 2)]
        state = state.replace(multibodies=mb.replace(q=q, joint_rot=jr))
        w.state = state
    return w, state


def _qdd(state, w, dt=1.0 / 60.0):
    mb = state.multibodies
    bodies = jax.tree.map(jnp.asarray, state.bodies)
    n = bodies.pos.shape[0]
    lb0 = jnp.clip(mb.link_body[:, 0], 0, n - 1)
    qdd, aux = mbmod.forward_dynamics(
        jax.tree.map(jnp.asarray, mb), bodies,
        jnp.asarray(w.params.gravity), dt,
        bodies.pos[lb0], bodies.rot[lb0],
    )
    return np.asarray(qdd), aux


def test_pendulum_rest_no_acceleration():
    w, state = _pendulum_world()
    qdd, _ = _qdd(state, w)
    np.testing.assert_allclose(qdd, 0.0, atol=1e-4)


def test_pendulum_angular_acceleration():
    theta0 = 0.3
    r = 1.0
    w, state = _pendulum_world(theta0=theta0, r=r)
    # ball: m = 100 * 4/3 pi 0.1^3, I = 2/5 m a^2
    m = 100.0 * 4.0 / 3.0 * np.pi * 0.1**3
    i_ball = 0.4 * m * 0.1**2
    expected = -m * G * r * np.sin(theta0) / (m * r * r + i_ball)
    qdd, _ = _qdd(state, w)
    alpha = qdd[0, 1 * 6 + 5]
    np.testing.assert_allclose(alpha, expected, rtol=2e-3)


def test_armature_reduces_acceleration():
    theta0 = 0.3
    arm = 0.5
    w, state = _pendulum_world(theta0=theta0, armature=arm)
    m = 100.0 * 4.0 / 3.0 * np.pi * 0.1**3
    i_ball = 0.4 * m * 0.1**2
    expected = -m * G * np.sin(theta0) / (m + i_ball + arm)
    qdd, _ = _qdd(state, w)
    np.testing.assert_allclose(qdd[0, 11], expected, rtol=2e-3)


def test_free_root_falls():
    w = PhysicsWorld()
    root = w.insert_body(RigidBodyBuilder.dynamic().with_translation((0, 5, 0)))
    w.insert_collider(ColliderBuilder.ball(0.5).with_density(1.0), root)
    child = w.insert_body(RigidBodyBuilder.dynamic().with_translation((1, 5, 0)))
    w.insert_collider(ColliderBuilder.ball(0.5).with_density(1.0), child)
    w.insert_multibody_joint(root, child, _rev_z().with_local_anchor1((1, 0, 0)))
    state = w.build()
    qdd, _ = _qdd(state, w)
    # Free root linear-y slot accelerates at -g.
    np.testing.assert_allclose(qdd[0, 1], -G, rtol=1e-4)


def test_joint_spring_equilibrium():
    # Prismatic-y slot with a spring; equilibrium q = -m g / k.
    w = PhysicsWorld()
    root = w.insert_body(RigidBodyBuilder.fixed())
    slider = w.insert_body(RigidBodyBuilder.dynamic())
    w.insert_collider(ColliderBuilder.ball(0.1).with_density(100.0), slider)
    k = 500.0
    jb = GenericJointBuilder(locked_axes=_ALL & ~(1 << 1))  # free LIN_Y
    jb = jb.with_joint_spring(1, k, 0.0).with_joint_damping(1, 20.0)
    w.insert_multibody_joint(root, slider, jb)
    w.build()
    w.step(240)
    m = 100.0 * 4.0 / 3.0 * np.pi * 0.1**3
    q = w.multibody_q(0)
    np.testing.assert_allclose(q[1, 1], -m * G / k, rtol=1e-2, atol=1e-4)


def test_dof_coupling_velocity_ratio():
    # Two revolute links on one root; couple qd[link2] = 2 * qd[link1].
    w = PhysicsWorld()
    root = w.insert_body(RigidBodyBuilder.fixed())
    b1 = w.insert_body(RigidBodyBuilder.dynamic().with_translation((0, -1, 0)))
    w.insert_collider(ColliderBuilder.ball(0.1).with_density(100.0), b1)
    b2 = w.insert_body(RigidBodyBuilder.dynamic().with_translation((1, -1, 0)))
    w.insert_collider(ColliderBuilder.ball(0.1).with_density(100.0), b2)
    w.insert_multibody_joint(root, b1, _rev_z().with_local_anchor2((0, 1, 0)))
    w.insert_multibody_joint(
        root, b2,
        _rev_z().with_local_anchor1((1, 0, 0)).with_local_anchor2((0, 1, 0)),
    )
    state = w.build()
    mb = state.multibodies
    # couple dof of link2 (slot 2*6+5) to link1 (slot 1*6+5) with ratio 2.
    ca = np.asarray(mb.coupling_a).copy(); ca[0, 0] = 2 * 6 + 5
    cb = np.asarray(mb.coupling_b).copy(); cb[0, 0] = 1 * 6 + 5
    cr = np.asarray(mb.coupling_ratio).copy(); cr[0, 0] = 2.0
    w.state = state.replace(multibodies=mb.replace(
        coupling_a=ca, coupling_b=cb, coupling_ratio=cr))
    # Kick link1 and step; the coupling must hold the velocity ratio.
    qd = np.asarray(w.state.multibodies.qd).copy()
    qd[0, 1 * 6 + 5] = 1.0
    qd[0, 2 * 6 + 5] = 2.0
    w.state = w.state.replace(multibodies=w.state.multibodies.replace(qd=qd))
    w.step(30)
    qd = np.asarray(w.state.multibodies.qd)
    np.testing.assert_allclose(
        qd[0, 2 * 6 + 5], 2.0 * qd[0, 1 * 6 + 5], rtol=1e-3, atol=1e-5
    )


def test_motor_position_reaches_target():
    w, state = _pendulum_world()
    mb = state.multibodies
    tp = np.asarray(mb.motor_target_pos).copy(); tp[0, 1, 5] = 0.8
    ms = np.asarray(mb.motor_stiffness).copy(); ms[0, 1, 5] = 50.0
    md = np.asarray(mb.motor_damping).copy(); md[0, 1, 5] = 5.0
    w.state = state.replace(multibodies=mb.replace(
        motor_target_pos=tp, motor_stiffness=ms, motor_damping=md))
    w.step(600)
    q = w.multibody_q(0)
    # Gravity sags the converged angle slightly below the target.
    assert abs(q[1, 5] - 0.8) < 0.1, q[1, 5]


def test_pipeline_links_push_rigid_bodies():
    # A swinging arm (multibody) sweeps through a resting ball: one-way
    # coupling pushes the ball away.
    w = PhysicsWorld()
    ground = w.insert_body(RigidBodyBuilder.fixed().with_translation((0, -1, 0)))
    w.insert_collider(ColliderBuilder.cuboid(20, 1, 20), ground)
    root = w.insert_body(RigidBodyBuilder.fixed().with_translation((0, 2.0, 0)))
    arm = w.insert_body(RigidBodyBuilder.dynamic().with_translation((0, 1.0, 0)))
    w.insert_collider(ColliderBuilder.cuboid(0.1, 1.0, 0.1).with_density(5.0), arm)
    jb = GenericJointBuilder(locked_axes=_ALL & ~(1 << 5))
    jb = jb.with_local_anchor2((0.0, 1.0, 0.0))
    w.insert_multibody_joint(root, arm, jb)
    ball = w.insert_body(RigidBodyBuilder.dynamic().with_translation((0.8, 0.3, 0)))
    w.insert_collider(ColliderBuilder.ball(0.3), ball)
    state = w.build()
    # Tilt the arm and let it swing into the ball.
    mb = state.multibodies
    q = np.asarray(mb.q).copy(); q[0, 1, 5] = 1.2
    jr = np.asarray(mb.joint_rot).copy()
    jr[0, 1] = [0, 0, np.sin(0.6), np.cos(0.6)]
    w.state = state.replace(multibodies=mb.replace(q=q, joint_rot=jr))
    w.step(120)
    p = np.asarray(w.body_translation(ball))
    assert np.isfinite(p).all()
    assert abs(p[0]) > 1.0, f"ball should be knocked away, at {p}"
    q = w.multibody_q(0)
    assert np.isfinite(q).all()


def test_twoway_free_multibody_rests_on_ground():
    # Two-way coupling: a FREE-root two-link multibody dropped on the ground
    # must receive ground reaction through the articulation and come to rest
    # on the floor instead of sinking (reference: generic contact rows,
    # generic_contact_constraint.rs:392).
    w = PhysicsWorld()
    ground = w.insert_body(RigidBodyBuilder.fixed().with_translation((0, -1, 0)))
    w.insert_collider(ColliderBuilder.cuboid(20, 1, 20), ground)
    root = w.insert_body(RigidBodyBuilder.dynamic().with_translation((0, 1.0, 0)))
    w.insert_collider(ColliderBuilder.ball(0.5).with_density(1.0), root)
    child = w.insert_body(RigidBodyBuilder.dynamic().with_translation((1.2, 1.0, 0)))
    w.insert_collider(ColliderBuilder.ball(0.5).with_density(1.0), child)
    w.insert_multibody_joint(root, child, _rev_z().with_local_anchor1((1.2, 0, 0)))
    w.build()
    w.step(240)
    for h in (root, child):
        p = np.asarray(w.body_translation(h))
        assert np.isfinite(p).all()
        # Rest height = ball radius above the floor top (y=0), small tolerance.
        assert 0.3 < p[1] < 0.7, f"link should rest ON the floor, y={p[1]}"


def test_twoway_arm_blocked_by_fixed_wall():
    # One-way coupling cannot stop an articulated arm with a FIXED obstacle
    # (the wall can't be pushed away); two-way coupling must absorb the
    # impulse into the generalized velocities and block the swing.
    w = PhysicsWorld()
    root = w.insert_body(RigidBodyBuilder.fixed().with_translation((0, 2.0, 0)))
    arm = w.insert_body(RigidBodyBuilder.dynamic().with_translation((0, 1.0, 0)))
    w.insert_collider(ColliderBuilder.cuboid(0.1, 1.0, 0.1).with_density(5.0), arm)
    jb = _rev_z().with_local_anchor2((0.0, 1.0, 0.0))
    w.insert_multibody_joint(root, arm, jb)
    wall = w.insert_body(RigidBodyBuilder.fixed().with_translation((1.0, 0.6, 0)))
    w.insert_collider(ColliderBuilder.cuboid(0.2, 0.6, 2.0), wall)
    state = w.build()
    # Tilt the arm and let gravity swing it into the wall.
    mb = state.multibodies
    q = np.asarray(mb.q).copy(); q[0, 1, 5] = 0.6
    jr = np.asarray(mb.joint_rot).copy()
    jr[0, 1] = [0, 0, np.sin(0.3), np.cos(0.3)]
    w.state = state.replace(multibodies=mb.replace(q=q, joint_rot=jr))
    w.step(300)
    q = w.multibody_q(0)
    assert np.isfinite(q).all()
    # Arm tip swings toward -q direction; the wall at x=1.0 blocks it from
    # swinging past.  Without coupling the angle blows through ~-0.6.
    tip = np.asarray(w.body_translation(arm))
    assert tip[0] < 0.95, f"arm sank into the fixed wall, tip x={tip[0]}"
    assert abs(q[1, 5]) < 2.5, f"arm swung through the wall, q={q[1, 5]}"


def test_inverse_kinematics_reaches_target():
    # A 4-segment revolute chain (multibody_ik.rs test): DLS IK brings the
    # end link's origin to a reachable target.
    w = PhysicsWorld()
    root = w.insert_body(RigidBodyBuilder.fixed())
    prev = root
    bodies_h = []
    for i in range(4):
        b = w.insert_body(
            RigidBodyBuilder.dynamic().with_translation((0, -(i + 1), 0)))
        w.insert_collider(ColliderBuilder.ball(0.1).with_density(50.0), b)
        w.insert_multibody_joint(prev, b, _rev_z().with_local_anchor2((0, 1, 0)))
        prev = b
        bodies_h.append(b)
    state = w.build()
    mb = jax.tree.map(jnp.asarray, state.multibodies)
    bodies = jax.tree.map(jnp.asarray, state.bodies)

    target = jnp.array([[2.0, -2.0, 0.0]])
    tid = jnp.array([4], jnp.int32)          # end link slot
    trot = jnp.array([[0.0, 0.0, 0.0, 1.0]])
    mb2 = mbmod.inverse_kinematics(
        mb, bodies, tid, target, trot,
        damping=0.5, max_iters=40, constrained_axes=0b000111,  # position only
    )
    n = bodies.pos.shape[0]
    lb0 = jnp.clip(mb2.link_body[:, 0], 0, n - 1)
    l2w_pos, _ = mbmod.forward_kinematics(
        mb2, bodies, bodies.pos[lb0], bodies.rot[lb0])
    end = np.asarray(l2w_pos)[0, 4]
    assert np.linalg.norm(end - np.asarray(target)[0]) < 2e-3, end
    # qd must be untouched by the IK iterations.
    np.testing.assert_allclose(np.asarray(mb2.qd), np.asarray(mb.qd))


def test_inverse_kinematics_respects_frozen_joints():
    # joint_can_move=False freezes a link's dofs (multibody_ik.rs:104-125).
    w = PhysicsWorld()
    root = w.insert_body(RigidBodyBuilder.fixed())
    prev = root
    for i in range(3):
        b = w.insert_body(
            RigidBodyBuilder.dynamic().with_translation((0, -(i + 1), 0)))
        w.insert_collider(ColliderBuilder.ball(0.1).with_density(50.0), b)
        w.insert_multibody_joint(prev, b, _rev_z().with_local_anchor2((0, 1, 0)))
        prev = b
    state = w.build()
    mb = jax.tree.map(jnp.asarray, state.multibodies)
    bodies = jax.tree.map(jnp.asarray, state.bodies)
    can_move = np.ones((mb.m, mb.l), bool)
    can_move[0, 1] = False                    # first joint frozen
    mb2 = mbmod.inverse_kinematics(
        mb, bodies, jnp.array([3], jnp.int32),
        jnp.array([[1.0, -2.2, 0.0]]), jnp.array([[0.0, 0.0, 0.0, 1.0]]),
        damping=0.5, max_iters=30, constrained_axes=0b000111,
        joint_can_move=jnp.asarray(can_move),
    )
    q2 = np.asarray(mb2.q)
    assert abs(q2[0, 1, 5]) < 1e-7, "frozen joint moved"
    assert abs(q2[0, 2, 5]) + abs(q2[0, 3, 5]) > 0.1, "chain did not move"
