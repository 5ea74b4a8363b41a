"""Reduced-coordinate robot arm (the mujoco_menagerie3 flavor): a 3-link
multibody arm with position motors sweeps to a target pose and knocks a ball
off a pedestal.  Run: python examples/multibody_arm.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from rapier_tpu.world import (
    ColliderBuilder,
    GenericJointBuilder,
    PhysicsWorld,
    RigidBodyBuilder,
)

_ALL = 0b111111


def _rev_z(anchor1, anchor2):
    jb = GenericJointBuilder(locked_axes=_ALL & ~(1 << 5))  # free ANG_Z
    return jb.with_local_anchor1(anchor1).with_local_anchor2(anchor2)


def main():
    w = PhysicsWorld()
    ground = w.insert_body(RigidBodyBuilder.fixed().with_translation((0, -1, 0)))
    w.insert_collider(ColliderBuilder.cuboid(20, 1, 20), ground)

    base = w.insert_body(RigidBodyBuilder.fixed().with_translation((0, 0.0, 0)))
    links = []
    prev = base
    for i in range(3):
        b = w.insert_body(
            RigidBodyBuilder.dynamic().with_translation((0, 0.5 + i, 0))
        )
        w.insert_collider(
            ColliderBuilder.capsule_y(0.4, 0.08).with_density(300.0), b
        )
        jb = _rev_z((0, 0.5, 0) if i else (0, 0, 0), (0, -0.5, 0))
        jb = jb.with_motor_position(5, 0.0, 80.0, 8.0).with_armature(5, 0.05)
        w.insert_multibody_joint(prev, b, jb)
        links.append(b)
        prev = b

    pedestal = w.insert_body(RigidBodyBuilder.fixed().with_translation((1.8, 0.25, 0)))
    w.insert_collider(ColliderBuilder.cuboid(0.15, 0.25, 0.15), pedestal)
    ball = w.insert_body(RigidBodyBuilder.dynamic().with_translation((1.8, 0.8, 0)))
    w.insert_collider(ColliderBuilder.ball(0.25), ball)

    w.build()

    # Command the shoulder to sweep: the arm tip passes through the pedestal.
    w.set_multibody_motor_targets(0, 1, 5, target_pos=-1.35)
    w.step(300)

    q = w.multibody_q(0)
    p_ball = np.asarray(w.body_translation(ball))
    print(f"shoulder angle: {q[1, 5]:.3f} rad (target -1.35)")
    print(f"ball position:  {p_ball.round(3)}")
    assert np.isfinite(q).all() and np.isfinite(p_ball).all()
    assert q[1, 5] < -0.9, "shoulder motor never reached its sweep"
    assert abs(p_ball[0] - 1.8) > 0.4 or p_ball[1] < 0.6, (
        "arm should knock the ball off the pedestal"
    )
    print("multibody_arm OK")


if __name__ == "__main__":
    main()
