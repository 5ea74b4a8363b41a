"""joints3 (reference examples3d/joints3.rs): columns exercising the joint
zoo — revolute 4-bar-ish chains, actuated prismatic, fixed-joint lattice,
spherical rope, spherical with swing limits.

Headless: builds the scene, steps 4 simulated seconds, prints per-column
diagnostics.  Run: python examples/joints3.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from rapier_tpu.world import (
    ColliderBuilder,
    FixedJointBuilder,
    PhysicsWorld,
    PrismaticJointBuilder,
    RevoluteJointBuilder,
    RigidBodyBuilder,
    SphericalJointBuilder,
)


def main():
    w = PhysicsWorld()

    # Column 1: revolute chain (z-axes) hanging from a fixed anchor.
    anchor = w.insert_body(RigidBodyBuilder.fixed().with_translation((0, 8, 0)))
    prev = anchor
    rev_chain = []
    for i in range(5):
        b = w.insert_body(
            RigidBodyBuilder.dynamic().with_translation((0.6 * (i + 1), 8, 0))
        )
        w.insert_collider(ColliderBuilder.cuboid(0.25, 0.1, 0.1), b)
        jb = RevoluteJointBuilder((0, 0, 1)).with_local_anchor1(
            (0.3, 0, 0) if prev != anchor else (0.0, 0.0, 0.0)
        ).with_local_anchor2((-0.3, 0, 0)).with_contacts_enabled(False)
        w.insert_impulse_joint(prev, b, jb)
        rev_chain.append(b)
        prev = b

    # Column 2: actuated prismatic slider driven by a position motor.
    base = w.insert_body(RigidBodyBuilder.fixed().with_translation((4, 6, 0)))
    slider = w.insert_body(RigidBodyBuilder.dynamic().with_translation((4, 6, 0)))
    w.insert_collider(ColliderBuilder.cuboid(0.3, 0.3, 0.3), slider)
    pj = PrismaticJointBuilder((0, 1, 0)).with_limits(0, -2.0, 2.0)
    pj = pj.with_motor_position(0, 1.5, 200.0, 20.0).with_contacts_enabled(False)
    w.insert_impulse_joint(base, slider, pj)

    # Column 3: fixed-joint 3x3 lattice (a stiff plate).
    grid = {}
    for r in range(3):
        for c in range(3):
            bb = RigidBodyBuilder.fixed() if r == 0 and c == 1 else \
                RigidBodyBuilder.dynamic()
            b = w.insert_body(bb.with_translation((8 + c * 0.6, 8 - r * 0.6, 0)))
            if not (r == 0 and c == 1):
                w.insert_collider(ColliderBuilder.ball(0.2), b)
            grid[(r, c)] = b
    for (r, c), b in grid.items():
        for (dr, dc, a1, a2) in [(1, 0, (0, -0.3, 0), (0, 0.3, 0)),
                                 (0, 1, (0.3, 0, 0), (-0.3, 0, 0))]:
            if (r + dr, c + dc) in grid:
                jb = FixedJointBuilder().with_local_anchor1(a1) \
                    .with_local_anchor2(a2).with_contacts_enabled(False)
                w.insert_impulse_joint(b, grid[(r + dr, c + dc)], jb)

    # Column 4: spherical rope with swing limits on the last link.
    prev = w.insert_body(RigidBodyBuilder.fixed().with_translation((12, 8, 0)))
    sph_chain = []
    for i in range(4):
        b = w.insert_body(
            RigidBodyBuilder.dynamic().with_translation((12, 8 - 0.7 * (i + 1), 0))
        )
        w.insert_collider(ColliderBuilder.ball(0.15), b)
        jb = SphericalJointBuilder().with_local_anchor1(
            (0, -0.35, 0) if i else (0, 0, 0)
        ).with_local_anchor2((0, 0.35, 0)).with_contacts_enabled(False)
        if i == 3:
            jb = jb.with_swing_limits(0.0, 0.5)
        w.insert_impulse_joint(prev, b, jb)
        sph_chain.append(b)
        prev = b

    w.build()
    w.step(240)

    tip = np.asarray(w.body_translation(rev_chain[-1]))
    sl = np.asarray(w.body_translation(slider))
    rope = np.asarray(w.body_translation(sph_chain[-1]))
    print(f"revolute chain tip: {tip.round(3)} (hangs below the anchor)")
    print(f"prismatic slider y: {sl[1]:.3f} (motor target 6+1.5=7.5)")
    print(f"spherical rope tip: {rope.round(3)}")
    assert np.isfinite(tip).all() and np.isfinite(sl).all()
    assert tip[1] < 8.0, "chain should sag"
    assert abs(sl[1] - 7.5) < 0.3, "prismatic motor should reach its target"
    print("joints3 OK")


if __name__ == "__main__":
    main()
