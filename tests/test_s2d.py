"""Solver-quality parity scenes (the s2d suite analogs, SURVEY Appendix A).

The reference uses these box2d/solver2d-style scenes to eyeball TGS-soft
solver quality; here they are hard assertions on stack survival."""

import numpy as np
import pytest

from rapier_tpu.world2d import (
    ColliderBuilder2D,
    PhysicsWorld2D,
    RigidBodyBuilder2D,
)


def build_pyramid(w, base_count, half=0.5, friction=0.6):
    ground = w.insert_body(RigidBodyBuilder2D.fixed().with_translation((0, -1)))
    w.insert_collider(
        ColliderBuilder2D.cuboid(100.0, 1.0).with_friction(friction), ground
    )
    handles = []
    gap = half * 2.0 * 1.002
    for row in range(base_count):
        n = base_count - row
        y = half * 1.002 + row * half * 2.004
        x0 = -(n - 1) * gap / 2.0
        for i in range(n):
            b = w.insert_body(
                RigidBodyBuilder2D.dynamic().with_translation((x0 + i * gap, y))
            )
            w.insert_collider(
                ColliderBuilder2D.cuboid(half, half).with_friction(friction), b
            )
            handles.append((b, x0 + i * gap, y))
    return handles


def test_s2d_pyramid_10_rows_stands():
    w = PhysicsWorld2D()
    handles = build_pyramid(w, 10)
    w.build()
    w.step(300)  # 5 seconds
    for h, x, y in handles:
        p = w.body_translation2(h)
        assert abs(p[0] - x) < 0.15, f"box {h} drifted: {p} vs ({x},{y})"
        assert abs(p[1] - y) < 0.15, f"box {h} sank/toppled: {p} vs ({x},{y})"


def test_s2d_high_mass_ratio():
    """Heavy box on two light boxes (s2d_high_mass_ratio flavor)."""
    w = PhysicsWorld2D()
    ground = w.insert_body(RigidBodyBuilder2D.fixed().with_translation((0, -1)))
    w.insert_collider(ColliderBuilder2D.cuboid(50.0, 1.0).with_friction(0.5), ground)
    light = []
    for x in (-0.6, 0.6):
        b = w.insert_body(RigidBodyBuilder2D.dynamic().with_translation((x, 0.5)))
        w.insert_collider(
            ColliderBuilder2D.cuboid(0.3, 0.5).with_friction(0.5), b
        )
        light.append(b)
    heavy = w.insert_body(RigidBodyBuilder2D.dynamic().with_translation((0.0, 1.5)))
    w.insert_collider(
        ColliderBuilder2D.cuboid(1.2, 0.5).with_friction(0.5).with_density(25.0),
        heavy,
    )
    w.build()
    w.step(300)
    p = w.body_translation2(heavy)
    assert abs(p[1] - 1.5) < 0.12, f"heavy box sank to {p}"
    for b in light:
        q = w.body_rotation_angle(b)
        assert abs(q) < 0.2, f"support box {b} toppled (angle {q})"


def test_s2d_confined_boxes_calm():
    """Boxes confined between walls must come to rest (s2d_confined)."""
    w = PhysicsWorld2D()
    ground = w.insert_body(RigidBodyBuilder2D.fixed())
    w.insert_collider(ColliderBuilder2D.cuboid(3.0, 0.2).with_friction(0.5), ground)
    for sx in (-1, 1):
        wall = w.insert_body(
            RigidBodyBuilder2D.fixed().with_translation((sx * 2.5, 2.0))
        )
        w.insert_collider(ColliderBuilder2D.cuboid(0.2, 2.0), wall)
    boxes = []
    for i in range(8):
        b = w.insert_body(
            RigidBodyBuilder2D.dynamic().with_translation(
                (-1.8 + (i % 4) * 1.1, 1.0 + (i // 4) * 1.1)
            )
        )
        w.insert_collider(ColliderBuilder2D.cuboid(0.45, 0.45).with_friction(0.5), b)
        boxes.append(b)
    w.build()
    w.step(420)
    for b in boxes:
        v = w.body_linvel2(b)
        assert np.linalg.norm(v) < 0.1, f"box {b} still moving at {v}"
        assert -0.1 < w.body_translation2(b)[1] < 3.0
