"""Generic convex-convex kernel tests (cylinder/cone pairs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from rapier_tpu.geometry.narrowphase_convex import convex_convex
from rapier_tpu.math import quat
from rapier_tpu.types import ShapeType
from rapier_tpu.world import ColliderBuilder, PhysicsWorld, RigidBodyBuilder

IDQ = jnp.array([0.0, 0.0, 0.0, 1.0])


def prm(*v):
    return jnp.array(list(v) + [0.0] * (12 - len(v)))


def test_ball_vs_cylinder_side():
    m = convex_convex(
        jnp.array([2.0, 0.0, 0.0]), IDQ, jnp.int32(ShapeType.BALL), prm(0.5),
        jnp.zeros(3), IDQ, jnp.int32(ShapeType.CYLINDER), prm(1.0, 1.0),
    )
    d = float(jnp.min(jnp.where(m.valid, m.dist, 1e10)))
    assert abs(d - 0.5) < 0.05
    np.testing.assert_allclose(m.normal, [-1, 0, 0], atol=0.05)


def test_cylinder_stack_penetration():
    # Standing cylinder on standing cylinder with 0.05 overlap.
    m = convex_convex(
        jnp.zeros(3), IDQ, jnp.int32(ShapeType.CYLINDER), prm(0.5, 0.5),
        jnp.array([0.0, 0.95, 0.0]), IDQ, jnp.int32(ShapeType.CYLINDER), prm(0.5, 0.5),
    )
    d = float(jnp.min(jnp.where(m.valid, m.dist, 1e10)))
    assert abs(d + 0.05) < 0.02
    np.testing.assert_allclose(m.normal, [0, 1, 0], atol=0.05)
    assert int(m.valid.sum()) >= 3  # stable cap-on-cap patch


def test_cone_vs_cuboid_separated():
    m = convex_convex(
        jnp.array([0.0, 2.0, 0.0]), IDQ, jnp.int32(ShapeType.CONE), prm(0.5, 0.5),
        jnp.zeros(3), IDQ, jnp.int32(ShapeType.CUBOID), prm(1.0, 1.0, 1.0),
    )
    d = float(jnp.min(jnp.where(m.valid, m.dist, 1e10)))
    assert abs(d - 0.5) < 0.05  # cone base at 1.5, box top at 1.0


def test_cylinder_rests_on_box_e2e():
    w = PhysicsWorld()
    g = w.insert_body(RigidBodyBuilder.fixed().with_translation((0, -1, 0)))
    w.insert_collider(ColliderBuilder.cuboid(50, 1, 50), g)
    b = w.insert_body(RigidBodyBuilder.dynamic().with_translation((0, 1.5, 0)))
    w.insert_collider(ColliderBuilder.cylinder(0.5, 0.5), b)
    w.build()
    w.step(240)
    p = w.body_translation(b)
    assert abs(p[1] - 0.5) < 0.03
    assert int(w.last_events.unsupported_pairs) == 0


def test_cone_rests_on_box_e2e():
    w = PhysicsWorld()
    g = w.insert_body(RigidBodyBuilder.fixed().with_translation((0, -1, 0)))
    w.insert_collider(ColliderBuilder.cuboid(50, 1, 50), g)
    b = w.insert_body(RigidBodyBuilder.dynamic().with_translation((0, 1.5, 0)))
    w.insert_collider(ColliderBuilder.cone(0.5, 0.5), b)
    w.build()
    w.step(240)
    p = w.body_translation(b)
    assert abs(p[1] - 0.5) < 0.05
    assert np.isfinite(p).all()
