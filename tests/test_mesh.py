"""Trimesh / heightfield narrow-phase tests (heightfield3 / trimesh3 analogs)."""

import numpy as np
import pytest

from rapier_tpu.world import ColliderBuilder, PhysicsWorld, RigidBodyBuilder


def flat_quad_mesh(half=10.0, y=0.0):
    verts = [(-half, y, -half), (half, y, -half), (half, y, half), (-half, y, half)]
    tris = [(0, 2, 1), (0, 3, 2)]
    return verts, tris


def test_ball_rests_on_trimesh():
    w = PhysicsWorld()
    g = w.insert_body(RigidBodyBuilder.fixed())
    v, t = flat_quad_mesh()
    w.insert_collider(ColliderBuilder.trimesh(v, t), g)
    b = w.insert_body(RigidBodyBuilder.dynamic().with_translation((0.5, 2, 0.3)))
    w.insert_collider(ColliderBuilder.ball(0.5), b)
    w.build()
    w.step(240)
    p = w.body_translation(b)
    assert abs(p[1] - 0.5) < 2e-2, p


def test_box_rests_on_trimesh():
    w = PhysicsWorld()
    g = w.insert_body(RigidBodyBuilder.fixed())
    v, t = flat_quad_mesh()
    w.insert_collider(ColliderBuilder.trimesh(v, t), g)
    b = w.insert_body(RigidBodyBuilder.dynamic().with_translation((0.0, 2, 0.0)))
    w.insert_collider(ColliderBuilder.cuboid(0.5, 0.5, 0.5).with_friction(0.6), b)
    w.build()
    w.step(300)
    p = w.body_translation(b)
    assert abs(p[1] - 0.5) < 3e-2, p
    assert abs(p[0]) < 0.1 and abs(p[2]) < 0.1


def test_capsule_rests_on_trimesh():
    w = PhysicsWorld()
    g = w.insert_body(RigidBodyBuilder.fixed())
    v, t = flat_quad_mesh()
    w.insert_collider(ColliderBuilder.trimesh(v, t), g)
    b = w.insert_body(RigidBodyBuilder.dynamic().with_translation((0.2, 2, 0.1)))
    w.insert_collider(ColliderBuilder.capsule_x(0.5, 0.25), b)
    w.build()
    w.step(300)
    p = w.body_translation(b)
    assert abs(p[1] - 0.25) < 3e-2, p


def test_heightfield_slope_and_valley():
    # A v-shaped heightfield: a ball dropped off-center rolls towards the
    # valley center line.
    w = PhysicsWorld()
    g = w.insert_body(RigidBodyBuilder.fixed())
    nr = nc = 9
    heights = np.zeros((nr, nc))
    for c in range(nc):
        heights[:, c] = abs(c - nc // 2) / (nc // 2)  # V along x
    w.insert_collider(
        ColliderBuilder.heightfield(heights, (16.0, 2.0, 16.0)), g
    )
    b = w.insert_body(RigidBodyBuilder.dynamic().with_translation((3.0, 3.0, 0.0)))
    w.insert_collider(ColliderBuilder.ball(0.5), b)
    w.build()
    w.step(420)
    p = w.body_translation(b)
    assert np.isfinite(p).all()
    assert abs(p[0]) < 3.0  # moved towards the valley
    assert p[1] > 0.2  # supported by the field, not fallen through
