"""CCD motion-clamping tests (ccd3 analog: fast balls must not tunnel)."""

import numpy as np

from rapier_tpu.world import ColliderBuilder, PhysicsWorld, RigidBodyBuilder


def _wall_world(ccd: bool):
    w = PhysicsWorld(gravity=(0, 0, 0))
    wall = w.insert_body(RigidBodyBuilder.fixed())
    w.insert_collider(ColliderBuilder.cuboid(0.1, 5, 5), wall)
    bb = RigidBodyBuilder.dynamic().with_translation((-5, 0, 0)).with_linvel((100, 0, 0))
    bb.ccd_enabled = ccd
    b = w.insert_body(bb)
    w.insert_collider(ColliderBuilder.ball(0.5), b)
    w.build()
    return w, b


def test_fast_ball_tunnels_without_ccd():
    w, b = _wall_world(ccd=False)
    w.step(10)
    # 100 m/s * 10/60 s = 16.7m: blasts straight through the thin wall.
    assert w.body_translation(b)[0] > 5.0


def test_fast_ball_stopped_by_ccd():
    w, b = _wall_world(ccd=True)
    w.step(10)
    x = w.body_translation(b)[0]
    assert x < 0.0, f"ball at x={x} should have been clamped at the wall"
    assert x > -1.5  # and it did reach the wall
    assert np.isfinite(w.body_translation(b)).all()
