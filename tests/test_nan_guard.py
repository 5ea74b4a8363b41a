"""NaN-trap / auto-rollback + conservative AABB query tests.

Reference analogs: snapshot rollback (examples3d/debug_rollback3.rs,
SURVEY §5.3 'rollback = the recovery story; add NaN-trap + auto-rollback
as the elastic-recovery analog') and
QueryPipeline::intersect_aabb_conservative (query_pipeline.rs).
"""

import numpy as np
import pytest

from rapier_tpu.world import ColliderBuilder, PhysicsWorld, RigidBodyBuilder


def _ball_world(**kw):
    w = PhysicsWorld(**kw)
    g = w.insert_body(RigidBodyBuilder.fixed().with_translation((0, -1, 0)))
    w.insert_collider(ColliderBuilder.cuboid(50, 1, 50), g)
    b = w.insert_body(RigidBodyBuilder.dynamic().with_translation((0, 2, 0)))
    w.insert_collider(ColliderBuilder.ball(0.5), b)
    w.build()
    return w, b


def _poison(w, b):
    w.state = w.state.replace(
        bodies=w.state.bodies.replace(
            pos=w.state.bodies.pos.at[int(b), 1].set(np.nan)))


def test_nan_trap_raises():
    w, b = _ball_world(nan_policy="trap", nan_check_every=1)
    w.step(2)
    _poison(w, b)
    with pytest.raises(FloatingPointError):
        w.step(1)


def test_nan_rollback_restores_last_finite():
    w, b = _ball_world(nan_policy="rollback", nan_check_every=1)
    w.step(5)
    y_good = float(np.asarray(w.body_translation(b))[1])
    _poison(w, b)
    w.step(1)   # guard sees the NaN (it survives the step), rolls back
    assert w.nan_rollbacks >= 1
    y = float(np.asarray(w.body_translation(b))[1])
    assert np.isfinite(y)
    assert abs(y - y_good) < 0.5   # restored to a recent finite state
    w.step(3)   # and stepping continues normally
    assert np.isfinite(np.asarray(w.body_translation(b))).all()


def test_nan_ignore_is_default_and_free():
    w, b = _ball_world()
    assert w.nan_policy == "ignore"
    w.step(3)
    assert np.isfinite(np.asarray(w.body_translation(b))).all()


def test_intersect_aabb_conservative():
    w = PhysicsWorld()
    g = w.insert_body(RigidBodyBuilder.fixed().with_translation((0, -1, 0)))
    w.insert_collider(ColliderBuilder.cuboid(50, 1, 50), g)        # collider 0
    a = w.insert_body(RigidBodyBuilder.dynamic().with_translation((0, 5, 0)))
    w.insert_collider(ColliderBuilder.ball(0.5), a)                # collider 1
    b = w.insert_body(RigidBodyBuilder.dynamic().with_translation((20, 5, 0)))
    w.insert_collider(ColliderBuilder.ball(0.5), b)                # collider 2
    w.build()
    hits = w.colliders_with_aabb_intersecting_aabb((-2, 4, -2), (2, 6, 2))
    assert 1 in hits and 2 not in hits and 0 not in hits
    hits_all = w.colliders_with_aabb_intersecting_aabb((-60, -5, -60), (60, 10, 60))
    assert set(hits_all) >= {0, 1, 2}
