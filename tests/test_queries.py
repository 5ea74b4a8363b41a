import jax.numpy as jnp
import numpy as np
import pytest

from rapier_tpu.geometry import queries
from rapier_tpu.world import ColliderBuilder, PhysicsWorld, RigidBodyBuilder


@pytest.fixture(scope="module")
def scene():
    w = PhysicsWorld()
    g = w.insert_body(RigidBodyBuilder.fixed())
    w.insert_collider(ColliderBuilder.halfspace((0, 1, 0)), g)
    ball = w.insert_body(RigidBodyBuilder.fixed().with_translation((5, 1, 0)))
    w.insert_collider(ColliderBuilder.ball(0.5), ball)
    box = w.insert_body(RigidBodyBuilder.fixed().with_translation((-5, 1, 0)))
    w.insert_collider(ColliderBuilder.cuboid(0.5, 1.0, 0.5), box)
    cap = w.insert_body(RigidBodyBuilder.fixed().with_translation((0, 1, 5)))
    w.insert_collider(ColliderBuilder.capsule_y(0.5, 0.25), cap)
    w.build()
    return w


def test_ray_hits_ball(scene):
    s = scene.state
    hit = queries.cast_ray(
        s.bodies, s.colliders, jnp.array([5.0, 5.0, 0.0]), jnp.array([0.0, -1.0, 0.0])
    )
    assert bool(hit.hit)
    assert int(hit.collider) == 1
    np.testing.assert_allclose(hit.point, [5, 1.5, 0], atol=1e-5)
    np.testing.assert_allclose(hit.normal, [0, 1, 0], atol=1e-5)


def test_ray_hits_box_face(scene):
    s = scene.state
    hit = queries.cast_ray(
        s.bodies, s.colliders, jnp.array([-10.0, 1.0, 0.0]), jnp.array([1.0, 0.0, 0.0])
    )
    assert bool(hit.hit) and int(hit.collider) == 2
    assert abs(float(hit.toi) - 4.5) < 1e-5
    np.testing.assert_allclose(hit.normal, [-1, 0, 0], atol=1e-5)


def test_ray_hits_ground(scene):
    s = scene.state
    hit = queries.cast_ray(
        s.bodies, s.colliders, jnp.array([100.0, 3.0, 100.0]),
        jnp.array([0.0, -1.0, 0.0]),
    )
    assert bool(hit.hit) and int(hit.collider) == 0
    assert abs(float(hit.toi) - 3.0) < 1e-5


def test_ray_hits_capsule(scene):
    s = scene.state
    hit = queries.cast_ray(
        s.bodies, s.colliders, jnp.array([3.0, 1.0, 5.0]), jnp.array([-1.0, 0.0, 0.0])
    )
    assert bool(hit.hit) and int(hit.collider) == 3
    assert abs(float(hit.toi) - 2.75) < 1e-4


def test_ray_max_toi(scene):
    s = scene.state
    hit = queries.cast_ray(
        s.bodies, s.colliders, jnp.array([5.0, 5.0, 0.0]),
        jnp.array([0.0, -1.0, 0.0]), max_toi=2.0,
    )
    assert not bool(hit.hit)


def test_ray_misses_everything(scene):
    s = scene.state
    hit = queries.cast_ray(
        s.bodies, s.colliders, jnp.array([0.0, 5.0, 0.0]), jnp.array([0.0, 1.0, 0.0])
    )
    assert not bool(hit.hit)


def test_intersect_ray_all_hits(scene):
    s = scene.state
    hits, tois, normals = queries.intersect_ray(
        s.bodies, s.colliders, jnp.array([5.0, 5.0, 0.0]), jnp.array([0.0, -1.0, 0.0])
    )
    # Hits the ball and then the ground.
    assert bool(hits[1]) and bool(hits[0])


def test_project_point(scene):
    s = scene.state
    proj = queries.project_point(
        s.bodies, s.colliders, jnp.array([5.0, 2.5, 0.0])
    )
    assert int(proj.collider) == 1
    np.testing.assert_allclose(proj.point, [5, 1.5, 0], atol=1e-5)
    assert abs(float(proj.distance) - 1.0) < 1e-5
    assert not bool(proj.is_inside)


def test_point_inside(scene):
    s = scene.state
    inside = queries.intersections_with_point(
        s.bodies, s.colliders, jnp.array([5.0, 1.1, 0.0])
    )
    assert bool(inside[1]) and not bool(inside[2])


def test_exclude_collider(scene):
    s = scene.state
    hit = queries.cast_ray(
        s.bodies, s.colliders, jnp.array([5.0, 5.0, 0.0]),
        jnp.array([0.0, -1.0, 0.0]), exclude_collider=1,
    )
    # Skips the ball, hits the ground below.
    assert bool(hit.hit) and int(hit.collider) == 0


def test_intersect_shape(scene):
    """QueryPipeline::intersect_shape (query_pipeline.rs:537)."""
    from rapier_tpu.types import ShapeType

    # A ball probe at the scene ball's position overlaps only it (collider 1).
    hits = scene.intersections_with_shape(
        ShapeType.BALL, [0.6], (5.0, 1.0, 0.0), (0, 0, 0, 1)
    )
    assert list(hits) == [1], hits


def test_cast_shape_nonlinear_vs_linear(scene):
    """A pure-translation nonlinear cast must agree with the linear cast
    (query_pipeline.rs:510)."""
    w = scene
    from rapier_tpu.types import ShapeType

    lin = w.cast_shape(ShapeType.BALL, [0.2], (2.0, 1.0, 0.0), (0, 0, 0, 1),
                       (1.0, 0.0, 0.0), 10.0)
    non = w.cast_shape_nonlinear(
        ShapeType.BALL, [0.2], (2.0, 1.0, 0.0), (0, 0, 0, 1),
        (1.0, 0.0, 0.0), (0.0, 0.0, 0.0), 10.0,
    )
    assert bool(np.asarray(lin.hit)) and bool(np.asarray(non.hit))
    np.testing.assert_allclose(
        float(np.asarray(non.toi)), float(np.asarray(lin.toi)), atol=0.02
    )
    # A tumbling capsule reaches the obstacle: rotation matters but the cast
    # still reports a finite, earlier-or-equal impact than ignoring rotation.
    non2 = w.cast_shape_nonlinear(
        ShapeType.CAPSULE, [0.0, -0.5, 0.0, 0.0, 0.5, 0.0, 0.2],
        (2.0, 1.0, 0.0), (0, 0, 0, 1),
        (1.0, 0.0, 0.0), (0.0, 0.0, 3.0), 10.0,
    )
    assert bool(np.asarray(non2.hit))
