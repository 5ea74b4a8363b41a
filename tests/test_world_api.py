"""PhysicsWorld facade API tests (queries, contacts, snapshots)."""

import os
import tempfile

import numpy as np
import pytest

from rapier_tpu.world import ColliderBuilder, PhysicsWorld, RigidBodyBuilder


@pytest.fixture(scope="module")
def settled():
    w = PhysicsWorld()
    g = w.insert_body(RigidBodyBuilder.fixed().with_translation((0, -1, 0)))
    w.insert_collider(ColliderBuilder.cuboid(50, 1, 50), g)
    b = w.insert_body(RigidBodyBuilder.dynamic().with_translation((0, 0.6, 0)))
    w.insert_collider(ColliderBuilder.cuboid(0.5, 0.5, 0.5), b)
    sensor_body = w.insert_body(RigidBodyBuilder.fixed().with_translation((0, 0.5, 0)))
    w.insert_collider(ColliderBuilder.ball(2.0).as_sensor(), sensor_body)
    w.build()
    w.step(60)
    return w, b


def test_world_cast_ray(settled):
    from rapier_tpu.geometry.queries import EXCLUDE_SENSORS

    w, b = settled
    # Without the filter the big sensor ball is hit first.
    hit_any = w.cast_ray((0.0, 5.0, 0.0), (0.0, -1.0, 0.0))
    assert int(hit_any.collider) == 2
    hit = w.cast_ray((0.0, 5.0, 0.0), (0.0, -1.0, 0.0), flags=EXCLUDE_SENSORS)
    assert bool(hit.hit)
    assert int(hit.collider) == 1  # the box
    assert abs(float(hit.point[1]) - 1.0) < 0.05


def test_world_project_point(settled):
    from rapier_tpu.geometry.queries import EXCLUDE_SENSORS

    w, b = settled
    proj = w.project_point((0.0, 3.0, 0.0), flags=EXCLUDE_SENSORS)
    assert abs(float(proj.point[1]) - 1.0) < 0.05


def test_contacts_with(settled):
    w, b = settled
    pairs = w.contact_pairs_with(1)
    assert len(pairs) >= 1
    contacts = w.contacts_with(1)
    others = [c[0] for c in contacts]
    assert 0 in others  # touching the ground collider
    other, normal, pts, dists = contacts[others.index(0)]
    assert len(pts) >= 1
    assert np.all(dists < 0.01)


def test_intersections_with_sensor(settled):
    w, b = settled
    # The big sensor ball overlaps the box collider (index 1).
    assert 2 in w.intersection_pairs_with(1)


def test_snapshot_file_roundtrip(settled):
    w, b = settled
    p0 = w.body_translation(b).copy()
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "snap.npz")
        w.save_snapshot(path)
        w.step(30)
        moved = w.body_translation(b)
        w.load_snapshot(path)
        np.testing.assert_array_equal(w.body_translation(b), p0)
        # Deterministic resume: same steps give the same trajectory.
        w.step(30)
        np.testing.assert_array_equal(w.body_translation(b), moved)


def test_snapshot_mismatched_world_rejected(settled):
    """Restoring into a world with different capacities/structure raises
    instead of silently filling wrong fields (reference deserializes into
    typed sets, so a structural mismatch is impossible there)."""
    import pytest

    from rapier_tpu.world import ColliderBuilder, PhysicsWorld, RigidBodyBuilder

    w, _b = settled
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "snap.npz")
        w.save_snapshot(path)

        other = PhysicsWorld(body_capacity=64, collider_capacity=64)
        g = other.insert_body(RigidBodyBuilder.fixed())
        other.insert_collider(ColliderBuilder.cuboid(1, 1, 1), g)
        other.build()
        with pytest.raises(ValueError):
            other.load_snapshot(path)


def test_additional_solver_iterations_folded():
    """Per-body additional_solver_iterations raises the scene's substep
    count (reference rigid_body.rs builder + island.rs:8-12 max-fold; the
    batched solve folds over ALL bodies — documented superset)."""
    from rapier_tpu.world import ColliderBuilder, PhysicsWorld, RigidBodyBuilder

    w = PhysicsWorld()
    g = w.insert_body(RigidBodyBuilder.fixed())
    w.insert_collider(ColliderBuilder.cuboid(10, 1, 10), g)
    b = w.insert_body(
        RigidBodyBuilder.dynamic().with_translation((0, 2, 0))
        .with_additional_solver_iterations(4)
    )
    w.insert_collider(ColliderBuilder.ball(0.5), b)
    base_iters = w.params.num_solver_iterations
    w.build()
    assert w.params.num_solver_iterations == base_iters + 4


def test_debug_render_mesh_hull_outlines_and_modes():
    """Debug-render breadth (reference debug_render_pipeline.rs:53): trimesh
    wireframes, convex hull edges, body axes, and mode/style flags."""
    from rapier_tpu.utils.debug_render import (
        DebugRenderMode, DebugRenderStyle, debug_render,
    )
    from rapier_tpu.world import ColliderBuilder, PhysicsWorld, RigidBodyBuilder

    w = PhysicsWorld()
    g = w.insert_body(RigidBodyBuilder.fixed())
    verts = np.array([[-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1]],
                     np.float32)
    tris = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    w.insert_collider(ColliderBuilder.trimesh(verts, tris), g)
    hb = w.insert_body(RigidBodyBuilder.dynamic().with_translation((0, 2, 0)))
    pts = [(x, y, z) for x in (-0.5, 0.5) for y in (-0.5, 0.5)
           for z in (-0.5, 0.5)]
    w.insert_collider(ColliderBuilder.convex_hull(pts), hb)
    w.build()

    s0, e0, c0 = debug_render(w.state, mode=DebugRenderMode.COLLIDER_SHAPES)
    # 2 triangles x 3 edges + >= 12 hull edges.
    assert len(s0) >= 6 + 12, len(s0)

    s1, _, _ = debug_render(w.state, mode=DebugRenderMode.ALL)
    assert len(s1) > len(s0)          # body axes added

    style = DebugRenderStyle(collider_color=(1, 0, 0, 1))
    _, _, c2 = debug_render(w.state, mode=DebugRenderMode.COLLIDER_SHAPES,
                            style=style)
    assert tuple(np.asarray(c2)[0]) == (1.0, 0.0, 0.0, 1.0)


def test_contact_force_event_payload():
    """ContactForceEvent payload parity (reference geometry/mod.rs:179-196):
    total_force vector, max_force_direction, max_force_magnitude."""
    from rapier_tpu.types import ACTIVE_EVENTS_CONTACT_FORCE
    from rapier_tpu.world import ColliderBuilder, PhysicsWorld, RigidBodyBuilder

    w = PhysicsWorld()
    g = w.insert_body(RigidBodyBuilder.fixed().with_translation((0, -1, 0)))
    w.insert_collider(
        ColliderBuilder.cuboid(10, 1, 10)
        .with_active_events(ACTIVE_EVENTS_CONTACT_FORCE)
        .with_contact_force_event_threshold(0.1), g)
    b = w.insert_body(RigidBodyBuilder.dynamic().with_translation((0, 0.45, 0)))
    w.insert_collider(
        ColliderBuilder.ball(0.5)
        .with_active_events(ACTIVE_EVENTS_CONTACT_FORCE)
        .with_contact_force_event_threshold(0.1), b)
    w.step(30)
    ev = w.last_events
    lanes = np.where(np.asarray(ev.force_events))[0]
    assert len(lanes) >= 1
    p = lanes[0]
    tf = np.asarray(ev.total_force)[:, p]
    mag = float(np.asarray(ev.force_magnitude)[p])
    mx = float(np.asarray(ev.max_force_magnitude)[p])
    nd = np.asarray(ev.max_force_direction)[:, p]
    # Resting ball: the reported total at rest is (n_sub+1)/n_sub * m*g —
    # the reference's accumulator seeds each step with the injected
    # warmstart impulse and adds every substep's solve
    # (contact_constraint_element.rs:242 total_impulse = accumulator +
    # impulse; contact_with_twist_friction.rs:168,302), and this build
    # reproduces that accounting exactly.  One manifold per lane so
    # max == total and the direction is the (vertical) normal.
    m = 1.0 / float(np.asarray(w.state.bodies.inv_mass)[b])
    n_sub = w.params.num_solver_iterations
    expect = m * 9.81 * (n_sub + 1) / n_sub
    assert abs(np.linalg.norm(tf) - expect) / expect < 0.1, (tf, expect)
    assert abs(mx - mag) < 1e-6
    assert abs(abs(nd[1]) - 1.0) < 1e-3, nd
