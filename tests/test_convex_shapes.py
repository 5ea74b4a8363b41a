"""Shape-zoo tail: convex hulls, compounds, voxels, polylines, decomposition.

Mirrors reference ColliderBuilder ctors (src/geometry/collider.rs:711
compound, :742 voxels, :1022 convex_hull) with resting-stability and mass
assertions.
"""

import numpy as np
import pytest

from rapier_tpu.geometry import mass_properties as mp
from rapier_tpu.world import ColliderBuilder, PhysicsWorld, RigidBodyBuilder

CUBE_PTS = [
    (x, y, z)
    for x in (-0.5, 0.5) for y in (-0.5, 0.5) for z in (-0.5, 0.5)
]


def test_hull_mass_matches_cube():
    cb = ColliderBuilder.convex_hull(CUBE_PTS)
    w = PhysicsWorld()
    b = w.insert_body(RigidBodyBuilder.dynamic().with_translation((0, 5, 0)))
    w.insert_collider(cb, b)
    st = w.build()
    # Unit cube, density 1: mass 1, inertia diag 1/6.
    inv_m = float(np.asarray(st.bodies.inv_mass)[b])
    np.testing.assert_allclose(1.0 / inv_m, 1.0, rtol=1e-5)
    inv_i = np.asarray(st.bodies.inv_principal_inertia)[b]
    np.testing.assert_allclose(1.0 / inv_i, 1.0 / 6.0, rtol=1e-4)


def test_hull_box_rests_on_ground():
    w = PhysicsWorld()
    g = w.insert_body(RigidBodyBuilder.fixed().with_translation((0, -1, 0)))
    w.insert_collider(ColliderBuilder.cuboid(20, 1, 20), g)
    b = w.insert_body(RigidBodyBuilder.dynamic().with_translation((0, 1.0, 0)))
    w.insert_collider(ColliderBuilder.convex_hull(CUBE_PTS), b)
    # An octahedron hull next to it (curved-ish support sampling).
    c = w.insert_body(RigidBodyBuilder.dynamic().with_translation((3, 1.0, 0)))
    octa = [(1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1)]
    w.insert_collider(ColliderBuilder.convex_hull(octa), c)
    w.build()
    w.step(240)
    pb = np.asarray(w.body_translation(b))
    pc = np.asarray(w.body_translation(c))
    assert np.isfinite(pb).all() and np.isfinite(pc).all()
    assert abs(pb[1] - 0.5) < 0.05, f"hull cube rest height {pb}"
    assert 0.9 < pc[1] < 1.25 or abs(pc[1] - 0.58) < 0.45  # octa settles on a face
    assert int(w.last_events.unsupported_pairs) == 0


def test_compound_two_balls_mass_and_rest():
    comp = ColliderBuilder.compound([
        ((-0.5, 0.0, 0.0), (0, 0, 0, 1), ColliderBuilder.ball(0.25)),
        ((0.5, 0.0, 0.0), (0, 0, 0, 1), ColliderBuilder.ball(0.25)),
    ])
    w = PhysicsWorld()
    g = w.insert_body(RigidBodyBuilder.fixed().with_translation((0, -1, 0)))
    w.insert_collider(ColliderBuilder.cuboid(20, 1, 20), g)
    b = w.insert_body(RigidBodyBuilder.dynamic().with_translation((0, 1.0, 0)))
    w.insert_collider(comp, b)
    st = w.build()
    m_ball = 4.0 / 3.0 * np.pi * 0.25**3
    inv_m = float(np.asarray(st.bodies.inv_mass)[b])
    np.testing.assert_allclose(1.0 / inv_m, 2 * m_ball, rtol=1e-4)
    w.step(240)
    p = np.asarray(w.body_translation(b))
    assert abs(p[1] - 0.25) < 0.03, f"dumbbell rest height {p}"


def test_voxels_merge_and_rest():
    centers = [(x * 0.5, 0.0, 0.0) for x in range(4)]  # 4-voxel x-run
    vb = ColliderBuilder.voxels(centers, 0.5)
    assert len(vb._children) == 1  # merged into one box
    w = PhysicsWorld()
    g = w.insert_body(RigidBodyBuilder.fixed().with_translation((0, -1, 0)))
    w.insert_collider(ColliderBuilder.cuboid(20, 1, 20), g)
    b = w.insert_body(RigidBodyBuilder.dynamic().with_translation((0, 0.6, 0)))
    w.insert_collider(vb, b)
    w.build()
    w.step(120)
    p = np.asarray(w.body_translation(b))
    assert abs(p[1] - 0.25) < 0.03, f"voxel bar rest height {p}"


def test_polyline_expands_to_segments():
    pb = ColliderBuilder.polyline([(0, 0, 0), (1, 0, 0), (2, 1, 0)])
    assert len(pb._children) == 2
    from rapier_tpu.types import ShapeType

    assert all(
        child.shape_type == ShapeType.SEGMENT for (_, _, child) in pb._children
    )


def test_convex_decomposition_l_shape():
    # An L-shaped prism: decomposition should yield >= 2 convex parts.
    def box_mesh(cx, cy, cz, hx, hy, hz, voff):
        v = np.array([
            (x, y, z)
            for x in (cx - hx, cx + hx)
            for y in (cy - hy, cy + hy)
            for z in (cz - hz, cz + hz)
        ])
        f = np.array([
            (0, 1, 3), (0, 3, 2), (4, 6, 7), (4, 7, 5),
            (0, 4, 5), (0, 5, 1), (2, 3, 7), (2, 7, 6),
            (0, 2, 6), (0, 6, 4), (1, 5, 7), (1, 7, 3),
        ]) + voff
        return v, f

    v1, f1 = box_mesh(0, 0, 0, 1.0, 0.25, 0.25, 0)
    v2, f2 = box_mesh(-0.75, 0.75, 0, 0.25, 0.5, 0.25, 8)
    verts = np.concatenate([v1, v2])
    faces = np.concatenate([f1, f2])
    cb = ColliderBuilder.convex_decomposition(verts, faces, max_parts=4)
    assert len(cb._children) >= 2
    from rapier_tpu.types import ShapeType

    assert all(
        child.shape_type == ShapeType.CONVEX for (_, _, child) in cb._children
    )


def test_mesh_mass_properties_unit_cube():
    v, f = np.array(CUBE_PTS, np.float64), None
    from scipy.spatial import ConvexHull

    hull = ConvexHull(v)
    smp = mp.mesh_mass_properties(v, hull.simplices, 2.0, assume_convex=True)
    np.testing.assert_allclose(smp.mass, 2.0, rtol=1e-6)
    np.testing.assert_allclose(smp.com, 0.0, atol=1e-9)
    np.testing.assert_allclose(smp.principal_inertia, 2.0 / 6.0, rtol=1e-5)
