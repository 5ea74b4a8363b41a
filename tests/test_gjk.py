"""GJK/EPA exactness tests.

Parity bar (VERDICT r2 #5): the generic kernel must match the analytic
kernels on overlapping cases and produce exact distances/normals where
sampled SAT was previously approximate (reference: parry GJK/EPA behind
`src/geometry/narrow_phase.rs:972-979`).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rapier_tpu.geometry.gjk import contact_support_maps
from rapier_tpu.math import quat
from rapier_tpu.types import ShapeType

IDQ = jnp.array([0.0, 0.0, 0.0, 1.0])


def prm(*v):
    return jnp.array(list(v) + [0.0] * (12 - len(v)))


def contact(pA, rA, tA, pa, pB, rB, tB, pb):
    d, n, cpA, cpB = contact_support_maps(
        jnp.asarray(pA, jnp.float32), rA, jnp.int32(tA), prm(*pa),
        jnp.asarray(pB, jnp.float32), rB, jnp.int32(tB), prm(*pb))
    return float(d), np.asarray(n), np.asarray(cpA), np.asarray(cpB)


def test_ball_ball_separated_exact():
    d, n, cpA, cpB = contact(
        [0, 0, 0], IDQ, ShapeType.BALL, (0.5,),
        [3, 4, 0], IDQ, ShapeType.BALL, (1.0,))
    assert abs(d - 3.5) < 1e-4          # |(3,4)| = 5 minus radii
    np.testing.assert_allclose(n, [0.6, 0.8, 0.0], atol=1e-4)
    np.testing.assert_allclose(cpA, [0.3, 0.4, 0.0], atol=1e-3)
    np.testing.assert_allclose(cpB, [3 - 0.6, 4 - 0.8, 0.0], atol=1e-3)


def test_ball_ball_penetrating_exact():
    d, n, _, _ = contact(
        [0, 0, 0], IDQ, ShapeType.BALL, (1.0,),
        [0.0, 1.5, 0.0], IDQ, ShapeType.BALL, (1.0,))
    assert abs(d + 0.5) < 1e-3          # overlap 0.5
    np.testing.assert_allclose(n, [0, 1, 0], atol=1e-3)


def test_box_box_face_penetration_exact():
    d, n, _, _ = contact(
        [0, 0, 0], IDQ, ShapeType.CUBOID, (1, 1, 1),
        [0.0, 1.8, 0.0], IDQ, ShapeType.CUBOID, (1, 1, 1))
    assert abs(d + 0.2) < 1e-3
    np.testing.assert_allclose(np.abs(n), [0, 1, 0], atol=1e-3)
    assert n[1] > 0


def test_box_box_edge_edge_rotated():
    # Two unit boxes yawed/pitched 45 deg so the contact is edge-edge — the
    # exact axis is a cross product NOT in the old 16-axis sampled set when
    # penetration is diagonal.
    rz = quat.from_axis_angle(jnp.array([0.0, 0.0, 1.0]), jnp.pi / 4)
    rx = quat.from_axis_angle(jnp.array([1.0, 0.0, 0.0]), jnp.pi / 4)
    # Box A rotated about z: its top edge runs along z at height sqrt(2)/2*...
    # Place B above, rotated about x, so its bottom edge runs along x.
    h = float(np.sqrt(2.0))            # rotated unit box half-height
    gap = 0.1
    d, n, _, _ = contact(
        [0, 0, 0], rz, ShapeType.CUBOID, (1, 1, 1),
        [0.0, 2 * h + gap, 0.0], rx, ShapeType.CUBOID, (1, 1, 1))
    assert abs(d - gap) < 1e-3
    np.testing.assert_allclose(n, [0, 1, 0], atol=1e-3)


def test_cylinder_cylinder_cap_gap_exact():
    d, n, _, _ = contact(
        [0, 0, 0], IDQ, ShapeType.CYLINDER, (0.5, 0.5),
        [0.0, 1.25, 0.0], IDQ, ShapeType.CYLINDER, (0.5, 0.5))
    assert abs(d - 0.25) < 1e-3
    np.testing.assert_allclose(n, [0, 1, 0], atol=1e-3)


def test_cylinder_side_side_diagonal_offset():
    # Upright cylinders offset diagonally in xz: exact gap is the center
    # distance minus radii — the old axis set had no (1,0,1) candidate
    # beyond the center line, this verifies the exact path.
    off = np.array([1.2, 0.0, 0.9])
    dist_c = np.linalg.norm(off)
    d, n, _, _ = contact(
        [0, 0, 0], IDQ, ShapeType.CYLINDER, (1.0, 0.5),
        off, IDQ, ShapeType.CYLINDER, (1.0, 0.5))
    assert abs(d - (dist_c - 1.0)) < 1e-3
    np.testing.assert_allclose(n, off / dist_c, atol=1e-3)


def test_round_cylinder_border_radius():
    # ROUND_CYLINDER prm = (hh, r, border).  Outer radius r+border.
    d, n, _, _ = contact(
        [0, 0, 0], IDQ, ShapeType.ROUND_CYLINDER, (0.5, 0.4, 0.1),
        [2.0, 0.0, 0.0], IDQ, ShapeType.ROUND_CYLINDER, (0.5, 0.4, 0.1))
    assert abs(d - 1.0) < 1e-3          # 2.0 - 2*(0.4+0.1)
    np.testing.assert_allclose(n, [1, 0, 0], atol=1e-3)


def test_cone_apex_into_box_penetration():
    # Cone (hh=0.5) apex down over a box top face at y<=1: apex at
    # c_y - 0.5.  With c_y = 1.3 the apex penetrates 0.2 deep.
    rflip = quat.from_axis_angle(jnp.array([1.0, 0.0, 0.0]), jnp.pi)
    d, n, _, _ = contact(
        [0.0, 1.3, 0.0], rflip, ShapeType.CONE, (0.5, 0.5),
        [0, 0, 0], IDQ, ShapeType.CUBOID, (1, 1, 1))
    assert abs(d + 0.2) < 5e-3
    np.testing.assert_allclose(n, [0, -1, 0], atol=5e-3)


def test_deep_box_penetration_epa():
    # 0.9 overlap — deep enough that EPA must expand several times.
    d, n, _, _ = contact(
        [0, 0, 0], IDQ, ShapeType.CUBOID, (1, 1, 1),
        [0.0, 1.1, 0.0], IDQ, ShapeType.CUBOID, (1, 1, 1))
    assert abs(d + 0.9) < 1e-2
    np.testing.assert_allclose(np.abs(n), [0, 1, 0], atol=1e-2)


def test_witness_points_on_surfaces():
    d, n, cpA, cpB = contact(
        [0, 0, 0], IDQ, ShapeType.CUBOID, (1, 1, 1),
        [0.0, 0.0, 3.0], IDQ, ShapeType.BALL, (0.5,))
    assert abs(d - 1.5) < 1e-3
    np.testing.assert_allclose(cpA, [0, 0, 1], atol=1e-2)
    np.testing.assert_allclose(cpB, [0, 0, 2.5], atol=1e-2)
