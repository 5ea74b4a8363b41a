"""Shape parameter table and vectorized per-shape geometry kernels.

The reference delegates shape-level geometry to parry (SURVEY §2.2); here each
shape is a row in a padded parameter table ``shape_params[C, 12]`` plus a type
id, so every geometric operation (AABB, support point, mass properties) is a
branch-free vectorized kernel dispatched with masks/`lax.switch`.

Parameter layouts (collider-local frame):

| type           | params                                                |
|----------------|-------------------------------------------------------|
| BALL           | [r]                                                   |
| CUBOID         | [hx, hy, hz]                                          |
| ROUND_CUBOID   | [hx, hy, hz, border_r]                                |
| CAPSULE        | [ax, ay, az, bx, by, bz, r]  (segment a-b + radius)   |
| SEGMENT        | [ax, ay, az, bx, by, bz]                              |
| HALFSPACE      | [nx, ny, nz]  outward unit normal, plane through org  |
| CYLINDER       | [hh, r]      axis = local Y                           |
| ROUND_CYLINDER | [hh, r, border_r]                                     |
| CONE           | [hh, r]      base at -hh*Y, apex at +hh*Y             |
| ROUND_CONE     | [hh, r, border_r]                                     |
| TRIANGLE       | [ax..az, bx..bz, cx..cz]                              |
| TRIMESH        | [tri_start, tri_count] into scene mesh tables         |
| HEIGHTFIELD    | [hf_index, nrows, ncols, sx, sy, sz]                  |
| CONVEX         | [vtx_start, vtx_count]                                |
"""

from __future__ import annotations

import jax.numpy as jnp

from rapier_tpu.math import quat
from rapier_tpu.types import ShapeType

# AABB half-extent used for unbounded shapes (halfspace).
BIG = 1.0e10


def _absm_vec(abs_m, v):
    """|R| @ v unrolled ([C,3,3] x [C,3] -> [C,3]): a 3-wide einsum
    contraction lowers to micro batched matmuls on TPU; the unroll fuses."""
    import jax.numpy as jnp
    return jnp.stack([
        abs_m[:, i, 0] * v[:, 0] + abs_m[:, i, 1] * v[:, 1]
        + abs_m[:, i, 2] * v[:, 2]
        for i in range(3)
    ], axis=-1)


def compute_aabbs(shape_type, shape_params, pos, rot):
    """Conservative world AABBs for a batch of shapes.

    Args:
      shape_type: [C] int32
      shape_params: [C, 12]
      pos: [C, 3] world position of the collider frame
      rot: [C, 4] world rotation of the collider frame
    Returns:
      (mins [C,3], maxs [C,3])
    """
    p = shape_params
    r_ball = p[:, 0:1]

    # Cuboid: half-extent of the rotated box = |R| @ h.
    m = quat.to_matrix(rot)                     # [C,3,3]
    abs_m = jnp.abs(m)
    he_cuboid = _absm_vec(abs_m, p[:, 0:3])
    he_round_cuboid = he_cuboid + p[:, 3:4]

    # Capsule / segment: hull of two spheres at world endpoints.
    a_w = quat.rotate(rot, p[:, 0:3])
    b_w = quat.rotate(rot, p[:, 3:6])
    cap_r = p[:, 6:7]
    cap_center = 0.5 * (a_w + b_w)
    he_capsule = jnp.abs(a_w - cap_center) + cap_r
    he_segment = jnp.abs(a_w - cap_center)

    # Cylinder / cone about local Y: per-axis extent |hh*a_i| + r*sqrt(1-a_i^2).
    axis = quat.rotate(rot, jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), a_w.shape))
    hh, rad = p[:, 0:1], p[:, 1:2]
    disc = jnp.sqrt(jnp.maximum(1.0 - axis * axis, 0.0))
    he_cyl = jnp.abs(axis) * hh + rad * disc
    he_round_cyl = he_cyl + p[:, 2:3]

    # Triangle: bounds of three rotated vertices (center handled below).
    ta = quat.rotate(rot, p[:, 0:3])
    tb = quat.rotate(rot, p[:, 3:6])
    tc = quat.rotate(rot, p[:, 6:9])
    tri_min = jnp.minimum(jnp.minimum(ta, tb), tc)
    tri_max = jnp.maximum(jnp.maximum(ta, tb), tc)

    big = jnp.full_like(he_cuboid, BIG)

    # Trimesh/heightfield: local AABB precomputed at build time in
    # params[2:8] (min, max); re-boxed under rotation.
    mesh_c_l = 0.5 * (p[:, 2:5] + p[:, 5:8])
    mesh_he_l = 0.5 * (p[:, 5:8] - p[:, 2:5])
    he_mesh = _absm_vec(abs_m, mesh_he_l)
    mesh_center = quat.rotate(rot, mesh_c_l)

    st = shape_type[:, None]
    # Symmetric half-extents around the collider origin for most shapes.
    he = jnp.where(st == ShapeType.BALL, r_ball,
         jnp.where(st == ShapeType.CUBOID, he_cuboid,
         jnp.where(st == ShapeType.ROUND_CUBOID, he_round_cuboid,
         jnp.where(st == ShapeType.CAPSULE, he_capsule,
         jnp.where(st == ShapeType.SEGMENT, he_segment,
         jnp.where((st == ShapeType.CYLINDER) | (st == ShapeType.CONE), he_cyl,
         jnp.where((st == ShapeType.ROUND_CYLINDER) | (st == ShapeType.ROUND_CONE),
                   he_round_cyl,
         jnp.where((st == ShapeType.TRIMESH) | (st == ShapeType.HEIGHTFIELD),
                   he_mesh,
         jnp.where(st == ShapeType.CONVEX,
                   he_mesh + p[:, 1:2],   # local bbox in [2:8] + border radius
                   big)))))))))

    center_off = jnp.where(
        (st == ShapeType.CAPSULE) | (st == ShapeType.SEGMENT), cap_center,
        jnp.where((st == ShapeType.TRIMESH) | (st == ShapeType.HEIGHTFIELD)
                  | (st == ShapeType.CONVEX),
                  mesh_center, 0.0),
    )

    mins = pos + center_off - he
    maxs = pos + center_off + he

    # Triangle uses asymmetric bounds.
    is_tri = st == ShapeType.TRIANGLE
    mins = jnp.where(is_tri, pos + tri_min, mins)
    maxs = jnp.where(is_tri, pos + tri_max, maxs)
    return mins, maxs


def support_point(shape_type, shape_params, direction, hull_verts=None):
    """Support point of a convex shape in its LOCAL frame for a local-frame
    `direction` (not necessarily unit).  Vectorized over leading axes.

    Used by GJK/EPA and halfspace contact generation.  Round shapes return the
    support of their inner (non-rounded) shape; callers add border_radius along
    the direction themselves.

    hull_verts: optional [..., V, 3] per-lane CONVEX vertex slots (padded by
    repetition); when given, CONVEX lanes return the argmax-dot vertex.
    """
    p = shape_params
    d = direction
    dn = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)

    sup_ball = dn * p[..., 0:1]
    sup_cuboid = jnp.sign(d) * p[..., 0:3]
    # Capsule: deeper endpoint + radius * dir.
    a, b, r = p[..., 0:3], p[..., 3:6], p[..., 6:7]
    pick_b = jnp.sum(d * (b - a), axis=-1, keepdims=True) > 0
    sup_capsule = jnp.where(pick_b, b, a) + dn * r
    sup_segment = jnp.where(pick_b, b, a)
    # Cylinder: rim point.
    hh, rad = p[..., 0:1], p[..., 1:2]
    d_xz = d * jnp.array([1.0, 0.0, 1.0])
    d_xz_n = d_xz / jnp.maximum(jnp.linalg.norm(d_xz, axis=-1, keepdims=True), 1e-12)
    y_sign = jnp.where(d[..., 1:2] >= 0, 1.0, -1.0)
    sup_cyl = d_xz_n * rad + y_sign * hh * jnp.array([0.0, 1.0, 0.0])
    # Cone: apex (+hh*Y) or base rim.
    apex = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), d.shape) * hh
    base_rim = d_xz_n * rad - hh * jnp.array([0.0, 1.0, 0.0])
    # Apex chosen when d·apex >= d·base_rim.
    pick_apex = jnp.sum(d * apex, axis=-1, keepdims=True) >= jnp.sum(
        d * base_rim, axis=-1, keepdims=True
    )
    sup_cone = jnp.where(pick_apex, apex, base_rim)

    # Triangle: best of the three vertices.
    va, vb, vc = p[..., 0:3], p[..., 3:6], p[..., 6:9]
    da = jnp.sum(d * va, axis=-1, keepdims=True)
    db = jnp.sum(d * vb, axis=-1, keepdims=True)
    dc = jnp.sum(d * vc, axis=-1, keepdims=True)
    sup_tri = jnp.where(
        (da >= db) & (da >= dc), va, jnp.where(db >= dc, vb, vc)
    )

    st = shape_type[..., None]
    out = jnp.where(st == ShapeType.BALL, sup_ball,
          jnp.where((st == ShapeType.CUBOID) | (st == ShapeType.ROUND_CUBOID),
                    sup_cuboid,
          jnp.where(st == ShapeType.CAPSULE, sup_capsule,
          jnp.where(st == ShapeType.SEGMENT, sup_segment,
          jnp.where((st == ShapeType.CYLINDER) | (st == ShapeType.ROUND_CYLINDER),
                    sup_cyl,
          jnp.where((st == ShapeType.CONE) | (st == ShapeType.ROUND_CONE),
                    sup_cone,
          jnp.where(st == ShapeType.TRIANGLE, sup_tri,
                    jnp.zeros_like(d))))))))

    if hull_verts is not None:
        dots = jnp.sum(hull_verts * d[..., None, :], axis=-1)  # [..., V]
        best = jnp.argmax(dots, axis=-1)
        v = hull_verts.shape[-2]
        oh = (
            best[..., None] == jnp.arange(v)
        ).astype(hull_verts.dtype)                             # [..., V]
        sup_hull = jnp.sum(hull_verts * oh[..., None], axis=-2)
        out = jnp.where(st == ShapeType.CONVEX, sup_hull, out)
    return out
