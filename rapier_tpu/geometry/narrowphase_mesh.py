"""Trimesh / heightfield narrow phase: per-pair triangle selection + kernels.

The TPU recast of parry's composite-shape dispatch: a broad-phase pair
(convex, mesh) expands into `tris_per_pair` sub-lanes, each holding one
candidate triangle chosen by AABB-overlap ranking (the mid-phase), and each
sub-lane produces its own contact manifold — mirroring the reference where a
mesh contact pair owns one manifold per touching triangle.

Heightfields are triangulated at build time (reference
HeightField::to_trimesh, used by the trimesh3 scene), so one code path serves
both.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rapier_tpu.math import quat
from rapier_tpu.geometry.narrowphase import (
    MAXP,
    Manifold,
    _closest_on_segment,
    _empty_manifold,
    _one_point,
    _safe_normalize,
)
from rapier_tpu.types import ShapeType


MESH_TYPES = (ShapeType.TRIMESH, ShapeType.HEIGHTFIELD)


def is_mesh_type(t):
    return (t == ShapeType.TRIMESH) | (t == ShapeType.HEIGHTFIELD)


# ---------------------------------------------------------------------------
# point / segment vs triangle primitives
# ---------------------------------------------------------------------------


def closest_point_triangle(p, a, b, c):
    """Closest point on triangle abc to p (Ericson 5.1.5, branch-free)."""
    ab = b - a
    ac = c - a
    ap = p - a
    d1 = jnp.dot(ab, ap)
    d2 = jnp.dot(ac, ap)
    bp = p - b
    d3 = jnp.dot(ab, bp)
    d4 = jnp.dot(ac, bp)
    cp = p - c
    d5 = jnp.dot(ab, cp)
    d6 = jnp.dot(ac, cp)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    # Region tests, evaluated innermost-first and overridden outward.
    denom = jnp.maximum(va + vb + vc, 1e-30)
    v_f = vb / denom
    w_f = vc / denom
    res = a + ab * v_f + ac * w_f                     # face interior

    # Edge BC.
    w_bc = jnp.clip((d4 - d3) / jnp.maximum((d4 - d3) + (d5 - d6), 1e-30), 0, 1)
    on_bc = (va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0)
    res = jnp.where(on_bc, b + (c - b) * w_bc, res)
    # Edge AC.
    w_ac = jnp.clip(d2 / jnp.maximum(d2 - d6, 1e-30), 0, 1)
    on_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    res = jnp.where(on_ac, a + ac * w_ac, res)
    # Edge AB.
    v_ab = jnp.clip(d1 / jnp.maximum(d1 - d3, 1e-30), 0, 1)
    on_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    res = jnp.where(on_ab, a + ab * v_ab, res)
    # Vertices.
    res = jnp.where((d6 >= 0) & (d5 <= d6), c, res)
    res = jnp.where((d3 >= 0) & (d4 <= d3), b, res)
    res = jnp.where((d1 <= 0) & (d2 <= 0), a, res)
    return res


def ball_triangle(pA, rA, prmA, v0, v1, v2) -> Manifold:
    rad = prmA[0]
    q = closest_point_triangle(pA, v0, v1, v2)
    d = q - pA
    n, dc = _safe_normalize(d, fallback=jnp.cross(v1 - v0, v2 - v0))
    dist = dc - rad
    # Deep-center case: use the triangle plane normal oriented away from A.
    tn, _ = _safe_normalize(jnp.cross(v1 - v0, v2 - v0))
    tn = jnp.where(jnp.dot(tn, pA - q) > 0, -tn, tn)  # from A towards tri
    n = jnp.where(dc < 1e-9, tn, n)
    sa = pA + n * rad
    return _one_point(n, 0.5 * (sa + q), dist)


def capsule_triangle(pA, rA, prmA, v0, v1, v2) -> Manifold:
    a = quat.transform_point(pA, rA, prmA[0:3])
    b = quat.transform_point(pA, rA, prmA[3:6])
    rad = prmA[6]

    def point_dist(t):
        p = a + (b - a) * t
        q = closest_point_triangle(p, v0, v1, v2)
        return jnp.linalg.norm(p - q)

    lo, hi = 0.0, 1.0
    for _ in range(20):
        m1 = lo + (hi - lo) / 3.0
        m2 = hi - (hi - lo) / 3.0
        go_right = point_dist(m1) > point_dist(m2)
        lo = jnp.where(go_right, m1, lo)
        hi = jnp.where(go_right, hi, m2)
    t_star = 0.5 * (lo + hi)

    cands = jnp.stack([t_star, 0.0, 1.0])
    m = _empty_manifold()
    prim_p = a + (b - a) * t_star
    prim_q = closest_point_triangle(prim_p, v0, v1, v2)
    n, _ = _safe_normalize(prim_q - prim_p,
                           fallback=jnp.cross(v1 - v0, v2 - v0))
    for k in range(3):
        p = a + (b - a) * cands[k]
        q = closest_point_triangle(p, v0, v1, v2)
        dist = jnp.dot(q - p, n) - rad
        dup = jnp.zeros((), bool)
        for prev in range(k):
            pp = a + (b - a) * cands[prev]
            dup = dup | (jnp.abs(cands[k] - cands[prev]) < 1e-4)
        keep = ~dup
        sa = p + n * rad
        m = m._replace(
            point=m.point.at[k].set(0.5 * (sa + q)),
            dist=m.dist.at[k].set(jnp.where(keep, dist, 1e10)),
            fid=m.fid.at[k].set(k),
            valid=m.valid.at[k].set(keep),
        )
    return m._replace(normal=n)


def _triangle_sat(pA, rA, stA, prmA, v0, v1, v2):
    """Sampled-SAT gap + axis between a convex shape and one triangle.

    Axes: triangle normal, center line, A's frame axes, frame-edge crosses.
    Returns (dist, n, degenerate-safe) — the cheap core shared by the
    manifold kernel below and mesh CCD bisection (dynamics/ccd.py)."""
    from rapier_tpu.geometry import shapes as shp
    from rapier_tpu.geometry.narrowphase_convex import _border_radius

    bA = _border_radius(stA, prmA)
    centroid = (v0 + v1 + v2) / 3.0
    tn = jnp.cross(v1 - v0, v2 - v0)
    tn, _ = _safe_normalize(tn)
    mA = quat.to_matrix(rA)
    center = centroid - pA      # direction A -> triangle

    edges = [v1 - v0, v2 - v1, v0 - v2]
    axes = [tn, center]
    for i in range(3):
        axes.append(mA[:, i])
        for e in edges:
            axes.append(jnp.cross(mA[:, i], e))
    cand = jnp.stack(axes)
    norms = jnp.linalg.norm(cand, axis=-1, keepdims=True)
    cand = cand / jnp.maximum(norms, 1e-9)
    degenerate = norms[:, 0] < 1e-6
    sgn = jnp.where(jnp.einsum("kj,j->k", cand, center) >= 0, 1.0, -1.0)
    cand = cand * sgn[:, None]

    verts = jnp.stack([v0, v1, v2])

    def gap(axis):
        # support of A along +axis; triangle support along -axis.
        s_l = shp.support_point(stA, prmA, quat.inv_rotate(rA, axis))
        sa = quat.transform_point(pA, rA, s_l)
        tri_min = jnp.min(jnp.einsum("kj,j->k", verts, axis))
        return tri_min - jnp.dot(axis, sa) - bA

    gaps = jax.vmap(gap)(cand)
    gaps = jnp.where(degenerate, -1e10, gaps)
    best = jnp.argmax(gaps)
    n = (jnp.arange(cand.shape[0]) == best).astype(cand.dtype) @ cand
    return jnp.max(gaps), n


def triangle_gap(pA, rA, stA, prmA, v0, v1, v2):
    """Signed separation estimate of a convex shape vs one triangle (CCD)."""
    dist, _n = _triangle_sat(pA, rA, stA, prmA, v0, v1, v2)
    return dist


def convex_triangle(pA, rA, stA, prmA, v0, v1, v2) -> Manifold:
    """Cuboid/cylinder/cone (+round) vs triangle: sampled SAT with
    triangle-specific axes + support-patch manifold."""
    from rapier_tpu.geometry import shapes as shp
    from rapier_tpu.geometry.narrowphase_convex import _border_radius

    bA = _border_radius(stA, prmA)
    verts = jnp.stack([v0, v1, v2])
    dist, n = _triangle_sat(pA, rA, stA, prmA, v0, v1, v2)

    # Manifold: perturbed supports of A towards the triangle.
    t1 = jnp.cross(n, jnp.array([1.0, 0.0, 0.0]))
    t1_alt = jnp.cross(n, jnp.array([0.0, 1.0, 0.0]))
    t1 = jnp.where(jnp.linalg.norm(t1) < 1e-6, t1_alt, t1)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1), 1e-9)
    t2 = jnp.cross(n, t1)
    eps = 0.04
    tilts = jnp.stack([t1 + t2, t1 - t2, -t1 + t2, -t1 - t2])

    def sample(k):
        d = n + eps * tilts[k]
        s_l = shp.support_point(stA, prmA, quat.inv_rotate(rA, d))
        return quat.transform_point(pA, rA, s_l) + n * bA, s_l

    sw, sl = jax.vmap(sample)(jnp.arange(4))
    # Per-point separation along n (A -> triangle): distance from the A-side
    # support point to the plane through the triangle's -n support vertex.
    tri_sup = verts[jnp.argmin(jnp.einsum("kj,j->k", verts, n))]
    depths = jnp.dot(tri_sup, n) - jnp.einsum("kj,j->k", sw, n)

    qs = jnp.round(sl * 1024.0).astype(jnp.int32)
    fid = (qs[:, 0] * 73856093) ^ (qs[:, 1] * 19349663) ^ (qs[:, 2] * 83492791)
    fid = jnp.abs(fid) % 1000003

    m = _empty_manifold()
    for k in range(4):
        dup = jnp.zeros((), bool)
        for prev in range(k):
            dup = dup | (jnp.linalg.norm(sw[k] - sw[prev]) < 1e-6)
        keep = ~dup
        mid = sw[k] + 0.5 * depths[k] * n
        m = m._replace(
            point=m.point.at[k].set(mid),
            dist=m.dist.at[k].set(jnp.where(keep, depths[k], 1e10)),
            fid=m.fid.at[k].set(fid[k]),
            valid=m.valid.at[k].set(keep),
        )
    # Anchor the deepest point to the SAT gap.
    min_d = jnp.min(jnp.where(m.valid, m.dist, 1e10))
    m = m._replace(dist=jnp.where(m.valid, m.dist + (dist - min_d), m.dist),
                   normal=n)
    return m
