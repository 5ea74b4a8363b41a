"""Narrow phase: analytic per-shape-pair contact manifold kernels.

Replaces parry's `PersistentQueryDispatcher::contact_manifolds`
(reference src/geometry/narrow_phase.rs:972-979) with vectorized analytic
kernels over pair lanes (SURVEY §7).  Every kernel is written for a single
pair and `vmap`-ed by the dispatcher; `lax`-free arithmetic + `jnp.where`
keeps everything branch-free.

Conventions:
  * normal: world-space unit vector pointing from shape A towards shape B
    (the direction to push B to separate).  dist < 0 means penetration.
  * point: world-space midpoint between the two surface points.
  * fid: feature id, stable across steps for warmstart matching (the analog
    of parry's TrackedContact feature ids).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rapier_tpu.math import quat
from rapier_tpu.types import ShapeType

MAXP = 4  # contact points per manifold (reference MAX_MANIFOLD_POINTS, 3D)


class Manifold(NamedTuple):
    normal: jax.Array   # [3]
    point: jax.Array    # [MAXP, 3]
    dist: jax.Array     # [MAXP]
    fid: jax.Array      # [MAXP] int32
    valid: jax.Array    # [MAXP] bool — geometric validity (before margin test)


def _empty_manifold() -> Manifold:
    return Manifold(
        normal=jnp.array([0.0, 1.0, 0.0]),
        point=jnp.zeros((MAXP, 3)),
        dist=jnp.full((MAXP,), 1e10),
        fid=jnp.full((MAXP,), -1, jnp.int32),
        valid=jnp.zeros((MAXP,), bool),
    )


def _one_point(normal, point, dist, fid=0) -> Manifold:
    m = _empty_manifold()
    return m._replace(
        normal=normal,
        point=m.point.at[0].set(point),
        dist=m.dist.at[0].set(dist),
        fid=m.fid.at[0].set(fid),
        valid=m.valid.at[0].set(True),
    )


def _safe_normalize(v, fallback=None, eps=1e-9):
    n = jnp.linalg.norm(v)
    fb = jnp.array([0.0, 1.0, 0.0]) if fallback is None else fallback
    return jnp.where(n > eps, v / jnp.maximum(n, eps), fb), n


# ---------------------------------------------------------------------------
# ball vs ball
# ---------------------------------------------------------------------------


def ball_ball(pA, rA, prmA, pB, rB, prmB) -> Manifold:
    ra, rb = prmA[0], prmB[0]
    d = pB - pA
    n, dist_centers = _safe_normalize(d)
    dist = dist_centers - ra - rb
    sa = pA + n * ra
    sb = pB - n * rb
    return _one_point(n, 0.5 * (sa + sb), dist)


# ---------------------------------------------------------------------------
# point / segment helpers
# ---------------------------------------------------------------------------


def _closest_on_segment(a, b, p):
    ab = b - a
    t = jnp.dot(p - a, ab) / jnp.maximum(jnp.dot(ab, ab), 1e-12)
    t = jnp.clip(t, 0.0, 1.0)
    return a + ab * t, t


def _closest_segment_segment(p1, q1, p2, q2):
    """Closest points between segments [p1,q1], [p2,q2] (Ericson 5.1.9,
    branch-free form). Returns (s, t, c1, c2)."""
    d1 = q1 - p1
    d2 = q2 - p2
    r = p1 - p2
    a = jnp.dot(d1, d1)
    e = jnp.dot(d2, d2)
    f = jnp.dot(d2, r)
    c = jnp.dot(d1, r)
    b = jnp.dot(d1, d2)
    denom = a * e - b * b

    s = jnp.where(denom > 1e-12, jnp.clip((b * f - c * e) / jnp.maximum(denom, 1e-12), 0.0, 1.0), 0.0)
    t = (b * s + f) / jnp.maximum(e, 1e-12)
    t_cl = jnp.clip(t, 0.0, 1.0)
    s = jnp.where(t != t_cl, jnp.clip((b * t_cl - c) / jnp.maximum(a, 1e-12), 0.0, 1.0), s)
    # Degenerate segments.
    s = jnp.where(a <= 1e-12, 0.0, s)
    t_cl = jnp.where(e <= 1e-12, 0.0, t_cl)
    c1 = p1 + d1 * s
    c2 = p2 + d2 * t_cl
    return s, t_cl, c1, c2


def _capsule_world_segment(p, r, prm):
    a = quat.transform_point(p, r, prm[0:3])
    b = quat.transform_point(p, r, prm[3:6])
    return a, b, prm[6]


# ---------------------------------------------------------------------------
# ball vs capsule / capsule vs capsule
# ---------------------------------------------------------------------------


def ball_capsule(pA, rA, prmA, pB, rB, prmB) -> Manifold:
    rad_a = prmA[0]
    a, b, rad_b = _capsule_world_segment(pB, rB, prmB)
    q, _t = _closest_on_segment(a, b, pA)
    d = q - pA
    n, dc = _safe_normalize(d)
    dist = dc - rad_a - rad_b
    sa = pA + n * rad_a
    sb = q - n * rad_b
    return _one_point(n, 0.5 * (sa + sb), dist)


def capsule_capsule(pA, rA, prmA, pB, rB, prmB) -> Manifold:
    a1, b1, r1 = _capsule_world_segment(pA, rA, prmA)
    a2, b2, r2 = _capsule_world_segment(pB, rB, prmB)
    s, t, c1, c2 = _closest_segment_segment(a1, b1, a2, b2)
    n, dc = _safe_normalize(c2 - c1)
    dist0 = dc - r1 - r2
    m = _empty_manifold()

    # Primary point.
    sa = c1 + n * r1
    sb = c2 - n * r2
    m = m._replace(
        normal=n,
        point=m.point.at[0].set(0.5 * (sa + sb)),
        dist=m.dist.at[0].set(dist0),
        fid=m.fid.at[0].set(0),
        valid=m.valid.at[0].set(True),
    )

    # Near-parallel capsules: add a second point from the other end of the
    # overlap region so the contact is a stable line (parry produces 2-point
    # manifolds for parallel capsule pairs).
    d1 = b1 - a1
    d2 = b2 - a2
    cr = jnp.cross(d1, d2)
    parallel = jnp.dot(cr, cr) < 1e-6 * jnp.dot(d1, d1) * jnp.dot(d2, d2)
    # Project seg2 endpoints onto seg1's line, clamp to seg1, re-pair.
    u = d1 / jnp.maximum(jnp.linalg.norm(d1), 1e-12)
    ta = jnp.dot(a2 - a1, u)
    tb = jnp.dot(b2 - a1, u)
    lo = jnp.clip(jnp.minimum(ta, tb), 0.0, jnp.linalg.norm(d1))
    hi = jnp.clip(jnp.maximum(ta, tb), 0.0, jnp.linalg.norm(d1))
    # Secondary point at whichever end of the overlap is farther from c1.
    t_far = jnp.where(jnp.abs(hi - jnp.dot(c1 - a1, u)) > jnp.abs(lo - jnp.dot(c1 - a1, u)), hi, lo)
    p1b = a1 + u * t_far
    q2b, _ = _closest_on_segment(a2, b2, p1b)
    n2, dc2 = _safe_normalize(q2b - p1b, fallback=n)
    dist2 = dc2 - r1 - r2
    sa2 = p1b + n * r1
    sb2 = q2b - n * r2
    use2 = parallel & (hi - lo > 1e-6)
    m = m._replace(
        point=m.point.at[1].set(0.5 * (sa2 + sb2)),
        dist=m.dist.at[1].set(jnp.where(use2, dist2, 1e10)),
        fid=m.fid.at[1].set(1),
        valid=m.valid.at[1].set(use2),
    )
    return m


# ---------------------------------------------------------------------------
# ball vs cuboid
# ---------------------------------------------------------------------------


def _point_box_signed(p_local, h):
    """Signed distance + outward normal + surface point of a point vs a box
    (box-local frame).  Handles inside case via deepest-face selection."""
    q = jnp.clip(p_local, -h, h)
    outside_vec = p_local - q
    d_out = jnp.linalg.norm(outside_vec)
    inside = d_out < 1e-12

    # Inside: distance to closest face (negative), normal = face outward.
    # One-hot arithmetic (no computed-index updates: slow scatters on TPU).
    face_d = h - jnp.abs(p_local)  # >= 0 inside
    ax = jnp.argmin(face_d)
    oh = (jnp.arange(3) == ax).astype(p_local.dtype)
    sgn = jnp.where(jnp.sum(oh * p_local) >= 0, 1.0, -1.0)
    n_in = oh * sgn
    surf_in = p_local * (1.0 - oh) + oh * sgn * h

    n_out = outside_vec / jnp.maximum(d_out, 1e-12)
    dist = jnp.where(inside, -jnp.min(face_d), d_out)
    n = jnp.where(inside, n_in, n_out)
    surf = jnp.where(inside, surf_in, q)
    return dist, n, surf


def ball_cuboid(pA, rA, prmA, pB, rB, prmB) -> Manifold:
    rad = prmA[0]
    h = prmB[0:3]
    c_local = quat.inverse_transform_point(pB, rB, pA)
    dist_c, n_local, surf_local = _point_box_signed(c_local, h)
    n_box_out = quat.rotate(rB, n_local)          # outward from box
    surf_w = quat.transform_point(pB, rB, surf_local)
    n = -n_box_out                                # from ball towards box
    dist = dist_c - rad
    sa = pA + n * rad
    return _one_point(n, 0.5 * (sa + surf_w), dist)


# ---------------------------------------------------------------------------
# capsule vs cuboid
# ---------------------------------------------------------------------------


def capsule_cuboid(pA, rA, prmA, pB, rB, prmB) -> Manifold:
    a, b, rad = _capsule_world_segment(pA, rA, prmA)
    h = prmB[0:3]
    al = quat.inverse_transform_point(pB, rB, a)
    bl = quat.inverse_transform_point(pB, rB, b)

    def seg_point(t):
        return al + (bl - al) * t

    # Golden-section search for the closest segment parameter (distance to
    # the box is convex along the segment outside the box; inside we want
    # deepest, which this approximates well enough for manifold seeding).
    # One probe per iteration (the previous 24-round ternary search paid two
    # _point_box_signed evaluations per round for the same final bracket —
    # this kernel runs at full lane width and was ~30 ms/step at the
    # 4096-scene bench).  (0.618)^20 ~ 6e-5 matches the old bracket.
    gr = 0.6180339887498949
    lo, hi = 0.0, 1.0
    x1 = hi - gr * (hi - lo)
    x2 = lo + gr * (hi - lo)
    f1, _, _ = _point_box_signed(seg_point(x1), h)
    f2, _, _ = _point_box_signed(seg_point(x2), h)
    for _ in range(20):
        left = f1 < f2
        lo = jnp.where(left, lo, x1)
        hi = jnp.where(left, x2, hi)
        xp = jnp.where(left, hi - gr * (hi - lo), lo + gr * (hi - lo))
        fp, _, _ = _point_box_signed(seg_point(xp), h)
        x1, f1, x2, f2 = (
            jnp.where(left, xp, x2), jnp.where(left, fp, f2),
            jnp.where(left, x1, xp), jnp.where(left, f1, fp),
        )
    t_star = 0.5 * (lo + hi)

    # Candidate parameters: optimum + both (slab-clipped) endpoints.
    cands = jnp.stack([t_star, 0.0, 1.0])

    def eval_cand(t):
        pl = seg_point(t)
        d, n_l, surf_l = _point_box_signed(pl, h)
        return d - rad, n_l, surf_l, pl

    dists, normals_l, surfs_l, pts_l = jax.vmap(eval_cand)(cands)

    m = _empty_manifold()
    # Pick best (deepest) as primary; add endpoints as extra points if they are
    # nearly as deep (lying-on-face case), after deduplication.  All candidate
    # selection by one-hot ranks (per-lane gathers batch terribly on TPU).
    idx3 = jnp.arange(3)
    rank = jnp.sum(
        (dists[None, :] < dists[:, None])
        | ((dists[None, :] == dists[:, None]) & (idx3[None, :] < idx3[:, None])),
        axis=1,
    )  # rank[i] = position of candidate i in ascending order
    oh_rank = (rank[None, :] == idx3[:, None]).astype(dists.dtype)  # [slot, cand]

    # Unrolled 3x3 one-hot contractions: tiny `@` matmuls under the lane
    # vmap become micro batched dots on TPU (~28 ms/step at the 4096-scene
    # bench); explicit sums fuse into neighboring elementwise work.
    def pick3(rows, s):
        return (oh_rank[s, 0] * rows[0] + oh_rank[s, 1] * rows[1]
                + oh_rank[s, 2] * rows[2])

    n_prim_l = pick3(normals_l, 0)
    n = -quat.rotate(rB, n_prim_l)

    def mk_point(i):
        surf_w = quat.transform_point(pB, rB, surfs_l[i])
        p_w = quat.transform_point(pB, rB, pts_l[i])
        s_cap = p_w + n * rad
        return 0.5 * (s_cap + surf_w)

    pts_w = jax.vmap(mk_point)(idx3)
    pts_sorted = jnp.stack([pick3(pts_w, s) for s in range(3)])
    dists_sorted = jnp.stack([pick3(dists, s) for s in range(3)])
    ndots = jnp.stack([jnp.dot(normals_l[c], n_prim_l) for c in range(3)])
    nrm_dot = jnp.stack([pick3(ndots, s) for s in range(3)])
    fid_sorted = jnp.sum(oh_rank * idx3[None, :].astype(dists.dtype), axis=1)

    for k in range(3):
        same_n = nrm_dot[k] > 0.98
        dup = jnp.zeros((), bool)
        for prev in range(k):
            dup = dup | (jnp.linalg.norm(pts_sorted[k] - pts_sorted[prev]) < 1e-5)
        keep = same_n & ~dup
        m = m._replace(
            point=m.point.at[k].set(pts_sorted[k]),
            dist=m.dist.at[k].set(jnp.where(keep, dists_sorted[k], 1e10)),
            fid=m.fid.at[k].set(fid_sorted[k].astype(jnp.int32)),
            valid=m.valid.at[k].set(keep),
        )
    m = m._replace(normal=n)
    return m


# ---------------------------------------------------------------------------
# ball / capsule vs halfspace (analytic)
# ---------------------------------------------------------------------------


def ball_halfspace(pA, rA, prmA, pB, rB, prmB) -> Manifold:
    rad = prmA[0]
    n_w = quat.rotate(rB, prmB[0:3])
    n_w, _ = _safe_normalize(n_w)
    depth = jnp.dot(pA - pB, n_w) - rad
    surf = pA - n_w * rad
    proj = surf - n_w * depth
    return _one_point(-n_w, 0.5 * (surf + proj), depth)


def capsule_halfspace(pA, rA, prmA, pB, rB, prmB) -> Manifold:
    a, b, rad = _capsule_world_segment(pA, rA, prmA)
    n_w = quat.rotate(rB, prmB[0:3])
    n_w, _ = _safe_normalize(n_w)
    m = _empty_manifold()
    for k, e in enumerate((a, b)):
        depth = jnp.dot(e - pB, n_w) - rad
        surf = e - n_w * rad
        proj = surf - n_w * depth
        m = m._replace(
            point=m.point.at[k].set(0.5 * (surf + proj)),
            dist=m.dist.at[k].set(depth),
            fid=m.fid.at[k].set(k),
            valid=m.valid.at[k].set(True),
        )
    return m._replace(normal=-n_w)


# ---------------------------------------------------------------------------
# convex vs halfspace (generic, support-function based)
# ---------------------------------------------------------------------------


def convex_halfspace(pA, rA, stA, prmA, pB, rB, prmB, hullA=None) -> Manifold:
    """Any convex shape A vs halfspace B.

    Samples the support function of A along the plane normal perturbed towards
    4 tangent directions, producing a spread contact patch (1 point for a
    ball, 2 for a lying capsule, 4 for a resting box/cylinder).  Feature ids
    come from quantized local support offsets so they are stable.
    """
    from rapier_tpu.geometry import shapes as shp

    n_w = quat.rotate(rB, prmB[0:3])       # plane outward normal (world)
    n_w, _ = _safe_normalize(n_w)
    plane_p = pB

    # Tangent basis.
    t1 = jnp.cross(n_w, jnp.array([1.0, 0.0, 0.0]))
    t1_alt = jnp.cross(n_w, jnp.array([0.0, 1.0, 0.0]))
    t1 = jnp.where(jnp.linalg.norm(t1) < 1e-6, t1_alt, t1)
    t1, _ = _safe_normalize(t1)
    t2 = jnp.cross(n_w, t1)

    eps = 0.04  # perturbation angle (rad-ish): picks distinct patch corners
    dirs_w = jnp.stack([
        -n_w + eps * (t1 + t2),
        -n_w + eps * (t1 - t2),
        -n_w + eps * (-t1 + t2),
        -n_w + eps * (-t1 - t2),
    ])

    m = _empty_manifold()
    normal = -n_w  # from A towards the halfspace
    # Border radius for round shapes.
    is_round = (stA == ShapeType.ROUND_CUBOID) | (stA == ShapeType.ROUND_CYLINDER) | (
        stA == ShapeType.ROUND_CONE
    )
    border = jnp.where(
        stA == ShapeType.ROUND_CUBOID, prmA[3],
        jnp.where(is_round, prmA[2],
                  jnp.where(stA == ShapeType.CONVEX, prmA[1], 0.0)),
    )

    def support_w(d_w):
        d_l = quat.inv_rotate(rA, d_w)
        s_l = shp.support_point(stA, prmA, d_l, hullA)
        return quat.transform_point(pA, rA, s_l), s_l

    sw, sl = jax.vmap(support_w)(dirs_w)
    depth = jnp.sum((sw - plane_p) * n_w[None], axis=-1) - border  # signed dist to plane
    # Feature id: quantized local support point (stable across steps).
    qs = jnp.round(sl * 1024.0).astype(jnp.int32)
    fid = (qs[:, 0] * 73856093) ^ (qs[:, 1] * 19349663) ^ (qs[:, 2] * 83492791)
    fid = jnp.abs(fid) % 1000003

    for k in range(4):
        dup = jnp.zeros((), bool)
        for prev in range(k):
            dup = dup | (jnp.linalg.norm(sw[k] - sw[prev]) < 1e-6)
        keep = ~dup
        surf_a = sw[k] - n_w * border
        proj = surf_a - n_w * depth[k]
        m = m._replace(
            point=m.point.at[k].set(0.5 * (surf_a + proj)),
            dist=m.dist.at[k].set(jnp.where(keep, depth[k], 1e10)),
            fid=m.fid.at[k].set(fid[k]),
            valid=m.valid.at[k].set(keep),
        )
    return m._replace(normal=normal)
