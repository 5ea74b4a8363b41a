"""Scene queries: batched ray casts, point projection, intersection tests.

The TPU recast of the reference QueryPipeline
(src/pipeline/query_pipeline.rs:44-780): instead of BVH traversal, every query
evaluates all colliders in parallel (masked) and reduces — O(C) lanes of
cheap VPU work, ideal under vmap over many rays (the batched-RL usage).

Query filter flags mirror reference QueryFilterFlags (query_pipeline.rs:575).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from rapier_tpu.math import quat
from rapier_tpu.geometry.dispatch import collider_world_poses
from rapier_tpu.types import BodyType, ShapeType

# QueryFilterFlags
EXCLUDE_FIXED = 1 << 0
EXCLUDE_KINEMATIC = 1 << 1
EXCLUDE_DYNAMIC = 1 << 2
EXCLUDE_SENSORS = 1 << 3
EXCLUDE_SOLIDS = 1 << 4

_INF = 1e30


class RayHit(NamedTuple):
    hit: jax.Array       # bool
    toi: jax.Array       # distance along the (unit or not) ray direction
    collider: jax.Array  # int32 collider index (-1 when no hit)
    point: jax.Array     # [3]
    normal: jax.Array    # [3] outward surface normal at the hit


class PointProjection(NamedTuple):
    collider: jax.Array  # int32 (-1 if none)
    point: jax.Array     # [3] closest point on the collider
    distance: jax.Array  # signed (negative if inside and solid=True)
    is_inside: jax.Array # bool


def _filter_mask(colliders, body_type, flags: int, exclude_collider=-1,
                 exclude_body=-1, groups: int = 0xFFFF_FFFF):
    c = colliders
    n = c.parent.shape[0]
    ok = c.enabled
    parent = c.parent
    bt = jnp.where(parent >= 0, body_type[jnp.maximum(parent, 0)],
                   int(BodyType.FIXED))
    if flags & EXCLUDE_FIXED:
        ok = ok & ~((bt == BodyType.FIXED) | (parent < 0))
    if flags & EXCLUDE_KINEMATIC:
        ok = ok & ~(
            (bt == BodyType.KINEMATIC_POSITION_BASED)
            | (bt == BodyType.KINEMATIC_VELOCITY_BASED)
        )
    if flags & EXCLUDE_DYNAMIC:
        ok = ok & ~(bt == BodyType.DYNAMIC)
    if flags & EXCLUDE_SENSORS:
        ok = ok & ~c.sensor
    ok = ok & (jnp.arange(n) != exclude_collider)
    ok = ok & ~((parent == exclude_body) & (parent >= 0))
    gm, gf = jnp.uint32(groups) >> 16, jnp.uint32(groups) & 0xFFFF
    cm, cf = c.collision_groups >> 16, c.collision_groups & 0xFFFF
    ok = ok & ((gm & cf) != 0) & ((cm & gf) != 0)
    return ok


# ---------------------------------------------------------------------------
# per-shape ray kernels (local frame; ray already transformed)
# ---------------------------------------------------------------------------


def _ray_ball(o, d, r):
    b = jnp.dot(o, d)
    c = jnp.dot(o, o) - r * r
    disc = b * b - jnp.dot(d, d) * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    dd = jnp.maximum(jnp.dot(d, d), 1e-12)
    t0 = (-b - sq) / dd
    t1 = (-b + sq) / dd
    inside = c <= 0.0
    t = jnp.where(inside, jnp.maximum(t1, 0.0), t0)
    hit = (disc >= 0.0) & (t >= 0.0) & (inside | (t0 >= 0.0))
    p = o + d * t
    nrm = p / jnp.maximum(jnp.linalg.norm(p), 1e-12)
    return hit, t, nrm


def _ray_cuboid(o, d, h):
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12, jnp.where(d >= 0, 1e-12, -1e-12), d)
    t1 = (-h - o) * inv
    t2 = (h - o) * inv
    tmin_ax = jnp.minimum(t1, t2)
    tmax_ax = jnp.maximum(t1, t2)
    # Parallel ray outside the slab never hits.
    par_out = (jnp.abs(d) < 1e-12) & (jnp.abs(o) > h)
    tmin = jnp.max(tmin_ax)
    tmax = jnp.min(jnp.where(par_out, -_INF, tmax_ax))
    inside = jnp.all(jnp.abs(o) <= h)
    t = jnp.where(inside, jnp.maximum(tmax, 0.0), tmin)
    hit = (tmax >= jnp.maximum(tmin, 0.0)) & ~jnp.any(par_out) & (t >= 0.0)
    ax = jnp.argmax(tmin_ax)
    p = o + d * t
    oh_out = (jnp.arange(3) == ax).astype(p.dtype)
    n_out = oh_out * jnp.sign(jnp.sum(oh_out * p))
    oh_in = (jnp.arange(3) == jnp.argmin(jnp.where(par_out, _INF, tmax_ax))).astype(p.dtype)
    nrm = jnp.where(inside, oh_in * jnp.sign(p), n_out)
    return hit, t, nrm


def _ray_halfspace(o, d, n):
    denom = jnp.dot(d, n)
    dist = jnp.dot(o, n)
    t = -dist / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    hit = (dist >= 0.0) & (denom < 0.0) & (t >= 0.0)
    # Ray starting inside the halfspace hits immediately (solid semantics).
    hit = hit | (dist < 0.0)
    t = jnp.where(dist < 0.0, 0.0, t)
    return hit, t, n


def _ray_capsule(o, d, a, b, r):
    """Ray vs capsule: sample-free analytic-ish via segment closest approach.
    Cylinder part solved as quadratic in the frame of the axis; caps as
    spheres."""
    axis = b - a
    len_sq = jnp.maximum(jnp.dot(axis, axis), 1e-12)
    u = axis / jnp.sqrt(len_sq)
    oo = o - a
    # Project out axis component.
    d_p = d - u * jnp.dot(d, u)
    o_p = oo - u * jnp.dot(oo, u)
    A = jnp.dot(d_p, d_p)
    B = jnp.dot(o_p, d_p)
    C = jnp.dot(o_p, o_p) - r * r
    disc = B * B - A * C
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    tc = (-B - sq) / jnp.maximum(A, 1e-12)
    # Cylinder hit valid if within segment extent.
    s = jnp.dot(oo + d * tc, u)
    cyl_ok = (disc >= 0.0) & (A > 1e-12) & (tc >= 0.0) & (s >= 0.0) & (
        s <= jnp.sqrt(len_sq)
    )
    p_cyl = o + d * tc
    foot = a + u * s
    n_cyl = (p_cyl - foot) / jnp.maximum(r, 1e-12)

    ha, ta, na = _ray_ball(o - a, d, r)
    hb, tb, nb = _ray_ball(o - b, d, r)
    # Choose the smallest valid t (one-hot pick, no per-lane gather).
    ts = jnp.stack([
        jnp.where(cyl_ok, tc, _INF),
        jnp.where(ha, ta, _INF),
        jnp.where(hb, tb, _INF),
    ])
    k = jnp.argmin(ts)
    t = jnp.min(ts)
    oh_k = (jnp.arange(3) == k).astype(d.dtype)
    nrm = oh_k @ jnp.stack([n_cyl, na, nb])
    hit = t < _INF
    # Start inside: t=0.
    q, _ = _closest_point_segment(a, b, o)
    inside = jnp.linalg.norm(o - q) <= r
    t = jnp.where(inside, 0.0, t)
    hit = hit | inside
    return hit, t, nrm


def _closest_point_segment(a, b, p):
    ab = b - a
    t = jnp.clip(jnp.dot(p - a, ab) / jnp.maximum(jnp.dot(ab, ab), 1e-12), 0.0, 1.0)
    return a + ab * t, t


# ---------------------------------------------------------------------------
# public queries
# ---------------------------------------------------------------------------


def cast_ray(bodies, colliders, origin, direction, max_toi=_INF,
             flags: int = 0, exclude_collider: int = -1,
             exclude_body: int = -1, groups: int = 0xFFFF_FFFF) -> RayHit:
    """Closest-hit raycast against all colliders (QueryPipeline::cast_ray)."""
    w_pos, w_rot = collider_world_poses(bodies, colliders)
    ok = _filter_mask(colliders, bodies.body_type, flags,
                      exclude_collider, exclude_body, groups)

    def per_collider(cp, cr, st, prm, valid):
        o = quat.inv_rotate(cr, origin - cp)
        d = quat.inv_rotate(cr, direction)
        hit_b, t_b, n_b = _ray_ball(o, d, prm[0])
        hit_c, t_c, n_c = _ray_cuboid(o, d, prm[0:3])
        hit_h, t_h, n_h = _ray_halfspace(o, d, prm[0:3])
        hit_k, t_k, n_k = _ray_capsule(o, d, prm[0:3], prm[3:6], prm[6])

        is_ball = st == ShapeType.BALL
        is_cub = (st == ShapeType.CUBOID) | (st == ShapeType.ROUND_CUBOID)
        is_hs = st == ShapeType.HALFSPACE
        is_cap = st == ShapeType.CAPSULE
        hit = jnp.where(is_ball, hit_b,
              jnp.where(is_cub, hit_c,
              jnp.where(is_hs, hit_h,
              jnp.where(is_cap, hit_k, False))))
        t = jnp.where(is_ball, t_b,
            jnp.where(is_cub, t_c,
            jnp.where(is_hs, t_h,
            jnp.where(is_cap, t_k, _INF))))
        nrm = jnp.where(is_ball, n_b,
              jnp.where(is_cub, n_c,
              jnp.where(is_hs, n_h,
              jnp.where(is_cap, n_k, jnp.zeros(3)))))
        hit = hit & valid & (t <= max_toi) & (t >= 0.0)
        return jnp.where(hit, t, _INF), quat.rotate(cr, nrm)

    ts, normals = jax.vmap(per_collider)(
        w_pos, w_rot, colliders.shape_type, colliders.shape_params, ok
    )
    k = jnp.argmin(ts)
    t = ts[k]
    hit = t < _INF
    return RayHit(
        hit=hit,
        toi=jnp.where(hit, t, max_toi),
        collider=jnp.where(hit, k, -1).astype(jnp.int32),
        point=origin + direction * t,
        normal=jnp.where(hit, normals[k], jnp.zeros(3)),
    )


def intersect_ray(bodies, colliders, origin, direction, max_toi=_INF,
                  flags: int = 0, **kw):
    """All-hits raycast: returns (hit [C], toi [C], normal [C,3]) per collider
    (QueryPipeline::intersect_ray)."""
    w_pos, w_rot = collider_world_poses(bodies, colliders)
    ok = _filter_mask(colliders, bodies.body_type, flags, **kw)

    def per_collider(cp, cr, st, prm, valid):
        o = quat.inv_rotate(cr, origin - cp)
        d = quat.inv_rotate(cr, direction)
        hit_b, t_b, n_b = _ray_ball(o, d, prm[0])
        hit_c, t_c, n_c = _ray_cuboid(o, d, prm[0:3])
        hit_h, t_h, n_h = _ray_halfspace(o, d, prm[0:3])
        hit_k, t_k, n_k = _ray_capsule(o, d, prm[0:3], prm[3:6], prm[6])
        is_ball = st == ShapeType.BALL
        is_cub = (st == ShapeType.CUBOID) | (st == ShapeType.ROUND_CUBOID)
        is_hs = st == ShapeType.HALFSPACE
        is_cap = st == ShapeType.CAPSULE
        hit = jnp.where(is_ball, hit_b,
              jnp.where(is_cub, hit_c,
              jnp.where(is_hs, hit_h,
              jnp.where(is_cap, hit_k, False))))
        t = jnp.where(is_ball, t_b,
            jnp.where(is_cub, t_c,
            jnp.where(is_hs, t_h,
            jnp.where(is_cap, t_k, _INF))))
        nrm = jnp.where(is_ball, n_b,
              jnp.where(is_cub, n_c,
              jnp.where(is_hs, n_h,
              jnp.where(is_cap, n_k, jnp.zeros(3)))))
        hit = hit & valid & (t <= max_toi) & (t >= 0.0)
        return hit, jnp.where(hit, t, _INF), quat.rotate(cr, nrm)

    return jax.vmap(per_collider)(
        w_pos, w_rot, colliders.shape_type, colliders.shape_params, ok
    )


def project_point(bodies, colliders, point, solid: bool = True,
                  flags: int = 0, **kw) -> PointProjection:
    """Closest point on any collider (QueryPipeline::project_point)."""
    w_pos, w_rot = collider_world_poses(bodies, colliders)
    ok = _filter_mask(colliders, bodies.body_type, flags, **kw)

    def per_collider(cp, cr, st, prm, valid):
        p = quat.inv_rotate(cr, point - cp)
        # Ball.
        dist_c = jnp.linalg.norm(p)
        n = p / jnp.maximum(dist_c, 1e-12)
        proj_ball = n * prm[0]
        d_ball = dist_c - prm[0]
        # Cuboid.
        q = jnp.clip(p, -prm[0:3], prm[0:3])
        out = p - q
        d_out = jnp.linalg.norm(out)
        face_d = prm[0:3] - jnp.abs(p)
        ax = jnp.argmin(face_d)
        inside_c = d_out < 1e-12
        oh3 = (jnp.arange(3) == ax).astype(p.dtype)
        sgn3 = jnp.where(jnp.sum(oh3 * p) >= 0, 1.0, -1.0)
        surf_in = p * (1.0 - oh3) + oh3 * sgn3 * prm[0:3]
        proj_cub = jnp.where(inside_c, surf_in, q)
        d_cub = jnp.where(inside_c, -jnp.min(face_d), d_out)
        # Capsule.
        cq, _ = _closest_point_segment(prm[0:3], prm[3:6], p)
        dd = p - cq
        dn = jnp.linalg.norm(dd)
        proj_cap = cq + dd / jnp.maximum(dn, 1e-12) * prm[6]
        d_cap = dn - prm[6]
        # Halfspace.
        hs_n = prm[0:3]
        d_hs = jnp.dot(p, hs_n)
        proj_hs = p - hs_n * d_hs

        is_ball = st == ShapeType.BALL
        is_cub = st == ShapeType.CUBOID
        is_cap = st == ShapeType.CAPSULE
        is_hs = st == ShapeType.HALFSPACE
        proj = jnp.where(is_ball, proj_ball,
               jnp.where(is_cub, proj_cub,
               jnp.where(is_cap, proj_cap,
               jnp.where(is_hs, proj_hs, jnp.zeros(3)))))
        d = jnp.where(is_ball, d_ball,
            jnp.where(is_cub, d_cub,
            jnp.where(is_cap, d_cap,
            jnp.where(is_hs, d_hs, _INF))))
        if solid:
            # Inside a solid shape projects to the point itself, distance<=0.
            proj = jnp.where(d < 0.0, p, proj)
        d_rank = jnp.where(solid, jnp.maximum(d, 0.0), jnp.abs(d))
        d_rank = jnp.where(valid, d_rank, _INF)
        return quat.transform_point(cp, cr, proj), d, d_rank

    projs, dists, ranks = jax.vmap(per_collider)(
        w_pos, w_rot, colliders.shape_type, colliders.shape_params, ok
    )
    k = jnp.argmin(ranks)
    found = ranks[k] < _INF
    return PointProjection(
        collider=jnp.where(found, k, -1).astype(jnp.int32),
        point=projs[k],
        distance=dists[k],
        is_inside=dists[k] < 0.0,
    )


def intersections_with_point(bodies, colliders, point, flags: int = 0, **kw):
    """Boolean mask of colliders containing the point
    (QueryPipeline::intersect_point)."""
    w_pos, w_rot = collider_world_poses(bodies, colliders)
    ok = _filter_mask(colliders, bodies.body_type, flags, **kw)

    def per_collider(cp, cr, st, prm, valid):
        p = quat.inv_rotate(cr, point - cp)
        in_ball = jnp.linalg.norm(p) <= prm[0]
        in_cub = jnp.all(jnp.abs(p) <= prm[0:3])
        cq, _ = _closest_point_segment(prm[0:3], prm[3:6], p)
        in_cap = jnp.linalg.norm(p - cq) <= prm[6]
        in_hs = jnp.dot(p, prm[0:3]) <= 0.0
        inside = jnp.where(st == ShapeType.BALL, in_ball,
                 jnp.where(st == ShapeType.CUBOID, in_cub,
                 jnp.where(st == ShapeType.CAPSULE, in_cap,
                 jnp.where(st == ShapeType.HALFSPACE, in_hs, False))))
        return inside & valid

    return jax.vmap(per_collider)(
        w_pos, w_rot, colliders.shape_type, colliders.shape_params, ok
    )


class ShapeCastHit(NamedTuple):
    hit: jax.Array       # bool
    toi: jax.Array       # fraction [0, max_toi] along `direction`
    collider: jax.Array  # int32 (-1 when none)
    normal: jax.Array    # [3] contact normal (from obstacle towards shape)


def _support_gap_to(st, prm, pos, rot, colliders, w_pos, w_rot, cidx):
    """Cheap signed separation from a convex shape to one collider (sampled
    SAT, no manifold)."""
    from rapier_tpu.geometry.narrowphase_convex import support_gap
    from rapier_tpu.geometry import shapes as shp
    from rapier_tpu.math import quat as _q

    tB = colliders.shape_type[cidx]
    prmB = colliders.shape_params[cidx]
    d_cc, n_cc = support_gap(pos, rot, st, prm, w_pos[cidx], w_rot[cidx], tB, prmB)
    # Halfspace: exact plane distance (support_gap doesn't cover it).
    n_plane = _q.rotate(w_rot[cidx], prmB[0:3])
    s_l = shp.support_point(st, prm, _q.inv_rotate(rot, -n_plane))
    s_w = _q.transform_point(pos, rot, s_l)
    d_hs = jnp.dot(n_plane, s_w - w_pos[cidx])
    is_hs = tB == ShapeType.HALFSPACE
    return jnp.where(is_hs, d_hs, d_cc), jnp.where(is_hs, -n_plane, n_cc)


def cast_shape(bodies, colliders, shape_type, shape_params, pos, rot,
               direction, max_toi, flags: int = 0, exclude_collider: int = -1,
               exclude_body: int = -1, groups: int = 0xFFFF_FFFF,
               iters: int = 12) -> ShapeCastHit:
    """Sweep a convex shape along `direction` (QueryPipeline::cast_shape):
    per-collider bisection on the support-based separation."""
    # State leaves may be host numpy (fresh build): tracer indexing needs
    # device arrays.
    bodies = jax.tree.map(jnp.asarray, bodies)
    colliders = jax.tree.map(jnp.asarray, colliders)
    w_pos, w_rot = collider_world_poses(bodies, colliders)
    ok = _filter_mask(colliders, bodies.body_type, flags,
                      exclude_collider, exclude_body, groups)
    c = colliders.parent.shape[0]
    st = jnp.asarray(shape_type, jnp.int32)

    def per_collider(cidx, valid):
        def dist_at(t):
            return _support_gap_to(
                st, shape_params, pos + direction * t, rot,
                colliders, w_pos, w_rot, cidx,
            )

        # Coarse scan first: a long sweep can enter AND exit the obstacle, so
        # endpoint signs alone miss hits.  Find the first negative sample,
        # then bisect inside that bracket.
        n_coarse = 8
        m = jnp.asarray(max_toi, jnp.float32)
        ts = jnp.arange(1, n_coarse + 1) / n_coarse * m
        ds = jnp.stack([dist_at(t)[0] for t in list(ts)])
        d0, _ = dist_at(0.0)
        neg = ds <= 0.0
        any_neg = jnp.any(neg)
        first = jnp.argmax(neg)          # index of first penetrating sample
        seg = m / n_coarse
        lo0 = jnp.maximum(first.astype(jnp.float32) * seg, 0.0)
        hi0 = (first + 1).astype(jnp.float32) * seg

        start_touching = d0 <= 0.0
        lo, hi = lo0, hi0
        for _ in range(iters):
            mid = 0.5 * (lo + hi)
            dm, _ = dist_at(mid)
            lo = jnp.where(dm > 0.0, mid, lo)
            hi = jnp.where(dm > 0.0, hi, mid)
        toi = jnp.where(start_touching, 0.0, lo)
        _, n = dist_at(toi)
        hit = valid & (any_neg | start_touching)
        return jnp.where(hit, toi, _INF), -n  # normal towards the shape

    tois, normals = jax.vmap(per_collider)(jnp.arange(c), ok)
    k = jnp.argmin(tois)
    t = tois[k]
    hit = t < _INF
    return ShapeCastHit(
        hit=hit,
        toi=jnp.where(hit, t, jnp.asarray(max_toi, jnp.float32)),
        collider=jnp.where(hit, k, -1).astype(jnp.int32),
        normal=jnp.where(hit, normals[k], jnp.zeros(3)),
    )


def intersect_shape(bodies, colliders, shape_type, shape_params, pos, rot,
                    flags: int = 0, exclude_collider: int = -1,
                    exclude_body: int = -1, groups: int = 0xFFFF_FFFF):
    """Colliders intersecting a convex shape placed at (pos, rot)
    (QueryPipeline::intersect_shape, query_pipeline.rs:537).

    Returns a [C] bool mask (the TPU recast of the callback iteration)."""
    # State leaves may be host numpy (fresh build): tracer indexing needs
    # device arrays.
    bodies = jax.tree.map(jnp.asarray, bodies)
    colliders = jax.tree.map(jnp.asarray, colliders)
    w_pos, w_rot = collider_world_poses(bodies, colliders)
    ok = _filter_mask(colliders, bodies.body_type, flags,
                      exclude_collider, exclude_body, groups)
    c = colliders.parent.shape[0]
    st = jnp.asarray(shape_type, jnp.int32)

    def per_collider(cidx, valid):
        gap, _ = _support_gap_to(
            st, shape_params, pos, rot, colliders, w_pos, w_rot, cidx
        )
        return valid & (gap <= 0.0)

    return jax.vmap(per_collider)(jnp.arange(c), ok)


def intersect_aabb_conservative(bodies, colliders, aabb_min, aabb_max,
                                flags: int = 0, exclude_collider: int = -1,
                                exclude_body: int = -1,
                                groups: int = 0xFFFF_FFFF):
    """Colliders whose (skin-inflated) AABB intersects the query AABB
    (QueryPipeline::intersect_aabb_conservative, query_pipeline.rs —
    conservative: may include non-touching colliders, never misses one).

    Returns a [C] bool mask."""
    from rapier_tpu.geometry import shapes as _shapes

    bodies = jax.tree.map(jnp.asarray, bodies)
    colliders = jax.tree.map(jnp.asarray, colliders)
    w_pos, w_rot = collider_world_poses(bodies, colliders)
    mins, maxs = _shapes.compute_aabbs(
        colliders.shape_type, colliders.shape_params, w_pos, w_rot)
    skin = colliders.contact_skin[:, None]
    mins, maxs = mins - skin, maxs + skin
    lo = jnp.asarray(aabb_min, mins.dtype)
    hi = jnp.asarray(aabb_max, mins.dtype)
    ok = _filter_mask(colliders, bodies.body_type, flags,
                      exclude_collider, exclude_body, groups)
    hit = jnp.all(mins <= hi[None], axis=-1) & jnp.all(maxs >= lo[None], axis=-1)
    return ok & hit


def cast_shape_nonlinear(bodies, colliders, shape_type, shape_params, pos,
                         rot, linvel, angvel, max_toi, flags: int = 0,
                         exclude_collider: int = -1, exclude_body: int = -1,
                         groups: int = 0xFFFF_FFFF,
                         iters: int = 12) -> ShapeCastHit:
    """Sweep a convex shape along a rigid MOTION (translation + rotation):
    QueryPipeline::cast_shape_nonlinear (query_pipeline.rs:510) /
    parry NonlinearRigidMotion.  Same coarse-scan + bisection scheme as
    cast_shape, with the pose interpolated as
    pos(t) = pos + linvel*t, rot(t) = exp(angvel*t) * rot."""
    # State leaves may be host numpy (fresh build): tracer indexing needs
    # device arrays.
    bodies = jax.tree.map(jnp.asarray, bodies)
    colliders = jax.tree.map(jnp.asarray, colliders)
    from rapier_tpu.math import quat as _q

    w_pos, w_rot = collider_world_poses(bodies, colliders)
    ok = _filter_mask(colliders, bodies.body_type, flags,
                      exclude_collider, exclude_body, groups)
    c = colliders.parent.shape[0]
    st = jnp.asarray(shape_type, jnp.int32)
    linvel = jnp.asarray(linvel, jnp.float32)
    angvel = jnp.asarray(angvel, jnp.float32)

    def pose_at(t):
        p = pos + linvel * t
        r = _q.normalize(_q.mul(_q.from_scaled_axis(angvel * t), rot))
        return p, r

    def per_collider(cidx, valid):
        def dist_at(t):
            p, r = pose_at(t)
            return _support_gap_to(
                st, shape_params, p, r, colliders, w_pos, w_rot, cidx
            )

        n_coarse = 8
        m = jnp.asarray(max_toi, jnp.float32)
        ts = jnp.arange(1, n_coarse + 1) / n_coarse * m
        ds = jnp.stack([dist_at(t)[0] for t in list(ts)])
        d0, _ = dist_at(0.0)
        neg = ds <= 0.0
        any_neg = jnp.any(neg)
        first = jnp.argmax(neg)
        seg = m / n_coarse
        lo = jnp.maximum(first.astype(jnp.float32) * seg, 0.0)
        hi = (first + 1).astype(jnp.float32) * seg
        start_touching = d0 <= 0.0
        for _ in range(iters):
            mid = 0.5 * (lo + hi)
            dm, _ = dist_at(mid)
            lo = jnp.where(dm > 0.0, mid, lo)
            hi = jnp.where(dm > 0.0, hi, mid)
        toi = jnp.where(start_touching, 0.0, lo)
        _, n = dist_at(toi)
        hit = valid & (any_neg | start_touching)
        return jnp.where(hit, toi, _INF), -n

    tois, normals = jax.vmap(per_collider)(jnp.arange(c), ok)
    k = jnp.argmin(tois)
    t = tois[k]
    hit = t < _INF
    return ShapeCastHit(
        hit=hit,
        toi=jnp.where(hit, t, jnp.asarray(max_toi, jnp.float32)),
        collider=jnp.where(hit, k, -1).astype(jnp.int32),
        normal=jnp.where(hit, normals[k], jnp.zeros(3)),
    )
