"""Generic convex-convex contact kernel: GJK/EPA + support-patch manifold.

Covers every convex shape pair that lacks a specialized analytic kernel
(cylinder/cone vs anything, convex hulls) — the TPU-native replacement for
parry's GJK/EPA dispatch (reference `src/geometry/narrow_phase.rs:972-979`,
SURVEY §7 hard-part #4).  Strategy:

1. Exact contact normal + signed distance from masked fixed-iteration
   GJK (separated) / EPA (penetrating) in `geometry/gjk.py`.
2. Build the manifold by sampling perturbed support points on BOTH shapes
   around ±normal, keeping the flatter patch and measuring per-point depth
   against the other side's tangent plane; the deepest point's depth is
   clamped to the exact GJK/EPA distance.

`support_gap` keeps the cheap sampled-SAT separation estimate for the inner
loops of shape casts and CCD bisection (small to compile, conservative);
the contact path uses the exact kernel.

Feature ids quantize local support coordinates => stable across steps for
warmstart matching.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rapier_tpu.math import quat
from rapier_tpu.geometry import shapes as shp
from rapier_tpu.geometry.narrowphase import MAXP, Manifold, _empty_manifold
from rapier_tpu.types import ShapeType

# Shapes this kernel accepts.
SUPPORTED = (
    ShapeType.BALL, ShapeType.CUBOID, ShapeType.CAPSULE, ShapeType.SEGMENT,
    ShapeType.CYLINDER, ShapeType.CONE, ShapeType.ROUND_CUBOID,
    ShapeType.ROUND_CYLINDER, ShapeType.ROUND_CONE, ShapeType.CONVEX,
)


def _border_radius(st, prm):
    return jnp.where(
        st == ShapeType.ROUND_CUBOID, prm[3],
        jnp.where(
            (st == ShapeType.ROUND_CYLINDER) | (st == ShapeType.ROUND_CONE),
            prm[2],
            jnp.where(st == ShapeType.CONVEX, prm[1], 0.0),
        ),
    )


def support_gap(pA, rA, stA, prmA, pB, rB, stB, prmB,
                hullA=None, hullB=None):
    """Sampled-SAT separation estimate only: (gap, axis A->B).

    The cheap core of convex_convex, reused by shape casts and CCD where the
    manifold is not needed (keeps those bisection loops small to compile)."""
    bA = _border_radius(stA, prmA)
    bB = _border_radius(stB, prmB)

    def supp_A(d_w):
        s_l = shp.support_point(stA, prmA, quat.inv_rotate(rA, d_w), hullA)
        return quat.transform_point(pA, rA, s_l)

    def supp_B(d_w):
        s_l = shp.support_point(stB, prmB, quat.inv_rotate(rB, d_w), hullB)
        return quat.transform_point(pB, rB, s_l)

    mA = quat.to_matrix(rA)
    mB = quat.to_matrix(rB)
    center = pB - pA
    axes = [center]
    for i in range(3):
        axes.append(mA[:, i])
        axes.append(mB[:, i])
    for i in range(3):
        for k in range(3):
            axes.append(jnp.cross(mA[:, i], mB[:, k]))
    cand = jnp.stack(axes)                       # [16, 3]
    norms = jnp.linalg.norm(cand, axis=-1, keepdims=True)
    cand = cand / jnp.maximum(norms, 1e-9)
    degenerate = norms[:, 0] < 1e-6
    # Orient from A towards B.
    sgn = jnp.where(jnp.sum(cand * center[None], axis=-1) >= 0, 1.0, -1.0)
    cand = cand * sgn[:, None]

    def gap(a):
        return jnp.dot(a, supp_B(-a)) - jnp.dot(a, supp_A(a)) - bA - bB

    gaps = jax.vmap(gap)(cand)
    gaps = jnp.where(degenerate, -1e10, gaps)
    best = jnp.argmax(gaps)
    oh = (jnp.arange(cand.shape[0]) == best).astype(cand.dtype)
    return jnp.max(gaps), oh @ cand


def convex_convex(pA, rA, stA, prmA, pB, rB, stB, prmB,
                  hullA=None, hullB=None) -> Manifold:
    bA = _border_radius(stA, prmA)
    bB = _border_radius(stB, prmB)

    def supp_A(d_w):
        s_l = shp.support_point(stA, prmA, quat.inv_rotate(rA, d_w), hullA)
        return quat.transform_point(pA, rA, s_l), s_l

    def supp_B(d_w):
        s_l = shp.support_point(stB, prmB, quat.inv_rotate(rB, d_w), hullB)
        return quat.transform_point(pB, rB, s_l), s_l

    from rapier_tpu.geometry.gjk import contact_support_maps
    dist, n, _cpA, _cpB = contact_support_maps(
        pA, rA, stA, prmA, pB, rB, stB, prmB, hullA, hullB)

    # --- manifold: perturbed support patches on both sides ---
    t1 = jnp.cross(n, jnp.array([1.0, 0.0, 0.0]))
    t1_alt = jnp.cross(n, jnp.array([0.0, 1.0, 0.0]))
    t1 = jnp.where(jnp.linalg.norm(t1) < 1e-6, t1_alt, t1)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1), 1e-9)
    t2 = jnp.cross(n, t1)
    eps = 0.04
    tilts = jnp.stack([t1 + t2, t1 - t2, -t1 + t2, -t1 - t2])

    def sample(k):
        dA = n + eps * tilts[k]
        sa, la = supp_A(dA)
        sb, lb = supp_B(-dA)
        return sa + n * bA, sb - n * bB, la, lb

    sa4, sb4, la4, lb4 = jax.vmap(sample)(jnp.arange(4))

    # The SMALLER patch supplies the points: the contact region is bounded by
    # the smaller feature (box corners on a huge ground face, a cylinder rim
    # on a plane, ...).
    spread_a = jnp.sum(jnp.var(sa4, axis=0))
    spread_b = jnp.sum(jnp.var(sb4, axis=0))
    use_a = spread_a <= spread_b

    plane_b, _ = supp_B(-n)
    plane_b = plane_b - n * bB
    plane_a, _ = supp_A(n)
    plane_a = plane_a + n * bA

    pts = jnp.where(use_a, sa4, sb4)
    local = jnp.where(use_a, la4, lb4)
    # Depth along n: from the point to the other side's tangent plane.
    depth_a_side = jnp.sum((sa4 - plane_b[None]) * n[None], axis=-1)
    depth_b_side = jnp.sum((plane_a[None] - sb4) * n[None], axis=-1)
    depths = jnp.where(use_a, depth_a_side, depth_b_side)
    mids = pts - jnp.where(use_a, 0.5, -0.5) * depths[:, None] * n[None]

    qs = jnp.round(local * 1024.0).astype(jnp.int32)
    fid = (qs[:, 0] * 73856093) ^ (qs[:, 1] * 19349663) ^ (qs[:, 2] * 83492791)
    fid = jnp.abs(fid) % 1000003

    m = _empty_manifold()
    for k in range(4):
        dup = jnp.zeros((), bool)
        for prev in range(k):
            dup = dup | (jnp.linalg.norm(pts[k] - pts[prev]) < 1e-6)
        keep = ~dup & jnp.isfinite(depths[k])
        m = m._replace(
            point=m.point.at[k].set(mids[k]),
            dist=m.dist.at[k].set(jnp.where(keep, depths[k], 1e10)),
            fid=m.fid.at[k].set(fid[k]),
            valid=m.valid.at[k].set(keep),
        )
    # Clamp the deepest point's depth to the SAT gap (the plane-based
    # per-point depth can overestimate penetration on curved shapes).
    min_d = jnp.min(jnp.where(m.valid, m.dist, 1e10))
    corr = dist - min_d
    m = m._replace(dist=jnp.where(m.valid, m.dist + corr, m.dist), normal=n)
    return m
