"""Cuboid-cuboid contact manifold via SAT + reference-face clipping.

The TPU-native equivalent of parry's box-box SAT specialization used by the
reference narrow phase (src/geometry/narrow_phase.rs:972).  Single-pair,
branch-free (everything computed, selected with `where`), designed for `vmap`
over pair lanes.  Produces up to 4 contact points with stable feature ids
(reduction philosophy mirrors src/geometry/manifold_reduction.rs:5-80:
deepest -> farthest -> two perpendicular extremes).

Perf notes (this kernel dominates box-heavy scenes — pyramids, s2d, the
mixed-primitives bench):
- The edge-axis SAT is a closed-form [3, 3] matrix expression (rolled-index
  products), not an unrolled 9-iteration loop of masked updates.
- Only the SELECTED reference face builds a manifold (the old path computed
  both ref=A and ref=B and discarded one — 2x the clip cost).
- The quad∩rect clip is ORDER-FREE: Liang-Barsky entry/exit points per quad
  edge plus rect corners inside the quad enumerate every vertex of the
  intersection polygon as a masked candidate list — no Sutherland-Hodgman
  compaction (whose per-plane 8x8 selection matmuls were the hottest ops in
  the whole narrow phase).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rapier_tpu.math import quat
from rapier_tpu.math.quat import cross_cl, dot_cl
from rapier_tpu.geometry.narrowphase import (
    MAXP,
    Manifold,
    _closest_segment_segment,
    _empty_manifold,
)

# Face contacts are strongly preferred: at near-tie separations (resting
# stacks) the edge/face and refA/refB choices must not flip-flop frame to
# frame, or warmstart matching breaks and stacks jitter awake.  Absolute
# hysteresis margins scaled by the smaller box extent.
_EDGE_BIAS_ABS = 1.0e-2
_REF_FACE_BIAS_ABS = 2.0e-3

_BIG = 1.0e10


def _face_candidates(verts_uvd, hu, hv):
    """Vertices of (convex quad) ∩ (rectangle [-hu,hu]x[-hv,hv]) as a masked
    candidate list [12, 3] (u, v, depth) + [12] validity — order-free.

    The intersection polygon's vertices are exactly: quad-edge/rect boundary
    crossings and quad verts inside the rect (Liang-Barsky entry/exit points
    of each quad edge, 2x4) ∪ rect corners inside the quad (4)."""
    v0 = verts_uvd                       # [4, 3]
    v1 = jnp.roll(verts_uvd, -1, axis=0)
    d = v1 - v0

    def axis_window(p0, dp, h):
        """t-window of |p0 + t*dp| <= h (unclamped; empty = lo > hi)."""
        tiny = jnp.abs(dp) < 1e-12
        safe = jnp.where(tiny, 1.0, dp)
        ta = (-h - p0) / safe
        tb = (h - p0) / safe
        lo = jnp.minimum(ta, tb)
        hi = jnp.maximum(ta, tb)
        inside = jnp.abs(p0) <= h
        lo = jnp.where(tiny, jnp.where(inside, -_BIG, _BIG), lo)
        hi = jnp.where(tiny, jnp.where(inside, _BIG, -_BIG), hi)
        return lo, hi

    lo_u, hi_u = axis_window(v0[:, 0], d[:, 0], hu)
    lo_v, hi_v = axis_window(v0[:, 1], d[:, 1], hv)
    t0 = jnp.maximum(jnp.maximum(lo_u, lo_v), 0.0)
    t1 = jnp.minimum(jnp.minimum(hi_u, hi_v), 1.0)
    hits = t0 <= t1                       # [4] segment meets the rect
    pa = v0 + d * t0[:, None]             # entry points
    pb = v0 + d * t1[:, None]             # exit points

    # Rect corners inside the quad: consistent cross-product signs against
    # every quad edge (either winding).
    corners = jnp.array([[1.0, 1.0], [-1.0, 1.0], [-1.0, -1.0], [1.0, -1.0]])
    corners = corners * jnp.stack([hu, hv])[None, :]
    rel = corners[None, :, :] - v0[:, None, :2]            # [edge, corner, 2]
    cross = d[:, None, 0] * rel[:, :, 1] - d[:, None, 1] * rel[:, :, 0]
    inside = jnp.all(cross >= -1e-9, axis=0) | jnp.all(cross <= 1e-9, axis=0)

    # Depth is affine over the face: gradient from two quad edge vectors.
    e0, e1 = d[0], -d[3]                  # both emanate from v0[0]'s plane
    det = e0[0] * e1[1] - e0[1] * e1[0]
    safe_det = jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
    gu = (e0[2] * e1[1] - e1[2] * e0[1]) / safe_det
    gv = (e1[2] * e0[0] - e0[2] * e1[0]) / safe_det
    c_rel = corners - v0[0, :2][None, :]
    c_depth = v0[0, 2] + c_rel[:, 0] * gu + c_rel[:, 1] * gv
    c_uvd = jnp.concatenate([corners, c_depth[:, None]], axis=1)

    pts = jnp.concatenate([pa, pb, c_uvd], axis=0)         # [12, 3]
    valid = jnp.concatenate([hits, hits, inside], axis=0)  # [12]
    return pts, valid


def _reduce_candidates(pts_uvd, valid):
    """Reduce masked candidates to <= 4: deepest, farthest from it, then the
    two extreme points perpendicular to that base line (the reference's naive
    reduction, manifold_reduction.rs:5-80).  Duplicate POSITIONS (not just
    duplicate picks) are masked so coincident entry/exit candidates collapse."""
    n = pts_uvd.shape[0]
    k = jnp.arange(n)

    # Collapse near-duplicate candidates first (keep the first of each group):
    # entry==exit points and corner/crossing coincidences are common.
    d2 = jnp.sum(
        (pts_uvd[:, None, :2] - pts_uvd[None, :, :2]) ** 2, axis=-1
    )
    dup = (d2 < 1e-10) & valid[None, :] & (k[None, :] < k[:, None])
    valid = valid & ~jnp.any(dup, axis=1)

    def pick(i):
        oh = (k == i).astype(pts_uvd.dtype)
        return oh @ pts_uvd, (oh @ valid.astype(pts_uvd.dtype)) > 0

    depth = jnp.where(valid, pts_uvd[:, 2], _BIG)
    i0 = jnp.argmin(depth)
    r0, v0 = pick(i0)
    p0 = r0[:2]

    d_from0 = jnp.where(valid, jnp.sum((pts_uvd[:, :2] - p0) ** 2, axis=-1), -_BIG)
    i1 = jnp.argmax(d_from0)
    r1, v1 = pick(i1)
    p1 = r1[:2]

    base = p1 - p0
    perp = jnp.stack([-base[1], base[0]])
    side = (pts_uvd[:, 0] - p0[0]) * perp[0] + (pts_uvd[:, 1] - p0[1]) * perp[1]
    i2 = jnp.argmax(jnp.where(valid, side, -_BIG))
    i3 = jnp.argmin(jnp.where(valid, side, _BIG))
    r2, v2 = pick(i2)
    r3, v3 = pick(i3)

    sel = jnp.stack([i0, i1, i2, i3])
    out_pts = jnp.stack([r0, r1, r2, r3])
    out_valid = jnp.stack([v0, v1, v2, v3])
    keep = jnp.ones((MAXP,), bool)
    for a in range(MAXP):
        for b in range(a):
            keep = keep.at[a].set(keep[a] & (sel[a] != sel[b]))
        keep = keep.at[a].set(keep[a] & out_valid[a])
    return out_pts, keep


# ---------------------------------------------------------------------------
# Lane-last (component-leading) kernel — the dispatch path.
#
# The per-lane kernel below, vmapped over [pairs] then [scenes], materializes
# [B, P, 3, 3] / [B, P, 12, 12] intermediates whose trailing dims TPU
# tile-pads to (8, 128) — measured ~36 ms of a 106 ms step at 512 scenes.
# This variant keeps the LANE axis last everywhere ([3, P] vectors,
# [3, 3, P] matrices, [12, P] candidate rows) so every intermediate is
# tile-friendly.  Semantics identical to `cuboid_cuboid` (tested).
# ---------------------------------------------------------------------------


def _closest_segment_segment_cl(p1, q1, p2, q2):
    """_closest_segment_segment for [3, P] endpoints (Ericson 5.1.9)."""
    d1 = q1 - p1
    d2 = q2 - p2
    r = p1 - p2
    a = dot_cl(d1, d1)
    e = dot_cl(d2, d2)
    f = dot_cl(d2, r)
    c = dot_cl(d1, r)
    b = dot_cl(d1, d2)
    denom = a * e - b * b
    s = jnp.where(
        denom > 1e-12,
        jnp.clip((b * f - c * e) / jnp.maximum(denom, 1e-12), 0.0, 1.0), 0.0)
    t = (b * s + f) / jnp.maximum(e, 1e-12)
    t_cl = jnp.clip(t, 0.0, 1.0)
    s = jnp.where(
        t != t_cl,
        jnp.clip((b * t_cl - c) / jnp.maximum(a, 1e-12), 0.0, 1.0), s)
    s = jnp.where(a <= 1e-12, 0.0, s)
    t_cl = jnp.where(e <= 1e-12, 0.0, t_cl)
    c1 = p1 + d1 * s[None]
    c2 = p2 + d2 * t_cl[None]
    return s, t_cl, c1, c2


# ---------------------------------------------------------------------------
# Unrolled tiny-contraction helpers.  jnp.einsum with a 3-wide contraction
# lowers to micro batched matmuls on TPU (measured ~16 ms/step EACH at the
# 4096-scene bench for the [3,3,P] forms); unrolled multiply-adds fuse into
# neighboring elementwise work instead.
# ---------------------------------------------------------------------------


def _m3v(m, v):
    """m [3, 3, P] @ v [3, P] -> [3, P]."""
    return jnp.stack([
        m[0, 0] * v[0] + m[0, 1] * v[1] + m[0, 2] * v[2],
        m[1, 0] * v[0] + m[1, 1] * v[1] + m[1, 2] * v[2],
        m[2, 0] * v[0] + m[2, 1] * v[1] + m[2, 2] * v[2],
    ])


def _m3tv(m, v):
    """m^T [3, 3, P] @ v [3, P] -> [3, P]."""
    return jnp.stack([
        m[0, 0] * v[0] + m[1, 0] * v[1] + m[2, 0] * v[2],
        m[0, 1] * v[0] + m[1, 1] * v[1] + m[2, 1] * v[2],
        m[0, 2] * v[0] + m[1, 2] * v[1] + m[2, 2] * v[2],
    ])


def _m3t_m3(a, b):
    """a^T b for a, b [3, 3, P] -> [3, 3, P] (R = A^T B)."""
    return jnp.stack([
        jnp.stack([
            a[0, i] * b[0, j] + a[1, i] * b[1, j] + a[2, i] * b[2, j]
            for j in range(3)
        ])
        for i in range(3)
    ])


def _m3_corners(m, cv):
    """m [3, 3, P] applied to each corner of cv [4, 3, P] -> [4, 3, P]."""
    return jnp.stack([_m3v(m, cv[c]) for c in range(4)])


def _corners_dot(cv, w):
    """Per-corner dot: cv [4, 3, P] . w [3, P] -> [4, P]."""
    return (
        cv[:, 0] * w[0][None] + cv[:, 1] * w[1][None] + cv[:, 2] * w[2][None]
    )


def _face_candidates_cl(verts_uvd, hu, hv):
    """_face_candidates, lane-last: verts_uvd [4, 3, P], hu/hv [P] ->
    (pts [12, 3, P], valid [12, P])."""
    v0 = verts_uvd                                  # [4, 3, P]
    v1 = jnp.roll(verts_uvd, -1, axis=0)
    d = v1 - v0

    def axis_window(p0, dp, h):
        # p0, dp: [4, P]; h: [P] -> windows [4, P]
        tiny = jnp.abs(dp) < 1e-12
        safe = jnp.where(tiny, 1.0, dp)
        ta = (-h[None] - p0) / safe
        tb = (h[None] - p0) / safe
        lo = jnp.minimum(ta, tb)
        hi = jnp.maximum(ta, tb)
        inside = jnp.abs(p0) <= h[None]
        lo = jnp.where(tiny, jnp.where(inside, -_BIG, _BIG), lo)
        hi = jnp.where(tiny, jnp.where(inside, _BIG, -_BIG), hi)
        return lo, hi

    lo_u, hi_u = axis_window(v0[:, 0], d[:, 0], hu)
    lo_v, hi_v = axis_window(v0[:, 1], d[:, 1], hv)
    t0 = jnp.maximum(jnp.maximum(lo_u, lo_v), 0.0)   # [4, P]
    t1 = jnp.minimum(jnp.minimum(hi_u, hi_v), 1.0)
    hits = t0 <= t1
    pa = v0 + d * t0[:, None, :]                     # [4, 3, P]
    pb = v0 + d * t1[:, None, :]

    # Rect corners inside the quad.
    csign = jnp.array([[1.0, 1.0], [-1.0, 1.0], [-1.0, -1.0], [1.0, -1.0]])
    # corners[c, 0] = csign[c,0]*hu, corners[c, 1] = csign[c,1]*hv: [4c, 2, P]
    corners = jnp.stack([
        csign[:, 0][:, None] * hu[None, :],
        csign[:, 1][:, None] * hv[None, :],
    ], axis=1)
    # rel[e, c, xy, P] = corners[c, xy] - v0[e, xy]
    rel = corners[None, :, :, :] - v0[:, None, :2, :]
    cross = d[:, None, 0, :] * rel[:, :, 1, :] - d[:, None, 1, :] * rel[:, :, 0, :]
    inside = jnp.all(cross >= -1e-9, axis=0) | jnp.all(cross <= 1e-9, axis=0)

    # Affine depth over the face from two edge vectors at vertex 0.
    e0, e1 = d[0], -d[3]                             # [3, P]
    det = e0[0] * e1[1] - e0[1] * e1[0]
    safe_det = jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
    gu = (e0[2] * e1[1] - e1[2] * e0[1]) / safe_det   # [P]
    gv = (e1[2] * e0[0] - e0[2] * e1[0]) / safe_det
    c_rel_u = corners[:, 0, :] - v0[0, 0, :][None]    # [4, P]
    c_rel_v = corners[:, 1, :] - v0[0, 1, :][None]
    c_depth = v0[0, 2, :][None] + c_rel_u * gu[None] + c_rel_v * gv[None]
    c_uvd = jnp.concatenate(
        [corners, c_depth[:, None, :]], axis=1)       # [4, 3, P]

    pts = jnp.concatenate([pa, pb, c_uvd], axis=0)    # [12, 3, P]
    valid = jnp.concatenate([hits, hits, inside], axis=0)  # [12, P]
    return pts, valid


def _reduce_candidates_cl(pts_uvd, valid):
    """_reduce_candidates, lane-last: pts_uvd [12, 3, P], valid [12, P] ->
    (pts [4, 3, P], keep [4, P])."""
    n = pts_uvd.shape[0]
    p = pts_uvd.shape[-1]
    k = jnp.arange(n)

    du = pts_uvd[:, None, 0, :] - pts_uvd[None, :, 0, :]  # [12, 12, P]
    dv = pts_uvd[:, None, 1, :] - pts_uvd[None, :, 1, :]
    d2 = du * du + dv * dv
    dup = (
        (d2 < 1e-10) & valid[None, :, :]
        & (k[None, :] < k[:, None])[:, :, None]
    )
    valid = valid & ~jnp.any(dup, axis=1)

    iota = jnp.arange(n)[:, None]                     # [12, 1]

    def pick(i):
        # i: [P] candidate index per lane -> (point [3, P], valid [P]).
        oh = (iota == i[None, :]).astype(pts_uvd.dtype)         # [12, P]
        pt = jnp.sum(oh[:, None, :] * pts_uvd, axis=0)          # [3, P]
        ok = jnp.sum(oh * valid.astype(pts_uvd.dtype), axis=0) > 0
        return pt, ok

    depth = jnp.where(valid, pts_uvd[:, 2, :], _BIG)
    i0 = jnp.argmin(depth, axis=0)
    r0, v0 = pick(i0)
    p0u, p0v = r0[0], r0[1]

    dd = (pts_uvd[:, 0, :] - p0u[None]) ** 2 + (pts_uvd[:, 1, :] - p0v[None]) ** 2
    i1 = jnp.argmax(jnp.where(valid, dd, -_BIG), axis=0)
    r1, v1 = pick(i1)

    base_u = r1[0] - p0u
    base_v = r1[1] - p0v
    side = (pts_uvd[:, 0, :] - p0u[None]) * (-base_v[None]) \
        + (pts_uvd[:, 1, :] - p0v[None]) * base_u[None]
    i2 = jnp.argmax(jnp.where(valid, side, -_BIG), axis=0)
    i3 = jnp.argmin(jnp.where(valid, side, _BIG), axis=0)
    r2, v2 = pick(i2)
    r3, v3 = pick(i3)

    sel = jnp.stack([i0, i1, i2, i3])                 # [4, P]
    out_pts = jnp.stack([r0, r1, r2, r3])             # [4, 3, P]
    out_valid = jnp.stack([v0, v1, v2, v3])           # [4, P]
    keep_rows = []
    for a in range(MAXP):
        ka = out_valid[a]
        for b in range(a):
            ka = ka & (sel[a] != sel[b])
        keep_rows.append(ka)
    return out_pts, jnp.stack(keep_rows)


def cuboid_cuboid_cl(pA, rA, prmA, pB, rB, prmB) -> Manifold:
    """Lane-last cuboid-cuboid SAT (see module docstring).  Inputs [d, P]:
    pA/pB [3, P], rA/rB [4, P], prmA/prmB [12, P].  Outputs a Manifold with
    lane-last fields (the shape the dispatcher's merge expects)."""
    P = pA.shape[-1]
    hA = prmA[0:3]                                   # [3, P]
    hB = prmB[0:3]
    mA = quat.to_matrix_cl(rA)                       # [3, 3, P]
    mB = quat.to_matrix_cl(rB)

    # R = A^T B, t = A^T (pB - pA); everything [3, 3, P] / [3, P].
    dp = pB - pA
    R = _m3t_m3(mA, mB)
    t = _m3tv(mA, dp)
    absR = jnp.abs(R) + 1e-6

    # Face axes.
    sep_a = jnp.abs(t) - (hA + _m3v(absR, hB))   # [3, P]
    tb_ = _m3tv(R, t)
    sep_b = jnp.abs(tb_) - (_m3tv(absR, hA) + hB)
    best_a = jnp.argmax(sep_a, axis=0)               # [P]
    best_b = jnp.argmax(sep_b, axis=0)
    sep_a_best = jnp.max(sep_a, axis=0)
    sep_b_best = jnp.max(sep_b, axis=0)

    # Edge axes (closed form, rolled indices).
    r1i = jnp.array((1, 2, 0))
    r2i = jnp.array((2, 0, 1))
    hA1, hA2 = hA[r1i], hA[r2i]                      # [3, P]
    hB1, hB2 = hB[r1i], hB[r2i]
    absR_r1, absR_r2 = absR[r1i], absR[r2i]          # [3, 3, P]
    absR_c1, absR_c2 = absR[:, r1i], absR[:, r2i]
    R_r1, R_r2 = R[r1i], R[r2i]
    t1r, t2r = t[r1i], t[r2i]

    ra = hA1[:, None, :] * absR_r2 + hA2[:, None, :] * absR_r1   # [3, 3, P]
    rb = hB1[None, :, :] * absR_c2 + hB2[None, :, :] * absR_c1
    tl = t2r[:, None, :] * R_r1 - t1r[:, None, :] * R_r2
    length = jnp.sqrt(jnp.maximum(1.0 - R * R, 1e-12))
    edge_sep = (jnp.abs(tl) - ra - rb) / length
    edge_sep = jnp.where(length < 1e-3, -_BIG, edge_sep)

    scale = jnp.minimum(jnp.min(hA, axis=0), jnp.min(hB, axis=0))  # [P]
    e_flat = edge_sep.reshape(9, P)
    best_e = jnp.argmax(e_flat, axis=0)              # [P]
    sep_e_best = jnp.max(e_flat, axis=0)

    face_best = jnp.maximum(sep_a_best, sep_b_best)
    use_edge = sep_e_best > face_best + _EDGE_BIAS_ABS * scale     # [P]
    use_b_face = sep_b_best > sep_a_best + _REF_FACE_BIAS_ABS * scale

    # ===== Face-face manifold (selected reference box only) =====
    ub = use_b_face[None, :]
    h_ref = jnp.where(ub, hB, hA)                    # [3, P]
    h_inc = jnp.where(ub, hA, hB)
    RT = jnp.transpose(R, (1, 0, 2))
    R_ri = jnp.where(ub[None], RT, R)                # [3, 3, P]
    t_b = -_m3tv(R, t)                               # -(R^T t)
    t_ri = jnp.where(ub, t_b, t)
    axis = jnp.where(use_b_face, best_b, best_a)     # [P]

    ax_iota = jnp.arange(3)[:, None]                 # [3, 1]
    one_hot = (ax_iota == axis[None, :]).astype(jnp.float32)       # [3, P]
    t_ax = one_hot[0] * t_ri[0] + one_hot[1] * t_ri[1] + one_hot[2] * t_ri[2]
    sgn = jnp.where(t_ax >= 0, 1.0, -1.0)
    n_ref = one_hot * sgn[None]                      # [3, P]

    # Incident face: incident axis most anti-parallel to n_ref.
    d_inc = _m3tv(R_ri, n_ref)                       # [3, P]
    inc_axis = jnp.argmax(jnp.abs(d_inc), axis=0)
    inc_oh = (ax_iota == inc_axis[None, :]).astype(jnp.float32)
    d_sel = inc_oh[0] * d_inc[0] + inc_oh[1] * d_inc[1] + inc_oh[2] * d_inc[2]
    inc_sgn = -jnp.sign(d_sel)
    inc_n_local = inc_oh * inc_sgn[None]

    u_ax = (inc_axis + 1) % 3
    v_ax = (inc_axis + 2) % 3
    eu = (ax_iota == u_ax[None, :]).astype(jnp.float32)            # [3, P]
    ev = (ax_iota == v_ax[None, :]).astype(jnp.float32)
    hu_i = eu[0] * h_inc[0] + eu[1] * h_inc[1] + eu[2] * h_inc[2]  # [P]
    hv_i = ev[0] * h_inc[0] + ev[1] * h_inc[1] + ev[2] * h_inc[2]
    h_on_axis = inc_oh[0] * h_inc[0] + inc_oh[1] * h_inc[1] + inc_oh[2] * h_inc[2]
    center_l = inc_n_local * h_on_axis[None]         # [3, P]
    corners_l = jnp.stack([
        center_l + eu * hu_i[None] + ev * hv_i[None],
        center_l - eu * hu_i[None] + ev * hv_i[None],
        center_l - eu * hu_i[None] - ev * hv_i[None],
        center_l + eu * hu_i[None] - ev * hv_i[None],
    ])                                               # [4, 3, P]
    corners_r = (
        _m3_corners(R_ri, corners_l) + t_ri[None]
    )                                                # [4, 3, P] ref frame

    ru = (axis + 1) % 3
    rv = (axis + 2) % 3
    pick_u = (ax_iota == ru[None, :]).astype(jnp.float32)          # [3, P]
    pick_v = (ax_iota == rv[None, :]).astype(jnp.float32)
    h_face = one_hot[0] * h_ref[0] + one_hot[1] * h_ref[1] + one_hot[2] * h_ref[2]
    u = _corners_dot(corners_r, pick_u)              # [4, P]
    v = _corners_dot(corners_r, pick_v)
    depth = _corners_dot(corners_r, n_ref) - h_face[None]
    verts_uvd = jnp.stack([u, v, depth], axis=1)     # [4, 3, P]

    hu_r = pick_u[0] * h_ref[0] + pick_u[1] * h_ref[1] + pick_u[2] * h_ref[2]
    hv_r = pick_v[0] * h_ref[0] + pick_v[1] * h_ref[1] + pick_v[2] * h_ref[2]
    cand, cand_valid = _face_candidates_cl(verts_uvd, hu_r, hv_r)
    pts4, keep_face = _reduce_candidates_cl(cand, cand_valid)      # [4,3,P],[4,P]

    pts_ref = (
        pts4[:, 0:1, :] * pick_u[None]
        + pts4[:, 1:2, :] * pick_v[None]
        + (h_face[None, None] + pts4[:, 2:3, :]) * n_ref[None]
    )                                                # [4, 3, P]
    dist_face = pts4[:, 2, :]                        # [4, P]
    mid_ref = pts_ref - 0.5 * dist_face[:, None, :] * n_ref[None]

    m_ref = jnp.where(ub[None], mB, mA)              # [3, 3, P]
    p_ref = jnp.where(ub, pB, pA)
    n_w_ref = _m3v(m_ref, n_ref)
    n_face = jnp.where(ub, -n_w_ref, n_w_ref)
    mid_face = (
        _m3_corners(m_ref, mid_ref) + p_ref[None]
    )                                                # [4, 3, P]

    # Quadrant feature ids around the manifold centroid.
    ex = jnp.zeros((3, P)).at[0].set(1.0)
    ey = jnp.zeros((3, P)).at[1].set(1.0)
    t1f = cross_cl(n_face, ex)
    t1f_alt = cross_cl(n_face, ey)
    t1f = jnp.where((dot_cl(t1f, t1f) < 1e-6)[None], t1f_alt, t1f)
    t1f = t1f / jnp.maximum(jnp.sqrt(dot_cl(t1f, t1f))[None], 1e-9)
    t2f = cross_cl(n_face, t1f)
    keep_f = keep_face.astype(jnp.float32)
    nkeep = jnp.maximum(keep_f[0] + keep_f[1] + keep_f[2] + keep_f[3], 1.0)
    centroid = jnp.sum(mid_face * keep_f[:, None, :], axis=0) / nkeep[None]
    rel_c = mid_face - centroid[None]                # [4, 3, P]
    du_f = _corners_dot(rel_c, t1f)                  # [4, P]
    dv_f = _corners_dot(rel_c, t2f)
    fid_face = (
        (du_f > 0).astype(jnp.int32)
        + 2 * (dv_f > 0).astype(jnp.int32)
        + 4 * (jnp.abs(du_f) > jnp.abs(dv_f)).astype(jnp.int32)
    )

    # ===== Edge-edge manifold =====
    ei = best_e // 3
    ej = best_e % 3
    e_iota = jnp.arange(9)[:, None]                  # [9, 1]
    oh_e = (e_iota == best_e[None, :]).astype(jnp.float32)         # [9, P]
    R_r1_f = R_r1.reshape(9, P)
    R_r2_f = R_r2.reshape(9, P)
    len_f = length.reshape(9, P)
    Lsel_r1 = jnp.sum(oh_e * R_r1_f, axis=0)         # [P]
    Lsel_r2 = jnp.sum(oh_e * R_r2_f, axis=0)
    Lsel_len = jnp.sum(oh_e * len_f, axis=0)
    oh_i1 = (ax_iota == ((ei + 1) % 3)[None, :]).astype(jnp.float32)
    oh_i2 = (ax_iota == ((ei + 2) % 3)[None, :]).astype(jnp.float32)
    L = (oh_i1 * (-Lsel_r2)[None] + oh_i2 * Lsel_r1[None]) \
        / jnp.maximum(Lsel_len, 1e-12)[None]          # [3, P]
    L = jnp.where((dot_cl(L, t) < 0)[None], -L, L)

    sgnA = jnp.sign(jnp.where(jnp.abs(L) < 1e-12, 1.0, L))
    onehot_i = (ax_iota == ei[None, :]).astype(jnp.float32)
    cornerA = sgnA * hA * (1.0 - onehot_i)
    edgeA_a = cornerA - onehot_i * hA
    edgeA_b = cornerA + onehot_i * hA

    L_b = _m3tv(R, L)                                # R^T L
    sgnB = jnp.sign(jnp.where(jnp.abs(L_b) < 1e-12, 1.0, -L_b))
    onehot_j = (ax_iota == ej[None, :]).astype(jnp.float32)
    cornerB_l = sgnB * hB * (1.0 - onehot_j)
    edgeB_a_l = cornerB_l - onehot_j * hB
    edgeB_b_l = cornerB_l + onehot_j * hB
    edgeB_a = _m3v(R, edgeB_a_l) + t
    edgeB_b = _m3v(R, edgeB_b_l) + t

    _, _, cA_f, cB_f = _closest_segment_segment_cl(
        edgeA_a, edgeA_b, edgeB_a, edgeB_b)
    mid_edge_a = 0.5 * (cA_f + cB_f)
    n_edge_w = _m3v(mA, L)
    mid_edge_w = _m3v(mA, mid_edge_a) + pA
    fid_edge = jnp.int32(1 << 28) + best_e.astype(jnp.int32)       # [P]

    # ===== Select =====
    ue = use_edge[None, :]
    normal = jnp.where(ue, n_edge_w, n_face)         # [3, P]
    pts = jnp.where(
        use_edge[None, None, :],
        jnp.broadcast_to(mid_edge_w[None], (MAXP, 3, P)), mid_face)
    first = (jnp.arange(MAXP) == 0)[:, None]         # [4, 1]
    dst = jnp.where(
        ue,
        jnp.where(first, sep_e_best[None], _BIG),
        jnp.where(keep_face, dist_face, _BIG),
    )
    fids = jnp.where(
        ue,
        jnp.where(first, fid_edge[None], -1),
        fid_face,
    )
    valid = jnp.where(ue, first & jnp.ones((1, P), bool), keep_face)
    return Manifold(normal=normal, point=pts, dist=dst, fid=fids, valid=valid)


cuboid_cuboid_cl.lane_last = True


def cuboid_cuboid(pA, rA, prmA, pB, rB, prmB) -> Manifold:
    hA = prmA[0:3]
    hB = prmB[0:3]
    mA = quat.to_matrix(rA)
    mB = quat.to_matrix(rB)

    # B in A's frame.
    R = mA.T @ mB            # columns: B axes in A frame
    t = mA.T @ (pB - pA)
    absR = jnp.abs(R) + 1e-6

    # --- face axes ---
    sep_a = jnp.abs(t) - (hA + absR @ hB)                    # [3] A faces
    sep_b = jnp.abs(t @ R) - (hA @ absR + hB)                # [3] B faces

    best_a = jnp.argmax(sep_a)
    best_b = jnp.argmax(sep_b)
    sep_a_best = jnp.max(sep_a)
    sep_b_best = jnp.max(sep_b)

    # --- edge axes e_i x R[:,j], closed-form [3, 3] (i = A axis, j = B axis):
    #   ra[i,j] = hA[i+1]*absR[i+2,j] + hA[i+2]*absR[i+1,j]
    #   rb[i,j] = hB[j+1]*absR[i,j+2] + hB[j+2]*absR[i,j+1]
    #   tl[i,j] = t[i+2]*R[i+1,j] - t[i+1]*R[i+2,j]
    # (indices mod 3 — realized with rolled rows/columns).
    r1 = (1, 2, 0)
    r2 = (2, 0, 1)
    hA1, hA2 = hA[jnp.array(r1)], hA[jnp.array(r2)]
    hB1, hB2 = hB[jnp.array(r1)], hB[jnp.array(r2)]
    absR_r1, absR_r2 = absR[jnp.array(r1), :], absR[jnp.array(r2), :]
    absR_c1, absR_c2 = absR[:, jnp.array(r1)], absR[:, jnp.array(r2)]
    R_r1, R_r2 = R[jnp.array(r1), :], R[jnp.array(r2), :]
    t1r, t2r = t[jnp.array(r1)], t[jnp.array(r2)]

    ra = hA1[:, None] * absR_r2 + hA2[:, None] * absR_r1
    rb = hB1[None, :] * absR_c2 + hB2[None, :] * absR_c1
    tl = t2r[:, None] * R_r1 - t1r[:, None] * R_r2
    length = jnp.sqrt(jnp.maximum(1.0 - R * R, 1e-12))
    edge_sep = (jnp.abs(tl) - ra - rb) / length
    # Degenerate (parallel) axes never win.
    edge_sep = jnp.where(length < 1e-3, -_BIG, edge_sep)

    scale = jnp.minimum(jnp.min(hA), jnp.min(hB))
    e_flat = edge_sep.reshape(9)
    best_e = jnp.argmax(e_flat)
    sep_e_best = jnp.max(e_flat)

    face_best = jnp.maximum(sep_a_best, sep_b_best)
    use_edge = sep_e_best > face_best + _EDGE_BIAS_ABS * scale
    use_b_face = sep_b_best > sep_a_best + _REF_FACE_BIAS_ABS * scale

    # =====================================================================
    # Face-face manifold: ONLY for the selected reference box.
    # =====================================================================
    h_ref = jnp.where(use_b_face, hB, hA)
    h_inc = jnp.where(use_b_face, hA, hB)
    R_ri = jnp.where(use_b_face, R.T, R)     # incident rotation in ref frame
    t_ri = jnp.where(use_b_face, -(R.T @ t), t)
    axis = jnp.where(use_b_face, best_b, best_a)

    one_hot = jax.nn.one_hot(axis, 3)
    sgn = jnp.where(jnp.sum(t_ri * one_hot) >= 0, 1.0, -1.0)
    n_ref = one_hot * sgn                     # outward ref normal (ref frame)

    # Incident face: axis of incident box most anti-parallel to n_ref.
    d = n_ref @ R_ri                          # dot with incident axes [3]
    inc_axis = jnp.argmax(jnp.abs(d))
    inc_oh = jax.nn.one_hot(inc_axis, 3)
    inc_sgn = -jnp.sign(jnp.sum(inc_oh * d))
    inc_n_local = inc_oh * inc_sgn            # incident-local

    # Incident face corners (incident-local).
    u_ax = (inc_axis + 1) % 3
    v_ax = (inc_axis + 2) % 3
    eu = jax.nn.one_hot(u_ax, 3)
    ev = jax.nn.one_hot(v_ax, 3)
    hu_i = jnp.sum(eu * h_inc)
    hv_i = jnp.sum(ev * h_inc)
    center_l = inc_n_local * jnp.sum(inc_oh * h_inc)
    corners_l = jnp.stack([
        center_l + eu * hu_i + ev * hv_i,
        center_l - eu * hu_i + ev * hv_i,
        center_l - eu * hu_i - ev * hv_i,
        center_l + eu * hu_i - ev * hv_i,
    ])
    corners_r = corners_l @ R_ri.T + t_ri      # ref frame

    # 2D coords on the reference face (axes u, v of ref frame).
    ru = (axis + 1) % 3
    rv = (axis + 2) % 3
    pick_u = jax.nn.one_hot(ru, 3)
    pick_v = jax.nn.one_hot(rv, 3)
    h_face = jnp.sum(one_hot * h_ref)
    u = corners_r @ pick_u
    v = corners_r @ pick_v
    depth = corners_r @ n_ref - h_face        # signed dist above face
    verts_uvd = jnp.stack([u, v, depth], axis=-1)

    hu_r = jnp.sum(pick_u * h_ref)
    hv_r = jnp.sum(pick_v * h_ref)
    cand, cand_valid = _face_candidates(verts_uvd, hu_r, hv_r)
    pts4, keep_face = _reduce_candidates(cand, cand_valid)

    # Back to ref-frame 3D, then world.
    pts_ref = (
        pts4[:, 0:1] * pick_u[None, :]
        + pts4[:, 1:2] * pick_v[None, :]
        + (h_face + pts4[:, 2:3]) * n_ref[None, :]
    )
    dist_face = pts4[:, 2]
    mid_ref = pts_ref - 0.5 * dist_face[:, None] * n_ref[None, :]

    m_ref = jnp.where(use_b_face, mB, mA)
    p_ref = jnp.where(use_b_face, pB, pA)
    n_w_ref = m_ref @ n_ref
    # Manifold normal convention: from A towards B.
    n_face = jnp.where(use_b_face, -n_w_ref, n_w_ref)
    mid_face = mid_ref @ m_ref.T + p_ref

    # Reference-independent feature ids: quadrant of each contact point around
    # the manifold centroid in a basis derived from the (A->B stable) normal.
    # Clip-provenance ids flip when the reference face flips between the two
    # boxes at near-tie separations, losing warmstart and making stacks drift;
    # quadrant ids survive those flips.
    t1f = jnp.cross(n_face, jnp.array([1.0, 0.0, 0.0]))
    t1f_alt = jnp.cross(n_face, jnp.array([0.0, 1.0, 0.0]))
    t1f = jnp.where(jnp.sum(t1f * t1f) < 1e-6, t1f_alt, t1f)
    t1f = t1f / jnp.maximum(jnp.linalg.norm(t1f), 1e-9)
    t2f = jnp.cross(n_face, t1f)
    nkeep = jnp.maximum(jnp.sum(keep_face.astype(jnp.float32)), 1.0)
    centroid = jnp.sum(mid_face * keep_face[:, None], axis=0) / nkeep
    du = (mid_face - centroid) @ t1f
    dv = (mid_face - centroid) @ t2f
    fid_face = (
        (du > 0).astype(jnp.int32)
        + 2 * (dv > 0).astype(jnp.int32)
        # Distinguish near-axis points when the manifold is a 2-point edge
        # strip: add a coarse secondary bit from the larger offset.
        + 4 * (jnp.abs(du) > jnp.abs(dv)).astype(jnp.int32)
    )

    # =====================================================================
    # Edge-edge manifold.
    # =====================================================================
    ei = best_e // 3
    ej = best_e % 3
    # L = e_i x R[:,j]: component i1 = -R[i2,j], component i2 = R[i1,j].
    oh_e = (jnp.arange(9) == best_e).astype(jnp.float32).reshape(3, 3)
    Lsel_r1 = jnp.sum(oh_e * R_r1)            # R[i1, j] at the winner
    Lsel_r2 = jnp.sum(oh_e * R_r2)            # R[i2, j]
    Lsel_len = jnp.sum(oh_e * length)
    oh_i1 = jax.nn.one_hot((ei + 1) % 3, 3)
    oh_i2 = jax.nn.one_hot((ei + 2) % 3, 3)
    L = (oh_i1 * (-Lsel_r2) + oh_i2 * Lsel_r1) / jnp.maximum(Lsel_len, 1e-12)
    # Orient from A towards B.
    L = jnp.where(jnp.dot(L, t) < 0, -L, L)

    # Supporting edge on A along +L: corner signs = sign(L_k) for k != ei.
    sgnA = jnp.sign(jnp.where(jnp.abs(L) < 1e-12, 1.0, L))
    onehot_i = jax.nn.one_hot(ei, 3)
    cornerA = sgnA * hA * (1.0 - onehot_i)
    edgeA_a = cornerA - onehot_i * hA
    edgeA_b = cornerA + onehot_i * hA

    # Supporting edge on B along -L (B local): L in B frame = R^T L.
    L_b = R.T @ L
    sgnB = jnp.sign(jnp.where(jnp.abs(L_b) < 1e-12, 1.0, -L_b))
    onehot_j = jax.nn.one_hot(ej, 3)
    cornerB_l = sgnB * hB * (1.0 - onehot_j)
    edgeB_a_l = cornerB_l - onehot_j * hB
    edgeB_b_l = cornerB_l + onehot_j * hB
    edgeB_a = R @ edgeB_a_l + t
    edgeB_b = R @ edgeB_b_l + t

    _, _, cA_f, cB_f = _closest_segment_segment(edgeA_a, edgeA_b, edgeB_a, edgeB_b)
    mid_edge_a = 0.5 * (cA_f + cB_f)
    n_edge_w = mA @ L
    mid_edge_w = mA @ mid_edge_a + pA
    fid_edge = jnp.int32((1 << 28)) + best_e.astype(jnp.int32)

    # =====================================================================
    # Select.
    # =====================================================================
    m = _empty_manifold()
    normal = jnp.where(use_edge, n_edge_w, n_face)
    pts = jnp.where(use_edge, jnp.broadcast_to(mid_edge_w, (MAXP, 3)), mid_face)
    dst = jnp.where(
        use_edge,
        jnp.full((MAXP,), _BIG).at[0].set(sep_e_best),
        jnp.where(keep_face, dist_face, _BIG),
    )
    fids = jnp.where(use_edge, jnp.full((MAXP,), -1, jnp.int32).at[0].set(fid_edge),
                     fid_face)
    valid = jnp.where(use_edge, jnp.zeros((MAXP,), bool).at[0].set(True), keep_face)
    return m._replace(normal=normal, point=pts, dist=dst, fid=fids, valid=valid)
