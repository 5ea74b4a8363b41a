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
