"""Cuboid-cuboid contact manifold via SAT + reference-face clipping.

The TPU-native equivalent of parry's box-box SAT specialization used by the
reference narrow phase (src/geometry/narrow_phase.rs:972).  Single-pair,
branch-free (everything computed, selected with `where`), designed for `vmap`
over pair lanes.  Produces up to 4 contact points with stable feature ids
(reduction philosophy mirrors src/geometry/manifold_reduction.rs:5-80:
deepest -> farthest -> two perpendicular extremes).
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


def _clip_quad(verts_uvd, ids, hu, hv):
    """Sutherland-Hodgman clip of a quad (u, v, depth) against the rectangle
    [-hu, hu] x [-hv, hv].  Fixed 8-slot buffers; returns (verts, ids, count).
    Depth is interpolated linearly; crossing-vertex ids hash the edge ids so
    they stay stable across steps."""
    buf = jnp.zeros((8, 3)).at[:4].set(verts_uvd)
    idb = jnp.full((8,), -1, jnp.int32).at[:4].set(ids)
    count = jnp.int32(4)

    planes = [
        (jnp.array([1.0, 0.0]), hu, 0),
        (jnp.array([-1.0, 0.0]), hu, 1),
        (jnp.array([0.0, 1.0]), hv, 2),
        (jnp.array([0.0, -1.0]), hv, 3),
    ]
    for nrm, off, pidx in planes:
        k = jnp.arange(8)
        valid = k < count
        nxt = jnp.where(k + 1 >= count, 0, k + 1)
        v_cur = buf
        # buf[nxt] via an 8x8 selection matmul: per-lane dynamic gathers
        # batch terribly on TPU (~1GB/s), tiny matmuls don't.
        sel_nxt = (nxt[:, None] == k[None, :]).astype(buf.dtype)
        v_nxt = sel_nxt @ buf
        id_nxt = jnp.sum(sel_nxt.astype(jnp.int32) * idb[None, :], axis=1)
        d_cur = v_cur[:, 0] * nrm[0] + v_cur[:, 1] * nrm[1] - off
        d_nxt = v_nxt[:, 0] * nrm[0] + v_nxt[:, 1] * nrm[1] - off
        in_cur = d_cur <= 0.0
        in_nxt = d_nxt <= 0.0

        emit_cur = valid & in_cur
        emit_x = valid & (in_cur != in_nxt)

        s = d_cur / jnp.where(jnp.abs(d_cur - d_nxt) < 1e-12, 1e-12, d_cur - d_nxt)
        s = jnp.clip(s, 0.0, 1.0)
        v_x = v_cur + (v_nxt - v_cur) * s[:, None]
        id_x = (
            jnp.minimum(idb, id_nxt) * 131
            + jnp.maximum(idb, id_nxt) * 31
            + pidx * 7919
        ) & 0x7FFFFF

        cnt_k = emit_cur.astype(jnp.int32) + emit_x.astype(jnp.int32)
        offs = jnp.cumsum(cnt_k) - cnt_k

        # Scatter-free compaction: output slot j selects its source edge via
        # an 8x8 selection matrix (TPU scatters with computed indices are
        # catastrophically slow; this is a tiny einsum instead).
        j_idx = k[:, None]
        sel_cur = emit_cur[None, :] & (j_idx == offs[None, :])
        sel_x = emit_x[None, :] & (
            j_idx == (offs + emit_cur.astype(jnp.int32))[None, :]
        )
        w_cur = sel_cur.astype(buf.dtype)
        w_x = sel_x.astype(buf.dtype)
        buf = w_cur @ v_cur + w_x @ v_x
        has = jnp.any(sel_cur | sel_x, axis=1)
        idb = jnp.where(
            has,
            jnp.sum(sel_cur * idb[None, :] + sel_x * id_x[None, :], axis=1,
                    dtype=jnp.int32),
            -1,
        )
        count = jnp.sum(cnt_k)

    return buf, idb, count


def _reduce_to_4(pts_uvd, ids, count):
    """Reduce up to 8 clipped points to <= 4: deepest, farthest from it, then
    the two extreme points perpendicular to that base line (the reference's
    naive reduction, manifold_reduction.rs:5-80)."""
    k = jnp.arange(8)
    valid = k < count
    big = 1e10

    def pick(i):
        """One-hot row selection (no per-lane gather)."""
        oh = (k == i).astype(pts_uvd.dtype)
        return oh @ pts_uvd, jnp.sum(oh.astype(jnp.int32) * ids), oh @ valid.astype(pts_uvd.dtype) > 0

    depth = jnp.where(valid, pts_uvd[:, 2], big)
    i0 = jnp.argmin(depth)
    r0, id0, v0 = pick(i0)
    p0 = r0[:2]

    d_from0 = jnp.where(valid, jnp.sum((pts_uvd[:, :2] - p0) ** 2, axis=-1), -big)
    i1 = jnp.argmax(d_from0)
    r1, id1, v1 = pick(i1)
    p1 = r1[:2]

    base = p1 - p0
    perp = jnp.array([-base[1], base[0]])
    side = jnp.einsum("kj,j->k", pts_uvd[:, :2] - p0, perp)
    i2 = jnp.argmax(jnp.where(valid, side, -big))
    i3 = jnp.argmin(jnp.where(valid, side, big))
    r2, id2, v2 = pick(i2)
    r3, id3, v3 = pick(i3)

    sel = jnp.stack([i0, i1, i2, i3])
    out_pts = jnp.stack([r0, r1, r2, r3])
    out_ids = jnp.stack([id0, id1, id2, id3])
    out_valid = jnp.stack([v0, v1, v2, v3])
    # Mask duplicate selections (e.g. count < 4).
    keep = jnp.ones((MAXP,), bool)
    for a in range(MAXP):
        for b in range(a):
            keep = keep.at[a].set(keep[a] & (sel[a] != sel[b]))
        keep = keep.at[a].set(keep[a] & out_valid[a])
    return out_pts, out_ids, keep


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

    # --- edge axes e_i x R[:,j] ---
    scale = jnp.minimum(jnp.min(hA), jnp.min(hB))
    edge_sep = jnp.full((3, 3), -1e10)
    edge_axis = jnp.zeros((3, 3, 3))
    for i in range(3):
        i1, i2 = (i + 1) % 3, (i + 2) % 3
        for j in range(3):
            j1, j2 = (j + 1) % 3, (j + 2) % 3
            # L = e_i x R[:,j] (A frame, unnormalized).
            L = jnp.zeros(3).at[i1].set(-R[i2, j]).at[i2].set(R[i1, j])
            length = jnp.sqrt(jnp.maximum(1.0 - R[i, j] * R[i, j], 1e-12))
            ra = hA[i1] * absR[i2, j] + hA[i2] * absR[i1, j]
            rb = hB[j1] * absR[i, j2] + hB[j2] * absR[i, j1]
            tl = t[i2] * R[i1, j] - t[i1] * R[i2, j]
            sep = (jnp.abs(tl) - ra - rb) / length
            # Degenerate (parallel) axes get -inf so they never win.
            sep = jnp.where(length < 1e-3, -1e10, sep)
            edge_sep = edge_sep.at[i, j].set(sep)
            edge_axis = edge_axis.at[i, j].set(L / length)

    e_flat = edge_sep.reshape(9)
    best_e = jnp.argmax(e_flat)
    sep_e_best = jnp.max(e_flat)
    oh_e = (jnp.arange(9) == best_e).astype(jnp.float32)

    face_best = jnp.maximum(sep_a_best, sep_b_best)
    use_edge = sep_e_best > face_best + _EDGE_BIAS_ABS * scale
    use_b_face = sep_b_best > sep_a_best + _REF_FACE_BIAS_ABS * scale

    # =====================================================================
    # Face-face manifold: computed for both (ref=A) and (ref=B), selected.
    # =====================================================================
    def face_manifold(h_ref, h_inc, R_ri, t_ri, axis, ref_is_a):
        """Reference box frame: R_ri = incident rotation in ref frame,
        t_ri = incident center in ref frame, axis = ref face axis index."""
        one_hot = jax.nn.one_hot(axis, 3)
        sgn = jnp.where(jnp.sum(t_ri * one_hot) >= 0, 1.0, -1.0)
        n_ref = one_hot * sgn                     # outward ref normal (ref frame)

        # Incident face: axis of incident box most anti-parallel to n_ref.
        d = n_ref @ R_ri                          # dot with incident axes [3]
        inc_axis = jnp.argmax(jnp.abs(d))
        inc_sgn = -jnp.sign(jnp.sum(jax.nn.one_hot(inc_axis, 3) * d))
        inc_n_local = jax.nn.one_hot(inc_axis, 3) * inc_sgn  # incident-local

        # Incident face corners (incident-local).
        u_ax = (inc_axis + 1) % 3
        v_ax = (inc_axis + 2) % 3
        hu_i = jnp.sum(jax.nn.one_hot(u_ax, 3) * h_inc)
        hv_i = jnp.sum(jax.nn.one_hot(v_ax, 3) * h_inc)
        center_l = inc_n_local * jnp.sum(jax.nn.one_hot(inc_axis, 3) * h_inc)
        eu = jax.nn.one_hot(u_ax, 3)
        ev = jax.nn.one_hot(v_ax, 3)
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
        ids = jnp.arange(4, dtype=jnp.int32) + inc_axis * 8 + jnp.where(inc_sgn > 0, 0, 4)

        hu_r = jnp.sum(pick_u * h_ref)
        hv_r = jnp.sum(pick_v * h_ref)
        clipped, cids, cnt = _clip_quad(verts_uvd, ids, hu_r, hv_r)
        pts4, ids4, keep4 = _reduce_to_4(clipped, cids, cnt)

        # Back to ref-frame 3D: on incident surface.
        pts_ref = (
            pts4[:, 0:1] * pick_u[None, :]
            + pts4[:, 1:2] * pick_v[None, :]
            + (h_face + pts4[:, 2:3]) * n_ref[None, :]
        )
        dist = pts4[:, 2]
        mid_ref = pts_ref - 0.5 * dist[:, None] * n_ref[None, :]
        fid = ids4 + jnp.where(ref_is_a, 0, 1 << 24) + axis * (1 << 20)
        return n_ref, mid_ref, dist, fid, keep4

    # ref = A.
    nA_ref, midA, distA, fidA, keepA = face_manifold(
        hA, hB, R, t, best_a, jnp.bool_(True)
    )
    # ref = B: incident = A; R_ab = R^T, t_ab = -R^T t.
    nB_ref, midB, distB, fidB, keepB = face_manifold(
        hB, hA, R.T, -(R.T @ t), best_b, jnp.bool_(False)
    )

    # World-space conversion.  Manifold normal convention: from A towards B.
    nA_w = mA @ nA_ref
    midA_w = midA @ mA.T + pA
    nB_w = -(mB @ nB_ref)
    midB_w = midB @ mB.T + pB

    n_face = jnp.where(use_b_face, nB_w, nA_w)
    mid_face = jnp.where(use_b_face, midB_w, midA_w)
    dist_face = jnp.where(use_b_face, distB, distA)
    keep_face = jnp.where(use_b_face, keepB, keepA)

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
    L = oh_e @ edge_axis.reshape(9, 3)            # A frame, unit (one-hot pick)
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
        jnp.full((MAXP,), 1e10).at[0].set(sep_e_best),
        jnp.where(keep_face, dist_face, 1e10),
    )
    fids = jnp.where(use_edge, jnp.full((MAXP,), -1, jnp.int32).at[0].set(fid_edge),
                     fid_face)
    valid = jnp.where(use_edge, jnp.zeros((MAXP,), bool).at[0].set(True), keep_face)
    return m._replace(normal=normal, point=pts, dist=dst, fid=fids, valid=valid)
