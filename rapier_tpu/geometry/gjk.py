"""Masked fixed-iteration GJK distance + EPA penetration depth.

The exact convex-convex core the reference gets from parry's GJK/EPA
dispatch (reference `src/geometry/narrow_phase.rs:972-979` ->
`parry3d::query::contact`, `parry3d::query::gjk` / `epa`).  Redesigned for
TPU/XLA:

- **No dynamic control flow.** GJK runs a fixed number of `lax.fori_loop`
  iterations over a 4-slot simplex; convergence freezes the state through
  masks instead of breaking out.
- **Closest-point subalgorithm by exhaustive faces.** Instead of Johnson's
  recursive sub-simplex walk, every nonempty subset of the 4 simplex slots
  (4 vertices, 6 edges, 4 triangles, 1 tetrahedron = 15 candidates) is
  projected and tested for barycentric feasibility in parallel; the feasible
  face at minimal distance IS the closest point on the simplex.  Static
  shapes, fully vmappable over pair lanes.
- **Fixed-capacity EPA.** The expanding polytope lives in fixed vertex/face
  tables with validity masks.  Each iteration: pick the valid face nearest
  the origin, take a support point along its normal, mark the faces visible
  from it invalid, find the horizon edges (directed edges of visible faces
  whose reverse is not itself a visible edge — an O((3F)^2) masked
  comparison, tiny at F<=40), and stitch new faces from the horizon to the
  new vertex into the freed slots with one-hot matmul writes (no scatters).
- Round shapes (round cuboid/cylinder/cone, dilated convex hulls) run
  GJK/EPA on their inner shape and offset results by the border radii,
  exactly like parry's `RoundShape` support maps.

Entry point `contact_support_maps` returns (signed distance, unit normal
A->B, witness points on A and B) and is exact wherever the support
functions are (all analytic shapes + convex hulls).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from rapier_tpu.math import quat
from rapier_tpu.geometry import shapes as shp
from rapier_tpu.types import ShapeType

GJK_ITERS = 16
EPA_ITERS = 10
EPA_V = 16            # vertex slots (init <= 5, +1 per iteration)
EPA_F = 40            # face slots (init <= 6, net +2..+4 per iteration)
_EPS = 1e-9
_TOL = 1e-6

# ---------------------------------------------------------------------------
# Subset tables for the closest-point-on-simplex search.

_SUBSETS = (
    [(0,), (1,), (2,), (3,)]
    + [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    + [(0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)]
    + [(0, 1, 2, 3)]
)
_NSUB = len(_SUBSETS)
# NUMPY constants, deliberately: module-scope jnp arrays become leaked
# tracers when the module is first imported inside a jit trace (jnp ops on
# numpy constants convert on use, trace-safely).
import numpy as _np

_SUB_ORDER = _np.array([list(s) + [0] * (4 - len(s)) for s in _SUBSETS],
                       _np.int32)                      # [15, 4]
_SUB_SIZE = _np.array([len(s) for s in _SUBSETS], _np.int32)   # [15]


def _closest_on_simplex(W, nvalid):
    """Closest point to the origin on the simplex spanned by the first
    `nvalid` rows of W [4,3].

    Returns (dist2, x, lam, win) where `lam` [4] are barycentric weights in
    SLOT layout (lam[i] multiplies W[i]) and `win` indexes _SUBSETS.
    """
    d2s, lams, feas = [], [], []

    def push(d2, x, lam_slots, ok):
        d2s.append(d2)
        lams.append(lam_slots)
        feas.append(ok)

    slot_oh = jnp.eye(4, dtype=W.dtype)

    for s in _SUBSETS:
        k = len(s)
        sub_ok = jnp.all(jnp.array(s) < nvalid)
        if k == 1:
            (i,) = s
            push(jnp.dot(W[i], W[i]), W[i], slot_oh[i], sub_ok)
        elif k == 2:
            i, j = s
            e = W[j] - W[i]
            ee = jnp.dot(e, e)
            t = -jnp.dot(W[i], e) / jnp.maximum(ee, _EPS)
            ok = sub_ok & (ee > _EPS) & (t >= 0.0) & (t <= 1.0)
            x = W[i] + t * e
            push(jnp.dot(x, x), x, (1 - t) * slot_oh[i] + t * slot_oh[j], ok)
        elif k == 3:
            i, j, m = s
            e1, e2 = W[j] - W[i], W[m] - W[i]
            a11, a22 = jnp.dot(e1, e1), jnp.dot(e2, e2)
            a12 = jnp.dot(e1, e2)
            b1, b2 = -jnp.dot(W[i], e1), -jnp.dot(W[i], e2)
            det = a11 * a22 - a12 * a12
            scale = jnp.maximum(a11 * a22, _EPS)
            nd = jnp.maximum(jnp.abs(det), _EPS * scale)
            sd = jnp.where(det < 0, -nd, nd)
            u = (b1 * a22 - b2 * a12) / sd
            v = (a11 * b2 - a12 * b1) / sd
            ok = (sub_ok & (jnp.abs(det) > _EPS * scale)
                  & (u >= -_EPS) & (v >= -_EPS) & (u + v <= 1 + _EPS))
            x = W[i] + u * e1 + v * e2
            lam = (1 - u - v) * slot_oh[i] + u * slot_oh[j] + v * slot_oh[m]
            push(jnp.dot(x, x), x, lam, ok)
        else:
            e = jnp.stack([W[1] - W[0], W[2] - W[0], W[3] - W[0]], axis=1)
            det = jnp.linalg.det(e)
            cof = jnp.stack([
                jnp.cross(e[:, 1], e[:, 2]),
                jnp.cross(e[:, 2], e[:, 0]),
                jnp.cross(e[:, 0], e[:, 1]),
            ])                                           # rows: adj(e)
            scale = jnp.maximum(jnp.max(jnp.abs(e)) ** 3, _EPS)
            nd = jnp.maximum(jnp.abs(det), _EPS * scale)
            sd = jnp.where(det < 0, -nd, nd)
            t = (cof @ (-W[0])) / sd                     # [3]
            lam = jnp.concatenate([(1 - jnp.sum(t))[None], t])
            ok = (sub_ok & (jnp.abs(det) > _EPS * scale)
                  & jnp.all(lam >= -_EPS))
            push(jnp.zeros(()), jnp.zeros(3, W.dtype), lam, ok)

    d2 = jnp.stack(d2s)
    lam = jnp.stack(lams)
    ok = jnp.stack(feas)
    score = jnp.where(ok, d2, 1e30)
    win = jnp.argmin(score)
    woh = (jnp.arange(_NSUB) == win).astype(W.dtype)
    lam_w = woh @ lam
    x = lam_w @ W
    return woh @ score, x, lam_w, win


def gjk(supp, d0):
    """Fixed-iteration GJK on a Minkowski-difference support map.

    supp(d) -> (w, sa, sb): support of A-B along (unnormalized) world `d`,
    with the witness points on A and B.  d0: initial direction guess.

    Returns a dict: dist (>=0), normal A->B (unit; valid when separated),
    cpA, cpB, intersect, and the terminal simplex (W, SA, SB, nvalid, win)
    for EPA seeding.
    """
    dt = d0.dtype
    w0, sa0, sb0 = supp(d0)
    W = jnp.zeros((4, 3), dt).at[0].set(w0)
    SA = jnp.zeros((4, 3), dt).at[0].set(sa0)
    SB = jnp.zeros((4, 3), dt).at[0].set(sb0)

    def body(_, st):
        W, SA, SB, nv, active, inter = st
        d2, x, lam, win = _closest_on_simplex(W, nv)
        inter_now = d2 < 1e-12
        d = -x
        w, sa, sb = supp(jnp.where(inter_now, d0, d))
        # No-progress bound: every point of A-B is at least (x.w/|x|) away.
        conv = (d2 - jnp.dot(x, w)) <= _TOL * jnp.sqrt(jnp.maximum(d2, _EPS))
        # Re-pack the winning subset into leading slots, append w.
        order = jnp.asarray(_SUB_ORDER)[win]
        size = jnp.asarray(_SUB_SIZE)[win]
        idx = jnp.arange(4)
        keep = (idx < size)[:, None]
        Wn = jnp.where(keep, W[order], w[None])
        SAn = jnp.where(keep, SA[order], sa[None])
        SBn = jnp.where(keep, SB[order], sb[None])
        nvn = jnp.minimum(size + 1, 4)
        upd = active & ~inter_now & ~conv
        sel = lambda a, b: jnp.where(upd, a, b)
        return (sel(Wn, W), sel(SAn, SA), sel(SBn, SB),
                jnp.where(upd, nvn, nv),
                upd, inter | inter_now)

    W, SA, SB, nv, _, inter = lax.fori_loop(
        0, GJK_ITERS, body, (W, SA, SB, jnp.int32(1),
                             jnp.ones((), bool), jnp.zeros((), bool)))

    d2, x, lam, win = _closest_on_simplex(W, nv)
    inter = inter | (d2 < 1e-12)
    dist = jnp.sqrt(jnp.maximum(d2, 0.0))
    # x = cpA - cpB; the A->B contact normal points from A towards B.
    normal = -x / jnp.maximum(dist, _EPS)
    cpA = lam @ SA
    cpB = lam @ SB
    return dict(dist=dist, normal=normal, cpA=cpA, cpB=cpB,
                intersect=inter, W=W, SA=SA, SB=SB, nvalid=nv, win=win)


# ---------------------------------------------------------------------------
# EPA


def _face_geom(verts, vsum, nvert, fa, fb, fc):
    """Outward unit normal + plane offset for faces (fa,fb,fc) [F]."""
    V = verts.shape[0]
    oh = lambda ix: (ix[:, None] == jnp.arange(V)[None, :]).astype(verts.dtype)
    va = oh(fa) @ verts
    vb = oh(fb) @ verts
    vc = oh(fc) @ verts
    n = jnp.cross(vb - va, vc - va)
    nn = jnp.linalg.norm(n, axis=-1, keepdims=True)
    ok = nn[:, 0] > _EPS
    n = n / jnp.maximum(nn, _EPS)
    centroid = vsum / jnp.maximum(nvert.astype(verts.dtype), 1.0)
    flip = jnp.sum(n * (va - centroid[None]), axis=-1) < 0
    n = jnp.where(flip[:, None], -n, n)
    d = jnp.sum(n * va, axis=-1)
    return n, d, ok, va, vb, vc


def epa(supp, g):
    """Fixed-capacity EPA seeded from a terminal GJK state `g` (intersecting).

    Returns (depth >= 0, unit normal A->B, cpA, cpB, ok).  The normal is the
    direction along which translating B by `depth` separates the shapes.
    """
    W, SA, SB = g["W"], g["SA"], g["SB"]
    nv_simp = g["nvalid"]
    dt = W.dtype

    # --- seed polytope -----------------------------------------------------
    # k >= 3: triangle from slots 0..2.  k == 2: third point from a support
    # orthogonal to the segment.  k == 1: origin coincides with a vertex of
    # A-B (touching); depth ~ 0 — the degenerate guard below catches it.
    e01 = W[1] - W[0]
    ax = jnp.argmin(jnp.abs(e01))
    ortho = jnp.cross(e01, (jnp.arange(3) == ax).astype(dt))
    w2, sa2, sb2 = supp(ortho)
    need2 = nv_simp < 3
    t0, a0, b0 = W[0], SA[0], SB[0]
    t1, a1, b1 = W[1], SA[1], SB[1]
    t2 = jnp.where(need2, w2, W[2])
    a2 = jnp.where(need2, sa2, SA[2])
    b2 = jnp.where(need2, sb2, SB[2])

    n_t = jnp.cross(t1 - t0, t2 - t0)
    n_norm = jnp.linalg.norm(n_t)
    seed_ok = n_norm > _EPS
    n_t = n_t / jnp.maximum(n_norm, _EPS)
    wp, sap, sbp = supp(n_t)
    wm, sam, sbm = supp(-n_t)

    is_tet = nv_simp >= 4
    verts = jnp.zeros((EPA_V, 3), dt)
    vA = jnp.zeros((EPA_V, 3), dt)
    vB = jnp.zeros((EPA_V, 3), dt)
    rows = [
        (jnp.where(is_tet, W[0], t0), jnp.where(is_tet, SA[0], a0),
         jnp.where(is_tet, SB[0], b0)),
        (jnp.where(is_tet, W[1], t1), jnp.where(is_tet, SA[1], a1),
         jnp.where(is_tet, SB[1], b1)),
        (jnp.where(is_tet, W[2], t2), jnp.where(is_tet, SA[2], a2),
         jnp.where(is_tet, SB[2], b2)),
        (jnp.where(is_tet, W[3], wp), jnp.where(is_tet, SA[3], sap),
         jnp.where(is_tet, SB[3], sbp)),
        (wm, sam, sbm),
    ]
    for i, (v, a, b) in enumerate(rows):
        verts = verts.at[i].set(v)
        vA = vA.at[i].set(a)
        vB = vB.at[i].set(b)
    nvert = jnp.where(is_tet, 4, 5).astype(jnp.int32)
    vsum = jnp.sum(verts[:5] * (jnp.arange(5) < nvert)[:, None], axis=0)

    tet_faces = jnp.array(
        [[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3], [0, 0, 0], [0, 0, 0]],
        jnp.int32)
    bip_faces = jnp.array(
        [[0, 1, 3], [1, 2, 3], [2, 0, 3], [1, 0, 4], [2, 1, 4], [0, 2, 4]],
        jnp.int32)
    seed_faces = jnp.where(is_tet, tet_faces, bip_faces)
    nseed = jnp.where(is_tet, 4, 6)

    fa = jnp.zeros((EPA_F,), jnp.int32).at[:6].set(seed_faces[:, 0])
    fb = jnp.zeros((EPA_F,), jnp.int32).at[:6].set(seed_faces[:, 1])
    fc = jnp.zeros((EPA_F,), jnp.int32).at[:6].set(seed_faces[:, 2])
    fvalid = jnp.arange(EPA_F) < nseed
    fn, fd, fok, _, _, _ = _face_geom(verts, vsum, nvert, fa, fb, fc)
    fvalid = fvalid & fok

    def body(_, st):
        (verts, vA, vB, vsum, nvert, fa, fb, fc, fn, fd, fvalid,
         active, bn, bdep) = st
        score = jnp.where(fvalid, fd, 1e30)
        bf = jnp.argmin(score)
        foh = (jnp.arange(EPA_F) == bf).astype(dt)
        n = foh @ fn
        db = foh @ score
        w, sa, sb = supp(n)
        dw = jnp.dot(n, w)
        conv = (dw - db) <= _TOL
        have_face = jnp.any(fvalid)
        # Track the current best answer every iteration (robust to running
        # out of face slots mid-expansion).
        bn = jnp.where(active & have_face, n, bn)
        bdep = jnp.where(active & have_face, db, bdep)
        upd = active & ~conv & have_face

        # Faces visible from w get retired; their one-sided edges are the
        # horizon the replacement fan is built on.
        vis = fvalid & (jnp.sum(fn * w[None], axis=-1) - fd > 1e-7)
        vis = vis | (fvalid & (jnp.arange(EPA_F) == bf))
        Ea = jnp.concatenate([fa, fb, fc])          # [3F] directed edges
        Eb = jnp.concatenate([fb, fc, fa])
        evis = jnp.concatenate([vis, vis, vis])
        rev = (Ea[:, None] == Eb[None, :]) & (Eb[:, None] == Ea[None, :])
        has_rev = jnp.any(rev & evis[None, :], axis=1)
        horizon = evis & ~has_rev

        nvi = nvert  # new vertex slot
        voh = (jnp.arange(EPA_V) == nvi)[:, None]
        verts_n = jnp.where(voh, w[None], verts)
        vA_n = jnp.where(voh, sa[None], vA)
        vB_n = jnp.where(voh, sb[None], vB)
        vsum_n = vsum + w
        nvert_n = jnp.minimum(nvert + 1, EPA_V)

        fvalid_mid = fvalid & ~vis
        # Slot assignment: k-th horizon edge -> k-th free face slot, via
        # one-hot rank matmuls (scatter-free).
        h_rank = jnp.cumsum(horizon.astype(jnp.int32)) - 1
        free = ~fvalid_mid
        f_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
        nfree = jnp.sum(free.astype(jnp.int32))
        okh = horizon & (h_rank < nfree)
        K = EPA_F  # rank space
        M1 = (okh[:, None] & (h_rank[:, None] == jnp.arange(K)[None, :]))
        M2 = (free[:, None] & (f_rank[:, None] == jnp.arange(K)[None, :]))
        assign = (M1.astype(dt) @ M2.astype(dt).T)  # [3F, F]
        written = jnp.sum(assign, axis=0) > 0.5
        ai = assign.T.astype(dt)
        fa_n = jnp.where(written, (ai @ Ea.astype(dt)).astype(jnp.int32), fa)
        fb_n = jnp.where(written, (ai @ Eb.astype(dt)).astype(jnp.int32), fb)
        fc_n = jnp.where(written, jnp.int32(0) + nvi, fc)
        fvalid_n = fvalid_mid | written
        fn_n, fd_n, fok_n, _, _, _ = _face_geom(
            verts_n, vsum_n, nvert_n, fa_n, fb_n, fc_n)
        fvalid_n = fvalid_n & jnp.where(written, fok_n, True)
        fn_n = jnp.where(written[:, None], fn_n, fn)
        fd_n = jnp.where(written, fd_n, fd)

        sel = lambda a, b: jnp.where(upd, a, b)
        return (sel(verts_n, verts), sel(vA_n, vA), sel(vB_n, vB),
                sel(vsum_n, vsum), jnp.where(upd, nvert_n, nvert),
                sel(fa_n, fa), sel(fb_n, fb), sel(fc_n, fc),
                sel(fn_n, fn), sel(fd_n, fd), sel(fvalid_n, fvalid),
                upd, bn, bdep)

    init = (verts, vA, vB, vsum, nvert, fa, fb, fc, fn, fd, fvalid,
            seed_ok, jnp.array([0.0, 1.0, 0.0], dt), jnp.zeros((), dt))
    (verts, vA, vB, vsum, nvert, fa, fb, fc, fn, fd, fvalid,
     _, bn, bdep) = lax.fori_loop(0, EPA_ITERS, body, init)

    # Witness points: project the origin onto the best face's triangle.
    score = jnp.where(fvalid, fd, 1e30)
    bf = jnp.argmin(score)
    foh_i = (jnp.arange(EPA_F) == bf)
    foh = foh_i.astype(dt)
    use_face = jnp.any(fvalid) & (jnp.abs(foh @ fd - bdep) < 1e-5)
    n_fin = jnp.where(use_face, foh @ fn, bn)
    oh_v = lambda ix: (ix == jnp.arange(EPA_V)).astype(dt)
    fa_b = jnp.sum(foh_i * fa)
    fb_b = jnp.sum(foh_i * fb)
    fc_b = jnp.sum(foh_i * fc)
    va = oh_v(fa_b) @ verts
    vb = oh_v(fb_b) @ verts
    vc = oh_v(fc_b) @ verts
    p = bdep * n_fin
    e1, e2 = vb - va, vc - va
    a11, a22, a12 = jnp.dot(e1, e1), jnp.dot(e2, e2), jnp.dot(e1, e2)
    r = p - va
    det = jnp.maximum(a11 * a22 - a12 * a12, _EPS)
    u = (jnp.dot(r, e1) * a22 - jnp.dot(r, e2) * a12) / det
    v = (a11 * jnp.dot(r, e2) - a12 * jnp.dot(r, e1)) / det
    u = jnp.clip(u, 0.0, 1.0)
    v = jnp.clip(v, 0.0, 1.0 - u)
    l0 = 1.0 - u - v
    aa = oh_v(fa_b) @ vA
    ab = oh_v(fb_b) @ vA
    ac = oh_v(fc_b) @ vA
    ba = oh_v(fa_b) @ vB
    bb = oh_v(fb_b) @ vB
    bc = oh_v(fc_b) @ vB
    cpA = l0 * aa + u * ab + v * ac
    cpB = l0 * ba + u * bb + v * bc
    return bdep, n_fin, cpA, cpB, seed_ok


# ---------------------------------------------------------------------------
# Shape-pair entry point


def _border_radius(st, prm):
    """Dilation radius: explicit round-shape borders PLUS the smooth radius
    of balls and capsules, whose GJK/EPA inner shape is the point/segment
    skeleton (parry's `RoundShape` view — keeps the inner shape polytopal so
    EPA converges exactly instead of chasing a smooth surface)."""
    return jnp.where(
        st == ShapeType.ROUND_CUBOID, prm[3],
        jnp.where(
            (st == ShapeType.ROUND_CYLINDER) | (st == ShapeType.ROUND_CONE),
            prm[2],
            jnp.where(
                st == ShapeType.CONVEX, prm[1],
                jnp.where(st == ShapeType.BALL, prm[0],
                          jnp.where(st == ShapeType.CAPSULE, prm[6], 0.0)),
            ),
        ),
    )


def _inner_support(st, prm, d_local, hull):
    """Support of the shape's INNER skeleton: balls collapse to their center,
    capsules to their segment; everything else is the shape itself."""
    s = shp.support_point(st, prm, d_local, hull)
    dn = d_local / jnp.maximum(jnp.linalg.norm(d_local), _EPS)
    smooth_r = jnp.where(st == ShapeType.BALL, prm[0],
                         jnp.where(st == ShapeType.CAPSULE, prm[6], 0.0))
    return s - dn * smooth_r


def make_support(pA, rA, stA, prmA, pB, rB, stB, prmB, hullA=None, hullB=None):
    """World-frame Minkowski-difference support map for a shape pair
    (inner skeletons — border/smooth radii excluded, add them at the
    caller)."""

    def supp(d_w):
        la = _inner_support(stA, prmA, quat.inv_rotate(rA, d_w), hullA)
        lb = _inner_support(stB, prmB, quat.inv_rotate(rB, -d_w), hullB)
        sa = quat.transform_point(pA, rA, la)
        sb = quat.transform_point(pB, rB, lb)
        return sa - sb, sa, sb

    return supp


def contact_support_maps(pA, rA, stA, prmA, pB, rB, stB, prmB,
                         hullA=None, hullB=None):
    """Exact contact between two convex shapes via GJK (separated) / EPA
    (penetrating).  Returns (dist, normal A->B, cpA, cpB); dist is the
    signed gap including border radii; witness points lie on the OUTER
    (rounded) surfaces.
    """
    bA = _border_radius(stA, prmA)
    bB = _border_radius(stB, prmB)
    supp = make_support(pA, rA, stA, prmA, pB, rB, stB, prmB, hullA, hullB)
    d0 = pB - pA
    d0 = jnp.where(jnp.linalg.norm(d0) < _EPS, jnp.array([0.0, 1.0, 0.0]), d0)
    g = gjk(supp, d0)
    depth, n_pen, cpA_p, cpB_p, epa_ok = epa(supp, g)
    inter = g["intersect"]
    ok_pen = inter & epa_ok
    dist = jnp.where(ok_pen, -depth, g["dist"]) - bA - bB
    # Degenerate EPA seed = shapes touching EXACTLY (depth ~ 0; common for
    # scenes built in resting contact, e.g. the s2d arch voussoirs, whose
    # round-4 fallback normal kicked every joint on the first step).  The
    # terminal GJK simplex then spans the contact face of the Minkowski
    # difference: its plane normal IS the contact normal for face/edge
    # touches.  Orient by the support gap (the correct A->B normal has
    # separation ~ 0; the flipped one reports deep overlap).
    # EXACT-touch recovery (scenes built in resting contact, e.g. the s2d
    # arch voussoirs sharing joint vertices): the origin lies ON the
    # Minkowski boundary — often at a VERTEX when the shapes share corner
    # points — so the GJK simplex degenerates and EPA has no seed; the
    # round-4 fallback normal kicked every arch joint on step one.  Retry
    # with the difference inflated by a small ball (supp + eps*d): the
    # origin becomes strictly interior and EPA recovers the true face
    # normal (depth is discarded; dist stays the exact 0).
    eps_inf = 1e-4

    def supp_inf(d_w):
        w, sa, sb = supp(d_w)
        dn = d_w / jnp.maximum(jnp.linalg.norm(d_w), _EPS)
        return w + eps_inf * dn, sa, sb

    g2 = gjk(supp_inf, d0)
    _d2, n_inf, _a2, _b2, inf_ok = epa(supp_inf, g2)
    inf_ok = inf_ok & g2["intersect"]
    # Last resort: the center line.
    fallback_n = d0 / jnp.maximum(jnp.linalg.norm(d0), _EPS)
    normal = jnp.where(ok_pen, n_pen,
                       jnp.where(inter & inf_ok, n_inf,
                                 jnp.where(inter, fallback_n, g["normal"])))
    cpA = jnp.where(ok_pen, cpA_p, g["cpA"]) + normal * bA
    cpB = jnp.where(ok_pen, cpB_p, g["cpB"]) - normal * bB
    return dist, normal, cpA, cpB
