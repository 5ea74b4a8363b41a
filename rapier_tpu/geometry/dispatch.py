"""Narrow-phase dispatcher: shape-pair-type kernel selection over pair lanes.

The analog of parry's `QueryDispatcher` + the reference narrow phase's
per-pair loop (src/geometry/narrow_phase.rs:809-1150), recast as: run every
analytic kernel on every pair lane (vectorized), select by type mask.  Cheap
kernels stay full-width (elementwise VPU work); expensive lane-last kernels
(box-box SAT clip) run on census-capped compacted buckets of their own lanes
(SURVEY §7 M5 pair-type bucketing).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rapier_tpu.math import quat
from rapier_tpu.geometry import narrowphase as nph
from rapier_tpu.geometry.narrowphase_boxbox import cuboid_cuboid_cl
from rapier_tpu.types import BodyType, CoefficientCombineRule, ShapeType


class ManifoldBatch(NamedTuple):
    """Per-pair contact manifolds + solver metadata.

    LAYOUT: pair-lane axis LAST (component-leading).  TPU tiles the trailing
    two dims to (8, 128); a row-major [P, 4, 3] layout pads ~85x and made the
    narrow phase ~100x slower than lane-last in round-1 profiling.  All [P]
    scalars are 1-D; vector/point fields put P last."""

    collider1: jax.Array   # [P] int32
    collider2: jax.Array   # [P] int32
    # OR of the two colliders' event/hook flags and min force threshold
    # (staged here so the pipeline needs no further collider gathers).
    active_events_or: jax.Array  # [P] int32
    active_hooks_or: jax.Array   # [P] int32
    force_threshold: jax.Array   # [P] f32
    dyn1: jax.Array              # [P] bool — body1 exists and is dynamic
    dyn2: jax.Array              # [P] bool
    body1: jax.Array       # [P] int32 (-1 = static environment)
    body2: jax.Array       # [P] int32
    pair_key: jax.Array    # [P] int32 (c1 * C + c2, c1 < c2; -1 invalid)
    normal: jax.Array      # [3, P] world, from collider1 towards collider2
    point: jax.Array       # [4, 3, P] world midpoints
    dist: jax.Array        # [4, P] effective distance (skins subtracted)
    fid: jax.Array         # [4, P] int32
    point_valid: jax.Array # [4, P] bool — geometric validity
    point_active: jax.Array  # [4, P] bool — kept as solver contact
    valid: jax.Array       # [P] bool — pair lane occupied & manifold computed
    unsupported: jax.Array # scalar int32 — overlapping pairs with no kernel
    solver_pair: jax.Array # [P] bool — participates in constraint solve
    touching: jax.Array    # [P] bool — any point with dist <= 0 (events)
    sensor: jax.Array      # [P] bool — either collider is a sensor: the pair
                           # lives on the INTERSECTION graph (narrow_phase.rs
                           # :708 compute_intersections), never the solver
    friction: jax.Array    # [P]
    restitution: jax.Array # [P]
    rel_dominance: jax.Array  # [P] int32


def _combine_material(v1, v2, rule1, rule2):
    """CoefficientCombineRule: rule with the greater enum value wins
    (reference src/dynamics/coefficient_combine_rule.rs)."""
    rule = jnp.maximum(rule1, rule2)
    avg = (v1 + v2) * 0.5
    mn = jnp.minimum(v1, v2)
    mul = v1 * v2
    mx = jnp.maximum(v1, v2)
    return jnp.where(rule == CoefficientCombineRule.MIN, mn,
           jnp.where(rule == CoefficientCombineRule.MULTIPLY, mul,
           jnp.where(rule == CoefficientCombineRule.MAX, mx, avg)))


def collider_world_poses(bodies, colliders):
    """World pose of every collider: parent pose ∘ local pose.

    Parent pose lookup rides ONE routed matmul over a [7, N] row table
    (utils/routing.route_rows): batched per-scene index gathers cost ~100x
    more than the one-hot contraction under vmap."""
    from rapier_tpu.utils.routing import route_rows

    parent = colliders.parent
    safe_p = jnp.maximum(parent, 0)
    has_parent = parent >= 0
    rows = jnp.concatenate([bodies.pos.T, bodies.rot.T], axis=0)  # [7, N]
    pr = route_rows(rows, safe_p, bodies.pos.shape[0])            # [7, C]
    bp = jnp.where(has_parent[:, None], pr[0:3].T, 0.0)
    br = jnp.where(
        has_parent[:, None],
        pr[3:7].T,
        jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0, 1.0]), (parent.shape[0], 4)),
    )
    w_pos, w_rot = quat.compose(bp, br, colliders.local_pos, colliders.local_rot)
    return w_pos, w_rot


def _swapped(kernel):
    """Adapt a kernel written for (X, Y) order to canonical (Y, X) lanes:
    swap the shape arguments and flip the resulting normal."""

    def run(pA, rA, prmA, pB, rB, prmB):
        man = kernel(pB, rB, prmB, pA, rA, prmA)
        return man._replace(normal=-man.normal)

    return run


# Registry of analytic kernels keyed by canonically-ordered type pairs
# (keys MUST satisfy key[0] <= key[1] in ShapeType order — the dispatcher
# sorts each lane's shapes that way before kernel selection).
_PAIR_KERNELS = {
    (ShapeType.BALL, ShapeType.BALL): nph.ball_ball,
    (ShapeType.BALL, ShapeType.CUBOID): nph.ball_cuboid,
    (ShapeType.BALL, ShapeType.CAPSULE): nph.ball_capsule,
    (ShapeType.CAPSULE, ShapeType.CAPSULE): nph.capsule_capsule,
    (ShapeType.CUBOID, ShapeType.CAPSULE): _swapped(nph.capsule_cuboid),
    (ShapeType.CUBOID, ShapeType.CUBOID): cuboid_cuboid_cl,
}
assert all(k[0] <= k[1] for k in _PAIR_KERNELS), "registry keys must be canonical"

# Convex types the generic halfspace kernel supports.
_HALFSPACE_CONVEX = (
    ShapeType.BALL, ShapeType.CUBOID, ShapeType.CAPSULE, ShapeType.SEGMENT,
    ShapeType.CYLINDER, ShapeType.CONE, ShapeType.ROUND_CUBOID,
    ShapeType.ROUND_CYLINDER, ShapeType.ROUND_CONE, ShapeType.CONVEX,
)


def _order_rank(t):
    """Canonical ordering rank: halfspace always goes to the B slot."""
    return jnp.where(t == ShapeType.HALFSPACE, 1000, t)


# Expensive lane-last kernels run on a compacted BUCKET of just their own
# lanes instead of all P (the box-box SAT clip at full width was ~35% of the
# whole step on the mixed bench).  The bucket cap is census-derived:
# `factor * instances-of-the-rarer-type` pair slots, rounded up — generous
# (a collider rarely touches > 8 same-type neighbors within prediction);
# overflow degrades to "no contact this step" for the dropped pairs and is
# counted in ManifoldBatch.unsupported.  Scenes where the cap reaches P
# (e.g. all-box pyramids) skip bucketing automatically.
_BUCKET_PAIR_FACTOR = 8


def _bucket_cap(ta, tb, counts, p):
    if counts is None:
        return p
    ca = counts.get(int(ta), 0)
    cb = counts.get(int(tb), 0)
    est = ca if ta == tb else min(ca, cb)
    if est >= (1 << 28):
        return p
    cap = -(-est * _BUCKET_PAIR_FACTOR // 64) * 64
    # Bucketing pays for itself only when the bucket is substantially
    # narrower than the full buffer: the route/scatter one-hot matmuls are
    # O(cap * p) (a near-full bucket on a 39k-lane pyramid costs ~17 ms/step
    # and a 6 GB one-hot — round-4 trace).
    return cap if cap * 2 <= p else p


def _bucket_route(mask, cap: int):
    """Compacting one-hot route [C, P] for `mask` lanes + (bvalid, overflow).

    Built directly from compaction ranks (utils/compaction.compact_route) —
    no index materialization, no takes."""
    from rapier_tpu.utils.compaction import compact_route

    from rapier_tpu import precision as _prec
    f32 = _prec.FLOAT
    oh, bvalid, overflow = compact_route(mask, cap)
    return oh.astype(f32), bvalid, overflow


def _scatter_manifold(man_b, oh, bvalid, p: int) -> "nph.Manifold":
    """Route a bucket manifold [*, C] back to the full [*, P] lanes."""
    from rapier_tpu import precision as _prec
    f32 = _prec.FLOAT
    cap = oh.shape[0]
    covered = (bvalid.astype(f32) @ oh) > 0                    # [P]
    normal = man_b.normal @ oh                                 # [3, P]
    unit_y = jnp.zeros((3, p)).at[1].set(1.0)
    normal = jnp.where(covered[None], normal, unit_y)
    point = (man_b.point.reshape(12, cap) @ oh).reshape(4, 3, p)
    dist = jnp.where(covered[None], man_b.dist @ oh, 1e10)
    valid = ((man_b.valid.astype(f32) @ oh) > 0) & covered[None]
    # int32 feature ids survive the f32 route via 16-bit halves (edge fids
    # carry a 1<<28 tag that f32 cannot represent exactly in one piece).
    flo = (man_b.fid & 0xFFFF).astype(f32) @ oh
    fhi = ((man_b.fid >> 16) & 0xFFFF).astype(f32) @ oh
    fid = flo.astype(jnp.int32) | (fhi.astype(jnp.int32) << 16)
    fid = jnp.where(covered[None], fid, -1)
    return nph.Manifold(normal=normal, point=point, dist=dist, fid=fid,
                        valid=valid)


def _run_bucketed(kern, mask, cap: int, TA, TB):
    """Gather `mask` lanes into a [*, cap] bucket, run a lane-last kernel,
    scatter the manifold back to P lanes.  Returns (manifold, overflow)."""
    p = mask.shape[0]
    oh, bvalid, overflow = _bucket_route(mask, cap)
    TAb = TA @ oh.T                       # [38, C]
    TBb = TB @ oh.T
    man_b = kern(TAb[0:3], TAb[3:7], TAb[7:19], TBb[0:3], TBb[3:7], TBb[7:19])
    return _scatter_manifold(man_b, oh, bvalid, p), overflow


def parent_body_cols(bodies, parent):
    """Per-collider parent-body columns via ONE routed matmul
    (utils/routing.route_rows; batched per-scene gathers are ~100x slower
    under vmap).  Returns (bt_c, mb_link_c, dominance_c, soft_ccd_c,
    linvel_c [C, 3]) with parent<0 rows already defaulted."""
    from rapier_tpu.utils.routing import route_rows

    safe_p = jnp.maximum(parent, 0)
    has = parent >= 0
    f32 = jnp.float32
    rows = jnp.concatenate([
        bodies.body_type[None].astype(f32),
        bodies.mb_link[None].astype(f32),
        bodies.dominance[None].astype(f32),
        bodies.soft_ccd_prediction[None].astype(f32),
        bodies.linvel.T.astype(f32),
    ], axis=0)                                            # [7, N]
    pr = route_rows(rows, safe_p, bodies.n)               # [7, C]
    bt_c = jnp.where(has, pr[0].astype(jnp.int32), int(BodyType.FIXED))
    mb_link_c = has & (pr[1] > 0.5)
    dom_c = pr[2].astype(jnp.int32)
    soft_c = jnp.where(has, pr[3], 0.0)
    linvel_c = jnp.where(has[:, None], pr[4:7].T, 0.0)
    return bt_c, mb_link_c, dom_c, soft_c, linvel_c


def _soft_ccd_cols(soft, v, c: int, dt):
    """Staged columns 34:38 for soft-CCD inflation: parent linvel clamped to
    soft_ccd_prediction/dt (narrow_phase.rs:953-958) + an active flag.
    `soft`/`v` come pre-routed from parent_body_cols."""
    from rapier_tpu import precision as _prec
    f32 = _prec.FLOAT
    if dt is None:
        return jnp.zeros((c, 4), f32)
    inv_dt = jnp.where(jnp.asarray(dt) == 0, 0.0, 1.0 / jnp.asarray(dt))
    vmag = jnp.linalg.norm(v, axis=-1, keepdims=True)
    cap = (soft * inv_dt)[:, None]
    scale = jnp.where(
        (soft[:, None] > 0) & (vmag > cap), cap / jnp.maximum(vmag, 1e-12), 1.0
    )
    return jnp.concatenate([v * scale, soft[:, None]], axis=1)


def compute_manifolds(bodies, colliders, c1, c2, pair_valid, prediction,
                      present: tuple = (), hulls=None, dt=None):
    """Compute contact manifolds for the pair buffer.

    Args:
      bodies, colliders: scene state.
      c1, c2: [P] collider indices (c1 < c2 from the broad phase; -1 invalid).
      pair_valid: [P] bool.
      prediction: scalar prediction distance.
      dt: step dt — enables soft-CCD prediction inflation
        (narrow_phase.rs:944-970): pairs where either body sets
        soft_ccd_prediction get prediction = max(prediction, dt*|v1-v2|)
        with velocities clamped to soft_ccd_prediction/dt.
      present: static shape-type census (from SimParams.shape_types_present):
        a tuple of (ShapeType int, count) pairs, or legacy plain ints
        (count unknown).  Empty = unknown, run every kernel.  Kernels whose
        pair types cannot occur — type absent, or a same-type pair with only
        one instance — are skipped at trace time, the TPU analog of parry's
        per-pair dispatch cost model.
    """

    if present:
        _counts = {}
        for entry in present:
            if isinstance(entry, tuple):
                _counts[int(entry[0])] = int(entry[1])
            else:
                _counts[int(entry)] = 1 << 30
    else:
        _counts = None

    def _has(*types):
        return _counts is None or all(int(t) in _counts for t in types)

    def _pair_possible(ta, tb):
        if _counts is None:
            return True
        ta, tb = int(ta), int(tb)
        if ta not in _counts or tb not in _counts:
            return False
        return ta != tb or _counts[ta] >= 2
    P = c1.shape[0]
    n_coll = colliders.parent.shape[0]
    w_pos, w_rot = collider_world_poses(bodies, colliders)

    s1 = jnp.maximum(c1, 0)
    s2 = jnp.maximum(c2, 0)

    # --- staged collider table: ALL per-pair collider lookups become two
    # one-hot matmuls (TPU batched gathers are ~1GB/s; the MXU isn't) ---
    from rapier_tpu import precision as _prec
    f32 = _prec.FLOAT
    parent = colliders.parent
    bt_c, mb_link_c, dom_raw, soft_c, linvel_c = parent_body_cols(
        bodies, parent
    )
    # Solver-dynamic: responds to contact impulses — dynamic bodies AND
    # multibody links (two-way coupling, dynamics/multibody.py phase B).
    sdyn_c = (bt_c == BodyType.DYNAMIC) | mb_link_c
    dom_c = jnp.where(sdyn_c, dom_raw, 127)
    sg = colliders.solver_groups
    cols = jnp.concatenate([
        w_pos,                                              # 0:3
        w_rot,                                              # 3:7
        colliders.shape_params,                             # 7:19
        colliders.shape_type[:, None].astype(f32),          # 19
        colliders.friction[:, None],                        # 20
        colliders.restitution[:, None],                     # 21
        colliders.friction_combine[:, None].astype(f32),    # 22
        colliders.restitution_combine[:, None].astype(f32), # 23
        colliders.contact_skin[:, None],                    # 24
        colliders.sensor[:, None].astype(f32),              # 25
        (sg >> 16).astype(f32)[:, None],                    # 26
        (sg & 0xFFFF).astype(f32)[:, None],                 # 27
        parent[:, None].astype(f32),                        # 28
        dom_c[:, None].astype(f32),                         # 29
        colliders.active_events[:, None].astype(f32),       # 30
        colliders.active_hooks[:, None].astype(f32),        # 31
        # inf would poison the one-hot matmul (0*inf = NaN): clamp.
        jnp.minimum(colliders.contact_force_event_threshold, 3.0e38)[:, None],  # 32
        sdyn_c[:, None].astype(f32),                        # 33 solver-dyn
        _soft_ccd_cols(soft_c, linvel_c, parent.shape[0], dt),  # 34:38
    ], axis=1)
    n_staged_cols = cols.shape[1]        # 38 today; derived, never hardcoded

    # Lane-LAST staged table: [n_staged_cols, P] so every per-pair column
    # below is a tile-friendly [d, P] array (see ManifoldBatch layout
    # docstring).  One-hot matmuls route each pair's two collider rows at
    # small sizes; direct takes above the dense-routing limit (the [P, C]
    # masks are O(P*C) — gigabytes at 5k+ colliders).
    from rapier_tpu.utils.routing import DENSE_ROUTE_ELEMS

    colsT = cols.T                       # [n_staged_cols, C]
    if s1.shape[0] * n_coll <= DENSE_ROUTE_ELEMS:
        ids_c = jnp.arange(n_coll)
        oh_s1 = (s1[:, None] == ids_c[None, :]).astype(f32)
        oh_s2 = (s2[:, None] == ids_c[None, :]).astype(f32)
        T1 = colsT @ oh_s1.T             # [n_staged_cols, P]
        T2 = colsT @ oh_s2.T
    else:
        T1 = jnp.take(colsT, s1, axis=1)
        T2 = jnp.take(colsT, s2, axis=1)

    t1 = T1[19].astype(jnp.int32)
    t2 = T2[19].astype(jnp.int32)
    flip = _order_rank(t1) > _order_rank(t2)
    TA = jnp.where(flip[None, :], T2, T1)
    TB = jnp.where(flip[None, :], T1, T2)
    tA = TA[19].astype(jnp.int32)
    tB = TB[19].astype(jnp.int32)
    pA, rA, prmA = TA[0:3], TA[3:7], TA[7:19]
    pB, rB, prmB = TB[0:3], TB[3:7], TB[7:19]

    # CONVEX hull vertex slots per lane ([V, 3, P], lane-last), gathered from
    # the scene hull table by the hull index stored in shape_params[0].
    hullA = hullB = None
    if hulls is not None and _has(ShapeType.CONVEX):
        hv = hulls.vertices                              # [H, V, 3]
        h_n = hv.shape[0]

        def lane_hulls(t_row, prm_row):
            hidx = jnp.where(
                t_row == ShapeType.CONVEX, prm_row[0].astype(jnp.int32), 0
            )
            ohh = (hidx[:, None] == jnp.arange(h_n)[None, :]).astype(f32)
            return jnp.einsum("ph,hvj->vjp", ohh, hv)

        hullA = lane_hulls(tA, prmA)
        hullB = lane_hulls(tB, prmB)

    # Run every (present) kernel on every lane; select by type mask.
    # Kernels are written per-lane; vmap with the lane axis LAST keeps every
    # batched intermediate tile-friendly.
    normal = jnp.zeros((3, P)).at[1].set(1.0)
    point = jnp.zeros((4, 3, P))
    dist = jnp.full((4, P), 1e10)
    fid = jnp.full((4, P), -1, jnp.int32)
    pvalid = jnp.zeros((4, P), bool)
    matched = jnp.zeros((P,), bool)

    def merge(mask, man: nph.Manifold):
        nonlocal normal, point, dist, fid, pvalid, matched
        normal = jnp.where(mask[None], man.normal, normal)
        point = jnp.where(mask[None, None], man.point, point)
        dist = jnp.where(mask[None], man.dist, dist)
        fid = jnp.where(mask[None], man.fid, fid)
        pvalid = jnp.where(mask[None], man.valid, pvalid)
        matched = matched | mask

    def vlane(kern):
        return jax.vmap(kern, in_axes=-1, out_axes=-1)

    bucket_dropped = jnp.int32(0)
    for (ta, tb), kern in _PAIR_KERNELS.items():
        if not _pair_possible(ta, tb):
            continue
        mask = pair_valid & (tA == ta) & (tB == tb)
        if getattr(kern, "lane_last", False):
            # Kernel written component-leading over the lane axis — call
            # directly (no per-lane vmap), on a census-capped bucket of its
            # own lanes when that is narrower than the full pair buffer.
            cap = _bucket_cap(ta, tb, _counts, P)
            if cap < P:
                man, dropped = _run_bucketed(kern, mask, cap, TA, TB)
                bucket_dropped = bucket_dropped + dropped
            else:
                man = kern(pA, rA, prmA, pB, rB, prmB)
        else:
            man = vlane(kern)(pA, rA, prmA, pB, rB, prmB)
        merge(mask, man)

    # Generic convex-convex fallback (cylinder/cone/round shapes vs anything
    # convex without a specialized kernel above).  Skipped entirely when every
    # present convex pair has an analytic kernel.
    from rapier_tpu.geometry.narrowphase_convex import SUPPORTED, convex_convex

    if _counts is not None:
        pres_conv = [int(t) for t in SUPPORTED if int(t) in _counts]
        need_cc = any(
            (ShapeType(min(a, b)), ShapeType(max(a, b))) not in _PAIR_KERNELS
            and _pair_possible(a, b)
            for a in pres_conv for b in pres_conv
        )
    else:
        need_cc = True
    if need_cc:
        convA = jnp.zeros((P,), bool)
        convB = jnp.zeros((P,), bool)
        for t in SUPPORTED:
            convA = convA | (tA == t)
            convB = convB | (tB == t)
        cc_mask = pair_valid & ~matched & convA & convB
        # Census-capped bucket: only pairs where at least one side is a
        # GENERIC convex type (no analytic kernel) reach this kernel, so
        # the bucket is sized by the generic-collider census — the GJK/EPA
        # iteration then runs on a fraction of the lane buffer.
        cap_cc = P
        if _counts is not None:
            generic = [
                t for t in pres_conv
                if any((ShapeType(min(t, o)), ShapeType(max(t, o)))
                       not in _PAIR_KERNELS and _pair_possible(t, o)
                       for o in pres_conv)
            ]
            est = sum(_counts.get(t, 0) for t in generic)
            cap_cc = min(P, max(64, -(-est * _BUCKET_PAIR_FACTOR // 64) * 64))
            if cap_cc * 2 > P:   # near-full bucket: routing costs > savings
                cap_cc = P
        if cap_cc < P:
            ohcc, ccvalid, cc_drop = _bucket_route(cc_mask, cap_cc)
            bucket_dropped = bucket_dropped + cc_drop
            TAb = TA @ ohcc.T
            TBb = TB @ ohcc.T
            tAb = TAb[19].astype(jnp.int32)
            tBb = TBb[19].astype(jnp.int32)
            args = (TAb[0:3], TAb[3:7], tAb, TAb[7:19],
                    TBb[0:3], TBb[3:7], tBb, TBb[7:19])
            if hullA is not None:
                hAb = jnp.einsum("vjp,cp->vjc", hullA, ohcc)
                hBb = jnp.einsum("vjp,cp->vjc", hullB, ohcc)
                man_b = vlane(convex_convex)(*args, hAb, hBb)
            else:
                man_b = vlane(convex_convex)(*args)
            man_cc = _scatter_manifold(man_b, ohcc, ccvalid, P)
        elif hullA is not None:
            man_cc = vlane(convex_convex)(
                pA, rA, tA, prmA, pB, rB, tB, prmB, hullA, hullB
            )
        else:
            man_cc = vlane(convex_convex)(pA, rA, tA, prmA, pB, rB, tB, prmB)
        merge(cc_mask, man_cc)

    # Halfspace kernels: analytic for ball/capsule, generic perturbed-support
    # for the remaining convex shapes.
    if _has(ShapeType.HALFSPACE):
        hs_mask = pair_valid & (tB == ShapeType.HALFSPACE)
        if _has(ShapeType.BALL):
            merge(hs_mask & (tA == ShapeType.BALL),
                  vlane(nph.ball_halfspace)(pA, rA, prmA, pB, rB, prmB))
        if _has(ShapeType.CAPSULE):
            merge(hs_mask & (tA == ShapeType.CAPSULE),
                  vlane(nph.capsule_halfspace)(pA, rA, prmA, pB, rB, prmB))
        hs_generic = [
            t for t in _HALFSPACE_CONVEX
            if t not in (ShapeType.BALL, ShapeType.CAPSULE) and _has(t)
        ]
        if hs_generic:
            conv_ok = jnp.zeros((P,), bool)
            for t in hs_generic:
                conv_ok = conv_ok | (tA == t)
            if hullA is not None:
                man_hs = vlane(nph.convex_halfspace)(
                    pA, rA, tA, prmA, pB, rB, prmB, hullA
                )
            else:
                man_hs = vlane(nph.convex_halfspace)(
                    pA, rA, tA, prmA, pB, rB, prmB
                )
            merge(hs_mask & conv_ok, man_hs)

    # Restore original pair orientation: normal points collider1 -> collider2.
    normal = jnp.where(flip[None, :], -normal, normal)


    # Effective distance: subtract contact skins (reference
    # narrow_phase.rs:1033 effective_contact_dist).  All material/body fields
    # read from the staged tables (no gathers).
    skins = T1[24] + T2[24]
    dist = dist - skins[None, :]

    # Soft-CCD prediction inflation (narrow_phase.rs:944-970).
    soft_flag = (T1[37] > 0.0) | (T2[37] > 0.0)
    rel_v = jnp.sqrt(jnp.maximum(
        (T1[34] - T2[34]) ** 2 + (T1[35] - T2[35]) ** 2
        + (T1[36] - T2[36]) ** 2, 0.0,
    ))
    dt_f = jnp.float32(0.0) if dt is None else jnp.asarray(dt, jnp.float32)
    eff_prediction = jnp.where(
        soft_flag, jnp.maximum(prediction, dt_f * rel_v), prediction
    )                                                   # [P]
    point_active = pvalid & (dist < eff_prediction[None, :])
    # "Touching" mirrors the reference's has_any_active_contact: the pair has
    # solver contacts (within prediction).  Using dist <= 0 here flickers at
    # the soft-constraint slop boundary and spuriously wakes sleeping stacks.
    touching = pair_valid & jnp.any(point_active, axis=0)

    # Material combination.
    friction = _combine_material(
        T1[20], T2[20],
        T1[22].astype(jnp.int32), T2[22].astype(jnp.int32),
    )
    restitution = _combine_material(
        T1[21], T2[21],
        T1[23].astype(jnp.int32), T2[23].astype(jnp.int32),
    )

    # Bodies + dominance (staged columns: parent 28, effective dominance 29).
    b1 = jnp.where(pair_valid, T1[28].astype(jnp.int32), -1)
    b2 = jnp.where(pair_valid, T2[28].astype(jnp.int32), -1)
    dom1 = jnp.where(b1 >= 0, T1[29], 127.0)
    dom2 = jnp.where(b2 >= 0, T2[29], 127.0)
    rel_dom = (dom1 - dom2).astype(jnp.int32)

    # Sensor pairs & solver-group filter never reach the solver (reference
    # narrow_phase.rs: intersections graph vs contacts graph; SolverFlags).
    sensor = (T1[25] + T2[25]) > 0
    m1g = T1[26].astype(jnp.int32)
    f1g = T1[27].astype(jnp.int32)
    m2g = T2[26].astype(jnp.int32)
    f2g = T2[27].astype(jnp.int32)
    solver_groups_ok = ((m1g & f2g) != 0) & ((m2g & f1g) != 0)
    # At least one solver-dynamic endpoint: ActiveCollisionTypes can admit
    # kinematic/fixed-only pairs (events), which must never reach the solver
    # (their constraint denominators would be singular).
    solver_dyn = ((b1 >= 0) & (T1[33] > 0.0)) | ((b2 >= 0) & (T2[33] > 0.0))
    solver_pair = (
        pair_valid & matched & ~sensor & solver_groups_ok & solver_dyn
        & jnp.any(point_active, axis=0)
    )

    pair_key = jnp.where(pair_valid, s1 * n_coll + s2, -1)

    # Mesh pairs are handled by compute_mesh_manifolds; drop them here.
    from rapier_tpu.geometry.narrowphase_mesh import MESH_TYPES, is_mesh_type

    if any(_has(t) for t in MESH_TYPES):
        has_mesh = is_mesh_type(t1) | is_mesh_type(t2)
        pair_valid = pair_valid & ~has_mesh

    return ManifoldBatch(
        collider1=jnp.where(pair_valid, s1, -1),
        collider2=jnp.where(pair_valid, s2, -1),
        active_events_or=(
            T1[30].astype(jnp.int32) | T2[30].astype(jnp.int32)
        ),
        active_hooks_or=(
            T1[31].astype(jnp.int32) | T2[31].astype(jnp.int32)
        ),
        force_threshold=jnp.minimum(T1[32], T2[32]),
        dyn1=(b1 >= 0) & (T1[33] > 0.0),
        dyn2=(b2 >= 0) & (T2[33] > 0.0),
        body1=b1, body2=b2, pair_key=pair_key,
        normal=normal, point=point, dist=dist, fid=fid,
        point_valid=pvalid & pair_valid[None, :],
        point_active=point_active & pair_valid[None, :],
        valid=pair_valid & matched,
        unsupported=jnp.sum((pair_valid & ~matched).astype(jnp.int32))
        + bucket_dropped,
        solver_pair=solver_pair,
        touching=touching,
        sensor=sensor & pair_valid,
        friction=friction, restitution=restitution,
        rel_dominance=rel_dom,
    )


def compute_mesh_manifolds(bodies, colliders, meshes, c1, c2, pair_valid,
                           prediction, max_mesh_pairs: int, tris_per_pair: int):
    """Expand (convex, mesh) broad-phase pairs into per-triangle manifolds.

    Returns a ManifoldBatch with max_mesh_pairs * tris_per_pair lanes.  Each
    lane's pair_key encodes the triangle id so warmstart matching stays stable:
    key = (c1 * C + c2) + (tri + 1) * C^2  (requires C^2 * (T+1) < 2^31).
    """
    from rapier_tpu.geometry import narrowphase_mesh as npm

    pm, k = max_mesh_pairs, tris_per_pair
    n_coll = colliders.parent.shape[0]
    w_pos, w_rot = collider_world_poses(bodies, colliders)

    s1 = jnp.maximum(c1, 0)
    s2 = jnp.maximum(c2, 0)
    t1 = colliders.shape_type[s1]
    t2 = colliders.shape_type[s2]
    m1 = npm.is_mesh_type(t1)
    m2 = npm.is_mesh_type(t2)
    is_mesh_pair = pair_valid & (m1 ^ m2)

    # Compact mesh pairs: convex side cA, mesh side cM; flip marks the mesh
    # being collider1 of the original pair.
    from rapier_tpu.utils.compaction import compact_indices

    src, lane_valid, _ovf = compact_indices(is_mesh_pair, pm)
    cA = jnp.where(lane_valid, jnp.where(m1, s2, s1)[src], 0)
    cM = jnp.where(lane_valid, jnp.where(m1, s1, s2)[src], 0)
    flip = lane_valid & m1[src]

    # --- mid-phase: rank triangles by AABB overlap with the convex (in the
    # mesh collider's local frame) ---
    tris = meshes.triangles                      # [T, 3]
    tv0 = meshes.vertices[jnp.maximum(tris[:, 0], 0)]
    tv1 = meshes.vertices[jnp.maximum(tris[:, 1], 0)]
    tv2 = meshes.vertices[jnp.maximum(tris[:, 2], 0)]
    tri_min = jnp.minimum(jnp.minimum(tv0, tv1), tv2)      # [T, 3]
    tri_max = jnp.maximum(jnp.maximum(tv0, tv1), tv2)
    tri_ok = tris[:, 0] >= 0
    t_total = tris.shape[0]

    from rapier_tpu.geometry import shapes as shp

    a_min, a_max = shp.compute_aabbs(
        colliders.shape_type[cA], colliders.shape_params[cA],
        w_pos[cA], w_rot[cA],
    )
    a_min = a_min - prediction
    a_max = a_max + prediction

    def rank_lane(ca_min, ca_max, cm, valid):
        # Convex AABB into mesh-local frame (conservative re-box).
        mp, mr = w_pos[cm], w_rot[cm]
        ctr = quat.inv_rotate(mr, 0.5 * (ca_min + ca_max) - mp)
        he_w = 0.5 * (ca_max - ca_min)
        m = jnp.abs(quat.to_matrix(quat.conj(mr)))
        he_l = m @ he_w
        lo = ctr - he_l
        hi = ctr + he_l
        start = colliders.shape_params[cm, 0].astype(jnp.int32)
        count = colliders.shape_params[cm, 1].astype(jnp.int32)
        idx = jnp.arange(t_total)
        in_range = (idx >= start) & (idx < start + count) & tri_ok
        per_axis = (
            jnp.minimum(hi[None], tri_max) - jnp.maximum(lo[None], tri_min)
        )
        # Degenerate (planar) meshes overlap with exactly-zero extent on one
        # axis, so the validity test is >= 0 and the ranking score sums the
        # non-degenerate overlaps.
        ok = jnp.all(per_axis >= 0.0, axis=-1)
        score = jnp.sum(jnp.maximum(per_axis, 0.0), axis=-1)
        score = jnp.where(in_range & valid & ok, score, -1e10)
        _, top = jax.lax.top_k(score, k)
        top_valid = jnp.take(score, top) > -1e9
        return top, top_valid

    top_tri, top_valid = jax.vmap(rank_lane)(a_min, a_max, cM, lane_valid)

    # --- flatten to [pm*k] sub-lanes and run the kernels ---
    lane_cA = jnp.repeat(cA, k)
    lane_cM = jnp.repeat(cM, k)
    lane_flip = jnp.repeat(flip, k)
    lane_tri = top_tri.reshape(-1)
    lane_ok = (jnp.repeat(lane_valid, k) & top_valid.reshape(-1))

    mpos, mrot = w_pos[lane_cM], w_rot[lane_cM]
    wv0 = quat.transform_point(mpos, mrot, tv0[lane_tri])
    wv1 = quat.transform_point(mpos, mrot, tv1[lane_tri])
    wv2 = quat.transform_point(mpos, mrot, tv2[lane_tri])
    pA, rA = w_pos[lane_cA], w_rot[lane_cA]
    stA = colliders.shape_type[lane_cA]
    prmA = colliders.shape_params[lane_cA]

    man_ball = jax.vmap(npm.ball_triangle)(pA, rA, prmA, wv0, wv1, wv2)
    man_cap = jax.vmap(npm.capsule_triangle)(pA, rA, prmA, wv0, wv1, wv2)
    man_cvx = jax.vmap(npm.convex_triangle)(pA, rA, stA, prmA, wv0, wv1, wv2)

    is_ball = (stA == ShapeType.BALL)[:, None]
    is_cap = (stA == ShapeType.CAPSULE)[:, None]

    def sel(f_ball, f_cap, f_cvx, nd):
        mask_b = is_ball.reshape(is_ball.shape[:1] + (1,) * (nd - 1))
        mask_c = is_cap.reshape(is_cap.shape[:1] + (1,) * (nd - 1))
        return jnp.where(mask_b, f_ball, jnp.where(mask_c, f_cap, f_cvx))

    normal = sel(man_ball.normal, man_cap.normal, man_cvx.normal, 2)
    point = sel(man_ball.point, man_cap.point, man_cvx.point, 3)
    dist = sel(man_ball.dist, man_cap.dist, man_cvx.dist, 2)
    fid = sel(man_ball.fid, man_cap.fid, man_cvx.fid, 2)
    pvalid = sel(man_ball.valid, man_cap.valid, man_cvx.valid, 2)

    # Kernel normal points convex -> triangle.  Restore collider1 -> collider2.
    normal = jnp.where(lane_flip[:, None], -normal, normal)

    skins = colliders.contact_skin[lane_cA] + colliders.contact_skin[lane_cM]
    dist = dist - skins[:, None]
    pvalid = pvalid & lane_ok[:, None]
    # (Mesh lanes are row-major here; soft-CCD inflation applies to the
    # convex path only — mesh CCD is tracked separately.)
    point_active = pvalid & (dist < prediction)
    touching = lane_ok & jnp.any(point_active, axis=-1)

    lo_c = jnp.where(lane_flip, lane_cM, lane_cA)
    hi_c = jnp.where(lane_flip, lane_cA, lane_cM)
    friction = _combine_material(
        colliders.friction[lo_c], colliders.friction[hi_c],
        colliders.friction_combine[lo_c], colliders.friction_combine[hi_c],
    )
    restitution = _combine_material(
        colliders.restitution[lo_c], colliders.restitution[hi_c],
        colliders.restitution_combine[lo_c], colliders.restitution_combine[hi_c],
    )

    b1 = jnp.where(lane_ok, colliders.parent[lo_c], -1)
    b2 = jnp.where(lane_ok, colliders.parent[hi_c], -1)
    bt1 = jnp.where(b1 >= 0, bodies.body_type[jnp.maximum(b1, 0)], int(BodyType.FIXED))
    bt2 = jnp.where(b2 >= 0, bodies.body_type[jnp.maximum(b2, 0)], int(BodyType.FIXED))
    sd1 = (bt1 == BodyType.DYNAMIC) | (
        (b1 >= 0) & bodies.mb_link[jnp.maximum(b1, 0)])
    sd2 = (bt2 == BodyType.DYNAMIC) | (
        (b2 >= 0) & bodies.mb_link[jnp.maximum(b2, 0)])
    dom1 = jnp.where(sd1, bodies.dominance[jnp.maximum(b1, 0)], 127)
    dom2 = jnp.where(sd2, bodies.dominance[jnp.maximum(b2, 0)], 127)
    rel_dom = jnp.where(b1 >= 0, dom1, 127) - jnp.where(b2 >= 0, dom2, 127)

    sensor = colliders.sensor[lo_c] | colliders.sensor[hi_c]
    sg1 = colliders.solver_groups[lo_c]
    sg2 = colliders.solver_groups[hi_c]
    gm1, gf1 = sg1 >> 16, sg1 & 0xFFFF
    gm2, gf2 = sg2 >> 16, sg2 & 0xFFFF
    solver_ok = ((gm1 & gf2) != 0) & ((gm2 & gf1) != 0)
    solver_pair = (lane_ok & ~sensor & solver_ok & (sd1 | sd2)
                   & jnp.any(point_active, axis=-1))

    pair_key = jnp.where(
        lane_ok,
        lo_c * n_coll + hi_c + (lane_tri + 1) * n_coll * n_coll,
        -1,
    )

    return ManifoldBatch(
        collider1=jnp.where(lane_ok, lo_c, -1),
        collider2=jnp.where(lane_ok, hi_c, -1),
        active_events_or=(
            colliders.active_events[lo_c] | colliders.active_events[hi_c]
        ),
        active_hooks_or=(
            colliders.active_hooks[lo_c] | colliders.active_hooks[hi_c]
        ),
        force_threshold=jnp.minimum(
            colliders.contact_force_event_threshold[lo_c],
            colliders.contact_force_event_threshold[hi_c],
        ),
        dyn1=(b1 >= 0) & sd1,
        dyn2=(b2 >= 0) & sd2,
        body1=b1, body2=b2, pair_key=pair_key,
        # Mesh lanes are few; computed row-major above, transposed to the
        # lane-last ManifoldBatch layout here at the boundary.
        normal=normal.T, point=jnp.transpose(point, (1, 2, 0)),
        dist=dist.T, fid=fid.T,
        point_valid=pvalid.T, point_active=point_active.T,
        valid=lane_ok, unsupported=jnp.int32(0),
        solver_pair=solver_pair, touching=touching,
        sensor=sensor & lane_ok,
        friction=friction, restitution=restitution,
        rel_dominance=rel_dom,
    )


def concat_manifolds(a: ManifoldBatch, b: ManifoldBatch) -> ManifoldBatch:
    """Concatenate two manifold batches along the (LAST) pair-lane axis."""
    merged = jax.tree.map(
        lambda x, y: jnp.concatenate(
            [jnp.atleast_1d(x), jnp.atleast_1d(y)], axis=-1
        )
        if x.ndim > 0 or y.ndim > 0 else x + y,
        a._replace(unsupported=jnp.atleast_1d(a.unsupported)),
        b._replace(unsupported=jnp.atleast_1d(b.unsupported)),
    )
    return merged._replace(unsupported=jnp.sum(merged.unsupported))
