"""Contact constraints: TGS-soft sequential impulses over colored lanes.

Faithful behavioral port of the reference's default 3D contact constraint
(twist friction model): generation mirrors
src/dynamics/solver/contact_constraint/contact_with_twist_friction.rs:48-250,
per-substep update mirrors :251-330, and the solve mirrors
contact_constraint_element.rs (normal part :263-287, tangent 2D-coupled part
:161-203, twist part :31-46).

TPU data layout: every hot array keeps the PAIR LANE axis LAST and the small
component axis first ([3, P] vectors, [4, P] per-point scalars, [4, 3, P]
per-point vectors).  TPU tiles pad the trailing two dims to (8, 128); a
[P, 4, 3] layout would bloat 85x and the solver's color loop re-reads these
arrays every pass (see utils/compaction.py for the same reasoning on
scatters).  Body gathers/scatters run as one-hot matmuls on the MXU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rapier_tpu.math import quat
from rapier_tpu.math.quat import cross_cl, dot_cl, rotate_cl
from rapier_tpu.utils import routing


class SolverBodies(NamedTuple):
    """SoA scratch bodies (reference solver_body.rs:75), component-leading,
    sized N+1: the last slot is a zeroed sentinel absorbing static/dominant
    endpoints."""

    v_lin: jax.Array  # [3, N+1]
    v_ang: jax.Array  # [3, N+1]
    com: jax.Array    # [3, N+1]  pose translation at center of mass
    rot: jax.Array    # [4, N+1]
    im: jax.Array     # [3, N+1]  per-axis effective inverse mass
    ii: jax.Array     # [3, 3, N+1] effective world inverse inertia


class ContactConstraints(NamedTuple):
    """Per-manifold constraint lanes (axis LAST = P) with up to 4 points."""

    b1: jax.Array            # [P] solver body index (sentinel = static)
    b2: jax.Array            # [P]
    valid: jax.Array         # [P] bool
    color: jax.Array         # [P] int32
    dir1: jax.Array          # [3, P] force direction on body1 (= -normal)
    tangent1: jax.Array      # [3, P]
    im1: jax.Array           # [3, P]
    im2: jax.Array           # [3, P]
    limit: jax.Array         # [P] friction coefficient
    point_mask: jax.Array    # [4, P] bool
    # normal parts
    torque_dir1: jax.Array       # [4, 3, P]
    torque_dir2: jax.Array       # [4, 3, P]
    ii_torque_dir1: jax.Array    # [4, 3, P]
    ii_torque_dir2: jax.Array    # [4, 3, P]
    r: jax.Array                 # [4, P] projected mass (1/denom)
    local_p1: jax.Array          # [4, 3, P] anchors in body1 COM frame
    local_p2: jax.Array          # [4, 3, P]
    dist0: jax.Array             # [4, P] distance at generation
    normal_vel_rhs: jax.Array    # [4, P] restitution rhs (wo bias)
    rhs: jax.Array               # [4, P]
    rhs_wo_bias: jax.Array       # [4, P]
    impulse: jax.Array           # [4, P]
    impulse_acc: jax.Array       # [4, P]
    # manifold-level friction (twist model)
    tan_torque_dir1: jax.Array      # [2, 3, P]
    tan_torque_dir2: jax.Array      # [2, 3, P]
    tan_ii_torque_dir1: jax.Array   # [2, 3, P]
    tan_ii_torque_dir2: jax.Array   # [2, 3, P]
    tan_r: jax.Array                # [3, P] (r0, r1, r01 coupling)
    tan_rhs: jax.Array              # [2, P]
    tan_rhs_wo_bias: jax.Array      # [2, P]
    tan_impulse: jax.Array          # [2, P]
    tan_impulse_acc: jax.Array      # [2, P]
    local_fc1: jax.Array            # [3, P] friction center anchor (body1)
    local_fc2: jax.Array            # [3, P]
    twist_ii_dir1: jax.Array        # [3, P]
    twist_ii_dir2: jax.Array        # [3, P]
    twist_r: jax.Array              # [P]
    twist_dists: jax.Array          # [4, P]
    twist_impulse: jax.Array        # [P]
    twist_impulse_acc: jax.Array    # [P]
    cfm_factor: jax.Array           # scalar (set by update)


class RoutePlan(NamedTuple):
    """Index-mode lane<->body routing for large scenes: replaces the [K, N]
    one-hot when it would exceed DENSE_ROUTE_ELEMS (utils/routing.py).
    Gathers become takes; scatter-adds become sorted segment sums.

    seg_pair (optional, on the endpoint-1 plan only): a single plan over the
    CONCATENATED endpoints [idx1; idx2] — when present, solve_color/warmstart
    fuse their four per-pass scatters (v_lin/v_ang x two endpoints) into ONE
    [6, 2K] segment sum, quartering the boundary-gather traffic."""

    idx: jax.Array               # [K] int32 target column per lane
    seg: "routing.SegmentPlan"   # sorted-order plan over idx (may be None
                                 # when seg_pair carries the scatters)
    seg_pair: "routing.SegmentPlan" = None
    # Inverse pair routing [N+1] (conflict-free blocks only): each body is
    # touched by AT MOST one lane-endpoint within a color, so the scatter is
    # one gather of the concatenated-delta columns — no segment sum needed.
    # Built from seg_pair: inv[b] = perm[starts[b]] where the segment is
    # non-empty, else a zero-padded sentinel column.
    inv_pair: jax.Array = None


class PairOneHot(NamedTuple):
    """Fused two-endpoint one-hot routing: [2P, N+1] with endpoint-1 rows
    first.  Gathering/scattering BOTH endpoints rides ONE matmul instead of
    two — matmul COUNT (fixed MXU issue latency at these tiny sizes), not
    FLOPs, is what the solver's color passes pay for.  Built by
    pair_onehots; solve_color/update/warmstart/generate_from dispatch on
    the type.

    `idx12` (Pallas kernels only, single-vreg body tables — N+1 padded to
    exactly 128 lanes): gathers use Mosaic's native per-lane dynamic gather
    (`take_along_axis`, one VPU op per 128-lane output tile) instead of the
    one-hot matmul, freeing the MXU (f32 matmuls cost 3 bf16 passes each).
    Scatters always ride the oh12 matmul (no dynamic-scatter on TPU).
    NEVER set outside a kernel: XLA lowers lane gathers to the serializing
    gather path (~25 ms/step at the 4096-scene bench)."""

    oh12: jax.Array          # [2P, N+1] f32
    p: int                   # lanes per endpoint (static)
    idx12: jax.Array = None  # [2P] int32, values < 128 (kernel gather mode)


class FoldGather(NamedTuple):
    """Scene-folded kernel routing (pallas_sweep._kernel_fold_gather):
    S scenes ride the SUBLANE axis, so per-scene body tables are [d, S, 128]
    (one vreg per component row) and gathers are per-row-independent
    tpu.dynamic_gather ops covering 8 scenes each.  Scatters:

    - per-color passes: INVERSE gather via inv12[color] [S, 128] — within a
      conflict-free color each dynamic body receives from at most one lane
      endpoint, so the scatter is a gather of the delta columns (sentinel
      2P = no write).
    - warmstart / the static overflow-color pass (lanes the Luby loop could
      not color; may self-conflict): sum-scatter via the batched one-hot
    oh12_b [S, 2P, 128] (Mosaic unrolls the batched dot — once per
    substep / sweep, not per color).
    """

    idx1: jax.Array     # [S, P] int32 endpoint-1 body (sentinel N)
    idx2: jax.Array     # [S, P]
    inv12: jax.Array    # [MC, S, 128] int32 delta-column per (color, body);
                        # sentinel 2P.  None on the overflow-pass variant.
    oh12_b: jax.Array   # [S, 2P, 128] f32 batched scatter one-hot
    p: int              # lanes per endpoint (static)


def _fold_lane_gather(table, idx):
    """Folded gather: table [d, S, 128] by idx [S, P] -> [d, S, P].
    One per-row-independent tpu.dynamic_gather per (component, P-tile)."""
    d = table.shape[0]
    p = idx.shape[-1]
    outs = []
    for c in range(d):
        tiles = []
        for t in range(p // 128):
            it = idx[:, t * 128:(t + 1) * 128] + 0
            tiles.append(jnp.take_along_axis(table[c] + 0.0, it, axis=1))
        outs.append(jnp.concatenate(tiles, axis=-1) if len(tiles) > 1
                    else tiles[0])
    return jnp.stack(outs)


def _fold_scatter_sum(table, fg: "FoldGather", vals1, vals2):
    """Sum-scatter both endpoints' deltas [d, S, P] into table [d, S, 128]
    via the batched one-hot (Mosaic unrolls the dot over S)."""
    d = vals1.shape[0]
    vals = jnp.concatenate([vals1, vals2], axis=-1)       # [d, S, 2P]
    vs = jnp.stack([vals[i] + 0.0 for i in range(d)], axis=1)  # [S, d, 2P]
    upd = jax.lax.dot_general(
        vs, fg.oh12_b,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=table.dtype,
    )                                                     # [S, d, 128]
    return table + jnp.stack([upd[:, i, :] + 0.0 for i in range(d)])


def _fold_scatter_inverse(table, fg: "FoldGather", color_id, vals1, vals2):
    """Conflict-free per-color scatter: one inverse gather of the delta
    columns per (component, source tile).  inv12[color] holds, per body,
    the delta column in [0, 2P) (endpoint-1 columns first) or 2P."""
    d = vals1.shape[0]
    p = fg.p
    delta12 = jnp.concatenate([vals1, vals2], axis=-1)    # [d, S, 2P]
    # Row select by traced color id, unrolled over the static color count
    # (Mosaic has no value-level dynamic_slice; MC selects on [S, 128] are
    # cheap next to the per-color solve).
    mc = fg.inv12.shape[0]
    inv_c = fg.inv12[0] + 0
    for ci in range(1, mc):
        inv_c = jnp.where(color_id == ci, fg.inv12[ci], inv_c)
    rows = []
    for c in range(d):
        acc = None
        for t in range(2 * p // 128):
            tile = delta12[c, :, t * 128:(t + 1) * 128] + 0.0
            idx_t = jnp.clip(inv_c - t * 128, 0, 127)
            sel = (inv_c >= t * 128) & (inv_c < (t + 1) * 128)
            g = jnp.take_along_axis(tile, idx_t, axis=1)  # [S, 128]
            contrib = jnp.where(sel, g, 0.0)
            acc = contrib if acc is None else acc + contrib
        rows.append(acc)
    return table + jnp.stack(rows)


def _lane_gather(table, idx2):
    """Kernel-only gather of a single-vreg table: table [d, 128] indexed by
    idx2 [2, P] (P a multiple of 128) -> [d, 2P] (endpoint-1 columns first).
    One tpu.dynamic_gather per output tile (Mosaic limit: one source vreg
    along the gather dim); idx2 stays rank-2 throughout (Mosaic rejects
    rank-1 reshapes/concats)."""
    d = table.shape[0]
    outs = []
    for e in range(idx2.shape[0]):
        for t in range(idx2.shape[1] // 128):
            bidx = jnp.broadcast_to(
                idx2[e:e + 1, t * 128:(t + 1) * 128] + 0, (d, 128)
            )
            outs.append(jnp.take_along_axis(table, bidx, axis=1))
    return jnp.concatenate(outs, axis=-1)


def _onehot(idx, n):
    """Lane routing: [K] int -> [K, n] f32 one-hot matrix, or scene-folded
    [S, P] int -> [S, P, n].  Gathers/scatter-adds become matmuls on this:
    TPU computed-index scatters serialize, the MXU doesn't.  broadcasted_iota
    (not arange) so this also lowers inside Pallas kernels.  Above the
    dense-routing limit returns a RoutePlan instead (large single scenes;
    _gather_cl/_scatter_add_cl dispatch on the type)."""
    if idx.ndim == 1:
        if idx.shape[0] * n > routing.DENSE_ROUTE_ELEMS:
            return RoutePlan(idx, routing.make_segment_plan(idx, n))
        ids = jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], n), 1)
        return (idx[:, None] == ids).astype(jnp.float32)
    s, p = idx.shape
    ids = jax.lax.broadcasted_iota(jnp.int32, (s, p, n), 2)
    return (idx[:, :, None] == ids).astype(jnp.float32)


def _gather_cl(table, oh):
    """Gather table rows per lane via one-hot.

    Plain: table [d, N] @ oh [P, N] -> [d, P].
    Index mode (RoutePlan, large scenes): one take per field.
    Scene-folded (S scenes per Pallas kernel instance, pallas_sweep.py):
    table [S, d, N], oh [S, P, N] -> [d, S, P] via a leading-batch
    dot_general (the only batched-matmul form Mosaic accepts), unpacked to
    component-leading with static row slices."""
    if isinstance(oh, RoutePlan):
        return jnp.take(table, oh.idx, axis=-1)
    if oh.ndim == 2:
        return table @ oh.T
    g = jax.lax.dot_general(
        table, oh,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=table.dtype,
    )  # [S, d, P]
    return jnp.stack([g[:, i, :] + 0.0 for i in range(g.shape[1])], axis=0)


def _scatter_add_cl(table, oh, values):
    """table += values routed by one-hot.

    Plain: table [d, N] += values [d, P] @ oh [P, N].
    Index mode (RoutePlan): sorted segment sum (cumsum + boundary diff — no
    XLA scatter; see utils/routing.py).
    Scene-folded: table [S, d, N] += batched-dot(values [d, S, P] repacked to
    [S, d, P], oh [S, P, N])."""
    if isinstance(oh, RoutePlan):
        return table + routing.segment_sum(values, oh.seg)
    if oh.ndim == 2:
        return table + values @ oh
    vs = jnp.stack([values[i] + 0.0 for i in range(values.shape[0])], axis=1)
    upd = jax.lax.dot_general(
        vs, oh,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=table.dtype,
    )  # [S, d, N]
    return table + upd


def compute_tangent_directions(dir1, linvel1, linvel2):
    """Reference compute_tangent_contact_directions (contact_constraint/mod.rs):
    tangent along relative linear velocity projected on the contact plane,
    orthonormal fallback below 1e-4.  CL layout: [3, P].  All reductions are
    explicit 3-term sums (Mosaic-safe, see pallas_sweep.py)."""
    rel = linvel1 - linvel2
    tan = rel - dir1 * dot_cl(dir1, rel)[None]
    norm = jnp.sqrt(dot_cl(tan, tan))[None]
    tan_n = tan / jnp.maximum(norm, 1e-12)
    # cross(dir1, ex) = (0, z, -y); cross(dir1, ey) = (-z, 0, x).
    zero = jnp.zeros_like(dir1[0])
    a = jnp.stack([zero, dir1[2], -dir1[1]])
    b = jnp.stack([-dir1[2], zero, dir1[0]])
    a_len = jnp.sqrt(dot_cl(a, a))[None]
    fb = jnp.where(a_len > 1e-6, a, b)
    fb = fb / jnp.maximum(jnp.sqrt(dot_cl(fb, fb))[None], 1e-12)
    return jnp.where(norm < 1e-4, fb, tan_n)


def generate(man, sb: SolverBodies, prev_impulse, color, n_bodies: int):
    """Build constraint lanes from a ManifoldBatch (lane-last layout
    throughout; no transposes needed).

    prev_impulse: [4, P] total normal impulse of the matched contact from the
    previous step (0 for new contacts) — drives is_bouncy
    (reference contact_pair.rs:576-585).
    """
    sent = n_bodies
    b1 = jnp.where((man.body1 >= 0) & (man.rel_dominance <= 0), man.body1, sent)
    b2 = jnp.where((man.body2 >= 0) & (man.rel_dominance >= 0), man.body2, sent)
    return generate_from(
        b1, b2, man.solver_pair, color, man.normal, man.point,
        man.point_active, man.dist, man.friction, man.restitution,
        sb, prev_impulse, n_bodies,
    )


def generate_from(b1, b2, valid, color, normal, point, point_active, dist,
                  friction, restitution, sb: SolverBodies, prev_impulse,
                  n_bodies: int, oh1=None, oh2=None):
    """Core of `generate`, taking resolved solver-body endpoints — callable
    from inside the Pallas sweep kernel (pallas_sweep.py) where the manifold
    arrives as a packed row matrix.  Mosaic-safe: every small-axis reduction
    is an explicit unrolled sum.

    Shape-polymorphic over the scene-folded layout: lane arrays may be
    [S, P] instead of [P] (then vectors are [3, S, P], solver-body tables
    [S, d, N+1]); all elementwise math broadcasts unchanged."""
    lane_shape = b1.shape

    if oh1 is None and b1.ndim == 1 and (
        b1.shape[0] * 2 * (n_bodies + 1) <= routing.DENSE_ROUTE_ELEMS
    ):
        oh1, oh2 = make_pair_onehot(b1, b2, n_bodies + 1), None
    if oh1 is None:
        oh1 = _onehot(b1, n_bodies + 1)
    if oh2 is None and not isinstance(oh1, (PairOneHot, FoldGather)):
        oh2 = _onehot(b2, n_bodies + 1)
    ii_flat = (
        sb.ii.reshape(9, sb.ii.shape[-1])
        if sb.ii.ndim == 3 and sb.ii.shape[0] == 3 and sb.ii.shape[1] == 3
        else sb.ii
    )
    if isinstance(oh1, (PairOneHot, FoldGather)):
        # ONE fused [25, N+1] row table x [N+1, 2P] matmul for every
        # per-endpoint quantity (matmul count, not FLOPs, dominates the
        # tiny-matrix routing — see PairOneHot).
        big = jnp.concatenate(
            [sb.v_lin, sb.v_ang, sb.com, sb.rot, sb.im, ii_flat], axis=0
        )                                               # [25, N+1]
        G1, G2 = _gather2(big, oh1, oh2)
        # `+ 0.0` launders the sublane-range slices (Mosaic layout inference
        # rejects sliced views flowing into loop-carried values).
        v1l, w1, com1, rot1, im1, ii1_r = (
            G1[0:3] + 0.0, G1[3:6] + 0.0, G1[6:9] + 0.0, G1[9:13] + 0.0,
            G1[13:16] + 0.0, G1[16:25] + 0.0)
        v2l, w2, com2, rot2, im2, ii2_r = (
            G2[0:3] + 0.0, G2[3:6] + 0.0, G2[6:9] + 0.0, G2[9:13] + 0.0,
            G2[13:16] + 0.0, G2[16:25] + 0.0)
    else:
        v1l = _gather_cl(sb.v_lin, oh1)   # [3, P]
        w1 = _gather_cl(sb.v_ang, oh1)
        v2l = _gather_cl(sb.v_lin, oh2)
        w2 = _gather_cl(sb.v_ang, oh2)
        com1 = _gather_cl(sb.com, oh1)
        com2 = _gather_cl(sb.com, oh2)
        rot1 = _gather_cl(sb.rot, oh1)
        rot2 = _gather_cl(sb.rot, oh2)
        im1 = _gather_cl(sb.im, oh1)
        im2 = _gather_cl(sb.im, oh2)
        # Per-lane world inverse inertia as 9 gathered component rows
        # [3][3] of [P] (explicit unroll: Mosaic-safe, identical XLA code).
        # Plain layout stores ii [3,3,N+1]; the folded kernel passes
        # [S, 9, N+1].
        ii1_r = _gather_cl(ii_flat, oh1)               # [9, P]
        ii2_r = _gather_cl(ii_flat, oh2)
    ii1 = [[ii1_r[3 * a + b] for b in range(3)] for a in range(3)]
    ii2 = [[ii2_r[3 * a + b] for b in range(3)] for a in range(3)]

    def ii_mul(ii, v):
        """[3][3] of [P] x [3, P] -> [3, P]."""
        return jnp.stack([
            ii[a][0] * v[0] + ii[a][1] * v[1] + ii[a][2] * v[2]
            for a in range(3)
        ])

    dir1 = -normal                # [3, P]
    tangent1 = compute_tangent_directions(dir1, v1l, v2l)
    tangent2 = cross_cl(dir1, tangent1)

    pts = point                                    # [4, 3, P]
    pmask = point_active                       # [4, P]
    fmask = pmask.astype(jnp.float32)
    npts = fmask[0] + fmask[1] + fmask[2] + fmask[3]
    inv_np = 1.0 / jnp.maximum(npts, 1.0)

    # Per-point quantities, unrolled over the (at most) 4 points.
    td1_k, td2_k, iitd1_k, iitd2_k = [], [], [], []
    denom_k, proj_k, lp1_k, lp2_k = [], [], [], []
    imsum = im1 + im2
    dir_im = dot_cl(dir1, imsum * dir1)
    for k in range(4):
        dp1 = pts[k] - com1
        dp2 = pts[k] - com2
        vel1 = v1l + cross_cl(w1, dp1)
        vel2 = v2l + cross_cl(w2, dp2)
        td1 = cross_cl(dp1, dir1)
        td2 = cross_cl(dp2, -dir1)
        iitd1 = ii_mul(ii1, td1)
        iitd2 = ii_mul(ii2, td2)
        denom_k.append(dir_im + dot_cl(iitd1, td1) + dot_cl(iitd2, td2))
        proj_k.append(dot_cl(vel1 - vel2, dir1))
        lp1_k.append(quat.inv_rotate_cl(rot1, dp1))
        lp2_k.append(quat.inv_rotate_cl(rot2, dp2))
        td1_k.append(td1)
        td2_k.append(td2)
        iitd1_k.append(iitd1)
        iitd2_k.append(iitd2)

    td1 = jnp.stack(td1_k)                          # [4, 3, P]
    td2 = jnp.stack(td2_k)
    iitd1 = jnp.stack(iitd1_k)
    iitd2 = jnp.stack(iitd2_k)
    r = 1.0 / jnp.maximum(jnp.stack(denom_k), 1e-12)
    proj_vel = jnp.stack(proj_k)                    # [4, P]
    local_p1 = jnp.stack(lp1_k)
    local_p2 = jnp.stack(lp2_k)

    restitution_row = restitution[None]            # [1, P]
    is_new = prev_impulse == 0.0                   # [4, P]
    # f32 select (a where with bool BRANCHES hits a Mosaic bitwidth error).
    is_bouncy = jnp.where(
        is_new,
        (restitution_row > 0.0).astype(jnp.float32),
        (restitution_row >= 1.0).astype(jnp.float32),
    )
    normal_vel_rhs = is_bouncy * restitution_row * proj_vel

    # Friction center (twist model).
    fc = sum(pts[k] * fmask[k][None] for k in range(4)) * inv_np[None]  # [3,P]
    local_fc1 = quat.inv_rotate_cl(rot1, fc - com1)
    local_fc2 = quat.inv_rotate_cl(rot2, fc - com2)
    twist_dists = jnp.stack([
        jnp.where(
            pmask[k],
            jnp.sqrt(jnp.maximum(dot_cl(fc - pts[k], fc - pts[k]), 0.0)),
            0.0,
        )
        for k in range(4)
    ])

    dfp1 = fc - com1
    dfp2 = fc - com2
    ttd1_j, ttd2_j, tiitd1_j, tiitd2_j, tr_j = [], [], [], [], []
    for tan in (tangent1, tangent2):
        ttd1 = cross_cl(dfp1, tan)
        ttd2 = cross_cl(dfp2, -tan)
        tiitd1 = ii_mul(ii1, ttd1)
        tiitd2 = ii_mul(ii2, ttd2)
        tr_j.append(
            dot_cl(tan, imsum * tan)
            + dot_cl(tiitd1, ttd1) + dot_cl(tiitd2, ttd2)
        )
        ttd1_j.append(ttd1)
        ttd2_j.append(ttd2)
        tiitd1_j.append(tiitd1)
        tiitd2_j.append(tiitd2)
    ttd1 = jnp.stack(ttd1_j)                        # [2, 3, P]
    ttd2 = jnp.stack(ttd2_j)
    tiitd1 = jnp.stack(tiitd1_j)
    tiitd2 = jnp.stack(tiitd2_j)
    tr_coupling = 2.0 * (
        dot_cl(tiitd1_j[0], ttd1_j[1]) + dot_cl(tiitd2_j[0], ttd2_j[1])
    )
    tan_r = jnp.stack([tr_j[0], tr_j[1], tr_coupling])   # [3, P]

    twist_ii1 = ii_mul(ii1, dir1)
    twist_ii2 = ii_mul(ii2, -dir1)
    twist_r = 1.0 / jnp.maximum(
        dot_cl(twist_ii1, dir1) + dot_cl(twist_ii2, -dir1), 1e-12
    )

    z4 = jnp.zeros((4,) + lane_shape)
    z2 = jnp.zeros((2,) + lane_shape)
    return ContactConstraints(
        b1=b1, b2=b2, valid=valid, color=color,
        dir1=dir1, tangent1=tangent1, im1=im1, im2=im2,
        limit=friction, point_mask=pmask,
        torque_dir1=td1, torque_dir2=td2,
        ii_torque_dir1=iitd1, ii_torque_dir2=iitd2,
        r=r, local_p1=local_p1, local_p2=local_p2,
        dist0=dist, normal_vel_rhs=normal_vel_rhs,
        rhs=z4, rhs_wo_bias=z4,
        impulse=z4,  # warmstart impulses folded in by the caller
        impulse_acc=z4,
        tan_torque_dir1=ttd1, tan_torque_dir2=ttd2,
        tan_ii_torque_dir1=tiitd1, tan_ii_torque_dir2=tiitd2,
        tan_r=tan_r, tan_rhs=z2, tan_rhs_wo_bias=z2,
        tan_impulse=z2, tan_impulse_acc=z2,
        local_fc1=local_fc1, local_fc2=local_fc2,
        twist_ii_dir1=twist_ii1, twist_ii_dir2=twist_ii2,
        twist_r=twist_r, twist_dists=twist_dists,
        twist_impulse=jnp.zeros(lane_shape),
        twist_impulse_acc=jnp.zeros(lane_shape),
        cfm_factor=jnp.float32(1.0),
    )


def pair_onehots(c: ContactConstraints, n1: int):
    """The one-hot gather/scatter routing for both endpoints.

    Computed ONCE per step and threaded through every substep/color pass —
    rebuilding them inside the sweep loops costs 2x[P,N+1] equality+cast per
    pass (dozens of passes per step), pure HBM traffic.

    Dense sizes return ONE fused PairOneHot ([2P, N+1]); large scenes fall
    back to two RoutePlans."""
    if c.b1.ndim == 1 and c.b1.shape[0] * 2 * n1 <= routing.DENSE_ROUTE_ELEMS:
        return make_pair_onehot(c.b1, c.b2, n1), None
    return _onehot(c.b1, n1), _onehot(c.b2, n1)


def make_pair_onehot(b1, b2, n1: int) -> PairOneHot:
    """Fused [2P, N+1] endpoint routing (see PairOneHot)."""
    idx12 = jnp.concatenate([b1, b2])
    ids = jax.lax.broadcasted_iota(jnp.int32, (idx12.shape[0], n1), 1)
    return PairOneHot((idx12[:, None] == ids).astype(jnp.float32), b1.shape[0])


def _gather2(table, oh1, oh2):
    """Gather table rows [d, N+1] for both endpoints -> ([d, P], [d, P])."""
    if isinstance(oh1, FoldGather):
        return (_fold_lane_gather(table, oh1.idx1),
                _fold_lane_gather(table, oh1.idx2))
    if isinstance(oh1, PairOneHot):
        if oh1.idx12 is not None:
            g = _lane_gather(table, oh1.idx12)
        else:
            g = table @ oh1.oh12.T
        return g[..., :oh1.p] + 0.0, g[..., oh1.p:] + 0.0
    return _gather_cl(table, oh1), _gather_cl(table, oh2)


def _scatter_add2(table, oh1, oh2, v1, v2):
    """table += route(v1 via oh1) + route(v2 via oh2), fused when possible."""
    if isinstance(oh1, PairOneHot):
        return table + jnp.concatenate([v1, v2], axis=-1) @ oh1.oh12
    return _scatter_add_cl(_scatter_add_cl(table, oh1, v1), oh2, v2)


def update(c: ContactConstraints, sb: SolverBodies, oh1, oh2, *, cfm_factor,
           inv_dt, allowed_lin_err, erp_inv_dt, max_corrective_velocity,
           warmstart_coeff) -> ContactConstraints:
    """Per-substep soft-constraint rhs recompute from current solver poses
    (reference contact_with_twist_friction.rs:251-330).  Rate arguments are
    for the SUBSTEP dt."""
    if isinstance(oh1, (PairOneHot, FoldGather)):
        pose = jnp.concatenate([sb.com, sb.rot], axis=0)   # [7, N+1]
        P1, P2 = _gather2(pose, oh1, oh2)
        com1, rot1 = P1[0:3] + 0.0, P1[3:7] + 0.0
        com2, rot2 = P2[0:3] + 0.0, P2[3:7] + 0.0
    else:
        com1 = _gather_cl(sb.com, oh1)
        com2 = _gather_cl(sb.com, oh2)
        rot1 = _gather_cl(sb.rot, oh1)
        rot2 = _gather_cl(sb.rot, oh2)

    # Per-point unrolled (k=0..3): keeps every reduction an explicit 3-term
    # dot over fresh [3, P] values — Mosaic (Pallas TPU) rejects sublane-axis
    # jnp.sum over sliced views (see pallas_sweep.py).
    dist = c.dist0 + jnp.stack([
        dot_cl(
            (com1 + rotate_cl(rot1, c.local_p1[k]))
            - (com2 + rotate_cl(rot2, c.local_p2[k])),
            c.dir1,
        )
        for k in range(4)
    ])                                                           # [4, P]

    rhs_wo_bias = c.normal_vel_rhs + jnp.maximum(dist, 0.0) * inv_dt
    rhs_bias = jnp.clip(
        (dist + allowed_lin_err) * erp_inv_dt, -max_corrective_velocity, 0.0
    )
    rhs = rhs_wo_bias + rhs_bias

    impulse_acc = c.impulse_acc + c.impulse
    impulse = c.impulse * warmstart_coeff

    fc1 = com1 + rotate_cl(rot1, c.local_fc1)
    fc2 = com2 + rotate_cl(rot2, c.local_fc2)
    tangent2 = cross_cl(c.dir1, c.tangent1)
    dfc = fc1 - fc2
    bias_t = jnp.stack(
        [dot_cl(dfc, c.tangent1), dot_cl(dfc, tangent2)]
    ) * inv_dt
    tan_rhs = c.tan_rhs_wo_bias + bias_t
    tan_impulse_acc = c.tan_impulse_acc + c.tan_impulse
    tan_impulse = c.tan_impulse * warmstart_coeff
    twist_impulse_acc = c.twist_impulse_acc + c.twist_impulse
    twist_impulse = c.twist_impulse * warmstart_coeff

    return c._replace(
        rhs=rhs, rhs_wo_bias=rhs_wo_bias,
        impulse=impulse, impulse_acc=impulse_acc,
        tan_rhs=tan_rhs, tan_impulse=tan_impulse,
        tan_impulse_acc=tan_impulse_acc,
        twist_impulse=twist_impulse, twist_impulse_acc=twist_impulse_acc,
        cfm_factor=jnp.asarray(cfm_factor, jnp.float32),
    )


def warmstart(c: ContactConstraints, sb: SolverBodies, oh1, oh2) -> SolverBodies:
    """Apply cached impulses to body velocities.  Pure accumulation, so one
    matmul-scatter over ALL lanes is exact (no coloring needed)."""
    act = c.valid[None, :] & c.point_mask             # [4, P]
    imp = c.impulse * act.astype(jnp.float32)
    imp_sum = imp[0] + imp[1] + imp[2] + imp[3]       # [P]

    dv1 = c.dir1 * c.im1 * imp_sum[None]
    dv2 = -c.dir1 * c.im2 * imp_sum[None]
    # Unrolled point-axis sums (Mosaic reduction-layout restriction).
    dw1 = sum(c.ii_torque_dir1[k] * imp[k][None] for k in range(4))
    dw2 = sum(c.ii_torque_dir2[k] * imp[k][None] for k in range(4))

    vmask = c.valid.astype(jnp.float32)
    t2 = cross_cl(c.dir1, c.tangent1)
    ti = c.tan_impulse * vmask[None]
    tan_lin = c.tangent1 * ti[0][None] + t2 * ti[1][None]
    dv1 = dv1 + tan_lin * c.im1
    dv2 = dv2 - tan_lin * c.im2
    dw1 = dw1 + c.tan_ii_torque_dir1[0] * ti[0][None] + c.tan_ii_torque_dir1[1] * ti[1][None]
    dw2 = dw2 + c.tan_ii_torque_dir2[0] * ti[0][None] + c.tan_ii_torque_dir2[1] * ti[1][None]
    wi = c.twist_impulse * vmask
    dw1 = dw1 + c.twist_ii_dir1 * wi[None]
    dw2 = dw2 + c.twist_ii_dir2 * wi[None]

    if isinstance(oh1, RoutePlan) and oh1.seg_pair is not None:
        vals = jnp.concatenate([
            jnp.concatenate([dv1, dw1], axis=0),
            jnp.concatenate([dv2, dw2], axis=0),
        ], axis=-1)                                    # [6, 2P]
        upd = routing.segment_sum(vals, oh1.seg_pair)  # [6, N+1]
        return sb._replace(v_lin=sb.v_lin + upd[0:3],
                           v_ang=sb.v_ang + upd[3:6])
    if isinstance(oh1, FoldGather):
        # Impulses from ALL lanes at once (colors conflict): sum-scatter.
        vw = _fold_scatter_sum(
            jnp.concatenate([sb.v_lin, sb.v_ang], axis=0), oh1,
            jnp.concatenate([dv1, dw1], axis=0),
            jnp.concatenate([dv2, dw2], axis=0))
        return sb._replace(v_lin=vw[0:3] + 0.0, v_ang=vw[3:6] + 0.0)
    if isinstance(oh1, PairOneHot):
        vals = jnp.concatenate([
            jnp.concatenate([dv1, dw1], axis=0),
            jnp.concatenate([dv2, dw2], axis=0),
        ], axis=-1)                                    # [6, 2P]
        upd = vals @ oh1.oh12                          # [6, N+1], one matmul
        return sb._replace(v_lin=sb.v_lin + upd[0:3] + 0.0,
                           v_ang=sb.v_ang + upd[3:6] + 0.0)
    v_lin = _scatter_add_cl(_scatter_add_cl(sb.v_lin, oh1, dv1), oh2, dv2)
    v_ang = _scatter_add_cl(_scatter_add_cl(sb.v_ang, oh1, dw1), oh2, dw2)
    return sb._replace(v_lin=v_lin, v_ang=v_ang)


def solve_color(c: ContactConstraints, sb: SolverBodies, color_id, oh1, oh2, *,
                use_bias: bool, block_2x2: bool = False):
    """One Gauss-Seidel pass over the lanes of one color.

    Mirrors ContactWithTwistFriction::solve
    (contact_with_twist_friction.rs:395-460): normal points sequentially, then
    the coupled tangent pair, then twist.  Lanes of one color share no dynamic
    body, so the final matmul scatter-add is conflict-free (true Gauss-Seidel).

    block_2x2: solve manifold points (0, 1) as one coupled 2x2 MLCP — the
    reference's 2D block solver (BLOCK_SOLVER_ENABLED,
    integration_parameters.rs:9; case enumeration
    contact_constraint_element.rs:290-319 solve_mlcp_two_constraints).
    Enabled by the 2D facade; 2D manifolds carry at most two points.
    """
    mask = c.valid & (c.color == color_id)
    fmask = mask.astype(jnp.float32)

    if isinstance(oh1, (PairOneHot, FoldGather)):
        vw = jnp.concatenate([sb.v_lin, sb.v_ang], axis=0)  # [6, N+1]
        V1, V2 = _gather2(vw, oh1, oh2)
        v1, w1 = V1[0:3] + 0.0, V1[3:6] + 0.0
        v2, w2 = V2[0:3] + 0.0, V2[3:6] + 0.0
    else:
        v1 = _gather_cl(sb.v_lin, oh1)
        w1 = _gather_cl(sb.v_ang, oh1)
        v2 = _gather_cl(sb.v_lin, oh2)
        w2 = _gather_cl(sb.v_ang, oh2)
    v1_0, w1_0, v2_0, w2_0 = v1, w1, v2, w2

    cfm = c.cfm_factor if use_bias else 1.0
    rhs = c.rhs if use_bias else c.rhs_wo_bias

    # Normal parts, sequential over the (at most) 4 points.  Rows are kept
    # unstacked through the loop: a static-index `.at[k].add` still lowers to
    # a scatter-add primitive, which Mosaic (the Pallas TPU compiler) rejects
    # inside the VMEM-resident sweep kernel (pallas_sweep.py).
    imp_rows = [c.impulse[k] for k in range(4)]
    start_k = 0
    if block_2x2:
        start_k = 2
        pair_ok = mask & c.point_mask[0] & c.point_mask[1]

        # Sequential candidates for points 0 and 1 on the NON-paired lanes.
        v1s, w1s, v2s, w2s = v1, w1, v2, w2
        imp_s = [imp_rows[0], imp_rows[1]]
        for k in range(2):
            pm = (mask & c.point_mask[k] & ~pair_ok).astype(jnp.float32)
            dvel = (
                dot_cl(c.dir1, v1s) + dot_cl(c.torque_dir1[k], w1s)
                - dot_cl(c.dir1, v2s) + dot_cl(c.torque_dir2[k], w2s)
                + rhs[k]
            )
            new_imp = cfm * jnp.maximum(imp_s[k] - c.r[k] * dvel, 0.0)
            dl = (new_imp - imp_s[k]) * pm
            imp_s[k] = imp_s[k] + dl
            v1s = v1s + c.dir1 * c.im1 * dl[None]
            w1s = w1s + c.ii_torque_dir1[k] * dl[None]
            v2s = v2s - c.dir1 * c.im2 * dl[None]
            w2s = w2s + c.ii_torque_dir2[k] * dl[None]

        # Block candidate: coupled (0, 1) MLCP on the paired lanes.
        dvel_lin = dot_cl(c.dir1, v1) - dot_cl(c.dir1, v2)
        dva = (dvel_lin + dot_cl(c.torque_dir1[0], w1)
               + dot_cl(c.torque_dir2[0], w2) + rhs[0])
        dvb = (dvel_lin + dot_cl(c.torque_dir1[1], w1)
               + dot_cl(c.torque_dir2[1], w2) + rhs[1])
        safe_r0 = jnp.maximum(c.r[0], 1e-12)
        safe_r1 = jnp.maximum(c.r[1], 1e-12)
        m11 = 1.0 / safe_r0
        m22 = 1.0 / safe_r1
        m12 = (
            dot_cl(c.dir1 * (c.im1 + c.im2), c.dir1)
            + dot_cl(c.ii_torque_dir1[0], c.torque_dir1[1])
            + dot_cl(c.ii_torque_dir2[0], c.torque_dir2[1])
        )
        det = m11 * m22 - m12 * m12
        invertible = det > 0.0
        safe_det = jnp.where(invertible, det, 1.0)
        # Singular pair: fall back to solving point 0 alone (reference sets
        # the redundant row's matrix elements to zero).
        inv11 = jnp.where(invertible, m22 / safe_det, c.r[0])
        inv22 = jnp.where(invertible, m11 / safe_det, 0.0)
        inv12 = jnp.where(invertible, -m12 / safe_det, 0.0)
        k12 = jnp.where(invertible, m12, 0.0)

        prev0, prev1 = imp_rows[0], imp_rows[1]
        n0x = prev0 - (inv11 * dva + inv12 * dvb)
        n0y = prev1 - (inv12 * dva + inv22 * dvb)
        n1x = prev0 - c.r[0] * dva
        n2y = prev1 - c.r[1] * dvb
        keep0 = (n0x >= 0.0) & (n0y >= 0.0)
        keep1 = (n1x >= 0.0) & (dvb + k12 * n1x >= 0.0)
        keep2 = (n2y >= 0.0) & (dva + k12 * n2y >= 0.0)
        keep3 = (dva >= 0.0) & (dvb >= 0.0)
        selx = jnp.where(keep0, cfm * n0x,
               jnp.where(keep1, cfm * n1x,
               jnp.where(keep2, 0.0,
               jnp.where(keep3, 0.0, prev0))))
        sely = jnp.where(keep0, cfm * n0y,
               jnp.where(keep1, 0.0,
               jnp.where(keep2, cfm * n2y,
               jnp.where(keep3, 0.0, prev1))))
        fpair = pair_ok.astype(jnp.float32)
        dl0 = (selx - prev0) * fpair
        dl1 = (sely - prev1) * fpair
        v1b = v1 + c.dir1 * c.im1 * (dl0 + dl1)[None]
        w1b = w1 + c.ii_torque_dir1[0] * dl0[None] + c.ii_torque_dir1[1] * dl1[None]
        v2b = v2 - c.dir1 * c.im2 * (dl0 + dl1)[None]
        w2b = w2 + c.ii_torque_dir2[0] * dl0[None] + c.ii_torque_dir2[1] * dl1[None]

        sel_l = fpair[None]
        v1 = v1b * sel_l + v1s * (1.0 - sel_l)
        w1 = w1b * sel_l + w1s * (1.0 - sel_l)
        v2 = v2b * sel_l + v2s * (1.0 - sel_l)
        w2 = w2b * sel_l + w2s * (1.0 - sel_l)
        imp_rows[0] = jnp.where(pair_ok, prev0 + dl0, imp_s[0])
        imp_rows[1] = jnp.where(pair_ok, prev1 + dl1, imp_s[1])

    for k in range(start_k, 4):
        pm = (mask & c.point_mask[k]).astype(jnp.float32)
        dvel = (
            dot_cl(c.dir1, v1) + dot_cl(c.torque_dir1[k], w1)
            - dot_cl(c.dir1, v2) + dot_cl(c.torque_dir2[k], w2)
            + rhs[k]
        )
        new_imp = cfm * jnp.maximum(imp_rows[k] - c.r[k] * dvel, 0.0)
        dl = (new_imp - imp_rows[k]) * pm
        imp_rows[k] = imp_rows[k] + dl
        v1 = v1 + c.dir1 * c.im1 * dl[None]
        w1 = w1 + c.ii_torque_dir1[k] * dl[None]
        v2 = v2 - c.dir1 * c.im2 * dl[None]
        w2 = w2 + c.ii_torque_dir2[k] * dl[None]
    impulses = jnp.stack(imp_rows)

    # Friction limits scale with the solved normal impulses
    # (contact_with_twist_friction.rs:430-445).  Point-axis sums unrolled
    # (Mosaic reduction-layout restriction, see pallas_sweep.py).
    act = c.point_mask.astype(jnp.float32)
    act_rows = [act[k] * imp_rows[k] for k in range(4)]
    tangent_limit = (act_rows[0] + act_rows[1] + act_rows[2] + act_rows[3]) * c.limit
    twist_limit = sum(act_rows[k] * c.twist_dists[k] for k in range(4)) * c.limit

    # Coupled 2D tangent solve (contact_constraint_element.rs:161-203).
    t2 = cross_cl(c.dir1, c.tangent1)
    tan_rhs = c.tan_rhs if use_bias else c.tan_rhs_wo_bias
    d0 = (
        dot_cl(c.tangent1, v1) + dot_cl(c.tan_torque_dir1[0], w1)
        - dot_cl(c.tangent1, v2) + dot_cl(c.tan_torque_dir2[0], w2)
        + tan_rhs[0]
    )
    d1 = (
        dot_cl(t2, v1) + dot_cl(c.tan_torque_dir1[1], w1)
        - dot_cl(t2, v2) + dot_cl(c.tan_torque_dir2[1], w2)
        + tan_rhs[1]
    )
    d00, d11, d01 = d0 * d0, d1 * d1, d0 * d1
    denom = d00 * c.tan_r[0] + d11 * c.tan_r[1] + d01 * c.tan_r[2]
    inv_lhs = (d00 + d11) / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    new_t0 = c.tan_impulse[0] - inv_lhs * d0
    new_t1 = c.tan_impulse[1] - inv_lhs * d1
    t_norm = jnp.sqrt(new_t0 * new_t0 + new_t1 * new_t1)
    scale = jnp.where(
        t_norm > tangent_limit, tangent_limit / jnp.maximum(t_norm, 1e-12), 1.0
    )
    new_t = jnp.stack([new_t0 * scale, new_t1 * scale])
    dl_t = (new_t - c.tan_impulse) * fmask[None]
    tan_impulse = c.tan_impulse + dl_t

    dvt = c.tangent1 * dl_t[0][None] + t2 * dl_t[1][None]
    v1 = v1 + dvt * c.im1
    v2 = v2 - dvt * c.im2
    w1 = w1 + c.tan_ii_torque_dir1[0] * dl_t[0][None] + c.tan_ii_torque_dir1[1] * dl_t[1][None]
    w2 = w2 + c.tan_ii_torque_dir2[0] * dl_t[0][None] + c.tan_ii_torque_dir2[1] * dl_t[1][None]

    # Twist (only meaningful with >= 2 points).
    npts = act[0] + act[1] + act[2] + act[3]
    has_twist = (npts > 1.5).astype(jnp.float32)
    dvel_tw = dot_cl(c.dir1, w1 - w2)
    new_tw = jnp.clip(
        c.twist_impulse - c.twist_r * dvel_tw, -twist_limit, twist_limit
    )
    dl_tw = (new_tw - c.twist_impulse) * fmask * has_twist
    twist_impulse = c.twist_impulse + dl_tw
    w1 = w1 + c.twist_ii_dir1 * dl_tw[None]
    w2 = w2 + c.twist_ii_dir2 * dl_tw[None]

    # Matmul scatter of velocity deltas (conflict-free within a color).
    m = fmask[None]
    if isinstance(oh1, RoutePlan) and oh1.inv_pair is not None:
        # Conflict-free block: every body receives from at most one
        # lane-endpoint, so the whole scatter is ONE [6, N+1] gather of the
        # padded concatenated deltas (sentinel column 2P is zero).
        vals = jnp.concatenate([
            jnp.concatenate([(v1 - v1_0) * m, (w1 - w1_0) * m], axis=0),
            jnp.concatenate([(v2 - v2_0) * m, (w2 - w2_0) * m], axis=0),
            jnp.zeros((6, 1)),
        ], axis=-1)                                    # [6, 2P+1]
        upd = jnp.take(vals, oh1.inv_pair, axis=-1)    # [6, N+1]
        v_lin = sb.v_lin + upd[0:3]
        v_ang = sb.v_ang + upd[3:6]
    elif isinstance(oh1, RoutePlan) and oh1.seg_pair is not None:
        vals = jnp.concatenate([
            jnp.concatenate([(v1 - v1_0) * m, (w1 - w1_0) * m], axis=0),
            jnp.concatenate([(v2 - v2_0) * m, (w2 - w2_0) * m], axis=0),
        ], axis=-1)                                    # [6, 2P]
        upd = routing.segment_sum(vals, oh1.seg_pair)  # [6, N+1]
        v_lin = sb.v_lin + upd[0:3]
        v_ang = sb.v_ang + upd[3:6]
    elif isinstance(oh1, FoldGather):
        vw0 = jnp.concatenate([sb.v_lin, sb.v_ang], axis=0)
        d1v = jnp.concatenate([(v1 - v1_0) * m, (w1 - w1_0) * m], axis=0)
        d2v = jnp.concatenate([(v2 - v2_0) * m, (w2 - w2_0) * m], axis=0)
        if oh1.inv12 is None:
            # Overflow-color pass (may self-conflict): sum-scatter.
            vw = _fold_scatter_sum(vw0, oh1, d1v, d2v)
        else:
            vw = _fold_scatter_inverse(vw0, oh1, color_id, d1v, d2v)
        v_lin = vw[0:3] + 0.0
        v_ang = vw[3:6] + 0.0
    elif isinstance(oh1, PairOneHot):
        vals = jnp.concatenate([
            jnp.concatenate([(v1 - v1_0) * m, (w1 - w1_0) * m], axis=0),
            jnp.concatenate([(v2 - v2_0) * m, (w2 - w2_0) * m], axis=0),
        ], axis=-1)                                    # [6, 2P]
        upd = vals @ oh1.oh12                          # [6, N+1], one matmul
        v_lin = sb.v_lin + upd[0:3] + 0.0
        v_ang = sb.v_ang + upd[3:6] + 0.0
    else:
        v_lin = _scatter_add_cl(
            _scatter_add_cl(sb.v_lin, oh1, (v1 - v1_0) * m),
            oh2, (v2 - v2_0) * m)
        v_ang = _scatter_add_cl(
            _scatter_add_cl(sb.v_ang, oh1, (w1 - w1_0) * m),
            oh2, (w2 - w2_0) * m)

    c = c._replace(
        impulse=jnp.where(mask[None], impulses, c.impulse),
        tan_impulse=jnp.where(mask[None], tan_impulse, c.tan_impulse),
        twist_impulse=jnp.where(mask, twist_impulse, c.twist_impulse),
    )
    return c, sb._replace(v_lin=v_lin, v_ang=v_ang)
