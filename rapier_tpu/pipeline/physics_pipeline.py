"""PhysicsPipeline::step as one jittable function `step(state, params)`.

Mirrors the reference hot path (src/pipeline/physics_pipeline.rs:490, call
stack in SURVEY §3.1): kinematic velocity interpolation, collision detection
(broad SAP/all-pairs + narrow analytic kernels), warmstart matching against
the persistent contact cache, wake-up on contact start, the TGS-soft batched
solve, writeback, advance-to-final-positions, and island-free sleeping.

`step` is pure: vmap over a leading scene axis batches thousands of scenes;
shard_map over a device mesh scales across chips (parallel/sharding.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rapier_tpu.math import quat
from rapier_tpu.geometry import broadphase, shapes
from rapier_tpu.geometry.dispatch import (
    ManifoldBatch,
    collider_world_poses,
    compute_manifolds,
    compute_mesh_manifolds,
    concat_manifolds,
)
from rapier_tpu.dynamics.solver import contact_constraints as cc
from rapier_tpu.dynamics.solver import velocity_solver as vs
from rapier_tpu.dynamics.solver.coloring import color_constraints
from rapier_tpu.types import BodyType, Contacts, SceneState, SimParams
from rapier_tpu.utils.routing import (
    DENSE_JOIN_ELEMS as _DENSE_JOIN_ELEMS,
    DENSE_ROUTE_ELEMS as _DENSE_ROUTE_ELEMS,
    make_segment_plan, segment_any,
)


class _SolvedImpulses(NamedTuple):
    """The post-solve impulse fields the contact cache needs — what the
    Pallas kernel path returns instead of a full ContactConstraints."""

    impulse: jax.Array           # [4, P]
    impulse_acc: jax.Array       # [4, P]
    tan_impulse: jax.Array       # [2, P]
    tan_impulse_acc: jax.Array   # [2, P]
    twist_impulse: jax.Array     # [P]
    twist_impulse_acc: jax.Array # [P]
    point_mask: jax.Array        # [4, P]


class StepEvents(NamedTuple):
    """Collision events as dense per-pair arrays (the TPU recast of the
    reference EventHandler callbacks, src/pipeline/event_handler.rs:94)."""

    started_pairs: jax.Array   # [P] bool — contact started this step
    stopped_keys: jax.Array    # [P] int32 — pair keys that stopped touching
    stopped: jax.Array         # [P] bool
    force_events: jax.Array    # [P] bool — contact force above threshold
    # ContactForceEvent payload (reference src/geometry/mod.rs:179-196 +
    # contact_pair.rs:198-229: NORMAL impulses only, per manifold).  One
    # manifold per pair lane here, so total == max and the direction is the
    # manifold normal — exact under the reference's definitions.
    force_magnitude: jax.Array # [P] total_force_magnitude (sum of |forces|)
    total_force: jax.Array     # [3, P] vector sum of contact forces
    max_force_direction: jax.Array  # [3, P] direction of the strongest force
    max_force_magnitude: jax.Array  # [P]
    # Intersection-graph split (reference CollisionEvent's `sensor` flag,
    # event_handler.rs; sensors never produce solver contacts, their
    # started/stopped lanes represent intersection enter/exit).
    sensor_pairs: jax.Array    # [P] bool — started/force lane is sensor-kind
    intersecting: jax.Array    # [P] bool — sensor-pair lanes currently
                               # overlapping (compute_intersections analog)
    broadphase_overflow: jax.Array  # scalar int32 diagnostic
    unsupported_pairs: jax.Array    # scalar int32 — pairs with no NP kernel
    ccd_overflow: jax.Array         # scalar int32 — CCD candidates dropped by caps
    solver_overflow: jax.Array      # scalar int32 — touching pairs dropped by
                                    # the max_solver_pairs compaction cap


def _match_previous(prev: Contacts, man: ManifoldBatch):
    """Join new pairs against the previous step's pair cache.

    Returns per-(pair, point): matched warmstart impulses and previous total
    impulses (for is_bouncy), plus per-pair previous `touching` (for events).
    The analog of parry's TrackedContact feature-id matching + the reference's
    warmstart round-trip (contact_pair.rs:34-51).

    Implementation: a dense [Pnew, Pold] key-equality matrix at small sizes —
    equality + matmul contraction beats TPU's while-loop binary-search
    lowering — switching to sort + searchsorted above _DENSE_JOIN_ELEMS
    (the dense matrix is O(P^2): 4,900-box scenes would need a 6 GB join).
    All per-point arrays are lane-LAST ([4, P], see ManifoldBatch layout).
    """
    new_keys = jnp.where(man.valid, man.pair_key, -1)
    old_keys = jnp.where(prev.pair_key >= 0, prev.pair_key, -2)
    pn, po = new_keys.shape[0], old_keys.shape[0]

    # All per-old-pair fields the join routes, stacked so the dense branch
    # pays for the [Pn, Po] equality matrix ONCE (one stacked matmul instead
    # of six — the separate join_pair matmuls re-read the 1 MB/scene matrix
    # each and cost ~16 ms/step at the 4096-scene bench).
    twist_3d = prev.warmstart_tangent_impulse.ndim == 3
    tan_rows = (
        prev.warmstart_tangent_impulse.reshape(-1, po) if twist_3d
        else prev.warmstart_tangent_impulse
    )
    n_tan = tan_rows.shape[0]
    stacked = jnp.concatenate([
        prev.feature_id.astype(jnp.float32),            # 0:4
        prev.point_active.astype(jnp.float32),          # 4:8
        prev.warmstart_impulse.astype(jnp.float32),     # 8:12
        prev.impulse.astype(jnp.float32),               # 12:16
        tan_rows.astype(jnp.float32),                   # 16:16+n_tan
        prev.warmstart_twist_impulse.astype(jnp.float32)[None],
        prev.touching.astype(jnp.float32)[None],
        jnp.ones((1, po), jnp.float32),                 # hit detector row
    ], axis=0)

    if pn * po > _DENSE_JOIN_ELEMS:
        from rapier_tpu.utils.routing import searchsorted_blocked

        order = jnp.argsort(old_keys)
        sk = old_keys[order]
        pos = jnp.clip(searchsorted_blocked(sk, new_keys), 0, po - 1)
        src = order[pos]
        hit = sk[pos] == new_keys                            # [Pn]
        matched = hit & man.valid
        J = jnp.where(hit, stacked[..., src], 0.0)

        tkeys = jnp.sort(jnp.where(man.valid & man.touching, man.pair_key, -3))
        tpos = jnp.clip(searchsorted_blocked(tkeys, old_keys), 0, pn - 1)
        still = tkeys[tpos] == old_keys                      # [Po]
    else:
        eq = new_keys[:, None] == old_keys[None, :]          # [Pn, Po] bool
        eqf = eq.astype(jnp.float32)
        J = stacked @ eqf.T                                  # ONE matmul
        matched = (J[-1] > 0) & man.valid
        still = (man.touching.astype(jnp.float32) @ eqf) > 0

    # Per-point feature-id matching (4 new x 4 old), via joined fid rows.
    old_fid = J[0:4]                                         # [4old, Pn]
    old_pact = J[4:8] > 0
    fmatch = (
        (man.fid[:, None, :].astype(jnp.float32) == old_fid[None, :, :])
        & old_pact[None, :, :]
        & matched[None, None, :]
        & (man.fid[:, None, :] >= 0)
    )                                                        # [4new, 4old, Pn]
    # Keep only the FIRST old match per new point (manual prefix to avoid the
    # reduce_window cumsum lowering).
    f = fmatch
    pre1 = f[:, 0]
    pre2 = pre1 | f[:, 1]
    pre3 = pre2 | f[:, 2]
    first = jnp.stack(
        [f[:, 0], f[:, 1] & ~pre1, f[:, 2] & ~pre2, f[:, 3] & ~pre3],
        axis=1,
    )
    ff = first.astype(jnp.float32)                           # [4new, 4old, Pn]

    def take(rows):
        """Joined per-point old values [4old, Pn] -> matched new points
        [4new, Pn]."""
        return jnp.einsum("kop,op->kp", ff, rows)

    ws_normal = take(J[8:12])
    prev_impulse = take(J[12:16])
    if twist_3d:
        # Per-point tangent warmstart (FrictionModel.COULOMB cache layout
        # [4, 2, P]): route by the same point-level feature match.
        joined_tp = J[16:16 + n_tan].reshape(4, 2, pn)          # [4o, 2, Pn]
        ws_tan = jnp.einsum("kop,ojp->kjp", ff, joined_tp)      # [4n, 2, Pn]
    else:
        # Manifold-level tangent warmstart (twist friction model stores one
        # tangent pair per manifold).
        mf = matched.astype(jnp.float32)[None]
        ws_tan = J[16:16 + n_tan] * mf                           # [2, Pn]
    ws_twist = jnp.where(matched, J[16 + n_tan], 0.0)
    prev_touching = matched & (J[16 + n_tan + 1] > 0)
    # (`still` — old pairs still touching this step, for stopped events —
    # comes from the size-dispatched join above.)
    return ws_normal, ws_tan, ws_twist, prev_impulse, prev_touching, matched, still


def step(state: SceneState, params: SimParams, hooks=None):
    """Advance the scene by params.dt.  Returns (new_state, StepEvents).

    `hooks` is an optional pipeline.hooks.PhysicsHooks (static: closed over at
    jit time, e.g. via functools.partial)."""
    bodies = state.bodies
    colliders = state.colliders
    n = bodies.n

    # ------------------------------------------------------------------
    # 0. Multibody articulations (reduced coordinates), phase A:
    #    generalized forward dynamics -> tentative qd; tentative link
    #    velocities (J qd) land in the body set.  Joint integration + FK
    #    happen AFTER the contact solve (phase C, absorb_contact_impulses),
    #    so contacts feed back into the articulation — two-way coupling
    #    (reference: generic constraint rows spanning the generalized dofs,
    #    generic_contact_constraint.rs:392; see dynamics/multibody.py).
    # ------------------------------------------------------------------
    multibodies = state.multibodies
    mb_aux = None
    if multibodies is not None:
        from rapier_tpu.dynamics import multibody as mbmod

        multibodies, bodies, mb_aux = mbmod.predict_velocities(
            multibodies, bodies, params.gravity, params.dt
        )

    # ------------------------------------------------------------------
    # 1. Kinematic velocity interpolation (physics_pipeline.rs:412-438).
    #    Multibody links are excluded: their velocities come from J qd
    #    (phase A above), not from next-pose differencing.
    # ------------------------------------------------------------------
    kin_pos = (
        (bodies.body_type == BodyType.KINEMATIC_POSITION_BASED)
        & ~bodies.mb_link
    )
    inv_dt = params.inv_dt()
    com_now = bodies.pos + quat.rotate(bodies.rot, bodies.local_com)
    com_next = bodies.next_pos + quat.rotate(bodies.next_rot, bodies.local_com)
    kin_linvel = (com_next - com_now) * inv_dt
    dq = quat.mul(bodies.next_rot, quat.conj(bodies.rot))
    # angvel = 2 * vec(dq) / dt for small rotations (sign fix for w < 0).
    dq = jnp.where(dq[:, 3:4] < 0, -dq, dq)
    angle = 2.0 * jnp.arctan2(
        jnp.linalg.norm(dq[:, :3], axis=-1), dq[:, 3]
    )
    axis = dq[:, :3] / jnp.maximum(jnp.linalg.norm(dq[:, :3], axis=-1, keepdims=True), 1e-12)
    kin_angvel = axis * (angle * inv_dt)[:, None]
    bodies = bodies.replace(
        linvel=jnp.where(kin_pos[:, None], kin_linvel, bodies.linvel),
        angvel=jnp.where(kin_pos[:, None], kin_angvel, bodies.angvel),
    )

    # ------------------------------------------------------------------
    # 2. Broad phase.
    # ------------------------------------------------------------------
    w_pos, w_rot = collider_world_poses(bodies, colliders)
    mins, maxs = shapes.compute_aabbs(
        colliders.shape_type, colliders.shape_params, w_pos, w_rot
    )
    from rapier_tpu.geometry.dispatch import parent_body_cols

    _, _, _, soft_pred, linvel_c = parent_body_cols(bodies, colliders.parent)
    vmag = jnp.linalg.norm(linvel_c, axis=-1)
    soft_margin = jnp.minimum(vmag * params.dt, soft_pred)
    margin = (
        colliders.contact_skin[:, None]
        + 0.5 * params.prediction_distance()
        + 0.01 * params.length_unit
        + soft_margin[:, None]
    )
    mins = mins - margin
    maxs = maxs + margin
    max_pairs = state.contacts.max_pairs
    has_meshes = state.meshes is not None
    mesh_lanes = params.max_mesh_pairs * params.tris_per_pair if has_meshes else 0
    convex_pairs = max_pairs - mesh_lanes
    assert convex_pairs > 0, "max_pairs too small for the mesh-lane reservation"
    # Links present as DYNAMIC to the pair filter so link-vs-static pairs
    # survive (they receive impulses via the articulated mobility).
    bp_body_type = jnp.where(
        bodies.mb_link, int(BodyType.DYNAMIC), bodies.body_type
    )
    c1, c2, pair_valid, bp_overflow = broadphase.find_pairs(
        mins, maxs, colliders, bp_body_type, convex_pairs,
        params.broad_phase, params.sap_window,
    )

    # ------------------------------------------------------------------
    # 3. Narrow phase (convex pairs + mesh sub-lanes).
    # ------------------------------------------------------------------
    man = compute_manifolds(
        bodies, colliders, c1, c2, pair_valid, params.prediction_distance(),
        present=params.shape_types_present, hulls=state.hulls, dt=params.dt,
    )
    if has_meshes:
        man_mesh = compute_mesh_manifolds(
            bodies, colliders, state.meshes, c1, c2, pair_valid,
            params.prediction_distance(), params.max_mesh_pairs,
            params.tris_per_pair,
        )
        man = concat_manifolds(man, man_mesh)

    # User hooks, gated by per-collider ActiveHooks flags (reference
    # physics_hooks.rs:142-200; flag union of the two colliders).
    if hooks is not None:
        from rapier_tpu.types import (
            ACTIVE_HOOKS_FILTER_CONTACT_PAIR,
            ACTIVE_HOOKS_MODIFY_SOLVER_CONTACTS,
        )

        hflags = man.active_hooks_or
        if hooks.filter_contact_pair is not None:
            gate = (hflags & ACTIVE_HOOKS_FILTER_CONTACT_PAIR) != 0
            keep = hooks.filter_contact_pair(bodies, colliders, man)
            man = man._replace(
                solver_pair=man.solver_pair & (keep | ~gate),
                touching=man.touching & (keep | ~gate),
            )
        if hooks.modify_solver_contacts is not None:
            gate = (hflags & ACTIVE_HOOKS_MODIFY_SOLVER_CONTACTS) != 0
            mod = hooks.modify_solver_contacts(bodies, colliders, man)
            # Explicit whitelist of hook-writable fields — the reference only
            # exposes the solver-contact payload (physics_hooks.rs:31:
            # points/dist/friction/restitution/tangent surface velocity),
            # never pair identity (pair_key/body1/body2) or validity masks.
            HOOK_WRITABLE = (
                "point", "dist", "normal", "friction", "restitution",
                "surface_velocity", "point_active",
            )
            updates = {}
            for f in HOOK_WRITABLE:
                if not hasattr(man, f):
                    continue
                old = getattr(man, f)
                new = getattr(mod, f)
                # Lane axis is LAST: broadcast the [P] gate over leading dims.
                g = gate.reshape((1,) * (old.ndim - 1) + gate.shape)
                updates[f] = jnp.where(g, new, old)
            man = man._replace(**updates)

    # ------------------------------------------------------------------
    # 4. Warmstart matching + events bookkeeping.
    # ------------------------------------------------------------------
    (ws_n, ws_t, ws_tw, prev_imp, prev_touch, _matched, still) = _match_previous(
        state.contacts, man
    )
    started = man.touching & ~prev_touch

    # Joint-attached pairs with contacts disabled are filtered out
    # (reference narrow_phase.rs:853-874 joint filter) — impulse joints AND
    # multibody link-vs-parent edges share one sorted key table.
    joints = state.joints
    jkeys = []
    imax = jnp.iinfo(jnp.int32).max
    if joints is not None:
        jb1 = jnp.minimum(joints.body1, joints.body2)
        jb2 = jnp.maximum(joints.body1, joints.body2)
        no_contact = joints.enabled & ~joints.contacts_enabled & (jb1 >= 0)
        jkeys.append(jnp.where(no_contact, jb1 * n + jb2, imax))
    if multibodies is not None:
        lb = multibodies.link_body                       # [M, L]
        lp = jnp.clip(multibodies.link_parent, 0, multibodies.l - 1)
        pb = jnp.take_along_axis(lb, lp, axis=1)         # parent link's body
        no_c = (
            multibodies.link_valid & ~multibodies.contacts_enabled
            & (multibodies.link_parent >= 0) & (lb >= 0) & (pb >= 0)
            & (pb != lb)
        )
        k1 = jnp.minimum(lb, pb)
        k2 = jnp.maximum(lb, pb)
        jkeys.append(jnp.where(no_c, k1 * n + k2, imax).reshape(-1))
    if jkeys:
        jkey_sorted = jnp.sort(jnp.concatenate(jkeys))
        mb1 = jnp.minimum(man.body1, man.body2)
        mb2 = jnp.maximum(man.body1, man.body2)
        mkey = jnp.where((mb1 >= 0), mb1 * n + mb2, -1)
        jpos = jnp.clip(
            jnp.searchsorted(jkey_sorted, mkey), 0, jkey_sorted.shape[0] - 1
        )
        joint_blocked = jkey_sorted[jpos] == mkey
        man = man._replace(solver_pair=man.solver_pair & ~joint_blocked)

    # Stopped events: previous touching pairs absent or no longer touching
    # ("still" comes from the match join above).
    prev_c = state.contacts
    stopped = prev_c.touching & ~still & (prev_c.pair_key >= 0)

    # ------------------------------------------------------------------
    # 5. Wake-up on contact start + awake propagation (island semantics,
    #    reference island_manager: interaction_started wakes both islands).
    # ------------------------------------------------------------------
    dyn = bodies.body_type == BodyType.DYNAMIC

    # Interaction graph edges: touching contact pairs + enabled joints
    # (both drive island-style wake/sleep propagation).  Contact-pair dynamic
    # flags come from the dispatcher's staging table (no gathers).
    eb1 = man.body1
    eb2 = man.body2
    emask = man.touching & (eb1 >= 0) & (eb2 >= 0)
    edyn = man.dyn1 & man.dyn2
    joints = state.joints if joints is None else joints
    if joints is not None:
        eb1 = jnp.concatenate([eb1, joints.body1])
        eb2 = jnp.concatenate([eb2, joints.body2])
        jmask = joints.enabled & (joints.body1 >= 0) & (joints.body2 >= 0)
        emask = jnp.concatenate([emask, jmask])
        jdyn = (
            dyn[jnp.maximum(joints.body1, 0)] & dyn[jnp.maximum(joints.body2, 0)]
        )
        edyn = jnp.concatenate([edyn, jdyn])
    edge_dd = emask & edyn

    # Adjacency of the dynamic-dynamic interaction graph.  Small scenes: a
    # dense [N, N] matrix (matvec propagation beats TPU scatters).  Large
    # scenes: sorted segment plans over the edge lists (utils/routing.py) —
    # the dense form is O(E*N) + O(N^2) and would cost gigabytes at 5k+
    # bodies.  `neighbor_or(flag)[b] = OR of flag over b's graph neighbors`.
    sent = n
    t1 = jnp.where(edge_dd, eb1, sent)
    t2 = jnp.where(edge_dd, eb2, sent)
    # Large scenes (segment-plan path only): the touching dynamic-dynamic
    # edges are a small subset of the candidate-pair lanes — compact them
    # into the solver-cap width so the K-hop wake loop
    # (sleep_propagation_iters segment sweeps) works cap lanes instead of
    # every broad-phase candidate lane.  The dense-adjacency path below
    # scales with N^2, not edge count, so compaction there is pure cost
    # (~9 ms/step at the 4096-scene bench: a compact + 2 batched takes).
    cap_e = int(getattr(params, "max_solver_pairs", 0) or 0)
    dense_wake = (
        t1.shape[0] * (n + 1) <= _DENSE_ROUTE_ELEMS
        and n * n <= _DENSE_ROUTE_ELEMS
    )
    if 0 < cap_e < t1.shape[0] and not dense_wake:
        from rapier_tpu.utils.compaction import compact_indices as _ci

        esrc, evalid, _eovf = _ci(edge_dd, cap_e)
        t1 = jnp.where(evalid, jnp.take(t1, esrc), sent)
        t2 = jnp.where(evalid, jnp.take(t2, esrc), sent)
    n_edges = t1.shape[0]
    if n_edges * (n + 1) <= _DENSE_ROUTE_ELEMS and n * n <= _DENSE_ROUTE_ELEMS:
        body_ids = jnp.arange(n + 1)
        e1 = (t1[:, None] == body_ids[None, :]).astype(jnp.float32)  # [E, N+1]
        e2 = (t2[:, None] == body_ids[None, :]).astype(jnp.float32)
        adj = (e1.T @ e2)[:n, :n]
        adj = adj + adj.T

        def neighbor_or(flag):
            return (adj @ flag.astype(jnp.float32)) > 0.0

        def scatter_started(started_mask):
            sb1 = (jnp.where(started_mask & (man.body1 >= 0), man.body1, sent)
                   [:, None] == body_ids[None, :])
            sb2 = (jnp.where(started_mask & (man.body2 >= 0), man.body2, sent)
                   [:, None] == body_ids[None, :])
            return (jnp.any(sb1, axis=0) | jnp.any(sb2, axis=0))[:n]
    else:
        eplan1 = make_segment_plan(t1, n + 1)
        eplan2 = make_segment_plan(t2, n + 1)

        def neighbor_or(flag):
            flag_ext = jnp.concatenate([flag, jnp.zeros((1,), bool)])
            a = segment_any(flag_ext[t2], eplan1)[:n]
            b = segment_any(flag_ext[t1], eplan2)[:n]
            return a | b

        def scatter_started(started_mask):
            wb1 = jnp.where(started_mask & (man.body1 >= 0), man.body1, sent)
            wb2 = jnp.where(started_mask & (man.body2 >= 0), man.body2, sent)
            smask = started_mask
            if 0 < cap_e < wb1.shape[0]:
                from rapier_tpu.utils.compaction import compact_indices as _ci

                ssrc, svalid, _sovf = _ci(started_mask, cap_e)
                wb1 = jnp.where(svalid, jnp.take(wb1, ssrc), sent)
                wb2 = jnp.where(svalid, jnp.take(wb2, ssrc), sent)
                smask = svalid
            w1 = segment_any(smask, make_segment_plan(wb1, n + 1))[:n]
            w2 = segment_any(smask, make_segment_plan(wb2, n + 1))[:n]
            return w1 | w2

    def _propagate_fixed_point(flag, step_fn, max_iters):
        """Iterate flag -> step_fn(flag) until unchanged (early exit) or
        max_iters hops — identical fixed point as the unrolled K-hop loop,
        but settled scenes converge in 1-2 hops instead of paying all K
        (the 16-hop unroll was ~13 ms/step on the 4.9k-body pyramid)."""

        def cond(st):
            _, changed, i = st
            return changed & (i < max_iters)

        def body(st):
            f, _, i = st
            nf = step_fn(f)
            return nf, jnp.any(nf != f), i + jnp.int32(1)

        out, _, _ = jax.lax.while_loop(
            cond, body, (flag, jnp.bool_(True), jnp.int32(0))
        )
        return out

    sleeping = bodies.sleeping & dyn
    if params.sleeping_enabled:
        woke = scatter_started(started)
        awake = (dyn & ~sleeping) | (woke & dyn)
        # Spread wakefulness across dynamic-dynamic edges (one hop per pass).
        awake_p = _propagate_fixed_point(
            awake, lambda f: f | (neighbor_or(f) & dyn),
            params.sleep_propagation_iters,
        )
        sleeping = dyn & ~awake_p
    bodies = bodies.replace(sleeping=sleeping)

    # ------------------------------------------------------------------
    # 6. Solve.
    # ------------------------------------------------------------------
    active = bodies.enabled & ~sleeping
    sb = vs.make_solver_bodies(bodies, active, params)
    if multibodies is not None:
        # Phase B: link columns get their articulated mobility (diag blocks
        # of J A^-1 J^T) so contact denominators feel the articulation.
        from rapier_tpu.dynamics import multibody as mbmod

        sb = mbmod.install_link_mobility(sb, multibodies, mb_aux, bodies)

    # Pairs where one side is sleeping never reach the solver (both sleep
    # together or the awake side woke them above).
    # Sleeping lookups (fresh: `sleeping` was updated by the wake pass
    # above).  One-hot matmuls at small sizes, direct gathers when the
    # [P, N+1] masks would be large.
    sent = n
    slp_ext = jnp.concatenate([sleeping, jnp.zeros((1,), bool)])
    if man.body1.shape[0] * (n + 1) <= _DENSE_ROUTE_ELEMS:
        body_ids_s = jnp.arange(n + 1)
        slp_f = slp_ext.astype(jnp.float32)
        ohb1 = (
            jnp.where(man.body1 >= 0, man.body1, sent)[:, None]
            == body_ids_s[None, :]
        ).astype(jnp.float32)
        ohb2 = (
            jnp.where(man.body2 >= 0, man.body2, sent)[:, None]
            == body_ids_s[None, :]
        ).astype(jnp.float32)
        asleep1 = (man.body1 >= 0) & ((ohb1 @ slp_f) > 0)
        asleep2 = (man.body2 >= 0) & ((ohb2 @ slp_f) > 0)
    else:
        asleep1 = (man.body1 >= 0) & slp_ext[jnp.where(man.body1 >= 0,
                                                       man.body1, sent)]
        asleep2 = (man.body2 >= 0) & slp_ext[jnp.where(man.body2 >= 0,
                                                       man.body2, sent)]
    solver_pair = man.solver_pair & ~asleep1 & ~asleep2
    man = man._replace(solver_pair=solver_pair)

    dyn1 = man.dyn1 & ~asleep1
    dyn2 = man.dyn2 & ~asleep2

    # Contacts-only scenes on TPU take the VMEM-resident Pallas kernel:
    # constraint generation + the whole substep/color loop run on-chip from
    # a ~40-row manifold stream (no HBM constraint round-trips).
    backend = params.solver_backend
    from rapier_tpu.types import FrictionModel
    from rapier_tpu.dynamics.solver import pallas_sweep

    from rapier_tpu import precision as _prec

    coulomb = params.friction_model == int(FrictionModel.COULOMB)
    use_pallas = (
        joints is None
        and not coulomb
        and not _prec.is_f64()            # Mosaic kernels are f32-only
        and not params.block_solver_2x2   # 2D block solve: JAX sweep only
        and backend != "jax"
        and pallas_sweep.vmem_feasible(man.body1.shape[0], n + 1)
        and (backend == "pallas" or jax.default_backend() == "tpu")
    )
    p_lanes = man.body1.shape[0]
    cap = params.max_solver_pairs
    compact_solve = use_pallas and 0 < cap < p_lanes
    solver_overflow = jnp.int32(0)

    if use_pallas:
        si = vs.substep_inputs(bodies, sb, active, params)
        sent = n
        b1s = jnp.where((man.body1 >= 0) & (man.rel_dominance <= 0),
                        man.body1, sent)
        b2s = jnp.where((man.body2 >= 0) & (man.rel_dominance >= 0),
                        man.body2, sent)
        sp = solver_pair
        sd1, sd2 = dyn1, dyn2
        s_normal, s_point, s_pact = man.normal, man.point, man.point_active
        s_dist, s_fric, s_rest = man.dist, man.friction, man.restitution
        s_prev, s_wsn = prev_imp, ws_n * man.point_active
        s_wst, s_wstw = ws_t, ws_tw
        if compact_solve:
            # Stream-compact the touching lanes: the O(substeps x colors)
            # sweep then works K = max_solver_pairs lanes instead of every
            # broad-phase candidate lane.  Routing is one [K, P] one-hot
            # matmul per direction, built directly from compaction ranks
            # (utils/compaction.compact_route — no index takes).
            from rapier_tpu.utils.compaction import compact_route

            route, kvalid, solver_overflow = compact_route(sp, cap)

            # ONE stacked [rows, P] @ [P, K] matmul for every routed field
            # (separate matmuls re-read the route matrix each — matmul
            # count, not FLOPs, dominates at these sizes).
            def rows2d(x):
                x = jnp.asarray(x, jnp.float32)
                return x.reshape(-1, p_lanes)

            fields = [
                (b1s, 1), (b2s, 1), (sd1, 1), (sd2, 1),
                (s_normal, 3), (s_point, 12), (s_pact, 4), (s_dist, 4),
                (s_fric, 1), (s_rest, 1), (s_prev, 4), (s_wsn, 4),
                (s_wst, 2), (s_wstw, 1),
            ]
            stackedc = jnp.concatenate([rows2d(x) for x, _ in fields], axis=0)
            R = stackedc @ route.T                              # [rows, K]
            offs = np.cumsum([0] + [r for _, r in fields])

            def seg(i):
                return R[offs[i]:offs[i + 1]]

            b1s = jnp.where(kvalid, seg(0)[0].astype(jnp.int32), sent)
            b2s = jnp.where(kvalid, seg(1)[0].astype(jnp.int32), sent)
            sd1 = seg(2)[0] > 0.5
            sd2 = seg(3)[0] > 0.5
            sp = kvalid
            s_normal = seg(4)
            s_point = seg(5).reshape(4, 3, cap)
            s_pact = seg(6) > 0.5
            s_dist = seg(7)
            s_fric, s_rest = seg(8)[0], seg(9)[0]
            s_prev, s_wsn = seg(10), seg(11)
            s_wst, s_wstw = seg(12), seg(13)[0]

        color, num_colors = color_constraints(
            b1s, b2s, sd1, sd2, sp, n, params.max_colors
        )
        sb, imp = pallas_sweep.solve_from_manifolds(
            sb, b1=b1s, b2=b2s, valid=sp, color=color,
            num_colors=num_colors, normal=s_normal, point=s_point,
            point_active=s_pact, dist=s_dist,
            friction=s_fric, restitution=s_rest,
            prev_impulse=s_prev, ws_n=s_wsn, ws_t=s_wst,
            ws_tw=s_wstw, dv_inc=si["dv_inc"], dw_inc=si["dw_inc"],
            move_mask=si["move_mask"], dt_sub=si["dt_sub"],
            inv_dt_sub=si["inv_dt_sub"], erp_inv_dt=si["erp_inv_dt"],
            cfm_factor=si["cfm_factor"],
            allowed_lin_err=params.allowed_linear_error(),
            max_corrective_velocity=params.max_corrective_velocity(),
            warmstart_coeff=params.warmstart_coefficient,
            n_sub=si["n_sub"],
            pgs_iters=params.num_internal_pgs_iterations,
            stab_iters=params.num_internal_stabilization_iterations,
            interpret=jax.default_backend() != "tpu",
            dyn1=sd1, dyn2=sd2, max_colors=params.max_colors,
        )
        if compact_solve:
            # Scatter the impulse block back to full lanes; lanes the solve
            # never saw (sleeping / hook-filtered / overflow) keep their
            # matched warmstart caches so they warmstart correctly on wake.
            imp = imp @ route                                   # [14, P]
            covered = jnp.sum(route, axis=0) > 0.0              # [P]
            z4 = jnp.zeros((4, p_lanes))
            default = jnp.concatenate([
                ws_n * man.point_active, z4, ws_t, jnp.zeros((2, p_lanes)),
                ws_tw[None], jnp.zeros((1, p_lanes)),
            ], axis=0)
            imp = jnp.where(covered[None, :], imp, default)
        constraints = _SolvedImpulses(
            impulse=imp[0:4], impulse_acc=imp[4:8],
            tan_impulse=imp[8:10], tan_impulse_acc=imp[10:12],
            twist_impulse=imp[12], twist_impulse_acc=imp[13],
            point_mask=man.point_active,
        )
    elif (
        (not coulomb) and joints is None
        and p_lanes * (n + 1) > _DENSE_ROUTE_ELEMS
    ):
        # ------------------------------------------------------------------
        # Large-scene BLOCKED solve: capped Luby coloring lays the touching
        # lanes out in contiguous per-color blocks (coloring.py
        # color_constraints_blocked); each Gauss-Seidel pass then runs one
        # static block (sum(caps) ~ 1.3 K lanes/sweep) instead of all K
        # lanes masked per color (num_colors * K).  This replaces the
        # compact_jax + masked-sweep path above the dense-routing limit.
        # ------------------------------------------------------------------
        from rapier_tpu.dynamics.solver.coloring import (
            block_caps, color_constraints_blocked,
        )

        base = cap if 0 < cap < p_lanes else p_lanes
        caps = block_caps(base, params.max_colors)
        starts = [0]
        for w_c in caps:
            starts.append(starts[-1] + w_c)
        w_total = starts[-1]

        color_l, slot, solver_overflow = color_constraints_blocked(
            man.body1, man.body2, dyn1, dyn2, solver_pair, n, caps
        )
        # Blocked routing: slot -> original lane (unique targets; invalid
        # lanes collide on the cut-off sentinel slot).
        lane_ids = jnp.arange(p_lanes, dtype=jnp.int32)
        tgt = jnp.minimum(slot, w_total)
        blk_src = (
            jnp.full((w_total + 1,), p_lanes, jnp.int32)
            .at[tgt].set(lane_ids)[:w_total]
        )
        slot_valid = blk_src < p_lanes
        srcc = jnp.minimum(blk_src, p_lanes - 1)

        def rt(x, neutral=0.0):
            v = jnp.take(x, srcc, axis=-1)
            g = slot_valid.reshape((1,) * (v.ndim - 1) + (w_total,))
            return jnp.where(g, v, jnp.asarray(neutral, v.dtype))

        sent = n
        bb1 = rt(man.body1, -1)
        bb2 = rt(man.body2, -1)
        rdom = rt(man.rel_dominance, 0)
        b1s = jnp.where((bb1 >= 0) & (rdom <= 0), bb1, sent)
        b2s = jnp.where((bb2 >= 0) & (rdom >= 0), bb2, sent)
        valid_b = rt(man.solver_pair, False)
        pact_b = rt(man.point_active, False)
        ws_n_b, ws_t_b, ws_tw_b = rt(ws_n), rt(ws_t), rt(ws_tw)

        # Routing plans, all built once per step: gathers only need the
        # target indices; every scatter goes through ONE fused-pair plan
        # (endpoints concatenated — see RoutePlan.seg_pair) per scope:
        # full width for warmstart, per block for the color passes.
        oh1 = cc.RoutePlan(
            b1s, None,
            make_segment_plan(jnp.concatenate([b1s, b2s]), n + 1),
        )
        oh2 = cc.RoutePlan(b2s, None)
        blocks = []
        for ci, w_c in enumerate(caps):
            s0 = starts[ci]
            b1c = b1s[s0:s0 + w_c]
            b2c = b2s[s0:s0 + w_c]
            segp = make_segment_plan(jnp.concatenate([b1c, b2c]), n + 1)
            if ci < len(caps) - 1:
                # Conflict-free block: each body is touched by at most one
                # lane-endpoint, so the pass scatter is a single inverse
                # gather (RoutePlan.inv_pair).  Bodies outside the block hit
                # the zero-padded sentinel column 2*w_c.
                has = segp.ends > segp.starts
                inv = jnp.where(
                    has,
                    jnp.take(segp.perm,
                             jnp.minimum(segp.starts, 2 * w_c - 1)),
                    2 * w_c,
                )
                blocks.append((
                    ci, s0, w_c,
                    cc.RoutePlan(b1c, None, None, inv),
                    cc.RoutePlan(b2c, None),
                ))
            else:
                # Jacobi tail (no independence guarantee): segment-sum
                # accumulation, same degradation rule as the masked path.
                blocks.append((
                    ci, s0, w_c,
                    cc.RoutePlan(b1c, None, segp),
                    cc.RoutePlan(b2c, None),
                ))
        color_of_slot = jnp.asarray(
            np.repeat(np.arange(len(caps), dtype=np.int32), caps)
        )

        constraints = cc.generate_from(
            b1s, b2s, valid_b, color_of_slot,
            rt(man.normal), rt(man.point), pact_b,
            rt(man.dist, 1e10), rt(man.friction), rt(man.restitution),
            sb, rt(prev_imp), n, oh1=oh1, oh2=oh2,
        )
        constraints = constraints._replace(
            impulse=ws_n_b * constraints.point_mask,
            tan_impulse=ws_t_b,
            twist_impulse=ws_tw_b,
        )

        sb, cons_b = vs.solve_blocked(
            bodies, sb, constraints, blocks, oh1, oh2, active, params
        )

        # Route impulses back to the full pair lanes for the contact cache;
        # lanes the solve never saw keep their matched warmstart values.
        has_slot = slot < w_total
        slot_c = jnp.minimum(slot, w_total - 1)

        def expand(xw, default):
            v = jnp.take(xw, slot_c, axis=-1)
            g = has_slot.reshape((1,) * (v.ndim - 1) + (p_lanes,))
            return jnp.where(g, v, default)

        z4 = jnp.zeros((4, p_lanes))
        constraints = _SolvedImpulses(
            impulse=expand(cons_b.impulse, ws_n * man.point_active),
            impulse_acc=expand(cons_b.impulse_acc, z4),
            tan_impulse=expand(cons_b.tan_impulse, ws_t),
            tan_impulse_acc=expand(cons_b.tan_impulse_acc,
                                   jnp.zeros((2, p_lanes))),
            twist_impulse=expand(cons_b.twist_impulse, ws_tw),
            twist_impulse_acc=expand(cons_b.twist_impulse_acc,
                                     jnp.zeros((p_lanes,))),
            point_mask=man.point_active,
        )
    else:
        # Solver-lane compaction on the pure-JAX path: generate + the
        # O(substeps x colors) sweep work K = max_solver_pairs lanes instead
        # of every broad-phase candidate lane (the Pallas path compacts the
        # same way above).  Uncovered lanes keep their matched warmstart
        # caches; overflow surfaces in StepEvents.solver_overflow.
        compact_jax = (not coulomb) and 0 < cap < p_lanes
        if compact_jax:
            from rapier_tpu.utils.compaction import (
                compact_indices, compact_route,
            )

            if p_lanes * cap <= 1 << 20:
                # Route fields with matmuls (batched takes cost ~25 ms/step
                # at the 4096-scene bench).  Exact int32 fields ride 16-bit
                # halves (f32 only carries 2^24 of integer precision; mesh
                # pair keys exceed it).
                route_m, kvalid, solver_overflow = compact_route(
                    solver_pair, cap)
                src = None

                def _cl(x):
                    if jnp.issubdtype(x.dtype, jnp.integer):
                        lo = (x & 0xFFFF).astype(jnp.float32) @ route_m.T
                        hi = (x >> 16).astype(jnp.float32) @ route_m.T
                        return (
                            (hi.astype(jnp.int32) << 16)
                            | lo.astype(jnp.int32)
                        ).astype(x.dtype)
                    if x.dtype == jnp.bool_:
                        return (x.astype(jnp.float32) @ route_m.T) > 0.5
                    return (
                        x.astype(jnp.float32).reshape(-1, p_lanes) @ route_m.T
                    ).reshape(x.shape[:-1] + (cap,)).astype(x.dtype)
            else:
                src, kvalid, solver_overflow = compact_indices(
                    solver_pair, cap)

                def _cl(x):
                    return jnp.take(x, src, axis=-1)

            man_s = man._replace(**{
                f: _cl(getattr(man, f))
                for f in man._fields if f != "unsupported"
            })
            man_s = man_s._replace(
                body1=jnp.where(kvalid, man_s.body1, -1),
                body2=jnp.where(kvalid, man_s.body2, -1),
                valid=man_s.valid & kvalid,
                solver_pair=kvalid,
                point_active=man_s.point_active & kvalid[None, :],
            )
            dyn1_s, dyn2_s = _cl(dyn1) & kvalid, _cl(dyn2) & kvalid
            prev_imp_s = _cl(prev_imp)
            ws_n_s, ws_t_s, ws_tw_s = _cl(ws_n), _cl(ws_t), _cl(ws_tw)
        else:
            man_s, dyn1_s, dyn2_s = man, dyn1, dyn2
            prev_imp_s, ws_n_s, ws_t_s, ws_tw_s = prev_imp, ws_n, ws_t, ws_tw

        color, num_colors = color_constraints(
            man_s.body1, man_s.body2, dyn1_s, dyn2_s, man_s.solver_pair, n,
            params.max_colors
        )
        if coulomb:
            from rapier_tpu.dynamics.solver import (
                contact_constraints_coulomb as cc_model,
            )

            constraints = cc_model.generate(man_s, sb, prev_imp_s, color, n)
            constraints = constraints._replace(
                impulse=ws_n_s * constraints.point_mask,
                tan_impulse=ws_t_s * constraints.point_mask[:, None, :],
            )
        else:
            cc_model = cc
            constraints = cc.generate(man_s, sb, prev_imp_s, color, n)
            # Inject matched warmstart impulses (lane-last already).
            constraints = constraints._replace(
                impulse=ws_n_s * constraints.point_mask,
                tan_impulse=ws_t_s,
                twist_impulse=ws_tw_s,
            )

        if joints is not None:
            jdyn1 = (joints.body1 >= 0) & dyn[jnp.maximum(joints.body1, 0)]
            jdyn2 = (joints.body2 >= 0) & dyn[jnp.maximum(joints.body2, 0)]
            jvalid = joints.enabled & (joints.body1 >= 0)
            joint_color, num_joint_colors = color_constraints(
                joints.body1, joints.body2, jdyn1, jdyn2, jvalid, n,
                params.max_colors
            )
        else:
            joint_color, num_joint_colors = None, None

        sb, constraints, joint_rows = vs.solve(
            bodies, sb, constraints, num_colors, active, params,
            joints=joints, joint_color=joint_color,
            num_joint_colors=num_joint_colors, cc_mod=cc_model,
        )
        if joints is not None and joint_rows is not None:
            joints = joints.replace(impulses=joint_rows.impulse)
        if compact_jax:
            # Scatter the K-lane impulses back to full width; lanes the
            # solve never saw keep their matched warmstart caches.
            if src is None:
                # Route-matrix mode: slots are unique, so one matmul places
                # the values and `covered` selects against the defaults.
                covered = jnp.sum(route_m, axis=0) > 0.0      # [P]

                def _expand(xk, default):
                    placed = (
                        xk.astype(jnp.float32).reshape(-1, cap) @ route_m
                    ).reshape(default.shape)
                    return jnp.where(
                        jnp.broadcast_to(covered, default.shape),
                        placed.astype(default.dtype), default)
            else:
                # Index mode (large scenes): invalid compaction slots write
                # to a dropped sentinel column so the scatter has unique
                # indices (deterministic).
                src_s = jnp.where(kvalid, src, p_lanes)

                def _expand(xk, default):
                    pad = jnp.zeros(default.shape[:-1] + (1,), default.dtype)
                    full = jnp.concatenate([default, pad], axis=-1)
                    return full.at[..., src_s].set(xk)[..., :p_lanes]

            z4 = jnp.zeros((4, p_lanes))
            constraints = _SolvedImpulses(
                impulse=_expand(constraints.impulse, ws_n * man.point_active),
                impulse_acc=_expand(constraints.impulse_acc, z4),
                tan_impulse=_expand(constraints.tan_impulse, ws_t),
                tan_impulse_acc=_expand(constraints.tan_impulse_acc,
                                        jnp.zeros((2, p_lanes))),
                twist_impulse=_expand(constraints.twist_impulse, ws_tw),
                twist_impulse_acc=_expand(constraints.twist_impulse_acc,
                                          jnp.zeros((p_lanes,))),
                point_mask=man.point_active,
            )
    bodies = vs.writeback(bodies, sb, active, params)

    if multibodies is not None:
        # Phase C: project link velocity deltas into generalized space,
        # integrate joints, FK, write link next poses + final velocities.
        from rapier_tpu.dynamics import multibody as mbmod

        multibodies, bodies = mbmod.absorb_contact_impulses(
            multibodies, bodies, sb, mb_aux, params.dt
        )

    # ------------------------------------------------------------------
    # 7. CCD motion clamping + advance to final positions
    #    (physics_pipeline.rs:611-678, :396-410).
    # ------------------------------------------------------------------
    if params.enable_ccd:
        from rapier_tpu.dynamics.ccd import clamp_motions

        bodies, ccd_overflow = clamp_motions(
            bodies, colliders, params, meshes=state.meshes)
    else:
        ccd_overflow = jnp.int32(0)
    bodies = bodies.replace(pos=bodies.next_pos, rot=quat.normalize(bodies.next_rot))

    # ------------------------------------------------------------------
    # 8. Sleeping update (post-solve velocities; island-free propagation).
    # ------------------------------------------------------------------
    if params.sleeping_enabled:
        lin_sq = jnp.sum(bodies.linvel**2, axis=-1)
        ang_sq = jnp.sum(bodies.angvel**2, axis=-1)
        lin_th = params.sleep_linear_threshold * params.length_unit
        quiet = (lin_sq < lin_th * lin_th) & (
            ang_sq < params.sleep_angular_threshold**2
        )
        timer = jnp.where(quiet, bodies.sleep_timer + params.dt, 0.0)
        eligible = dyn & bodies.can_sleep & bodies.enabled & (
            timer >= params.time_until_sleep
        )
        # A body sleeps only if its whole touching component is eligible:
        # K-iteration min-propagation approximates island extraction
        # (divergence documented: components wider than K hops sleep later).
        # min over neighbors == "no ineligible neighbor" via the adjacency.
        elig_ext = eligible | ~dyn  # non-dynamic neighbors don't block sleep
        elig_ext = _propagate_fixed_point(
            elig_ext, lambda f: f & ~neighbor_or(~f),
            params.sleep_propagation_iters,
        )
        new_sleeping = dyn & eligible & elig_ext
        bodies = bodies.replace(
            sleeping=new_sleeping,
            sleep_timer=timer,
            linvel=jnp.where(new_sleeping[:, None], 0.0, bodies.linvel),
            angvel=jnp.where(new_sleeping[:, None], 0.0, bodies.angvel),
        )

    # ------------------------------------------------------------------
    # 9. Persist contact cache (warmstart round-trip, SURVEY §5.4).
    # ------------------------------------------------------------------
    total_normal = constraints.impulse_acc + constraints.impulse   # [4, P]
    total_tan = constraints.tan_impulse_acc + constraints.tan_impulse
    pmask = constraints.point_mask                                  # [4, P]
    ws_twist_out = (
        getattr(constraints, "twist_impulse", None)
        if not coulomb else jnp.zeros_like(man.friction)
    )
    contacts = Contacts(
        pair_key=jnp.where(man.valid, man.pair_key, -1),
        body1=man.body1, body2=man.body2,
        collider1=man.collider1, collider2=man.collider2,
        normal=man.normal, point=man.point, dist=man.dist,
        feature_id=man.fid, point_active=man.point_active,
        num_points=jnp.sum(man.point_active.astype(jnp.int32), axis=0),
        active=man.valid, touching=man.touching,
        warmstart_impulse=constraints.impulse,
        warmstart_tangent_impulse=constraints.tan_impulse,
        warmstart_twist_impulse=ws_twist_out,
        impulse=total_normal * pmask,
        tangent_impulse=total_tan,
        friction=man.friction, restitution=man.restitution,
        events_or=man.active_events_or,
    )

    # Contact force events (physics_pipeline.rs:338-363): total manifold
    # normal force vs per-collider threshold.
    force_mag = jnp.sum(total_normal * pmask, axis=0) * inv_dt
    thr = man.force_threshold
    # Event gating by ActiveEvents flags (reference event_handler.rs:33:
    # only flagged colliders emit; wake-up above is NOT gated).
    from rapier_tpu.types import ACTIVE_EVENTS_COLLISION, ACTIVE_EVENTS_CONTACT_FORCE

    collision_gate = (man.active_events_or & ACTIVE_EVENTS_COLLISION) != 0
    force_gate = (man.active_events_or & ACTIVE_EVENTS_CONTACT_FORCE) != 0
    prev_eflags = prev_c.events_or
    force_events = man.touching & (force_mag > thr) & force_gate

    new_state = SceneState(
        bodies=bodies,
        colliders=colliders,
        contacts=contacts,
        joints=joints,
        meshes=state.meshes,
        multibodies=multibodies,
        hulls=state.hulls,
        step_count=state.step_count + 1,
    )
    events = StepEvents(
        started_pairs=started & collision_gate,
        stopped_keys=prev_c.pair_key,
        stopped=stopped & ((prev_eflags & ACTIVE_EVENTS_COLLISION) != 0),
        force_events=force_events,
        force_magnitude=force_mag,
        total_force=man.normal * force_mag[None, :],
        max_force_direction=man.normal,
        max_force_magnitude=force_mag,
        sensor_pairs=man.sensor,
        intersecting=man.sensor & man.touching,
        broadphase_overflow=bp_overflow,
        unsupported_pairs=man.unsupported,
        ccd_overflow=ccd_overflow,
        solver_overflow=solver_overflow,
    )
    return new_state, events
