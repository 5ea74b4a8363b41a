"""Constraint graph coloring for parallel Gauss-Seidel sweeps.

The TPU recast of the reference's SIMD bucket packing / graph-coloring
`ParallelInteractionGroups` (src/dynamics/solver/interaction_groups.rs:37-130,
identified by SURVEY §2.3 as the blueprint): constraints sharing a *dynamic*
body must not run in the same parallel pass.  We compute a greedy
maximal-independent-set per color (Luby-style local-max selection with
bijective hashed priorities, fully deterministic), so a sweep over colors is
an exact sequential-impulse Gauss-Seidel iteration.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rapier_tpu.utils.routing import (
    DENSE_ROUTE_ELEMS, block_cumsum, make_segment_plan, segment_max,
)


def _hash32(x):
    """Bijective integer hash (Knuth multiplicative) for tie-free priorities."""
    return (x.astype(jnp.uint32) * jnp.uint32(2654435761)) ^ jnp.uint32(0x9E3779B9)


def color_constraints(b1, b2, dyn1, dyn2, valid, n_bodies: int, max_colors: int):
    """Color constraint lanes so no two same-color lanes share a dynamic body.

    Args:
      b1, b2: [K] int32 body indices (may be any value where invalid).
      dyn1, dyn2: [K] bool — whether that endpoint is a dynamic body (static /
        kinematic endpoints never conflict: the solver only writes dynamics).
      valid: [K] bool.
      n_bodies: body capacity N (a sentinel slot N absorbs inactive scatters).
      max_colors: static bound; lanes not colored in max_colors-1 rounds land
        in the last color (degrading those few lanes to Jacobi, which the
        soft-constraint cfm damps).

    Returns:
      color: [K] int32 in [0, max_colors) for valid lanes, max_colors for
        invalid lanes (so they are skipped by every color pass).
      num_colors: scalar int32, max used color + 1.
    """
    k = b1.shape[0]
    idx = jnp.arange(k, dtype=jnp.int32)
    w = _hash32(idx)
    sent = n_bodies  # sentinel slot

    color = jnp.where(valid, -1, max_colors)

    t1 = jnp.where(dyn1, b1, sent)
    t2 = jnp.where(dyn2, b2, sent)

    if k * (n_bodies + 1) <= DENSE_ROUTE_ELEMS:
        # One-hot body-membership masks (hoisted out of the rounds): per-body
        # max becomes a masked broadcast reduction — no TPU scatters, and the
        # per-lane "am I my bodies' max?" test is a masked reduction over the
        # same one-hots (no gathers either; TPU batched 1D gathers serialize).
        body_ids = jnp.arange(n_bodies + 1)
        oh1 = t1[:, None] == body_ids[None, :]   # [K, N+1] bool
        oh2 = t2[:, None] == body_ids[None, :]

        def round_body(color, r):
            unc = valid & (color < 0)
            wm = jnp.where(unc, w, jnp.uint32(0))[:, None]
            bw = jnp.maximum(
                jnp.max(jnp.where(oh1, wm, jnp.uint32(0)), axis=0),
                jnp.max(jnp.where(oh2, wm, jnp.uint32(0)), axis=0),
            )[None, :]
            bw1 = jnp.max(jnp.where(oh1, bw, jnp.uint32(0)), axis=1)
            bw2 = jnp.max(jnp.where(oh2, bw, jnp.uint32(0)), axis=1)
            sel = unc & (~dyn1 | (bw1 == w)) & (~dyn2 | (bw2 == w))
            return jnp.where(sel, r, color)
    else:
        # Large scenes: sorted segment plans replace the O(K*N) one-hots
        # (utils/routing.py) — identical selection rule, linear memory.
        plan1 = make_segment_plan(t1, n_bodies + 1)
        plan2 = make_segment_plan(t2, n_bodies + 1)

        def round_body(color, r):
            unc = valid & (color < 0)
            wm = jnp.where(unc, w, jnp.uint32(0))
            bw_tab = jnp.maximum(
                segment_max(wm, plan1, jnp.uint32(0)),
                segment_max(wm, plan2, jnp.uint32(0)),
            )
            bw1, bw2 = bw_tab[t1], bw_tab[t2]
            sel = unc & (~dyn1 | (bw1 == w)) & (~dyn2 | (bw2 == w))
            return jnp.where(sel, r, color)

    # Early-exit round loop: identical selection sequence as the fixed
    # unroll, but stops once every valid lane is colored (chromatic numbers
    # are usually well below max_colors; the spare rounds were pure cost).
    def cond(st):
        color, r = st
        return (r < max_colors - 1) & jnp.any(valid & (color < 0))

    def body(st):
        color, r = st
        return round_body(color, r), r + jnp.int32(1)

    color, _ = jax.lax.while_loop(cond, body, (color, jnp.int32(0)))

    color = jnp.where(valid & (color < 0), max_colors - 1, color)

    # ------------------------------------------------------------------
    # Greedy color-merge compaction.  Luby MIS stops expanding a color the
    # moment a priority tie-break fails, so late colors are tiny (measured
    # num_colors = 8 on the ~100-body bench where 4 suffice).  Each merged
    # color stays conflict-free — a color is only folded into an earlier one
    # when they share NO dynamic body — so Gauss-Seidel semantics are
    # unchanged while the solver's per-color sweep count (the dominant
    # Pallas-kernel cost) shrinks.  All ops are [max_colors, N]-sized.
    # ------------------------------------------------------------------
    col_oh = (
        color[:, None] == jnp.arange(max_colors)[None, :]
    ).astype(jnp.float32)                                     # [K, MC]
    occ1 = (t1[:, None] == jnp.arange(n_bodies + 1)[None, :])  # [K, N+1]
    counts = (col_oh.T @ occ1.astype(jnp.float32))            # [MC, N+1]
    occ2 = (t2[:, None] == jnp.arange(n_bodies + 1)[None, :])
    counts = counts + col_oh.T @ occ2.astype(jnp.float32)
    # Sentinel slot never conflicts.
    occ = (counts > 0).at[:, n_bodies].set(False)             # [MC, N+1] bool
    # A color with an internal body collision (only the max_colors-1
    # overflow fallback can have one) must never fold into an exact color —
    # it would silently degrade that color's Gauss-Seidel pass to Jacobi.
    self_ok = ~jnp.any(counts.at[:, n_bodies].set(0.0) > 1.0, axis=1)  # [MC]

    def merge_step(carry, c):
        mocc, cmap = carry
        occ_c = occ[c]                                        # [N+1]
        conflict = jnp.any(mocc & occ_c[None, :], axis=1)     # [MC]
        ids = jnp.arange(max_colors)
        cand = jnp.where((ids < c) & ~conflict & self_ok[c], ids, c)
        t = jnp.min(cand)
        tm = ids == t
        mocc = mocc | (tm[:, None] & occ_c[None, :])
        cmap = cmap.at[c].set(t)
        return (mocc, cmap), ()

    mocc0 = jnp.zeros_like(occ).at[0].set(occ[0])
    cmap0 = jnp.arange(max_colors, dtype=jnp.int32)
    (_, cmap), _ = jax.lax.scan(
        merge_step, (mocc0, cmap0), jnp.arange(1, max_colors)
    )
    # Renumber to a dense prefix (merged targets keep order).
    used = jnp.zeros((max_colors,), jnp.int32).at[cmap].add(1) > 0
    new_id = jnp.cumsum(used.astype(jnp.int32)) - 1
    cmap_dense = new_id[cmap]
    # Apply per lane via one-hot (no batched takes).
    color = jnp.where(
        valid,
        (col_oh @ cmap_dense.astype(jnp.float32)).astype(jnp.int32),
        max_colors,
    )
    num_colors = jnp.max(jnp.where(valid, color, -1)) + 1
    return color.astype(jnp.int32), num_colors.astype(jnp.int32)


def block_caps(total: int, max_colors: int, min_cap: int = 256):
    """Static per-color lane-capacity schedule for the blocked large-scene
    solver: front-loaded (Luby MIS rounds select geometrically shrinking
    independent sets) and 128-aligned.  sum(caps) ~ 1.3 * total, which is the
    per-sweep lane work of the blocked solve — within ~30% of the K-lane
    lower bound (every lane solves once per sweep), vs num_colors * K for
    the masked full-width sweep."""

    def ru(x):
        return max(min_cap, -(-x // 128) * 128)

    sched = [2, 4, 4, 8, 8, 16, 16, 16]
    caps = [ru(total // f) for f in sched[:max_colors]]
    while len(caps) < max_colors:
        caps.append(min_cap)
    return tuple(caps)


def color_constraints_blocked(b1, b2, dyn1, dyn2, valid, n_bodies: int,
                              caps: tuple):
    """Capped Luby coloring producing a contiguous blocked lane layout.

    Round r keeps at most caps[r] of its selected independent set (by lane
    order); unkept lanes stay uncolored for later rounds.  A subset of an
    independent set is independent, so every color except the last is
    conflict-free.  The LAST round takes every remaining lane (no
    independence guarantee — the solver's segment-sum scatter degrades those
    lanes to Jacobi accumulation, as the uncapped coloring already did for
    its overflow color).  Lanes beyond the last cap are dropped (reported).

    Returns:
      color: [K] int32 block id per lane (len(caps) = uncolored/invalid).
      slot: [K] int32 position in the blocked layout (W = sum(caps) =
        dropped/invalid), slot = start[color] + rank-within-color.
      dropped: scalar int32 — valid lanes that did not get a slot.
    """
    k = b1.shape[0]
    n_colors = len(caps)
    starts = np.cumsum((0,) + tuple(caps))[:-1]
    w_total = int(np.sum(caps))

    idx = jnp.arange(k, dtype=jnp.int32)
    w = _hash32(idx)
    sent = n_bodies
    t1 = jnp.where(dyn1, b1, sent)
    t2 = jnp.where(dyn2, b2, sent)

    # Blocked coloring is the large-scene path: segment plans, not one-hots.
    # ONE plan over the concatenated endpoints: each round's per-body max is
    # a single segmented scan over [t1; t2] instead of two (the scans are
    # the round cost at 39k lanes).
    plan_pair = make_segment_plan(jnp.concatenate([t1, t2]), n_bodies + 1)

    color = jnp.where(valid, -1, n_colors)
    slot = jnp.full((k,), w_total, jnp.int32)

    def round_r(color, slot, r):
        unc = valid & (color < 0)
        if r == n_colors - 1:
            sel = unc          # Jacobi tail: everything left, capped below
        else:
            wm = jnp.where(unc, w, jnp.uint32(0))
            bw_tab = segment_max(
                jnp.concatenate([wm, wm]), plan_pair, jnp.uint32(0)
            )
            sel = unc & (~dyn1 | (bw_tab[t1] == w)) & (~dyn2 | (bw_tab[t2] == w))
        rank = block_cumsum(sel.astype(jnp.int32)) - 1
        keep = sel & (rank < caps[r])
        color = jnp.where(keep, r, color)
        slot = jnp.where(keep, starts[r] + rank, slot)
        return color, slot

    for r in range(n_colors):
        if r < 2:
            color, slot = round_r(color, slot, r)
        else:
            # Runtime-skip spare rounds once everything is colored.
            color, slot = jax.lax.cond(
                jnp.any(valid & (color < 0)),
                lambda cs, _r=r: round_r(cs[0], cs[1], _r),
                lambda cs: cs,
                (color, slot),
            )
    dropped = jnp.sum((valid & (color < 0)).astype(jnp.int32))
    return color.astype(jnp.int32), slot.astype(jnp.int32), dropped
