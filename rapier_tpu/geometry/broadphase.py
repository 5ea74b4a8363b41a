"""Broad phase: AABB pair finding as dense, sort-based kernels.

Replaces the reference's incremental BVH broad phase
(src/geometry/broad_phase_bvh.rs:92-256) with TPU-friendly strategies
(SURVEY §7): all-pairs masked testing for small scenes (the vmapped-RL case)
and sort-based sweep-and-prune with a fixed window for large scenes.  Both
produce a fixed-capacity pair buffer + validity mask via cumsum compaction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from rapier_tpu.types import BodyType, BroadPhaseKind


def _compact_pairs(c1, c2, mask, max_pairs):
    """Compact masked candidate pairs into a fixed [P] buffer.

    Deterministic: preserves candidate order.  Overflowing pairs are dropped
    and counted (graceful degradation per SURVEY §7 hard-part #1).  Uses the
    gather-based compaction (utils/compaction.py) — no TPU scatters.
    """
    from rapier_tpu.utils.compaction import compact_indices

    src, valid, overflow = compact_indices(mask, max_pairs)
    out1 = jnp.where(valid, jnp.asarray(c1, jnp.int32)[src], -1)
    out2 = jnp.where(valid, jnp.asarray(c2, jnp.int32)[src], -1)
    return out1, out2, valid, overflow


@functools.lru_cache(maxsize=None)
def _triu_indices(c: int):
    # NOTE: cache NumPy only — caching jnp arrays created inside a jit trace
    # leaks tracers across traces.
    i, j = np.triu_indices(c, k=1)
    return i.astype(np.int32), j.astype(np.int32)


def find_pairs_all(mins, maxs, colliders, body_type, max_pairs: int):
    """All-pairs O(C^2) broad phase, fully dense (no gathers: TPU batched
    gathers are slow; [C, C] broadcasting is pure VPU work).
    Right choice for C <~ 512."""
    c = mins.shape[0]
    overlap = jnp.all(
        (mins[:, None, :] <= maxs[None, :, :])
        & (mins[None, :, :] <= maxs[:, None, :]),
        axis=-1,
    )                                               # [C, C]

    enabled = colliders.enabled
    parent = colliders.parent
    safe_p = jnp.maximum(parent, 0)
    from rapier_tpu.utils.routing import route_rows

    bt_r = route_rows(
        body_type[None].astype(jnp.float32), safe_p, body_type.shape[0]
    )[0].astype(jnp.int32)
    bt = jnp.where(parent >= 0, bt_r, int(BodyType.FIXED))
    g = colliders.collision_groups
    m, f = g >> 16, g & 0xFFFF

    # ActiveCollisionTypes test, broadcast [C, C] (collider_components.rs:282
    # test(); either side's mask may allow the combination).
    act = colliders.active_collision_types
    ti, tj = bt[:, None], bt[None, :]

    def _act(a):
        return ((((a >> (ti * 4)) & 15) & (1 << tj)) != 0) | (
            (((a >> (tj * 4)) & 15) & (1 << ti)) != 0
        )

    type_ok = _act(act[:, None]) | _act(act[None, :])

    ok = (
        overlap
        & (enabled[:, None] & enabled[None, :])
        & ~((parent[:, None] == parent[None, :]) & (parent[:, None] >= 0))
        & type_ok
        & ((m[:, None] & f[None, :]) != 0)
        & ((m[None, :] & f[:, None]) != 0)
    )
    # Upper triangle only.
    idx = jnp.arange(c)
    ok = ok & (idx[:, None] < idx[None, :])

    # Compact the flattened [C*C] mask; candidate indices derive
    # arithmetically from the compacted position (no index tables).
    from rapier_tpu.utils.compaction import compact_indices

    src, valid, overflow = compact_indices(ok.reshape(-1), max_pairs)
    out1 = jnp.where(valid, src // c, -1)
    out2 = jnp.where(valid, src % c, -1)
    return out1, out2, valid, overflow


K_LONG = 8  # colliders with the longest sweep-axis intervals go global


def find_pairs_sap(mins, maxs, colliders, body_type, max_pairs: int, window: int):
    """Sort-based sweep-and-prune with a fixed candidate window + a global
    long-collider set.

    Sorts AABB minima along the highest-variance axis; each collider is
    tested against the next `window` colliders in sorted order.  The K_LONG
    colliders with the LONGEST sweep-axis intervals (grounds, walls) are
    excluded from the window and paired against EVERY collider instead —
    the standard SAP long-object fix.  Round-4 lacked it: a 100-unit ground
    sorts first and only ever paired with its 96 window neighbors, so most
    of a big pyramid's base row had NO ground contacts (the honest-overflow
    bench assertion caught 4,489 silently missed pairs on stack-24; the
    round-3/4 pyramid steps/s rows measured a sinking scene).  Remaining
    long colliders beyond K_LONG still surface in `overflow`.

    Gather-free inner loop: every per-collider field is gathered into sorted
    order ONCE ([c]-sized gathers); the window candidates (i, i+k) then come
    from k-shifted static slices of the sorted arrays — no [c*window]-sized
    computed gathers (those measured ~40 ms/step on a 4.9k-collider pyramid,
    the entire round-3 broad-phase cost).
    """
    c = mins.shape[0]
    centers = 0.5 * (mins + maxs)
    var = jnp.var(jnp.where(colliders.enabled[:, None], centers, 0.0), axis=0)
    axis = jnp.argmax(var)
    axis_oh = (jnp.arange(3) == axis).astype(mins.dtype)       # [3]

    key = jnp.where(colliders.enabled, jnp.sum(mins * axis_oh, -1), jnp.inf)
    order = jnp.argsort(key).astype(jnp.int32)

    # Sorted-order per-collider fields (one [c]-sized gather each).
    s_min = mins[order]
    s_max = maxs[order]
    s_key = key[order]
    en_s = colliders.enabled[order]
    par_s = colliders.parent[order]
    bt_s = jnp.where(
        par_s >= 0, body_type[jnp.maximum(par_s, 0)], int(BodyType.FIXED)
    )
    act_s = colliders.active_collision_types[order]
    g_s = colliders.collision_groups[order]
    m_s, f_s = g_s >> 16, g_s & 0xFFFF
    smax_axis = jnp.sum(s_max * axis_oh, -1)                    # [c]

    def win(arr, fill):
        """[c, ...] -> [c, window, ...]: out[i, k] = arr[i + k + 1]."""
        pad = jnp.full((window,) + arr.shape[1:], fill, arr.dtype)
        ext = jnp.concatenate([arr, pad], axis=0)
        return jnp.stack([ext[k + 1:k + 1 + c] for k in range(window)], axis=1)

    # Interval overlap along the sweep axis + full AABB overlap, [c, window].
    sweep_ok = win(s_key, jnp.inf) <= smax_axis[:, None]
    j_min = win(s_min, jnp.inf)                                 # [c, W, 3]
    j_max = win(s_max, -jnp.inf)
    aabb_ok = jnp.all(
        (s_min[:, None, :] <= j_max) & (j_min <= s_max[:, None, :]), axis=-1
    )

    # Pair filters (reference narrow_phase.rs:834-932 hoisted), elementwise
    # over the [c, window] candidate grid.
    en_ok = en_s[:, None] & win(en_s, False)
    par_j = win(par_s, jnp.int32(-1))
    same_parent = (par_s[:, None] == par_j) & (par_s[:, None] >= 0)
    ti = bt_s[:, None]
    tj = win(bt_s, jnp.int32(BodyType.FIXED))

    def _act(a):
        return ((((a >> (ti * 4)) & 15) & (1 << tj)) != 0) | (
            (((a >> (tj * 4)) & 15) & (1 << ti)) != 0
        )

    type_ok = _act(act_s[:, None]) | _act(win(act_s, jnp.int32(0)))
    groups_ok = ((m_s[:, None] & win(f_s, jnp.int32(0))) != 0) & (
        (win(m_s, jnp.int32(0)) & f_s[:, None]) != 0
    )

    mask = (sweep_ok & aabb_ok & en_ok & ~same_parent & type_ok & groups_ok)

    # ---- global long-collider pairs ----
    interval = jnp.where(en_s, smax_axis - s_key, -jnp.inf)     # [c]
    k_long = min(K_LONG, c)
    _, long_slots = jax.lax.top_k(interval, k_long)             # sorted slots
    long_rank = jnp.full((c,), k_long, jnp.int32).at[long_slots].set(
        jnp.arange(k_long, dtype=jnp.int32))
    is_long = long_rank < k_long                                # [c] sorted

    # Exclude long colliders from the windowed sweep entirely (their pairs
    # come from the global grid; keeping both would duplicate contacts).
    mask = mask & ~is_long[:, None] & ~win(is_long, True)

    # [k_long, c] grid: every long collider vs every collider.  Small-row
    # gathers (8 rows) are cheap even batched.
    li = long_slots
    gl_min = s_min[li]                                          # [K, 3]
    gl_max = s_max[li]
    gl_overlap = jnp.all(
        (gl_min[:, None, :] <= s_max[None, :, :])
        & (s_min[None, :, :] <= gl_max[:, None, :]), axis=-1)
    gl_en = en_s[li][:, None] & en_s[None, :]
    gl_same_parent = (
        (par_s[li][:, None] == par_s[None, :]) & (par_s[li][:, None] >= 0))
    gti = bt_s[li][:, None]
    gtj = bt_s[None, :]

    def _gact(a):
        return ((((a >> (gti * 4)) & 15) & (1 << gtj)) != 0) | (
            (((a >> (gtj * 4)) & 15) & (1 << gti)) != 0)

    gl_type = _gact(act_s[li][:, None]) | _gact(act_s[None, :])
    gl_groups = ((m_s[li][:, None] & f_s[None, :]) != 0) & (
        (m_s[None, :] & f_s[li][:, None]) != 0)
    # Dedup long-vs-long: count the pair once (at the lower long rank).
    gl_rank = jnp.arange(k_long)[:, None]
    gl_dedup = ~is_long[None, :] | (long_rank[None, :] > gl_rank)
    gl_self = li[:, None] == jnp.arange(c)[None, :]
    gl_mask = (gl_overlap & gl_en & ~gl_same_parent & gl_type & gl_groups
               & gl_dedup & ~gl_self)

    c1_grid = jnp.broadcast_to(order[:, None], (c, window))
    c2_grid = win(order, jnp.int32(0))
    gl_c1 = jnp.broadcast_to(order[li][:, None], (k_long, c))
    gl_c2 = jnp.broadcast_to(order[None, :], (k_long, c))
    all_a = jnp.concatenate([c1_grid.reshape(-1), gl_c1.reshape(-1)])
    all_b = jnp.concatenate([c2_grid.reshape(-1), gl_c2.reshape(-1)])
    all_mask = jnp.concatenate([mask.reshape(-1), gl_mask.reshape(-1)])
    lo = jnp.minimum(all_a, all_b)
    hi = jnp.maximum(all_a, all_b)
    out1, out2, valid, overflow = _compact_pairs(lo, hi, all_mask, max_pairs)

    # Window-miss detection: i's interval still open at i+window (long
    # colliders excluded — the global grid covers them).
    base = jnp.arange(c)
    far = jnp.minimum(base + window, c - 1)
    missed = (base + window < c) & (s_key[far] <= smax_axis) & ~is_long
    overflow = overflow + jnp.sum(missed.astype(jnp.int32))
    return out1, out2, valid, overflow


def find_pairs(mins, maxs, colliders, body_type, max_pairs: int,
               kind: int, window: int = 64):
    if kind == BroadPhaseKind.SAP:
        return find_pairs_sap(mins, maxs, colliders, body_type, max_pairs, window)
    if kind == BroadPhaseKind.GRID:
        return find_pairs_grid(mins, maxs, colliders, body_type, max_pairs)
    return find_pairs_all(mins, maxs, colliders, body_type, max_pairs)


# ---------------------------------------------------------------------------
# Uniform-grid broad phase (BroadPhaseKind.GRID)
# ---------------------------------------------------------------------------

GRID_CELL_CAP = 8      # colliders per cell the candidate runs assume
GRID_M = 1024          # cells per axis (10 bits; coords clipped = extra
                       # candidates at the border, never missed pairs)


def find_pairs_grid(mins, maxs, colliders, body_type, max_pairs: int):
    """Uniform-grid broad phase — COMPLETE for dense 3D piles.

    Windowed SAP cannot cover a dense pile: two touching boxes separated
    along z at the same x are a whole x-slab apart in x-sorted order (a
    24-stack pyramid leaves ~4.5k resting pairs outside any affordable
    window — the honest-overflow assertion caught it in round 5).  Here the
    cell size is the largest (non-long) collider extent, so any overlapping
    pair is at most one cell apart per axis.  Colliders sort by the
    composite key (cx*M + cz)*M + cy (y minor):

    - same xz-column neighbors are a STATIC window of the sorted order,
    - the four forward xz-column offsets ((1,-1),(1,0),(1,1),(0,1)) are
      CONTIGUOUS 3-y-cell runs found by one blocked searchsorted each and
      gathered as [C, L] candidate blocks (un-vmapped takes; ~20 ms at 39k
      colliders),
    - the K_LONG longest colliders (grounds, walls) pair globally, exactly
      as in find_pairs_sap.

    Cell overflow (more than GRID_CELL_CAP in a cell) and run truncation
    surface in `overflow` — degradation is counted, never silent.
    """
    c = mins.shape[0]
    en = colliders.enabled
    ext = jnp.where(en[:, None], maxs - mins, 0.0)          # [c, 3]

    # Long colliders: global set (top-K by max extent).
    max_ext = jnp.max(ext, axis=-1)
    k_long = min(K_LONG, c)
    _, long_idx = jax.lax.top_k(jnp.where(en, max_ext, -jnp.inf), k_long)
    long_rank = jnp.full((c,), k_long, jnp.int32).at[long_idx].set(
        jnp.arange(k_long, dtype=jnp.int32))
    is_long = long_rank < k_long                            # [c] original ids

    # Cell size from the largest non-long extent (+5% slack).
    h = jnp.maximum(jnp.max(jnp.where(is_long, 0.0, max_ext)), 1e-3) * 1.05
    ctr = 0.5 * (mins + maxs)
    origin = jnp.min(jnp.where(en[:, None], ctr, jnp.inf), axis=0)
    cell = jnp.clip(jnp.floor((ctr - origin) / h).astype(jnp.int32),
                    0, GRID_M - 1)                          # [c, 3]
    key = (cell[:, 0] * GRID_M + cell[:, 2]) * GRID_M + cell[:, 1]
    key = jnp.where(en & ~is_long, key, jnp.iinfo(jnp.int32).max)

    order = jnp.argsort(key).astype(jnp.int32)
    skey = key[order]

    # Sorted staged table (one [c]-gather per field, like SAP).
    s_min = mins[order]
    s_max = maxs[order]
    en_s = colliders.enabled[order] & ~is_long[order]
    par_s = colliders.parent[order]
    from rapier_tpu.utils.routing import route_rows

    bt_r = route_rows(
        body_type[None].astype(jnp.float32), jnp.maximum(par_s, 0),
        body_type.shape[0])[0].astype(jnp.int32)
    bt_s = jnp.where(par_s >= 0, bt_r, int(BodyType.FIXED))
    act_s = colliders.active_collision_types[order]
    g_s = colliders.collision_groups[order]
    m_s, f_s = g_s >> 16, g_s & 0xFFFF

    def pair_filter(i_sl, j_block):
        """[c, L]-shaped filters between sorted slot i and candidate slots."""
        en_ok = en_s[:, None] & jnp.take(en_s, j_block)
        par_j = jnp.take(par_s, j_block)
        same_parent = (par_s[:, None] == par_j) & (par_s[:, None] >= 0)
        ti = bt_s[:, None]
        tj = jnp.take(bt_s, j_block)

        def _act(a):
            return ((((a >> (ti * 4)) & 15) & (1 << tj)) != 0) | (
                (((a >> (tj * 4)) & 15) & (1 << ti)) != 0)

        type_ok = _act(act_s[:, None]) | _act(jnp.take(act_s, j_block))
        groups_ok = (
            ((m_s[:, None] & jnp.take(f_s, j_block)) != 0)
            & ((jnp.take(m_s, j_block) & f_s[:, None]) != 0))
        jmin = jnp.take(s_min, j_block, axis=0)             # [c, L, 3]
        jmax = jnp.take(s_max, j_block, axis=0)
        aabb = jnp.all((s_min[:, None, :] <= jmax)
                       & (jmin <= s_max[:, None, :]), axis=-1)
        return en_ok & ~same_parent & type_ok & groups_ok & aabb

    slot = jnp.arange(c)
    masks, ids_a, ids_b = [], [], []
    overflow = jnp.int32(0)

    # (0, 0) column: static forward window (covers same + adjacent y cells).
    w0 = 3 * GRID_CELL_CAP

    def win(arr, fill):
        pad = jnp.full((w0,) + arr.shape[1:], fill, arr.dtype)
        e2 = jnp.concatenate([arr, pad], axis=0)
        return jnp.stack([e2[k + 1:k + 1 + c] for k in range(w0)], axis=1)

    own_j = jnp.minimum(slot[:, None] + 1 + jnp.arange(w0)[None, :], c - 1)
    in_col = win(skey, jnp.iinfo(jnp.int32).max) <= skey[:, None] + 1
    m_own = pair_filter(slot, own_j) & in_col & (
        (slot[:, None] + 1 + jnp.arange(w0)[None, :]) < c)
    masks.append(m_own.reshape(-1))
    ids_a.append(jnp.broadcast_to(order[:, None], (c, w0)).reshape(-1))
    ids_b.append(jnp.take(order, own_j).reshape(-1))
    # Column-run truncation: same-column run still open past the window.
    far0 = jnp.minimum(slot + w0, c - 1)
    overflow += jnp.sum(((slot + w0 < c)
                         & (skey[far0] <= skey + 1)).astype(jnp.int32))

    from rapier_tpu.utils.routing import searchsorted_blocked

    L = 3 * GRID_CELL_CAP
    for dx, dz in ((1, -1), (1, 0), (1, 1), (0, 1)):
        off = (dx * GRID_M + dz) * GRID_M
        lo_key = skey + off - 1          # (dx, dz, cy-1)
        hi_key = skey + off + 1          # (dx, dz, cy+1)
        pos = searchsorted_blocked(skey, lo_key)            # [c]
        j_block = jnp.minimum(pos[:, None] + jnp.arange(L)[None, :], c - 1)
        jkey = jnp.take(skey, j_block)
        in_run = (jkey >= lo_key[:, None]) & (jkey <= hi_key[:, None]) & (
            (pos[:, None] + jnp.arange(L)[None, :]) < c)
        m_off = pair_filter(slot, j_block) & in_run
        masks.append(m_off.reshape(-1))
        ids_a.append(jnp.broadcast_to(order[:, None], (c, L)).reshape(-1))
        ids_b.append(jnp.take(order, j_block).reshape(-1))
        # Run truncation: the 3-cell run continues past L candidates.
        farL = jnp.minimum(pos + L, c - 1)
        overflow += jnp.sum(((pos + L < c)
                             & (skey[farL] <= hi_key)).astype(jnp.int32))

    # Global long-collider pairs (same construction as find_pairs_sap).
    li = long_idx                                           # original ids
    gl_overlap = jnp.all(
        (mins[li][:, None, :] <= maxs[None, :, :])
        & (mins[None, :, :] <= maxs[li][:, None, :]), axis=-1)
    gl_en = (colliders.enabled[li][:, None] & colliders.enabled[None, :])
    parent = colliders.parent
    gl_same = ((parent[li][:, None] == parent[None, :])
               & (parent[li][:, None] >= 0))
    bt_all = jnp.where(
        parent >= 0,
        route_rows(body_type[None].astype(jnp.float32),
                   jnp.maximum(parent, 0),
                   body_type.shape[0])[0].astype(jnp.int32),
        int(BodyType.FIXED))
    gti = bt_all[li][:, None]
    gtj = bt_all[None, :]

    def _gact(a):
        return ((((a >> (gti * 4)) & 15) & (1 << gtj)) != 0) | (
            (((a >> (gtj * 4)) & 15) & (1 << gti)) != 0)

    act = colliders.active_collision_types
    gall = colliders.collision_groups
    mm, ff = gall >> 16, gall & 0xFFFF
    gl_type = _gact(act[li][:, None]) | _gact(act[None, :])
    gl_groups = (((mm[li][:, None] & ff[None, :]) != 0)
                 & ((mm[None, :] & ff[li][:, None]) != 0))
    gl_rank = jnp.arange(k_long)[:, None]
    gl_dedup = ~is_long[None, :] | (long_rank[None, :] > gl_rank)
    gl_self = li[:, None] == jnp.arange(c)[None, :]
    gl_mask = (gl_overlap & gl_en & ~gl_same & gl_type & gl_groups
               & gl_dedup & ~gl_self)
    masks.append(gl_mask.reshape(-1))
    ids_a.append(jnp.broadcast_to(li[:, None], (k_long, c)).reshape(-1))
    ids_b.append(jnp.broadcast_to(jnp.arange(c)[None, :],
                                  (k_long, c)).reshape(-1))

    all_a = jnp.concatenate(ids_a)
    all_b = jnp.concatenate(ids_b)
    all_m = jnp.concatenate(masks)
    lo = jnp.minimum(all_a, all_b)
    hi = jnp.maximum(all_a, all_b)
    out1, out2, valid, ovf = _compact_pairs(lo, hi, all_m, max_pairs)
    return out1, out2, valid, ovf + overflow
