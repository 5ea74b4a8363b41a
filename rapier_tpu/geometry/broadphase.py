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
    return find_pairs_all(mins, maxs, colliders, body_type, max_pairs)
