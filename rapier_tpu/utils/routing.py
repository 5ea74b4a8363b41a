"""Size-dispatched gather/scatter routing for large single scenes.

Small scenes route body<->lane traffic through one-hot matmuls ([K, N]
equality masks contracted on the MXU) — at RL-batch sizes (N ~ 128,
K ~ 512) that beats TPU's computed-index gather/scatter lowering by a wide
margin (round-1 profiling).  But the one-hot matrices are O(K*N): a
4,900-box pyramid (N ~ 5k, K ~ 40k lanes) would spend gigabytes of HBM per
pass, and the dense [Pn, Po] warmstart join is O(P^2).  Above the
thresholds here, the pipeline switches (at TRACE time — shapes are static)
to linear alternatives:

- gathers: plain `jnp.take` (one dynamic-gather per field),
- scatter-add / scatter-max: sort lanes by target id ONCE (the indices are
  loop-invariant within a step), then cumsum/cummax over the sorted values
  and difference/read at precomputed segment boundaries.  No XLA scatter is
  ever emitted (TPU lowers computed-index scatters to serial loops).

The reference has no analog (its solver is a sequential arena walk); this
module is the TPU recast of "index the constraint graph efficiently".
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# One-hot [K, N] routing masks above this element count are replaced by
# take/segment paths.  2**24 f32 elements = 64 MB per mask: comfortably
# in-budget for the RL-batch scenes (which also vmap over thousands of
# scenes) and far below the GB-scale masks a 5k-body scene would need.
DENSE_ROUTE_ELEMS = 2**24

# Dense [Pn, Po] warmstart-join limit (physics_pipeline._match_previous).
DENSE_JOIN_ELEMS = 2**26


_BLK = 128


def route_rows(rows, idx, n: int):
    """Gather columns of a component-leading table: rows [..., N] indexed by
    idx [K] -> [..., K].

    Size-dispatched: a [K, N] one-hot matmul at small sizes (batched
    computed-index gathers cost ~2.9 ms per [B, C]-sized take at the
    4096-scene bench vs 0.03 ms for the matmul —
    tools/microbench_vmap_routing.py), plain take above the dense limit
    (large single scenes, where the take is un-vmapped and the one-hot
    would be O(K*N) memory)."""
    k = idx.shape[0]
    if k * n <= DENSE_ROUTE_ELEMS:
        oh = (idx[:, None] == jnp.arange(n)[None, :]).astype(rows.dtype
              if jnp.issubdtype(rows.dtype, jnp.floating) else jnp.float32)
        out = rows.astype(oh.dtype) @ oh.T
        return out.astype(rows.dtype) if not jnp.issubdtype(
            rows.dtype, jnp.floating) else out
    return jnp.take(rows, idx, axis=-1)


def searchsorted_blocked(sorted_vals, queries, side: str = "left"):
    """Two-level searchsorted: XLA lowers jnp.searchsorted to a binary search
    of computed-index gathers (~14 ns/element on TPU — 32 ms/step of the
    round-4 stack-24 profile came from the plan builders' searchsorted
    alone).  This version counts with dense compares + one one-hot matmul:

      result[q] = #elements < q  (side=left; <= for right)
                = 128 * (#blocks whose last element < q)   [dense [Q, NB]]
                  + in-block count of the boundary block    [one-hot fetch]
    """
    k = sorted_vals.shape[0]
    q = queries.shape[0]
    nb = -(-k // _BLK)
    pad = nb * _BLK - k
    # Pad with the dtype max; padded slots are additionally masked by the
    # valid-iota test below (so side="right" with max-valued queries works).
    if jnp.issubdtype(sorted_vals.dtype, jnp.floating):
        big = jnp.finfo(sorted_vals.dtype).max
    else:
        big = jnp.iinfo(sorted_vals.dtype).max
    padded = jnp.concatenate(
        [sorted_vals, jnp.full((pad,), big, sorted_vals.dtype)]
    ).reshape(nb, _BLK)
    block_last = padded[:, -1]                              # [NB]

    def lt(a, b):
        return (a < b) if side == "left" else (a <= b)

    nfull = jnp.sum(
        lt(block_last[None, :], queries[:, None]).astype(jnp.int32), axis=1
    )                                                        # [Q]
    bc = jnp.minimum(nfull, nb - 1)
    oh = (jnp.arange(nb)[None, :] == bc[:, None]).astype(jnp.float32)
    if jnp.issubdtype(sorted_vals.dtype, jnp.floating):
        row = (oh @ padded.astype(jnp.float32)).astype(sorted_vals.dtype)
    else:
        # Exact int32 fetch: one f32 matmul only carries ~2^24 of integer
        # precision (pair keys reach c^2 ~ 24M), so route 16-bit halves
        # separately and recombine (arithmetic >> keeps sign semantics:
        # hi*65536 + lo == value for negatives too).
        lo = oh @ (padded & 0xFFFF).astype(jnp.float32)
        hi = oh @ (padded >> 16).astype(jnp.float32)
        row = (hi.astype(jnp.int32) * 65536 + lo.astype(jnp.int32)).astype(
            sorted_vals.dtype
        )
    jvalid = (bc[:, None] * _BLK + jnp.arange(_BLK)[None, :]) < k
    n_in = jnp.sum(
        (lt(row, queries[:, None]) & jvalid).astype(jnp.int32), axis=1
    )
    return jnp.minimum(bc * _BLK + n_in, k).astype(jnp.int32)


def block_cumsum(x):
    """1-D inclusive cumsum via 128-blocks: within-block scans run across
    sublanes instead of XLA's log-depth full-length reduce_window chain
    (~0.5 ms per 39k-lane cumsum on v5e; this is ~10x cheaper)."""
    n = x.shape[0]
    nb = -(-n // _BLK)
    padded = jnp.concatenate(
        [x, jnp.zeros((nb * _BLK - n,), x.dtype)]
    ).reshape(nb, _BLK)
    inner = jnp.cumsum(padded, axis=1)                       # [NB, 128]
    carry = jnp.concatenate(
        [jnp.zeros((1,), x.dtype), jnp.cumsum(inner[:, -1])[:-1]]
    )                                                        # [NB]
    return (inner + carry[:, None]).reshape(-1)[:n]


class SegmentPlan(NamedTuple):
    """Precomputed sort-order routing of K lanes into N segments.

    Build once per step per index array (argsort + boundary search), reuse
    for every segment reduction over those indices (solver sweeps, coloring
    rounds, wake propagation hops all re-reduce with different values but
    identical indices).
    """

    perm: jax.Array        # [K] int32 — lane order sorted by segment id
    sorted_ids: jax.Array  # [K] int32 — segment id per sorted slot
    starts: jax.Array      # [N] int32 — first sorted slot of each segment
    ends: jax.Array        # [N] int32 — one past the last sorted slot
    n_segments: int


def make_segment_plan(ids, n_segments: int) -> SegmentPlan:
    """ids: [K] int32 in [0, n_segments); out-of-range ids are clamped into
    the last segment, so callers should direct masked lanes to a sentinel
    segment they ignore."""
    ids = jnp.clip(ids, 0, n_segments - 1)
    perm = jnp.argsort(ids)
    sorted_ids = ids[perm]
    edges = jnp.arange(n_segments, dtype=ids.dtype)
    starts = searchsorted_blocked(sorted_ids, edges, side="left")
    ends = searchsorted_blocked(sorted_ids, edges, side="right")
    return SegmentPlan(perm.astype(jnp.int32), sorted_ids.astype(jnp.int32),
                       starts.astype(jnp.int32), ends.astype(jnp.int32),
                       n_segments)


def segment_sum(values, plan: SegmentPlan):
    """Sum lane values [..., K] into segments [..., N] (cumsum + boundary
    difference; no scatter)."""
    vs = jnp.take(values, plan.perm, axis=-1)
    zero = jnp.zeros(vs.shape[:-1] + (1,), vs.dtype)
    cs = jnp.concatenate([zero, jnp.cumsum(vs, axis=-1)], axis=-1)
    return (jnp.take(cs, plan.ends, axis=-1)
            - jnp.take(cs, plan.starts, axis=-1))


def segment_max(values, plan: SegmentPlan, empty):
    """Max of lane values [..., K] per segment [..., N]; `empty` fills
    segments with no lanes.  A SEGMENTED max-scan (associative_scan with a
    boundary-reset combiner — log-depth, no scatter) read at each segment's
    last slot; a plain cummax would leak maxima across segments."""
    vs = jnp.take(values, plan.perm, axis=-1)
    ids_b = jnp.broadcast_to(plan.sorted_ids, vs.shape)

    def combine(a, b):
        ia, ma = a
        ib, mb = b
        return ib, jnp.where(ia == ib, jnp.maximum(ma, mb), mb)

    _, sm = jax.lax.associative_scan(combine, (ids_b, vs), axis=-1)
    out = jnp.take(sm, jnp.maximum(plan.ends - 1, 0), axis=-1)
    has = plan.ends > plan.starts
    return jnp.where(has, out, empty)


def segment_any(values_bool, plan: SegmentPlan):
    """OR of boolean lane values per segment."""
    return segment_max(values_bool.astype(jnp.int32), plan, 0) > 0
