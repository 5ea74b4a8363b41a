"""Stream compaction without scatters or serializing gathers.

TPU lowers scatters with computed indices to slow sequential loops, and
batched computed-index gathers (`jnp.take` with per-scene indices) cost
~25 ms per call at the 4096-scene bench scale
(tools/microbench_vmap_routing.py).  Two schemes, dispatched by size:

- SMALL K (pair-lane widths, K*max_out under _DENSE_ELEMS): rank-based and
  fully dense —
      rank[i]     = (# set bits at or before i) - 1     (one block cumsum)
      route[j, i] = mask[i] & (rank[i] == j)            (one equality)
  `compact_route` returns the [max_out, K] one-hot itself so callers
  compact lane FIELDS with one matmul instead of gathering via `src`
  (the round-4 pipeline spent ~40 ms/step in take(src) consumers and
  ~7.6 ms per hierarchical compact at the 4096-scene bench).

- LARGE K (broad-phase candidate grids, 10k+ lanes): the hierarchical
  block scheme — the [max_out, K] route would be GBs.  The mask is viewed
  as [NB, 128] blocks; the block holding the j-th set bit is found by
  counting block-cumsum entries below rank j (dense compares), the block
  row is fetched with a one-hot matmul (MXU), and the in-block position by
  a prefix count.

Everything is vectorized; order is preserved (deterministic).
"""

from __future__ import annotations

import jax.numpy as jnp

from rapier_tpu.utils.routing import block_cumsum

_BLOCK = 128

# Per-scene element budget for the dense [max_out, K] route (f32).  Vmapped
# over thousands of scenes this is the materialization that matters:
# 2^20 elems = 4 MB/scene.
_DENSE_ELEMS = 1 << 20


def compact_rank(mask):
    """0-based compaction rank of each lane + total set count."""
    inc = block_cumsum(mask.astype(jnp.int32))
    total = inc[-1]
    return inc - 1, total


def compact_route(mask, max_out: int):
    """One-hot routing matrix for compaction (small-K path).

    Returns (route [max_out, K] f32, valid [max_out] bool, overflow int32):
    route[j, i] = 1 iff lane i is the j-th set lane.  Compacted fields are
    `field @ route.T` and scatter back is `vals @ route`.  Rows beyond the
    population count are all-zero.
    """
    rank, total = compact_rank(mask)
    slots = jnp.arange(max_out, dtype=jnp.int32)
    route = (
        mask[None, :] & (rank[None, :] == slots[:, None])
    ).astype(jnp.float32)                                   # [MO, K]
    valid = slots < jnp.minimum(total, max_out)
    overflow = jnp.maximum(total - max_out, 0)
    return route, valid, overflow


def _compact_indices_dense(mask, max_out: int):
    n = mask.shape[0]
    route, valid, overflow = compact_route(mask, max_out)
    src = (route @ jnp.arange(n, dtype=jnp.float32)).astype(jnp.int32)
    src = jnp.clip(jnp.where(valid, src, 0), 0, n - 1)
    return src, valid, overflow


def _compact_indices_blocked(mask, max_out: int):
    n = mask.shape[0]
    nb = -(-n // _BLOCK)
    padded = jnp.zeros((nb * _BLOCK,), bool).at[:n].set(mask)
    m = padded.reshape(nb, _BLOCK)

    mi = m.astype(jnp.int32)
    block_counts = jnp.sum(mi, axis=1)                    # [NB]
    block_cum = jnp.cumsum(block_counts)                  # inclusive
    total = block_cum[-1]

    r = jnp.arange(1, max_out + 1, dtype=jnp.int32)       # target ranks
    blk = jnp.sum(
        (block_cum[None, :] < r[:, None]).astype(jnp.int32), axis=1
    )
    blk_c = jnp.minimum(blk, nb - 1)
    oh = (jnp.arange(nb)[None, :] == blk_c[:, None]).astype(jnp.float32)
    # Per-block local ranks computed ONCE over [NB, 128] (the previous
    # [MO, 128] per-slot cumsum was the dominant cost at the 4096-scene
    # bench, ~17 ms/step); the slot's column is then a one-hot compare on
    # the fetched rank row.
    local_rank = jnp.cumsum(mi, axis=1) - mi              # [NB, 128] excl.
    rank_row = oh @ jnp.where(m, local_rank, -1).astype(jnp.float32)
    prev = (oh @ (block_cum - block_counts).astype(jnp.float32)).astype(jnp.int32)

    p = (r - prev - 1).astype(jnp.float32)                # 0-based in-block
    iota = jnp.arange(_BLOCK, dtype=jnp.float32)
    col = jnp.sum(
        jnp.where(rank_row == p[:, None], iota[None, :], 0.0), axis=1
    ).astype(jnp.int32)

    src = blk_c * _BLOCK + jnp.minimum(col, _BLOCK - 1)
    valid = r <= jnp.minimum(total, max_out)
    src = jnp.clip(jnp.where(valid, src, 0), 0, n - 1)
    overflow = jnp.maximum(total - max_out, 0)
    return src, valid, overflow


def compact_indices(mask, max_out: int):
    """Indices of the first `max_out` True entries of `mask`.

    Returns (src [max_out] int32, valid [max_out] bool, overflow int32):
    src[j] = index of the (j+1)-th True entry (clamped when invalid).
    """
    if mask.shape[0] * max_out <= _DENSE_ELEMS:
        return _compact_indices_dense(mask, max_out)
    return _compact_indices_blocked(mask, max_out)
