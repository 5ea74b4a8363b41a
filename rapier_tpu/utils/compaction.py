"""Stream compaction without scatters or serializing gathers.

TPU lowers scatters with computed indices to slow sequential loops, and
batched `searchsorted` (binary search = 14 rounds of computed-index gathers)
serializes the same way — profiled at ~46 ms for a [512, 10816] -> 512-slot
compaction, the entire broad-phase budget.

This implementation is hierarchical and gather-free: the mask is viewed as
[NB, 128] blocks; the block holding the j-th set bit is found by counting
block-cumsum entries below rank j (dense compares), the block row is fetched
with a one-hot matmul (MXU), and the in-block position by a prefix count.
Everything is vectorized; order is preserved (deterministic).
"""

from __future__ import annotations

import jax.numpy as jnp

_BLOCK = 128


def compact_indices(mask, max_out: int):
    """Indices of the first `max_out` True entries of `mask`.

    Returns (src [max_out] int32, valid [max_out] bool, overflow int32):
    src[j] = index of the (j+1)-th True entry (clamped when invalid).
    """
    n = mask.shape[0]
    nb = -(-n // _BLOCK)
    padded = jnp.zeros((nb * _BLOCK,), bool).at[:n].set(mask)
    m = padded.reshape(nb, _BLOCK)

    mi = m.astype(jnp.int32)
    block_counts = jnp.sum(mi, axis=1)                    # [NB]
    block_cum = jnp.cumsum(block_counts)                  # inclusive
    total = block_cum[-1]

    r = jnp.arange(1, max_out + 1, dtype=jnp.int32)       # target ranks
    # Block of the r-th set bit: number of blocks whose cumulative count
    # stays below r.  [MO, NB] dense compare + reduce.
    blk = jnp.sum(
        (block_cum[None, :] < r[:, None]).astype(jnp.int32), axis=1
    )
    blk_c = jnp.minimum(blk, nb - 1)
    oh = (jnp.arange(nb)[None, :] == blk_c[:, None]).astype(jnp.float32)
    row = oh @ m.astype(jnp.float32)                      # [MO, 128] (MXU)
    prev = (oh @ (block_cum - block_counts).astype(jnp.float32)).astype(jnp.int32)

    # In-block rank p = r - prev; column = count of prefix sums below p.
    p = r - prev
    row_cum = jnp.cumsum(row, axis=1)
    col = jnp.sum((row_cum < p[:, None].astype(jnp.float32)).astype(jnp.int32), axis=1)

    src = blk_c * _BLOCK + jnp.minimum(col, _BLOCK - 1)
    valid = r <= jnp.minimum(total, max_out)
    src = jnp.clip(jnp.where(valid, src, 0), 0, n - 1)
    overflow = jnp.maximum(total - max_out, 0)
    return src, valid, overflow
