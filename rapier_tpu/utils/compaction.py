"""Stream compaction without scatters.

TPU lowers scatters with computed indices to slow sequential loops; the
gather-based formulation (cumsum + vectorized binary search for "index of the
j-th set bit") keeps compaction on the vector units.  Deterministic: preserves
input order.
"""

from __future__ import annotations

import jax.numpy as jnp


def compact_indices(mask, max_out: int):
    """Indices of the first `max_out` True entries of `mask`.

    Returns (src [max_out] int32, valid [max_out] bool, overflow int32):
    src[j] = index of the (j+1)-th True entry (clamped when invalid).
    """
    csum = jnp.cumsum(mask.astype(jnp.int32))
    total = csum[-1] if csum.shape[0] > 0 else jnp.int32(0)
    j = jnp.arange(max_out, dtype=jnp.int32)
    src = jnp.searchsorted(csum, j + 1).astype(jnp.int32)
    valid = j < jnp.minimum(total, max_out)
    src = jnp.clip(src, 0, mask.shape[0] - 1)
    overflow = jnp.maximum(total - max_out, 0)
    return src, valid, overflow
