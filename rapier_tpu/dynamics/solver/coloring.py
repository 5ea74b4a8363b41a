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

import jax.numpy as jnp

from rapier_tpu.utils.routing import (
    DENSE_ROUTE_ELEMS, make_segment_plan, segment_max,
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

        for r in range(max_colors - 1):
            unc = valid & (color < 0)
            wm = jnp.where(unc, w, jnp.uint32(0))[:, None]
            bw = jnp.maximum(
                jnp.max(jnp.where(oh1, wm, jnp.uint32(0)), axis=0),
                jnp.max(jnp.where(oh2, wm, jnp.uint32(0)), axis=0),
            )[None, :]
            bw1 = jnp.max(jnp.where(oh1, bw, jnp.uint32(0)), axis=1)
            bw2 = jnp.max(jnp.where(oh2, bw, jnp.uint32(0)), axis=1)
            sel = unc & (~dyn1 | (bw1 == w)) & (~dyn2 | (bw2 == w))
            color = jnp.where(sel, r, color)
    else:
        # Large scenes: sorted segment plans replace the O(K*N) one-hots
        # (utils/routing.py) — identical selection rule, linear memory.
        plan1 = make_segment_plan(t1, n_bodies + 1)
        plan2 = make_segment_plan(t2, n_bodies + 1)
        for r in range(max_colors - 1):
            unc = valid & (color < 0)
            wm = jnp.where(unc, w, jnp.uint32(0))
            bw_tab = jnp.maximum(
                segment_max(wm, plan1, jnp.uint32(0)),
                segment_max(wm, plan2, jnp.uint32(0)),
            )
            bw1, bw2 = bw_tab[t1], bw_tab[t2]
            sel = unc & (~dyn1 | (bw1 == w)) & (~dyn2 | (bw2 == w))
            color = jnp.where(sel, r, color)

    color = jnp.where(valid & (color < 0), max_colors - 1, color)
    num_colors = jnp.max(jnp.where(valid, color, -1)) + 1
    return color.astype(jnp.int32), num_colors.astype(jnp.int32)
