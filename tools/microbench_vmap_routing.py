"""Calibrate per-scene routing strategies at the vmapped bench scale.

The axon TPU tunnel has ~27 ms fixed overhead per synchronous dispatch, so
every op is repeated R times INSIDE one jit (lax.scan with a data
dependency); reported time = (t_R - overhead) / R using a measured empty-scan
baseline.

Usage: python tools/microbench_vmap_routing.py [B] [C] [P]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

R = 30


def bench(name, op, *args, r1=6, r2=36):
    """op: (carry_scalar, *args) -> array; scanned r times with the output
    folded into a scalar carry so XLA cannot hoist it.  Per-op time comes
    from the SLOPE between two rep counts, cancelling the ~30 ms fixed
    tunnel-dispatch overhead robustly."""

    def make(r):
        @jax.jit
        def run(args):
            def body(c, _):
                out = op(c, *args)
                leaves = jax.tree.leaves(out)
                # Full-sum consumption: a sliced read would let XLA dead-code
                # eliminate most of the op (slice propagation through
                # elementwise/matmul ops).
                c2 = c * 0.999 + sum(jnp.sum(l.astype(jnp.float32))
                                     for l in leaves) * 1e-20
                return c2, ()
            c, _ = jax.lax.scan(body, jnp.float32(1.0), None, length=r)
            return c
        return run

    run1, run2 = make(r1), make(r2)
    jax.block_until_ready((run1(args), run2(args)))  # compile both

    def t(run, reps=3):
        best = 1e30
        for _ in range(reps):
            t0 = time.time()
            jax.block_until_ready(run(args))
            best = min(best, time.time() - t0)
        return best

    per = (t(run2) - t(run1)) / (r2 - r1) * 1000
    print(f"{name:46s} {per:9.3f} ms/op")
    return per


_overhead = 0.0


def main():
    global _overhead
    np.asarray(jax.device_put(np.ones(1)))
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    C = int(sys.argv[2]) if len(sys.argv) > 2 else 104
    P = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    D = 38
    print(f"B={B} C={C} P={P} D={D} (R={R} reps in-jit)")

    # Measure the empty-scan + dispatch overhead.
    @jax.jit
    def empty():
        def body(c, _):
            return c * 0.999, ()
        c, _ = jax.lax.scan(body, jnp.float32(1.0), None, length=R)
        return c
    jax.block_until_ready(empty())
    t0 = time.time()
    jax.block_until_ready(empty())
    _overhead = time.time() - t0
    print(f"dispatch+empty-scan overhead: {_overhead*1000:.1f} ms")

    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (B, D, C))
    idx = jax.random.randint(key, (B, P), 0, C)
    mask = jax.random.bernoulli(key, 0.4, (B, P))
    x50 = jax.random.normal(key, (B, 50, P))

    bench("A batched one-hot matmul gather [B,38,C]->P",
          lambda c, t, i: jax.lax.dot_general(
              t * c, (i[:, :, None] == jnp.arange(C)[None, None, :]
                      ).astype(jnp.float32),
              dimension_numbers=(((2,), (2,)), ((0,), (0,)))),
          table, idx)

    tf2 = table.transpose(1, 0, 2).reshape(D, B * C)
    gidx = (idx + jnp.arange(B)[:, None] * C).reshape(-1)
    bench("B flat jnp.take cols [38, B*C] by [B*P]",
          lambda c, t, g: jnp.take(t * c, g, axis=1), tf2, gidx)

    bench("C vmapped jnp.take",
          lambda c, t, i: jax.vmap(lambda tt, ii: jnp.take(tt, ii, axis=1))(
              t * c, i), table, idx)

    from rapier_tpu.utils.compaction import compact_indices
    bench("E vmapped compact_indices P->256",
          lambda c, m: jax.vmap(lambda mm: compact_indices(mm, 256)[0])(
              m & (c > 0)), mask)

    bench("F 20-op elementwise chain [B,50,P]",
          lambda c, x: functools.reduce(lambda a, _: a * 1.0001 + c, range(20),
                                        x), x50)
    bench("F1 1-op elementwise [B,50,P]",
          lambda c, x: x * c + 0.1, x50)

    bench("G batched sort [B,P]",
          lambda c, i: jnp.sort(i + (c > 0), axis=-1), idx)
    bench("H batched argsort [B,P]",
          lambda c, i: jnp.argsort(i + (c > 0), axis=-1), idx)

    vals = jax.random.normal(key, (B, 20, P))
    bench("I dense [P,P] join + 20-row route",
          lambda c, i, v: jax.lax.dot_general(
              v * c, (i[:, :, None] == i[:, None, :]).astype(jnp.float32),
              dimension_numbers=(((2,), (2,)), ((0,), (0,)))),
          idx, vals)

    from rapier_tpu.utils.routing import searchsorted_blocked

    def sorted_join(c, i, v):
        def per(ii, vv):
            order = jnp.argsort(ii)
            sk = jnp.take(ii, order)
            pos = jnp.clip(searchsorted_blocked(sk, ii), 0, P - 1)
            src = jnp.take(order, pos)
            hit = jnp.take(sk, pos) == ii
            return jnp.where(hit, jnp.take(vv, src, axis=-1), 0.0)
        return jax.vmap(per)(i + (c > 0), v)
    bench("J sorted join (argsort+blocked search+take)", sorted_join, idx, vals)

    def vmap_ss(c, i, v):
        def per(ii, vv):
            sk = jnp.sort(ii)
            pos = jnp.searchsorted(sk, ii)
            return jnp.take(vv, jnp.clip(pos, 0, P - 1), axis=-1)
        return jax.vmap(per)(i + (c > 0), v)
    bench("K vmapped jnp.searchsorted join", vmap_ss, idx, vals)

    # L: take_along_axis batched (the natural batched gather)
    bench("L take_along_axis [B,20,P] by [B,P]",
          lambda c, v, i: jnp.take_along_axis(
              v * c, jnp.broadcast_to(i[:, None, :], v.shape), axis=-1),
          vals, idx)

    # M: cumsum along lanes
    bench("M batched cumsum [B,P]",
          lambda c, m: jnp.cumsum(m.astype(jnp.float32) * c, axis=-1), mask)


if __name__ == "__main__":
    main()
