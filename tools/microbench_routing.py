"""Microbenchmark the large-scene routing primitives at pyramid scale.

The axon tunnel adds ~25 ms per dispatch in sync mode, so single-op timing
is fiction.  Each measurement here runs ITERS iterations of the op inside
ONE jitted lax.scan and divides — the scan carries a data dependency so XLA
cannot elide iterations.  Usage: python tools/microbench_routing.py
"""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

np.asarray(jax.device_put(np.ones(1)))  # sync dispatch

from rapier_tpu.utils import routing

K = 29440   # solver lanes (stack-24 cap)
N = 4905    # bodies + sentinel
ITERS = 200

_ap = argparse.ArgumentParser()
_ap.add_argument("--dense", action="store_true",
                 help="also run the dense one-hot comparison "
                      "(materializes a ~577 MB [K,N] matrix)")
_args = _ap.parse_args()

# Measure the per-dispatch overhead empirically (a no-op jitted fn) instead
# of hardcoding the axon-tunnel constant; on CPU this is ~0 and results stay
# non-negative.
_noop = jax.jit(lambda x: x)
jax.block_until_ready(_noop(jnp.zeros(1)))
_t0 = time.time()
for _ in range(20):
    jax.block_until_ready(_noop(jnp.zeros(1)))
DISPATCH_OVERHEAD = max(0.0, (time.time() - _t0) / 20)

rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, N, K), jnp.int32)
table3 = jnp.asarray(rng.standard_normal((3, N)), jnp.float32)
table6 = jnp.asarray(rng.standard_normal((6, N)), jnp.float32)
vals3 = jnp.asarray(rng.standard_normal((3, K)), jnp.float32)
vals6 = jnp.asarray(rng.standard_normal((6, K)), jnp.float32)
plan = jax.jit(routing.make_segment_plan, static_argnums=1)(idx, N)
jax.block_until_ready(plan)


def timeit(name, fn, seed, n=ITERS):
    """fn(carry) -> carry (same shape); scanned n times inside one jit."""
    @jax.jit
    def run(c0):
        def body(c, _):
            return fn(c), ()
        c, _ = jax.lax.scan(body, c0, None, length=n)
        return c

    out = run(seed)
    jax.block_until_ready(out)
    t0 = time.time()
    out = run(seed)
    jax.block_until_ready(out)
    dt = time.time() - t0
    print(f"{name:36s} {max(0.0, dt - DISPATCH_OVERHEAD)/n*1e6:9.1f} us/iter")
    return out


# take: carry is the [3, K] gather output feeding back via a cheap reduce.
timeit("take [3,N]->[3,K]",
       lambda c: jnp.take(table3 + c[:, :1], idx, axis=-1), vals3)
timeit("take [6,N]->[6,K]",
       lambda c: jnp.take(table6 + c[:, :1], idx, axis=-1), vals6)
timeit("4x take [3,N]",
       lambda c: sum(jnp.take(table3 + c[:, k:k+1], idx, axis=-1)
                     for k in range(4)), vals3)
timeit("segment_sum [3,K]->[3,N] (pad K)",
       lambda c: jnp.pad(routing.segment_sum(c, plan), ((0, 0), (0, K - N))),
       vals3)
timeit("segment_sum [6,K]->[6,N] (pad K)",
       lambda c: jnp.pad(routing.segment_sum(c, plan), ((0, 0), (0, K - N))),
       vals6)
timeit("cumsum [6,K]", lambda c: jnp.cumsum(c, axis=-1) * 1e-3, vals6)
timeit("sort_idx+take (argsort [K])",
       lambda c: jnp.take(c, jnp.argsort(c[0] > 0), axis=-1), vals3)
timeit("elementwise x40 [3,K]",
       lambda c: sum(jnp.sin(c * (1 + 0.01 * k)) for k in range(40)) * 1e-2,
       vals3)

# A realistic solve_color pass shape: 4 gathers + ~20 elementwise + 4 segsums.
def passlike(c):
    t = table3 + c[:, :1] * 1e-6
    g = [jnp.take(t, idx, axis=-1) for _ in range(4)]
    x = g[0] * g[1] + g[2] * g[3]
    for k in range(15):
        x = x * 1.0001 + g[k % 4]
    outs = [routing.segment_sum(x * (1 + 0.1 * j), plan) for j in range(4)]
    return jnp.pad(sum(outs), ((0, 0), (0, K - N)))

timeit("solve_color-like pass", passlike, vals3)

# Dense one-hot comparison at the same size (what the small-scene path does).
# Off by default: the [K,N] f32 one-hot is ~577 MB, which can OOM small hosts
# — and the dense path is only ever taken in the small-scene regime anyway.
if _args.dense:
    oh = (idx[:, None] == jax.lax.broadcasted_iota(jnp.int32, (K, N), 1)
          ).astype(jnp.float32)
    jax.block_until_ready(oh)
    timeit("dense gather [3,N]@[N,K]", lambda c: table3 @ oh.T + c * 1e-9,
           vals3, n=50)
