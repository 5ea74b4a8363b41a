"""Microbench of the primitives the large-scene path leans on, at stack-24
sizes (N=4904 bodies, P=39296 pair lanes, C*W=470784 SAP candidates).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/microbench_primitives.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

np.asarray(jax.device_put(np.ones(1)))  # sync dispatch

N = 4905
P = 39296
CW = 470784
K = 29440

rng = np.random.default_rng(0)


def timeit(name, fn, *args, n=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:44s} {(time.time()-t0)/n*1000:9.3f} ms")
    return out


ids_p = jnp.asarray(rng.integers(0, N, size=P), jnp.int32)
vals_p = jnp.asarray(rng.standard_normal((3, P)), jnp.float32)
keys_p = jnp.asarray(rng.integers(0, 2**30, size=P), jnp.int32)
mask_cw = jnp.asarray(rng.random(CW) < 0.08)
vals_cw = jnp.asarray(rng.standard_normal(CW), jnp.float32)
table = jnp.asarray(rng.standard_normal((3, N)), jnp.float32)
mask_p = jnp.asarray(rng.random(P) < 0.7)

timeit("argsort int32 [P=39k]", jax.jit(jnp.argsort), keys_p)
timeit("argsort int32 [CW=470k]", jax.jit(jnp.argsort),
       jnp.asarray(rng.integers(0, 2**30, size=CW), jnp.int32))
timeit("take [3,N] by [P] idx", jax.jit(lambda t, i: jnp.take(t, i, axis=-1)),
       table, ids_p)
timeit("take [3,P] by [P] perm", jax.jit(lambda t, i: jnp.take(t, i, axis=-1)),
       vals_p, jnp.argsort(keys_p))
timeit("searchsorted [P] in [P]", jax.jit(jnp.searchsorted),
       jnp.sort(keys_p), keys_p)
timeit("cumsum f32 [CW=470k]", jax.jit(jnp.cumsum), vals_cw)
timeit("cumsum f32 [3,P]", jax.jit(lambda v: jnp.cumsum(v, axis=-1)), vals_p)

from rapier_tpu.utils.compaction import compact_indices
timeit("compact_indices [CW=470k] -> P", jax.jit(
    lambda m: compact_indices(m, P)), mask_cw)
timeit("compact_indices [P] -> K", jax.jit(
    lambda m: compact_indices(m, K)), mask_p)

from rapier_tpu.utils.routing import make_segment_plan, segment_sum, segment_max
plan = jax.jit(lambda i: make_segment_plan(i, N))(ids_p)
timeit("make_segment_plan [P] -> N", jax.jit(
    lambda i: make_segment_plan(i, N)), ids_p)
timeit("segment_sum [3,P] -> [3,N]", jax.jit(
    lambda v: segment_sum(v, plan)), vals_p)
timeit("segment_max u32 [P] -> [N]", jax.jit(
    lambda v: segment_max(v, plan, jnp.uint32(0))),
    jnp.asarray(rng.integers(0, 2**30, size=P), jnp.uint32))

# scatter-add via .at[].add with unique-ish indices, for comparison
timeit("scatter-add [3,P] -> [3,N] (at.add)", jax.jit(
    lambda t, i, v: t.at[:, i].add(v)), table, ids_p, vals_p)

# dynamic_slice of a [3, P] block
timeit("dynamic_slice [3,4096] from [3,P]", jax.jit(
    lambda v, s: jax.lax.dynamic_slice_in_dim(v, s, 4096, axis=-1)),
    vals_p, jnp.int32(1234))
