"""Large-scene routing paths (utils/routing.py).

Above DENSE_ROUTE_ELEMS / DENSE_JOIN_ELEMS the pipeline switches from
one-hot-matmul routing to sorted segment plans + takes (the [K, N] masks and
the [Pn, Po] warmstart join are O(K*N)/O(P^2) — gigabytes at 5k+ bodies).
These tests force the sparse paths on a SMALL scene by dropping the
thresholds and assert trajectory parity with the dense paths, so both
implementations are pinned to the same semantics without needing a 4,900-box
scene in CI.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rapier_tpu.dynamics.solver.coloring as coloring_mod
import rapier_tpu.pipeline.physics_pipeline as pp
import rapier_tpu.utils.routing as routing
from rapier_tpu.pipeline.physics_pipeline import step
from rapier_tpu.scenes import stack_world
from rapier_tpu.utils.routing import make_segment_plan, segment_any, segment_max, segment_sum


@pytest.fixture
def sparse_thresholds(monkeypatch):
    monkeypatch.setattr(routing, "DENSE_ROUTE_ELEMS", 0)
    monkeypatch.setattr(routing, "DENSE_JOIN_ELEMS", 0)
    monkeypatch.setattr(pp, "_DENSE_ROUTE_ELEMS", 0)
    monkeypatch.setattr(pp, "_DENSE_JOIN_ELEMS", 0)
    monkeypatch.setattr(coloring_mod, "DENSE_ROUTE_ELEMS", 0)


def test_segment_reductions_match_dense():
    rng = np.random.RandomState(0)
    k, n = 257, 19
    ids = jnp.asarray(rng.randint(0, n, size=k), jnp.int32)
    vals = jnp.asarray(rng.randn(3, k), jnp.float32)
    plan = make_segment_plan(ids, n)

    oh = (ids[:, None] == jnp.arange(n)[None, :]).astype(jnp.float32)
    np.testing.assert_allclose(
        np.asarray(segment_sum(vals, plan)), np.asarray(vals @ oh),
        rtol=1e-5, atol=1e-5,
    )
    dense_max = np.full((n,), -np.inf, np.float32)
    for i in range(k):
        dense_max[int(ids[i])] = max(dense_max[int(ids[i])], float(vals[0, i]))
    got = np.asarray(segment_max(vals[0], plan, jnp.float32(-np.inf)))
    np.testing.assert_allclose(got, dense_max)

    flags = jnp.asarray(rng.rand(k) > 0.7)
    dense_any = np.zeros((n,), bool)
    for i in range(k):
        dense_any[int(ids[i])] |= bool(flags[i])
    np.testing.assert_array_equal(np.asarray(segment_any(flags, plan)), dense_any)


def _roll(n_steps=90):
    world = stack_world(n=6)
    state = jax.tree.map(jnp.asarray, world.build())
    params = world.params.replace(solver_backend="jax")

    @jax.jit
    def r(s):
        def body(s, _):
            s2, _ = step(s, params)
            return s2, None
        return jax.lax.scan(body, s, None, length=n_steps)[0]

    out = r(state)
    return np.asarray(out.bodies.pos), np.asarray(out.bodies.sleeping)


def test_sparse_paths_match_dense_trajectory(sparse_thresholds):
    pos_sparse, slp_sparse = _roll()
    # Undo the monkeypatching for the dense roll by reading the real values
    # back off the module-under-test (pytest fixture reverts on teardown, so
    # just re-run in a nested context).
    import importlib
    importlib.reload(routing)
    pp._DENSE_ROUTE_ELEMS = routing.DENSE_ROUTE_ELEMS
    pp._DENSE_JOIN_ELEMS = routing.DENSE_JOIN_ELEMS
    coloring_mod.DENSE_ROUTE_ELEMS = routing.DENSE_ROUTE_ELEMS
    pos_dense, slp_dense = _roll()

    assert np.isfinite(pos_sparse).all()
    # The sparse scatter (sorted cumsum) and the dense one-hot matmul sum
    # contributions in different orders: f32 non-associativity seeds ~1e-7
    # deltas that the chaotic stack amplifies over 90 steps.  Semantic bugs
    # show up as O(0.1)+ height errors (the segment_max regression did);
    # reduction-order noise stays ~1e-3.
    np.testing.assert_allclose(pos_sparse, pos_dense, atol=2e-2)
    np.testing.assert_array_equal(slp_sparse, slp_dense)
