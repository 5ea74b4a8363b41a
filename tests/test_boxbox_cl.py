"""Equivalence of the lane-last cuboid kernel + bucketed dispatch.

The dispatcher now runs `cuboid_cuboid_cl` (component-leading, optionally on
a census-capped bucket) in place of the per-lane `cuboid_cuboid`; these tests
pin the two kernels to each other and the bucket path to the full-width path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rapier_tpu.geometry.narrowphase_boxbox import cuboid_cuboid, cuboid_cuboid_cl


def _rand_lanes(seed, P=128, resting_frac=0.25):
    rng = np.random.default_rng(seed)

    def rand_quat(n):
        q = rng.normal(size=(n, 4))
        return q / np.linalg.norm(q, axis=1, keepdims=True)

    pA = rng.normal(size=(P, 3)) * 0.5
    pB = pA + rng.normal(size=(P, 3)) * 1.2
    rA = rand_quat(P)
    rB = rand_quat(P)
    k = int(P * resting_frac)
    rA[:k] = [0, 0, 0, 1]
    rB[:k] = [0, 0, 0, 1]
    pB[:k] = pA[:k] + np.array([0.0, 1.0, 0.0]) + rng.normal(size=(k, 3)) * 0.05
    prmA = np.zeros((P, 12))
    prmB = np.zeros((P, 12))
    prmA[:, :3] = 0.3 + rng.random(size=(P, 3))
    prmB[:, :3] = 0.3 + rng.random(size=(P, 3))
    return [jnp.asarray(x.T, jnp.float32) for x in (pA, rA, prmA, pB, rB, prmB)]


def test_lane_last_matches_per_lane():
    args = _rand_lanes(0)
    ref = jax.vmap(cuboid_cuboid, in_axes=-1, out_axes=-1)(*args)
    new = cuboid_cuboid_cl(*args)

    np.testing.assert_allclose(
        np.asarray(ref.normal), np.asarray(new.normal), rtol=1e-4, atol=1e-4
    )
    # Per-point rows can differ ONLY at argmax ties in the perpendicular-
    # extreme reduction picks (both choices are valid manifold points);
    # the deepest + farthest rows (0, 1) and validity must match exactly.
    np.testing.assert_allclose(
        np.asarray(ref.dist[:2]), np.asarray(new.dist[:2]), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(ref.valid), np.asarray(new.valid))
    d_ref = np.asarray(ref.dist)
    d_new = np.asarray(new.dist)
    mismatch = ~np.isclose(d_ref, d_new, rtol=1e-4, atol=1e-4)
    assert mismatch.mean() < 0.02, f"too many pick mismatches: {mismatch.mean()}"


def test_bucketed_dispatch_matches_full_width():
    from rapier_tpu.geometry import dispatch as dd

    args = _rand_lanes(7, P=96)
    pA, rA, prmA, pB, rB, prmB = args
    P = 96
    mask = jnp.ones((P,), bool).at[5].set(False)

    TA = jnp.concatenate([pA, rA, prmA, jnp.zeros((19, P))], axis=0)
    TB = jnp.concatenate([pB, rB, prmB, jnp.zeros((19, P))], axis=0)
    man_b, overflow = dd._run_bucketed(cuboid_cuboid_cl, mask, 128, TA, TB)
    man_f = cuboid_cuboid_cl(*args)

    keep = np.asarray(mask)
    assert int(overflow) == 0
    np.testing.assert_allclose(
        np.asarray(man_b.normal)[:, keep], np.asarray(man_f.normal)[:, keep],
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(man_b.dist)[:, keep], np.asarray(man_f.dist)[:, keep],
        rtol=1e-3, atol=1e-3,
    )
    np.testing.assert_array_equal(
        np.asarray(man_b.fid)[:, keep], np.asarray(man_f.fid)[:, keep]
    )
    # Unbucketed lane reports no contact.
    assert not np.asarray(man_b.valid)[:, 5].any()
    assert (np.asarray(man_b.dist)[:, 5] > 1e9).all()


def test_bucket_overflow_counted():
    from rapier_tpu.geometry import dispatch as dd

    args = _rand_lanes(3, P=96)
    pA, rA, prmA, pB, rB, prmB = args
    P = 96
    mask = jnp.ones((P,), bool)
    TA = jnp.concatenate([pA, rA, prmA, jnp.zeros((19, P))], axis=0)
    TB = jnp.concatenate([pB, rB, prmB, jnp.zeros((19, P))], axis=0)
    man_b, overflow = dd._run_bucketed(cuboid_cuboid_cl, mask, 64, TA, TB)
    assert int(overflow) == 96 - 64
    assert not np.asarray(man_b.valid)[:, 64:].any()
