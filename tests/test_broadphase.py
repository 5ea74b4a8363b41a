import jax.numpy as jnp
import numpy as np

from rapier_tpu.geometry import broadphase
from rapier_tpu.types import BodyType, empty_colliders


def _setup(centers, half=0.5):
    n = len(centers)
    c = empty_colliders(n)
    c = c.replace(
        enabled=jnp.ones(n, bool),
        parent=jnp.arange(n, dtype=jnp.int32),
    )
    mins = jnp.asarray(centers) - half
    maxs = jnp.asarray(centers) + half
    body_type = jnp.full((n,), int(BodyType.DYNAMIC), jnp.int32)
    return mins, maxs, c, body_type


def _pairs_set(c1, c2, valid):
    return {
        (int(a), int(b))
        for a, b, v in zip(np.asarray(c1), np.asarray(c2), np.asarray(valid))
        if v
    }


def test_all_pairs_finds_overlaps():
    centers = [[0, 0, 0], [0.8, 0, 0], [5, 0, 0], [5.5, 0, 0]]
    mins, maxs, c, bt = _setup(centers)
    c1, c2, valid, ovf = broadphase.find_pairs_all(mins, maxs, c, bt, 16)
    assert _pairs_set(c1, c2, valid) == {(0, 1), (2, 3)}
    assert int(ovf) == 0


def test_sap_matches_all_pairs():
    rng = np.random.default_rng(0)
    centers = rng.uniform(-10, 10, size=(40, 3))
    mins, maxs, c, bt = _setup(centers, half=1.0)
    a1, a2, av, _ = broadphase.find_pairs_all(mins, maxs, c, bt, 512)
    s1, s2, sv, ovf = broadphase.find_pairs_sap(mins, maxs, c, bt, 512, window=40)
    assert _pairs_set(a1, a2, av) == _pairs_set(s1, s2, sv)


def test_overflow_reported():
    centers = [[0, 0, 0]] * 10  # all overlap: 45 pairs
    mins, maxs, c, bt = _setup(centers)
    c1, c2, valid, ovf = broadphase.find_pairs_all(mins, maxs, c, bt, 16)
    assert int(valid.sum()) == 16
    assert int(ovf) == 45 - 16


def test_same_parent_excluded():
    centers = [[0, 0, 0], [0.5, 0, 0]]
    mins, maxs, c, bt = _setup(centers)
    c = c.replace(parent=jnp.array([3, 3], jnp.int32))
    c1, c2, valid, _ = broadphase.find_pairs_all(mins, maxs, c, bt, 8)
    assert _pairs_set(c1, c2, valid) == set()


def test_both_static_excluded():
    centers = [[0, 0, 0], [0.5, 0, 0]]
    mins, maxs, c, bt = _setup(centers)
    bt = jnp.full((2,), int(BodyType.FIXED), jnp.int32)
    c1, c2, valid, _ = broadphase.find_pairs_all(mins, maxs, c, bt, 8)
    assert _pairs_set(c1, c2, valid) == set()


def test_collision_groups_filter():
    centers = [[0, 0, 0], [0.5, 0, 0]]
    mins, maxs, c, bt = _setup(centers)
    # Group A (bit 0) only collides with group B (bit 1) and vice versa — but
    # collider 1 is also in group A with filter A => mutual AND test fails.
    g0 = (0b01 << 16) | 0b10
    g1 = (0b01 << 16) | 0b01
    c = c.replace(collision_groups=jnp.array([g0, g1], jnp.uint32))
    c1, c2, valid, _ = broadphase.find_pairs_all(mins, maxs, c, bt, 8)
    assert _pairs_set(c1, c2, valid) == set()


def test_grid_matches_all_pairs_scatter():
    rng = np.random.default_rng(1)
    centers = rng.uniform(-10, 10, size=(60, 3))
    mins, maxs, c, bt = _setup(centers, half=1.0)
    a1, a2, av, _ = broadphase.find_pairs_all(mins, maxs, c, bt, 1024)
    g1, g2, gv, ovf = broadphase.find_pairs_grid(mins, maxs, c, bt, 1024)
    assert _pairs_set(g1, g2, gv) == _pairs_set(a1, a2, av)
    assert int(ovf) == 0


def test_grid_complete_on_dense_pile():
    # A 5x5x5 lattice with overlapping AABBs: same-xy boxes separated along
    # z are a whole sort-slab apart in any single-axis order — exactly the
    # pairs windowed SAP drops (BASELINE.md round-5 note).  The grid must
    # find every one of the 26-neighbourhood overlaps with zero overflow.
    centers = np.array(
        [[i, j, k] for i in range(5) for j in range(5) for k in range(5)],
        np.float32)
    mins, maxs, c, bt = _setup(centers, half=0.51)
    a1, a2, av, aovf = broadphase.find_pairs_all(mins, maxs, c, bt, 2048)
    g1, g2, gv, govf = broadphase.find_pairs_grid(mins, maxs, c, bt, 2048)
    ref = _pairs_set(a1, a2, av)
    assert int(aovf) == 0 and len(ref) > 700  # 6/18/26-neighbour edges
    assert _pairs_set(g1, g2, gv) == ref
    assert int(govf) == 0


def test_grid_long_collider_goes_global():
    # A 200-unit ground plate is far longer than the cell size set by the
    # boxes; it must ride the global long-collider set (as in SAP) and still
    # pair with every resting box.
    centers = np.array([[x * 1.2, 0.5, z * 1.2]
                        for x in range(4) for z in range(4)], np.float32)
    n = len(centers) + 1
    c = empty_colliders(n)
    c = c.replace(
        enabled=jnp.ones(n, bool),
        parent=jnp.arange(n, dtype=jnp.int32),
    )
    half = np.full((n, 3), 0.5, np.float32)
    half[-1] = [100.0, 0.1, 100.0]
    ctr = np.concatenate([centers, [[0.0, -0.1, 0.0]]], 0)
    mins = jnp.asarray(ctr - half)
    maxs = jnp.asarray(ctr + half)
    bt = jnp.asarray(
        [int(BodyType.DYNAMIC)] * (n - 1) + [int(BodyType.FIXED)], jnp.int32)
    a1, a2, av, _ = broadphase.find_pairs_all(mins, maxs, c, bt, 512)
    g1, g2, gv, govf = broadphase.find_pairs_grid(mins, maxs, c, bt, 512)
    ref = _pairs_set(a1, a2, av)
    ground = n - 1
    assert all((b, ground) in ref for b in range(n - 1))  # every box-ground
    assert _pairs_set(g1, g2, gv) == ref
    assert int(govf) == 0
