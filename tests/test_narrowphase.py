import jax.numpy as jnp
import numpy as np

from rapier_tpu.geometry import narrowphase as nph
from rapier_tpu.geometry.narrowphase_boxbox import cuboid_cuboid
from rapier_tpu.math import quat

IDQ = jnp.array([0.0, 0.0, 0.0, 1.0])


def prm(*v):
    return jnp.array(list(v) + [0.0] * (12 - len(v)))


def test_ball_ball_separated():
    m = nph.ball_ball(jnp.zeros(3), IDQ, prm(1.0), jnp.array([3.0, 0, 0]), IDQ, prm(1.0))
    assert abs(float(m.dist[0]) - 1.0) < 1e-6
    np.testing.assert_allclose(m.normal, [1, 0, 0], atol=1e-6)


def test_ball_ball_penetrating():
    m = nph.ball_ball(jnp.zeros(3), IDQ, prm(1.0), jnp.array([1.5, 0, 0]), IDQ, prm(1.0))
    assert abs(float(m.dist[0]) + 0.5) < 1e-6
    np.testing.assert_allclose(m.point[0], [0.75, 0, 0], atol=1e-6)


def test_ball_cuboid_face():
    m = nph.ball_cuboid(jnp.array([0.0, 1.4, 0.0]), IDQ, prm(0.5),
                        jnp.zeros(3), IDQ, prm(1.0, 1.0, 1.0))
    assert abs(float(m.dist[0]) + 0.1) < 1e-5
    np.testing.assert_allclose(m.normal, [0, -1, 0], atol=1e-5)


def test_ball_cuboid_inside():
    m = nph.ball_cuboid(jnp.array([0.0, 0.8, 0.0]), IDQ, prm(0.5),
                        jnp.zeros(3), IDQ, prm(1.0, 1.0, 1.0))
    assert float(m.dist[0]) < -0.5  # deeply penetrating
    np.testing.assert_allclose(m.normal, [0, -1, 0], atol=1e-5)


def test_capsule_capsule_cross():
    m = nph.capsule_capsule(
        jnp.zeros(3), IDQ, prm(-1, 0, 0, 1, 0, 0, 0.25),
        jnp.array([0.0, 0.6, 0.0]), IDQ, prm(0, 0, -1, 0, 0, 1, 0.25),
    )
    assert abs(float(m.dist[0]) - 0.1) < 1e-5
    np.testing.assert_allclose(m.normal, [0, 1, 0], atol=1e-5)


def test_capsule_capsule_parallel_two_points():
    m = nph.capsule_capsule(
        jnp.zeros(3), IDQ, prm(-1, 0, 0, 1, 0, 0, 0.25),
        jnp.array([0.0, 0.45, 0.0]), IDQ, prm(-1, 0, 0, 1, 0, 0, 0.25),
    )
    assert bool(m.valid[0]) and bool(m.valid[1])
    assert abs(float(m.dist[0]) + 0.05) < 1e-5
    assert abs(float(m.dist[1]) + 0.05) < 1e-4


def test_boxbox_stack_four_points():
    m = cuboid_cuboid(jnp.zeros(3), IDQ, prm(0.5, 0.5, 0.5),
                      jnp.array([0.0, 0.99, 0.0]), IDQ, prm(0.5, 0.5, 0.5))
    assert np.all(np.asarray(m.valid))
    np.testing.assert_allclose(m.dist, -0.01, atol=1e-4)
    np.testing.assert_allclose(m.normal, [0, 1, 0], atol=1e-5)
    # Corner spread.
    pts = np.asarray(m.point)
    assert np.ptp(pts[:, 0]) > 0.9 and np.ptp(pts[:, 2]) > 0.9


def test_boxbox_offset_clip():
    # Upper box shifted half a box: clipped overlap region is 0.5 wide.
    m = cuboid_cuboid(jnp.zeros(3), IDQ, prm(0.5, 0.5, 0.5),
                      jnp.array([0.5, 0.98, 0.0]), IDQ, prm(0.5, 0.5, 0.5))
    pts = np.asarray(m.point)[np.asarray(m.valid)]
    assert pts[:, 0].min() > -0.01 and pts[:, 0].max() < 0.51


def test_boxbox_edge_contact():
    # 45-degree rotated box above: crossing edges produce an edge contact.
    r = quat.from_axis_angle(jnp.array([1.0, 0.0, 0.0]), jnp.pi / 4)
    r = quat.mul(quat.from_axis_angle(jnp.array([0.0, 0.0, 1.0]), jnp.pi / 4), r)
    m = cuboid_cuboid(jnp.zeros(3), IDQ, prm(0.5, 0.5, 0.5),
                      jnp.array([0.0, 1.3, 0.0]), r, prm(0.5, 0.5, 0.5))
    assert bool(jnp.any(m.valid))
    d = float(m.dist[jnp.argmax(m.valid)])
    assert d < 0.5  # sane distance


def test_ball_halfspace():
    m = nph.ball_halfspace(jnp.array([0.0, 0.4, 0.0]), IDQ, prm(0.5),
                           jnp.zeros(3), IDQ, prm(0, 1, 0))
    assert abs(float(m.dist[0]) + 0.1) < 1e-6
    np.testing.assert_allclose(m.normal, [0, -1, 0], atol=1e-6)


def test_capsule_halfspace_two_points():
    m = nph.capsule_halfspace(
        jnp.array([0.0, 0.4, 0.0]), IDQ, prm(-1, 0, 0, 1, 0, 0, 0.5),
        jnp.zeros(3), IDQ, prm(0, 1, 0))
    assert bool(m.valid[0]) and bool(m.valid[1])
    np.testing.assert_allclose(np.asarray(m.dist[:2]), -0.1, atol=1e-6)


def test_cuboid_halfspace_four_corners():
    m = nph.convex_halfspace(
        jnp.array([0.0, 0.45, 0.0]), IDQ, jnp.int32(1), prm(0.5, 0.5, 0.5),
        jnp.zeros(3), IDQ, prm(0, 1, 0))
    assert np.asarray(m.valid).sum() == 4
    np.testing.assert_allclose(np.asarray(m.dist), -0.05, atol=1e-5)


def test_cylinder_halfspace_standing():
    m = nph.convex_halfspace(
        jnp.array([0.0, 0.45, 0.0]), IDQ, jnp.int32(4), prm(0.5, 0.5),
        jnp.zeros(3), IDQ, prm(0, 1, 0))
    v = np.asarray(m.valid)
    assert v.sum() >= 3  # stable patch on the rim
    d = np.asarray(m.dist)[v]
    assert np.all(np.abs(d + 0.05) < 5e-3)
