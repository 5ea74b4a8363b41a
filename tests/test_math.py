import jax.numpy as jnp
import numpy as np
import pytest

from rapier_tpu.math import quat


def test_identity_rotate():
    q = quat.identity()
    v = jnp.array([1.0, 2.0, 3.0])
    np.testing.assert_allclose(quat.rotate(q, v), v, atol=1e-6)


def test_axis_angle_roundtrip():
    q = quat.from_axis_angle(jnp.array([0.0, 0.0, 1.0]), jnp.pi / 2)
    v = jnp.array([1.0, 0.0, 0.0])
    np.testing.assert_allclose(quat.rotate(q, v), [0.0, 1.0, 0.0], atol=1e-6)


def test_mul_compose():
    qa = quat.from_axis_angle(jnp.array([0.0, 0.0, 1.0]), 0.3)
    qb = quat.from_axis_angle(jnp.array([0.0, 0.0, 1.0]), 0.5)
    qc = quat.mul(qa, qb)
    qd = quat.from_axis_angle(jnp.array([0.0, 0.0, 1.0]), 0.8)
    np.testing.assert_allclose(np.abs(np.dot(qc, qd)), 1.0, atol=1e-6)


def test_to_matrix_matches_rotate():
    q = quat.normalize(jnp.array([0.1, 0.2, -0.3, 0.9]))
    v = jnp.array([0.5, -1.0, 2.0])
    np.testing.assert_allclose(
        quat.to_matrix(q) @ v, quat.rotate(q, v), atol=1e-5
    )


def test_inverse_transform_point():
    q = quat.from_axis_angle(jnp.array([0.0, 1.0, 0.0]), 0.7)
    p = jnp.array([1.0, 2.0, 3.0])
    x = jnp.array([-0.3, 0.4, 0.9])
    y = quat.transform_point(p, q, x)
    np.testing.assert_allclose(quat.inverse_transform_point(p, q, y), x, atol=1e-5)


def test_integrate_linearized_small_angle():
    q = quat.identity()
    w = jnp.array([0.0, 0.0, 1.0])
    q2 = quat.integrate_linearized(q, w, 0.01)
    # ~0.01 rad around z.
    v = quat.rotate(q2, jnp.array([1.0, 0.0, 0.0]))
    assert abs(float(v[1]) - 0.01) < 1e-4
