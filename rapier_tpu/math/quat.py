"""Quaternion and rigid-transform math on (..., 4) / (..., 3) arrays.

Quaternions are stored as ``(x, y, z, w)`` (vector part first, scalar last),
matching the reference engine's convention (rapier `Rotation::from_xyzw`,
src/dynamics/rigid_body_components.rs:805-819).  All functions broadcast over
leading axes so they work unchanged under ``vmap``.
"""

from __future__ import annotations

import jax.numpy as jnp

# -- constructors ----------------------------------------------------------


def identity(shape=()) -> jnp.ndarray:
    """Identity quaternion(s) with the given leading shape."""
    q = jnp.zeros(shape + (4,))
    return q.at[..., 3].set(1.0)


def from_axis_angle(axis: jnp.ndarray, angle) -> jnp.ndarray:
    """Unit quaternion rotating by `angle` radians around unit `axis`."""
    angle = jnp.asarray(angle)
    half = angle * 0.5
    s = jnp.sin(half)
    return jnp.concatenate(
        [axis * s[..., None], jnp.cos(half)[..., None]], axis=-1
    )


def from_scaled_axis(v: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Exponential map: rotation vector (axis * angle) -> quaternion."""
    angle = jnp.linalg.norm(v, axis=-1, keepdims=True)
    safe = jnp.maximum(angle, eps)
    axis = v / safe
    half = angle * 0.5
    s = jnp.where(angle > eps, jnp.sin(half), 0.0)
    w = jnp.cos(half)
    return jnp.concatenate([axis * s, w], axis=-1)


# -- algebra ---------------------------------------------------------------


def to_scaled_axis(q: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """Logarithm map: unit quaternion -> rotation vector (axis * angle),
    shortest arc."""
    q = jnp.where(q[..., 3:4] < 0.0, -q, q)
    v = q[..., :3]
    s = jnp.linalg.norm(v, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(s, q[..., 3:4])
    # Small-angle limit: angle/s -> 2/w -> 2 for a unit quaternion.
    factor = jnp.where(s < 1e-6, 2.0, angle / jnp.maximum(s, eps))
    return v * factor


def mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a ⊗ b."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, eps)


def rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by quaternion(s) q (q v q*), vectorized form."""
    u = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(u, v)
    return v + w * t + jnp.cross(u, t)


def inv_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return rotate(conj(q), v)


def to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion -> 3x3 rotation matrix, shape (..., 3, 3)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def integrate_linearized(q: jnp.ndarray, angvel: jnp.ndarray, dt) -> jnp.ndarray:
    """Linearized rotation update used inside the TGS solver.

    Matches the reference's `RigidBodyVelocity::integrate_linearized`
    (src/dynamics/rigid_body_components.rs:805-819): q' = normalize((h, 1) ⊗ q)
    with h = ω·dt/2 treated as the vector part of a quaternion.
    """
    h = angvel * (jnp.asarray(dt) * 0.5)
    dq = jnp.concatenate([h, jnp.ones_like(h[..., :1])], axis=-1)
    return normalize(mul(dq, q))


# -- poses (pos: (...,3), rot: (...,4)) -------------------------------------


def transform_point(pos: jnp.ndarray, rot: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    return pos + rotate(rot, p)


def inverse_transform_point(pos, rot, p):
    return inv_rotate(rot, p - pos)


def compose(pos1, rot1, pos2, rot2):
    """Compose two poses: result = pose1 * pose2."""
    return pos1 + rotate(rot1, pos2), mul(rot1, rot2)


# -- component-leading (CL) variants -----------------------------------------
#
# TPU-tiled layouts pad the trailing two dims to (8, 128), so hot solver data
# keeps the big lane axis LAST and the small component axis FIRST: vectors are
# [3, ...lanes], quaternions [4, ...lanes].  These mirror the functions above.


def cross_cl(a, b):
    """Cross product of [3, ...] arrays."""
    ax, ay, az = a[0], a[1], a[2]
    bx, by, bz = b[0], b[1], b[2]
    return jnp.stack([ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx])


def dot_cl(a, b):
    # Explicit 3-term sum: a sublane-axis `jnp.sum` over sliced [3, ...]
    # views hits a Mosaic reduction-layout restriction inside Pallas kernels
    # (and XLA emits identical code for either form).
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def rotate_cl(q, v):
    """Rotate [3, ...] vectors by [4, ...] quaternions."""
    u = q[:3]
    w = q[3]
    t = 2.0 * cross_cl(u, v)
    return v + w[None] * t + cross_cl(u, t)


def inv_rotate_cl(q, v):
    qc = jnp.concatenate([-q[:3], q[3:4]], axis=0)
    return rotate_cl(qc, v)


def to_matrix_cl(q):
    """Quaternion [4, ...] -> rotation matrix [3, 3, ...] (component-leading:
    trailing axes stay the lane axes, so vmapped batches keep tile-friendly
    (3, P)-style trailing dims instead of padded (..., 3, 3) blocks)."""
    x, y, z, w = q[0], q[1], q[2], q[3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    row0 = jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)])
    row1 = jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)])
    row2 = jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)])
    return jnp.stack([row0, row1, row2])


def mul_cl(a, b):
    ax, ay, az, aw = a[0], a[1], a[2], a[3]
    bx, by, bz, bw = b[0], b[1], b[2], b[3]
    return jnp.stack([
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
        aw * bw - ax * bx - ay * by - az * bz,
    ])


def normalize_cl(q, eps: float = 1e-12):
    n2 = q[0] * q[0] + q[1] * q[1] + q[2] * q[2] + q[3] * q[3]
    n = jnp.sqrt(n2)[None]
    return q / jnp.maximum(n, eps)


def integrate_linearized_cl(q, angvel, dt):
    """CL version of integrate_linearized: q' = normalize((ω·dt/2, 1) ⊗ q)."""
    h = angvel * (dt * 0.5)
    dq = jnp.concatenate([h, jnp.ones_like(h[:1])], axis=0)
    return normalize_cl(mul_cl(dq, q))
