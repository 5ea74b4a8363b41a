"""Host-side (NumPy) analytic mass properties per shape.

The analog of parry's `MassProperties` computation (SURVEY §2.2): runs at
scene-build time on the host, producing (mass, local COM, principal inertia,
principal frame) per collider which are then accumulated onto parent bodies.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from rapier_tpu.types import ShapeType


@dataclass
class MassProperties:
    mass: float
    com: np.ndarray            # (3,) in collider-local frame
    principal_inertia: np.ndarray  # (3,) about COM, in principal frame
    principal_frame: np.ndarray    # (4,) quaternion (x,y,z,w) local->principal


def _identity_quat():
    return np.array([0.0, 0.0, 0.0, 1.0])


def _quat_from_two_vectors(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Shortest-arc quaternion rotating unit vector a onto unit vector b."""
    c = np.cross(a, b)
    d = float(np.dot(a, b))
    if d < -1.0 + 1e-9:
        # Opposite: rotate pi around any perpendicular axis.
        perp = np.cross(a, [1.0, 0.0, 0.0])
        if np.linalg.norm(perp) < 1e-9:
            perp = np.cross(a, [0.0, 1.0, 0.0])
        perp /= np.linalg.norm(perp)
        return np.array([perp[0], perp[1], perp[2], 0.0])
    w = 1.0 + d
    q = np.array([c[0], c[1], c[2], w])
    return q / np.linalg.norm(q)


def shape_mass_properties(shape_type: int, params: np.ndarray, density: float) -> MassProperties:
    """Analytic mass properties for one shape at the given density."""
    zero = MassProperties(0.0, np.zeros(3), np.zeros(3), _identity_quat())
    st = ShapeType(shape_type)

    if st == ShapeType.BALL:
        r = float(params[0])
        m = density * 4.0 / 3.0 * math.pi * r**3
        i = 2.0 / 5.0 * m * r * r
        return MassProperties(m, np.zeros(3), np.full(3, i), _identity_quat())

    if st in (ShapeType.CUBOID, ShapeType.ROUND_CUBOID):
        hx, hy, hz = (float(params[0]), float(params[1]), float(params[2]))
        if st == ShapeType.ROUND_CUBOID:
            # Approximate: inflate extents by the border radius.
            br = float(params[3])
            hx, hy, hz = hx + br, hy + br, hz + br
        m = density * 8.0 * hx * hy * hz
        ix = m / 3.0 * (hy * hy + hz * hz)
        iy = m / 3.0 * (hx * hx + hz * hz)
        iz = m / 3.0 * (hx * hx + hy * hy)
        return MassProperties(m, np.zeros(3), np.array([ix, iy, iz]), _identity_quat())

    if st == ShapeType.CAPSULE:
        a, b, r = params[0:3].astype(float), params[3:6].astype(float), float(params[6])
        h = float(np.linalg.norm(b - a))
        mc = density * math.pi * r * r * h            # cylinder part
        ms = density * 4.0 / 3.0 * math.pi * r**3     # two hemispheres = sphere
        m = mc + ms
        i_axis = mc * r * r / 2.0 + ms * 2.0 / 5.0 * r * r
        i_perp = (
            mc * (h * h / 12.0 + r * r / 4.0)
            + ms * (2.0 / 5.0 * r * r + h * h / 4.0 + 3.0 / 8.0 * h * r)
        )
        com = 0.5 * (a + b)
        if h > 1e-12:
            axis = (b - a) / h
            frame = _quat_from_two_vectors(np.array([0.0, 1.0, 0.0]), axis)
        else:
            frame = _identity_quat()
        # Principal frame has Y along the capsule axis.
        return MassProperties(m, com, np.array([i_perp, i_axis, i_perp]), frame)

    if st in (ShapeType.CYLINDER, ShapeType.ROUND_CYLINDER):
        hh, r = float(params[0]), float(params[1])
        big_h = 2.0 * hh
        m = density * math.pi * r * r * big_h
        i_axis = m * r * r / 2.0
        i_perp = m * (3.0 * r * r + big_h * big_h) / 12.0
        return MassProperties(m, np.zeros(3), np.array([i_perp, i_axis, i_perp]),
                              _identity_quat())

    if st in (ShapeType.CONE, ShapeType.ROUND_CONE):
        hh, r = float(params[0]), float(params[1])
        big_h = 2.0 * hh
        m = density * math.pi * r * r * big_h / 3.0
        # COM at 1/4 height above base; base at -hh.
        com = np.array([0.0, -hh + big_h / 4.0, 0.0])
        i_axis = 3.0 / 10.0 * m * r * r
        i_perp = m * (3.0 / 20.0 * r * r + 3.0 / 80.0 * big_h * big_h)
        return MassProperties(m, com, np.array([i_perp, i_axis, i_perp]),
                              _identity_quat())

    # Flat / unbounded / mesh shapes contribute no mass by default, matching
    # the common usage where they are static (trimesh mass props TODO, M4).
    return zero


def _quat_rotate(q: np.ndarray, v: np.ndarray) -> np.ndarray:
    u, w = q[:3], q[3]
    t = 2.0 * np.cross(u, v)
    return v + w * t + np.cross(u, t)


def _quat_mul(a, b):
    ax, ay, az, aw = a
    bx, by, bz, bw = b
    return np.array([
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
        aw * bw - ax * bx - ay * by - az * bz,
    ])


def _inertia_tensor(mp: MassProperties) -> np.ndarray:
    """3x3 inertia tensor about COM, in the collider-local axes."""
    q = mp.principal_frame
    x, y, z, w = q
    rm = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])
    return rm @ np.diag(mp.principal_inertia) @ rm.T


def combine(parts: list[tuple[MassProperties, np.ndarray, np.ndarray]]) -> MassProperties:
    """Combine shape mass properties expressed at poses w.r.t. a body frame.

    Args:
      parts: list of (mp, pos, rot) where (pos, rot) is the collider pose
        relative to the body, rot as quaternion (x,y,z,w).
    Returns mass properties in the body frame with a diagonalized principal
    frame, mirroring parry's MassProperties sum.
    """
    total_m = 0.0
    com = np.zeros(3)
    for mp, pos, rot in parts:
        c_world = pos + _quat_rotate(rot, mp.com)
        total_m += mp.mass
        com += mp.mass * c_world
    if total_m <= 0.0:
        return MassProperties(0.0, np.zeros(3), np.zeros(3), _identity_quat())
    com /= total_m

    itot = np.zeros((3, 3))
    for mp, pos, rot in parts:
        if mp.mass <= 0.0:
            continue
        x, y, z, w = rot
        rm = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])
        i_local = rm @ _inertia_tensor(mp) @ rm.T
        d = pos + _quat_rotate(rot, mp.com) - com
        # Parallel axis theorem.
        itot += i_local + mp.mass * (np.dot(d, d) * np.eye(3) - np.outer(d, d))

    evals, evecs = np.linalg.eigh(itot)
    # Ensure right-handed frame.
    if np.linalg.det(evecs) < 0:
        evecs[:, 0] = -evecs[:, 0]
    # Rotation matrix -> quaternion.
    tr = np.trace(evecs)
    if tr > 0:
        s = math.sqrt(tr + 1.0) * 2
        qw = 0.25 * s
        qx = (evecs[2, 1] - evecs[1, 2]) / s
        qy = (evecs[0, 2] - evecs[2, 0]) / s
        qz = (evecs[1, 0] - evecs[0, 1]) / s
    else:
        i = int(np.argmax(np.diag(evecs)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = math.sqrt(max(evecs[i, i] - evecs[j, j] - evecs[k, k] + 1.0, 1e-12)) * 2
        qv = [0.0, 0.0, 0.0]
        qv[i] = 0.25 * s
        qw = (evecs[k, j] - evecs[j, k]) / s
        qv[j] = (evecs[j, i] + evecs[i, j]) / s
        qv[k] = (evecs[k, i] + evecs[i, k]) / s
        qx, qy, qz = qv
    q = np.array([qx, qy, qz, qw])
    q /= np.linalg.norm(q)
    return MassProperties(total_m, com, np.maximum(evals, 0.0), q)
