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

    # Flat / unbounded shapes contribute no mass; CONVEX and TRIMESH mass
    # comes from mesh_mass_properties (the builder calls it with the actual
    # geometry — the padded param table doesn't carry vertices).
    return zero


def mesh_mass_properties(vertices: np.ndarray, triangles: np.ndarray,
                         density: float,
                         assume_convex: bool = False) -> MassProperties:
    """Mass properties of a closed triangle mesh by the divergence theorem
    (the parry MassProperties::from_trimesh / from_convex_polyhedron analog;
    signed tetrahedra against the origin, so winding must be consistent and
    the surface closed).  `assume_convex` reorients each face outward from the
    centroid — needed for scipy ConvexHull simplices, whose winding is
    arbitrary per face."""
    v = np.asarray(vertices, np.float64)
    t = np.asarray(triangles, np.int64).copy()
    if assume_convex:
        centroid = v[np.unique(t)].mean(axis=0)
        a0, b0, c0 = v[t[:, 0]], v[t[:, 1]], v[t[:, 2]]
        n = np.cross(b0 - a0, c0 - a0)
        flip = np.einsum("ij,ij->i", n, (a0 + b0 + c0) / 3.0 - centroid) < 0
        t[flip] = t[flip][:, [0, 2, 1]]
    a, b, c = v[t[:, 0]], v[t[:, 1]], v[t[:, 2]]

    # Signed volume of each origin-tetra: det([a b c]) / 6.
    d6 = np.einsum("ij,ij->i", a, np.cross(b, c))
    vol = d6.sum() / 6.0
    if vol < 0:  # inward winding: flip
        a, c = c, a
        d6 = -d6
        vol = -vol
    if vol < 1e-12:
        return MassProperties(0.0, np.zeros(3), np.zeros(3), _identity_quat())

    # Tetra COM = (a+b+c+0)/4, weight d6/6: com = Σ d6·(a+b+c) / (4 Σ d6).
    com = (d6[:, None] * (a + b + c)).sum(axis=0) / (4.0 * d6.sum())
    mass = density * vol

    # Inertia via the canonical tetra-integral (Blow & Binstock 2004 form).
    def subexp(w0, w1, w2):
        f1 = w0 + w1 + w2
        f2 = w0 * w0 + w1 * (w0 + w1) + w2 * f1
        f3 = w0 * w0 * w0 + w0 * w0 * w1 + w0 * w1 * w1 + w1 * w1 * w1 \
            + w2 * f2
        g0 = f2 + w0 * (f1 + w0)
        g1 = f2 + w1 * (f1 + w1)
        g2 = f2 + w2 * (f1 + w2)
        return f1, f2, f3, g0, g1, g2

    x0, y0, z0 = (a - com).T
    x1, y1, z1 = (b - com).T
    x2, y2, z2 = (c - com).T
    fx1, fx2, fx3, gx0, gx1, gx2 = subexp(x0, x1, x2)
    fy1, fy2, fy3, gy0, gy1, gy2 = subexp(y0, y1, y2)
    fz1, fz2, fz3, gz0, gz1, gz2 = subexp(z0, z1, z2)
    d0 = (y1 - y0) * (z2 - z0) - (y2 - y0) * (z1 - z0)
    d1 = (z1 - z0) * (x2 - x0) - (z2 - z0) * (x1 - x0)
    d2 = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)

    intg_x2 = (d0 * fx3).sum() / 60.0
    intg_y2 = (d1 * fy3).sum() / 60.0
    intg_z2 = (d2 * fz3).sum() / 60.0
    intg_xy = (d0 * (y0 * gx0 + y1 * gx1 + y2 * gx2)).sum() / 120.0
    intg_yz = (d1 * (z0 * gy0 + z1 * gy1 + z2 * gy2)).sum() / 120.0
    intg_zx = (d2 * (x0 * gz0 + x1 * gz1 + x2 * gz2)).sum() / 120.0

    ixx = density * (intg_y2 + intg_z2)
    iyy = density * (intg_x2 + intg_z2)
    izz = density * (intg_x2 + intg_y2)
    ixy = -density * intg_xy
    iyz = -density * intg_yz
    izx = -density * intg_zx
    i_mat = np.array([
        [ixx, ixy, izx],
        [ixy, iyy, iyz],
        [izx, iyz, izz],
    ])
    evals, evecs = np.linalg.eigh(i_mat)
    if np.linalg.det(evecs) < 0:
        evecs[:, 0] = -evecs[:, 0]
    # Rotation matrix -> quaternion (principal frame).
    m = evecs
    tr = np.trace(m)
    if tr > 0:
        s = math.sqrt(tr + 1.0) * 2
        qw = 0.25 * s
        qx = (m[2, 1] - m[1, 2]) / s
        qy = (m[0, 2] - m[2, 0]) / s
        qz = (m[1, 0] - m[0, 1]) / s
    else:
        i = int(np.argmax(np.diag(m)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = math.sqrt(max(1.0 + m[i, i] - m[j, j] - m[k, k], 1e-12)) * 2
        q = np.zeros(4)
        q[i] = 0.25 * s
        q[j] = (m[j, i] + m[i, j]) / s
        q[k] = (m[k, i] + m[i, k]) / s
        qw = (m[k, j] - m[j, k]) / s
        qx, qy, qz = q[0], q[1], q[2]
    frame = np.array([qx, qy, qz, qw], np.float32)
    n = np.linalg.norm(frame)
    frame = frame / n if n > 1e-9 else _identity_quat()
    return MassProperties(
        float(mass), com.astype(np.float32),
        np.maximum(evals, 0.0).astype(np.float32), frame,
    )


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
