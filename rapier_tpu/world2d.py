"""2D world facade: the rapier2d API surface on the 3D engine.

Round-1 approach to the reference's dim2 build (SURVEY §5.6 compile-time
config): 2D scenes run on the 3D engine with every body plane-locked
(z-translation and x/y-rotation locked), which reproduces the s2d solver
parity suite semantics exactly.  A dimension-polymorphic core (dtype/shape
polymorphism like the reference's dim2/dim3 cargo features) is a later-round
optimization — this facade keeps the user API 2D.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from rapier_tpu.types import (
    LOCK_ROTATION_X,
    LOCK_ROTATION_Y,
    LOCK_TRANSLATION_Z,
)
from rapier_tpu.world import (
    ColliderBuilder,
    GenericJointBuilder,
    PhysicsWorld,
    RigidBodyBuilder,
)

_PLANE_LOCK = LOCK_TRANSLATION_Z | LOCK_ROTATION_X | LOCK_ROTATION_Y
_DEPTH = 0.5  # half-thickness given to extruded 2D shapes


class RigidBodyBuilder2D(RigidBodyBuilder):
    @staticmethod
    def dynamic():
        b = RigidBodyBuilder.dynamic()
        b.locked_axes |= _PLANE_LOCK
        b.__class__ = RigidBodyBuilder2D
        return b

    @staticmethod
    def fixed():
        b = RigidBodyBuilder.fixed()
        b.__class__ = RigidBodyBuilder2D
        return b

    def with_translation(self, xy):
        x, y = xy
        return self._set(translation=(float(x), float(y), 0.0))

    def with_rotation_angle(self, angle):
        import math

        return self._set(rotation=(0.0, 0.0, math.sin(angle / 2), math.cos(angle / 2)))

    def with_linvel(self, v):
        return self._set(linvel=(float(v[0]), float(v[1]), 0.0))

    def with_angvel_scalar(self, w):
        return self._set(angvel=(0.0, 0.0, float(w)))


class ColliderBuilder2D:
    """2D shape ctors -> extruded 3D shapes.

    Collision geometry is the in-plane section of the 3D shape (identical
    contact behavior for plane-locked bodies); MASS properties are the true
    2D ones (area density, disc I = mr^2/2 not the sphere's 2mr^2/5) —
    PhysicsWorld2D.build() recomputes them from the `_shape2d` tags
    (reference rapier2d MassProperties, dim2 parry mass_properties)."""

    @staticmethod
    def cuboid(hx, hy) -> ColliderBuilder:
        cb = ColliderBuilder.cuboid(hx, hy, _DEPTH)
        cb._shape2d = ("cuboid", (float(hx), float(hy)))
        return cb

    @staticmethod
    def ball(r) -> ColliderBuilder:
        cb = ColliderBuilder.ball(r)
        cb._shape2d = ("ball", (float(r),))
        return cb

    @staticmethod
    def capsule_x(hh, r) -> ColliderBuilder:
        cb = ColliderBuilder.capsule_x(hh, r)
        cb._shape2d = ("capsule", (float(hh), float(r), 0))
        return cb

    @staticmethod
    def capsule_y(hh, r) -> ColliderBuilder:
        cb = ColliderBuilder.capsule_y(hh, r)
        cb._shape2d = ("capsule", (float(hh), float(r), 1))
        return cb

    @staticmethod
    def segment(a, b) -> ColliderBuilder:
        return ColliderBuilder.segment((a[0], a[1], 0.0), (b[0], b[1], 0.0))

    @staticmethod
    def convex_hull(points) -> ColliderBuilder:
        """2D convex polygon (reference ColliderBuilder::convex_hull, dim2):
        extruded to a 3D hull for collision; mass properties use the true
        polygon formulas (see _mass_props_2d)."""
        pts = [(float(x), float(y)) for x, y in points]
        pts3 = [(x, y, -_DEPTH) for x, y in pts] + [
            (x, y, _DEPTH) for x, y in pts
        ]
        cb = ColliderBuilder.convex_hull(pts3)
        cb._shape2d = ("polygon", tuple(pts))
        return cb

    @staticmethod
    def halfspace(normal) -> ColliderBuilder:
        return ColliderBuilder.halfspace((normal[0], normal[1], 0.0))


def _mass_props_2d(kind: str, args, density: float):
    """(mass, I_z about own center[, centroid offset]) with AREA density
    (rapier2d semantics).  Returns (m, I, (cx, cy)) — the centroid offset is
    (0, 0) for center-symmetric shapes and the polygon centroid for
    convex_hull (its vertices are collider-local, not centered)."""
    if kind == "polygon":
        pts = np.asarray(args, float)
        # CCW order around the vertex mean (input is a convex vertex set).
        c0 = pts.mean(axis=0)
        order = np.argsort(np.arctan2(pts[:, 1] - c0[1], pts[:, 0] - c0[0]))
        pts = pts[order]
        x, y = pts[:, 0], pts[:, 1]
        x2, y2 = np.roll(x, -1), np.roll(y, -1)
        cr = x * y2 - x2 * y
        area2 = np.sum(cr)                   # 2A, > 0 for CCW
        a = 0.5 * area2
        cx = np.sum((x + x2) * cr) / (3.0 * area2)
        cy = np.sum((y + y2) * cr) / (3.0 * area2)
        i_origin = density * np.sum(
            cr * (x * x + x * x2 + x2 * x2 + y * y + y * y2 + y2 * y2)
        ) / 12.0
        m = density * a
        i_c = i_origin - m * (cx * cx + cy * cy)
        return m, i_c, (cx, cy)
    if kind == "ball":
        (r,) = args
        m = np.pi * r * r * density
        return m, 0.5 * m * r * r, (0.0, 0.0)
    if kind == "cuboid":
        hx, hy = args
        m = 4.0 * hx * hy * density
        return m, m * (hx * hx + hy * hy) / 3.0, (0.0, 0.0)
    if kind == "capsule":
        hh, r, _axis = args
        m_rect = 4.0 * hh * r * density
        m_disc = np.pi * r * r * density
        # Rectangle 2hh x 2r about center + the two half-discs at +-hh
        # (treated as a displaced full disc; exact to O(r/hh) of the
        # half-disc centroid offset).
        i_rect = m_rect * (hh * hh + r * r) / 3.0
        i_disc = 0.5 * m_disc * r * r + m_disc * hh * hh
        return m_rect + m_disc, i_rect + i_disc, (0.0, 0.0)
    raise KeyError(kind)


class PhysicsWorld2D(PhysicsWorld):
    """2D API facade over the plane-locked 3D world."""

    def __init__(self, gravity=(0.0, -9.81), **kw):
        super().__init__(gravity=(gravity[0], gravity[1], 0.0), **kw)
        # 2D manifolds carry <= 2 points: solve them as one coupled 2x2 MLCP
        # (reference BLOCK_SOLVER_ENABLED = dim2, integration_parameters.rs:9).
        self.params = self.params.replace(block_solver_2x2=True)

    def insert_body(self, builder) -> int:
        if builder.body_type == 0:  # dynamic bodies must be plane-locked
            builder.locked_axes |= _PLANE_LOCK
        return super().insert_body(builder)

    def build(self):
        state = super().build()
        # Recompute dynamic bodies' mass properties with the true 2D
        # formulas (disc I = mr^2/2 etc, AREA density) wherever every
        # attached collider carries a _shape2d tag; mixed/3D bodies keep the
        # volumetric 3D values.
        per_body: dict[int, list] = {}
        tagged_ok: dict[int, bool] = {}
        for cb, parent in self._pending_colliders:
            if parent < 0 or cb.sensor:
                continue
            tag = getattr(cb, "_shape2d", None)
            tagged_ok[parent] = tagged_ok.get(parent, True) and tag is not None
            per_body.setdefault(parent, []).append((tag, cb))
        inv_mass = np.asarray(state.bodies.inv_mass).copy()
        inv_pi = np.asarray(state.bodies.inv_principal_inertia).copy()
        local_com = np.asarray(state.bodies.local_com).copy()
        pframe = np.asarray(state.bodies.principal_frame).copy()
        body_type = np.asarray(state.bodies.body_type)
        for b, parts in per_body.items():
            if not tagged_ok.get(b) or body_type[b] != 0:
                continue
            if any(p[1].mass is not None for p in parts):
                continue  # explicit mass overrides win (3D path handled it)
            m_tot, i_tot = 0.0, 0.0
            cx = cy = 0.0
            props = []
            for tag, cb in parts:
                m, i_own, c_off = _mass_props_2d(tag[0], tag[1], cb.density)
                off = np.asarray(cb.translation[:2], float) + np.asarray(c_off)
                props.append((m, i_own, off))
                m_tot += m
                cx += m * off[0]
                cy += m * off[1]
            if m_tot <= 0.0:
                continue
            com = np.array([cx / m_tot, cy / m_tot])
            for m, i_own, off in props:
                d2 = float(np.sum((off - com) ** 2))
                i_tot += i_own + m * d2
            inv_mass[b] = 1.0 / m_tot
            local_com[b] = [com[0], com[1], 0.0]
            iz = 1.0 / i_tot if i_tot > 0 else 0.0
            # x/y spin axes are plane-locked; give them the same inertia so
            # any residual numeric torque stays bounded.
            inv_pi[b] = [iz, iz, iz]
            pframe[b] = [0.0, 0.0, 0.0, 1.0]
        self.state = state.replace(bodies=state.bodies.replace(
            inv_mass=inv_mass, inv_principal_inertia=inv_pi,
            local_com=local_com, principal_frame=pframe,
        ))
        return self.state

    def body_translation2(self, h) -> np.ndarray:
        return self.body_translation(h)[:2]

    def body_rotation_angle(self, h) -> float:
        q = self.body_rotation(h)
        return float(2.0 * np.arctan2(q[2], q[3]))

    def body_linvel2(self, h) -> np.ndarray:
        return self.body_linvel(h)[:2]


def revolute_joint_2d(anchor1=(0.0, 0.0), anchor2=(0.0, 0.0)) -> GenericJointBuilder:
    """2D revolute = 3D revolute about +Z."""
    gb = GenericJointBuilder.revolute((0.0, 0.0, 1.0))
    gb.with_local_anchor1((anchor1[0], anchor1[1], 0.0))
    gb.with_local_anchor2((anchor2[0], anchor2[1], 0.0))
    return gb


def prismatic_joint_2d(axis=(1.0, 0.0), anchor1=(0.0, 0.0),
                       anchor2=(0.0, 0.0)) -> GenericJointBuilder:
    """2D prismatic: slide along `axis`, rotation locked."""
    gb = GenericJointBuilder.prismatic((axis[0], axis[1], 0.0))
    gb.with_local_anchor1((anchor1[0], anchor1[1], 0.0))
    gb.with_local_anchor2((anchor2[0], anchor2[1], 0.0))
    return gb


def pin_slot_joint_2d(axis=(1.0, 0.0), anchor1=(0.0, 0.0),
                      anchor2=(0.0, 0.0)) -> GenericJointBuilder:
    """2D pin-slot joint (reference PinSlotJoint, dim2-only
    src/dynamics/joint/pin_slot_joint.rs): the anchor slides along `axis`
    AND rotates freely — only the perpendicular in-plane translation is
    constrained.  Embedded in 3D: frames put local X on the slot axis; the
    joint locks LIN_Y (in-plane perpendicular) + LIN_Z (kept exact by the
    plane lock), leaving LIN_X and all rotations free."""
    gb = GenericJointBuilder.prismatic((axis[0], axis[1], 0.0))
    # prismatic() locked LIN_Y|LIN_Z|ANG_*; drop the angular locks.
    from rapier_tpu.types import JOINT_ANG_AXES

    gb.locked_axes &= ~JOINT_ANG_AXES
    gb.with_local_anchor1((anchor1[0], anchor1[1], 0.0))
    gb.with_local_anchor2((anchor2[0], anchor2[1], 0.0))
    return gb
