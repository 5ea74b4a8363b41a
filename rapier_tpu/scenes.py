"""Canonical benchmark / acceptance scenes (SURVEY Appendix A).

Scene builders mirror the reference examples (examples3d/primitives3.rs,
examples2d/s2d_pyramid.rs, stress_tests/) as data so tests and benches can
reproduce them without the Rust testbed.
"""

from __future__ import annotations

import jax
import numpy as np

from rapier_tpu.world import ColliderBuilder, PhysicsWorld, RigidBodyBuilder


def mixed_primitives_world(num_layers: int = 4, grid: int = 4, rad: float = 0.5,
                           **world_kw) -> PhysicsWorld:
    """primitives3-flavored scene (examples3d/primitives3.rs:13-60) restricted
    to the analytically-supported pair set: balls, capsules, cuboids dropped
    onto a fixed ground cuboid."""
    w = PhysicsWorld(**world_kw)
    ground = w.insert_body(RigidBodyBuilder.fixed().with_translation((0.0, -2.1, 0.0)))
    w.insert_collider(ColliderBuilder.cuboid(100.1, 2.1, 100.1), ground)

    shift = rad * 2.5
    center = shift * (grid - 1) / 2.0
    for j in range(num_layers):
        y = j * shift * 2.0 + rad + 2.0
        for i in range(grid):
            for k in range(grid):
                x = i * shift - center + 0.02 * j
                z = k * shift - center + 0.02 * j
                b = w.insert_body(
                    RigidBodyBuilder.dynamic().with_translation((x, y, z))
                )
                kind = j % 3
                if kind == 0:
                    cb = ColliderBuilder.ball(rad)
                elif kind == 1:
                    cb = ColliderBuilder.cuboid(rad, rad, rad)
                else:
                    cb = ColliderBuilder.capsule_y(rad * 0.5, rad * 0.5)
                w.insert_collider(cb, b)
    return w


def pyramid_world(base_count: int = 10, half: float = 0.5, friction: float = 0.6,
                  **world_kw) -> PhysicsWorld:
    """s2d_pyramid (examples2d/s2d_pyramid.rs:13-38) lifted to 3D: a planar
    triangular pyramid of cuboids on a ground cuboid."""
    w = PhysicsWorld(**world_kw)
    ground = w.insert_body(RigidBodyBuilder.fixed().with_translation((0.0, -1.0, 0.0)))
    w.insert_collider(
        ColliderBuilder.cuboid(100.0, 1.0, 100.0).with_friction(friction), ground
    )
    gap = half * 2.0 * 1.002
    for row in range(base_count):
        n_in_row = base_count - row
        y = half + row * half * 2.0
        x0 = -(n_in_row - 1) * gap / 2.0
        for i in range(n_in_row):
            b = w.insert_body(
                RigidBodyBuilder.dynamic().with_translation((x0 + i * gap, y, 0.0))
            )
            w.insert_collider(
                ColliderBuilder.cuboid(half, half, half).with_friction(friction), b
            )
    return w


def stack_world(n: int = 10, half: float = 0.5, friction: float = 0.7,
                **world_kw) -> PhysicsWorld:
    w = PhysicsWorld(**world_kw)
    ground = w.insert_body(RigidBodyBuilder.fixed().with_translation((0.0, -1.0, 0.0)))
    w.insert_collider(
        ColliderBuilder.cuboid(50.0, 1.0, 50.0).with_friction(friction), ground
    )
    for i in range(n):
        b = w.insert_body(
            RigidBodyBuilder.dynamic().with_translation((0.0, half + i * half * 2.002, 0.0))
        )
        w.insert_collider(
            ColliderBuilder.cuboid(half, half, half).with_friction(friction), b
        )
    return w


def replicate_scene(state, batch: int):
    """Broadcast one SceneState into a batch of identical scenes (leading
    scene axis) for vmapped stepping."""
    return jax.tree.map(
        lambda x: np.broadcast_to(np.asarray(x)[None], (batch,) + np.asarray(x).shape).copy(),
        state,
    )


def pyramid3_world(stack_height: int = 12, half: float = 1.0,
                   **world_kw) -> PhysicsWorld:
    """3D square pyramid stress scene (reference
    examples3d/stress_tests/pyramid3.rs:4-64): stack_height levels, level i
    holds (stack_height - i)^2 cuboids — stack 24 = 4,900 boxes, stack 31 =
    10,416 ("the 10k-box pyramid")."""
    w = PhysicsWorld(**world_kw)
    ground = w.insert_body(
        RigidBodyBuilder.fixed().with_translation((0.0, -0.1, 0.0))
    )
    w.insert_collider(ColliderBuilder.cuboid(50.0, 0.1, 50.0), ground)

    shift = half * 2.5
    bottomy = half
    n = stack_height
    for i in range(n):
        for j in range(i, n):
            for k in range(i, n):
                x = i * shift / 2.0 + (k - i) * shift - n * half
                y = i * shift + bottomy
                z = i * shift / 2.0 + (j - i) * shift - n * half
                b = w.insert_body(
                    RigidBodyBuilder.dynamic().with_translation((x, y, z))
                )
                w.insert_collider(ColliderBuilder.cuboid(half, half, half), b)
    return w


# ---------------------------------------------------------------------------
# Quadruped robot scene (the batched-RL flagship axis, BASELINE.json config
# #5; reference examples3d/mujoco_menagerie3.rs:12-60 loads unitree_a1 —
# menagerie assets are not vendored in this image, so this is a hand-written
# 8-dof quadruped in the same spirit: free-floating trunk, 2 hinge joints
# per leg, position-servo actuators).
# ---------------------------------------------------------------------------

QUADRUPED_MJCF = """
<mujoco model="quadruped">
  <compiler angle="radian"/>
  <worldbody>
    <geom name="floor" type="plane" size="10 10 0.1" friction="0.9"/>
    <body name="trunk" pos="0 0 0.45">
      <joint name="root" type="free"/>
      <geom name="trunk_geom" type="box" size="0.25 0.15 0.05"
            density="800"/>
      <BODY_LEGS/>
    </body>
  </worldbody>
  <actuator>
    <ACTUATORS/>
  </actuator>
</mujoco>
"""


def _quadruped_xml() -> str:
    legs, acts = [], []
    for name, sx, sy in (
        ("fl", 1, 1), ("fr", 1, -1), ("rl", -1, 1), ("rr", -1, -1),
    ):
        x, y = 0.18 * sx, 0.11 * sy
        legs.append(f"""
      <body name="{name}_upper" pos="{x} {y} -0.05">
        <joint name="{name}_hip" type="hinge" axis="0 1 0"
               limited="true" range="-1.2 1.2"/>
        <geom type="capsule" fromto="0 0 0  0 0 -0.18" size="0.03"
              density="1000"/>
        <body name="{name}_lower" pos="0 0 -0.18">
          <joint name="{name}_knee" type="hinge" axis="0 1 0"
                 limited="true" range="-1.6 1.6"/>
          <geom type="capsule" fromto="0 0 0  0 0 -0.18" size="0.025"
                density="1000" friction="0.9"/>
        </body>
      </body>""")
        for j in ("hip", "knee"):
            acts.append(
                f'<position name="{name}_{j}_servo" joint="{name}_{j}" '
                f'kp="80"/>'
            )
    return (QUADRUPED_MJCF
            .replace("<BODY_LEGS/>", "".join(legs))
            .replace("<ACTUATORS/>", "\n    ".join(acts)))


def quadruped_world(use_multibody: bool = True, **world_kw):
    """Quadruped standing on a plane.  Returns (world, MjcfRobotHandles).

    use_multibody=True inserts the articulation in reduced coordinates —
    four feet in simultaneous contact exercise the multibody two-way
    contact coupling under multi-contact (VERDICT r3 missing #3)."""
    from rapier_tpu.loaders.mjcf import load_mjcf

    world_kw.setdefault("gravity", (0.0, 0.0, -9.81))
    w = PhysicsWorld(**world_kw)
    handles = load_mjcf(_quadruped_xml(), w, use_multibody=use_multibody)
    return w, handles
