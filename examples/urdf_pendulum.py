"""URDF loading example: a double pendulum swings under gravity."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


import numpy as np

from rapier_tpu.loaders.urdf import load_urdf
from rapier_tpu.world import PhysicsWorld

URDF = """
<robot name="pendulum">
  <link name="base"><collision><geometry><box size="0.2 0.2 0.2"/></geometry></collision></link>
  <link name="arm1"><collision><origin xyz="0 -0.25 0"/><geometry><box size="0.05 0.5 0.05"/></geometry></collision></link>
  <link name="arm2"><collision><origin xyz="0 -0.25 0"/><geometry><capsule radius="0.04" length="0.4"/></geometry></collision></link>
  <joint name="shoulder" type="continuous"><parent link="base"/><child link="arm1"/><origin xyz="0 -0.1 0"/><axis xyz="0 0 1"/></joint>
  <joint name="elbow" type="continuous"><parent link="arm1"/><child link="arm2"/><origin xyz="0 -0.5 0"/><axis xyz="0 0 1"/></joint>
</robot>
"""


def main():
    world = PhysicsWorld(gravity=(-2.0, -9.81, 0.0))
    handles = load_urdf(URDF, world, root_translation=(0, 2, 0), fixed_base=True)
    world.build()
    for i in range(6):
        world.step(60)
        tip = world.body_translation(handles.bodies["arm2"])
        print(f"t={i + 1}s arm2 at {np.round(tip, 3)}")


if __name__ == "__main__":
    main()
