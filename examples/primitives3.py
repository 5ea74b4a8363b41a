"""primitives3 (reference examples3d/primitives3.rs): mixed primitive drop.

Headless: builds the scene, steps 5 simulated seconds, prints a settle report.
Run: JAX_PLATFORMS=cpu python examples/primitives3.py   (or on TPU directly)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


import numpy as np

from rapier_tpu.scenes import mixed_primitives_world


def main():
    world = mixed_primitives_world(num_layers=4, grid=5)
    world.build()
    world.step(300)
    pos = np.asarray(world.state.bodies.pos)[1 : world.n_bodies]
    sleeping = np.asarray(world.state.bodies.sleeping)[1 : world.n_bodies]
    print(f"bodies: {len(pos)}")
    print(f"settled height range: {pos[:, 1].min():.3f} .. {pos[:, 1].max():.3f}")
    print(f"sleeping: {sleeping.sum()}/{len(pos)}")
    print(f"all finite: {np.isfinite(pos).all()}")


if __name__ == "__main__":
    main()
