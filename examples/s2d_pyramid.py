"""s2d_pyramid (reference examples2d/s2d_pyramid.rs): the solver acid test.

A triangular pyramid of boxes must remain standing with the default 4 solver
iterations.  Pass base_count as argv[1] (default 20; the reference suite uses
100 — large counts need minutes of simulated settling).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


import sys

import numpy as np

from rapier_tpu.scenes import pyramid_world


def main():
    base = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    world = pyramid_world(base_count=base)
    world.build()
    world.step(600)
    pos = np.asarray(world.state.bodies.pos)[1 : world.n_bodies]
    n = len(pos)
    # Expected row heights.
    ok = np.abs(pos[:, 1] - np.round(pos[:, 1] * 2) / 2).max()
    print(f"pyramid rows: {base}, boxes: {n}")
    print(f"max height deviation: {ok:.3f}")
    print(f"top box at: {pos[-1]}")
    print("standing:", bool(pos[-1][1] > (base - 1) * 0.9))


if __name__ == "__main__":
    main()
