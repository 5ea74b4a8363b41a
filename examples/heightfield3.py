"""heightfield3 (reference examples3d/heightfield3.rs): mixed primitives
dropped on a sin/cos heightfield.  Headless settle check.
Run: python examples/heightfield3.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from rapier_tpu.world import ColliderBuilder, PhysicsWorld, RigidBodyBuilder


def main():
    w = PhysicsWorld()
    n = 12
    xs = np.linspace(-8.0, 8.0, n)
    zs = np.linspace(-8.0, 8.0, n)
    heights = np.sin(xs[None, :]) + np.cos(zs[:, None])
    ground = w.insert_body(RigidBodyBuilder.fixed())
    w.insert_collider(
        ColliderBuilder.heightfield(heights, (16.0, 1.0, 16.0)), ground
    )

    bodies = []
    rng = np.random.RandomState(0)
    for i in range(12):
        x, z = rng.uniform(-4, 4, 2)
        kind = i % 3
        b = w.insert_body(
            RigidBodyBuilder.dynamic().with_translation((x, 4.0 + (i % 4), z))
        )
        cb = (ColliderBuilder.ball(0.4) if kind == 0 else
              ColliderBuilder.cuboid(0.35, 0.35, 0.35) if kind == 1 else
              ColliderBuilder.capsule_y(0.25, 0.25))
        w.insert_collider(cb, b)
        bodies.append(b)

    w.build()
    w.step(300)
    ys = np.array([w.body_translation(b)[1] for b in bodies])
    print(f"settled heights: min {ys.min():.2f} max {ys.max():.2f}")
    assert np.isfinite(ys).all()
    assert (ys > -2.5).all(), "bodies fell through the heightfield"
    assert (ys < 3.0).all(), "bodies never settled"
    print("heightfield3 OK")


if __name__ == "__main__":
    main()
