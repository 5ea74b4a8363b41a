"""Batched quadruped RL rollout: a hand-written 8-dof quadruped (trunk +
2-hinge legs, reduced-coordinate articulation) standing on four feet, driven
by PD position servos, vmapped over many scenes.

This is the BASELINE.json config-#5 axis (reference
examples3d/mujoco_menagerie3.rs:12-60 — the menagerie assets are not
vendored in this image, so the robot is hand-written; same structure:
free-floating base, hinge legs, position actuators, batched stepping).

Run: PYTHONPATH=. python examples/quadruped_rl.py [n_scenes] [n_steps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from rapier_tpu.pipeline.physics_pipeline import step
from rapier_tpu.scenes import quadruped_world, replicate_scene


def main(n_scenes: int = 256, n_steps: int = 120):
    w, robot = quadruped_world(use_multibody=True)
    state0 = w.build()
    params = w.params

    # A tiny open-loop crouch policy: all knees track a sinusoid.
    knee_slots = [robot._mb_slot(w, f"{leg}_knee")
                  for leg in ("fl", "fr", "rl", "rr")]
    knee_axes = [robot.joint_axis[f"{leg}_knee"]
                 for leg in ("fl", "fr", "rl", "rr")]
    trunk = robot.bodies["trunk"]

    batch = jax.tree.map(jnp.asarray, replicate_scene(state0, n_scenes))

    @jax.jit
    def rollout_chunk(state, targets):
        def body(s, tgt):
            mb = s.multibodies
            tp = mb.motor_target_pos
            for (ti, li), ax in zip(knee_slots, knee_axes):
                tp = tp.at[:, ti, li, ax].set(tgt)
            s = s.replace(multibodies=mb.replace(motor_target_pos=tp))
            s2, _ = jax.vmap(step, in_axes=(0, None))(s, params)
            return s2, s2.bodies.pos[:, trunk, 2]  # trunk height

        return jax.lax.scan(body, state, targets)

    t_axis = jnp.arange(n_steps) * params.dt
    targets = 0.3 * jnp.sin(2.0 * jnp.pi * 0.5 * t_axis)

    out, zs = rollout_chunk(batch, targets)
    jax.block_until_ready(out)
    t0 = time.time()
    out, zs = rollout_chunk(out, targets)
    jax.block_until_ready(out)
    dt = time.time() - t0
    print(f"{n_scenes} quadrupeds x {n_steps} steps in {dt:.2f}s = "
          f"{n_scenes * n_steps / dt:,.0f} env-steps/s")
    print("trunk z (scene 0, last 5 steps):",
          np.asarray(zs[-5:, 0]).round(3))
    assert np.isfinite(np.asarray(zs)).all()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256,
         int(sys.argv[2]) if len(sys.argv) > 2 else 120)
