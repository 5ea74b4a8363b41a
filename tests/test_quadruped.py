"""Batched quadruped regression: the BASELINE.json config-#5 axis.

A free-floating trunk with four 2-hinge legs (reduced coordinates) must
STAND on four simultaneous foot contacts with PD servos holding the default
pose — the multi-contact articulation case the round-3 verdict flagged as
untested (diagonal-only mobility blocks, dynamics/multibody.py phase B;
reference generic_contact_constraint.rs:392 couples the full system).
Reference scene: examples3d/mujoco_menagerie3.rs:12-60.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rapier_tpu.pipeline.physics_pipeline import step
from rapier_tpu.scenes import quadruped_world, replicate_scene


@pytest.fixture(scope="module", params=[True, False],
                ids=["multibody", "impulse"])
def standing(request):
    w, robot = quadruped_world(use_multibody=request.param)
    state = w.build()
    params = w.params

    @jax.jit
    def run(s):
        for _ in range(10):
            s, ev = step(s, params)
        return s, ev

    s = jax.tree.map(jnp.asarray, state)
    for _ in range(24):          # 240 steps = 4 simulated seconds
        s, ev = run(s)
    return w, robot, s, ev


def test_quadruped_stands(standing):
    w, robot, s, _ev = standing
    trunk = robot.bodies["trunk"]
    pos = np.asarray(s.bodies.pos)
    assert np.isfinite(pos).all()
    z = float(pos[trunk, 2])
    # Standing height: hips at trunk-0.05, two 0.18 links, foot radius 0.025
    # => ~0.435; servo sag allowed.
    assert 0.33 < z < 0.47, f"trunk height {z}"
    # Upright: trunk z-axis stays near world z.
    q = np.asarray(s.bodies.rot[trunk])
    up_z = 1.0 - 2.0 * (q[0] * q[0] + q[1] * q[1])
    assert up_z > 0.95, f"trunk tilted, up_z={up_z}"


def test_four_feet_in_contact(standing):
    w, robot, s, _ev = standing
    feet = {robot.bodies[f"{leg}_lower"] for leg in ("fl", "fr", "rl", "rr")}
    c = s.contacts
    touching = np.asarray(c.touching)
    b1 = np.asarray(c.body1)
    b2 = np.asarray(c.body2)
    in_contact = set()
    for lane in np.nonzero(touching)[0]:
        for b in (int(b1[lane]), int(b2[lane])):
            if b in feet:
                in_contact.add(b)
    assert in_contact == feet, f"feet touching: {in_contact} != {feet}"


def test_feet_carry_the_weight(standing):
    """Total upward contact impulse ~ robot weight * dt: the contact forces
    flow through the articulated mobility, not just geometry."""
    w, robot, s, _ev = standing
    c = s.contacts
    imp = np.asarray(c.impulse)            # [4, P] normal impulses
    nrm = np.asarray(c.normal)             # [3, P]
    touching = np.asarray(c.touching)
    f_up = float(np.sum(np.abs(nrm[2]) * imp.sum(0) * touching))
    masses = np.asarray(s.bodies.inv_mass)
    total_mass = float(np.sum(np.where(masses > 0, 1.0 / np.maximum(
        masses, 1e-9), 0.0)))
    expected = total_mass * 9.81 * float(w.params.dt)
    assert 0.5 * expected < f_up < 2.0 * expected, (f_up, expected)


def test_quadruped_vmap_batch():
    """Vmapped rollout: identical scenes stay bitwise identical and finite
    (the batched-RL contract)."""
    w, robot = quadruped_world(use_multibody=True)
    state = w.build()
    params = w.params
    batch = jax.tree.map(jnp.asarray, replicate_scene(state, 4))

    @jax.jit
    def run(b):
        def body(s, _):
            s2, _ev = jax.vmap(step, in_axes=(0, None))(s, params)
            return s2, ()
        b2, _ = jax.lax.scan(body, b, None, length=60)
        return b2

    out = run(batch)
    pos = np.asarray(out.bodies.pos)
    assert np.isfinite(pos).all()
    for i in range(1, 4):
        np.testing.assert_array_equal(pos[0], pos[i])


def test_quadruped_crouch_tracks_targets():
    """Driving knee servos crouches the trunk: actuation flows through the
    reduced-coordinate articulation into contact-supported motion."""
    w, robot = quadruped_world(use_multibody=True)
    state = w.build()
    params = w.params
    trunk = robot.bodies["trunk"]
    knee_slots = [robot._mb_slot(w, f"{leg}_knee")
                  for leg in ("fl", "fr", "rl", "rr")]
    knee_axes = [robot.joint_axis[f"{leg}_knee"]
                 for leg in ("fl", "fr", "rl", "rr")]

    s = jax.tree.map(jnp.asarray, state)

    @jax.jit
    def settle(s):
        for _ in range(10):
            s, _ = step(s, params)
        return s

    for _ in range(12):
        s = settle(s)
    z0 = float(s.bodies.pos[trunk, 2])

    mb = s.multibodies
    tp = mb.motor_target_pos
    for (ti, li), ax in zip(knee_slots, knee_axes):
        tp = tp.at[ti, li, ax].set(0.9)
    s = s.replace(multibodies=mb.replace(motor_target_pos=tp))
    for _ in range(12):
        s = settle(s)
    z1 = float(s.bodies.pos[trunk, 2])
    assert z1 < z0 - 0.04, (z0, z1)
    assert np.isfinite(np.asarray(s.bodies.pos)).all()
