"""2D core semantics: true 2D mass properties, PinSlot joint, f64 axis.

Reference parity: rapier2d MassProperties (dim2 parry), PinSlotJoint
(src/dynamics/joint/ — dim2-only), and the f64 feature builds
(src/lib.rs:64-66) exercised by s2d_far_pyramid.rs.
"""

import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from rapier_tpu.world2d import (
    ColliderBuilder2D,
    PhysicsWorld2D,
    RigidBodyBuilder2D,
    pin_slot_joint_2d,
    revolute_joint_2d,
)


def test_disc_inertia_is_2d():
    # Disc: m = pi r^2 rho, I = m r^2 / 2 (NOT the sphere's 2 m r^2 / 5).
    w = PhysicsWorld2D()
    b = w.insert_body(RigidBodyBuilder2D.dynamic())
    w.insert_collider(ColliderBuilder2D.ball(0.5).with_density(2.0), b)
    w.build()
    m = np.pi * 0.25 * 2.0
    i_z = 0.5 * m * 0.25
    np.testing.assert_allclose(
        1.0 / float(np.asarray(w.state.bodies.inv_mass)[b]), m, rtol=1e-5)
    np.testing.assert_allclose(
        1.0 / float(np.asarray(w.state.bodies.inv_principal_inertia)[b, 2]),
        i_z, rtol=1e-5)


def test_box_inertia_is_2d():
    w = PhysicsWorld2D()
    b = w.insert_body(RigidBodyBuilder2D.dynamic())
    w.insert_collider(ColliderBuilder2D.cuboid(0.5, 0.3).with_density(1.0), b)
    w.build()
    m = 4 * 0.5 * 0.3
    i_z = m * (0.25 + 0.09) / 3.0
    np.testing.assert_allclose(
        1.0 / float(np.asarray(w.state.bodies.inv_principal_inertia)[b, 2]),
        i_z, rtol=1e-5)


def test_pin_slot_joint_slides_and_spins():
    # PinSlot: slides along x and rotates, but cannot leave the slot line.
    w = PhysicsWorld2D(gravity=(0.0, -9.81))
    anchor = w.insert_body(RigidBodyBuilder2D.fixed().with_translation((0, 2)))
    b = w.insert_body(
        RigidBodyBuilder2D.dynamic().with_translation((0.0, 2.0))
        .with_linvel((2.0, 0.0)).with_angvel_scalar(5.0))
    w.insert_collider(ColliderBuilder2D.cuboid(0.3, 0.1).with_density(1.0), b)
    w.insert_impulse_joint(anchor, b, pin_slot_joint_2d(axis=(1.0, 0.0)))
    w.build()
    w.step(60)
    p = w.body_translation2(b)
    assert abs(p[1] - 2.0) < 1e-2, f"left the slot line: y={p[1]}"
    assert p[0] > 0.5, f"slide blocked: x={p[0]}"
    assert abs(w.body_rotation_angle(b)) > 0.5, "rotation was constrained"


def test_revolute_2d_pendulum_conserves_anchor():
    w = PhysicsWorld2D()
    pivot = w.insert_body(RigidBodyBuilder2D.fixed().with_translation((0, 3)))
    bob = w.insert_body(RigidBodyBuilder2D.dynamic().with_translation((1, 3)))
    w.insert_collider(ColliderBuilder2D.ball(0.2).with_density(1.0), bob)
    w.insert_impulse_joint(
        pivot, bob, revolute_joint_2d(anchor2=(-1.0, 0.0)))
    w.build()
    w.step(120)
    p = w.body_translation2(bob)
    r = np.linalg.norm(p - np.array([0.0, 3.0]))
    assert abs(r - 1.0) < 5e-2, f"pendulum radius drifted: {r}"


F64_SCRIPT = """
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from rapier_tpu.precision import set_precision
set_precision("f64")
import numpy as np
from rapier_tpu.world2d import PhysicsWorld2D, RigidBodyBuilder2D, ColliderBuilder2D

w = PhysicsWorld2D()
origin = np.array([100_000.0, -80_000.0])
ground = w.insert_body(
    RigidBodyBuilder2D.fixed().with_translation(tuple((0, -1) + origin)))
w.insert_collider(ColliderBuilder2D.cuboid(100.0, 1.0).with_friction(0.6), ground)
handles = []
base, h = 10, 0.5
shift = 1.25 * h
for i in range(base):
    y = (2.0 * i + 1.0) * shift + 0.5
    for j in range(i, base):
        x = (i + 1.0) * shift + 2.0 * (j - i) * shift - h * base
        b = w.insert_body(RigidBodyBuilder2D.dynamic().with_translation(
            tuple(np.array([x, y]) + origin)))
        w.insert_collider(ColliderBuilder2D.cuboid(h, h).with_friction(0.6), b)
        handles.append((b, x, y))
w.build()
assert w.state.bodies.pos.dtype == np.float64
w.step(300)
# Rows spawn with 0.25 vertical gaps: after settling, row i rests at
# 0.5 + i * 1.0 (box half-extent 0.5).  The pyramid stands iff every box
# sits near its row height with no lateral scatter.
err = 0.0
for idx, (b, x, y) in enumerate(handles):
    row = next(i for i in range(10) if idx < sum(10 - r for r in range(i + 1)))
    p = np.asarray(w.body_translation2(b)) - origin
    err = max(err, abs(p[1] - (0.5 + row * 1.0)))
assert err < 0.15, f"far pyramid collapsed at f64: max rest-height error {err}"
print("OK", err)
"""


def test_far_pyramid_stands_at_f64():
    """s2d_far_pyramid.rs at the f64 precision axis (set_precision is
    process-global — dtype threads through every cached jit signature — so
    this runs in a subprocess, mirroring the reference's per-build choice)."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run(
        [sys.executable, "-c", textwrap.dedent(F64_SCRIPT)],
        capture_output=True, text=True, timeout=1700, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, f"stdout={out.stdout}\nstderr={out.stderr[-2000:]}"
    assert "OK" in out.stdout


def test_inv_pyramid2_balances():
    """examples2d/inv_pyramid2.rs (downsized): an UPSIDE-DOWN pyramid —
    one box at the bottom, wider rows above — balances on its single
    support when built symmetrically (torque balance through the stack)."""
    w = PhysicsWorld2D()
    g = w.insert_body(RigidBodyBuilder2D.fixed().with_translation((0, -0.1)))
    w.insert_collider(ColliderBuilder2D.cuboid(20.0, 0.1), g)
    half = 0.5
    rows = 3
    tops = []
    for row in range(rows):           # row 0 = single bottom box
        n = row + 1
        y = half + row * 2 * half
        for i in range(n):
            x = (i - (n - 1) / 2.0) * 2 * half
            b = w.insert_body(
                RigidBodyBuilder2D.dynamic().with_translation((x, y)))
            w.insert_collider(ColliderBuilder2D.cuboid(half, half), b)
            if row == rows - 1:
                tops.append((b, x, y))
    w.build()
    w.step(300)
    for b, x0, y0 in tops:
        p = np.asarray(w.body_translation2(b))
        assert abs(p[1] - y0) < 0.1, f"inverse pyramid collapsed: y={p[1]}"
        assert abs(p[0] - x0) < 0.25, f"top row slid: x={p[0]} (built {x0})"


def test_restitution2_bounce_heights_order():
    """examples2d/restitution2.rs: balls with increasing restitution
    rebound to strictly increasing heights."""
    w = PhysicsWorld2D()
    g = w.insert_body(RigidBodyBuilder2D.fixed().with_translation((0, -0.1)))
    w.insert_collider(ColliderBuilder2D.cuboid(20.0, 0.1).with_restitution(1.0), g)
    balls = []
    for i, e in enumerate((0.2, 0.5, 0.8)):
        b = w.insert_body(
            RigidBodyBuilder2D.dynamic().with_translation((i * 2.0 - 2.0, 3.0)))
        w.insert_collider(
            ColliderBuilder2D.ball(0.3).with_restitution(e), b)
        balls.append(b)
    w.build()
    peaks = [0.0] * 3
    bounced = [False] * 3
    for _ in range(240):
        w.step()
        for i, b in enumerate(balls):
            vy = float(np.asarray(w.body_linvel2(b))[1])
            y = float(np.asarray(w.body_translation2(b))[1])
            if vy > 0.1:
                bounced[i] = True
            if bounced[i]:
                peaks[i] = max(peaks[i], y)
    assert all(bounced), f"not all balls bounced: {bounced}"
    assert peaks[0] < peaks[1] < peaks[2], \
        f"bounce heights must order with restitution: {peaks}"
