"""PD / PID pose-tracking controllers for dynamic bodies.

Behavioral port of the reference PdController/PidController
(src/control/pid_controller.rs:14,56): computes the force/torque that drives a
dynamic body towards a target pose and velocity.  Gains are acceleration-based
(scaled by mass/inertia) like the reference default, and fully batched: pass
[N, ...] targets for per-body control (the RL actuation path).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from rapier_tpu.math import quat

# Axis mask bits (reference PdErrors axes): linear xyz, angular xyz.
AXES_LIN = 0b000111
AXES_ANG = 0b111000
AXES_ALL = 0b111111


@dataclass(frozen=True)
class PdGains:
    lin_kp: float = 60.0
    lin_kd: float = 6.0
    ang_kp: float = 60.0
    ang_kd: float = 6.0
    axes: int = AXES_ALL


def rotation_error(rot, target_rot):
    """Rotation vector (axis * angle) taking `rot` to `target_rot`."""
    dq = quat.mul(target_rot, quat.conj(rot))
    dq = jnp.where(dq[..., 3:4] < 0, -dq, dq)
    v = dq[..., :3]
    s = jnp.linalg.norm(v, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(s[..., 0], dq[..., 3])
    axis = v / jnp.maximum(s, 1e-12)
    return axis * angle[..., None]


def pd_force_and_torque(bodies, target_pos, target_rot, target_linvel,
                        target_angvel, gains: PdGains = PdGains()):
    """Forces/torques to reach the target pose+velocity (PdController).

    Returns (force [N,3], torque [N,3]) ready for `bodies.replace(force=...)`
    or accumulation; zero for non-dynamic bodies.
    """
    lin_mask = jnp.array([
        float(bool(gains.axes & 1)), float(bool(gains.axes & 2)),
        float(bool(gains.axes & 4)),
    ])
    ang_mask = jnp.array([
        float(bool(gains.axes & 8)), float(bool(gains.axes & 16)),
        float(bool(gains.axes & 32)),
    ])

    lin_err = target_pos - bodies.pos
    ang_err = rotation_error(bodies.rot, target_rot)

    acc_lin = (gains.lin_kp * lin_err + gains.lin_kd * (target_linvel - bodies.linvel))
    acc_ang = (gains.ang_kp * ang_err + gains.ang_kd * (target_angvel - bodies.angvel))

    mass = jnp.where(bodies.inv_mass > 0, 1.0 / jnp.maximum(bodies.inv_mass, 1e-12), 0.0)
    force = acc_lin * mass[:, None] * lin_mask

    # Torque through the world inertia tensor.
    rot_w = quat.mul(bodies.rot, bodies.principal_frame)
    m = quat.to_matrix(rot_w)
    inertia = jnp.where(
        bodies.inv_principal_inertia > 0,
        1.0 / jnp.maximum(bodies.inv_principal_inertia, 1e-12), 0.0,
    )
    i_world = jnp.einsum("nij,nj,nkj->nik", m, inertia, m)
    torque = jnp.einsum("nij,nj->ni", i_world, acc_ang * ang_mask)

    dyn = (bodies.body_type == 0)[:, None]
    return jnp.where(dyn, force, 0.0), jnp.where(dyn, torque, 0.0)


@dataclass
class PidState:
    """Integral accumulators for the PID variant (PidController)."""

    lin_integral: jnp.ndarray
    ang_integral: jnp.ndarray


def pid_force_and_torque(bodies, state: PidState, target_pos, target_rot,
                         target_linvel, target_angvel, dt,
                         gains: PdGains = PdGains(), ki_lin: float = 0.0,
                         ki_ang: float = 0.0):
    """PID = PD + integral terms; returns (force, torque, new_state)."""
    force, torque = pd_force_and_torque(
        bodies, target_pos, target_rot, target_linvel, target_angvel, gains
    )
    lin_err = target_pos - bodies.pos
    ang_err = rotation_error(bodies.rot, target_rot)
    lin_i = state.lin_integral + lin_err * dt
    ang_i = state.ang_integral + ang_err * dt
    mass = jnp.where(bodies.inv_mass > 0, 1.0 / jnp.maximum(bodies.inv_mass, 1e-12), 0.0)
    force = force + ki_lin * lin_i * mass[:, None]
    torque = torque + ki_ang * ang_i
    return force, torque, PidState(lin_integral=lin_i, ang_integral=ang_i)
