"""Reduced-coordinate multibody articulations (generalized coordinates).

Behavioral port of the reference Multibody
(src/dynamics/joint/multibody_joint/multibody.rs:96-1347):
- per-link joints wrap a GenericJoint axes mask; free (unlocked) axes are the
  generalized dofs (multibody_joint.rs:112 ndofs)
- forward kinematics composes `local_frame1 * translation(lin coords) *
  rot(joint_rot) * local_frame2^-1` per link (multibody_joint.rs:117
  body_to_parent, multibody.rs:1249 forward_kinematics)
- body jacobians built by the parent-shift recursion (multibody.rs:616)
- generalized (augmented) mass matrix `sum_l J_l^T M_l J_l` with gyroscopic,
  Coriolis, implicit-damping `dt*d`, armature, and implicit-spring `dt^2*k`
  terms (multibody.rs:667 update_mass_matrix)
- bias accelerations + external forces -> forward dynamics solve
  (multibody.rs:479 update_acceleration)
- joint-space integration with axis-angle / scaled-axis angular updates
  (multibody_joint.rs:134 integrate)

TPU-first layout: every link carries a FIXED 6-dof slot block — generalized
vectors are [M, L*6] with a free-axis mask instead of packed assembly ids.
Locked slots get identity rows in the mass matrix and zero forces, so one
batched Cholesky solves every articulation without ragged indexing.  All
per-articulation math is dense einsums over [M, L, 6, 6L] jacobians: the MXU
eats the J^T M J contraction, and `vmap` over the scene axis batches
thousands of robots.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from rapier_tpu.math import quat
from rapier_tpu.types import BodyType

SPATIAL = 6


@struct.dataclass
class Multibodies:
    """SoA articulation state: M articulations x L link slots (padded).

    Link 0 of each articulation is the root; parents precede children
    (topological order, reference multibody_link.rs:18 parent_internal_id).
    """

    # Topology (static after build).
    link_valid: jax.Array    # [M, L] bool
    link_parent: jax.Array   # [M, L] int32 (root: itself/ignored)
    link_body: jax.Array     # [M, L] int32 -> Bodies index (-1 pad)
    # Joint model per link (joint connects the link to its parent).
    locked_axes: jax.Array   # [M, L] int32 JointAxesMask bits (free = 0 bit)
    kinematic: jax.Array     # [M, L] bool — dofs driven, not simulated
    contacts_enabled: jax.Array  # [M, L] bool — link-vs-parent contacts
    local_pos1: jax.Array    # [M, L, 3] joint frame in parent
    local_rot1: jax.Array    # [M, L, 4]
    local_pos2: jax.Array    # [M, L, 3] joint frame in child
    local_rot2: jax.Array    # [M, L, 4]
    # Generalized state: fixed 6 slots per link (axis-aligned with the mask).
    q: jax.Array             # [M, L, 6] coords per axis slot
    joint_rot: jax.Array     # [M, L, 4] angular part as a quaternion
    qd: jax.Array            # [M, L*6] generalized velocities (slot layout)
    # Per-dof passive elements (reference multibody.rs:380-404, :397 armature).
    armature: jax.Array      # [M, L, 6]
    damping: jax.Array       # [M, L, 6]
    spring_stiffness: jax.Array  # [M, L, 6]
    spring_ref: jax.Array        # [M, L, 6]
    # Joint limits + motors on the generalized dofs.  The reference enforces
    # these as solver constraint rows (unit_multibody_joint.rs:309); here
    # limits are position projections and motors are clamped PD generalized
    # forces (documented divergence — adequate for robotics position/velocity
    # actuators, which is how MJCF actuators map).
    limit_min: jax.Array         # [M, L, 6]
    limit_max: jax.Array         # [M, L, 6]
    motor_target_pos: jax.Array  # [M, L, 6]
    motor_target_vel: jax.Array  # [M, L, 6]
    motor_stiffness: jax.Array   # [M, L, 6]
    motor_damping: jax.Array     # [M, L, 6]
    motor_max_force: jax.Array   # [M, L, 6]
    # Holonomic dof couplings q[a] = ratio * q[b] + offset
    # (reference MultibodyDofCoupling, multibody.rs:72).
    coupling_a: jax.Array    # [M, K] int32 flat dof index (-1 inactive)
    coupling_b: jax.Array    # [M, K] int32
    coupling_ratio: jax.Array   # [M, K]
    coupling_offset: jax.Array  # [M, K]

    @property
    def m(self) -> int:
        return self.link_valid.shape[-2]

    @property
    def l(self) -> int:
        return self.link_valid.shape[-1]

    @property
    def d6(self) -> int:
        return self.l * SPATIAL


def empty_multibodies(m: int, l: int, k_couplings: int = 4) -> Multibodies:
    f = lambda *s: np.zeros(s, np.float32)
    qid = np.zeros((m, l, 4), np.float32)
    qid[..., 3] = 1.0
    return Multibodies(
        link_valid=np.zeros((m, l), bool),
        link_parent=np.zeros((m, l), np.int32),
        link_body=np.full((m, l), -1, np.int32),
        locked_axes=np.full((m, l), 0b111111, np.int32),
        kinematic=np.zeros((m, l), bool),
        contacts_enabled=np.ones((m, l), bool),
        local_pos1=f(m, l, 3), local_rot1=qid.copy(),
        local_pos2=f(m, l, 3), local_rot2=qid.copy(),
        q=f(m, l, 6), joint_rot=qid.copy(), qd=f(m, l * SPATIAL),
        armature=f(m, l, 6), damping=f(m, l, 6),
        spring_stiffness=f(m, l, 6), spring_ref=f(m, l, 6),
        limit_min=np.full((m, l, 6), -np.inf, np.float32),
        limit_max=np.full((m, l, 6), np.inf, np.float32),
        motor_target_pos=f(m, l, 6), motor_target_vel=f(m, l, 6),
        motor_stiffness=f(m, l, 6), motor_damping=f(m, l, 6),
        motor_max_force=np.full((m, l, 6), 3.4e38, np.float32),
        coupling_a=np.full((m, k_couplings), -1, np.int32),
        coupling_b=np.full((m, k_couplings), -1, np.int32),
        coupling_ratio=np.ones((m, k_couplings), np.float32),
        coupling_offset=f(m, k_couplings),
    )


def free_mask(mb: Multibodies) -> jax.Array:
    """[M, L, 6] f32: 1 where the axis slot is a live generalized dof."""
    bits = jnp.arange(6, dtype=jnp.int32)
    free = (mb.locked_axes[..., None] >> bits[None, None, :]) & 1
    return (1 - free).astype(jnp.float32) * mb.link_valid[..., None]


def _cross_mat(v):
    """[..., 3] -> [..., 3, 3] cross-product matrix (v x x = mat @ x)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack([
        jnp.stack([zero, -z, y], -1),
        jnp.stack([z, zero, -x], -1),
        jnp.stack([-y, x, zero], -1),
    ], -2)


def body_to_parent(mb: Multibodies):
    """Per-link child->parent pose (multibody_joint.rs:117).

    transform = local_frame1 * T(free lin coords) * R(joint_rot) *
                local_frame2^-1
    Returns (pos [M, L, 3], rot [M, L, 4]).
    """
    fm = free_mask(mb)
    lin = mb.q[..., :3] * fm[..., :3]                 # locked slots are 0
    inv_rot2 = quat.conj(mb.local_rot2)
    # R(joint_rot) * local_frame2^-1 applied to origin:
    rot_jf2 = quat.mul(mb.joint_rot, inv_rot2)
    t_jf2 = quat.rotate(mb.joint_rot, quat.rotate(inv_rot2, -mb.local_pos2))
    # translation prepends (frame1-local axes):
    t = lin + t_jf2
    pos = mb.local_pos1 + quat.rotate(mb.local_rot1, t)
    rot = quat.mul(mb.local_rot1, rot_jf2)
    return pos, rot


def forward_kinematics(mb: Multibodies, bodies, root_pos, root_rot):
    """Link world poses by walking the tree (multibody.rs:1249).

    Args:
      root_pos/rot: [M, 3]/[M, 4] world pose of each articulation root body
        origin (free roots read it from q; fixed roots keep the body pose).
    Returns (l2w_pos [M, L, 3], l2w_rot [M, L, 4]).
    """
    m, l = mb.m, mb.l
    bp_pos, bp_rot = body_to_parent(mb)

    # Root (link 0): free root's coords hold its world pose; fixed root uses
    # the provided body pose (update_root_type semantics).
    ndofs_root = jnp.sum(free_mask(mb)[:, 0, :], axis=-1)
    use_q_root = ndofs_root > 0
    p0 = jnp.where(use_q_root[:, None], bp_pos[:, 0], root_pos)
    r0 = jnp.where(use_q_root[:, None], bp_rot[:, 0], root_rot)

    pos_list = [p0]
    rot_list = [r0]
    for i in range(1, l):
        # Parent world pose via one-hot over already-computed links (< i).
        par = jnp.clip(mb.link_parent[:, i], 0, i - 1)
        stack_p = jnp.stack(pos_list, axis=1)          # [M, i, 3]
        stack_r = jnp.stack(rot_list, axis=1)
        oh = (jnp.arange(i)[None, :] == par[:, None]).astype(jnp.float32)
        pp = jnp.einsum("mi,mij->mj", oh, stack_p)
        pr = jnp.einsum("mi,mij->mj", oh, stack_r)
        pos_i = pp + quat.rotate(pr, bp_pos[:, i])
        rot_i = quat.mul(pr, bp_rot[:, i])
        pos_list.append(pos_i)
        rot_list.append(rot_i)
    return jnp.stack(pos_list, axis=1), jnp.stack(rot_list, axis=1)


def _link_mass_props(mb: Multibodies, bodies):
    """Gather per-link mass m_l, world inertia I_l [3,3], com, via one-hot
    over the body table (locked/padded links get zeros)."""
    n = bodies.pos.shape[0]
    lb = jnp.clip(mb.link_body, 0, n - 1)
    valid = (mb.link_body >= 0) & mb.link_valid
    oh = (lb[..., None] == jnp.arange(n)[None, None, :]).astype(jnp.float32)
    oh = oh * valid[..., None]

    inv_mass = jnp.einsum("mln,n->ml", oh, bodies.inv_mass)
    mass = jnp.where(inv_mass > 0, 1.0 / jnp.maximum(inv_mass, 1e-30), 0.0)
    local_com = jnp.einsum("mln,nj->mlj", oh, bodies.local_com)
    inv_pi = jnp.einsum("mln,nj->mlj", oh, bodies.inv_principal_inertia)
    pframe = jnp.einsum("mln,nj->mlj", oh, bodies.principal_frame)
    principal = jnp.where(inv_pi > 0, 1.0 / jnp.maximum(inv_pi, 1e-30), 0.0)
    return mass, principal, pframe, local_com, valid


def _world_inertia(rot, pframe, principal):
    """I_world = R diag(I) R^T with R = link_rot * principal_frame."""
    rw = quat.mul(rot, pframe)
    mat = quat.to_matrix(rw)                           # [..., 3, 3]
    return jnp.einsum("...ij,...j,...kj->...ik", mat, principal, mat)


def compute_jacobians(mb: Multibodies, l2w_pos, l2w_rot, bodies):
    """Body jacobians [M, L, 6, D6] + coms + shifts (multibody.rs:616).

    Row layout: 0..3 linear (world, at link COM), 3..6 angular.
    Column k = link_slot k//6, axis k%6.
    """
    m, l = mb.m, mb.l
    d6 = mb.d6
    fm = free_mask(mb)
    mass, principal, pframe, local_com, valid = _link_mass_props(mb, bodies)

    coms = l2w_pos + quat.rotate(l2w_rot, local_com)   # [M, L, 3]

    # Joint anchors: c2 = link_l2w * local_frame2.translation
    # (multibody.rs:1275).
    anchors = l2w_pos + quat.rotate(l2w_rot, mb.local_pos2)
    cross_mat = _cross_mat

    jac_list = []
    for i in range(l):
        if i == 0:
            jac_parent = jnp.zeros((m, SPATIAL, d6))
            par_rot = jnp.broadcast_to(
                jnp.array([0.0, 0.0, 0.0, 1.0]), (m, 4)
            )
            shift02 = jnp.zeros((m, 3))
        else:
            par = jnp.clip(mb.link_parent[:, i], 0, i - 1)
            oh = (jnp.arange(i)[None, :] == par[:, None]).astype(jnp.float32)
            stack_j = jnp.stack(jac_list, axis=1)      # [M, i, 6, D6]
            jac_parent = jnp.einsum("mi,mi...->m...", oh, stack_j)
            par_rot = jnp.einsum("mi,mij->mj", oh, l2w_rot[:, :i])
            par_com = jnp.einsum("mi,mij->mj", oh, coms[:, :i])
            shift02 = anchors[:, i] - par_com

        # v rows += (shift02^x)^T @ w rows  (w x shift).
        s_tr = -cross_mat(shift02)                     # transpose of cross
        jv = jac_parent[:, :3] + jnp.einsum("mab,mbk->mak", s_tr, jac_parent[:, 3:])
        jw = jac_parent[:, 3:]

        # Joint columns in this link's slots, transformed by
        # parent_rot * local_frame1 rotation (multibody_joint.rs:186).
        jrot = quat.mul(par_rot, mb.local_rot1[:, i])
        rotm = quat.to_matrix(jrot)                    # [M, 3, 3]
        cols_lin = rotm * fm[:, i, None, :3]           # [M, 3, 3(axes)]
        cols_ang = rotm * fm[:, i, None, 3:]
        block = jnp.zeros((m, SPATIAL, SPATIAL))
        block = block.at[:, 0:3, 0:3].set(cols_lin)
        block = block.at[:, 3:6, 3:6].set(cols_ang)
        jcols = jnp.zeros((m, SPATIAL, d6))
        jcols = jax.lax.dynamic_update_slice(
            jcols, block, (0, 0, i * SPATIAL)
        )
        jv = jv + jcols[:, :3]
        jw = jw + jcols[:, 3:]

        # Shift velocity rows from joint anchor to link COM (shift23).
        shift23 = coms[:, i] - anchors[:, i]
        s23_tr = -cross_mat(shift23)
        jv = jv + jnp.einsum("mab,mbk->mak", s23_tr, jw)

        jac_i = jnp.concatenate([jv, jw], axis=1)
        jac_i = jac_i * valid[:, i, None, None]
        jac_list.append(jac_i)

    jac = jnp.stack(jac_list, axis=1)                  # [M, L, 6, D6]
    return jac, coms, anchors, mass, principal, pframe, valid


def mass_matrix(mb: Multibodies, jac, l2w_rot, mass, principal, pframe,
                valid, body_angvel, dt):
    """Augmented generalized mass matrix [M, D6, D6] (multibody.rs:667).

    Includes gyroscopic derivative (dt), armature, implicit damping (dt*d)
    and implicit spring (dt^2*k) diagonals.  Coriolis melding is omitted
    (second-order in dt for the small-step solver; documented divergence).
    Locked/padded slots get identity rows so one Cholesky factors everything.
    """
    m, l, d6 = mb.m, mb.l, mb.d6
    iw = _world_inertia(l2w_rot, pframe, principal)    # [M, L, 3, 3]

    # Gyroscopic matrix per link: w^x I - (I w)^x (multibody.rs:723).
    w = body_angvel                                    # [M, L, 3]
    gyro = _cross_mat(w) @ iw - _cross_mat(jnp.einsum("mlab,mlb->mla", iw, w))
    iw_aug = iw + gyro * dt

    jv = jac[:, :, :3]                                 # [M, L, 3, D6]
    jw = jac[:, :, 3:]
    a = (
        jnp.einsum("mlak,ml,mlaj->mkj", jv, mass, jv)
        + jnp.einsum("mlak,mlab,mlbj->mkj", jw, iw_aug, jw)
    )

    live = live_mask(mb)                               # [M, D6]
    # Motor PD gains ride the same implicit diagonals as joint damping /
    # springs (the reference solves motors as constraint rows, i.e. fully
    # implicitly, motor_model SpringBased unit_joint.rs): explicit PD at
    # robotics-grade kp/kv violates the explicit stability bound kv*dt/I < 2
    # and oscillates into the limits.
    diag_extra = (
        mb.armature.reshape(m, d6)
        + (mb.damping.reshape(m, d6) + mb.motor_damping.reshape(m, d6)) * dt
        + (mb.spring_stiffness.reshape(m, d6)
           + mb.motor_stiffness.reshape(m, d6)) * dt * dt
    )
    # Zero dead rows/cols, then put 1 on dead diagonals (invertible) and the
    # damping/armature/spring terms on live diagonals.
    a = a * live[:, :, None] * live[:, None, :]
    diag = diag_extra * live + (1.0 - live)
    a = a + jnp.eye(d6)[None] * diag[:, None, :]
    return a


def live_mask(mb: Multibodies) -> jax.Array:
    """[M, D6] f32: 1 where the flat dof slot is free AND not kinematic."""
    m, d6 = mb.m, mb.d6
    fm = free_mask(mb).reshape(m, d6)
    kin = jnp.repeat(
        mb.kinematic.astype(jnp.float32), SPATIAL, axis=-1
    ).reshape(m, d6)
    return fm * (1.0 - kin)


def velocities_from_qd(mb: Multibodies, jac, qd=None):
    """Per-link world velocities [M, L, 6] = J * qd (definition of J)."""
    qd = mb.qd if qd is None else qd
    return jnp.einsum("mlak,mk->mla", jac, qd)


def generalized_forces(mb: Multibodies, jac, coms, anchors, l2w_rot, mass,
                       principal, pframe, valid, bodies, gravity, dt):
    """RHS of the forward-dynamics solve (multibody.rs:479):
    tau = sum_l J_l^T (f_ext_l - m*acc_l - gyro_l - I*accw_l)
          - damping .* qd - k (q - rest) - k*dt*qd  (implicit spring force)
    where acc_l are the velocity-product accelerations.
    """
    m, l, d6 = mb.m, mb.l, mb.d6

    vel = velocities_from_qd(mb, jac)                  # [M, L, 6]
    v_lin = vel[..., :3]
    v_ang = vel[..., 3:]

    # Velocity-product accelerations, walking the tree (Eqn 42-45).
    # joint_velocity (world) per link: J's own-slot columns * qd.
    qd_slots = mb.qd.reshape(m, l, SPATIAL)
    own_cols = jnp.stack(
        [jac[:, i, :, i * SPATIAL:(i + 1) * SPATIAL] for i in range(l)], axis=1
    )                                                  # [M, L, 6, 6]
    jvel = jnp.einsum("mlas,mls->mla", own_cols, qd_slots)

    acc_list = []
    for i in range(l):
        if i == 0:
            acc = jnp.zeros((m, SPATIAL))
        else:
            par = jnp.clip(mb.link_parent[:, i], 0, i - 1)
            oh = (jnp.arange(i)[None, :] == par[:, None]).astype(jnp.float32)
            acc_p = jnp.einsum("mi,mij->mj", oh, jnp.stack(acc_list, 1))
            w_p = jnp.einsum("mi,mij->mj", oh, v_ang[:, :i])
            com_p = jnp.einsum("mi,mij->mj", oh, coms[:, :i])
            acc = acc_p
            shift02 = anchors[:, i] - com_p
            acc_lin = (
                acc[:, :3]
                + 2.0 * jnp.cross(w_p, jvel[:, i, :3])
                + jnp.cross(w_p, jnp.cross(w_p, shift02))
                + jnp.cross(acc_p[:, 3:], shift02)
            )
            acc_ang = acc[:, 3:] + jnp.cross(w_p, jvel[:, i, 3:])
            acc = jnp.concatenate([acc_lin, acc_ang], axis=-1)
        shift23 = coms[:, i] - anchors[:, i]
        acc_lin2 = (
            acc[:, :3]
            + jnp.cross(v_ang[:, i], jnp.cross(v_ang[:, i], shift23))
            + jnp.cross(acc[:, 3:], shift23)
        )
        acc = jnp.concatenate([acc_lin2, acc[:, 3:]], axis=-1)
        acc_list.append(acc)
    accs = jnp.stack(acc_list, axis=1)                 # [M, L, 6]

    iw = _world_inertia(l2w_rot, pframe, principal)
    gyro = jnp.cross(v_ang, jnp.einsum("mlab,mlb->mla", iw, v_ang))

    # External force: gravity + user forces on the link bodies.
    n = bodies.pos.shape[0]
    lb = jnp.clip(mb.link_body, 0, n - 1)
    oh = (lb[..., None] == jnp.arange(n)[None, None, :]).astype(jnp.float32)
    oh = oh * valid[..., None]
    f_user = jnp.einsum("mln,nj->mlj", oh, bodies.force)
    t_user = jnp.einsum("mln,nj->mlj", oh, bodies.torque)
    gscale = jnp.einsum("mln,n->ml", oh, bodies.gravity_scale)

    f_ext_lin = (
        f_user + mass[..., None] * gravity[None, None, :] * gscale[..., None]
        - mass[..., None] * accs[..., :3]
    )
    f_ext_ang = (
        t_user - gyro - jnp.einsum("mlab,mlb->mla", iw, accs[..., 3:])
    )
    f_spatial = jnp.concatenate([f_ext_lin, f_ext_ang], axis=-1)

    tau = jnp.einsum("mlak,mla->mk", jac, f_spatial)

    damping = mb.damping.reshape(m, d6)
    k = mb.spring_stiffness.reshape(m, d6)
    q_flat = mb.q.reshape(m, d6)
    rest = mb.spring_ref.reshape(m, d6)
    tau = tau - damping * mb.qd - k * (q_flat - rest) - k * dt * mb.qd

    # Clamped PD motors (MJCF position/velocity actuator semantics).
    ms = mb.motor_stiffness.reshape(m, d6)
    md = mb.motor_damping.reshape(m, d6)
    tmax = jnp.minimum(mb.motor_max_force.reshape(m, d6), 3.4e38)
    # Position error at the PREDICTED coordinate (q + dt*qd), matching the
    # implicit spring above; the dt*md / dt^2*ms mass-matrix diagonals
    # (mass_matrix) complete the semi-implicit treatment.
    tau_motor = (
        ms * (mb.motor_target_pos.reshape(m, d6) - q_flat - dt * mb.qd)
        + md * (mb.motor_target_vel.reshape(m, d6) - mb.qd)
    )
    tau = tau + jnp.clip(tau_motor, -tmax, tmax)
    return tau * live_mask(mb)


def forward_dynamics(mb: Multibodies, bodies, gravity, dt,
                     root_pos, root_rot):
    """One generalized-coordinate dynamics update: returns (qdd [M, D6],
    aux dict with jacobians/poses for reuse)."""
    l2w_pos, l2w_rot = forward_kinematics(mb, bodies, root_pos, root_rot)
    jac, coms, anchors, mass, principal, pframe, valid = compute_jacobians(
        mb, l2w_pos, l2w_rot, bodies
    )

    vel = velocities_from_qd(mb, jac)
    a = mass_matrix(mb, jac, l2w_rot, mass, principal, pframe, valid,
                    vel[..., 3:], dt)
    tau = generalized_forces(mb, jac, coms, anchors, l2w_rot, mass, principal,
                             pframe, valid, bodies, gravity, dt)

    chol, low = jax.scipy.linalg.cho_factor(
        a + jnp.eye(mb.d6)[None] * 1e-9, lower=True
    )
    qdd = jax.scipy.linalg.cho_solve((chol, low), tau[..., None])[..., 0]

    aux = dict(
        l2w_pos=l2w_pos, l2w_rot=l2w_rot, jac=jac, coms=coms,
        mass_mat=a, chol=chol, valid=valid,
    )
    return qdd, aux


def apply_couplings(mb: Multibodies, qd, chol):
    """Project qd onto the coupling manifold qd[a] = ratio * qd[b]
    (velocity-level holonomic couplings, multibody.rs:1007) using the
    mass-matrix metric: qd += A^-1 C^T lambda with C qd + b = 0."""
    m, d6 = mb.m, mb.d6
    kc = mb.coupling_a.shape[1]
    if kc == 0:
        return qd
    act = (mb.coupling_a >= 0) & (mb.coupling_b >= 0)
    ia = jnp.clip(mb.coupling_a, 0, d6 - 1)
    ib = jnp.clip(mb.coupling_b, 0, d6 - 1)
    eye = jnp.arange(d6)
    rows = (
        (ia[..., None] == eye[None, None, :]).astype(jnp.float32)
        - mb.coupling_ratio[..., None]
        * (ib[..., None] == eye[None, None, :]).astype(jnp.float32)
    ) * act[..., None]                                  # [M, K, D6]
    viol = jnp.einsum("mkd,md->mk", rows, qd)
    aic = jax.scipy.linalg.cho_solve((chol, True), jnp.swapaxes(rows, 1, 2))
    s = jnp.einsum("mkd,mdj->mkj", rows, aic)           # [M, K, K]
    # Inactive couplings get unit diagonals so the tiny solve stays regular.
    inact = 1.0 - act.astype(jnp.float32)
    s = s + jnp.eye(kc)[None] * (1e-9 + inact)[:, None, :]
    lam = jnp.linalg.solve(s, -viol[..., None])[..., 0] * act
    return qd + jnp.einsum("mdj,mj->md", aic, lam)


def integrate(mb: Multibodies, dt) -> Multibodies:
    """Joint-space integration (multibody_joint.rs:134): linear slots
    accumulate; single free angular axis accumulates an angle and rebuilds an
    axis-angle rotation; 3 free angular axes compose a scaled-axis update on
    the quaternion."""
    m, l = mb.m, mb.l
    fm = free_mask(mb)
    qd_slots = mb.qd.reshape(m, l, SPATIAL) * fm
    q_new = mb.q + qd_slots * dt

    ang_free = fm[..., 3:]                              # [M, L, 3]
    n_ang = jnp.sum(ang_free, axis=-1)

    # 1 free angular dof: rotation = axis_angle(axis, coord).
    axis = ang_free / jnp.maximum(
        jnp.linalg.norm(ang_free, axis=-1, keepdims=True), 1e-9
    )
    angle1 = jnp.sum(q_new[..., 3:] * ang_free, axis=-1)
    rot1 = quat.from_axis_angle(axis, angle1)

    # 3 free angular dofs: joint_rot = exp(w dt) * joint_rot.
    w = qd_slots[..., 3:]
    disp = quat.from_scaled_axis(w * dt)
    rot3 = quat.mul(disp, mb.joint_rot)

    joint_rot = jnp.where(
        (n_ang[..., None] > 2.5), rot3,
        jnp.where(n_ang[..., None] > 0.5, rot1, mb.joint_rot),
    )

    # Joint limits: project coords into [min, max] and kill the velocity of
    # clipped dofs (divergence note in the class docstring).  Free 3-dof
    # angular blocks (spherical/free) are not limit-projected.
    q_lim = jnp.clip(q_new, mb.limit_min, mb.limit_max)
    clipped = (q_lim != q_new) & (fm > 0) & (n_ang[..., None] < 2.5)
    q_new = jnp.where(clipped, q_lim, q_new)
    # Rebuild the 1-dof angular rotation from the clipped angle.
    angle1c = jnp.sum(q_new[..., 3:] * ang_free, axis=-1)
    rot1c = quat.from_axis_angle(axis, angle1c)
    joint_rot = jnp.where(
        (n_ang[..., None] > 0.5) & (n_ang[..., None] < 2.5), rot1c, joint_rot
    )
    qd_new = jnp.where(
        clipped, 0.0, qd_slots
    ).reshape(mb.m, mb.d6)
    return mb.replace(
        q=q_new, joint_rot=quat.normalize(joint_rot), qd=qd_new
    )


def write_back_bodies(mb: Multibodies, bodies, l2w_pos, l2w_rot, jac, valid,
                      next_only: bool = False):
    """Write link poses + velocities into the rigid-body set
    (multibody.rs:1195 update_rigid_bodies): body origin pose = link l2w;
    linvel = COM velocity.  `next_only` mirrors the reference's
    update_next_positions_only: the pipeline's kinematic machinery then
    derives contact velocities and advances poses."""
    n = bodies.pos.shape[0]
    lb = jnp.clip(mb.link_body, 0, n - 1)
    oh = (lb[..., None] == jnp.arange(n)[None, None, :]).astype(jnp.float32)
    oh = oh * valid[..., None]                          # [M, L, N]

    vel = velocities_from_qd(mb, jac)
    is_link = jnp.einsum("mln->n", oh) > 0

    def scatter(x):                                     # [M, L, k] -> [N, k]
        return jnp.einsum("mln,mlk->nk", oh, x)

    pos = jnp.where(is_link[:, None], scatter(l2w_pos), bodies.pos)
    rotq = scatter(l2w_rot)
    rotq = rotq / jnp.maximum(
        jnp.linalg.norm(rotq, axis=-1, keepdims=True), 1e-9
    )
    rot = jnp.where(is_link[:, None], rotq, bodies.rot)
    # Non-link bodies keep their EXISTING next pose (the solver's integrated
    # pose when called post-writeback in phase C; equal to the current pose at
    # step start) — clobbering it with `pos` would undo their integration.
    out = bodies.replace(
        next_pos=jnp.where(is_link[:, None], pos, bodies.next_pos),
        next_rot=jnp.where(is_link[:, None], rot, bodies.next_rot),
    )
    if next_only:
        return out
    linvel = jnp.where(is_link[:, None], scatter(vel[..., :3]), bodies.linvel)
    angvel = jnp.where(is_link[:, None], scatter(vel[..., 3:]), bodies.angvel)
    return out.replace(pos=pos, rot=rot, linvel=linvel, angvel=angvel)


def step_multibodies(mb: Multibodies, bodies, gravity, dt,
                     next_only: bool = False):
    """Full multibody sub-step: forward dynamics -> qd update -> couplings ->
    joint integration -> FK -> body writeback.  Returns (mb, bodies, aux)."""
    n = bodies.pos.shape[0]
    lb0 = jnp.clip(mb.link_body[:, 0], 0, n - 1)
    root_pos = bodies.pos[lb0]
    root_rot = bodies.rot[lb0]

    qdd, aux = forward_dynamics(mb, bodies, gravity, dt, root_pos, root_rot)
    qd = mb.qd + qdd * dt
    qd = apply_couplings(mb, qd, aux["chol"])
    mb = mb.replace(qd=qd)
    mb = integrate(mb, dt)

    l2w_pos, l2w_rot = forward_kinematics(mb, bodies, root_pos, root_rot)
    jac, coms, anchors, mass, principal, pframe, valid = compute_jacobians(
        mb, l2w_pos, l2w_rot, bodies
    )
    bodies = write_back_bodies(
        mb, bodies, l2w_pos, l2w_rot, jac, valid, next_only=next_only
    )
    return mb, bodies, aux


# ---------------------------------------------------------------------------
# Two-way contact coupling (reference: generic constraint rows whose contact
# jacobians span the generalized dofs, generic_contact_constraint.rs:392 +
# multibody.rs:616-667 jacobian plumbing).  TPU recast as three phases around
# the batched contact solve:
#   A. predict_velocities: forward dynamics at the CURRENT pose ->
#      tentative qd; tentative link velocities J*qd written to the bodies.
#   B. install_link_mobility: links enter the contact solve with their
#      ARTICULATED mobility (the 6x6 diagonal blocks of J A^-1 J^T) as
#      solver im/ii, so contact denominators feel the articulation
#      compliance.  Divergence: the lin-ang cross block and the link-to-link
#      off-diagonal mobility are dropped inside the Gauss-Seidel sweep (the
#      reference's generic rows carry them exactly); phase C restores
#      momentum consistency after the sweep.
#   C. absorb_contact_impulses: the solver's link velocity deltas are
#      projected into generalized coordinates by mass-weighted least squares
#      (Gauss principle): dqd = A^-1 J^T M dv; then joint integration + FK
#      write the links' next poses.
# ---------------------------------------------------------------------------


def predict_velocities(mb: Multibodies, bodies, gravity, dt):
    """Phase A: generalized forward dynamics -> tentative qd; write tentative
    link velocities (J qd) into the body set.  Positions are NOT advanced —
    integration happens after the contact solve (absorb_contact_impulses).
    Returns (mb, bodies, aux)."""
    n = bodies.pos.shape[0]
    lb0 = jnp.clip(mb.link_body[:, 0], 0, n - 1)
    root_pos = bodies.pos[lb0]
    root_rot = bodies.rot[lb0]

    qdd, aux = forward_dynamics(mb, bodies, gravity, dt, root_pos, root_rot)
    qd = mb.qd + qdd * dt
    qd = apply_couplings(mb, qd, aux["chol"])
    mb = mb.replace(qd=qd)

    vel = velocities_from_qd(mb, aux["jac"])            # [M, L, 6]
    oh, is_link = _link_onehot(mb, aux["valid"], n)
    linvel = jnp.where(is_link[:, None],
                       jnp.einsum("mln,mlk->nk", oh, vel[..., :3]),
                       bodies.linvel)
    angvel = jnp.where(is_link[:, None],
                       jnp.einsum("mln,mlk->nk", oh, vel[..., 3:]),
                       bodies.angvel)
    bodies = bodies.replace(linvel=linvel, angvel=angvel)
    aux["root_pos"] = root_pos
    aux["root_rot"] = root_rot
    return mb, bodies, aux


def _link_onehot(mb: Multibodies, valid, n):
    """[M, L, N] f32 link->body routing matrix + [N] is-link mask."""
    lb = jnp.clip(mb.link_body, 0, n - 1)
    oh = (lb[..., None] == jnp.arange(n)[None, None, :]).astype(jnp.float32)
    oh = oh * valid[..., None]
    return oh, jnp.einsum("mln->n", oh) > 0


def link_mobility(mb: Multibodies, aux):
    """Articulated per-link mobility diagonal blocks Phi_ll = J_l A^-1 J_l^T.

    Returns (im_links [M, L, 3] — linear diag, ii_links [M, L, 3, 3] —
    angular block).  Symmetric PSD by construction."""
    jac = aux["jac"]                                    # [M, L, 6, D6]
    chol = aux["chol"]
    m, l, _, d6 = jac.shape
    jt = jac.reshape(m, l * SPATIAL, d6)
    x = jax.scipy.linalg.cho_solve(
        (chol, True), jnp.swapaxes(jt, 1, 2)
    ).reshape(m, d6, l, SPATIAL)                        # A^-1 J^T per link
    phi = jnp.einsum("mlad,mdlb->mlab", jac, x)         # [M, L, 6, 6]
    phi = phi * aux["valid"][..., None, None]
    im_links = jnp.maximum(
        jnp.stack([phi[..., 0, 0], phi[..., 1, 1], phi[..., 2, 2]], axis=-1),
        0.0,
    )
    ii_links = phi[..., 3:, 3:]
    return im_links, ii_links


def install_link_mobility(sb, mb: Multibodies, aux, bodies):
    """Phase B: scatter articulated mobility into the SolverBodies columns of
    the link bodies (component-leading [3, N+1] / [3, 3, N+1] tables)."""
    n = bodies.pos.shape[0]
    im_l, ii_l = link_mobility(mb, aux)
    oh, is_link = _link_onehot(mb, aux["valid"], n)

    im_n = jnp.einsum("mln,mlk->kn", oh, im_l)          # [3, N]
    ii_n = jnp.einsum("mln,mlab->abn", oh, ii_l)        # [3, 3, N]
    ext = jnp.concatenate([is_link, jnp.zeros((1,), bool)])
    im = jnp.where(ext[None, :],
                   jnp.concatenate([im_n, jnp.zeros((3, 1))], axis=1), sb.im)
    ii = jnp.where(ext[None, None, :],
                   jnp.concatenate([ii_n, jnp.zeros((3, 3, 1))], axis=2),
                   sb.ii)
    return sb._replace(im=im, ii=ii)


def absorb_contact_impulses(mb: Multibodies, bodies, sb, aux, dt):
    """Phase C: project link velocity deltas into generalized space, then
    integrate joints + FK and write the links' next poses and velocities.

    dqd = A^-1 J^T M (v_post - J qd)  (mass-weighted least squares in the
    augmented-mass metric — momentum-consistent; see module comment).
    """
    n = bodies.pos.shape[0]
    jac, chol, valid = aux["jac"], aux["chol"], aux["valid"]

    vel_t = velocities_from_qd(mb, jac)                 # [M, L, 6]
    oh, is_link = _link_onehot(mb, valid, n)
    v_post_lin = jnp.einsum("mln,kn->mlk", oh, sb.v_lin[:, :n])
    v_post_ang = jnp.einsum("mln,kn->mlk", oh, sb.v_ang[:, :n])
    dv_lin = v_post_lin - vel_t[..., :3]
    dv_ang = v_post_ang - vel_t[..., 3:]

    mass, principal, pframe, _lc, _valid2 = _link_mass_props(mb, bodies)
    iw = _world_inertia(aux["l2w_rot"], pframe, principal)
    p_lin = mass[..., None] * dv_lin
    p_ang = jnp.einsum("mlab,mlb->mla", iw, dv_ang)
    p = jnp.concatenate([p_lin, p_ang], axis=-1)        # [M, L, 6]

    tau = jnp.einsum("mlak,mla->mk", jac, p)
    dqd = jax.scipy.linalg.cho_solve(
        (chol, True), tau[..., None]
    )[..., 0] * live_mask(mb)
    qd = apply_couplings(mb, mb.qd + dqd, chol)
    mb = mb.replace(qd=qd)
    mb = integrate(mb, dt)

    l2w_pos, l2w_rot = forward_kinematics(
        mb, bodies, aux["root_pos"], aux["root_rot"]
    )
    jac2, _coms, _anch, _m, _pr, _pf, valid2 = compute_jacobians(
        mb, l2w_pos, l2w_rot, bodies
    )
    bodies = write_back_bodies(
        mb, bodies, l2w_pos, l2w_rot, jac2, valid2, next_only=True
    )
    vel_f = velocities_from_qd(mb, jac2)
    linvel = jnp.where(is_link[:, None],
                       jnp.einsum("mln,mlk->nk", oh, vel_f[..., :3]),
                       bodies.linvel)
    angvel = jnp.where(is_link[:, None],
                       jnp.einsum("mln,mlk->nk", oh, vel_f[..., 3:]),
                       bodies.angvel)
    return mb, bodies.replace(linvel=linvel, angvel=angvel)


# ---------------------------------------------------------------------------
# Inverse kinematics (reference multibody_ik.rs:47-181): damped-least-squares
# jacobian IK, batched over all M articulations and run as a fixed-iteration
# jit-friendly loop (converged articulations are masked out, not exited).
# ---------------------------------------------------------------------------


def inverse_kinematics(mb: Multibodies, bodies, target_link, target_pos,
                       target_rot, *, damping: float = 1.0,
                       max_iters: int = 10, constrained_axes: int = 0b111111,
                       eps_linear: float = 1.0e-3, eps_angular: float = 1.0e-3,
                       joint_can_move=None) -> Multibodies:
    """Move each articulation's `target_link` toward a target pose by
    iterating dq = J^T (J J^T + damping^2 I)^-1 delta
    (multibody_ik.rs:68-80 inverse_kinematics_delta_with_jacobian, :93-181
    iteration loop).

    Args:
      target_link: [M] int32 link index per articulation (-1 = leave as is).
      target_pos:  [M, 3] world-space target for the link body origin.
      target_rot:  [M, 4] world-space target orientation quaternion.
      constrained_axes: JointAxesMask bits of the pose axes to solve for
        (bit 0..2 = LIN_XYZ, 3..5 = ANG_XYZ).
      joint_can_move: optional [M, L] bool; False freezes that link's dofs.

    Returns the Multibodies with updated q / joint_rot (qd untouched).
    Follow with forward_kinematics + write_back_bodies (or a pipeline step)
    to realize the new link poses on the rigid bodies.
    """
    m, l = mb.m, mb.l
    n = bodies.pos.shape[0]
    target_link = jnp.asarray(target_link, jnp.int32)
    target_pos = jnp.asarray(target_pos, jnp.float32)
    target_rot = jnp.asarray(target_rot, jnp.float32)
    act = target_link >= 0                              # [M]
    link_oh = (
        jnp.clip(target_link, 0, l - 1)[:, None] == jnp.arange(l)[None, :]
    ).astype(jnp.float32) * act[:, None]                # [M, L]

    axes = jnp.asarray(
        [(constrained_axes >> k) & 1 for k in range(SPATIAL)], jnp.float32
    )
    if joint_can_move is None:
        col_mask = jnp.ones((m, mb.d6), jnp.float32)
    else:
        col_mask = jnp.repeat(
            jnp.asarray(joint_can_move, jnp.float32), SPATIAL, axis=1
        )

    lb0 = jnp.clip(mb.link_body[:, 0], 0, n - 1)
    root_pos = bodies.pos[lb0]
    root_rot = bodies.rot[lb0]
    saved_qd = mb.qd

    def body(_, mb):
        l2w_pos, l2w_rot = forward_kinematics(mb, bodies, root_pos, root_rot)
        jac, coms, _anch, _mass, _pr, _pf, _valid = compute_jacobians(
            mb, l2w_pos, l2w_rot, bodies
        )
        # Target link's jacobian, with linear rows shifted COM -> body origin
        # (v_o = v_com + w x (o - com)).
        jt = jnp.einsum("ml,mlak->mak", link_oh, jac)   # [M, 6, D6]
        r = jnp.einsum("ml,mlk->mk", link_oh, l2w_pos - coms)
        jt = jt.at[:, :3].add(
            jnp.einsum("mab,mbk->mak", -_cross_mat(r), jt[:, 3:])
        )
        jt = jt * col_mask[:, None, :]

        pose_p = jnp.einsum("ml,mlk->mk", link_oh, l2w_pos)
        pose_r = quat.normalize(jnp.einsum("ml,mlk->mk", link_oh, l2w_rot))
        delta = jnp.concatenate([
            target_pos - pose_p,
            quat.to_scaled_axis(quat.mul(target_rot, quat.conj(pose_r))),
        ], axis=-1) * axes[None, :]                     # [M, 6]

        lin_err = jnp.linalg.norm(delta[:, :3], axis=-1)
        ang_err = jnp.linalg.norm(delta[:, 3:], axis=-1)
        live = act & ((lin_err > eps_linear) | (ang_err > eps_angular))

        jj = jnp.einsum("mak,mbk->mab", jt, jt) + (
            damping * damping
        ) * jnp.eye(SPATIAL)[None]
        y = jnp.linalg.solve(jj, delta[..., None])[..., 0]
        dq = jnp.einsum("mak,ma->mk", jt, y)            # [M, D6]
        dq = dq * live[:, None].astype(jnp.float32)
        # Realize the displacement through the joint-space integrator
        # (keeps joint_rot/q consistent and respects limits).
        stepped = integrate(mb.replace(qd=dq), 1.0)
        return stepped.replace(qd=mb.qd)

    mb = jax.lax.fori_loop(0, max_iters, body, mb)
    return mb.replace(qd=saved_qd)
