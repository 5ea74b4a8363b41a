"""Impulse-joint constraint rows: axis-based lock/limit/motor model.

Behavioral port of the reference's unified joint constraint builder
(src/dynamics/solver/joint_constraint/joint_constraint_builder.rs:235-814 and
joint_velocity_constraint.rs:99-310): rows are fully rebuilt from the current
solver poses every substep (the reference does the same — "the update is
basically reconstructing all the constraints", joint_constraint_builder.rs:72),
orthogonalized with masked modified Gram-Schmidt, and solved sequentially
within a lane / colored across lanes.

Fixed row-slot layout per joint lane (masked when unused):

| slots | row                                  |
|-------|--------------------------------------|
| 0-2   | angular motor (axes 3..6)            |
| 3-5   | linear motor (axes 0..3)             |
| 6     | coupled linear motor                 |
| 7-9   | angular lock                         |
| 10-12 | linear lock                          |
| 13-15 | angular limit                        |
| 16-18 | linear limit                         |
| 19    | coupled linear limit                 |
| 20    | coupled angular limit (spherical swing limits) |

Group A (0-6) and group B (7-20, incl. slot 20) are orthogonalized independently, matching
the reference's two finalize_constraints calls.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rapier_tpu.math import quat
from rapier_tpu.types import (
    JOINT_ANG_AXES,
    JOINT_LIN_AXES,
    MAX_JOINT_ROWS,
    MotorModel,
    spring_erp_inv_dt,
)

R = MAX_JOINT_ROWS
_BIG = 3.0e38


class JointRows(NamedTuple):
    b1: jax.Array          # [J]
    b2: jax.Array          # [J]
    valid: jax.Array       # [J] bool
    color: jax.Array       # [J]
    im1: jax.Array         # [J, 3]
    im2: jax.Array         # [J, 3]
    lin_jac: jax.Array     # [J, R, 3]
    ang_jac1: jax.Array    # [J, R, 3]
    ang_jac2: jax.Array    # [J, R, 3]
    ii_ang_jac1: jax.Array # [J, R, 3]
    ii_ang_jac2: jax.Array # [J, R, 3]
    rhs: jax.Array         # [J, R]
    rhs_wo_bias: jax.Array # [J, R]
    cfm_gain: jax.Array    # [J, R]
    inv_lhs: jax.Array     # [J, R]
    lo: jax.Array          # [J, R]
    hi: jax.Array          # [J, R]
    impulse: jax.Array     # [J, R]
    active: jax.Array      # [J, R] bool


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _cross_matrix(v):
    """[v]x with (v × x) = [v]x @ x; batched over leading axes."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([
        zero, -z, y,
        z, zero, -x,
        -y, x, zero,
    ], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))


def motor_coefficients(model, stiffness, damping, dt):
    """MotorModel::combine_coefficients (motor_model.rs:37-56).
    Returns (erp_inv_dt, cfm_coeff, cfm_gain)."""
    inv = lambda x: jnp.where(x == 0.0, 0.0, 1.0 / jnp.where(x == 0.0, 1.0, x))
    erp_inv_dt = stiffness * inv(dt * stiffness + damping)
    base = inv(dt * dt * stiffness + dt * damping)
    accel = model == MotorModel.ACCELERATION_BASED
    cfm_coeff = jnp.where(accel, base, 0.0)
    cfm_gain = jnp.where(accel, 0.0, base)
    return erp_inv_dt, cfm_coeff, cfm_gain


def spring_cfm_coeff(natural_frequency, damping_ratio, dt):
    """SpringCoefficients::cfm_coeff (integration_parameters.rs:96-111)."""
    erp = dt * spring_erp_inv_dt(natural_frequency, damping_ratio, dt)
    safe = jnp.where(erp == 0.0, 1.0, erp)
    inv_erp_m1 = 1.0 / safe - 1.0
    coeff = inv_erp_m1 * inv_erp_m1 / (
        (1.0 + inv_erp_m1) * 4.0 * damping_ratio * damping_ratio
    )
    return jnp.where(erp == 0.0, 0.0, coeff)


def build_rows(joints, sb, color, params_dt, inv_dt, n_bodies: int) -> JointRows:
    """Construct all row slots from current solver poses (one substep)."""
    j = joints.n
    sent = n_bodies
    b1 = jnp.where(joints.body1 >= 0, joints.body1, sent)
    b2 = jnp.where(joints.body2 >= 0, joints.body2, sent)
    valid = joints.enabled & (joints.body1 >= 0) & (joints.body2 >= 0)

    # SolverBodies are component-leading ([3, N+1]); joints keep row-major
    # [J, ...] internally (J is small), so transpose at the boundary.
    com1, rot1 = sb.com[:, b1].T, sb.rot[:, b1].T
    com2, rot2 = sb.com[:, b2].T, sb.rot[:, b2].T
    im1, im2 = sb.im[:, b1].T, sb.im[:, b2].T
    ii1 = sb.ii[:, :, b1].transpose(2, 0, 1)
    ii2 = sb.ii[:, :, b2].transpose(2, 0, 1)

    # Joint frames in world space.  Local frames are stored w.r.t. the body
    # origin; solver poses are at the COM, and the caller pre-shifted the
    # local anchors into COM space (world.py does `local_pos - local_com`,
    # mirroring transform_to_solver_body_space).
    f1_pos = com1 + quat.rotate(rot1, joints.local_pos1)
    f1_rot = quat.mul(rot1, joints.local_rot1)
    f2_pos = com2 + quat.rotate(rot2, joints.local_pos2)
    f2_rot = quat.mul(rot2, joints.local_rot2)

    basis = quat.to_matrix(f1_rot)                 # [J,3,3] columns = axes
    lin_err = f2_pos - f1_pos

    # Snap frame1 center to frame2 on free linear axes (builder.rs:247-260).
    locked = joints.locked_axes
    new_c1 = f2_pos
    for i in range(3):
        axis = basis[:, :, i]
        is_locked = ((locked >> i) & 1).astype(jnp.float32)[:, None]
        new_c1 = new_c1 - axis * _dot(axis, lin_err)[:, None] * is_locked
    r1 = new_c1 - com1
    r2 = f2_pos - com2
    cmat1_basis = _cross_matrix(r1) @ basis        # [J,3,3]
    cmat2_basis = _cross_matrix(r2) @ basis

    # Angular error q_err = q1^-1 q2, shortest-path sign corrected.
    q_err = quat.mul(quat.conj(f1_rot), f2_rot)
    sgn = jnp.where(jnp.sum(f1_rot * f2_rot, axis=-1, keepdims=True) >= 0, 1.0, -1.0)
    q_err = q_err * sgn
    v_err = q_err[:, :3]
    w_err = q_err[:, 3]

    # ang_basis column i = R1 @ (0.5 (w e_i - e_i x v)): the exact jacobian of
    # imag(q_err) w.r.t. (w2 - w1) (reference diff_conj1_2_tr construction).
    eye = jnp.eye(3)
    cols = 0.5 * (w_err[:, None, None] * eye[None] - jnp.cross(
        jnp.broadcast_to(eye[None], (j, 3, 3)), v_err[:, None, :]
    ))  # [J, i, 3] rows are the local jacobians
    ang_basis = jnp.einsum("jab,jib->jai", basis, cols)  # columns = world jac

    dt = params_dt
    erp_inv_dt_j = spring_erp_inv_dt(
        joints.softness_frequency, joints.softness_damping, dt
    )
    cfm_coeff_j = spring_cfm_coeff(
        joints.softness_frequency, joints.softness_damping, dt
    )

    # Output row buffers.
    z_j_r = jnp.zeros((j, R))
    lin_jac = jnp.zeros((j, R, 3))
    ang_jac1 = jnp.zeros((j, R, 3))
    ang_jac2 = jnp.zeros((j, R, 3))
    rhs_wo_bias = z_j_r
    rhs_bias = z_j_r
    cfm_coeff_rows = z_j_r
    cfm_gain_rows = z_j_r
    lo = jnp.full((j, R), -_BIG)
    hi = jnp.full((j, R), _BIG)
    active = jnp.zeros((j, R), bool)

    locked_b = joints.locked_axes
    motor_b = joints.motor_axes & ~locked_b
    limit_b = joints.limit_axes & ~locked_b
    coupled_b = joints.coupled_axes

    # ±inf default limits poison sin()/arithmetic in rows that are computed
    # but masked off — clamp to finite sentinels.
    joints = joints.replace(
        limit_min=jnp.clip(joints.limit_min, -1e9, 1e9),
        limit_max=jnp.clip(joints.limit_max, -1e9, 1e9),
        motor_max_force=jnp.clip(joints.motor_max_force, 0.0, 3.0e38),
    )

    def bit(mask, i):
        return ((mask >> i) & 1) == 1

    def set_row(slot, lj, aj1, aj2, rwb, rb, cc, cg, lo_v, hi_v, act):
        nonlocal lin_jac, ang_jac1, ang_jac2, rhs_wo_bias, rhs_bias
        nonlocal cfm_coeff_rows, cfm_gain_rows, lo, hi, active
        # Zero inactive rows' payloads: their values may contain NaN/inf from
        # unused limit/motor parameters and the Gram-Schmidt pass adds
        # `x + NaN*0 = NaN` through active rows otherwise.
        a = (act & valid)
        af = a.astype(jnp.float32)[:, None]
        clean = lambda x: jnp.where(jnp.isfinite(x), x, 0.0)
        lin_jac = lin_jac.at[:, slot].set(clean(lj) * af)
        ang_jac1 = ang_jac1.at[:, slot].set(clean(aj1) * af)
        ang_jac2 = ang_jac2.at[:, slot].set(clean(aj2) * af)
        rhs_wo_bias = rhs_wo_bias.at[:, slot].set(clean(rwb) * af[:, 0])
        rhs_bias = rhs_bias.at[:, slot].set(clean(rb) * af[:, 0])
        cfm_coeff_rows = cfm_coeff_rows.at[:, slot].set(clean(cc) * af[:, 0])
        cfm_gain_rows = cfm_gain_rows.at[:, slot].set(clean(cg) * af[:, 0])
        lo = lo.at[:, slot].set(jnp.where(a, jnp.maximum(lo_v, -_BIG), 0.0))
        hi = hi.at[:, slot].set(jnp.where(a, jnp.minimum(hi_v, _BIG), 0.0))
        active = active.at[:, slot].set(a)

    zero = jnp.zeros((j,))

    # --- slots 0-2: angular motors (builder.motor_angular) ---
    for a in range(3):
        ax = 3 + a
        m_erp, m_cfm_coeff, m_cfm_gain = motor_coefficients(
            joints.motor_model[:, ax], joints.motor_stiffness[:, ax],
            joints.motor_damping[:, ax], dt,
        )
        aj = basis[:, :, a]
        ang_dist = jnp.arcsin(jnp.clip(v_err[:, a], -1.0, 1.0)) * 2.0
        # smallest_abs_diff_between_angles (utils/mod.rs:135-142).
        s_err = ang_dist - joints.motor_target_pos[:, ax]
        s_comp = s_err - jnp.sign(s_err) * (2.0 * jnp.pi)
        s_err = jnp.where(jnp.abs(s_err) < jnp.abs(s_comp), s_err, s_comp)
        rwb = jnp.where(m_erp != 0.0, s_err * m_erp, 0.0)
        rwb = rwb - joints.motor_target_vel[:, ax]
        max_imp = joints.motor_max_force[:, ax] * dt
        set_row(a, aj * 0.0 + 0.0, aj, aj, rwb, zero, m_cfm_coeff, m_cfm_gain,
                -max_imp, max_imp, bit(motor_b & ~coupled_b, ax))

    # --- slots 3-5: linear motors (builder.motor_linear) ---
    for a in range(3):
        m_erp, m_cfm_coeff, m_cfm_gain = motor_coefficients(
            joints.motor_model[:, a], joints.motor_stiffness[:, a],
            joints.motor_damping[:, a], dt,
        )
        lj = basis[:, :, a]
        aj1 = cmat1_basis[:, :, a]
        aj2 = cmat2_basis[:, :, a]
        dist = _dot(lin_err, lj)
        rwb = jnp.where(m_erp != 0.0, (dist - joints.motor_target_pos[:, a]) * m_erp, 0.0)
        tv = joints.motor_target_vel[:, a]
        has_lim = bit(limit_b, a)
        tv_cl = jnp.clip(tv, (joints.limit_min[:, a] - dist) * inv_dt,
                         (joints.limit_max[:, a] - dist) * inv_dt)
        tv = jnp.where(has_lim, tv_cl, tv)
        rwb = rwb - tv
        max_imp = joints.motor_max_force[:, a] * dt
        set_row(3 + a, lj, aj1, aj2, rwb, zero, m_cfm_coeff, m_cfm_gain,
                -max_imp, max_imp, bit(motor_b & ~coupled_b, a))

    # --- slot 6: coupled linear motor (builder.motor_linear_coupled) ---
    if True:
        # Aggregate jacobian along the coupled distance direction.
        lj = jnp.zeros((j, 3))
        aj1 = jnp.zeros((j, 3))
        aj2 = jnp.zeros((j, 3))
        for a in range(3):
            coeff = _dot(basis[:, :, a], lin_err) * bit(coupled_b, a)
            lj = lj + basis[:, :, a] * coeff[:, None]
            aj1 = aj1 + cmat1_basis[:, :, a] * coeff[:, None]
            aj2 = aj2 + cmat2_basis[:, :, a] * coeff[:, None]
        dist = jnp.linalg.norm(lj, axis=-1)
        inv_d = 1.0 / jnp.maximum(dist, 1e-12)
        lj, aj1, aj2 = lj * inv_d[:, None], aj1 * inv_d[:, None], aj2 * inv_d[:, None]
        # First coupled linear axis provides motor params + limits.
        fa = jnp.argmax(jnp.stack([bit(coupled_b, a) for a in range(3)], -1), -1)
        take = lambda arr: jnp.take_along_axis(arr, fa[:, None], axis=1)[:, 0]
        m_erp, m_cfm_coeff, m_cfm_gain = motor_coefficients(
            take(joints.motor_model), take(joints.motor_stiffness),
            take(joints.motor_damping), dt,
        )
        rwb = jnp.where(m_erp != 0.0, (dist - take(joints.motor_target_pos)) * m_erp, 0.0)
        tv = take(joints.motor_target_vel)
        has_lim = ((limit_b >> fa) & 1) == 1
        tv_cl = jnp.clip(tv, (take(joints.limit_min) - dist) * inv_dt,
                         (take(joints.limit_max) - dist) * inv_dt)
        tv = jnp.where(has_lim, tv_cl, tv)
        rwb = rwb - tv
        max_imp = take(joints.motor_max_force) * dt
        act = ((motor_b & coupled_b & JOINT_LIN_AXES) != 0)
        set_row(6, lj, aj1, aj2, rwb, zero, m_cfm_coeff, m_cfm_gain,
                -max_imp, max_imp, act)

    # --- slots 7-9: angular locks (builder.lock_angular) ---
    for a in range(3):
        aj = ang_basis[:, :, a]
        rb = v_err[:, a] * erp_inv_dt_j
        set_row(7 + a, jnp.zeros((j, 3)), aj, aj, zero, rb, cfm_coeff_j, zero,
                -_BIG, _BIG, bit(locked_b, 3 + a))

    # --- slots 10-12: linear locks (builder.lock_linear) ---
    for a in range(3):
        lj = basis[:, :, a]
        aj1 = cmat1_basis[:, :, a]
        aj2 = cmat2_basis[:, :, a]
        rb = _dot(lj, lin_err) * erp_inv_dt_j
        set_row(10 + a, lj, aj1, aj2, zero, rb, cfm_coeff_j, zero,
                -_BIG, _BIG, bit(locked_b, a))

    # --- slots 13-15: angular limits (builder.limit_angular) ---
    for a in range(3):
        ax = 3 + a
        s_min = jnp.sin(joints.limit_min[:, ax] * 0.5)
        s_max = jnp.sin(joints.limit_max[:, ax] * 0.5)
        s_ang = v_err[:, a]
        min_en = s_ang <= s_min
        max_en = s_max <= s_ang
        aj = ang_basis[:, :, a]
        rb = (jnp.maximum(s_ang - s_max, 0.0) - jnp.maximum(s_min - s_ang, 0.0)) * erp_inv_dt_j
        set_row(13 + a, jnp.zeros((j, 3)), aj, aj, zero, rb, cfm_coeff_j, zero,
                jnp.where(min_en, -_BIG, 0.0), jnp.where(max_en, _BIG, 0.0),
                bit(limit_b & ~coupled_b, ax))

    # --- slots 16-18: linear limits (builder.limit_linear) ---
    for a in range(3):
        lj = basis[:, :, a]
        aj1 = cmat1_basis[:, :, a]
        aj2 = cmat2_basis[:, :, a]
        dist = _dot(lin_err, lj)
        min_en = dist <= joints.limit_min[:, a]
        max_en = joints.limit_max[:, a] <= dist
        rb = (jnp.maximum(dist - joints.limit_max[:, a], 0.0)
              - jnp.maximum(joints.limit_min[:, a] - dist, 0.0)) * erp_inv_dt_j
        set_row(16 + a, lj, aj1, aj2, zero, rb, cfm_coeff_j, zero,
                jnp.where(min_en, -_BIG, 0.0), jnp.where(max_en, _BIG, 0.0),
                bit(limit_b & ~coupled_b, a))

    # --- slot 19: coupled linear limit (builder.limit_linear_coupled) ---
    if True:
        lj = jnp.zeros((j, 3))
        aj1 = jnp.zeros((j, 3))
        aj2 = jnp.zeros((j, 3))
        for a in range(3):
            coeff = _dot(basis[:, :, a], lin_err) * bit(coupled_b, a)
            lj = lj + basis[:, :, a] * coeff[:, None]
            aj1 = aj1 + cmat1_basis[:, :, a] * coeff[:, None]
            aj2 = aj2 + cmat2_basis[:, :, a] * coeff[:, None]
        dist = jnp.linalg.norm(lj, axis=-1)
        inv_d = 1.0 / jnp.maximum(dist, 1e-12)
        lj, aj1, aj2 = lj * inv_d[:, None], aj1 * inv_d[:, None], aj2 * inv_d[:, None]
        fa = jnp.argmax(jnp.stack([bit(coupled_b, a) for a in range(3)], -1), -1)
        take = lambda arr: jnp.take_along_axis(arr, fa[:, None], axis=1)[:, 0]
        lmax = take(joints.limit_max)
        rwb = jnp.minimum(dist - lmax, 0.0) * inv_dt
        rb = jnp.maximum(dist - lmax, 0.0) * erp_inv_dt_j
        act = ((limit_b & coupled_b & JOINT_LIN_AXES) != 0) & (
            (motor_b & coupled_b & JOINT_LIN_AXES) == 0
        )
        set_row(19, lj, aj1, aj2, rwb, rb, cfm_coeff_j, zero,
                zero, jnp.full((j,), _BIG), act)

    # --- slot 20: coupled angular limit (builder.limit_angular_coupled,
    #     joint_constraint_builder.rs:814-874) — spherical swing limits.
    #     Exactly 2 coupled angular axes: the constraint acts on the arc
    #     angle between the two frames' NON-coupled axis columns. ---
    if True:
        basis2 = quat.to_matrix(f2_rot)
        ang_coupled = (coupled_b >> 3) & 0b111
        # trailing_ones(ang_coupled): index of the first non-coupled ang axis.
        nc = jnp.where(
            (ang_coupled & 1) == 0, 0,
            jnp.where((ang_coupled & 2) == 0, 1,
                      jnp.where((ang_coupled & 4) == 0, 2, 0)),
        )
        oh_nc = jax.nn.one_hot(nc, 3)                      # [J, 3]
        axis1 = jnp.einsum("jab,jb->ja", basis, oh_nc)     # world columns
        axis2 = jnp.einsum("jab,jb->ja", basis2, oh_nc)
        cr = jnp.cross(axis1, axis2)
        s = jnp.linalg.norm(cr, axis=-1)
        cth = jnp.clip(_dot(axis1, axis2), -1.0, 1.0)
        angle = jnp.arctan2(s, cth)
        # Fallback jacobian at angle 0: any vector orthogonal to axis1.
        f1 = jnp.cross(axis1, jnp.array([1.0, 0.0, 0.0]))
        f2_ = jnp.cross(axis1, jnp.array([0.0, 1.0, 0.0]))
        fb = jnp.where(
            (jnp.sum(f1 * f1, -1) > 1e-8)[:, None], f1, f2_
        )
        aj = jnp.where(
            (s > 1e-8)[:, None],
            cr / jnp.maximum(s, 1e-12)[:, None],
            fb / jnp.maximum(jnp.linalg.norm(fb, axis=-1, keepdims=True), 1e-9),
        )
        # Swing limits come from the first coupled angular axis' slot.
        fa_c = jnp.where(
            (ang_coupled & 1) != 0, 3,
            jnp.where((ang_coupled & 2) != 0, 4, 5),
        )
        take_ax = lambda arr: jnp.take_along_axis(arr, fa_c[:, None], axis=1)[:, 0]
        lmin = take_ax(joints.limit_min)
        lmax = take_ax(joints.limit_max)
        min_en = angle <= lmin
        max_en = lmax <= angle
        rb = (jnp.maximum(angle - lmax, 0.0)
              - jnp.maximum(lmin - angle, 0.0)) * erp_inv_dt_j
        n_ang_coupled = (
            (ang_coupled & 1) + ((ang_coupled >> 1) & 1) + ((ang_coupled >> 2) & 1)
        )
        act = ((limit_b & coupled_b & JOINT_ANG_AXES) != 0) & (n_ang_coupled == 2)
        set_row(20, jnp.zeros((j, 3)), aj, aj, zero, rb, cfm_coeff_j, zero,
                jnp.where(min_en, -_BIG, 0.0), jnp.where(max_en, _BIG, 0.0),
                act)

    ii_ang_jac1 = jnp.einsum("jab,jrb->jra", ii1, ang_jac1)
    ii_ang_jac2 = jnp.einsum("jab,jrb->jra", ii2, ang_jac2)

    # --- masked modified Gram-Schmidt per group (finalize_constraints) ---
    imsum = im1 + im2
    rhs = rhs_wo_bias + rhs_bias
    cfm_gain = cfm_gain_rows
    inv_lhs = jnp.zeros((j, R))

    def orthogonalize(sl):
        nonlocal lin_jac, ang_jac1, ang_jac2, ii_ang_jac1, ii_ang_jac2
        nonlocal rhs, rhs_wo_bias, cfm_gain, inv_lhs
        slots = list(sl)
        for jj_i, jj in enumerate(slots):
            dot_jj = (
                _dot(lin_jac[:, jj], imsum * lin_jac[:, jj])
                + _dot(ii_ang_jac1[:, jj], ang_jac1[:, jj])
                + _dot(ii_ang_jac2[:, jj], ang_jac2[:, jj])
            )
            cg = dot_jj * cfm_coeff_rows[:, jj] + cfm_gain[:, jj]
            inv_dot_jj = jnp.where(dot_jj > 1e-12, 1.0 / jnp.maximum(dot_jj, 1e-12), 0.0)
            inv_lhs = inv_lhs.at[:, jj].set(
                jnp.where(dot_jj + cg > 1e-12, 1.0 / jnp.maximum(dot_jj + cg, 1e-12), 0.0)
            )
            cfm_gain = cfm_gain.at[:, jj].set(cg)

            unbounded = (lo[:, jj] <= -_BIG) & (hi[:, jj] >= _BIG) & active[:, jj]
            for ii_s in slots[jj_i + 1:]:
                dot_ij = (
                    _dot(lin_jac[:, ii_s], imsum * lin_jac[:, jj])
                    + _dot(ii_ang_jac1[:, ii_s], ang_jac1[:, jj])
                    + _dot(ii_ang_jac2[:, ii_s], ang_jac2[:, jj])
                )
                coeff = jnp.where(unbounded & active[:, ii_s], dot_ij * inv_dot_jj, 0.0)
                c3 = coeff[:, None]
                lin_jac = lin_jac.at[:, ii_s].add(-lin_jac[:, jj] * c3)
                ang_jac1 = ang_jac1.at[:, ii_s].add(-ang_jac1[:, jj] * c3)
                ang_jac2 = ang_jac2.at[:, ii_s].add(-ang_jac2[:, jj] * c3)
                ii_ang_jac1 = ii_ang_jac1.at[:, ii_s].add(-ii_ang_jac1[:, jj] * c3)
                ii_ang_jac2 = ii_ang_jac2.at[:, ii_s].add(-ii_ang_jac2[:, jj] * c3)
                rhs = rhs.at[:, ii_s].add(-rhs[:, jj] * coeff)
                rhs_wo_bias = rhs_wo_bias.at[:, ii_s].add(-rhs_wo_bias[:, jj] * coeff)

    orthogonalize(range(0, 7))
    orthogonalize(range(7, 21))

    return JointRows(
        b1=b1, b2=b2, valid=valid, color=color, im1=im1, im2=im2,
        lin_jac=lin_jac, ang_jac1=ang_jac1, ang_jac2=ang_jac2,
        ii_ang_jac1=ii_ang_jac1, ii_ang_jac2=ii_ang_jac2,
        rhs=rhs, rhs_wo_bias=rhs_wo_bias, cfm_gain=cfm_gain, inv_lhs=inv_lhs,
        lo=lo, hi=hi, impulse=jnp.zeros((j, R)), active=active,
    )


def solve_color(rows: JointRows, sb, color_id, *, use_bias: bool):
    """Sequentially solve all row slots of joints in one color
    (joint_velocity_constraint.rs:101-123 solve_generic)."""
    from rapier_tpu.dynamics.solver.contact_constraints import (
        RoutePlan, _onehot,
    )
    from rapier_tpu.utils import routing

    mask = rows.valid & (rows.color == color_id)
    fmask = mask.astype(jnp.float32)

    n1 = sb.v_lin.shape[1]
    oh1 = _onehot(rows.b1, n1)
    oh2 = _onehot(rows.b2, n1)

    def _gr(oh, table):
        """Row-major gather: oh routes [d, N] table -> [J, d]."""
        if isinstance(oh, RoutePlan):
            return jnp.take(table, oh.idx, axis=1).T
        return oh @ table.T

    v1 = _gr(oh1, sb.v_lin)
    w1 = _gr(oh1, sb.v_ang)
    v2 = _gr(oh2, sb.v_lin)
    w2 = _gr(oh2, sb.v_ang)
    v1_0, w1_0, v2_0, w2_0 = v1, w1, v2, w2

    impulse = rows.impulse
    rhs_all = rows.rhs if use_bias else rows.rhs_wo_bias

    for r in range(R):
        act = (mask & rows.active[:, r]).astype(jnp.float32)
        dlin = _dot(rows.lin_jac[:, r], v2 - v1)
        dang = _dot(rows.ang_jac2[:, r], w2) - _dot(rows.ang_jac1[:, r], w1)
        rhs = dlin + dang + rhs_all[:, r]
        total = jnp.clip(
            impulse[:, r] + rows.inv_lhs[:, r] * (rhs - rows.cfm_gain[:, r] * impulse[:, r]),
            rows.lo[:, r], rows.hi[:, r],
        )
        dl = (total - impulse[:, r]) * act
        impulse = impulse.at[:, r].add(dl)
        lin_imp = rows.lin_jac[:, r] * dl[:, None]
        v1 = v1 + lin_imp * rows.im1
        w1 = w1 + rows.ii_ang_jac1[:, r] * dl[:, None]
        v2 = v2 - lin_imp * rows.im2
        w2 = w2 - rows.ii_ang_jac2[:, r] * dl[:, None]

    m3 = fmask[:, None]

    def _sc(oh, vals_jd):
        """Scatter-add row-major deltas [J, d] into the [d, N] table."""
        if isinstance(oh, RoutePlan):
            return routing.segment_sum(vals_jd.T, oh.seg)
        return vals_jd.T @ oh

    v_lin = (sb.v_lin + _sc(oh1, (v1 - v1_0) * m3) + _sc(oh2, (v2 - v2_0) * m3))
    v_ang = (sb.v_ang + _sc(oh1, (w1 - w1_0) * m3) + _sc(oh2, (w2 - w2_0) * m3))
    rows = rows._replace(impulse=jnp.where(mask[:, None], impulse, rows.impulse))
    return rows, sb._replace(v_lin=v_lin, v_ang=v_ang)
