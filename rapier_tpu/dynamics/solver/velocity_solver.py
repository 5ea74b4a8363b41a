"""TGS-soft velocity solver: substep loop over colored constraint sweeps.

Behavioral port of the reference VelocitySolver
(src/dynamics/solver/velocity_solver.rs:151-211) and IslandSolver's small-step
scaling (island_solver.rs:50-54): substep dt = dt / num_solver_iterations; per
substep: external-force velocity increments, soft-rhs update, warmstart,
`num_internal_pgs_iterations` Gauss-Seidel passes, linearized position
integration, then bias-free stabilization passes.  Islands are replaced by a
single batched solve with colored sweeps (SURVEY §2.3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rapier_tpu.math import quat
from rapier_tpu.types import (
    LOCK_ROTATION_X,
    LOCK_TRANSLATION_X,
    BodyType,
    SimParams,
    spring_cfm_factor,
    spring_erp_inv_dt,
)
from rapier_tpu.dynamics.solver import contact_constraints as cc
from rapier_tpu.dynamics.solver import joint_constraints as jc


def effective_inv_mass(bodies, active):
    """Per-axis effective inverse mass (locked translations zeroed), reference
    RigidBodyMassProps::effective_inv_mass."""
    locks = bodies.locked_axes[:, None]
    axis_bits = jnp.array(
        [LOCK_TRANSLATION_X, LOCK_TRANSLATION_X << 1, LOCK_TRANSLATION_X << 2]
    )
    unlocked = (locks & axis_bits[None, :]) == 0
    im = bodies.inv_mass[:, None] * unlocked
    dyn = (bodies.body_type == BodyType.DYNAMIC) & active
    return jnp.where(dyn[:, None], im, 0.0)


def effective_world_inv_inertia(bodies, active):
    """World-frame effective inverse inertia [N,3,3] with locked rotation rows
    and columns zeroed (reference effective_world_inv_inertia)."""
    rot_world = quat.mul(bodies.rot, bodies.principal_frame)
    m = quat.to_matrix(rot_world)
    # ii = m @ diag(inv_I) @ m^T, unrolled: a 3-wide einsum contraction
    # lowers to micro batched matmuls on TPU (~6 ms/step at the 4096-scene
    # bench); the scaled product fuses into neighboring elementwise work.
    md = m * bodies.inv_principal_inertia[:, None, :]       # [N, 3, 3]
    ii = jnp.stack([
        jnp.stack([
            md[:, i, 0] * m[:, k, 0] + md[:, i, 1] * m[:, k, 1]
            + md[:, i, 2] * m[:, k, 2]
            for k in range(3)
        ], axis=-1)
        for i in range(3)
    ], axis=-2)                                             # [N, 3, 3]
    locks = bodies.locked_axes[:, None]
    axis_bits = jnp.array(
        [LOCK_ROTATION_X, LOCK_ROTATION_X << 1, LOCK_ROTATION_X << 2]
    )
    unlocked = ((locks & axis_bits[None, :]) == 0).astype(ii.dtype)  # [N,3]
    ii = ii * unlocked[:, :, None] * unlocked[:, None, :]
    dyn = (bodies.body_type == BodyType.DYNAMIC) & active
    return jnp.where(dyn[:, None, None], ii, 0.0)


def gyroscopic_angvel(bodies, dt):
    """Momentum-preserving explicit gyroscopic term
    (reference rigid_body.rs:1443-1462, Jolt-style capped momentum)."""
    rot_world = quat.mul(bodies.rot, bodies.principal_frame)
    w_local = quat.inv_rotate(rot_world, bodies.angvel)
    inertia = jnp.where(
        bodies.inv_principal_inertia > 0, 1.0 / jnp.maximum(bodies.inv_principal_inertia, 1e-30), 0.0
    )
    momentum = inertia * w_local
    gyro = -jnp.cross(w_local, momentum) * dt
    total = momentum + gyro
    tot_sq = jnp.sum(total * total, axis=-1, keepdims=True)
    cur_sq = jnp.sum(momentum * momentum, axis=-1, keepdims=True)
    capped = total * jnp.sqrt(cur_sq / jnp.maximum(tot_sq, 1e-30))
    new_w = quat.rotate(rot_world, bodies.inv_principal_inertia * capped)
    ok = (tot_sq[..., 0] > 0.0) & bodies.gyro_enabled & (bodies.body_type == BodyType.DYNAMIC)
    return jnp.where(ok[:, None], new_w, bodies.angvel)


def make_solver_bodies(bodies, active, params: SimParams) -> cc.SolverBodies:
    """Build the N+1 solver-body arrays (sentinel slot N zeroed).

    Mirrors SolverBodies::copy_from (solver_body.rs:95-128): pose at COM,
    gyroscopic angular velocity, im/ii zeroed for non-dynamic bodies.
    Component-leading layout ([3, N+1], see contact_constraints docstring).
    """
    n = bodies.n
    im = effective_inv_mass(bodies, active)
    ii = effective_world_inv_inertia(bodies, active)

    com = bodies.pos + quat.rotate(bodies.rot, bodies.local_com)
    angvel = gyroscopic_angvel(bodies, params.dt)

    moving = active & (
        (bodies.body_type == BodyType.DYNAMIC) | bodies.is_kinematic()
    )
    v_lin = jnp.where(moving[:, None], bodies.linvel, 0.0)
    v_ang = jnp.where(moving[:, None], angvel, 0.0)

    def cl(x, pad_row):
        return jnp.concatenate([x, pad_row]).T

    pad3 = jnp.zeros((1, 3))
    return cc.SolverBodies(
        v_lin=cl(v_lin, pad3),
        v_ang=cl(v_ang, pad3),
        com=cl(com, pad3),
        rot=cl(bodies.rot, jnp.array([[0.0, 0.0, 0.0, 1.0]])),
        im=cl(im, pad3),
        ii=jnp.concatenate([ii, jnp.zeros((1, 3, 3))]).transpose(1, 2, 0),
    )


def velocity_increments(bodies, sb: cc.SolverBodies, active, params, dt_sub):
    """Per-substep external velocity increments (gravity + persistent forces),
    reference velocity_solver.rs:115-122.  Returns CL [3, N+1] arrays."""
    dyn = active & (bodies.body_type == BodyType.DYNAMIC)
    im = sb.im[:, :-1].T          # [N, 3]
    unlocked = (im > 0).astype(jnp.float32)
    grav = params.gravity[None, :] * bodies.gravity_scale[:, None] * unlocked
    dv = (grav + bodies.force * im) * dt_sub
    iiv = sb.ii[:, :, :-1]                                   # [3, 3, N]
    tq = bodies.torque                                       # [N, 3]
    dw = jnp.stack([
        iiv[i, 0] * tq[:, 0] + iiv[i, 1] * tq[:, 1] + iiv[i, 2] * tq[:, 2]
        for i in range(3)
    ], axis=-1) * dt_sub
    dv = jnp.where(dyn[:, None], dv, 0.0)
    dw = jnp.where(dyn[:, None], dw, 0.0)
    pad = jnp.zeros((1, 3))
    return (jnp.concatenate([dv, pad]).T, jnp.concatenate([dw, pad]).T)


def integrate_poses(sb: cc.SolverBodies, move_mask, dt_sub) -> cc.SolverBodies:
    """Linearized pose integration (velocity_solver.rs:213-238). CL layout:
    move_mask [N+1]."""
    com = sb.com + jnp.where(move_mask[None], sb.v_lin * dt_sub, 0.0)
    rot_new = quat.integrate_linearized_cl(sb.rot, sb.v_ang, dt_sub)
    rot = jnp.where(move_mask[None], rot_new, sb.rot)
    return sb._replace(com=com, rot=rot)


def substep_inputs(bodies, sb, active, params: SimParams):
    """Everything the TGS substep loop needs besides the constraints: the
    substep rates, soft-constraint coefficients, per-substep velocity
    increments, and the mover mask.  Shared by the JAX path (solve) and the
    Pallas kernel path (pallas_sweep.solve_from_manifolds)."""
    n_sub = params.num_solver_iterations
    dt_sub = params.dt / n_sub
    inv_dt_sub = jnp.where(dt_sub == 0, 0.0, 1.0 / dt_sub)
    erp_inv_dt = spring_erp_inv_dt(
        params.contact_natural_frequency, params.contact_damping_ratio, dt_sub
    )
    cfm_factor = spring_cfm_factor(
        params.contact_natural_frequency, params.contact_damping_ratio, dt_sub
    )
    dv_inc, dw_inc = velocity_increments(bodies, sb, active, params, dt_sub)
    move_mask = jnp.concatenate([
        active & ((bodies.body_type == BodyType.DYNAMIC) | bodies.is_kinematic()),
        jnp.zeros((1,), bool),
    ])
    return dict(
        n_sub=n_sub, dt_sub=dt_sub, inv_dt_sub=inv_dt_sub,
        erp_inv_dt=erp_inv_dt, cfm_factor=cfm_factor,
        dv_inc=dv_inc, dw_inc=dw_inc, move_mask=move_mask,
    )


def solve(bodies, sb: cc.SolverBodies, constraints,
          num_colors, active, params: SimParams,
          joints=None, joint_color=None, num_joint_colors=None,
          cc_mod=cc):
    """Run the full TGS-soft substep loop (pure-JAX path; contacts-only
    scenes on TPU take pallas_sweep.solve_from_manifolds instead, dispatched
    by the pipeline).

    Returns (sb, constraints, joint_rows).  `joint_rows` is None when no
    joints were passed; otherwise it carries the last-substep impulses.
    """
    si = substep_inputs(bodies, sb, active, params)
    n_sub = si["n_sub"]
    dt_sub = si["dt_sub"]
    inv_dt_sub = si["inv_dt_sub"]
    erp_inv_dt = si["erp_inv_dt"]
    cfm_factor = si["cfm_factor"]
    dv_inc, dw_inc = si["dv_inc"], si["dw_inc"]
    move_mask = si["move_mask"]

    # One-hot gather/scatter matrices: loop-invariant, built once.
    # `cc_mod` selects the friction model implementation (twist vs Coulomb).
    oh1, oh2 = cc.pair_onehots(constraints, sb.v_lin.shape[1])

    block_2x2 = bool(getattr(params, "block_solver_2x2", False)) and (
        cc_mod is cc
    )

    def contact_sweep(constraints, sb, use_bias):
        def body_fn(ci, carry):
            cons, s = carry
            return cc_mod.solve_color(
                cons, s, ci, oh1, oh2, use_bias=use_bias,
                **({"block_2x2": True} if block_2x2 else {}),
            )
        return jax.lax.fori_loop(0, num_colors, body_fn, (constraints, sb))

    def joint_sweep(rows, sb, use_bias):
        def body_fn(ci, carry):
            r, s = carry
            return jc.solve_color(r, s, ci, use_bias=use_bias)
        return jax.lax.fori_loop(0, num_joint_colors, body_fn, (rows, sb))

    rows = None
    for _substep in range(n_sub):
        sb = sb._replace(v_lin=sb.v_lin + dv_inc, v_ang=sb.v_ang + dw_inc)

        # Joint rows are fully rebuilt from current poses each substep
        # (reference joint_constraint_builder.rs:66-106).
        if joints is not None:
            rows = jc.build_rows(
                joints, sb, joint_color, dt_sub, inv_dt_sub, bodies.n
            )

        constraints = cc_mod.update(
            constraints, sb, oh1, oh2,
            cfm_factor=cfm_factor, inv_dt=inv_dt_sub,
            allowed_lin_err=params.allowed_linear_error(),
            erp_inv_dt=erp_inv_dt,
            max_corrective_velocity=params.max_corrective_velocity(),
            warmstart_coeff=params.warmstart_coefficient,
        )
        sb = cc_mod.warmstart(constraints, sb, oh1, oh2)

        for _pgs in range(params.num_internal_pgs_iterations):
            if joints is not None:
                rows, sb = joint_sweep(rows, sb, True)
            constraints, sb = contact_sweep(constraints, sb, True)

        sb = integrate_poses(sb, move_mask, dt_sub)

        for _stab in range(params.num_internal_stabilization_iterations):
            if joints is not None:
                rows, sb = joint_sweep(rows, sb, False)
            constraints, sb = contact_sweep(constraints, sb, False)

    return sb, constraints, rows


def _slice_lanes(c: cc.ContactConstraints, start: int, width: int):
    """Static lane-axis slice of every per-lane constraint field."""
    return type(c)(*(
        (v if jnp.ndim(v) == 0 else v[..., start:start + width])
        for v in c
    ))


def solve_blocked(bodies, sb: cc.SolverBodies, constraints, blocks,
                  oh1, oh2, active, params: SimParams, cc_mod=cc):
    """TGS-soft substep loop over a BLOCKED constraint layout (large scenes).

    `constraints` lanes are ordered by color into contiguous static blocks
    (coloring.color_constraints_blocked); `blocks` is a static list of
    (color_id, start, width, oh1_c, oh2_c) where oh*_c are per-block
    RoutePlans.  Each Gauss-Seidel pass then runs width-of-that-color lanes
    instead of all K lanes masked (the full-width sweep paid
    num_colors * K lanes/sweep — ~38 ms/step of the round-3 stack-24 profile;
    the blocked sweep pays sum(caps) ~ 1.3 K).

    Semantics identical to `solve`: the per-block pass is cc.solve_color on
    the sliced pytree (mask = valid & color == id); scatters are per-block
    segment sums, exact Gauss-Seidel for conflict-free blocks and Jacobi
    accumulation for the capped tail block — the same degradation rule as
    the masked path's overflow color.
    """
    si = substep_inputs(bodies, sb, active, params)
    dt_sub = si["dt_sub"]
    move_mask = si["move_mask"]
    dv_inc, dw_inc = si["dv_inc"], si["dw_inc"]

    def contact_sweep(constraints, sb, use_bias):
        for (ci, s0, wd, o1c, o2c) in blocks:
            c_sl = _slice_lanes(constraints, s0, wd)
            c_sl, sb = cc_mod.solve_color(
                c_sl, sb, jnp.int32(ci), o1c, o2c, use_bias=use_bias
            )
            constraints = constraints._replace(
                impulse=jax.lax.dynamic_update_slice_in_dim(
                    constraints.impulse, c_sl.impulse, s0, axis=-1),
                tan_impulse=jax.lax.dynamic_update_slice_in_dim(
                    constraints.tan_impulse, c_sl.tan_impulse, s0, axis=-1),
                twist_impulse=jax.lax.dynamic_update_slice_in_dim(
                    constraints.twist_impulse, c_sl.twist_impulse, s0,
                    axis=-1),
            )
        return constraints, sb

    for _substep in range(si["n_sub"]):
        sb = sb._replace(v_lin=sb.v_lin + dv_inc, v_ang=sb.v_ang + dw_inc)
        constraints = cc_mod.update(
            constraints, sb, oh1, oh2,
            cfm_factor=si["cfm_factor"], inv_dt=si["inv_dt_sub"],
            allowed_lin_err=params.allowed_linear_error(),
            erp_inv_dt=si["erp_inv_dt"],
            max_corrective_velocity=params.max_corrective_velocity(),
            warmstart_coeff=params.warmstart_coefficient,
        )
        sb = cc_mod.warmstart(constraints, sb, oh1, oh2)
        for _pgs in range(params.num_internal_pgs_iterations):
            constraints, sb = contact_sweep(constraints, sb, True)
        sb = integrate_poses(sb, move_mask, dt_sub)
        for _stab in range(params.num_internal_stabilization_iterations):
            constraints, sb = contact_sweep(constraints, sb, False)

    return sb, constraints


def writeback(bodies, sb: cc.SolverBodies, active, params: SimParams):
    """Write solver results back to body state (velocity_solver.rs:291-351):
    damping applied once with the full dt; next pose from the COM pose."""
    dyn = active & (bodies.body_type == BodyType.DYNAMIC)
    lin_f = 1.0 / (1.0 + params.dt * bodies.linear_damping)
    ang_f = 1.0 / (1.0 + params.dt * bodies.angular_damping)
    sb_vlin = sb.v_lin[:, :-1].T   # back to row-major [N, 3]
    sb_vang = sb.v_ang[:, :-1].T
    linvel = jnp.where(dyn[:, None], sb_vlin * lin_f[:, None], bodies.linvel)
    angvel = jnp.where(dyn[:, None], sb_vang * ang_f[:, None], bodies.angvel)

    # next pose: body origin = com - R * local_com.
    rot = sb.rot[:, :-1].T
    pos = sb.com[:, :-1].T - quat.rotate(rot, bodies.local_com)
    move = active & (
        (bodies.body_type == BodyType.DYNAMIC)
        | (bodies.body_type == BodyType.KINEMATIC_VELOCITY_BASED)
    )
    # Kinematic position-based bodies keep the exact user-provided target.
    kin_pos = bodies.body_type == BodyType.KINEMATIC_POSITION_BASED
    next_pos = jnp.where(move[:, None], pos,
               jnp.where(kin_pos[:, None], bodies.next_pos, bodies.pos))
    next_rot = jnp.where(move[:, None], rot,
               jnp.where(kin_pos[:, None], bodies.next_rot, bodies.rot))

    return bodies.replace(
        linvel=linvel, angvel=angvel, next_pos=next_pos, next_rot=next_rot
    )
