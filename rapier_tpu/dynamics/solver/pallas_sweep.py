"""VMEM-resident TGS-soft contact sweep as ONE Pallas kernel per scene.

Why: the pure-JAX solver loop (velocity_solver.solve) runs
``substeps x (pgs + stabilization) x colors`` Gauss-Seidel passes; under XLA
each pass is a separate while-loop body that re-reads the full constraint
set from HBM (~400 KB/scene at P=512, ~60+ passes -> ~25 MB of HBM traffic
per scene-step, the round-1 bottleneck; BASELINE.md).  This kernel loads each
scene's constraints into VMEM ONCE and runs the entire substep/color loop
on-chip, reusing the exact `contact_constraints` update/warmstart/solve_color
functions (pure jnp) inside the kernel so the semantics stay identical to the
JAX path (reference behavior: src/dynamics/solver/velocity_solver.rs:151-211).

Layout: all constraint fields are packed into a single [D, P] f32 matrix
(lane axis last) so the HBM->VMEM stream is one tile-friendly block per
scene; fields are row-slices (static offsets).  `jax.vmap` over scenes turns
the per-scene `pallas_call` into a grid over scenes with automatic double
buffering of the constraint stream.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rapier_tpu.dynamics.solver import contact_constraints as cc


def _integrate_linearized_rank2(q, w, dt):
    """quat.integrate_linearized_cl with every intermediate kept rank-2.

    Inside the kernel, rank-1 slices (`q[0]`) of loop-carried arrays followed
    by re-expansion (jnp.stack / [None]) crash Mosaic's layout inference, so
    this uses [k:k+1] range slices and concatenation exclusively."""
    h = dt * 0.5
    hx, hy, hz = w[0:1] * h, w[1:2] * h, w[2:3] * h
    qx, qy, qz, qw = q[0:1], q[1:2], q[2:3], q[3:4]
    # (hx, hy, hz, 1) ⊗ q
    rx = qx + hx * qw + hy * qz - hz * qy
    ry = qy - hx * qz + hy * qw + hz * qx
    rz = qz + hx * qy - hy * qx + hz * qw
    rw = qw - hx * qx - hy * qy - hz * qz
    n2 = rx * rx + ry * ry + rz * rz + rw * rw
    inv = 1.0 / jnp.sqrt(jnp.maximum(n2, 1e-24))
    return jnp.concatenate([rx * inv, ry * inv, rz * inv, rw * inv], axis=0)

# ---------------------------------------------------------------------------
# Packed constraint-matrix layout: (field_name, rows, shape_per_lane).
# Every field is reshaped to [rows, P] and stacked along rows.
# ---------------------------------------------------------------------------
_FIELDS = (
    ("b1", 1), ("b2", 1), ("valid", 1), ("color", 1),
    ("point_mask", 4),
    ("dir1", 3), ("tangent1", 3), ("im1", 3), ("im2", 3), ("limit", 1),
    ("torque_dir1", 12), ("torque_dir2", 12),
    ("ii_torque_dir1", 12), ("ii_torque_dir2", 12),
    ("r", 4), ("local_p1", 12), ("local_p2", 12),
    ("dist0", 4), ("normal_vel_rhs", 4),
    ("tan_torque_dir1", 6), ("tan_torque_dir2", 6),
    ("tan_ii_torque_dir1", 6), ("tan_ii_torque_dir2", 6),
    ("tan_r", 3), ("tan_rhs_wo_bias", 2),
    ("local_fc1", 3), ("local_fc2", 3),
    ("twist_ii_dir1", 3), ("twist_ii_dir2", 3),
    ("twist_r", 1), ("twist_dists", 4),
    ("impulse", 4), ("tan_impulse", 2), ("twist_impulse", 1),
)
_OFFSETS = {}
_D = 0
for _name, _rows in _FIELDS:
    _OFFSETS[_name] = (_D, _rows)
    _D += _rows
D_CONS = _D


def pack_constraints(c: cc.ContactConstraints) -> jax.Array:
    """Flatten the solver-relevant ContactConstraints fields to [D, P] f32."""
    p = c.b1.shape[0]
    rows = []
    for name, r in _FIELDS:
        v = getattr(c, name)
        rows.append(jnp.asarray(v, jnp.float32).reshape(r, p))
    return jnp.concatenate(rows, axis=0)


def _slice(cons, name, shape3=None):
    off, r = _OFFSETS[name]
    # `+ 0.0` launders the slice into a freshly-laid-out value: Mosaic's
    # layout inference aborts (VectorLayout::join rank check) when a sliced
    # view of the big packed matrix flows directly into a fori_loop carry.
    v = cons[off:off + r] + 0.0
    if shape3 is not None:
        v = v.reshape(shape3 + (v.shape[-1],))
    return v


def _unpack(cons, p):
    """Rebuild a ContactConstraints of VALUES from the packed matrix."""
    f = functools.partial(_slice, cons)
    z4 = jnp.zeros((4, p), jnp.float32)
    z2 = jnp.zeros((2, p), jnp.float32)
    return cc.ContactConstraints(
        b1=f("b1")[0].astype(jnp.int32),
        b2=f("b2")[0].astype(jnp.int32),
        valid=f("valid")[0] > 0.0,
        color=f("color")[0].astype(jnp.int32),
        dir1=f("dir1"), tangent1=f("tangent1"),
        im1=f("im1"), im2=f("im2"), limit=f("limit")[0],
        point_mask=f("point_mask") > 0.0,
        torque_dir1=f("torque_dir1", (4, 3)),
        torque_dir2=f("torque_dir2", (4, 3)),
        ii_torque_dir1=f("ii_torque_dir1", (4, 3)),
        ii_torque_dir2=f("ii_torque_dir2", (4, 3)),
        r=f("r"), local_p1=f("local_p1", (4, 3)), local_p2=f("local_p2", (4, 3)),
        dist0=f("dist0"), normal_vel_rhs=f("normal_vel_rhs"),
        rhs=z4, rhs_wo_bias=z4,
        impulse=f("impulse"), impulse_acc=z4,
        tan_torque_dir1=f("tan_torque_dir1", (2, 3)),
        tan_torque_dir2=f("tan_torque_dir2", (2, 3)),
        tan_ii_torque_dir1=f("tan_ii_torque_dir1", (2, 3)),
        tan_ii_torque_dir2=f("tan_ii_torque_dir2", (2, 3)),
        tan_r=f("tan_r"), tan_rhs=z2,
        tan_rhs_wo_bias=f("tan_rhs_wo_bias"),
        tan_impulse=f("tan_impulse"), tan_impulse_acc=z2,
        local_fc1=f("local_fc1"), local_fc2=f("local_fc2"),
        twist_ii_dir1=f("twist_ii_dir1"), twist_ii_dir2=f("twist_ii_dir2"),
        twist_r=f("twist_r")[0], twist_dists=f("twist_dists"),
        twist_impulse=f("twist_impulse")[0],
        twist_impulse_acc=jnp.zeros((p,), jnp.float32),
        cfm_factor=jnp.float32(1.0),
    )


def _kernel(scalars_ref, ncol_ref, cons_ref, vlin_ref, vang_ref, com_ref,
            rot_ref, dv_ref, dw_ref, move_ref,
            out_vlin, out_vang, out_com, out_rot, out_imp,
            *, n_sub, pgs_iters, stab_iters):
    p = cons_ref.shape[-1]
    n1 = vlin_ref.shape[-1]

    # Scalars ride in an (8, 128) VMEM tile (column 0), NOT SMEM: the vmap
    # batching rule blocks every input with size 1 on the scene axis, and
    # SMEM/small-VMEM blocks fail the (8, 128)-divisibility check.
    dt_sub = scalars_ref[0, 0]
    inv_dt_sub = scalars_ref[1, 0]
    erp_inv_dt = scalars_ref[2, 0]
    cfm_factor = scalars_ref[3, 0]
    allowed_lin_err = scalars_ref[4, 0]
    max_corrective_velocity = scalars_ref[5, 0]
    warmstart_coeff = scalars_ref[6, 0]
    num_colors = ncol_ref[0, 0]

    cons = _unpack(cons_ref[...], p)
    sb = cc.SolverBodies(
        v_lin=vlin_ref[...], v_ang=vang_ref[...],
        com=com_ref[...], rot=rot_ref[...],
        im=jnp.zeros((3, n1), jnp.float32),   # unused by the contact sweep
        ii=jnp.zeros((1, 1, n1), jnp.float32),
    )
    dv_inc = dv_ref[...]
    dw_inc = dw_ref[...]
    move = move_ref[...] > 0.0               # [1, N1]: keep rank 2 — rank-1
    # slices + [None] re-expansion trip Mosaic layout inference (see _slice)

    # One-hot gather/scatter matrices (built once, VMEM-resident).
    ids = jax.lax.broadcasted_iota(jnp.int32, (p, n1), 1)
    oh1 = (cons.b1[:, None] == ids).astype(jnp.float32)
    oh2 = (cons.b2[:, None] == ids).astype(jnp.float32)

    def sweep(cons, sb, use_bias):
        """Gauss-Seidel pass over all colors: color 0 peeled + fori over the
        rest.  The peel is load-bearing, not an optimization — feeding the
        update/warmstart outputs directly into a fori_loop carry crashes
        Mosaic layout inference (VectorLayout::join rank check); one inlined
        solve_color call gives every carried array a loop-compatible layout.
        Semantics are identical (colors solved 0..num_colors-1 in order)."""
        cons, sb = cc.solve_color(
            cons, sb, jnp.int32(0), oh1, oh2, use_bias=use_bias
        )

        def body(ci, carry):
            imp, tanimp, twimp, vlin, vang = carry
            c2 = cons._replace(
                impulse=imp, tan_impulse=tanimp, twist_impulse=twimp
            )
            s2 = sb._replace(v_lin=vlin, v_ang=vang)
            c3, s3 = cc.solve_color(c2, s2, ci, oh1, oh2, use_bias=use_bias)
            return (c3.impulse, c3.tan_impulse, c3.twist_impulse,
                    s3.v_lin, s3.v_ang)
        init = (cons.impulse, cons.tan_impulse, cons.twist_impulse,
                sb.v_lin, sb.v_ang)
        imp, tanimp, twimp, vlin, vang = jax.lax.fori_loop(
            1, num_colors, body, init
        )
        return (
            cons._replace(impulse=imp, tan_impulse=tanimp, twist_impulse=twimp),
            sb._replace(v_lin=vlin, v_ang=vang),
        )

    for _substep in range(n_sub):
        sb = sb._replace(v_lin=sb.v_lin + dv_inc, v_ang=sb.v_ang + dw_inc)
        cons = cc.update(
            cons, sb, oh1, oh2,
            cfm_factor=cfm_factor, inv_dt=inv_dt_sub,
            allowed_lin_err=allowed_lin_err, erp_inv_dt=erp_inv_dt,
            max_corrective_velocity=max_corrective_velocity,
            warmstart_coeff=warmstart_coeff,
        )
        sb = cc.warmstart(cons, sb, oh1, oh2)
        for _pgs in range(pgs_iters):
            cons, sb = sweep(cons, sb, True)
        # integrate_poses (velocity_solver.rs:213-238), masked to movers.
        com = sb.com + jnp.where(move, sb.v_lin * dt_sub, 0.0)
        rot_new = _integrate_linearized_rank2(sb.rot, sb.v_ang, dt_sub)
        rot = jnp.where(move, rot_new, sb.rot)
        sb = sb._replace(com=com, rot=rot)
        for _stab in range(stab_iters):
            cons, sb = sweep(cons, sb, False)

    out_vlin[...] = sb.v_lin
    out_vang[...] = sb.v_ang
    out_com[...] = sb.com
    out_rot[...] = sb.rot
    # Row writes, not a concat: rank-1 -> rank-2 [None] expansions of
    # loop-carried values crash Mosaic layout inference.
    out_imp[0:4, :] = cons.impulse
    out_imp[4:8, :] = cons.impulse_acc
    out_imp[8:10, :] = cons.tan_impulse
    out_imp[10:12, :] = cons.tan_impulse_acc
    out_imp[12, :] = cons.twist_impulse
    out_imp[13, :] = cons.twist_impulse_acc


def solve(sb: cc.SolverBodies, constraints: cc.ContactConstraints, num_colors,
          dv_inc, dw_inc, move_mask, *, dt_sub, inv_dt_sub, erp_inv_dt,
          cfm_factor, allowed_lin_err, max_corrective_velocity,
          warmstart_coeff, n_sub: int, pgs_iters: int, stab_iters: int,
          interpret: bool = False):
    """Contacts-only TGS-soft solve, one VMEM-resident kernel per scene.

    Mirrors velocity_solver.solve for the joints=None case; returns
    (sb, constraints) with the same post-solve field semantics as the JAX
    path (impulse/impulse_acc/... carry the last-substep values).
    """
    p = constraints.b1.shape[0]
    n1 = sb.v_lin.shape[1]
    cons = pack_constraints(constraints)
    scalars = jnp.broadcast_to(
        jnp.stack([
            jnp.asarray(dt_sub, jnp.float32),
            jnp.asarray(inv_dt_sub, jnp.float32),
            jnp.asarray(erp_inv_dt, jnp.float32),
            jnp.asarray(cfm_factor, jnp.float32),
            jnp.asarray(allowed_lin_err, jnp.float32),
            jnp.asarray(max_corrective_velocity, jnp.float32),
            jnp.asarray(warmstart_coeff, jnp.float32),
            jnp.float32(0.0),
        ])[:, None],
        (8, 128),
    )
    ncol = jnp.broadcast_to(
        jnp.asarray(num_colors, jnp.int32).reshape(1, 1), (8, 128)
    )
    move = move_mask.astype(jnp.float32).reshape(1, n1)

    kernel = functools.partial(
        _kernel, n_sub=n_sub, pgs_iters=pgs_iters, stab_iters=stab_iters
    )
    f32 = jnp.float32
    out_shapes = (
        jax.ShapeDtypeStruct((3, n1), f32),   # v_lin
        jax.ShapeDtypeStruct((3, n1), f32),   # v_ang
        jax.ShapeDtypeStruct((3, n1), f32),   # com
        jax.ShapeDtypeStruct((4, n1), f32),   # rot
        jax.ShapeDtypeStruct((14, p), f32),   # impulse block
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    vlin, vang, com, rot, imp = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        in_specs=[vmem] * 10,
        out_specs=(vmem,) * 5,
        interpret=interpret,
    )(scalars, ncol, cons, sb.v_lin, sb.v_ang, sb.com, sb.rot,
      dv_inc, dw_inc, move)

    sb = sb._replace(v_lin=vlin, v_ang=vang, com=com, rot=rot)
    constraints = constraints._replace(
        impulse=imp[0:4], impulse_acc=imp[4:8],
        tan_impulse=imp[8:10], tan_impulse_acc=imp[10:12],
        twist_impulse=imp[12], twist_impulse_acc=imp[13],
    )
    return sb, constraints
