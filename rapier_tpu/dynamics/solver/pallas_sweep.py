"""VMEM-resident contact solve (generate + TGS-soft sweep) as ONE Pallas
kernel per scene.

Why: the pure-JAX solver runs ``substeps x (pgs + stabilization) x colors``
Gauss-Seidel passes; under XLA each pass is a separate while-loop body that
re-reads the full constraint set from HBM (~400 KB/scene at P=512, 60+
passes -> ~25 MB of HBM traffic per scene-step — the round-1 bottleneck;
BASELINE.md).  This kernel streams each scene's MANIFOLD rows (~40 x P)
into VMEM once, builds the constraints in-VMEM (contact_constraints.generate
would otherwise round-trip ~160 x P rows through HBM), and runs the entire
substep/color loop on-chip.  It reuses the exact `contact_constraints`
generate/update/warmstart/solve_color functions (pure jnp) inside the kernel
so the semantics stay identical to the JAX fallback path (reference behavior:
src/dynamics/solver/velocity_solver.rs:151-211).

Mosaic survival rules baked into the shared solver code (hard-won; see the
bisect notes in the round-2 history):
- no sublane-axis `jnp.sum` over sliced views (explicit unrolled adds)
- no `.at[k].add` (scatter-add) — unstacked row updates
- slices of the packed input matrix are laundered (`+ 0.0`) before any
  fori_loop carry; color 0 of each sweep is peeled out of the loop
- rank-1 -> rank-2 [None] expansions of loop-carried values are avoided
  after loops (rank-2 [k:k+1] range slices instead)
- scalars ride an (8, 128) VMEM tile so `jax.vmap` batching works (SMEM
  blocks fail the (8, 128)-divisibility check under the vmap rule)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rapier_tpu.dynamics.solver import contact_constraints as cc


def _integrate_linearized_rank2(q, w, dt):
    """quat.integrate_linearized_cl with every intermediate kept rank-2."""
    h = dt * 0.5
    hx, hy, hz = w[0:1] * h, w[1:2] * h, w[2:3] * h
    qx, qy, qz, qw = q[0:1], q[1:2], q[2:3], q[3:4]
    rx = qx + hx * qw + hy * qz - hz * qy
    ry = qy - hx * qz + hy * qw + hz * qx
    rz = qz + hx * qy - hy * qx + hz * qw
    rw = qw - hx * qx - hy * qy - hz * qz
    n2 = rx * rx + ry * ry + rz * rz + rw * rw
    inv = 1.0 / jnp.sqrt(jnp.maximum(n2, 1e-24))
    return jnp.concatenate([rx * inv, ry * inv, rz * inv, rw * inv], axis=0)


# ---------------------------------------------------------------------------
# Packed manifold-matrix layout: (field, rows).  [D_MAN, P] f32 per scene.
# ---------------------------------------------------------------------------
_MFIELDS = (
    ("b1", 1), ("b2", 1), ("valid", 1), ("color", 1),
    ("friction", 1), ("restitution", 1),
    ("normal", 3), ("point", 12), ("point_active", 4), ("dist", 4),
    ("prev_impulse", 4), ("ws_n", 4), ("ws_t", 2), ("ws_tw", 1),
)
_MOFF = {}
_D = 0
for _name, _rows in _MFIELDS:
    _MOFF[_name] = (_D, _rows)
    _D += _rows
D_MAN = _D


def _mslice(mat, name, shape3=None):
    off, r = _MOFF[name]
    # `+ 0.0` launders the slice into a freshly-laid-out value (Mosaic's
    # layout inference aborts when sliced views flow into fori_loop carries).
    v = mat[off:off + r] + 0.0
    if shape3 is not None:
        v = v.reshape(shape3 + (v.shape[-1],))
    return v


def _kernel(scalars_ref, ncol_ref, man_ref, vlin_ref, vang_ref, com_ref,
            rot_ref, im_ref, ii_ref, dv_ref, dw_ref, move_ref,
            out_vlin, out_vang, out_com, out_rot, out_imp,
            *, n_sub, pgs_iters, stab_iters):
    p = man_ref.shape[-1]
    n1 = vlin_ref.shape[-1]

    dt_sub = scalars_ref[0, 0]
    inv_dt_sub = scalars_ref[1, 0]
    erp_inv_dt = scalars_ref[2, 0]
    cfm_factor = scalars_ref[3, 0]
    allowed_lin_err = scalars_ref[4, 0]
    max_corrective_velocity = scalars_ref[5, 0]
    warmstart_coeff = scalars_ref[6, 0]
    num_colors = ncol_ref[0, 0]

    man = man_ref[...]
    f = functools.partial(_mslice, man)
    b1 = f("b1")[0].astype(jnp.int32)
    b2 = f("b2")[0].astype(jnp.int32)
    valid = f("valid")[0] > 0.0
    color = f("color")[0].astype(jnp.int32)

    sb = cc.SolverBodies(
        v_lin=vlin_ref[...], v_ang=vang_ref[...],
        com=com_ref[...], rot=rot_ref[...],
        im=im_ref[...], ii=ii_ref[...],
    )
    dv_inc = dv_ref[...]
    dw_inc = dw_ref[...]
    move = move_ref[...] > 0.0               # [1, N1] rank-2

    # One-hot gather/scatter matrices (built once, VMEM-resident).
    ids = jax.lax.broadcasted_iota(jnp.int32, (p, n1), 1)
    oh1 = (b1[:, None] == ids).astype(jnp.float32)
    oh2 = (b2[:, None] == ids).astype(jnp.float32)

    # In-VMEM constraint generation (contact_with_twist_friction.rs:48-250).
    cons = cc.generate_from(
        b1, b2, valid, color,
        f("normal"), f("point", (4, 3)), f("point_active") > 0.0,
        f("dist"), f("friction")[0], f("restitution")[0],
        sb, f("prev_impulse"), n1 - 1, oh1=oh1, oh2=oh2,
    )
    # Warmstart-cache injection (matched impulses from the previous step).
    cons = cons._replace(
        impulse=f("ws_n") * cons.point_mask,
        tan_impulse=f("ws_t"),
        twist_impulse=f("ws_tw")[0],
    )

    def sweep(cons, sb, use_bias):
        """Gauss-Seidel pass over all colors: color 0 peeled + fori over the
        rest.  The peel is load-bearing — feeding fresh values straight into
        a fori_loop carry crashes Mosaic layout inference; one inlined
        solve_color gives every carried array a loop-compatible layout."""
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


def solve_from_manifolds(sb: cc.SolverBodies, *, b1, b2, valid, color,
                         num_colors, normal, point, point_active, dist,
                         friction, restitution, prev_impulse, ws_n, ws_t,
                         ws_tw, dv_inc, dw_inc, move_mask, dt_sub, inv_dt_sub,
                         erp_inv_dt, cfm_factor, allowed_lin_err,
                         max_corrective_velocity, warmstart_coeff, n_sub: int,
                         pgs_iters: int, stab_iters: int,
                         interpret: bool = False):
    """Contacts-only TGS-soft solve with in-kernel constraint generation.

    Returns (sb, impulse_block [14, P]) where the block rows are
    impulse(4) / impulse_acc(4) / tan(2) / tan_acc(2) / twist / twist_acc —
    the same post-solve values the JAX path leaves on ContactConstraints.
    """
    p = b1.shape[0]
    n1 = sb.v_lin.shape[1]

    def rows(x, r):
        return jnp.asarray(x, jnp.float32).reshape(r, p)

    man = jnp.concatenate([
        rows(b1, 1), rows(b2, 1), rows(valid, 1), rows(color, 1),
        rows(friction, 1), rows(restitution, 1),
        rows(normal, 3), rows(point, 12), rows(point_active, 4),
        rows(dist, 4), rows(prev_impulse, 4),
        rows(ws_n, 4), rows(ws_t, 2), rows(ws_tw, 1),
    ], axis=0)
    assert man.shape[0] == D_MAN

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
        in_specs=[vmem] * 12,
        out_specs=(vmem,) * 5,
        interpret=interpret,
    )(scalars, ncol, man, sb.v_lin, sb.v_ang, sb.com, sb.rot, sb.im, sb.ii,
      dv_inc, dw_inc, move)

    sb = sb._replace(v_lin=vlin, v_ang=vang, com=com, rot=rot)
    return sb, imp


def vmem_feasible(p_lanes: int, n1: int) -> bool:
    """Whether the per-scene working set (packed manifold + two [P, N+1]
    one-hots + generated constraints + intermediates) fits VMEM."""
    est = (p_lanes * (2 * n1 + 4 * D_MAN + 700)) * 4
    return est < 10 * 2**20
