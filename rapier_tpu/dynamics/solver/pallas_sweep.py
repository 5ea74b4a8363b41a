"""VMEM-resident contact solve (generate + TGS-soft sweep) as Pallas kernels.

Why: the pure-JAX solver runs ``substeps x (pgs + stabilization) x colors``
Gauss-Seidel passes; under XLA each pass is a separate while-loop body that
re-reads the full constraint set from HBM (~400 KB/scene at P=512, 60+
passes -> ~25 MB of HBM traffic per scene-step — the round-1 bottleneck;
BASELINE.md).  These kernels stream each scene's MANIFOLD rows (~40 x P)
into VMEM once, build the constraints in-VMEM (contact_constraints.generate
would otherwise round-trip ~160 x P rows through HBM), and run the entire
substep/color loop on-chip.  They reuse the exact `contact_constraints`
generate/update/warmstart/solve_color functions (pure jnp) inside the kernel
so the semantics stay identical to the JAX fallback path (reference behavior:
src/dynamics/solver/velocity_solver.rs:151-211).

Two kernels share that body:

- `_kernel` — one scene per launch, rank-2 [d, P] lanes.  Used for unbatched
  (single-scene) steps.
- `_kernel_folded` — FOLD_S = 8 scenes per grid instance, lanes [S, P] with
  the scene axis on the sublane dimension.  Used for vmapped scene batches
  via a `custom_vmap` rule on the solve: the per-scene kernel under plain
  vmap runs B sequential grid instances of tiny [3, P]-class VPU ops and
  [3, N] one-hot matmuls — latency-bound (measured ~61 ms of a 93 ms step at
  512 scenes).  Folding makes every instruction do 8 scenes of work: the
  gathers/scatters become leading-batch dot_generals ([S, d, N] tables x
  [S, P, N] one-hots — the only batched-matmul form Mosaic accepts).
  S is EXACTLY 8 (the native sublane count): at S in {1, 2, 4} Mosaic
  assigns replicated (-1) sublane offsets to loop-carried [S, P] arrays and
  aborts in indicesToVmemOffset ("Check failed: d >> 32 == 0 (-1 vs 0)").

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
- the folded kernel needs `vmem_limit_bytes` raised past the 16 MiB default
  scoped-vmem limit (measured 16.05 MiB demand already at P=128, N1=64)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rapier_tpu.dynamics.solver import contact_constraints as cc


# ---------------------------------------------------------------------------
# Packed manifold-matrix layout: (field, rows).  [D_MAN, P] f32 per scene.
# ---------------------------------------------------------------------------
_MFIELDS = (
    ("b1", 1), ("b2", 1), ("valid", 1), ("color", 1),
    ("friction", 1), ("restitution", 1),
    ("normal", 3), ("point", 12), ("point_active", 4), ("dist", 4),
    ("prev_impulse", 4), ("ws_n", 4), ("ws_t", 2), ("ws_tw", 1),
    # Endpoint receives-impulses flags: unused by the kernels themselves;
    # the scene-folded vmap rule builds its per-color inverse scatter tables
    # from them (FoldGather.inv12 must only map DYNAMIC bodies).
    ("dyn1", 1), ("dyn2", 1),
)
_MOFF = {}
_D = 0
for _name, _rows in _MFIELDS:
    _MOFF[_name] = (_D, _rows)
    _D += _rows
D_MAN = _D

FOLD_S = 8  # scenes per folded grid instance == native sublane count

_SCALAR_FIELDS = ("dt_sub", "inv_dt_sub", "erp_inv_dt", "cfm_factor",
                  "allowed_lin_err", "max_corrective_velocity",
                  "warmstart_coeff")


# ---------------------------------------------------------------------------
# Legacy single-scene kernel (rank-2 [d, P] lanes).
# ---------------------------------------------------------------------------

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

    # One-hot gather/scatter matrices (built once, VMEM-resident).  Fused
    # [2P, N1] endpoint routing (cc.PairOneHot) when the lane count is
    # tile-aligned: halves the matmul COUNT of every pass, which is what
    # the tiny-matrix routing pays for (fixed MXU issue latency).
    ids = jax.lax.broadcasted_iota(jnp.int32, (p, n1), 1)
    if p % 128 == 0:
        # Rank-2 concat only: Mosaic rejects rank-1 concatenate ("input
        # offsets outside of the first tile").
        oh12 = jnp.concatenate([
            (b1[:, None] == ids).astype(jnp.float32),
            (b2[:, None] == ids).astype(jnp.float32),
        ], axis=0)
        # Single-vreg body tables (N+1 padded to 128 by _legacy_solve):
        # gathers ride tpu.dynamic_gather, scatters the oh12 matmul.
        idx12 = None
        if n1 == 128:
            idx12 = jnp.concatenate([b1[None, :], b2[None, :]], axis=0)
        oh1 = cc.PairOneHot(oh12, p, idx12)
        oh2 = None
    else:
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


def _legacy_solve(sb, man, num_colors, dv_inc, dw_inc, move_mask, scalars_vec,
                  *, n_sub, pgs_iters, stab_iters, interpret):
    """One scene through the rank-2 kernel.  vmap-able the classic way (each
    batch member becomes a sequential grid instance) — the fallback when the
    folded path is VMEM-infeasible."""
    p = man.shape[-1]
    n1 = sb.v_lin.shape[-1]
    f32 = jnp.float32

    # Pad the body axis to a 128-lane multiple: at exactly one vreg (<= 127
    # bodies) the kernel's gathers ride tpu.dynamic_gather instead of the
    # one-hot matmul (PairOneHot.idx12).  Scattering into padded columns is
    # harmless (sliced off below).
    n1p = -(-n1 // 128) * 128
    if n1p != n1:
        def padl(x):
            return jnp.concatenate(
                [x, jnp.zeros(x.shape[:-1] + (n1p - n1,), x.dtype)], axis=-1
            )
        sb = sb._replace(
            v_lin=padl(sb.v_lin), v_ang=padl(sb.v_ang), com=padl(sb.com),
            rot=padl(sb.rot), im=padl(sb.im), ii=padl(sb.ii),
        )
        dv_inc, dw_inc = padl(dv_inc), padl(dw_inc)
        move_mask = padl(move_mask)
    n1_out, n1 = n1, n1p

    scalars = jnp.broadcast_to(
        jnp.concatenate([scalars_vec.astype(f32),
                         jnp.zeros((1,), f32)])[:, None],
        (8, 128),
    )
    ncol = jnp.broadcast_to(
        jnp.asarray(num_colors, jnp.int32).reshape(1, 1), (8, 128)
    )
    move = move_mask.astype(f32).reshape(1, n1)

    kernel = functools.partial(
        _kernel, n_sub=n_sub, pgs_iters=pgs_iters, stab_iters=stab_iters
    )
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

    if n1 != n1_out:
        vlin, vang, com, rot = (
            vlin[:, :n1_out], vang[:, :n1_out], com[:, :n1_out],
            rot[:, :n1_out])
        sb = sb._replace(
            im=sb.im[:, :n1_out], ii=sb.ii[..., :n1_out])
    sb = sb._replace(v_lin=vlin, v_ang=vang, com=com, rot=rot)
    return sb, imp


# ---------------------------------------------------------------------------
# Scene-folded kernel: FOLD_S scenes per grid instance.
# ---------------------------------------------------------------------------

def _integrate_linearized_scene_first(q, w, dt):
    """quat.integrate_linearized for [S, 4, N] / [S, 3, N] (axis-1 slices)."""
    h = dt * 0.5
    hx, hy, hz = w[:, 0:1] * h, w[:, 1:2] * h, w[:, 2:3] * h
    qx, qy, qz, qw = q[:, 0:1], q[:, 1:2], q[:, 2:3], q[:, 3:4]
    rx = qx + hx * qw + hy * qz - hz * qy
    ry = qy - hx * qz + hy * qw + hz * qx
    rz = qz + hx * qy - hy * qx + hz * qw
    rw = qw - hx * qx - hy * qy - hz * qz
    n2 = rx * rx + ry * ry + rz * rz + rw * rw
    inv = 1.0 / jnp.sqrt(jnp.maximum(n2, 1e-24))
    return jnp.concatenate([rx * inv, ry * inv, rz * inv, rw * inv], axis=1)


def _mslice_folded(mat, name, shape3=None):
    """Packed-field slice for the folded [S, D_MAN, P] manifold block,
    returned component-leading [r, S, P] (static row unpack; `+ 0.0`
    launders the slices for Mosaic layout inference)."""
    off, r = _MOFF[name]
    rows = jnp.stack([mat[:, off + j, :] + 0.0 for j in range(r)], axis=0)
    if shape3 is not None:
        rows = rows.reshape(shape3 + rows.shape[1:])
    return rows


def _kernel_folded(scalars_ref, ncol_ref, man_ref, vlin_ref, vang_ref,
                   com_ref, rot_ref, im_ref, ii_ref, dv_ref, dw_ref, move_ref,
                   out_vlin, out_vang, out_com, out_rot, out_imp,
                   *, n_sub, pgs_iters, stab_iters):
    s = man_ref.shape[1]
    n1 = vlin_ref.shape[-1]

    dt_sub = scalars_ref[0, 0]
    inv_dt_sub = scalars_ref[1, 0]
    erp_inv_dt = scalars_ref[2, 0]
    cfm_factor = scalars_ref[3, 0]
    allowed_lin_err = scalars_ref[4, 0]
    max_corrective_velocity = scalars_ref[5, 0]
    warmstart_coeff = scalars_ref[6, 0]
    num_colors = ncol_ref[0, 0]

    man = man_ref[0]                          # [S, D_MAN, P]
    f = functools.partial(_mslice_folded, man)
    b1 = f("b1")[0].astype(jnp.int32)         # [S, P]
    b2 = f("b2")[0].astype(jnp.int32)
    valid = f("valid")[0] > 0.0
    color = f("color")[0].astype(jnp.int32)

    sb = cc.SolverBodies(
        v_lin=vlin_ref[0], v_ang=vang_ref[0],
        com=com_ref[0], rot=rot_ref[0],
        im=im_ref[0], ii=ii_ref[0],           # [S, d, N+1] (ii: [S, 9, N+1])
    )
    dv_inc = dv_ref[0]
    dw_inc = dw_ref[0]
    move = move_ref[0] > 0.0                  # [S, 1, N+1]

    p = b1.shape[-1]
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (s, p, n1), 2)
    oh1 = (b1[:, :, None] == iota_n).astype(jnp.float32)   # [S, P, N+1]
    oh2 = (b2[:, :, None] == iota_n).astype(jnp.float32)

    cons = cc.generate_from(
        b1, b2, valid, color,
        f("normal"), f("point", (4, 3)), f("point_active") > 0.0,
        f("dist"), f("friction")[0], f("restitution")[0],
        sb, f("prev_impulse"), n1 - 1, oh1=oh1, oh2=oh2,
    )
    cons = cons._replace(
        impulse=f("ws_n") * cons.point_mask,
        tan_impulse=f("ws_t"),
        twist_impulse=f("ws_tw")[0],
    )

    def sweep(cons, sb, use_bias):
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
        com = sb.com + jnp.where(move, sb.v_lin * dt_sub, 0.0)
        rot_new = _integrate_linearized_scene_first(sb.rot, sb.v_ang, dt_sub)
        rot = jnp.where(move, rot_new, sb.rot)
        sb = sb._replace(com=com, rot=rot)
        for _stab in range(stab_iters):
            cons, sb = sweep(cons, sb, False)

    out_vlin[0] = sb.v_lin
    out_vang[0] = sb.v_ang
    out_com[0] = sb.com
    out_rot[0] = sb.rot
    out_imp[0, 0:4] = cons.impulse
    out_imp[0, 4:8] = cons.impulse_acc
    out_imp[0, 8:10] = cons.tan_impulse
    out_imp[0, 10:12] = cons.tan_impulse_acc
    out_imp[0, 12] = cons.twist_impulse
    out_imp[0, 13] = cons.twist_impulse_acc


def _run_folded(sb_t, man_t, ncol_max, dv_t, dw_t, move_t, scalars_vec,
                *, g, s, n_sub, pgs_iters, stab_iters, interpret):
    """Launch the folded kernel over grid (g,) with blocks of S scenes.

    sb_t fields: [g, s, d, N+1] (ii [g, s, 9, N+1]); man_t [g, s, D_MAN, P];
    dv/dw [g, s, 3, N+1]; move [g, s, 1, N+1]; ncol_max scalar int32.
    Returns (sb_t fields updated, imp [g, 14, s, P])."""
    n1 = sb_t.v_lin.shape[-1]
    p = man_t.shape[-1]
    f32 = jnp.float32

    scalars = jnp.broadcast_to(
        jnp.concatenate([
            scalars_vec.astype(f32), jnp.zeros((1,), f32)
        ])[:, None], (8, 128),
    )
    ncol = jnp.broadcast_to(
        jnp.asarray(ncol_max, jnp.int32).reshape(1, 1), (8, 128)
    )

    kernel = functools.partial(
        _kernel_folded, n_sub=n_sub, pgs_iters=pgs_iters,
        stab_iters=stab_iters,
    )
    out_shapes = (
        jax.ShapeDtypeStruct((g, s, 3, n1), f32),   # v_lin
        jax.ShapeDtypeStruct((g, s, 3, n1), f32),   # v_ang
        jax.ShapeDtypeStruct((g, s, 3, n1), f32),   # com
        jax.ShapeDtypeStruct((g, s, 4, n1), f32),   # rot
        jax.ShapeDtypeStruct((g, 14, s, p), f32),   # impulse block
    )

    def blk(*shape):
        return pl.BlockSpec((1,) + shape, lambda i: (i,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    rep = pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)
    in_specs = [
        rep, rep,
        blk(s, D_MAN, p),
        blk(s, 3, n1), blk(s, 3, n1), blk(s, 3, n1), blk(s, 4, n1),
        blk(s, 3, n1), blk(s, 9, n1),
        blk(s, 3, n1), blk(s, 3, n1), blk(s, 1, n1),
    ]
    out_specs = (
        blk(s, 3, n1), blk(s, 3, n1), blk(s, 3, n1), blk(s, 4, n1),
        blk(14, s, p),
    )
    vlin, vang, com, rot, imp = pl.pallas_call(
        kernel,
        grid=(g,),
        out_shape=out_shapes,
        in_specs=in_specs,
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(scalars, ncol, man_t, sb_t.v_lin, sb_t.v_ang, sb_t.com, sb_t.rot,
      sb_t.im, sb_t.ii, dv_t, dw_t, move_t)
    return sb_t._replace(v_lin=vlin, v_ang=vang, com=com, rot=rot), imp


# ---------------------------------------------------------------------------
# Scene-folded GATHER kernel: S = 8 scenes on the SUBLANE axis, component-
# leading tables [d, S, N1p] with N1p = 128 (one vreg per component row).
# Gathers are per-row-independent tpu.dynamic_gather ops covering all 8
# scenes each; per-color scatters are INVERSE gathers via precomputed
# conflict-free tables (cc.FoldGather); warmstart and the static overflow
# color use a batched one-hot dot.  This kills both costs that made the
# round-2 folded kernel slower than the per-scene grid: no [S, d, P] <->
# [d, S, P] repacks (the layout IS component-leading) and no per-pass
# per-scene matmuls.
# ---------------------------------------------------------------------------


def _kernel_fold_gather(scalars_ref, ncol_ref, man_ref, vlin_ref, vang_ref,
                        com_ref, rot_ref, im_ref, ii_ref, dv_ref, dw_ref,
                        move_ref, inv_ref, ohb_ref,
                        out_vlin, out_vang, out_com, out_rot, out_imp,
                        *, n_sub, pgs_iters, stab_iters, max_colors):
    dt_sub = scalars_ref[0, 0]
    inv_dt_sub = scalars_ref[1, 0]
    erp_inv_dt = scalars_ref[2, 0]
    cfm_factor = scalars_ref[3, 0]
    allowed_lin_err = scalars_ref[4, 0]
    max_corrective_velocity = scalars_ref[5, 0]
    warmstart_coeff = scalars_ref[6, 0]
    num_colors = ncol_ref[0, 0]

    man = man_ref[0]                          # [D_MAN, S, P]
    p = man.shape[-1]

    def f(name, shape3=None):
        off, r = _MOFF[name]
        v = man[off:off + r] + 0.0            # [r, S, P]
        if shape3 is not None:
            v = v.reshape(shape3 + v.shape[1:])
        return v

    b1 = f("b1")[0].astype(jnp.int32)         # [S, P]
    b2 = f("b2")[0].astype(jnp.int32)
    valid = f("valid")[0] > 0.0
    color = f("color")[0].astype(jnp.int32)

    sb = cc.SolverBodies(
        v_lin=vlin_ref[0], v_ang=vang_ref[0], com=com_ref[0],
        rot=rot_ref[0], im=im_ref[0], ii=ii_ref[0],   # [d, S, 128]
    )
    dv_inc = dv_ref[0]
    dw_inc = dw_ref[0]
    move = move_ref[0] > 0.0                  # [1, S, 128]

    fg = cc.FoldGather(idx1=b1, idx2=b2, inv12=inv_ref[0],
                       oh12_b=ohb_ref[0], p=p)
    fg_over = fg._replace(inv12=None)

    cons = cc.generate_from(
        b1, b2, valid, color,
        f("normal"), f("point", (4, 3)), f("point_active") > 0.0,
        f("dist"), f("friction")[0], f("restitution")[0],
        sb, f("prev_impulse"), 0, oh1=fg, oh2=None,
    )
    cons = cons._replace(
        impulse=f("ws_n") * cons.point_mask,
        tan_impulse=f("ws_t"),
        twist_impulse=f("ws_tw")[0],
    )

    def sweep(cons, sb, use_bias):
        # Peel color 0 (Mosaic layout seeding), then fori over the
        # remaining conflict-free colors (inverse-gather scatters), then
        # ONE static pass for the Luby overflow color max_colors-1 (the
        # only color that can self-conflict; sum-scatter, mask empty in
        # the common no-overflow case).
        cons, sb = cc.solve_color(cons, sb, jnp.int32(0), fg, None,
                                  use_bias=use_bias)

        def body(ci, carry):
            imp, tanimp, twimp, vlin, vang = carry
            c2 = cons._replace(
                impulse=imp, tan_impulse=tanimp, twist_impulse=twimp)
            s2 = sb._replace(v_lin=vlin, v_ang=vang)
            c3, s3 = cc.solve_color(c2, s2, ci, fg, None, use_bias=use_bias)
            return (c3.impulse, c3.tan_impulse, c3.twist_impulse,
                    s3.v_lin, s3.v_ang)
        init = (cons.impulse, cons.tan_impulse, cons.twist_impulse,
                sb.v_lin, sb.v_ang)
        imp, tanimp, twimp, vlin, vang = jax.lax.fori_loop(
            1, jnp.minimum(num_colors, max_colors - 1), body, init)
        cons = cons._replace(impulse=imp, tan_impulse=tanimp,
                             twist_impulse=twimp)
        sb = sb._replace(v_lin=vlin, v_ang=vang)
        cons, sb = cc.solve_color(cons, sb, jnp.int32(max_colors - 1),
                                  fg_over, None, use_bias=use_bias)
        return cons, sb

    for _substep in range(n_sub):
        sb = sb._replace(v_lin=sb.v_lin + dv_inc, v_ang=sb.v_ang + dw_inc)
        cons = cc.update(
            cons, sb, fg, None,
            cfm_factor=cfm_factor, inv_dt=inv_dt_sub,
            allowed_lin_err=allowed_lin_err, erp_inv_dt=erp_inv_dt,
            max_corrective_velocity=max_corrective_velocity,
            warmstart_coeff=warmstart_coeff,
        )
        sb = cc.warmstart(cons, sb, fg, None)
        for _pgs in range(pgs_iters):
            cons, sb = sweep(cons, sb, True)
        com = sb.com + jnp.where(move, sb.v_lin * dt_sub, 0.0)
        rot_new = _integrate_linearized_rank2(sb.rot, sb.v_ang, dt_sub)
        rot = jnp.where(move, rot_new, sb.rot)
        sb = sb._replace(com=com, rot=rot)
        for _stab in range(stab_iters):
            cons, sb = sweep(cons, sb, False)

    out_vlin[0] = sb.v_lin
    out_vang[0] = sb.v_ang
    out_com[0] = sb.com
    out_rot[0] = sb.rot
    out_imp[0, 0:4] = cons.impulse
    out_imp[0, 4:8] = cons.impulse_acc
    out_imp[0, 8:10] = cons.tan_impulse
    out_imp[0, 10:12] = cons.tan_impulse_acc
    out_imp[0, 12] = cons.twist_impulse
    out_imp[0, 13] = cons.twist_impulse_acc


def _run_fold_gather(sb_t, man_t, ncol_max, dv_t, dw_t, move_t, inv_t, ohb_t,
                     scalars_vec, *, g, s, n_sub, pgs_iters, stab_iters,
                     max_colors, interpret):
    """Launch the folded-gather kernel over grid (g,).

    sb_t fields: [g, d, s, 128] (ii [g, 9, s, 128]); man_t
    [g, D_MAN, s, P]; dv/dw [g, 3, s, 128]; move [g, 1, s, 128]; inv_t
    [g, MC, s, 128] int32; ohb_t [g, s, 2P, 128] f32."""
    n1 = sb_t.v_lin.shape[-1]
    p = man_t.shape[-1]
    f32 = jnp.float32
    mc = max_colors

    scalars = jnp.broadcast_to(
        jnp.concatenate([scalars_vec.astype(f32),
                         jnp.zeros((1,), f32)])[:, None], (8, 128))
    ncol = jnp.broadcast_to(
        jnp.asarray(ncol_max, jnp.int32).reshape(1, 1), (8, 128))

    kernel = functools.partial(
        _kernel_fold_gather, n_sub=n_sub, pgs_iters=pgs_iters,
        stab_iters=stab_iters, max_colors=max_colors)
    out_shapes = (
        jax.ShapeDtypeStruct((g, 3, s, n1), f32),
        jax.ShapeDtypeStruct((g, 3, s, n1), f32),
        jax.ShapeDtypeStruct((g, 3, s, n1), f32),
        jax.ShapeDtypeStruct((g, 4, s, n1), f32),
        jax.ShapeDtypeStruct((g, 14, s, p), f32),
    )

    def blk(*shape):
        return pl.BlockSpec((1,) + shape, lambda i: (i,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    rep = pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)
    in_specs = [
        rep, rep,
        blk(D_MAN, s, p),
        blk(3, s, n1), blk(3, s, n1), blk(3, s, n1), blk(4, s, n1),
        blk(3, s, n1), blk(9, s, n1),
        blk(3, s, n1), blk(3, s, n1), blk(1, s, n1),
        blk(mc, s, n1), blk(s, 2 * p, n1),
    ]
    out_specs = (
        blk(3, s, n1), blk(3, s, n1), blk(3, s, n1), blk(4, s, n1),
        blk(14, s, p),
    )
    vlin, vang, com, rot, imp = pl.pallas_call(
        kernel,
        grid=(g,),
        out_shape=out_shapes,
        in_specs=in_specs,
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(scalars, ncol, man_t, sb_t.v_lin, sb_t.v_ang, sb_t.com, sb_t.rot,
      sb_t.im, sb_t.ii, dv_t, dw_t, move_t, inv_t, ohb_t)
    return sb_t._replace(v_lin=vlin, v_ang=vang, com=com, rot=rot), imp


def fold_gather_feasible(p_lanes: int, n1: int) -> bool:
    """The folded-gather vmap path needs single-vreg body tables (<= 127
    bodies after the sentinel) and tile-aligned lanes."""
    import os
    if os.environ.get("RAPIER_TPU_FOLD2", "1") != "1":
        return False
    if p_lanes % 128 != 0 or n1 > 128:
        return False
    # VMEM estimate: manifold + tables + oh12_b + constraints + slack.
    est = FOLD_S * (p_lanes * (4 * D_MAN + 800) + 2 * p_lanes * 128) * 4
    return est < 60 * 2**20


def fold_feasible(p_lanes: int, n1: int) -> bool:
    """Whether the vmap rule uses the folded kernel.  OFF by default:
    measured at B=512/P=512/N1=65 the folded solve is ~40% SLOWER than the
    vmapped rank-2 kernel (68.6 ms vs 49.8 ms) — Mosaic unrolls the
    leading-batch dot_generals into S sequential small matmuls AND every
    gather/scatter repacks [S, d, P] <-> [d, S, P] (sublane relayouts), so
    the per-pass op count grows more than the 8x-wider elementwise ops save.
    The kernel is kept behind RAPIER_TPU_FOLD=1 as a measured baseline for
    future sublane-packing work (the 2.7x tile-count win is real; the
    gather plumbing is what eats it)."""
    import os
    if os.environ.get("RAPIER_TPU_FOLD", "0") != "1":
        return False
    est = FOLD_S * p_lanes * (2 * n1 + 4 * D_MAN + 700) * 4
    return est < 24 * 2**20


@functools.lru_cache(maxsize=None)
def _folded_solver(n_sub: int, pgs_iters: int, stab_iters: int,
                   interpret: bool, max_colors: int = 16):
    """custom_vmap solve: the unbatched call runs the rank-2 single-scene
    kernel; the vmap rule folds the scene batch into grid blocks of FOLD_S
    scenes (padding the batch up to a multiple of 8) through the
    folded-GATHER kernel (component-leading [d, S, 128] tables,
    tpu.dynamic_gather routing — see _kernel_fold_gather)."""
    from jax.custom_batching import custom_vmap

    static = dict(n_sub=n_sub, pgs_iters=pgs_iters, stab_iters=stab_iters,
                  interpret=interpret)

    @custom_vmap
    def solve(sb, man, num_colors, dv_inc, dw_inc, move, scalars_vec):
        return _legacy_solve(sb, man, num_colors, dv_inc, dw_inc, move,
                             scalars_vec, **static)

    @solve.def_vmap
    def solve_vmap(axis_size, in_batched, sb, man, num_colors, dv_inc,
                   dw_inc, move, scalars_vec):
        b = axis_size
        # Scalars come from params: unbatched in every real call pattern.
        assert not jax.tree_util.tree_all(
            jax.tree.map(bool, in_batched[6])
        ), "folded solver: per-scene SimParams scalars unsupported"

        def bcast(x, is_b):
            return x if is_b else jnp.broadcast_to(x[None], (b,) + x.shape)

        sb_b = jax.tree.map(bcast, sb, in_batched[0])
        man_b = bcast(man, in_batched[1])
        ncol_b = bcast(num_colors, in_batched[2])
        dv_b = bcast(dv_inc, in_batched[3])
        dw_b = bcast(dw_inc, in_batched[4])
        move_b = bcast(move, in_batched[5])

        p_lanes = man_b.shape[-1]
        n1 = sb_b.v_lin.shape[-1]

        if not interpret and fold_gather_feasible(p_lanes, n1):
            s = FOLD_S
            f32 = jnp.float32
            mc = max_colors
            n1p = 128
            if b % s:
                pad = s - b % s

                def padb(x):
                    return jnp.concatenate(
                        [x, jnp.repeat(x[-1:], pad, axis=0)], axis=0)
                sb_b = jax.tree.map(padb, sb_b)
                man_b, ncol_b, dv_b, dw_b, move_b = (
                    padb(man_b), padb(ncol_b), padb(dv_b), padb(dw_b),
                    padb(move_b))
            bp = man_b.shape[0]
            g = bp // s

            def padl(x):
                if x.shape[-1] == n1p:
                    return x
                return jnp.concatenate([
                    x, jnp.zeros(x.shape[:-1] + (n1p - x.shape[-1],),
                                 x.dtype)], axis=-1)

            def fold_t(x):
                """[Bp, d, L] -> [G, d, S, L] (scenes onto sublanes)."""
                return x.reshape(g, s, x.shape[1], x.shape[2]).transpose(
                    0, 2, 1, 3)

            sb_t = cc.SolverBodies(
                v_lin=fold_t(padl(sb_b.v_lin)),
                v_ang=fold_t(padl(sb_b.v_ang)),
                com=fold_t(padl(sb_b.com)), rot=fold_t(padl(sb_b.rot)),
                im=fold_t(padl(sb_b.im)),
                ii=fold_t(padl(sb_b.ii.reshape(bp, 9, n1))),
            )
            dv_t = fold_t(padl(dv_b))
            dw_t = fold_t(padl(dw_b))
            move_t = fold_t(padl(move_b.astype(f32)[:, None, :]))
            man_t = fold_t(man_b)

            # Per-color inverse scatter tables + the batched scatter one-hot
            # (cc.FoldGather docstring).  Colors < mc-1 are conflict-free by
            # Luby construction, so each dynamic body maps to at most one
            # lane endpoint; the overflow color mc-1 is excluded (its pass
            # sum-scatters through oh12_b).
            def row(name):
                return man_b[:, _MOFF[name][0], :]

            b1i = row("b1").astype(jnp.int32)
            b2i = row("b2").astype(jnp.int32)
            colr = row("color").astype(jnp.int32)
            validr = row("valid") > 0
            dyn1r = row("dyn1") > 0
            dyn2r = row("dyn2") > 0
            ids_mc = jnp.arange(mc)
            ids_n = jnp.arange(n1p)
            lane1 = jnp.arange(p_lanes, dtype=f32) + 1.0
            col_ok = (
                validr[..., None] & (colr[..., None] == ids_mc)
                & (ids_mc < mc - 1)
            )                                               # [Bp, P, MC]
            oh_b1 = (b1i[..., None] == ids_n).astype(f32)   # [Bp, P, 128]
            oh_b2 = (b2i[..., None] == ids_n).astype(f32)
            w1 = (col_ok & dyn1r[..., None]).astype(f32)
            w2 = (col_ok & dyn2r[..., None]).astype(f32)
            cnt1 = jnp.einsum("bpc,bpn->bcn", w1, oh_b1)
            idx1 = jnp.einsum("bpc,bpn->bcn", w1 * lane1[None, :, None],
                              oh_b1)
            cnt2 = jnp.einsum("bpc,bpn->bcn", w2, oh_b2)
            idx2 = jnp.einsum(
                "bpc,bpn->bcn", w2 * (lane1 + p_lanes)[None, :, None], oh_b2)
            inv12 = jnp.where(
                cnt1 > 0, idx1 - 1.0,
                jnp.where(cnt2 > 0, idx2 - 1.0, 2.0 * p_lanes)
            ).astype(jnp.int32)                             # [Bp, MC, 128]
            inv_t = fold_t(inv12)
            idx12 = jnp.concatenate([b1i, b2i], axis=1)     # [Bp, 2P]
            ohb = (idx12[..., None] == ids_n).astype(f32)   # [Bp, 2P, 128]
            ohb_t = ohb.reshape(g, s, 2 * p_lanes, n1p)

            ncol_max = jnp.max(ncol_b)
            sb2, imp = _run_fold_gather(
                sb_t, man_t, ncol_max, dv_t, dw_t, move_t, inv_t, ohb_t,
                scalars_vec, g=g, s=s, max_colors=mc, **static)

            def unfold_t(x):
                """[G, d, S, L] -> [Bp, d, L]."""
                return x.transpose(0, 2, 1, 3).reshape(bp, x.shape[1],
                                                       x.shape[3])

            sb_out = sb_b._replace(
                v_lin=unfold_t(sb2.v_lin)[:b, :, :n1],
                v_ang=unfold_t(sb2.v_ang)[:b, :, :n1],
                com=unfold_t(sb2.com)[:b, :, :n1],
                rot=unfold_t(sb2.rot)[:b, :, :n1],
                im=sb_b.im[:b], ii=sb_b.ii[:b],
            )
            imp_out = unfold_t(imp)[:b]
            out_batched = (jax.tree.map(lambda _: True, sb_out), True)
            return (sb_out, imp_out), out_batched

        if not fold_feasible(p_lanes, n1):
            # Classic path: B sequential grid instances of the rank-2 kernel.
            sb_out, imp_out = jax.vmap(
                functools.partial(_legacy_solve, **static),
                in_axes=(0, 0, 0, 0, 0, 0, None),
            )(sb_b, man_b, ncol_b, dv_b, dw_b, move_b, scalars_vec)
            out_batched = (jax.tree.map(lambda _: True, sb_out), True)
            return (sb_out, imp_out), out_batched

        s = FOLD_S
        if b % s:
            pad = s - b % s

            def padb(x):
                return jnp.concatenate(
                    [x, jnp.repeat(x[-1:], pad, axis=0)], axis=0)
            sb_b = jax.tree.map(padb, sb_b)
            man_b, ncol_b, dv_b, dw_b, move_b = (
                padb(man_b), padb(ncol_b), padb(dv_b), padb(dw_b),
                padb(move_b))
        bp = man_b.shape[0]
        g = bp // s

        def fold(x):
            return x.reshape((g, s) + x.shape[1:])
        sb_t = cc.SolverBodies(
            v_lin=fold(sb_b.v_lin), v_ang=fold(sb_b.v_ang),
            com=fold(sb_b.com), rot=fold(sb_b.rot), im=fold(sb_b.im),
            ii=fold(sb_b.ii.reshape(bp, 9, n1)),
        )
        ncol_max = jnp.max(ncol_b)
        sb2, imp = _run_folded(
            sb_t, fold(man_b), ncol_max, fold(dv_b), fold(dw_b),
            fold(move_b.astype(jnp.float32)[:, None, :]), scalars_vec,
            g=g, s=s, **static,
        )

        def unfold(x):
            return x.reshape((bp,) + x.shape[2:])[:b]
        sb_out = sb_b._replace(
            v_lin=unfold(sb2.v_lin), v_ang=unfold(sb2.v_ang),
            com=unfold(sb2.com), rot=unfold(sb2.rot),
            im=sb_b.im[:b], ii=sb_b.ii[:b],
        )
        imp_out = jnp.transpose(imp, (0, 2, 1, 3)).reshape(
            bp, 14, p_lanes)[:b]
        out_batched = (jax.tree.map(lambda _: True, sb_out), True)
        return (sb_out, imp_out), out_batched

    return solve


def solve_from_manifolds(sb: cc.SolverBodies, *, b1, b2, valid, color,
                         num_colors, normal, point, point_active, dist,
                         friction, restitution, prev_impulse, ws_n, ws_t,
                         ws_tw, dv_inc, dw_inc, move_mask, dt_sub, inv_dt_sub,
                         erp_inv_dt, cfm_factor, allowed_lin_err,
                         max_corrective_velocity, warmstart_coeff, n_sub: int,
                         pgs_iters: int, stab_iters: int,
                         interpret: bool = False,
                         dyn1=None, dyn2=None, max_colors: int = 16):
    """Contacts-only TGS-soft solve with in-kernel constraint generation.

    Returns (sb, impulse_block [14, P]) where the block rows are
    impulse(4) / impulse_acc(4) / tan(2) / tan_acc(2) / twist / twist_acc —
    the same post-solve values the JAX path leaves on ContactConstraints.

    This function is the vmap seam: called per-scene inside a vmapped step,
    its custom_vmap rule folds the scene batch into grid blocks of FOLD_S
    scenes (see _kernel_folded) instead of B sequential single-scene
    instances.
    """
    p = b1.shape[0]

    def rows(x, r):
        return jnp.asarray(x, jnp.float32).reshape(r, p)

    if dyn1 is None:
        dyn1 = jnp.zeros((p,), bool)
    if dyn2 is None:
        dyn2 = jnp.zeros((p,), bool)
    man = jnp.concatenate([
        rows(b1, 1), rows(b2, 1), rows(valid, 1), rows(color, 1),
        rows(friction, 1), rows(restitution, 1),
        rows(normal, 3), rows(point, 12), rows(point_active, 4),
        rows(dist, 4), rows(prev_impulse, 4),
        rows(ws_n, 4), rows(ws_t, 2), rows(ws_tw, 1),
        rows(dyn1, 1), rows(dyn2, 1),
    ], axis=0)
    assert man.shape[0] == D_MAN

    scalars_vec = jnp.stack([
        jnp.asarray(dt_sub, jnp.float32),
        jnp.asarray(inv_dt_sub, jnp.float32),
        jnp.asarray(erp_inv_dt, jnp.float32),
        jnp.asarray(cfm_factor, jnp.float32),
        jnp.asarray(allowed_lin_err, jnp.float32),
        jnp.asarray(max_corrective_velocity, jnp.float32),
        jnp.asarray(warmstart_coeff, jnp.float32),
    ])

    solver = _folded_solver(
        int(n_sub), int(pgs_iters), int(stab_iters), bool(interpret),
        int(max_colors),
    )
    return solver(
        sb, man, jnp.asarray(num_colors, jnp.int32), dv_inc, dw_inc,
        move_mask, scalars_vec,
    )


def vmem_feasible(p_lanes: int, n1: int) -> bool:
    """Whether the per-scene working set (packed manifold + two [P, N+1]
    one-hots + generated constraints + intermediates) fits VMEM."""
    est = (p_lanes * (2 * n1 + 4 * D_MAN + 700)) * 4
    return est < 10 * 2**20
