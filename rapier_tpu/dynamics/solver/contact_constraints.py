"""Contact constraints: TGS-soft sequential impulses over colored lanes.

Faithful behavioral port of the reference's default 3D contact constraint
(twist friction model): generation mirrors
src/dynamics/solver/contact_constraint/contact_with_twist_friction.rs:48-250,
per-substep update mirrors :251-330, and the solve mirrors
contact_constraint_element.rs (normal part :263-287, tangent 2D-coupled part
:161-203, twist part :31-46) — recast as batched lane arrays with masked
gather/scatter instead of SIMD lanes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rapier_tpu.math import quat


class SolverBodies(NamedTuple):
    """SoA scratch bodies (reference solver_body.rs:75), sized N+1: the last
    slot is a zeroed sentinel absorbing static/dominant endpoints."""

    v_lin: jax.Array  # [N+1, 3]
    v_ang: jax.Array  # [N+1, 3]
    com: jax.Array    # [N+1, 3]  pose translation at center of mass
    rot: jax.Array    # [N+1, 4]
    im: jax.Array     # [N+1, 3]  per-axis effective inverse mass
    ii: jax.Array     # [N+1, 3, 3] effective world inverse inertia


class ContactConstraints(NamedTuple):
    """Per-manifold constraint lanes [P] with up to 4 points."""

    b1: jax.Array            # [P] solver body index (sentinel = static)
    b2: jax.Array            # [P]
    valid: jax.Array         # [P] bool
    color: jax.Array         # [P] int32
    dir1: jax.Array          # [P, 3] force direction on body1 (= -normal)
    tangent1: jax.Array      # [P, 3]
    im1: jax.Array           # [P, 3]
    im2: jax.Array           # [P, 3]
    limit: jax.Array         # [P] friction coefficient
    point_mask: jax.Array    # [P, 4] bool
    # normal parts
    torque_dir1: jax.Array       # [P, 4, 3]
    torque_dir2: jax.Array       # [P, 4, 3]
    ii_torque_dir1: jax.Array    # [P, 4, 3]
    ii_torque_dir2: jax.Array    # [P, 4, 3]
    r: jax.Array                 # [P, 4] projected mass (1/denom)
    local_p1: jax.Array          # [P, 4, 3] anchors in body1 COM frame
    local_p2: jax.Array          # [P, 4, 3]
    dist0: jax.Array             # [P, 4] distance at generation
    normal_vel_rhs: jax.Array    # [P, 4] restitution rhs (wo bias)
    rhs: jax.Array               # [P, 4]
    rhs_wo_bias: jax.Array       # [P, 4]
    impulse: jax.Array           # [P, 4]
    impulse_acc: jax.Array       # [P, 4]
    # manifold-level friction (twist model)
    tan_torque_dir1: jax.Array      # [P, 2, 3]
    tan_torque_dir2: jax.Array      # [P, 2, 3]
    tan_ii_torque_dir1: jax.Array   # [P, 2, 3]
    tan_ii_torque_dir2: jax.Array   # [P, 2, 3]
    tan_r: jax.Array                # [P, 3] (r0, r1, r01 coupling)
    tan_rhs: jax.Array              # [P, 2]
    tan_rhs_wo_bias: jax.Array      # [P, 2]
    tan_impulse: jax.Array          # [P, 2]
    tan_impulse_acc: jax.Array      # [P, 2]
    local_fc1: jax.Array            # [P, 3] friction center anchor (body1)
    local_fc2: jax.Array            # [P, 3]
    twist_ii_dir1: jax.Array        # [P, 3]
    twist_ii_dir2: jax.Array        # [P, 3]
    twist_r: jax.Array              # [P]
    twist_dists: jax.Array          # [P, 4]
    twist_impulse: jax.Array        # [P]
    twist_impulse_acc: jax.Array    # [P]
    cfm_factor: jax.Array           # scalar (set by update)


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def compute_tangent_directions(dir1, linvel1, linvel2):
    """Reference compute_tangent_contact_directions (contact_constraint/mod.rs):
    tangent along relative linear velocity projected on the contact plane,
    orthonormal fallback below 1e-4."""
    rel = linvel1 - linvel2
    tan = rel - dir1 * _dot(dir1, rel)[..., None]
    norm = jnp.linalg.norm(tan, axis=-1, keepdims=True)
    tan_n = tan / jnp.maximum(norm, 1e-12)
    # Orthonormal fallback.
    a = jnp.cross(dir1, jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), dir1.shape))
    b = jnp.cross(dir1, jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), dir1.shape))
    fb = jnp.where(
        (jnp.linalg.norm(a, axis=-1, keepdims=True) > 1e-6), a, b
    )
    fb = fb / jnp.maximum(jnp.linalg.norm(fb, axis=-1, keepdims=True), 1e-12)
    t1 = jnp.where(norm < 1e-4, fb, tan_n)
    return t1


def generate(man, sb: SolverBodies, prev_impulse, color, n_bodies: int):
    """Build constraint lanes from a ManifoldBatch.

    Args:
      man: geometry.dispatch.ManifoldBatch.
      sb: SolverBodies (N+1).
      prev_impulse: [P, 4] total normal impulse of the matched contact from the
        previous step (0 for new contacts) — drives is_bouncy
        (reference contact_pair.rs:576-585).
      color: [P] int32 lane colors.
    """
    sent = n_bodies
    b1 = jnp.where((man.body1 >= 0) & (man.rel_dominance <= 0), man.body1, sent)
    b2 = jnp.where((man.body2 >= 0) & (man.rel_dominance >= 0), man.body2, sent)

    v1l, w1 = sb.v_lin[b1], sb.v_ang[b1]
    v2l, w2 = sb.v_lin[b2], sb.v_ang[b2]
    com1, rot1 = sb.com[b1], sb.rot[b1]
    com2, rot2 = sb.com[b2], sb.rot[b2]
    im1, im2 = sb.im[b1], sb.im[b2]
    ii1, ii2 = sb.ii[b1], sb.ii[b2]

    dir1 = -man.normal
    tangent1 = compute_tangent_directions(dir1, v1l, v2l)
    tangent2 = jnp.cross(dir1, tangent1)

    pts = man.point            # [P, 4, 3]
    pmask = man.point_active   # [P, 4]
    npts = jnp.sum(pmask.astype(jnp.float32), axis=-1)
    inv_np = 1.0 / jnp.maximum(npts, 1.0)

    dp1 = pts - com1[:, None, :]
    dp2 = pts - com2[:, None, :]
    vel1 = v1l[:, None, :] + jnp.cross(w1[:, None, :], dp1)
    vel2 = v2l[:, None, :] + jnp.cross(w2[:, None, :], dp2)

    td1 = jnp.cross(dp1, dir1[:, None, :])
    td2 = jnp.cross(dp2, -dir1[:, None, :])
    iitd1 = jnp.einsum("pij,pkj->pki", ii1, td1)
    iitd2 = jnp.einsum("pij,pkj->pki", ii2, td2)

    imsum = im1 + im2
    denom = (
        _dot(dir1, imsum * dir1)[:, None]
        + _dot(iitd1, td1)
        + _dot(iitd2, td2)
    )
    r = 1.0 / jnp.maximum(denom, 1e-12)

    proj_vel = _dot(vel1 - vel2, dir1[:, None, :])
    is_new = prev_impulse == 0.0
    is_bouncy = jnp.where(
        is_new, (man.restitution[:, None] > 0.0), (man.restitution[:, None] >= 1.0)
    ).astype(jnp.float32)
    normal_vel_rhs = is_bouncy * man.restitution[:, None] * proj_vel

    local_p1 = quat.inv_rotate(rot1[:, None, :], pts - com1[:, None, :])
    local_p2 = quat.inv_rotate(rot2[:, None, :], pts - com2[:, None, :])

    # Friction center (twist model).
    w_pts = jnp.where(pmask[..., None], pts, 0.0)
    fc = jnp.sum(w_pts, axis=1) * inv_np[:, None]
    local_fc1 = quat.inv_rotate(rot1, fc - com1)
    local_fc2 = quat.inv_rotate(rot2, fc - com2)
    twist_dists = jnp.where(
        pmask, jnp.linalg.norm(fc[:, None, :] - pts, axis=-1), 0.0
    )

    dfp1 = fc - com1
    dfp2 = fc - com2
    tans = jnp.stack([tangent1, tangent2], axis=1)     # [P, 2, 3]
    ttd1 = jnp.cross(dfp1[:, None, :], tans)
    ttd2 = jnp.cross(dfp2[:, None, :], -tans)
    tiitd1 = jnp.einsum("pij,pkj->pki", ii1, ttd1)
    tiitd2 = jnp.einsum("pij,pkj->pki", ii2, ttd2)
    tr = (
        _dot(tans, imsum[:, None, :] * tans)
        + _dot(tiitd1, ttd1)
        + _dot(tiitd2, ttd2)
    )   # [P, 2] raw denominators (3D keeps them un-inverted)
    tr_coupling = 2.0 * (
        _dot(tiitd1[:, 0], ttd1[:, 1]) + _dot(tiitd2[:, 0], ttd2[:, 1])
    )
    tan_r = jnp.concatenate([tr, tr_coupling[:, None]], axis=-1)

    twist_ii1 = jnp.einsum("pij,pj->pi", ii1, dir1)
    twist_ii2 = jnp.einsum("pij,pj->pi", ii2, -dir1)
    twist_r = 1.0 / jnp.maximum(
        _dot(twist_ii1, dir1) + _dot(twist_ii2, -dir1), 1e-12
    )

    p = pts.shape[0]
    zeros_p2 = jnp.zeros((p, 2))
    return ContactConstraints(
        b1=b1, b2=b2, valid=man.solver_pair, color=color,
        dir1=dir1, tangent1=tangent1, im1=im1, im2=im2,
        limit=man.friction, point_mask=pmask,
        torque_dir1=td1, torque_dir2=td2,
        ii_torque_dir1=iitd1, ii_torque_dir2=iitd2,
        r=r, local_p1=local_p1, local_p2=local_p2,
        dist0=man.dist, normal_vel_rhs=normal_vel_rhs,
        rhs=jnp.zeros_like(r), rhs_wo_bias=jnp.zeros_like(r),
        impulse=jnp.zeros_like(r),  # warmstart impulses folded in by caller
        impulse_acc=jnp.zeros_like(r),
        tan_torque_dir1=ttd1, tan_torque_dir2=ttd2,
        tan_ii_torque_dir1=tiitd1, tan_ii_torque_dir2=tiitd2,
        tan_r=tan_r, tan_rhs=zeros_p2, tan_rhs_wo_bias=zeros_p2,
        tan_impulse=zeros_p2, tan_impulse_acc=zeros_p2,
        local_fc1=local_fc1, local_fc2=local_fc2,
        twist_ii_dir1=twist_ii1, twist_ii_dir2=twist_ii2,
        twist_r=twist_r, twist_dists=twist_dists,
        twist_impulse=jnp.zeros((p,)), twist_impulse_acc=jnp.zeros((p,)),
        cfm_factor=jnp.float32(1.0),
    )


def update(c: ContactConstraints, sb: SolverBodies, *, cfm_factor, inv_dt,
           allowed_lin_err, erp_inv_dt, max_corrective_velocity,
           warmstart_coeff) -> ContactConstraints:
    """Per-substep soft-constraint rhs recompute from current solver poses
    (reference contact_with_twist_friction.rs:251-330).  All rate arguments
    are for the SUBSTEP dt."""
    com1, rot1 = sb.com[c.b1], sb.rot[c.b1]
    com2, rot2 = sb.com[c.b2], sb.rot[c.b2]

    p1 = com1[:, None, :] + quat.rotate(rot1[:, None, :], c.local_p1)
    p2 = com2[:, None, :] + quat.rotate(rot2[:, None, :], c.local_p2)
    dist = c.dist0 + _dot(p1 - p2, c.dir1[:, None, :])

    rhs_wo_bias = c.normal_vel_rhs + jnp.maximum(dist, 0.0) * inv_dt
    rhs_bias = jnp.clip(
        (dist + allowed_lin_err) * erp_inv_dt, -max_corrective_velocity, 0.0
    )
    rhs = rhs_wo_bias + rhs_bias

    impulse_acc = c.impulse_acc + c.impulse
    impulse = c.impulse * warmstart_coeff

    # Tangent rhs from friction-center drift.
    fc1 = com1 + quat.rotate(rot1, c.local_fc1)
    fc2 = com2 + quat.rotate(rot2, c.local_fc2)
    tangent2 = jnp.cross(c.dir1, c.tangent1)
    tans = jnp.stack([c.tangent1, tangent2], axis=1)
    bias_t = _dot((fc1 - fc2)[:, None, :], tans) * inv_dt
    tan_rhs = c.tan_rhs_wo_bias + bias_t
    tan_impulse_acc = c.tan_impulse_acc + c.tan_impulse
    tan_impulse = c.tan_impulse * warmstart_coeff
    twist_impulse_acc = c.twist_impulse_acc + c.twist_impulse
    twist_impulse = c.twist_impulse * warmstart_coeff

    return c._replace(
        rhs=rhs, rhs_wo_bias=rhs_wo_bias,
        impulse=impulse, impulse_acc=impulse_acc,
        tan_rhs=tan_rhs, tan_impulse=tan_impulse,
        tan_impulse_acc=tan_impulse_acc,
        twist_impulse=twist_impulse, twist_impulse_acc=twist_impulse_acc,
        cfm_factor=jnp.asarray(cfm_factor, jnp.float32),
    )


def warmstart(c: ContactConstraints, sb: SolverBodies) -> SolverBodies:
    """Apply cached impulses to body velocities.  Pure accumulation, so a
    single scatter-add over ALL lanes is exact (no coloring needed)."""
    act = (c.valid[:, None] & c.point_mask).astype(jnp.float32)
    imp = c.impulse * act                                   # [P, 4]
    imp_sum = jnp.sum(imp, axis=-1)                          # [P]

    dv1 = c.dir1 * c.im1 * imp_sum[:, None]
    dw1 = jnp.sum(c.ii_torque_dir1 * imp[..., None], axis=1)
    dv2 = -c.dir1 * c.im2 * imp_sum[:, None]
    dw2 = jnp.sum(c.ii_torque_dir2 * imp[..., None], axis=1)

    # Friction warmstart (manifold-level).
    vmask = c.valid.astype(jnp.float32)
    t2 = jnp.cross(c.dir1, c.tangent1)
    ti = c.tan_impulse * vmask[:, None]
    dv1 = dv1 + (c.tangent1 * ti[:, 0:1] + t2 * ti[:, 1:2]) * c.im1
    dv2 = dv2 - (c.tangent1 * ti[:, 0:1] + t2 * ti[:, 1:2]) * c.im2
    dw1 = dw1 + (
        c.tan_ii_torque_dir1[:, 0] * ti[:, 0:1] + c.tan_ii_torque_dir1[:, 1] * ti[:, 1:2]
    )
    dw2 = dw2 + (
        c.tan_ii_torque_dir2[:, 0] * ti[:, 0:1] + c.tan_ii_torque_dir2[:, 1] * ti[:, 1:2]
    )
    wi = c.twist_impulse * vmask
    dw1 = dw1 + c.twist_ii_dir1 * wi[:, None]
    dw2 = dw2 + c.twist_ii_dir2 * wi[:, None]

    v_lin = sb.v_lin.at[c.b1].add(dv1).at[c.b2].add(dv2)
    v_ang = sb.v_ang.at[c.b1].add(dw1).at[c.b2].add(dw2)
    return sb._replace(v_lin=v_lin, v_ang=v_ang)


def solve_color(c: ContactConstraints, sb: SolverBodies, color_id, *,
                use_bias: bool):
    """One Gauss-Seidel pass over the lanes of one color.

    Mirrors ContactWithTwistFriction::solve
    (contact_with_twist_friction.rs:395-460): normal points sequentially, then
    the coupled tangent pair, then twist.  Lanes of one color share no dynamic
    body, so the final scatter-add is conflict-free (= true Gauss-Seidel).
    """
    mask = c.valid & (c.color == color_id)
    fmask = mask.astype(jnp.float32)

    v1 = sb.v_lin[c.b1]
    w1 = sb.v_ang[c.b1]
    v2 = sb.v_lin[c.b2]
    w2 = sb.v_ang[c.b2]
    v1_0, w1_0, v2_0, w2_0 = v1, w1, v2, w2

    cfm = c.cfm_factor if use_bias else 1.0
    rhs = c.rhs if use_bias else c.rhs_wo_bias

    impulses = c.impulse
    # Normal parts, sequential over the (at most) 4 points.
    for k in range(4):
        pm = (mask & c.point_mask[:, k]).astype(jnp.float32)
        dvel = (
            _dot(c.dir1, v1) + _dot(c.torque_dir1[:, k], w1)
            - _dot(c.dir1, v2) + _dot(c.torque_dir2[:, k], w2)
            + rhs[:, k]
        )
        new_imp = cfm * jnp.maximum(impulses[:, k] - c.r[:, k] * dvel, 0.0)
        dl = (new_imp - impulses[:, k]) * pm
        impulses = impulses.at[:, k].set(impulses[:, k] + dl)
        v1 = v1 + c.dir1 * c.im1 * dl[:, None]
        w1 = w1 + c.ii_torque_dir1[:, k] * dl[:, None]
        v2 = v2 - c.dir1 * c.im2 * dl[:, None]
        w2 = w2 + c.ii_torque_dir2[:, k] * dl[:, None]

    # Friction limits scale with the solved normal impulses
    # (contact_with_twist_friction.rs:430-445).
    act = c.point_mask.astype(jnp.float32)
    tangent_limit = jnp.sum(impulses * act, axis=-1) * c.limit
    twist_limit = jnp.sum(impulses * act * c.twist_dists, axis=-1) * c.limit

    # Coupled 2D tangent solve (contact_constraint_element.rs:161-203).
    t2 = jnp.cross(c.dir1, c.tangent1)
    tan_rhs = c.tan_rhs if use_bias else c.tan_rhs_wo_bias
    d0 = (
        _dot(c.tangent1, v1) + _dot(c.tan_torque_dir1[:, 0], w1)
        - _dot(c.tangent1, v2) + _dot(c.tan_torque_dir2[:, 0], w2)
        + tan_rhs[:, 0]
    )
    d1 = (
        _dot(t2, v1) + _dot(c.tan_torque_dir1[:, 1], w1)
        - _dot(t2, v2) + _dot(c.tan_torque_dir2[:, 1], w2)
        + tan_rhs[:, 1]
    )
    d00, d11, d01 = d0 * d0, d1 * d1, d0 * d1
    denom = d00 * c.tan_r[:, 0] + d11 * c.tan_r[:, 1] + d01 * c.tan_r[:, 2]
    inv_lhs = (d00 + d11) / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    delta = jnp.stack([inv_lhs * d0, inv_lhs * d1], axis=-1)
    new_t = c.tan_impulse - delta
    # Cap magnitude at the friction limit.
    t_norm = jnp.linalg.norm(new_t, axis=-1)
    scale = jnp.where(
        t_norm > tangent_limit, tangent_limit / jnp.maximum(t_norm, 1e-12), 1.0
    )
    new_t = new_t * scale[:, None]
    dl_t = (new_t - c.tan_impulse) * fmask[:, None]
    tan_impulse = c.tan_impulse + dl_t

    dvt = c.tangent1 * dl_t[:, 0:1] + t2 * dl_t[:, 1:2]
    v1 = v1 + dvt * c.im1
    v2 = v2 - dvt * c.im2
    w1 = w1 + c.tan_ii_torque_dir1[:, 0] * dl_t[:, 0:1] + c.tan_ii_torque_dir1[:, 1] * dl_t[:, 1:2]
    w2 = w2 + c.tan_ii_torque_dir2[:, 0] * dl_t[:, 0:1] + c.tan_ii_torque_dir2[:, 1] * dl_t[:, 1:2]

    # Twist (only meaningful with >= 2 points).
    has_twist = jnp.sum(c.point_mask.astype(jnp.int32), axis=-1) > 1
    dvel_tw = _dot(c.dir1, w1 - w2)   # twist dir == dir1; rhs == 0
    new_tw = jnp.clip(
        c.twist_impulse - c.twist_r * dvel_tw, -twist_limit, twist_limit
    )
    dl_tw = (new_tw - c.twist_impulse) * fmask * has_twist.astype(jnp.float32)
    twist_impulse = c.twist_impulse + dl_tw
    w1 = w1 + c.twist_ii_dir1 * dl_tw[:, None]
    w2 = w2 + c.twist_ii_dir2 * dl_tw[:, None]

    # Scatter velocity deltas (conflict-free within a color).
    m3 = fmask[:, None]
    v_lin = sb.v_lin.at[c.b1].add((v1 - v1_0) * m3).at[c.b2].add((v2 - v2_0) * m3)
    v_ang = sb.v_ang.at[c.b1].add((w1 - w1_0) * m3).at[c.b2].add((w2 - w2_0) * m3)

    c = c._replace(
        impulse=jnp.where(mask[:, None], impulses, c.impulse),
        tan_impulse=jnp.where(mask[:, None], tan_impulse, c.tan_impulse),
        twist_impulse=jnp.where(mask, twist_impulse, c.twist_impulse),
    )
    return c, sb._replace(v_lin=v_lin, v_ang=v_ang)
