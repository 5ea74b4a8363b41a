"""Per-point Coulomb friction contact constraints (FrictionModel::Coulomb).

Behavioral port of the reference's ContactWithCoulombFriction
(src/dynamics/solver/contact_constraint/contact_with_coulomb_friction.rs:323):
per contact point one normal constraint (identical math to the twist model)
plus one 2D-coupled tangent pair whose limit couples to THAT point's normal
impulse (:456-476).  This is the multibody-coupled/2D default in the
reference; the 3D default (SIMPLIFIED) lives in contact_constraints.py.

Same lane-last layouts; per-point tangent fields grow a leading point axis:
[4, 2, 3, P] torque dirs, [4, 3, P] effective-mass triplets, [4, 2, P]
impulses.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rapier_tpu.math import quat
from rapier_tpu.math.quat import cross_cl, dot_cl, rotate_cl
from rapier_tpu.dynamics.solver.contact_constraints import (
    SolverBodies,
    PairOneHot,
    _gather2,
    _gather_cl,
    make_pair_onehot,
    _onehot,
    compute_tangent_directions,
)


class CoulombConstraints(NamedTuple):
    b1: jax.Array            # [P]
    b2: jax.Array            # [P]
    valid: jax.Array         # [P] bool
    color: jax.Array         # [P] int32
    dir1: jax.Array          # [3, P]
    tangent1: jax.Array      # [3, P]
    im1: jax.Array           # [3, P]
    im2: jax.Array           # [3, P]
    limit: jax.Array         # [P] friction coefficient
    point_mask: jax.Array    # [4, P] bool
    # normal parts (as in the twist model)
    torque_dir1: jax.Array       # [4, 3, P]
    torque_dir2: jax.Array       # [4, 3, P]
    ii_torque_dir1: jax.Array    # [4, 3, P]
    ii_torque_dir2: jax.Array    # [4, 3, P]
    r: jax.Array                 # [4, P]
    local_p1: jax.Array          # [4, 3, P]
    local_p2: jax.Array          # [4, 3, P]
    dist0: jax.Array             # [4, P]
    normal_vel_rhs: jax.Array    # [4, P]
    rhs: jax.Array               # [4, P]
    rhs_wo_bias: jax.Array       # [4, P]
    impulse: jax.Array           # [4, P]
    impulse_acc: jax.Array       # [4, P]
    # per-point tangent parts (contact_constraint_element.rs:50)
    tan_torque_dir1: jax.Array      # [4, 2, 3, P]
    tan_torque_dir2: jax.Array      # [4, 2, 3, P]
    tan_ii_torque_dir1: jax.Array   # [4, 2, 3, P]
    tan_ii_torque_dir2: jax.Array   # [4, 2, 3, P]
    tan_r: jax.Array                # [4, 3, P] (r0, r1, r01)
    tan_rhs: jax.Array              # [4, 2, P]
    tan_rhs_wo_bias: jax.Array      # [4, 2, P]
    tan_impulse: jax.Array          # [4, 2, P]
    tan_impulse_acc: jax.Array      # [4, 2, P]
    cfm_factor: jax.Array           # scalar


def generate(man, sb: SolverBodies, prev_impulse, color, n_bodies: int):
    """Constraint generation (contact_with_coulomb_friction.rs:48-250)."""
    sent = n_bodies
    b1 = jnp.where((man.body1 >= 0) & (man.rel_dominance <= 0), man.body1, sent)
    b2 = jnp.where((man.body2 >= 0) & (man.rel_dominance >= 0), man.body2, sent)
    p = b1.shape[0]

    from rapier_tpu.utils import routing as _routing

    if p * 2 * (n_bodies + 1) <= _routing.DENSE_ROUTE_ELEMS:
        oh1, oh2 = make_pair_onehot(b1, b2, n_bodies + 1), None
    else:
        oh1 = _onehot(b1, n_bodies + 1)
        oh2 = _onehot(b2, n_bodies + 1)
    ii_flat = sb.ii.reshape(9, sb.ii.shape[-1])
    big = jnp.concatenate(
        [sb.v_lin, sb.v_ang, sb.com, sb.rot, sb.im, ii_flat], axis=0
    )                                               # [25, N+1]
    G1, G2 = _gather2(big, oh1, oh2)
    v1l, w1, com1, rot1, im1, ii1_r = (
        G1[0:3], G1[3:6], G1[6:9], G1[9:13], G1[13:16], G1[16:25])
    v2l, w2, com2, rot2, im2, ii2_r = (
        G2[0:3], G2[3:6], G2[6:9], G2[9:13], G2[13:16], G2[16:25])
    ii1 = [[ii1_r[3 * a + b] for b in range(3)] for a in range(3)]
    ii2 = [[ii2_r[3 * a + b] for b in range(3)] for a in range(3)]

    def ii_mul(ii, v):
        return jnp.stack([
            ii[a][0] * v[0] + ii[a][1] * v[1] + ii[a][2] * v[2]
            for a in range(3)
        ])

    dir1 = -man.normal
    tangent1 = compute_tangent_directions(dir1, v1l, v2l)
    tangent2 = cross_cl(dir1, tangent1)
    tans = (tangent1, tangent2)

    pts = man.point
    pmask = man.point_active
    imsum = im1 + im2
    dir_im = dot_cl(dir1, imsum * dir1)

    td1_k, td2_k, iitd1_k, iitd2_k = [], [], [], []
    denom_k, proj_k, lp1_k, lp2_k = [], [], [], []
    ttd1_k, ttd2_k, tiitd1_k, tiitd2_k, tr_k = [], [], [], [], []
    for k in range(4):
        dp1 = pts[k] - com1
        dp2 = pts[k] - com2
        vel1 = v1l + cross_cl(w1, dp1)
        vel2 = v2l + cross_cl(w2, dp2)
        td1 = cross_cl(dp1, dir1)
        td2 = cross_cl(dp2, -dir1)
        iitd1 = ii_mul(ii1, td1)
        iitd2 = ii_mul(ii2, td2)
        denom_k.append(dir_im + dot_cl(iitd1, td1) + dot_cl(iitd2, td2))
        proj_k.append(dot_cl(vel1 - vel2, dir1))
        lp1_k.append(quat.inv_rotate_cl(rot1, dp1))
        lp2_k.append(quat.inv_rotate_cl(rot2, dp2))
        td1_k.append(td1)
        td2_k.append(td2)
        iitd1_k.append(iitd1)
        iitd2_k.append(iitd2)

        # Per-point tangent parts (generate, contact_constraint_element.rs).
        ttd1_j, ttd2_j, tiitd1_j, tiitd2_j, trj = [], [], [], [], []
        for tan in tans:
            tt1 = cross_cl(dp1, tan)
            tt2 = cross_cl(dp2, -tan)
            ti1 = ii_mul(ii1, tt1)
            ti2 = ii_mul(ii2, tt2)
            trj.append(
                dot_cl(tan, imsum * tan) + dot_cl(ti1, tt1) + dot_cl(ti2, tt2)
            )
            ttd1_j.append(tt1)
            ttd2_j.append(tt2)
            tiitd1_j.append(ti1)
            tiitd2_j.append(ti2)
        coupling = 2.0 * (
            dot_cl(tiitd1_j[0], ttd1_j[1]) + dot_cl(tiitd2_j[0], ttd2_j[1])
        )
        ttd1_k.append(jnp.stack(ttd1_j))
        ttd2_k.append(jnp.stack(ttd2_j))
        tiitd1_k.append(jnp.stack(tiitd1_j))
        tiitd2_k.append(jnp.stack(tiitd2_j))
        tr_k.append(jnp.stack([trj[0], trj[1], coupling]))

    r = 1.0 / jnp.maximum(jnp.stack(denom_k), 1e-12)
    proj_vel = jnp.stack(proj_k)
    restitution = man.restitution[None]
    is_new = prev_impulse == 0.0
    is_bouncy = jnp.where(
        is_new,
        (restitution > 0.0).astype(jnp.float32),
        (restitution >= 1.0).astype(jnp.float32),
    )
    normal_vel_rhs = is_bouncy * restitution * proj_vel

    z4 = jnp.zeros((4, p))
    z42 = jnp.zeros((4, 2, p))
    return CoulombConstraints(
        b1=b1, b2=b2, valid=man.solver_pair, color=color,
        dir1=dir1, tangent1=tangent1, im1=im1, im2=im2,
        limit=man.friction, point_mask=pmask,
        torque_dir1=jnp.stack(td1_k), torque_dir2=jnp.stack(td2_k),
        ii_torque_dir1=jnp.stack(iitd1_k), ii_torque_dir2=jnp.stack(iitd2_k),
        r=r, local_p1=jnp.stack(lp1_k), local_p2=jnp.stack(lp2_k),
        dist0=man.dist, normal_vel_rhs=normal_vel_rhs,
        rhs=z4, rhs_wo_bias=z4, impulse=z4, impulse_acc=z4,
        tan_torque_dir1=jnp.stack(ttd1_k), tan_torque_dir2=jnp.stack(ttd2_k),
        tan_ii_torque_dir1=jnp.stack(tiitd1_k),
        tan_ii_torque_dir2=jnp.stack(tiitd2_k),
        tan_r=jnp.stack(tr_k), tan_rhs=z42, tan_rhs_wo_bias=z42,
        tan_impulse=z42, tan_impulse_acc=z42,
        cfm_factor=jnp.float32(1.0),
    )


def update(c: CoulombConstraints, sb: SolverBodies, oh1, oh2, *, cfm_factor,
           inv_dt, allowed_lin_err, erp_inv_dt, max_corrective_velocity,
           warmstart_coeff) -> CoulombConstraints:
    """Per-substep soft-rhs recompute (contact_with_coulomb_friction.rs
    :251-318)."""
    if isinstance(oh1, PairOneHot):
        pose = jnp.concatenate([sb.com, sb.rot], axis=0)
        P1, P2 = _gather2(pose, oh1, oh2)
        com1, rot1 = P1[0:3], P1[3:7]
        com2, rot2 = P2[0:3], P2[3:7]
    else:
        com1 = _gather_cl(sb.com, oh1)
        com2 = _gather_cl(sb.com, oh2)
        rot1 = _gather_cl(sb.rot, oh1)
        rot2 = _gather_cl(sb.rot, oh2)

    tangent2 = cross_cl(c.dir1, c.tangent1)
    tans = (c.tangent1, tangent2)

    dist_k, bias_k = [], []
    for k in range(4):
        p1 = com1 + rotate_cl(rot1, c.local_p1[k])
        p2 = com2 + rotate_cl(rot2, c.local_p2[k])
        dist_k.append(dot_cl(p1 - p2, c.dir1))
        dp = p1 - p2
        bias_k.append(jnp.stack(
            [dot_cl(dp, tans[0]) * inv_dt, dot_cl(dp, tans[1]) * inv_dt]
        ))
    dist = c.dist0 + jnp.stack(dist_k)

    rhs_wo_bias = c.normal_vel_rhs + jnp.maximum(dist, 0.0) * inv_dt
    rhs_bias = jnp.clip(
        (dist + allowed_lin_err) * erp_inv_dt, -max_corrective_velocity, 0.0
    )
    return c._replace(
        rhs=rhs_wo_bias + rhs_bias, rhs_wo_bias=rhs_wo_bias,
        impulse_acc=c.impulse_acc + c.impulse,
        impulse=c.impulse * warmstart_coeff,
        tan_rhs=c.tan_rhs_wo_bias + jnp.stack(bias_k),
        tan_impulse_acc=c.tan_impulse_acc + c.tan_impulse,
        tan_impulse=c.tan_impulse * warmstart_coeff,
        cfm_factor=jnp.asarray(cfm_factor, jnp.float32),
    )


def warmstart(c: CoulombConstraints, sb: SolverBodies, oh1, oh2) -> SolverBodies:
    act = (c.valid[None, :] & c.point_mask).astype(jnp.float32)
    imp = c.impulse * act
    imp_sum = imp[0] + imp[1] + imp[2] + imp[3]
    dv1 = c.dir1 * c.im1 * imp_sum[None]
    dv2 = -c.dir1 * c.im2 * imp_sum[None]
    dw1 = sum(c.ii_torque_dir1[k] * imp[k][None] for k in range(4))
    dw2 = sum(c.ii_torque_dir2[k] * imp[k][None] for k in range(4))

    tangent2 = cross_cl(c.dir1, c.tangent1)
    tans = (c.tangent1, tangent2)
    for k in range(4):
        t0 = c.tan_impulse[k, 0] * act[k]
        t1 = c.tan_impulse[k, 1] * act[k]
        lin = tans[0] * t0[None] + tans[1] * t1[None]
        dv1 = dv1 + lin * c.im1
        dv2 = dv2 - lin * c.im2
        dw1 = dw1 + c.tan_ii_torque_dir1[k, 0] * t0[None] \
            + c.tan_ii_torque_dir1[k, 1] * t1[None]
        dw2 = dw2 + c.tan_ii_torque_dir2[k, 0] * t0[None] \
            + c.tan_ii_torque_dir2[k, 1] * t1[None]

    return sb._replace(
        v_lin=(sb.v_lin
               + jnp.concatenate([dv1, dv2], axis=-1) @ oh1.oh12
               if isinstance(oh1, PairOneHot)
               else sb.v_lin + dv1 @ oh1 + dv2 @ oh2),
        v_ang=(sb.v_ang
               + jnp.concatenate([dw1, dw2], axis=-1) @ oh1.oh12
               if isinstance(oh1, PairOneHot)
               else sb.v_ang + dw1 @ oh1 + dw2 @ oh2),
    )


def solve_color(c: CoulombConstraints, sb: SolverBodies, color_id, oh1, oh2,
                *, use_bias: bool):
    """One Gauss-Seidel pass (contact_with_coulomb_friction.rs:385-470):
    normal points sequentially, then each point's coupled tangent pair with
    limit = friction * that point's normal impulse."""
    mask = c.valid & (c.color == color_id)
    fmask = mask.astype(jnp.float32)

    if isinstance(oh1, PairOneHot):
        vw = jnp.concatenate([sb.v_lin, sb.v_ang], axis=0)
        V1, V2 = _gather2(vw, oh1, oh2)
        v1, w1 = V1[0:3], V1[3:6]
        v2, w2 = V2[0:3], V2[3:6]
    else:
        v1 = _gather_cl(sb.v_lin, oh1)
        w1 = _gather_cl(sb.v_ang, oh1)
        v2 = _gather_cl(sb.v_lin, oh2)
        w2 = _gather_cl(sb.v_ang, oh2)
    v1_0, w1_0, v2_0, w2_0 = v1, w1, v2, w2

    cfm = c.cfm_factor if use_bias else 1.0
    rhs = c.rhs if use_bias else c.rhs_wo_bias
    tan_rhs = c.tan_rhs if use_bias else c.tan_rhs_wo_bias

    imp_rows = [c.impulse[k] for k in range(4)]
    for k in range(4):
        pm = (mask & c.point_mask[k]).astype(jnp.float32)
        dvel = (
            dot_cl(c.dir1, v1) + dot_cl(c.torque_dir1[k], w1)
            - dot_cl(c.dir1, v2) + dot_cl(c.torque_dir2[k], w2)
            + rhs[k]
        )
        new_imp = cfm * jnp.maximum(imp_rows[k] - c.r[k] * dvel, 0.0)
        dl = (new_imp - imp_rows[k]) * pm
        imp_rows[k] = imp_rows[k] + dl
        v1 = v1 + c.dir1 * c.im1 * dl[None]
        w1 = w1 + c.ii_torque_dir1[k] * dl[None]
        v2 = v2 - c.dir1 * c.im2 * dl[None]
        w2 = w2 + c.ii_torque_dir2[k] * dl[None]
    impulses = jnp.stack(imp_rows)

    tangent2 = cross_cl(c.dir1, c.tangent1)
    tans = (c.tangent1, tangent2)
    tan_rows = []
    for k in range(4):
        pm = (mask & c.point_mask[k]).astype(jnp.float32)
        limit = c.limit * imp_rows[k]
        d0 = (
            dot_cl(tans[0], v1) + dot_cl(c.tan_torque_dir1[k, 0], w1)
            - dot_cl(tans[0], v2) + dot_cl(c.tan_torque_dir2[k, 0], w2)
            + tan_rhs[k, 0]
        )
        d1 = (
            dot_cl(tans[1], v1) + dot_cl(c.tan_torque_dir1[k, 1], w1)
            - dot_cl(tans[1], v2) + dot_cl(c.tan_torque_dir2[k, 1], w2)
            + tan_rhs[k, 1]
        )
        d00, d11, d01 = d0 * d0, d1 * d1, d0 * d1
        denom = d00 * c.tan_r[k, 0] + d11 * c.tan_r[k, 1] + d01 * c.tan_r[k, 2]
        inv_lhs = (d00 + d11) / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
        new_t0 = c.tan_impulse[k, 0] - inv_lhs * d0
        new_t1 = c.tan_impulse[k, 1] - inv_lhs * d1
        t_norm = jnp.sqrt(new_t0 * new_t0 + new_t1 * new_t1)
        scale = jnp.where(
            t_norm > limit, limit / jnp.maximum(t_norm, 1e-12), 1.0
        )
        dl0 = (new_t0 * scale - c.tan_impulse[k, 0]) * pm
        dl1 = (new_t1 * scale - c.tan_impulse[k, 1]) * pm
        tan_rows.append(jnp.stack([
            c.tan_impulse[k, 0] + dl0, c.tan_impulse[k, 1] + dl1
        ]))
        lin = tans[0] * dl0[None] + tans[1] * dl1[None]
        v1 = v1 + lin * c.im1
        v2 = v2 - lin * c.im2
        w1 = w1 + c.tan_ii_torque_dir1[k, 0] * dl0[None] \
            + c.tan_ii_torque_dir1[k, 1] * dl1[None]
        w2 = w2 + c.tan_ii_torque_dir2[k, 0] * dl0[None] \
            + c.tan_ii_torque_dir2[k, 1] * dl1[None]
    tan_impulse = jnp.stack(tan_rows)

    m = fmask[None]
    if isinstance(oh1, PairOneHot):
        dvw = jnp.concatenate([
            jnp.concatenate([(v1 - v1_0) * m, (w1 - w1_0) * m], axis=0),
            jnp.concatenate([(v2 - v2_0) * m, (w2 - w2_0) * m], axis=0),
        ], axis=-1) @ oh1.oh12                     # [6, N+1], one matmul
        v_lin = sb.v_lin + dvw[0:3]
        v_ang = sb.v_ang + dvw[3:6]
    else:
        v_lin = sb.v_lin + ((v1 - v1_0) * m) @ oh1 + ((v2 - v2_0) * m) @ oh2
        v_ang = sb.v_ang + ((w1 - w1_0) * m) @ oh1 + ((w2 - w2_0) * m) @ oh2

    c = c._replace(
        impulse=jnp.where(mask[None], impulses, c.impulse),
        tan_impulse=jnp.where(mask[None, None], tan_impulse, c.tan_impulse),
    )
    return c, sb._replace(v_lin=v_lin, v_ang=v_ang)
