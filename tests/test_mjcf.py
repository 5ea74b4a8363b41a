"""MJCF loader tests: Z-up pendulum with an actuator."""

import numpy as np
import pytest

from rapier_tpu.loaders.mjcf import load_mjcf
from rapier_tpu.world import PhysicsWorld

MODEL = """
<mujoco model="pendulum">
  <compiler angle="degree"/>
  <default>
    <geom friction="0.8"/>
    <default class="small">
      <geom friction="0.3"/>
    </default>
  </default>
  <worldbody>
    <geom type="plane" size="10 10 0.1"/>
    <body name="base" pos="0 0 1">
      <geom type="box" size="0.1 0.1 0.1"/>
      <body name="arm" pos="0.0 0 -0.1">
        <joint name="swing" type="hinge" axis="0 1 0" pos="0 0 0"
               limited="true" range="-90 90"/>
        <geom type="capsule" fromto="0 0 0  0 0 -0.5" size="0.04"/>
      </body>
    </body>
  </worldbody>
  <actuator>
    <velocity name="drive" joint="swing" kv="50"/>
  </actuator>
</mujoco>
"""


def test_mjcf_structure():
    w = PhysicsWorld(gravity=(0, 0, -9.81))  # MJCF is Z-up
    h = load_mjcf(MODEL, w)
    assert "base" in h.bodies and "arm" in h.bodies
    assert "swing" in h.joints
    assert len(h.actuators) == 1 and h.actuators[0].kind == "velocity"
    w.build()
    np.testing.assert_allclose(
        w.body_translation(h.bodies["base"]), [0, 0, 1], atol=1e-6
    )
    np.testing.assert_allclose(
        w.body_translation(h.bodies["arm"]), [0, 0, 0.9], atol=1e-6
    )
    # The plane became a fixed world collider.
    assert "world" in h.bodies


def test_mjcf_actuated_swing():
    w = PhysicsWorld(gravity=(0, 0, -9.81))
    h = load_mjcf(MODEL, w)
    # Base is a dynamic body without a joint to world: freeze it by making it
    # fixed (emulating an anchored robot).
    w._pending_bodies[h.bodies["base"]].body_type = 1  # FIXED
    w.build()
    h.apply_controls(w, [1.0])  # drive the hinge at 1 rad/s
    w.step(120)
    arm = w.body_translation(h.bodies["arm"])
    assert np.isfinite(arm).all()
    # Hinge anchor holds: arm origin stays at the mount point.
    np.testing.assert_allclose(arm, [0, 0, 0.9], atol=5e-2)
    # The arm rotated about +Y: its rotation has a y component.
    q = w.body_rotation(h.bodies["arm"])
    assert abs(q[1]) > 0.1


def test_mjcf_include_keyframes_sensors(tmp_path):
    """<include> splice, keyframe storage + apply, jointpos/jointvel/framepos
    sensors (mjcf-rs include handling; rapier3d-mjcf runtime.rs:677-760)."""
    part = tmp_path / "arm.xml"
    part.write_text("""
<mujoco>
  <worldbody>
    <body name="upper" pos="0 0 1">
      <joint name="shoulder" type="hinge" axis="0 1 0"/>
      <geom type="capsule" fromto="0 0 0 0 0 -0.5" size="0.05"/>
    </body>
  </worldbody>
  <sensor>
    <jointpos name="q_shoulder" joint="shoulder"/>
    <jointvel name="dq_shoulder" joint="shoulder"/>
    <framepos name="p_upper" objname="upper"/>
  </sensor>
  <keyframe>
    <key name="home" qpos="0.5"/>
  </keyframe>
</mujoco>
""")
    main = tmp_path / "scene.xml"
    main.write_text(f"""
<mujoco>
  <include file="arm.xml"/>
</mujoco>
""")
    w = PhysicsWorld(gravity=(0, 0, -9.81))
    h = load_mjcf(str(main), w)
    assert "shoulder" in h.joints
    assert "home" in h.keyframes and h.keyframes["home"][0] == 0.5
    assert len(h.sensors) == 3
    w.build()
    h.apply_keyframe(w, "home")
    w.step(240)
    vals = h.read_sensors(w)
    assert abs(vals["q_shoulder"] - 0.5) < 0.15, vals
    assert abs(vals["dq_shoulder"]) < 0.5
    assert np.isfinite(vals["p_upper"]).all()


def test_mjcf_use_multibody_actuated_swing():
    """use_multibody=True inserts the articulation with reduced-coordinate
    joints (rapier3d-mjcf insert_using_multibody_joints,
    crates/rapier3d-mjcf/src/conversion.rs): velocity actuator drives the
    generalized dof, limits clamp it, sensors read q/qd."""
    w = PhysicsWorld(gravity=(0, 0, -9.81))
    h = load_mjcf(MODEL, w, use_multibody=True)
    assert h.use_multibody
    w.build()
    assert w.state.multibodies is not None
    ti, li = h._mb_slot(w, "swing")
    h.apply_controls(w, [1.0])  # 1 rad/s velocity target
    w.step(150)                 # 2.5 s: enough to reach the 90deg limit
    arm = w.body_translation(h.bodies["arm"])
    assert np.isfinite(arm).all()
    # Hinge anchor holds exactly (reduced coordinates can't drift).
    np.testing.assert_allclose(arm, [0, 0, 0.9], atol=1e-5)
    val = h.joint_value(w, "swing")
    assert 0.5 < abs(val) <= 1.58, f"hinge angle {val}"
    assert np.isfinite(h.joint_velocity(w, "swing"))


def test_mjcf_use_multibody_keyframe_teleports():
    w = PhysicsWorld(gravity=(0, 0, 0))
    model = """
<mujoco>
  <worldbody>
    <body name="upper" pos="0 0 1">
      <joint name="shoulder" type="hinge" axis="0 1 0"/>
      <geom type="capsule" fromto="0 0 0 0 0 -0.5" size="0.05"/>
    </body>
  </worldbody>
  <keyframe><key name="home" qpos="0.5"/></keyframe>
  <sensor><jointpos name="q_shoulder" joint="shoulder"/></sensor>
</mujoco>
"""
    h = load_mjcf(model, w, use_multibody=True)
    w.build()
    h.apply_keyframe(w, "home")
    # Teleport is exact in generalized coords (reference keyframe apply).
    assert abs(h.joint_value(w, "shoulder") - 0.5) < 1e-6
    w.step(1)  # FK realizes the link pose; no gravity so q stays put
    vals = h.read_sensors(w)
    assert abs(vals["q_shoulder"] - 0.5) < 5e-2, vals


def test_mjcf_tendon_couples_joints():
    """<tendon><fixed> with equal coefs couples its joints 1:1 through the
    multibody dof couplings (rapier3d-mjcf conversion.rs
    materialize_tendons) — driving joint a drags joint b along."""
    model = """
<mujoco>
  <worldbody>
    <body name="root" pos="0 0 2">
      <body name="l1" pos="0 0 -0.4">
        <joint name="j1" type="hinge" axis="0 1 0"/>
        <geom type="capsule" fromto="0 0 0 0 0 -0.4" size="0.04"/>
        <body name="l2" pos="0 0 -0.4">
          <joint name="j2" type="hinge" axis="0 1 0"/>
          <geom type="capsule" fromto="0 0 0 0 0 -0.4" size="0.04"/>
        </body>
      </body>
    </body>
  </worldbody>
  <tendon>
    <fixed name="curl">
      <joint joint="j1" coef="1"/>
      <joint joint="j2" coef="1"/>
    </fixed>
  </tendon>
  <actuator><position name="a1" joint="j1" kp="80" kv="8"/></actuator>
</mujoco>
"""
    w = PhysicsWorld(gravity=(0, 0, 0))
    h = load_mjcf(model, w, use_multibody=True)
    assert "curl" in h.tendons and len(h.tendons["curl"]) == 2
    assert len(h.couplings) == 1
    w.build()
    h.apply_controls(w, [0.8])   # drive j1 to 0.8 rad
    w.step(180)
    q1 = h.joint_value(w, "j1")
    q2 = h.joint_value(w, "j2")
    assert abs(q1 - 0.8) < 0.1, q1
    assert abs(q2 - q1) < 0.05, f"tendon coupling broken: q1={q1} q2={q2}"


def test_mjcf_equality_connect_holds_bodies():
    """<equality><connect> materializes as a ball joint between the bodies
    (conversion.rs:570-585)."""
    model = """
<mujoco>
  <worldbody>
    <body name="a" pos="0 0 1">
      <joint type="free"/>
      <geom type="sphere" size="0.2"/>
    </body>
    <body name="b" pos="1 0 1">
      <joint type="free"/>
      <geom type="sphere" size="0.2"/>
    </body>
  </worldbody>
  <equality>
    <connect name="link" body1="a" body2="b" anchor="0.5 0 0"/>
  </equality>
</mujoco>
"""
    w = PhysicsWorld(gravity=(0, 0, -9.81))
    h = load_mjcf(model, w)
    assert "link" in h.equalities
    w.build()
    w.step(120)
    pa = np.asarray(w.body_translation(h.bodies["a"]))
    pb = np.asarray(w.body_translation(h.bodies["b"]))
    assert np.isfinite(pa).all() and np.isfinite(pb).all()
    # The connect anchor keeps the two spheres 1m apart while both free-fall.
    assert abs(np.linalg.norm(pa - pb) - 1.0) < 0.05


def test_mjcf_tail_gravcomp_mocap_tendon_ellipsoid():
    """Round-5 MJCF tail (reference rapier3d-mjcf runtime.rs:38 gravity
    compensation, :141 mocap, mass.rs ellipsoid, mjcf-rs spatial tendons):
    a menagerie-style model with every feature loads, the keyframe round-
    trips mocap poses, gravcomp holds a free body against gravity, and the
    spatial tendon length reads through sensors."""
    import numpy as np

    from rapier_tpu.loaders.mjcf import load_mjcf
    from rapier_tpu.world import PhysicsWorld
    from rapier_tpu.types import BodyType

    xml = """
    <mujoco>
      <worldbody>
        <geom type="plane" size="10 10 0.1"/>
        <body name="float" pos="0 0 1" gravcomp="1">
          <joint name="lift" type="slide" axis="0 0 1"/>
          <geom type="ellipsoid" size="0.3 0.2 0.1" density="500"/>
          <site name="s_base" pos="0 0 0.1"/>
        </body>
        <body name="target" pos="0.5 0 1.5" mocap="true">
          <geom type="sphere" size="0.05" density="100"/>
          <site name="s_tip" pos="0 0 0"/>
        </body>
      </worldbody>
      <tendon>
        <spatial name="cable">
          <site site="s_base"/>
          <site site="s_tip"/>
        </spatial>
      </tendon>
      <sensor>
        <tendonpos name="cable_len" tendon="cable"/>
      </sensor>
      <keyframe>
        <key name="home" qpos="0" mpos="0.5 0.5 2.0" mquat="1 0 0 0"/>
      </keyframe>
    </mujoco>
    """
    w = PhysicsWorld(gravity=(0, 0, -9.81))
    robot = load_mjcf(xml, w)
    # Mocap body is kinematic-position-based; gravcomp folded to scale 0.
    assert robot.mocap == ["target"]
    assert robot.gravcomp["float"] == 1.0
    w.build()
    hb = robot.bodies["float"]
    ht = robot.bodies["target"]
    assert int(np.asarray(w.state.bodies.body_type)[ht]) in (
        int(BodyType.KINEMATIC_POSITION_BASED),)
    assert float(np.asarray(w.state.bodies.gravity_scale)[hb]) == 0.0
    # Ellipsoid inertia: true semi-axes (0.3, 0.2, 0.1), not a mean ball.
    m = 1.0 / float(np.asarray(w.state.bodies.inv_mass)[hb])
    vol = 4.0 / 3.0 * np.pi * 0.3 * 0.2 * 0.1
    assert abs(m - 500.0 * vol) / (500.0 * vol) < 0.1, m
    inv_i = np.asarray(w.state.bodies.inv_principal_inertia)[hb]
    i_sorted = np.sort(1.0 / inv_i)
    i_exact = np.sort(m / 5.0 * np.array([
        0.2**2 + 0.1**2, 0.3**2 + 0.1**2, 0.3**2 + 0.2**2]))
    np.testing.assert_allclose(i_sorted, i_exact, rtol=0.15)

    # Gravcomp: the free body stays put under gravity.
    z0 = float(np.asarray(w.body_translation(hb))[2])
    w.step(60)
    z1 = float(np.asarray(w.body_translation(hb))[2])
    assert abs(z1 - z0) < 0.02, (z0, z1)

    # Keyframe round-trip: mocap pose lands where mpos says.
    robot.apply_keyframe(w, "home")
    np.testing.assert_allclose(
        np.asarray(w.body_translation(ht)), [0.5, 0.5, 2.0], atol=1e-5)
    # Tendon length through the sensor = site distance.
    sens = robot.read_sensors(w)
    base = np.asarray(robot.site_position(w, "s_base"))
    tip = np.asarray(robot.site_position(w, "s_tip"))
    np.testing.assert_allclose(
        sens["cable_len"], np.linalg.norm(tip - base), rtol=1e-5)
    # Runtime mocap drive: the body follows set_mocap_pose across steps.
    robot.set_mocap_pose(w, "target", (1.0, 0.0, 1.0))
    w.step(2)
    np.testing.assert_allclose(
        np.asarray(w.body_translation(ht)), [1.0, 0.0, 1.0], atol=1e-4)
