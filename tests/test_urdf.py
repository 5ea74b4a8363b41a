"""URDF loader tests: a simple double pendulum robot."""

import numpy as np
import pytest

from rapier_tpu.loaders.urdf import load_urdf
from rapier_tpu.world import PhysicsWorld

PENDULUM = """
<robot name="pendulum">
  <link name="base">
    <collision>
      <geometry><box size="0.2 0.2 0.2"/></geometry>
    </collision>
  </link>
  <link name="arm1">
    <collision>
      <origin xyz="0 -0.25 0"/>
      <geometry><box size="0.05 0.5 0.05"/></geometry>
    </collision>
  </link>
  <link name="arm2">
    <collision>
      <origin xyz="0 -0.25 0"/>
      <geometry><capsule radius="0.04" length="0.4"/></geometry>
    </collision>
  </link>
  <joint name="shoulder" type="revolute">
    <parent link="base"/>
    <child link="arm1"/>
    <origin xyz="0.0 -0.1 0"/>
    <axis xyz="0 0 1"/>
    <limit lower="-2.0" upper="2.0"/>
  </joint>
  <joint name="elbow" type="continuous">
    <parent link="arm1"/>
    <child link="arm2"/>
    <origin xyz="0 -0.5 0"/>
    <axis xyz="0 0 1"/>
  </joint>
</robot>
"""


def test_load_pendulum_structure():
    w = PhysicsWorld(gravity=(0, -9.81, 0))
    h = load_urdf(PENDULUM, w, root_translation=(0, 2, 0), fixed_base=True)
    assert set(h.bodies) == {"base", "arm1", "arm2"}
    assert set(h.joints) == {"shoulder", "elbow"}
    w.build()
    # Kinematic chain poses: arm1 at base - 0.1, arm2 at arm1 - 0.5.
    np.testing.assert_allclose(w.body_translation(h.bodies["base"]), [0, 2, 0], atol=1e-6)
    np.testing.assert_allclose(w.body_translation(h.bodies["arm1"]), [0, 1.9, 0], atol=1e-6)
    np.testing.assert_allclose(w.body_translation(h.bodies["arm2"]), [0, 1.4, 0], atol=1e-6)


def test_pendulum_swings_and_holds_together():
    w = PhysicsWorld(gravity=(-3.0, -9.81, 0.0))  # sideways pull starts a swing
    h = load_urdf(PENDULUM, w, root_translation=(0, 2, 0), fixed_base=True)
    w.build()
    w.step(240)
    base = w.body_translation(h.bodies["base"])
    arm1 = w.body_translation(h.bodies["arm1"])
    arm2 = w.body_translation(h.bodies["arm2"])
    assert np.isfinite(arm2).all()
    np.testing.assert_allclose(base, [0, 2, 0], atol=1e-6)  # fixed base
    # Anchors hold: arm1 origin stays ~0.1 from base.
    assert abs(np.linalg.norm(arm1 - base) - 0.1) < 0.05
    # Chain swung out of the vertical.
    assert arm2[0] < -0.05
    # Planar (z = 0) motion only.
    assert abs(arm1[2]) < 1e-2 and abs(arm2[2]) < 1e-2


def test_binary_stl_loads(tmp_path):
    """Binary STL (the common robot-asset format, rapier3d-meshloader)."""
    import struct

    # A single triangle, binary STL.
    tri = [(0.0, 0.0, 0.0), (1.0, 0.0, 0.0), (0.0, 1.0, 0.0)]
    buf = b"\x00" * 80 + struct.pack("<I", 1)
    buf += struct.pack("<3f", 0, 0, 1)
    for v in tri:
        buf += struct.pack("<3f", *v)
    buf += struct.pack("<H", 0)
    p = tmp_path / "tri.stl"
    p.write_bytes(buf)

    from rapier_tpu.loaders.urdf import _load_mesh_file

    out = _load_mesh_file(str(p))
    assert out is not None
    verts, faces = out
    assert faces.shape == (1, 3)
    assert verts.shape[0] == 3
    np.testing.assert_allclose(sorted(verts[:, 0]), [0.0, 0.0, 1.0])


def test_urdf_use_multibody_pendulum():
    """use_multibody=True mirrors insert_using_multibody_joints
    (crates/rapier3d-urdf/src/lib.rs): the chain becomes one articulation,
    anchors hold exactly, limits clamp the shoulder."""
    w = PhysicsWorld(gravity=(-3.0, -9.81, 0.0))
    h = load_urdf(PENDULUM, w, root_translation=(0, 2, 0), fixed_base=True,
                  use_multibody=True)
    assert h.use_multibody
    w.build()
    assert w.state.multibodies is not None
    ti, li = w.multibody_link_of(h.bodies["arm1"])
    w.step(180)
    p_base = np.asarray(w.body_translation(h.bodies["base"]))
    p1 = np.asarray(w.body_translation(h.bodies["arm1"]))
    p2 = np.asarray(w.body_translation(h.bodies["arm2"]))
    assert np.isfinite(p1).all() and np.isfinite(p2).all()
    # Reduced coordinates: anchor distances hold exactly (1e-5, not 5e-2).
    np.testing.assert_allclose(np.linalg.norm(p1 - p_base), 0.1, atol=1e-4)
    np.testing.assert_allclose(np.linalg.norm(p2 - p1), 0.5, atol=1e-4)
    # The sideways pull swung the chain.
    assert abs(p2[0] - 0.0) > 0.05
    q = np.asarray(w.multibody_q(ti))
    assert np.isfinite(q).all()
    # Shoulder limit: |angle| <= 2.0 rad.
    assert abs(q[li, 3]) <= 2.01


def test_collada_mesh_loads(tmp_path):
    """Minimal Collada (.dae) reader (reference rapier3d-urdf `collada`
    feature): triangles + polylist quads, <unit meter> scaling."""
    dae = tmp_path / "part.dae"
    dae.write_text("""<?xml version="1.0"?>
<COLLADA xmlns="http://www.collada.org/2005/11/COLLADASchema" version="1.4.1">
  <asset><unit name="millimeter" meter="0.001"/></asset>
  <library_geometries>
    <geometry id="g1"><mesh>
      <source id="pos"><float_array id="pa" count="12">
        0 0 0  1000 0 0  0 1000 0  1000 1000 0
      </float_array></source>
      <vertices id="verts"><input semantic="POSITION" source="#pos"/></vertices>
      <triangles count="1">
        <input semantic="VERTEX" source="#verts" offset="0"/>
        <p>0 1 2</p>
      </triangles>
      <polylist count="1">
        <input semantic="VERTEX" source="#verts" offset="0"/>
        <vcount>4</vcount>
        <p>0 1 3 2</p>
      </polylist>
    </mesh></geometry>
  </library_geometries>
</COLLADA>
""")
    from rapier_tpu.loaders.urdf import _load_mesh_file

    out = _load_mesh_file(str(dae))
    assert out is not None
    verts, faces = out
    assert verts.shape == (4, 3)
    np.testing.assert_allclose(verts.max(), 1.0)  # mm -> m scaling
    # 1 triangle + quad fan (2 tris) = 3 faces.
    assert faces.shape == (3, 3)
