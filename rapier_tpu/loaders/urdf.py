"""URDF robot loader: links/joints -> bodies/colliders/impulse joints.

Host-side port of the reference rapier3d-urdf crate semantics
(crates/rapier3d-urdf/src/lib.rs:78-556): each <link> becomes a rigid body
(with <inertial> mass properties when present, else collider densities), each
<collision> geometry becomes a collider, and each <joint> becomes an impulse
joint (fixed/revolute/continuous/prismatic supported; floating = no joint).

Meshes referenced by <mesh filename=...> load via trimesh collider tables
(OBJ, binary/ASCII STL, and Collada .dae — the reference's
rapier3d-meshloader format features); unknown formats skip the collision.
"""

from __future__ import annotations

import math
import os
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from rapier_tpu.world import (
    ColliderBuilder,
    GenericJointBuilder,
    PhysicsWorld,
    RigidBodyBuilder,
)


def _parse_vec(s: Optional[str], default=(0.0, 0.0, 0.0)):
    if not s:
        return np.asarray(default, float)
    return np.asarray([float(x) for x in s.split()], float)


def _rpy_to_quat(rpy):
    """URDF fixed-axis roll-pitch-yaw -> quaternion (x, y, z, w)."""
    r, p, y = rpy
    cr, sr = math.cos(r / 2), math.sin(r / 2)
    cp, sp = math.cos(p / 2), math.sin(p / 2)
    cy, sy = math.cos(y / 2), math.sin(y / 2)
    return np.array([
        sr * cp * cy - cr * sp * sy,
        cr * sp * cy + sr * cp * sy,
        cr * cp * sy - sr * sp * cy,
        cr * cp * cy + sr * sp * sy,
    ])


def _quat_mul(a, b):
    ax, ay, az, aw = a
    bx, by, bz, bw = b
    return np.array([
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
        aw * bw - ax * bx - ay * by - az * bz,
    ])


def _quat_rotate(q, v):
    u, w = q[:3], q[3]
    t = 2.0 * np.cross(u, v)
    return v + w * t + np.cross(u, t)


def _origin(elem):
    if elem is None:
        return np.zeros(3), np.array([0.0, 0.0, 0.0, 1.0])
    xyz = _parse_vec(elem.get("xyz"))
    rpy = _parse_vec(elem.get("rpy"))
    return xyz, _rpy_to_quat(rpy)


@dataclass
class UrdfRobotHandles:
    """Handles produced by loading (reference UrdfRobotHandles)."""

    bodies: dict = field(default_factory=dict)   # link name -> body handle
    joints: dict = field(default_factory=dict)   # joint name -> joint handle
    joint_names: list = field(default_factory=list)
    use_multibody: bool = False


def _geometry_collider(geom_elem, mesh_dir: str) -> Optional[ColliderBuilder]:
    box = geom_elem.find("box")
    if box is not None:
        size = _parse_vec(box.get("size"), (1, 1, 1))
        return ColliderBuilder.cuboid(size[0] / 2, size[1] / 2, size[2] / 2)
    sphere = geom_elem.find("sphere")
    if sphere is not None:
        return ColliderBuilder.ball(float(sphere.get("radius", 0.5)))
    cyl = geom_elem.find("cylinder")
    if cyl is not None:
        r = float(cyl.get("radius", 0.5))
        l = float(cyl.get("length", 1.0))
        # URDF cylinders are along +Z; ours along +Y: rotate frame.
        cb = ColliderBuilder.cylinder(l / 2, r)
        return cb.with_rotation((math.pi / 2, 0.0, 0.0))
    capsule = geom_elem.find("capsule")
    if capsule is not None:
        r = float(capsule.get("radius", 0.5))
        l = float(capsule.get("length", 1.0))
        return ColliderBuilder.capsule_z(l / 2, r)
    mesh = geom_elem.find("mesh")
    if mesh is not None:
        fn = mesh.get("filename", "")
        fn = fn.replace("package://", "")
        path = os.path.join(mesh_dir, fn) if not os.path.isabs(fn) else fn
        tri = _load_mesh_file(path)
        if tri is not None:
            v, t = tri
            scale = _parse_vec(mesh.get("scale"), (1, 1, 1))
            return ColliderBuilder.trimesh(v * scale, t)
    return None


def _load_mesh_file(path: str):
    """Minimal OBJ / ASCII-STL loader (rapier3d-meshloader analog)."""
    if not os.path.exists(path):
        return None
    verts, faces = [], []
    if path.lower().endswith(".obj"):
        with open(path) as f:
            for line in f:
                parts = line.split()
                if not parts:
                    continue
                if parts[0] == "v":
                    verts.append([float(x) for x in parts[1:4]])
                elif parts[0] == "f":
                    idx = [int(p.split("/")[0]) - 1 for p in parts[1:]]
                    for k in range(1, len(idx) - 1):
                        faces.append([idx[0], idx[k], idx[k + 1]])
        return np.asarray(verts, np.float32), np.asarray(faces, np.int32)
    if path.lower().endswith(".stl"):
        import struct as _struct

        with open(path, "rb") as f:
            raw = f.read()
        # Binary STL (the common robot-asset format): 80-byte header +
        # uint32 count + 50-byte records.  "solid" prefix alone is not a
        # reliable ASCII marker — verify the record arithmetic too
        # (rapier3d-meshloader defers to the mesh-loader crate's sniffing).
        is_binary = False
        if len(raw) >= 84:
            (n_tri,) = _struct.unpack_from("<I", raw, 80)
            if 84 + 50 * n_tri == len(raw):
                is_binary = True
        if is_binary:
            rec = np.frombuffer(
                raw[84:84 + 50 * n_tri], dtype=np.uint8
            ).reshape(n_tri, 50)
            tri_f = rec[:, 12:48].copy().view("<f4").reshape(n_tri, 3, 3)
            v = tri_f.reshape(-1, 3).astype(np.float32)
        else:
            for line in raw.decode("ascii", errors="replace").splitlines():
                parts = line.split()
                if parts and parts[0] == "vertex":
                    verts.append([float(x) for x in parts[1:4]])
            v = np.asarray(verts, np.float32)
        # Merge duplicate vertices (trimesh_with_flags MERGE_DUPLICATE_VERTICES
        # semantics) so the index buffer is shared.
        if len(v):
            vq = np.round(v.astype(np.float64) * 1e6) / 1e6
            uniq, inv = np.unique(vq, axis=0, return_inverse=True)
            t = inv.reshape(-1, 3).astype(np.int32)
            return uniq.astype(np.float32), t
        return v, np.zeros((0, 3), np.int32)
    if path.lower().endswith(".dae"):
        return _load_collada(path)
    return None


def _load_collada(path: str):
    """Minimal Collada (.dae) geometry reader (reference `collada` feature of
    rapier3d-urdf / rapier3d-meshloader): every <library_geometries> mesh's
    <triangles>/<polylist> primitives, concatenated; <unit meter=...> scale
    applied.  Materials/scenes/controllers are ignored — collision geometry
    only."""
    tree = ET.parse(path)
    root = tree.getroot()
    # Collada files are namespaced; match on local tag names.
    def local(tag):
        return tag.rsplit("}", 1)[-1]

    def findall(elem, name):
        return [e for e in elem.iter() if local(e.tag) == name]

    scale = 1.0
    for a in findall(root, "unit"):
        scale = float(a.get("meter", 1.0))

    all_v, all_t = [], []
    base_holder = [0]
    for geom in findall(root, "geometry"):
        for mesh in [e for e in geom if local(e.tag) == "mesh"]:
            sources = {}
            for s in [e for e in mesh if local(e.tag) == "source"]:
                arr = next((e for e in s if local(e.tag) == "float_array"), None)
                if arr is not None and arr.text:
                    sources["#" + s.get("id", "")] = np.asarray(arr.text.split(), dtype=np.float64)
            pos_by_vertid = {}
            for vtx in [e for e in mesh if local(e.tag) == "vertices"]:
                for inp in [e for e in vtx if local(e.tag) == "input"]:
                    if inp.get("semantic") == "POSITION":
                        pos_by_vertid["#" + vtx.get("id", "")] = (
                            inp.get("source", ""))
            src_base: dict = {}   # source id -> row offset into all_v

            def _src_offset(v_src):
                if v_src not in src_base:
                    pos = sources.get(v_src)
                    if pos is None:
                        return None
                    src_base[v_src] = base_holder[0]
                    all_v.append((pos.reshape(-1, 3) * scale)
                                 .astype(np.float32))
                    base_holder[0] += len(all_v[-1])
                return src_base[v_src]

            for prim in [e for e in mesh
                         if local(e.tag) in ("triangles", "polylist")]:
                inputs = [e for e in prim if local(e.tag) == "input"]
                v_off, v_src = 0, None
                stride = 1
                for inp in inputs:
                    off = int(inp.get("offset", 0))
                    stride = max(stride, off + 1)
                    if inp.get("semantic") == "VERTEX":
                        v_off = off
                        v_src = pos_by_vertid.get(inp.get("source", ""))
                p_el = next((e for e in prim if local(e.tag) == "p"), None)
                if p_el is None or not p_el.text or v_src is None:
                    continue
                offset = _src_offset(v_src)
                if offset is None:
                    continue
                idx = np.asarray(p_el.text.split(), dtype=np.int64)
                vidx = idx[v_off::stride]
                if local(prim.tag) == "polylist":
                    vc_el = next((e for e in prim if local(e.tag) == "vcount"),
                                 None)
                    counts = (np.asarray(vc_el.text.split(), dtype=np.int64)
                              if vc_el is not None and vc_el.text else
                              np.full(len(vidx) // 3, 3, np.int64))
                    tris = []
                    c = 0
                    for cnt in counts:        # fan-triangulate each polygon
                        for k in range(1, cnt - 1):
                            tris.append([vidx[c], vidx[c + k], vidx[c + k + 1]])
                        c += cnt
                    t = np.asarray(tris, np.int64).reshape(-1, 3)
                else:
                    t = vidx.reshape(-1, 3)
                all_t.append((t + offset).astype(np.int32))
    if not all_v:
        return None
    return np.concatenate(all_v), np.concatenate(all_t)


def load_urdf(path_or_string: str, world: PhysicsWorld, *,
              root_translation=(0.0, 0.0, 0.0), fixed_base: bool = False,
              mesh_dir: Optional[str] = None,
              use_multibody: bool = False) -> UrdfRobotHandles:
    """Parse URDF and insert the robot into `world`.

    Mirrors UrdfRobot::from_file + insert_using_impulse_joints
    (crates/rapier3d-urdf/src/lib.rs:243+); `use_multibody=True` mirrors
    insert_using_multibody_joints — reduced-coordinate articulation with
    exact joint kinematics, `handles.joints` holding pending multibody-joint
    ids (map to (tree, link) via world.multibody_link_of after build()).
    """
    if os.path.exists(path_or_string):
        tree = ET.parse(path_or_string)
        root = tree.getroot()
        mesh_dir = mesh_dir or os.path.dirname(path_or_string)
    else:
        root = ET.fromstring(path_or_string)
        mesh_dir = mesh_dir or "."
    assert root.tag == "robot", f"not a URDF file (root <{root.tag}>)"

    links = {l.get("name"): l for l in root.findall("link")}
    joints = root.findall("joint")

    # Kinematic tree: world poses by walking joints from the root link.
    children = {}
    child_links = set()
    for j in joints:
        parent = j.find("parent").get("link")
        child = j.find("child").get("link")
        children.setdefault(parent, []).append(j)
        child_links.add(child)
    roots = [name for name in links if name not in child_links]

    handles = UrdfRobotHandles(use_multibody=use_multibody)
    world_pose: dict[str, tuple] = {}
    rt = np.asarray(root_translation, float)

    def insert_link(name, pos, rot, is_root):
        link = links[name]
        inertial = link.find("inertial")
        bb = RigidBodyBuilder.fixed() if (is_root and fixed_base) \
            else RigidBodyBuilder.dynamic()
        bb.translation = tuple(pos)
        bb.rotation = tuple(rot)
        h = world.insert_body(bb)
        ncol = 0
        for col in link.findall("collision"):
            cpos, crot = _origin(col.find("origin"))
            cb = _geometry_collider(col.find("geometry"), mesh_dir)
            if cb is None:
                continue
            base_pos = np.asarray(cb.translation)
            base_rot = np.asarray(cb.rotation)
            cb.translation = tuple(cpos + _quat_rotate(crot, base_pos))
            cb.rotation = tuple(_quat_mul(crot, base_rot))
            world.insert_collider(cb, h)
            ncol += 1
        if inertial is not None:
            mass_el = inertial.find("mass")
            if mass_el is not None and ncol == 0:
                bb.additional_mass = float(mass_el.get("value", 0.0))
        handles.bodies[name] = h
        return h

    def walk(name, pos, rot, is_root):
        insert_link(name, pos, rot, is_root)
        world_pose[name] = (pos, rot)
        for j in children.get(name, []):
            jpos, jrot = _origin(j.find("origin"))
            cname = j.find("child").get("link")
            cpos = pos + _quat_rotate(rot, jpos)
            crot = _quat_mul(rot, jrot)
            walk(cname, cpos, crot, False)

    for r in roots:
        walk(r, rt.copy(), np.array([0.0, 0.0, 0.0, 1.0]), True)

    # Joints.
    for j in joints:
        jtype = j.get("type")
        pname = j.find("parent").get("link")
        cname = j.find("child").get("link")
        jpos, jrot = _origin(j.find("origin"))
        axis = _parse_vec(
            j.find("axis").get("xyz") if j.find("axis") is not None else None,
            (1.0, 0.0, 0.0),
        )
        # URDF axis lives in the joint (= child-at-zero) frame.  Our joint
        # model wants: local_rot2 = X->axis in the child frame, and
        # local_rot1 = joint-origin rotation ∘ local_rot2 so the frames
        # coincide at q=0.  Anchors: joint origin in the parent, zero in the
        # child.
        if jtype in ("revolute", "continuous"):
            gb = GenericJointBuilder.revolute(axis)
        elif jtype == "prismatic":
            gb = GenericJointBuilder.prismatic(axis)
        elif jtype == "fixed":
            gb = GenericJointBuilder.fixed()
        elif jtype in ("floating", "planar"):
            continue  # free relative motion: no impulse joint
        else:
            continue
        gb.with_local_anchor1(tuple(jpos)).with_local_anchor2((0.0, 0.0, 0.0))
        gb.with_contacts_enabled(False)
        gb.local_frame_rot1 = tuple(
            _quat_mul(jrot, np.asarray(gb.local_frame_rot2))
        )

        limit = j.find("limit")
        if limit is not None and jtype in ("revolute", "prismatic"):
            lo = float(limit.get("lower", 0.0))
            hi = float(limit.get("upper", 0.0))
            if hi > lo:
                axis_idx = 3 if jtype == "revolute" else 0
                gb.with_limits(axis_idx, lo, hi)

        if use_multibody:
            hj = world.insert_multibody_joint(
                handles.bodies[pname], handles.bodies[cname], gb
            )
        else:
            hj = world.insert_impulse_joint(
                handles.bodies[pname], handles.bodies[cname], gb
            )
        handles.joints[j.get("name")] = hj
        handles.joint_names.append(j.get("name"))

    return handles
