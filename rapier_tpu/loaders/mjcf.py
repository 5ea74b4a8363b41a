"""MJCF (MuJoCo XML) robot loader: a practical subset -> bodies/colliders/joints.

Host-side port of the reference mjcf-rs + rapier3d-mjcf semantics
(crates/mjcf-rs/src/loader/*, crates/rapier3d-mjcf/src/conversion.rs): parses
<compiler> options (angle units), <default> class inheritance, nested
<worldbody>/<body> trees with pos/quat/euler/axisangle orientations, geoms
(plane/sphere/box/capsule/cylinder/ellipsoid/mesh with size/fromto semantics),
joints (free/ball/hinge/slide with pos/axis/range), inertials, actuators
(motor/position/velocity -> joint motors driven via `apply_controls`),
sensors (`read_sensors`), and keyframes/mocap (`apply_keyframe`).

Not yet covered (reference parity TODO): composite multi-joint bodies (the
first joint wins; extra hinges degrade to a ball joint).
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
from rapier_tpu.loaders.urdf import _load_mesh_file, _quat_mul, _quat_rotate


def _quat_conj(q):
    return np.array([-q[0], -q[1], -q[2], q[3]])


def _vec(s, default):
    if s is None:
        return np.asarray(default, float)
    return np.asarray([float(x) for x in s.split()], float)


def _axis_angle_quat(axis, angle):
    axis = np.asarray(axis, float)
    n = np.linalg.norm(axis)
    if n < 1e-12:
        return np.array([0.0, 0.0, 0.0, 1.0])
    axis = axis / n
    s = math.sin(angle / 2)
    return np.array([axis[0] * s, axis[1] * s, axis[2] * s, math.cos(angle / 2)])


class _Defaults:
    """<default> class-inheritance resolution (mjcf-rs loader/default)."""

    def __init__(self):
        self.classes: dict[str, dict[str, dict]] = {"main": {}}

    def parse(self, elem, parent="main"):
        # The top-level <default> is the "main" class; nested ones are named.
        name = elem.get("class", "main" if parent == "main" else parent)
        merged = {k: dict(v) for k, v in self.classes.get(parent, {}).items()}
        for child in elem:
            if child.tag == "default":
                continue
            merged.setdefault(child.tag, {})
            merged[child.tag].update(child.attrib)
        self.classes[name] = merged
        for child in elem.findall("default"):
            self.parse(child, name)

    def resolve(self, tag, attrib, cls):
        out = dict(self.classes.get(cls or "main", {}).get(tag, {}))
        out.update(attrib)
        return out


@dataclass
class MjcfActuator:
    name: str
    kind: str            # motor | position | velocity
    joint: str
    gear: float
    kp: float
    kv: float


@dataclass
class MjcfRobotHandles:
    """Loaded-model handles (reference MjcfRobotHandles, runtime.rs)."""

    bodies: dict = field(default_factory=dict)
    joints: dict = field(default_factory=dict)       # joint name -> handle
    joint_axis: dict = field(default_factory=dict)   # joint name -> axis slot
    actuators: list = field(default_factory=list)    # [MjcfActuator]
    joint_order: list = field(default_factory=list)  # qpos order (1-dof joints)
    keyframes: dict = field(default_factory=dict)    # key name -> qpos array
    sensors: list = field(default_factory=list)      # [(name, kind, joint)]
    tendons: dict = field(default_factory=dict)      # name -> [(joint, coef)]
    couplings: list = field(default_factory=list)    # [(ja, jb, ratio, off)]
    equalities: dict = field(default_factory=dict)   # name -> impulse joint id
    gravcomp: dict = field(default_factory=dict)      # body name -> factor
    mocap: list = field(default_factory=list)         # ordered mocap body names
    sites: dict = field(default_factory=dict)         # name -> (body h, local pos)
    spatial_tendons: dict = field(default_factory=dict)  # name -> [site names]
    keyframes_mocap: dict = field(default_factory=dict)  # name -> (mpos, mquat)
    use_multibody: bool = False
    _mb_slots: dict = field(default_factory=dict)    # joint name -> (tree, link)

    def _mb_slot(self, world: PhysicsWorld, jname: str) -> tuple:
        """(tree, link) articulation slot of a multibody-inserted joint."""
        if jname not in self._mb_slots:
            child = world._pending_mb_joints[self.joints[jname]][2]
            self._mb_slots[jname] = world.multibody_link_of(child)
        return self._mb_slots[jname]

    def joint_value(self, world: PhysicsWorld, jname: str) -> float:
        """Current 1-dof joint coordinate (revolute angle / prismatic
        displacement) read from the attached bodies' poses."""
        if self.use_multibody:
            ti, li = self._mb_slot(world, jname)
            ax = self.joint_axis[jname]
            return float(np.asarray(world.state.multibodies.q)[ti, li, ax])
        j = self.joints[jname]
        joints = world.state.joints
        b1 = int(np.asarray(joints.body1[j]))
        b2 = int(np.asarray(joints.body2[j]))
        ax = self.joint_axis[jname]
        q1 = np.asarray(world.body_rotation(b1))
        q2 = np.asarray(world.body_rotation(b2))
        f1 = _quat_mul(q1, np.asarray(joints.local_rot1[j]))
        f2 = _quat_mul(q2, np.asarray(joints.local_rot2[j]))
        if ax >= 3:
            # Relative rotation about the joint axis (frame X by convention).
            qc = np.array([-f1[0], -f1[1], -f1[2], f1[3]])
            qerr = _quat_mul(qc, f2)
            if np.dot(f1, f2) < 0:
                qerr = -qerr
            return float(2.0 * math.asin(np.clip(qerr[0], -1.0, 1.0)))
        p1 = np.asarray(world.body_translation(b1)) + _quat_rotate(
            q1, np.asarray(joints.local_pos1[j])
        )
        p2 = np.asarray(world.body_translation(b2)) + _quat_rotate(
            q2, np.asarray(joints.local_pos2[j])
        )
        axis_w = _quat_rotate(f1, np.array([1.0, 0.0, 0.0]))
        return float(np.dot(p2 - p1, axis_w))

    def joint_velocity(self, world: PhysicsWorld, jname: str) -> float:
        if self.use_multibody:
            ti, li = self._mb_slot(world, jname)
            ax = self.joint_axis[jname]
            mb = world.state.multibodies
            return float(np.asarray(mb.qd)[ti].reshape(mb.l, 6)[li, ax])
        j = self.joints[jname]
        joints = world.state.joints
        b1 = int(np.asarray(joints.body1[j]))
        b2 = int(np.asarray(joints.body2[j]))
        ax = self.joint_axis[jname]
        q1 = np.asarray(world.body_rotation(b1))
        f1 = _quat_mul(q1, np.asarray(joints.local_rot1[j]))
        axis_w = _quat_rotate(f1, np.array([1.0, 0.0, 0.0]))
        if ax >= 3:
            rel = np.asarray(world.body_angvel(b2)) - np.asarray(
                world.body_angvel(b1)
            )
        else:
            rel = np.asarray(world.body_linvel(b2)) - np.asarray(
                world.body_linvel(b1)
            )
        return float(np.dot(rel, axis_w))

    def read_sensors(self, world: PhysicsWorld) -> dict:
        """Evaluate <sensor> readers (reference runtime.rs:677-760
        read_sensor): jointpos / jointvel / framepos supported."""
        out = {}
        for (name, kind, target) in self.sensors:
            if kind == "jointpos":
                out[name] = self.joint_value(world, target)
            elif kind == "jointvel":
                out[name] = self.joint_velocity(world, target)
            elif kind == "framepos":
                h = self.bodies.get(target)
                if h is not None:
                    out[name] = np.asarray(world.body_translation(h))
            elif kind == "tendonpos":
                if target in self.spatial_tendons:
                    out[name] = self.tendon_length(world, target)
        return out

    def site_position(self, world: PhysicsWorld, name: str) -> np.ndarray:
        """World position of a <site> (body pose composed with local pos)."""
        h, local = self.sites[name]
        q = np.asarray(world.body_rotation(h))
        return np.asarray(world.body_translation(h)) + _quat_rotate(q, local)

    def tendon_length(self, world: PhysicsWorld, name: str) -> float:
        """Path length of a <tendon><spatial> through its site waypoints
        (length-only subset of the reference spatial tendons)."""
        pts = [self.site_position(world, s) for s in self.spatial_tendons[name]]
        return float(sum(
            np.linalg.norm(pts[i + 1] - pts[i]) for i in range(len(pts) - 1)
        ))

    def set_mocap_pose(self, world: PhysicsWorld, name: str, pos, quat=None):
        """Teleport a mocap body (reference runtime.rs:141 semantics: mocap
        bodies are kinematic-position-based and user-driven)."""
        import jax.numpy as jnp

        h = self.bodies[name]
        b = world.state.bodies
        pos = jnp.asarray(pos, jnp.float32)
        upd = dict(
            pos=b.pos.at[h].set(pos),
            next_pos=b.next_pos.at[h].set(pos),
        )
        if quat is not None:
            q = jnp.asarray(quat, jnp.float32)
            upd.update(rot=b.rot.at[h].set(q), next_rot=b.next_rot.at[h].set(q))
        world.state = world.state.replace(bodies=b.replace(**upd))

    def apply_gravity_compensation(self, world: PhysicsWorld):
        """Re-assert gravcomp as gravity_scale = 1 - gravcomp (reference
        runtime.rs:38 applies -g*gravcomp*m as a per-frame force; the
        gravity-scale fold is the same dynamics and is already applied at
        load — this call restores it after user gravity_scale edits)."""
        import jax.numpy as jnp

        b = world.state.bodies
        gs = jnp.asarray(b.gravity_scale)
        for name, gc in self.gravcomp.items():
            gs = gs.at[self.bodies[name]].set(1.0 - float(gc))
        world.state = world.state.replace(bodies=b.replace(gravity_scale=gs))

    def apply_keyframe(self, world: PhysicsWorld, name: str):
        """Drive position-actuated joints to a keyframe's qpos (reference
        runtime.rs keyframe utilities).  Multibody-inserted robots teleport
        exactly (generalized coords set directly, dof velocity zeroed; link
        poses realize through FK on the next step); impulse-joint robots are
        driven through their motors instead."""
        import jax.numpy as jnp

        if name in self.keyframes_mocap:
            mpos, mquat = self.keyframes_mocap[name]
            for k, bname in enumerate(self.mocap):
                pos = (mpos[3 * k:3 * k + 3]
                       if mpos is not None and mpos.size >= 3 * (k + 1)
                       else None)
                # MJCF quats are wxyz; engine quats are xyzw.
                qm = None
                if mquat is not None and mquat.size >= 4 * (k + 1):
                    w, x, y, z = mquat[4 * k:4 * k + 4]
                    qm = (x, y, z, w)
                if pos is not None:
                    self.set_mocap_pose(world, bname, pos, qm)
        if name not in self.keyframes:
            return

        q = self.keyframes[name]
        if self.use_multibody:
            mb = world.state.multibodies
            mq = jnp.asarray(mb.q)
            jr = jnp.asarray(mb.joint_rot)
            qd = jnp.asarray(mb.qd)
            for val, jname in zip(q, self.joint_order):
                if jname not in self.joints:
                    continue
                ti, li = self._mb_slot(world, jname)
                ax = self.joint_axis[jname]
                mq = mq.at[ti, li, ax].set(float(val))
                qd = qd.at[ti, li * 6 + ax].set(0.0)
                if ax >= 3:
                    # 1-dof hinge: joint_rot = axis_angle(slot axis, angle)
                    # (multibody integrate keeps these in sync).
                    e = np.zeros(3, np.float32)
                    e[ax - 3] = 1.0
                    half = 0.5 * float(val)
                    rot = np.concatenate(
                        [np.sin(half) * e, [np.cos(half)]]
                    ).astype(np.float32)
                    jr = jr.at[ti, li].set(rot)
            world.state = world.state.replace(multibodies=mb.replace(
                q=mq, joint_rot=jr, qd=qd))
            return
        joints = world.state.joints
        tp = jnp.asarray(joints.motor_target_pos)
        ms = jnp.asarray(joints.motor_stiffness)
        md = jnp.asarray(joints.motor_damping)
        maxes = jnp.asarray(joints.motor_axes)

        for val, jname in zip(q, self.joint_order):
            j = self.joints.get(jname)
            if j is None:
                continue
            ax = self.joint_axis[jname]
            tp = tp.at[j, ax].set(float(val))
            # Ensure a position motor exists to track the keyframe.
            ms = ms.at[j, ax].set(jnp.maximum(ms[j, ax], 500.0))
            md = md.at[j, ax].set(jnp.maximum(md[j, ax], 50.0))
            maxes = maxes.at[j].set(maxes[j] | (1 << ax))
        world.state = world.state.replace(joints=joints.replace(
            motor_target_pos=tp, motor_stiffness=ms, motor_damping=md,
            motor_axes=maxes,
        ))

    def apply_controls(self, world: PhysicsWorld, ctrl):
        """Drive actuators (reference runtime.rs:450-507 apply_controls):
        motor -> target velocity scaled by gear; position -> motor target
        position; velocity -> motor target velocity."""
        import jax.numpy as jnp

        if self.use_multibody:
            mb = world.state.multibodies
            tp = jnp.asarray(mb.motor_target_pos)
            tv = jnp.asarray(mb.motor_target_vel)
            for a, u in zip(self.actuators, np.asarray(ctrl)):
                if a.joint not in self.joints:
                    continue
                ti, li = self._mb_slot(world, a.joint)
                ax = self.joint_axis[a.joint]
                if a.kind == "position":
                    tp = tp.at[ti, li, ax].set(float(u) * a.gear)
                else:
                    tv = tv.at[ti, li, ax].set(float(u) * a.gear)
            world.state = world.state.replace(multibodies=mb.replace(
                motor_target_pos=tp, motor_target_vel=tv))
            return

        joints = world.state.joints
        # Fresh builds carry numpy leaves; .at[] needs device arrays.
        tp = jnp.asarray(joints.motor_target_pos)
        tv = jnp.asarray(joints.motor_target_vel)
        for a, u in zip(self.actuators, np.asarray(ctrl)):
            j = self.joints.get(a.joint)
            if j is None:
                continue
            ax = self.joint_axis[a.joint]
            if a.kind == "position":
                tp = tp.at[j, ax].set(float(u) * a.gear)
            else:
                tv = tv.at[j, ax].set(float(u) * a.gear)
        world.state = world.state.replace(
            joints=joints.replace(motor_target_pos=tp, motor_target_vel=tv)
        )


def _expand_includes(root, base_dir):
    """Recursively splice <include file="..."/> elements (mjcf-rs include
    handling, crates/mjcf-rs/src/loader): the included file's <mujoco>
    children replace the include element in place."""
    for parent in list(root.iter()):
        for child in list(parent):
            if child.tag != "include":
                continue
            fn = child.get("file", "")
            path = os.path.join(base_dir, fn)
            if not os.path.exists(path):
                parent.remove(child)
                continue
            inc = ET.parse(path).getroot()
            _expand_includes(inc, os.path.dirname(path))
            # Splice at the element's CURRENT position — earlier includes
            # under the same parent have already shifted later siblings, so
            # a snapshot index would reorder <default>/<asset> sections
            # (document order affects resolution).
            pos = list(parent).index(child)
            parent.remove(child)
            payload = list(inc) if inc.tag == "mujoco" else [inc]
            for sub in payload:
                parent.insert(pos, sub)
                pos += 1


def _orientation(attrs, angle_scale):
    """MJCF orientation attributes -> quaternion (conversion.rs rotations)."""
    if "quat" in attrs:
        q = _vec(attrs["quat"], (1, 0, 0, 0))  # MJCF order: w x y z
        return np.array([q[1], q[2], q[3], q[0]])
    if "euler" in attrs:
        e = _vec(attrs["euler"], (0, 0, 0)) * angle_scale
        qx = _axis_angle_quat((1, 0, 0), e[0])
        qy = _axis_angle_quat((0, 1, 0), e[1])
        qz = _axis_angle_quat((0, 0, 1), e[2])
        return _quat_mul(_quat_mul(qx, qy), qz)
    if "axisangle" in attrs:
        aa = _vec(attrs["axisangle"], (0, 0, 1, 0))
        return _axis_angle_quat(aa[:3], aa[3] * angle_scale)
    if "zaxis" in attrs:
        z = _vec(attrs["zaxis"], (0, 0, 1))
        z = z / max(np.linalg.norm(z), 1e-12)
        ref = np.array([0.0, 0.0, 1.0])
        c = np.cross(ref, z)
        d = float(np.dot(ref, z))
        if d < -1 + 1e-9:
            return np.array([1.0, 0.0, 0.0, 0.0])
        q = np.array([c[0], c[1], c[2], 1.0 + d])
        return q / np.linalg.norm(q)
    if "xyaxes" in attrs:
        v = _vec(attrs["xyaxes"], (1, 0, 0, 0, 1, 0))
        x = v[:3] / max(np.linalg.norm(v[:3]), 1e-12)
        y = v[3:6] - x * np.dot(x, v[3:6])
        y = y / max(np.linalg.norm(y), 1e-12)
        z = np.cross(x, y)
        m = np.stack([x, y, z], axis=1)
        tr = np.trace(m)
        qw = math.sqrt(max(tr + 1.0, 1e-12)) / 2
        q = np.array([
            (m[2, 1] - m[1, 2]) / (4 * qw),
            (m[0, 2] - m[2, 0]) / (4 * qw),
            (m[1, 0] - m[0, 1]) / (4 * qw),
            qw,
        ])
        return q / np.linalg.norm(q)
    return np.array([0.0, 0.0, 0.0, 1.0])


def _geom_collider(attrs, meshes: dict) -> Optional[ColliderBuilder]:
    gtype = attrs.get("type", "sphere")
    size = _vec(attrs.get("size"), (0.0, 0.0, 0.0))
    fromto = attrs.get("fromto")

    if gtype == "plane":
        cb = ColliderBuilder.halfspace((0, 0, 1))  # plane normal = local +Z
    elif gtype == "sphere":
        cb = ColliderBuilder.ball(size[0])
    elif gtype == "box":
        cb = ColliderBuilder.cuboid(size[0], size[1], size[2])
    elif gtype == "ellipsoid":
        # True ellipsoid (reference rapier3d-mjcf mass.rs): a convex hull of
        # a Fibonacci-sphere sample scaled by the semi-axes.  Collision is
        # the (slightly inscribed) hull; mass properties come from the
        # hull's divergence-theorem integrals, within ~2% of the analytic
        # ellipsoid at 26 samples (vs the round-4 mean-radius ball, which
        # mis-shaped BOTH geometry and inertia).
        a3 = np.asarray(size[:3], np.float64)
        k = np.arange(26, dtype=np.float64) + 0.5
        phi = np.arccos(1.0 - 2.0 * k / 26.0)
        theta = np.pi * (1.0 + 5.0 ** 0.5) * k
        pts = np.stack([
            np.cos(theta) * np.sin(phi),
            np.sin(theta) * np.sin(phi),
            np.cos(phi),
        ], axis=1) * a3[None, :]
        cb = ColliderBuilder.convex_hull(pts)
        # Exact analytic ellipsoid mass properties at unit density (the
        # sampled hull inscribes ~79% of the volume); the build scales by
        # the resolved density (world.py build override).
        from rapier_tpu.geometry.mass_properties import MassProperties
        a_, b_, c_ = float(a3[0]), float(a3[1]), float(a3[2])
        vol = 4.0 / 3.0 * np.pi * a_ * b_ * c_
        cb._mass_props_unit_density = MassProperties(
            vol, np.zeros(3),
            vol / 5.0 * np.array([b_ * b_ + c_ * c_, a_ * a_ + c_ * c_,
                                  a_ * a_ + b_ * b_]),
            np.array([0.0, 0.0, 0.0, 1.0]),
        )
    elif gtype in ("capsule", "cylinder"):
        r = size[0]
        if fromto is not None:
            ft = _vec(fromto, (0, 0, 0, 0, 0, 1))
            a, b = ft[:3], ft[3:6]
            if gtype == "capsule":
                cb = ColliderBuilder.capsule_from_endpoints(a, b, r)
            else:
                mid = (a + b) / 2
                d = b - a
                hh = np.linalg.norm(d) / 2
                cb = ColliderBuilder.cylinder(hh, r)
                z = d / max(np.linalg.norm(d), 1e-12)
                ref = np.array([0.0, 1.0, 0.0])
                c = np.cross(ref, z)
                dd = float(np.dot(ref, z))
                q = np.array([c[0], c[1], c[2], 1.0 + dd])
                q = q / max(np.linalg.norm(q), 1e-12) if dd > -1 + 1e-9 else \
                    np.array([1.0, 0.0, 0.0, 0.0])
                cb.translation = tuple(mid)
                cb.rotation = tuple(q)
                return _apply_geom_material(cb, attrs)
            return _apply_geom_material(cb, attrs)
        else:
            hh = size[1] if len(size) > 1 else 0.5
            if gtype == "capsule":
                cb = ColliderBuilder.capsule_z(hh, r)
            else:
                # MJCF cylinders are along +Z; ours along +Y.
                cb = ColliderBuilder.cylinder(hh, r)
                cb.rotation = tuple(_axis_angle_quat((1, 0, 0), math.pi / 2))
    elif gtype == "mesh":
        m = meshes.get(attrs.get("mesh", ""))
        if m is None:
            return None
        cb = ColliderBuilder.trimesh(m[0], m[1])
    else:
        return None
    return _apply_geom_material(cb, attrs)


def _apply_geom_material(cb: ColliderBuilder, attrs) -> ColliderBuilder:
    if "friction" in attrs:
        fr = _vec(attrs["friction"], (1.0, 0.005, 0.0001))
        cb.friction = float(fr[0])
    if "density" in attrs:
        cb.density = float(attrs["density"])
    if "mass" in attrs:
        cb.mass = float(attrs["mass"])
    contype = int(attrs.get("contype", 1))
    conaffinity = int(attrs.get("conaffinity", 1))
    # contype/conaffinity -> interaction groups (reference hooks.rs).
    cb.collision_groups = ((contype & 0xFFFF) << 16) | (conaffinity & 0xFFFF)
    if contype == 0 and conaffinity == 0:
        cb.collision_groups = 0  # never collides
    return cb


def load_mjcf(path_or_string: str, world: PhysicsWorld, *,
              root_translation=(0.0, 0.0, 0.0),
              use_multibody: bool = False) -> MjcfRobotHandles:
    """Parse an MJCF model and insert it into `world`.

    Note: MJCF is Z-up; scenes built purely from MJCF should set
    world gravity accordingly (e.g. (0, 0, -9.81)) or rotate at insertion.

    `use_multibody=True` inserts the articulation with reduced-coordinate
    multibody joints (reference rapier3d-mjcf insert_using_multibody_joints,
    crates/rapier3d-mjcf/src/conversion.rs) — exact joint kinematics, contacts
    coupled through the articulated mobility; `handles.joints` then maps
    joint names to pending multibody-joint ids and the handle accessors
    (joint_value / apply_controls / apply_keyframe) read and drive the
    generalized coordinates directly.
    """
    if os.path.exists(path_or_string):
        tree = ET.parse(path_or_string)
        root = tree.getroot()
        base_dir = os.path.dirname(path_or_string)
    else:
        root = ET.fromstring(path_or_string)
        base_dir = "."
    assert root.tag == "mujoco", f"not an MJCF file (root <{root.tag}>)"
    _expand_includes(root, base_dir)

    compiler = root.find("compiler")
    angle_unit = (compiler.get("angle", "degree") if compiler is not None
                  else "degree")
    angle_scale = math.pi / 180.0 if angle_unit == "degree" else 1.0
    meshdir = (compiler.get("meshdir", "") if compiler is not None else "")

    defaults = _Defaults()
    for d in root.findall("default"):
        defaults.parse(d)

    # Assets.
    meshes = {}
    asset = root.find("asset")
    if asset is not None:
        for m in asset.findall("mesh"):
            fn = m.get("file", "")
            path = os.path.join(base_dir, meshdir, fn)
            tri = _load_mesh_file(path)
            if tri is not None:
                scale = _vec(m.get("scale"), (1, 1, 1))
                meshes[m.get("name", os.path.splitext(fn)[0])] = (
                    tri[0] * scale, tri[1]
                )

    handles = MjcfRobotHandles()
    handles.use_multibody = use_multibody
    rt = np.asarray(root_translation, float)
    body_world: dict = {}    # body name -> (world pos, world rot) at assembly
    _anchor = [None]

    def insert_joint(p_handle, child_handle, gb):
        if use_multibody:
            return world.insert_multibody_joint(p_handle, child_handle, gb)
        return world.insert_impulse_joint(p_handle, child_handle, gb)

    def world_anchor():
        """Lazy fixed body at the origin: the joint anchor for top-level
        bodies jointed directly to the world (MuJoCo semantics)."""
        if _anchor[0] is None:
            _anchor[0] = world.insert_body(RigidBodyBuilder.fixed())
        return _anchor[0]

    def body_class(elem, inherited):
        return elem.get("childclass", elem.get("class", inherited))

    def insert_geoms(body_handle, elem, cls, is_world):
        for g in elem.findall("geom"):
            attrs = defaults.resolve("geom", g.attrib, g.get("class", cls))
            cb = _geom_collider(attrs, meshes)
            if cb is None:
                continue
            gpos = _vec(attrs.get("pos"), (0, 0, 0))
            grot = _orientation(attrs, angle_scale)
            base_pos = np.asarray(cb.translation)
            base_rot = np.asarray(cb.rotation)
            cb.translation = tuple(gpos + _quat_rotate(grot, base_pos))
            cb.rotation = tuple(_quat_mul(grot, base_rot))
            world.insert_collider(cb, body_handle)

    def walk(elem, parent_handle, parent_pos, parent_rot, cls, is_world):
        cls = body_class(elem, cls)
        for b in elem.findall("body"):
            bcls = body_class(b, cls)
            bpos = _vec(b.get("pos"), (0, 0, 0))
            brot = _orientation(b.attrib, angle_scale)
            wpos = parent_pos + _quat_rotate(parent_rot, bpos)
            wrot = _quat_mul(parent_rot, brot)

            joints = b.findall("joint")
            has_free = any(
                defaults.resolve("joint", j.attrib, j.get("class", bcls))
                .get("type", "hinge") == "free" for j in joints
            )
            fixed_to_parent = len(joints) == 0
            mocap = b.get("mocap", "false") in ("true", "1")

            # A top-level body with no joints is welded to the world
            # (MuJoCo: jointless bodies join the parent's rigid assembly);
            # mocap bodies are kinematic-position-based and user-driven
            # (reference runtime.rs:141 apply_mocap_keyframe semantics).
            if mocap:
                bb = RigidBodyBuilder.kinematic_position_based()
            elif fixed_to_parent and parent_handle is None:
                bb = RigidBodyBuilder.fixed()
            else:
                bb = RigidBodyBuilder.dynamic()
            bb.translation = tuple(wpos)
            bb.rotation = tuple(wrot)
            # Gravity compensation (reference runtime.rs:38
            # apply_gravity_compensation adds -g*gravcomp*m each frame;
            # folding it into gravity_scale = 1 - gravcomp is the same
            # dynamics with zero per-step host work).
            gravcomp = float(b.get("gravcomp", "0") or 0)
            if gravcomp != 0.0 and not mocap:
                bb.gravity_scale = 1.0 - gravcomp
            h = world.insert_body(bb)
            bname = b.get("name", f"body{h}")
            handles.bodies[bname] = h
            if gravcomp != 0.0:
                handles.gravcomp[bname] = gravcomp
            if mocap:
                handles.mocap.append(bname)
            body_world[bname] = (wpos, wrot)
            insert_geoms(h, b, bcls, False)
            for site in b.findall("site"):
                spos = _vec(site.get("pos"), (0, 0, 0))
                handles.sites[site.get("name", f"site{len(handles.sites)}")] \
                    = (h, np.asarray(spos, np.float64))

            # Joints on top-level bodies anchor to a fixed world body; the
            # parent-frame anchor then uses WORLD coordinates.
            p_handle = parent_handle
            a_pos, a_rot = bpos, brot
            if parent_handle is None and joints and not has_free:
                p_handle = world_anchor()
                a_pos, a_rot = wpos, wrot

            if fixed_to_parent and p_handle is not None and not mocap:
                gb = GenericJointBuilder.fixed()
                gb.with_local_anchor1(tuple(a_pos)).with_contacts_enabled(False)
                base1 = np.asarray(gb.local_frame_rot1)
                gb.local_frame_rot1 = tuple(_quat_mul(a_rot, base1))
                insert_joint(p_handle, h, gb)
            elif not has_free and joints and p_handle is not None:
                j = joints[0]
                attrs = defaults.resolve("joint", j.attrib, j.get("class", bcls))
                jtype = attrs.get("type", "hinge")
                jpos = _vec(attrs.get("pos"), (0, 0, 0))       # body-local
                jaxis = _vec(attrs.get("axis"), (0, 0, 1))     # body-local
                n_hinges = sum(
                    1 for jj in joints
                    if defaults.resolve("joint", jj.attrib, jj.get("class", bcls))
                    .get("type", "hinge") == "hinge"
                )
                if jtype == "ball" or n_hinges > 1:
                    gb = GenericJointBuilder.spherical()
                    ax_slot = 3
                elif jtype == "hinge":
                    gb = GenericJointBuilder.revolute(jaxis)  # child-frame axis
                    ax_slot = 3
                elif jtype == "slide":
                    gb = GenericJointBuilder.prismatic(jaxis)
                    ax_slot = 0
                else:
                    gb, ax_slot = None, 0
                if gb is not None:
                    # Anchor at the joint position (jpos is child-body-local).
                    gb.with_local_anchor1(tuple(a_pos + _quat_rotate(a_rot, jpos)))
                    gb.with_local_anchor2(tuple(jpos))
                    gb.with_contacts_enabled(False)
                    if jtype != "ball":
                        # frame2 = X->axis in the child; frame1 = brot ∘ frame2
                        # so the frames coincide at the assembled rest pose.
                        gb.local_frame_rot1 = tuple(
                            _quat_mul(a_rot, np.asarray(gb.local_frame_rot2))
                        )
                    if attrs.get("limited", "false") in ("true", "1") and \
                            "range" in attrs:
                        rng = _vec(attrs["range"], (0, 0))
                        scale = angle_scale if jtype != "slide" else 1.0
                        gb.with_limits(ax_slot, rng[0] * scale, rng[1] * scale)
                    if "damping" in attrs and float(attrs["damping"]) > 0:
                        gb.with_motor_velocity(ax_slot, 0.0, float(attrs["damping"]))
                    name = j.get("name", f"joint{h}")
                    handles.joints[name] = insert_joint(p_handle, h, gb)
                    handles.joint_axis[name] = ax_slot
                    handles.joint_order.append(name)
            walk(b, h, wpos, wrot, bcls, False)

    worldbody = root.find("worldbody")
    if worldbody is not None:
        # World-level geoms attach to a fixed body.
        if worldbody.findall("geom"):
            gb_handle = world.insert_body(RigidBodyBuilder.fixed())
            handles.bodies["world"] = gb_handle
            insert_geoms(gb_handle, worldbody, "main", True)
        walk(worldbody, None, rt, np.array([0.0, 0.0, 0.0, 1.0]), "main", True)

    # Actuators.
    act = root.find("actuator")
    if act is not None:
        for a in act:
            if a.tag not in ("motor", "position", "velocity"):
                continue
            attrs = defaults.resolve(a.tag, a.attrib, a.get("class"))
            name = a.get("name", f"act{len(handles.actuators)}")
            jname = attrs.get("joint", "")
            gear = float(_vec(attrs.get("gear"), (1.0,))[0])
            kp = float(attrs.get("kp", 0.0))
            kv = float(attrs.get("kv", 0.0))
            handles.actuators.append(
                MjcfActuator(name, a.tag, jname, gear, kp, kv)
            )
            # position/velocity actuators configure motor gains up front.
            j = handles.joints.get(jname)
            if j is not None and world.state is None:
                ax = handles.joint_axis[jname]
                gbj = (world._pending_mb_joints[j][0] if use_multibody
                       else world._pending_joints[j][0])
                if a.tag == "position":
                    gbj.with_motor_position(ax, 0.0, kp, kv if kv > 0 else kp * 0.1)
                elif a.tag == "velocity":
                    gbj.with_motor_velocity(ax, 0.0, kv if kv > 0 else 10.0)
                else:
                    gbj.with_motor_velocity(ax, 0.0, 0.0)

    # ------------------------------------------------------------------
    # <tendon><fixed> + <equality> (reference mjcf-rs tendon.rs/equality.rs;
    # materialization mirrors rapier3d-mjcf conversion.rs:567-730).
    # ------------------------------------------------------------------
    def _joint_child_and_axis(jname):
        j = handles.joints.get(jname)
        if j is None:
            return None
        ax = handles.joint_axis[jname]
        if use_multibody:
            child = world._pending_mb_joints[j][2]
        else:
            child = world._pending_joints[j][2]
        return child, ax

    def _add_coupling(jname_a, jname_b, ratio, offset):
        """q_a = ratio * q_b + offset.  Multibody insertion only (the
        reference applies tendon/equality couplings through
        insert_using_multibody_joints as well)."""
        if not use_multibody:
            return False
        a = _joint_child_and_axis(jname_a)
        b = _joint_child_and_axis(jname_b)
        if a is None or b is None:
            return False
        world.insert_dof_coupling(a[0], a[1], b[0], b[1], ratio, offset)
        handles.couplings.append((jname_a, jname_b, ratio, offset))
        return True

    tend = root.find("tendon")
    if tend is not None:
        # <tendon><spatial>: length-only subset (the site-waypoint path
        # length, read back via tendon_length / <sensor><tendonpos>;
        # reference mjcf-rs tendon.rs spatial routing).
        for t in tend.findall("spatial"):
            names = [s.get("site", "") for s in t.findall("site")]
            names = [s for s in names if s in handles.sites]
            if len(names) >= 2:
                handles.spatial_tendons[
                    t.get("name", f"tendon{len(handles.spatial_tendons)}")
                ] = names
        for t in tend.findall("fixed"):
            terms = [(tj.get("joint", ""), float(tj.get("coef", 1.0)))
                     for tj in t.findall("joint")]
            terms = [(j, c) for (j, c) in terms if j in handles.joints]
            handles.tendons[t.get("name", f"tendon{len(handles.tendons)}")] = terms
            # Co-actuation coupling: q_k = (coef_k / coef_0) * q_0
            # (conversion.rs materialize_tendons).
            if len(terms) >= 2 and terms[0][1] != 0.0:
                j0, c0 = terms[0]
                for jk, ck in terms[1:]:
                    _add_coupling(jk, j0, ck / c0, 0.0)

    eq = root.find("equality")
    if eq is not None:
        for e in eq:
            if e.get("active", "true") in ("false", "0"):
                continue
            if e.tag == "joint":
                poly = _vec(e.get("polycoef"), (0.0, 1.0, 0.0, 0.0, 0.0))
                # q2 = polycoef[1]*q1 + polycoef[0] (linear term only;
                # rapier coordinates already subtract ref, conversion.rs
                # materialize_joint_equality).
                j1, j2 = e.get("joint1", ""), e.get("joint2", "")
                if j2:
                    _add_coupling(j2, j1, float(poly[1]), float(poly[0]))
            elif e.tag in ("connect", "weld"):
                b1n, b2n = e.get("body1", ""), e.get("body2", "")
                h1 = handles.bodies.get(b1n)
                h2 = handles.bodies.get(b2n) if b2n else world_anchor()
                if h1 is None or h2 is None:
                    continue
                idq = np.array([0.0, 0.0, 0.0, 1.0])
                p1, r1 = body_world.get(b1n, (np.zeros(3), idq))
                # body2 omitted = the world anchor body (fixed at origin).
                p2, r2 = body_world.get(b2n, (np.zeros(3), idq))
                if e.tag == "connect":
                    anchor = _vec(e.get("anchor"), (0, 0, 0))
                    wanchor = p1 + _quat_rotate(r1, anchor)
                    gb = GenericJointBuilder.spherical()
                    gb.with_local_anchor1(tuple(anchor))
                    gb.with_local_anchor2(tuple(
                        _quat_rotate(_quat_conj(r2), wanchor - p2)))
                else:
                    gb = GenericJointBuilder.fixed()
                    gb.with_local_anchor1(tuple(
                        _quat_rotate(_quat_conj(r1), p2 - p1)))
                    gb.local_frame_rot1 = tuple(_quat_mul(_quat_conj(r1), r2))
                gb.with_contacts_enabled(False)
                # Equality constraints are IMPULSE joints even in multibody
                # mode: they may close kinematic loops the reduced-coordinate
                # tree cannot represent (conversion.rs equality_joints).
                name = e.get("name", f"eq{len(handles.equalities)}")
                handles.equalities[name] = world.insert_impulse_joint(
                    h1, h2, gb)

    # Keyframes (reference keyframe/mocap utilities, runtime.rs:677-760).
    kf = root.find("keyframe")
    if kf is not None:
        for k in kf.findall("key"):
            kname = k.get("name", f"key{len(handles.keyframes)}")
            qpos = k.get("qpos")
            if qpos:
                handles.keyframes[kname] = (
                    np.asarray([float(x) for x in qpos.split()])
                )
            mpos, mquat = k.get("mpos"), k.get("mquat")
            if mpos or mquat:
                handles.keyframes_mocap[kname] = (
                    np.asarray([float(x) for x in mpos.split()])
                    if mpos else None,
                    np.asarray([float(x) for x in mquat.split()])
                    if mquat else None,
                )

    # Sensors: jointpos / jointvel / framepos readers.
    sens = root.find("sensor")
    if sens is not None:
        for s in sens:
            if s.tag in ("jointpos", "jointvel"):
                handles.sensors.append(
                    (s.get("name", s.tag), s.tag, s.get("joint", ""))
                )
            elif s.tag == "framepos":
                handles.sensors.append(
                    (s.get("name", s.tag), s.tag, s.get("objname", ""))
                )
            elif s.tag == "tendonpos":
                handles.sensors.append(
                    (s.get("name", s.tag), s.tag, s.get("tendon", ""))
                )

    return handles
