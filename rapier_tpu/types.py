"""Core SoA state pytrees and simulation parameters.

Design (SURVEY.md §7): the reference's arena-of-structs sets (`RigidBodySet`,
`ColliderSet`, reference src/dynamics/rigid_body_set.rs:70,
src/geometry/collider_set.rs:49) become fixed-capacity structure-of-arrays
pytrees.  Every array has a static leading capacity axis so the whole step is
jit/vmap-able; "free slots" are rows with their valid/enabled mask off.

All dataclasses here are registered pytrees (flax.struct), so a `SceneState`
checkpoints via orbax/np.savez trivially and `jax.vmap` over a leading scene
axis gives batched simulation.
"""

from __future__ import annotations

import enum
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct


class BodyType(enum.IntEnum):
    """Mirrors reference RigidBodyType (src/dynamics/rigid_body_components.rs:27)."""

    DYNAMIC = 0
    FIXED = 1
    KINEMATIC_POSITION_BASED = 2
    KINEMATIC_VELOCITY_BASED = 3


class ShapeType(enum.IntEnum):
    """Shape zoo ids (reference: parry shapes, src/geometry/collider.rs:688-1108).

    Parameters live in ``Colliders.shape_params`` (see layout table in
    geometry/shapes.py).
    """

    BALL = 0
    CUBOID = 1
    CAPSULE = 2
    HALFSPACE = 3
    CYLINDER = 4
    CONE = 5
    SEGMENT = 6
    TRIANGLE = 7
    ROUND_CUBOID = 8
    ROUND_CYLINDER = 9
    ROUND_CONE = 10
    CONVEX = 11      # convex polyhedron: vertex range into scene vertex table
    TRIMESH = 12     # triangle range into scene triangle table
    HEIGHTFIELD = 13
    POLYLINE = 14
    COMPOUND = 15    # expanded into child colliders at build time
    VOXELS = 16


class CoefficientCombineRule(enum.IntEnum):
    """Mirrors reference CoefficientCombineRule (src/dynamics/coefficient_combine_rule.rs)."""

    AVERAGE = 0
    MIN = 1
    MULTIPLY = 2
    MAX = 3


# Locked-axes bit flags, mirroring reference LockedAxes
# (src/dynamics/rigid_body_components.rs:271).
LOCK_TRANSLATION_X = 1 << 0
LOCK_TRANSLATION_Y = 1 << 1
LOCK_TRANSLATION_Z = 1 << 2
LOCK_ROTATION_X = 1 << 3
LOCK_ROTATION_Y = 1 << 4
LOCK_ROTATION_Z = 1 << 5

# JointAxesMask bits (reference src/dynamics/joint/generic_joint.rs:22-90).
JOINT_AXIS_LIN_X = 1 << 0
JOINT_AXIS_LIN_Y = 1 << 1
JOINT_AXIS_LIN_Z = 1 << 2
JOINT_AXIS_ANG_X = 1 << 3
JOINT_AXIS_ANG_Y = 1 << 4
JOINT_AXIS_ANG_Z = 1 << 5
JOINT_LIN_AXES = 0b000111
JOINT_ANG_AXES = 0b111000

# Number of potential constraint-row slots per joint lane (see
# dynamics/solver/joint_constraints.py slot layout).
MAX_JOINT_ROWS = 21


class MotorModel(enum.IntEnum):
    """Reference MotorModel (src/dynamics/joint/motor_model.rs)."""

    ACCELERATION_BASED = 0
    FORCE_BASED = 1


# ActiveEvents bit flags (reference src/pipeline/event_handler.rs:33).
ACTIVE_EVENTS_COLLISION = 1 << 0
ACTIVE_EVENTS_CONTACT_FORCE = 1 << 1

# ActiveHooks bit flags (reference src/pipeline/physics_hooks.rs).
ACTIVE_HOOKS_FILTER_CONTACT_PAIR = 1 << 0
ACTIVE_HOOKS_FILTER_INTERSECTION_PAIR = 1 << 1
ACTIVE_HOOKS_MODIFY_SOLVER_CONTACTS = 1 << 2


class ActiveCollisionTypes(enum.IntFlag):
    """Which body-type combinations a collider computes contacts for
    (reference src/geometry/collider_components.rs:282; bit layout identical:
    group-of-4 selected by one type, bit-within-group by the other, tested
    symmetrically)."""

    DYNAMIC_DYNAMIC = 0b0000_0000_0000_0001
    DYNAMIC_KINEMATIC = 0b0000_0000_0000_1100
    DYNAMIC_FIXED = 0b0000_0000_0000_0010
    KINEMATIC_KINEMATIC = 0b1100_1100_0000_0000
    KINEMATIC_FIXED = 0b0010_0010_0000_0000
    FIXED_FIXED = 0b0000_0000_0010_0000


ACTIVE_COLLISION_TYPES_DEFAULT = int(
    ActiveCollisionTypes.DYNAMIC_DYNAMIC
    | ActiveCollisionTypes.DYNAMIC_KINEMATIC
    | ActiveCollisionTypes.DYNAMIC_FIXED
)

MAX_MANIFOLD_POINTS = 4  # 3D manifold cap (reference src/lib.rs:328)


@struct.dataclass
class Bodies:
    """Rigid-body SoA state, leading axis = body capacity N.

    Mirrors reference RigidBody fields (src/dynamics/rigid_body.rs:48,
    src/dynamics/rigid_body_components.rs).
    """

    # Pose of the body origin (not COM). Quaternions are (x, y, z, w).
    pos: jax.Array          # [N, 3]
    rot: jax.Array          # [N, 4]
    linvel: jax.Array       # [N, 3]
    angvel: jax.Array       # [N, 3]
    # Persistent user forces/torques (cleared only by reset_forces, reference
    # test src/pipeline/physics_pipeline.rs:1336-1415).
    force: jax.Array        # [N, 3]
    torque: jax.Array       # [N, 3]
    # Mass properties (local frame): COM, inverse mass, inverse principal
    # inertia + principal frame (reference MassProperties).
    local_com: jax.Array             # [N, 3]
    inv_mass: jax.Array              # [N]
    inv_principal_inertia: jax.Array # [N, 3]
    principal_frame: jax.Array       # [N, 4] quaternion
    # Flags / per-body config.
    body_type: jax.Array       # [N] int32 (BodyType)
    enabled: jax.Array         # [N] bool
    locked_axes: jax.Array     # [N] int32 bitmask
    gravity_scale: jax.Array   # [N]
    linear_damping: jax.Array  # [N]
    angular_damping: jax.Array # [N]
    dominance: jax.Array       # [N] int32 (-127..127)
    gyro_enabled: jax.Array    # [N] bool
    # Multibody link marker: the body is driven by a reduced-coordinate
    # articulation (dynamics/multibody.py).  Links are typed kinematic for
    # pose advancement but participate in the contact solve with articulated
    # mobility masses (two-way coupling; reference expresses this as generic
    # constraint rows, generic_contact_constraint.rs:392).
    mb_link: jax.Array         # [N] bool
    # Sleeping (reference RigidBodyActivation, rigid_body_components.rs:1193).
    can_sleep: jax.Array       # [N] bool
    sleeping: jax.Array        # [N] bool
    sleep_timer: jax.Array     # [N] f32 (time_since_can_sleep)
    # CCD.
    ccd_enabled: jax.Array         # [N] bool
    soft_ccd_prediction: jax.Array # [N] f32
    # Kinematic targets (next_position, reference rigid_body.rs).
    next_pos: jax.Array        # [N, 3]
    next_rot: jax.Array        # [N, 4]
    # User data (opaque).
    user_data: jax.Array       # [N] int32

    @property
    def n(self) -> int:
        return self.pos.shape[-2]

    def is_dynamic(self) -> jax.Array:
        return self.body_type == BodyType.DYNAMIC

    def is_kinematic(self) -> jax.Array:
        return (self.body_type == BodyType.KINEMATIC_POSITION_BASED) | (
            self.body_type == BodyType.KINEMATIC_VELOCITY_BASED
        )


@struct.dataclass
class Colliders:
    """Collider SoA state, leading axis = collider capacity C.

    Mirrors reference Collider (src/geometry/collider.rs:51).
    """

    parent: jax.Array        # [C] int32 body index, -1 = no parent (static)
    local_pos: jax.Array     # [C, 3] pose w.r.t. parent (or world if no parent)
    local_rot: jax.Array     # [C, 4]
    shape_type: jax.Array    # [C] int32 (ShapeType)
    shape_params: jax.Array  # [C, 12] padded per-shape parameter table
    friction: jax.Array      # [C]
    restitution: jax.Array   # [C]
    friction_combine: jax.Array     # [C] int32 (CoefficientCombineRule)
    restitution_combine: jax.Array  # [C] int32
    # InteractionGroups packed as memberships<<16 | filter
    # (reference src/geometry/interaction_groups.rs).
    collision_groups: jax.Array  # [C] uint32
    solver_groups: jax.Array     # [C] uint32
    sensor: jax.Array        # [C] bool
    enabled: jax.Array       # [C] bool
    contact_skin: jax.Array  # [C]
    active_events: jax.Array # [C] int32 bitmask
    active_hooks: jax.Array  # [C] int32 bitmask
    contact_force_event_threshold: jax.Array  # [C]
    user_data: jax.Array     # [C] int32
    # ActiveCollisionTypes bitmask (reference collider_components.rs:282):
    # which body-type combinations this collider computes contacts for.
    active_collision_types: jax.Array  # [C] int32

    @property
    def n(self) -> int:
        return self.parent.shape[-1]


@struct.dataclass
class Contacts:
    """Persistent contact-pair state (warmstart cache + event bookkeeping).

    The analog of the reference's ContactPair/ContactData warmstart fields
    (src/geometry/contact_pair.rs:34-51) that must round-trip through
    snapshots.  LAYOUT: pair-lane axis LAST (see ManifoldBatch) — TPU pads
    the trailing two dims to (8, 128) tiles, so [P, 4, 3] row-major storage
    bloats ~85x in HBM and on every read.
    """

    # pair_key = c1 * C + c2 with c1 < c2; -1 for empty slots.
    pair_key: jax.Array      # [P] int32
    # Body indices resolved at generation time (-1 = static environment).
    body1: jax.Array         # [P] int32
    body2: jax.Array         # [P] int32
    collider1: jax.Array     # [P] int32
    collider2: jax.Array     # [P] int32
    # Manifold: world normal points from collider1 towards collider2
    # (reference manifold convention: data.normal, force_dir1 = -normal).
    normal: jax.Array        # [3, P]
    # Contact points: midpoint between surfaces, in world space, plus signed
    # distance (< 0 penetrating).
    point: jax.Array         # [4, 3, P]
    dist: jax.Array          # [4, P]
    feature_id: jax.Array    # [4, P] int32, -1 = inactive point
    point_active: jax.Array  # [4, P] bool (solver contact kept)
    num_points: jax.Array    # [P] int32
    active: jax.Array        # [P] bool (manifold has >=1 point this step)
    touching: jax.Array      # [P] bool (any dist < 0 or within skin: for events)
    # Warmstart caches (per point / per manifold; the twist friction model
    # stores ONE tangent pair + one twist impulse per manifold).
    warmstart_impulse: jax.Array          # [4, P]
    warmstart_tangent_impulse: jax.Array  # [2, P]
    warmstart_twist_impulse: jax.Array    # [P]
    # Total impulses from last step (for contact-force events / queries).
    impulse: jax.Array           # [4, P]
    tangent_impulse: jax.Array   # [2, P]
    # Effective material at this pair.
    friction: jax.Array      # [P]
    restitution: jax.Array   # [P]
    # OR of the two colliders' ActiveEvents flags (persisted so stopped-event
    # gating needs no collider gathers next step).
    events_or: jax.Array     # [P] int32

    @property
    def max_pairs(self) -> int:
        return self.pair_key.shape[-1]


# The empty_* constructors build HOST (numpy) arrays on purpose: device
# arrays here would force device->host copies during scene construction
# (world.build copies these into numpy), and on the TPU tunnel a single D2H
# transfer flips the whole process into a ~100x slower dispatch mode.  Numpy
# leaves are valid jit inputs; the H2D upload happens at the first step.
import numpy as _np

from rapier_tpu import precision as _prec


def _f(shape):
    return _np.zeros(shape, dtype=_prec.NP_FLOAT)


def _i(shape, fill=0):
    return _np.full(shape, fill, dtype=_np.int32)


def _b(shape, fill=False):
    return _np.full(shape, fill, dtype=bool)


def _quat_id(n: int):
    q = _np.zeros((n, 4), _prec.NP_FLOAT)
    q[:, 3] = 1.0
    return q


def empty_bodies(n: int) -> Bodies:
    quat_id = _quat_id(n)
    return Bodies(
        pos=_f((n, 3)), rot=quat_id, linvel=_f((n, 3)), angvel=_f((n, 3)),
        force=_f((n, 3)), torque=_f((n, 3)),
        local_com=_f((n, 3)), inv_mass=_f((n,)),
        inv_principal_inertia=_f((n, 3)), principal_frame=quat_id,
        body_type=_i((n,), int(BodyType.FIXED)), enabled=_b((n,)),
        locked_axes=_i((n,)), gravity_scale=_np.ones((n,), _prec.NP_FLOAT),
        linear_damping=_f((n,)), angular_damping=_f((n,)),
        dominance=_i((n,)), gyro_enabled=_b((n,)), mb_link=_b((n,)),
        can_sleep=_b((n,), True), sleeping=_b((n,)), sleep_timer=_f((n,)),
        ccd_enabled=_b((n,)), soft_ccd_prediction=_f((n,)),
        next_pos=_f((n, 3)), next_rot=quat_id,
        user_data=_i((n,)),
    )


def empty_colliders(c: int) -> Colliders:
    quat_id = _quat_id(c)
    return Colliders(
        parent=_i((c,), -1), local_pos=_f((c, 3)), local_rot=quat_id,
        shape_type=_i((c,), int(ShapeType.BALL)), shape_params=_f((c, 12)),
        friction=_np.full((c,), 0.5, _prec.NP_FLOAT), restitution=_f((c,)),
        friction_combine=_i((c,)), restitution_combine=_i((c,)),
        collision_groups=_np.full((c,), 0xFFFF_FFFF, _np.uint32),
        solver_groups=_np.full((c,), 0xFFFF_FFFF, _np.uint32),
        sensor=_b((c,)), enabled=_b((c,)), contact_skin=_f((c,)),
        active_events=_i((c,)), active_hooks=_i((c,)),
        contact_force_event_threshold=_np.full((c,), _np.inf, _prec.NP_FLOAT),
        user_data=_i((c,)),
        active_collision_types=_np.full(
            (c,), ACTIVE_COLLISION_TYPES_DEFAULT, _np.int32),
    )


def empty_contacts(p: int, per_point_tangent: bool = False) -> Contacts:
    """per_point_tangent widens the tangent warmstart caches to [4, 2, P]
    for FrictionModel.COULOMB (per-contact-point tangent impulses, the
    reference ContactData layout contact_pair.rs:34-51); the default twist
    model stores one tangent pair per manifold."""
    tan_shape = (4, 2, p) if per_point_tangent else (2, p)
    return Contacts(
        pair_key=_i((p,), -1), body1=_i((p,), -1), body2=_i((p,), -1),
        collider1=_i((p,), -1), collider2=_i((p,), -1),
        normal=_f((3, p)), point=_f((4, 3, p)), dist=_f((4, p)),
        feature_id=_i((4, p), -1), point_active=_b((4, p)),
        num_points=_i((p,)), active=_b((p,)), touching=_b((p,)),
        warmstart_impulse=_f((4, p)), warmstart_tangent_impulse=_f(tan_shape),
        warmstart_twist_impulse=_f((p,)),
        impulse=_f((4, p)), tangent_impulse=_f(tan_shape),
        friction=_f((p,)), restitution=_f((p,)),
        events_or=_i((p,)),
    )


@struct.dataclass
class Joints:
    """Impulse-joint SoA state, leading axis = joint capacity J.

    One unified axis-based model covers every joint type (reference
    GenericJoint, src/dynamics/joint/generic_joint.rs:260): a bitmask of
    locked axes plus per-axis limits and motors.  Typed builders (revolute,
    prismatic, ...) are sugar over this (world.py).
    """

    body1: jax.Array        # [J] int32
    body2: jax.Array        # [J] int32
    # Local joint frames w.r.t. each body's origin frame.
    local_pos1: jax.Array   # [J, 3]
    local_rot1: jax.Array   # [J, 4]
    local_pos2: jax.Array   # [J, 3]
    local_rot2: jax.Array   # [J, 4]
    locked_axes: jax.Array  # [J] int32 bitmask
    limit_axes: jax.Array   # [J] int32
    motor_axes: jax.Array   # [J] int32
    coupled_axes: jax.Array # [J] int32
    limit_min: jax.Array    # [J, 6]
    limit_max: jax.Array    # [J, 6]
    motor_target_pos: jax.Array  # [J, 6]
    motor_target_vel: jax.Array  # [J, 6]
    motor_stiffness: jax.Array   # [J, 6]
    motor_damping: jax.Array     # [J, 6]
    motor_max_force: jax.Array   # [J, 6]
    motor_model: jax.Array       # [J, 6] int32 (MotorModel)
    # Per-joint constraint softness (SpringCoefficients, joint defaults).
    softness_frequency: jax.Array  # [J]
    softness_damping: jax.Array    # [J]
    contacts_enabled: jax.Array    # [J] bool
    enabled: jax.Array             # [J] bool
    # Last-step impulses per row slot (user-facing queries / diagnostics).
    impulses: jax.Array            # [J, MAX_JOINT_ROWS]

    @property
    def n(self) -> int:
        return self.body1.shape[-1]


def empty_joints(j: int) -> Joints:
    quat_id = _quat_id(j)
    return Joints(
        body1=_i((j,), -1), body2=_i((j,), -1),
        local_pos1=_f((j, 3)), local_rot1=quat_id,
        local_pos2=_f((j, 3)), local_rot2=quat_id,
        locked_axes=_i((j,)), limit_axes=_i((j,)), motor_axes=_i((j,)),
        coupled_axes=_i((j,)),
        limit_min=_np.full((j, 6), -_np.inf, _prec.NP_FLOAT),
        limit_max=_np.full((j, 6), _np.inf, _prec.NP_FLOAT),
        motor_target_pos=_f((j, 6)), motor_target_vel=_f((j, 6)),
        motor_stiffness=_f((j, 6)), motor_damping=_f((j, 6)),
        motor_max_force=_np.full((j, 6), 3.4e38, _prec.NP_FLOAT),
        motor_model=_i((j, 6)),
        softness_frequency=_np.full((j,), 1.0e6, _prec.NP_FLOAT),
        softness_damping=_np.ones((j,), _prec.NP_FLOAT),
        contacts_enabled=_b((j,), True), enabled=_b((j,)),
        impulses=_f((j, MAX_JOINT_ROWS)),
    )


class FrictionModel(enum.IntEnum):
    """3D friction model (reference integration_parameters.rs:17-31)."""

    SIMPLIFIED = 0  # 1 tangent + 1 twist constraint per manifold (default)
    COULOMB = 1     # per-contact-point tangent constraints


class BroadPhaseKind(enum.IntEnum):
    ALL_PAIRS = 0   # O(C^2) masked test; best for small scenes (RL batches)
    SAP = 1         # sort-based sweep-and-prune with fixed window
    GRID = 2        # uniform cell grid; COMPLETE for dense 3D piles (SAP
                    # windows cannot cover them — broadphase.py rationale)


@struct.dataclass
class SimParams:
    """Runtime simulation parameters.

    Mirrors reference IntegrationParameters
    (src/dynamics/integration_parameters.rs:170-328).  Float fields are traced
    (can change without recompile); int/enum fields marked static control
    compiled loop structure.
    """

    dt: jax.Array = struct.field(default_factory=lambda: _prec.NP_FLOAT(1.0 / 60.0))
    gravity: jax.Array = struct.field(
        default_factory=lambda: _np.array([0.0, -9.81, 0.0], _prec.NP_FLOAT)
    )
    length_unit: jax.Array = struct.field(default_factory=lambda: _prec.NP_FLOAT(1.0))
    contact_natural_frequency: jax.Array = struct.field(
        default_factory=lambda: _prec.NP_FLOAT(30.0)
    )
    contact_damping_ratio: jax.Array = struct.field(
        default_factory=lambda: _prec.NP_FLOAT(5.0)
    )
    joint_natural_frequency: jax.Array = struct.field(
        default_factory=lambda: _prec.NP_FLOAT(1.0e6)
    )
    joint_damping_ratio: jax.Array = struct.field(
        default_factory=lambda: _prec.NP_FLOAT(1.0)
    )
    warmstart_coefficient: jax.Array = struct.field(
        default_factory=lambda: _prec.NP_FLOAT(1.0)
    )
    normalized_allowed_linear_error: jax.Array = struct.field(
        default_factory=lambda: _prec.NP_FLOAT(0.001)
    )
    normalized_max_corrective_velocity: jax.Array = struct.field(
        default_factory=lambda: _prec.NP_FLOAT(10.0)
    )
    normalized_prediction_distance: jax.Array = struct.field(
        default_factory=lambda: _prec.NP_FLOAT(0.002)
    )
    # Sleeping thresholds (reference rigid_body_components.rs:1226-1239).
    sleep_linear_threshold: jax.Array = struct.field(
        default_factory=lambda: _prec.NP_FLOAT(0.4)
    )
    sleep_angular_threshold: jax.Array = struct.field(
        default_factory=lambda: _prec.NP_FLOAT(0.5)
    )
    time_until_sleep: jax.Array = struct.field(
        default_factory=lambda: _prec.NP_FLOAT(2.0)
    )
    # --- static (recompile on change) ---
    num_solver_iterations: int = struct.field(pytree_node=False, default=4)
    num_internal_pgs_iterations: int = struct.field(pytree_node=False, default=1)
    num_internal_stabilization_iterations: int = struct.field(
        pytree_node=False, default=1
    )
    max_ccd_substeps: int = struct.field(pytree_node=False, default=1)
    friction_model: int = struct.field(
        pytree_node=False, default=int(FrictionModel.SIMPLIFIED)
    )
    broad_phase: int = struct.field(
        pytree_node=False, default=int(BroadPhaseKind.ALL_PAIRS)
    )
    sap_window: int = struct.field(pytree_node=False, default=64)
    # Luby-coloring round budget.  Measured chromatic numbers: ~8 for the
    # mixed-primitives drop, ~12 for tall pyramids; overflow lanes degrade to
    # Jacobi in the last color (soft-constraint cfm keeps that stable).
    max_colors: int = struct.field(pytree_node=False, default=16)
    # Solver-lane compaction cap: when 0 < max_solver_pairs < max_pairs, the
    # touching pairs are stream-compacted into this many lanes before
    # coloring + the contact solve (and impulses scattered back).  Broad/
    # narrow-phase capacity stays max_pairs; this right-sizes only the
    # O(substeps x colors) sweep working set, which otherwise pays for every
    # candidate lane.  Overflowing touching pairs are dropped from the solve
    # for one step and counted in StepEvents.solver_overflow.  The reference
    # has no analog (it allocates constraints exactly; we need static shapes).
    max_solver_pairs: int = struct.field(pytree_node=False, default=0)
    # Mesh narrow phase: lanes reserved for (convex, mesh) pairs and candidate
    # triangles per such pair (geometry/narrowphase_mesh.py).
    max_mesh_pairs: int = struct.field(pytree_node=False, default=64)
    tris_per_pair: int = struct.field(pytree_node=False, default=8)
    # CCD motion clamping (dynamics/ccd.py).  world.build() turns this on
    # automatically when any body has ccd_enabled.
    enable_ccd: bool = struct.field(pytree_node=False, default=False)
    sleep_propagation_iters: int = struct.field(pytree_node=False, default=16)
    sleeping_enabled: bool = struct.field(pytree_node=False, default=True)
    # Shape types present in the scene (static; sorted tuple of ShapeType ints).
    # Empty = unknown: the narrow-phase dispatcher must run every kernel.
    # world.build() fills this so scenes pay only for the kernels they need.
    shape_types_present: tuple = struct.field(pytree_node=False, default=())
    # Contact-sweep backend: "auto" = VMEM-resident Pallas kernel on TPU,
    # pure-JAX color loop elsewhere; "jax"/"pallas" force a path ("pallas"
    # off-TPU runs the kernel in interpret mode — slow, for tests).
    solver_backend: str = struct.field(pytree_node=False, default="auto")
    # 2D block solver: manifold points (0, 1) solved as one coupled 2x2 MLCP
    # (reference BLOCK_SOLVER_ENABLED = dim2, integration_parameters.rs:9).
    # PhysicsWorld2D turns this on; forces the pure-JAX sweep.
    block_solver_2x2: bool = struct.field(pytree_node=False, default=False)

    # -- derived soft-constraint coefficients (SpringCoefficients,
    #    reference integration_parameters.rs:74-138) --
    def inv_dt(self):
        return jnp.where(self.dt == 0.0, 0.0, 1.0 / self.dt)

    def allowed_linear_error(self):
        return self.normalized_allowed_linear_error * self.length_unit

    def max_corrective_velocity(self):
        return self.normalized_max_corrective_velocity * self.length_unit

    def prediction_distance(self):
        return self.normalized_prediction_distance * self.length_unit


def spring_erp_inv_dt(natural_frequency, damping_ratio, dt):
    """erp/dt for a soft constraint (reference integration_parameters.rs:80-83)."""
    ang_freq = natural_frequency * (2.0 * jnp.pi)
    return ang_freq / (dt * ang_freq + 2.0 * damping_ratio)


def spring_cfm_factor(natural_frequency, damping_ratio, dt):
    """cfm_factor = 1/(1+cfm_coeff) (reference integration_parameters.rs:96-138)."""
    erp = dt * spring_erp_inv_dt(natural_frequency, damping_ratio, dt)
    # Guard: erp==0 => rigid constraint => cfm_coeff = 0.
    safe_erp = jnp.where(erp == 0.0, 1.0, erp)
    inv_erp_m1 = 1.0 / safe_erp - 1.0
    cfm_coeff = inv_erp_m1 * inv_erp_m1 / (
        (1.0 + inv_erp_m1) * 4.0 * damping_ratio * damping_ratio
    )
    cfm_coeff = jnp.where(erp == 0.0, 0.0, cfm_coeff)
    return 1.0 / (1.0 + cfm_coeff)


@struct.dataclass
class MeshData:
    """Shared static mesh tables for trimesh/heightfield colliders.

    Colliders of type TRIMESH/HEIGHTFIELD store (tri_start, tri_count) in
    shape_params[0:2]; triangle vertices are COLLIDER-LOCAL.  Heightfields are
    triangulated at build time (the reference's HeightField::to_trimesh path)."""

    vertices: jax.Array   # [V, 3]
    triangles: jax.Array  # [T, 3] int32 (padded rows = -1)

    @property
    def n_triangles(self) -> int:
        return self.triangles.shape[-2]


def empty_meshes(v: int, t: int) -> MeshData:
    return MeshData(
        vertices=_f((v, 3)),
        triangles=_i((t, 3), -1),
    )


MAX_HULL_VERTS = 32  # padded per-hull vertex slots (decimated at build)


@struct.dataclass
class ConvexHulls:
    """Shared vertex table for CONVEX colliders: [H, MAX_HULL_VERTS, 3],
    local frame, padded by repeating the first vertex (keeps the support
    argmax exact).  A CONVEX collider stores its hull index in
    shape_params[0], its border radius in [1], local AABB in [2:8]."""

    vertices: jax.Array   # [H, MAX_HULL_VERTS, 3]

    @property
    def n(self) -> int:
        return self.vertices.shape[-3]


def empty_hulls(h: int) -> ConvexHulls:
    return ConvexHulls(vertices=_f((h, MAX_HULL_VERTS, 3)))


@struct.dataclass
class SceneState:
    """Full simulation state for one scene: the snapshot/checkpoint unit.

    The analog of the reference's serialized set bundle (SURVEY §5.4) —
    a flat pytree of arrays, checkpointable via orbax / np.savez.
    """

    bodies: Bodies
    colliders: Colliders
    contacts: Contacts
    joints: Optional[Any] = None       # Joints pytree
    meshes: Optional[MeshData] = None  # trimesh/heightfield tables
    multibodies: Optional[Any] = None  # dynamics.multibody.Multibodies
    hulls: Optional[Any] = None        # ConvexHulls vertex table
    step_count: jax.Array = struct.field(default_factory=lambda: _np.int32(0))


def empty_scene(n_bodies: int, n_colliders: int, max_pairs: int) -> SceneState:
    return SceneState(
        bodies=empty_bodies(n_bodies),
        colliders=empty_colliders(n_colliders),
        contacts=empty_contacts(max_pairs),
    )
