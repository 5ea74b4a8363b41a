"""Multi-chip scaling: shard the scene batch axis over a device mesh.

The reference is a single-process shared-memory engine (rayon threads,
SURVEY §2.3/§5.8); the TPU-native scaling axes are (a) `vmap` over thousands
of independent scenes (the RL batch) and (b) sharding that batch axis across
chips over ICI with `jax.sharding` — scenes are independent, so a step needs
zero cross-device collectives and scales linearly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rapier_tpu.pipeline.physics_pipeline import step as _step


def batched_step(state, params):
    """vmap the single-scene step over a leading scene axis."""
    return jax.vmap(_step, in_axes=(0, None))(state, params)


def make_mesh(devices, axis_name: str = "scenes") -> Mesh:
    """Build a 1-D scene mesh over an EXPLICIT device list.

    `devices` is required: a `jax.devices()` default silently builds a 1-chip
    mesh on single-accelerator hosts, and on this machine it can initialize
    the axon tunnel backend as a side effect. Pass e.g. ``jax.devices("cpu")``
    for the virtual mesh or the real chip list on multi-chip hardware.
    """
    if devices is None:
        raise ValueError(
            "make_mesh requires an explicit device list (e.g. jax.devices('cpu') "
            "or your TPU slice); no implicit jax.devices() default."
        )
    return Mesh(jnp.array(devices).reshape(-1) if hasattr(devices, "reshape")
                else devices, axis_names=(axis_name,))


def shard_batch(state, mesh: Mesh, axis_name: str = "scenes"):
    """Place a batched SceneState with its scene axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.device_put(state, sharding)


def make_sharded_step(mesh: Mesh, axis_name: str = "scenes", donate: bool = True):
    """Compile a multi-chip batched step: batch axis sharded over `mesh`.

    With scenes independent, XLA inserts no collectives; each chip steps its
    shard locally and outputs stay sharded (zero host round-trips between
    steps).
    """
    sharding = NamedSharding(mesh, P(axis_name))
    # On a CPU (virtual) mesh the Pallas sweep cannot compile (Mosaic is
    # TPU-only and jax.default_backend() may still report "tpu" when a TPU
    # plugin is registered but unused) — pin the JAX solver path.
    cpu_mesh = all(d.platform == "cpu" for d in mesh.devices.flat)

    @functools.partial(
        jax.jit,
        in_shardings=(sharding, None),
        out_shardings=(sharding, sharding),
        donate_argnums=(0,) if donate else (),
    )
    def sharded_step(state, params):
        if cpu_mesh and params.solver_backend == "auto":
            params = params.replace(solver_backend="jax")
        return batched_step(state, params)

    return sharded_step
