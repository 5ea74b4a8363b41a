"""User physics hooks: pair filtering and solver-contact modification.

The TPU recast of the reference PhysicsHooks trait
(src/pipeline/physics_hooks.rs:142-200): instead of per-pair callbacks, a hook
is a pure function over the whole pair batch (arrays in, arrays out), traced
into the step.  Gating by per-collider ActiveHooks flags is applied by the
pipeline: un-flagged pairs keep default behavior regardless of hook output.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class PhysicsHooks:
    """Bundle of optional hook functions (all pure, traced under jit).

    filter_contact_pair(bodies, colliders, man) -> keep [P] bool:
        pairs whose colliders carry ACTIVE_HOOKS_FILTER_CONTACT_PAIR are
        dropped from the solver when keep is False (solver-contact generation
        skipped; the manifold itself is still tracked).

    modify_solver_contacts(bodies, colliders, man) -> ManifoldBatch:
        may change dists/points/friction/restitution/normal of flagged pairs
        (e.g. the one-way platform, reference physics_hooks.rs:68).
    """

    filter_contact_pair: Optional[Callable] = None
    filter_intersection_pair: Optional[Callable] = None
    modify_solver_contacts: Optional[Callable] = None


def one_way_platform_hook(allowed_normal, threshold: float = 0.0):
    """Helper mirroring the reference's one-way-platform example: drop
    contacts whose manifold normal opposes `allowed_normal`."""
    allowed = jnp.asarray(allowed_normal)

    def filter_fn(bodies, colliders, man):
        d = jnp.einsum("jp,j->p", man.normal, allowed)
        return d >= threshold

    return PhysicsHooks(filter_contact_pair=filter_fn)
