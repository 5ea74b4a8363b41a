"""Floating-point precision axis (reference f32/f64 feature builds,
src/lib.rs:64-66 and the rapier3d-f64 crates).

The engine defaults to f32 — the TPU-native dtype (MXU/VPU are f32/bf16
hardware; f64 emulates at a large slowdown and is CPU-mesh territory).  The
f64 axis exists for precision-critical scenes (e.g. stacks built 1e5 units
from the origin, s2d_far_pyramid.rs): call `set_precision("f64")` BEFORE
building any world; it flips the dtype used by every state constructor and
staging cast, and enables jax_enable_x64.

Mirrors the reference's compile-time choice: one precision per process (the
dtype threads through cached jit signatures), not per-world.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Module-level so `from rapier_tpu import precision; precision.FLOAT` always
# reads the live value (do NOT `from precision import FLOAT`).
FLOAT = jnp.float32
NP_FLOAT = np.float32


def set_precision(kind: str) -> None:
    """kind: "f32" (default) or "f64".  f64 enables jax_enable_x64 and
    forces the pure-JAX solver path (Mosaic kernels are f32-only)."""
    global FLOAT, NP_FLOAT
    if kind == "f64":
        jax.config.update("jax_enable_x64", True)
        FLOAT = jnp.float64
        NP_FLOAT = np.float64
    elif kind == "f32":
        FLOAT = jnp.float32
        NP_FLOAT = np.float32
    else:
        raise ValueError(f"unknown precision {kind!r} (use 'f32' or 'f64')")


def is_f64() -> bool:
    return NP_FLOAT is np.float64
