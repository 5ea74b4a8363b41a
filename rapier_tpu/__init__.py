"""rapier_tpu: TPU-native rigid-body physics engine (see README.md)."""

import jax

# Physics state flows through matmuls (one-hot gathers/scatters, rotation
# einsums).  The TPU default matmul precision truncates f32 operands to bf16
# (7 mantissa bits => millimeter noise on meter-scale scenes, jittering
# stacks).  Force full f32 matmul precision for everything in this package.
jax.config.update("jax_default_matmul_precision", "highest")
