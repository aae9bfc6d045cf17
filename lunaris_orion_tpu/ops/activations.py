"""Activation functions.

Reference: `mish()` at lunar_generate.py:24-26 / lunar_evaluator.py:48-50,
LeakyReLU(0.2) used throughout lunar_evaluator.py.
"""

import jax
import jax.numpy as jnp


def mish(x: jax.Array) -> jax.Array:
    """x * tanh(softplus(x)).

    Computed in f32 for bf16 inputs: softplus overflows bf16 quickly and the
    tanh curvature near 0 loses precision; the cast pair fuses away on TPU.
    """
    orig = x.dtype
    x32 = x.astype(jnp.float32)
    return (x32 * jnp.tanh(jax.nn.softplus(x32))).astype(orig)


def leaky_relu(x: jax.Array, negative_slope: float = 0.2) -> jax.Array:
    return jax.nn.leaky_relu(x, negative_slope)
