"""Weight initializers matching the reference's statistical distributions.

Two families are used by the reference:
  * PyTorch layer defaults (VAE, lunar_generate.py — no custom init):
    kaiming_uniform(a=sqrt(5)) on weights == U(-1/sqrt(fan_in), 1/sqrt(fan_in)),
    and U(-1/sqrt(fan_in), 1/sqrt(fan_in)) on biases.
  * Teacher custom init (lunar_evaluator.py:399-406): kaiming_normal
    (mode=fan_out, nonlinearity=leaky_relu) on conv/linear weights, zero bias.

Exact RNG streams differ (JAX threefry vs torch MT) — parity is statistical,
which is what loss-curve parity requires.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def torch_uniform_bound(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_default_conv(key, kh, kw, in_ch, out_ch, groups=1, dtype=jnp.float32):
    """HWIO conv weight + bias with PyTorch Conv2d default init."""
    wkey, bkey = jax.random.split(key)
    fan_in = (in_ch // groups) * kh * kw
    bound = 1.0 / math.sqrt(fan_in)
    w = torch_uniform_bound(wkey, (kh, kw, in_ch // groups, out_ch), bound, dtype)
    b = torch_uniform_bound(bkey, (out_ch,), bound, dtype)
    return w, b


def torch_default_linear(key, in_dim, out_dim, dtype=jnp.float32):
    wkey, bkey = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    w = torch_uniform_bound(wkey, (in_dim, out_dim), bound, dtype)
    b = torch_uniform_bound(bkey, (out_dim,), bound, dtype)
    return w, b


def kaiming_normal_fan_out_conv(key, kh, kw, in_ch, out_ch, groups=1,
                                negative_slope=0.01, dtype=jnp.float32):
    """kaiming_normal_(mode='fan_out', nonlinearity='leaky_relu'), zero bias."""
    gain = math.sqrt(2.0 / (1.0 + negative_slope ** 2))
    fan_out = out_ch * kh * kw
    std = gain / math.sqrt(fan_out)
    w = jax.random.normal(key, (kh, kw, in_ch // groups, out_ch), dtype) * std
    b = jnp.zeros((out_ch,), dtype)
    return w, b


def kaiming_normal_fan_out_linear(key, in_dim, out_dim,
                                  negative_slope=0.01, dtype=jnp.float32):
    gain = math.sqrt(2.0 / (1.0 + negative_slope ** 2))
    std = gain / math.sqrt(out_dim)
    w = jax.random.normal(key, (in_dim, out_dim), dtype) * std
    b = jnp.zeros((out_dim,), dtype)
    return w, b
