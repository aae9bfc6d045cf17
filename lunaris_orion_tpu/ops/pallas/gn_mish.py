"""K1 — fused GroupNorm(+Mish) Pallas kernel.

One HBM read + one write per activation for the VAE's ubiquitous
Conv -> GroupNorm(8) -> Mish pattern (lunar_generate.py:35-44,94-120,168-190)
— XLA splits the group reduction and the normalize/activation into separate
passes over the (large) activation.

Group statistics are computed on the MXU: sums = x @ onehot[C,G] then
mean/var broadcast back with onehot^T — keeping the lane axis on C
throughout (no sub-128 lane reshapes).

Selectable from ops.layers.group_norm_mish via ops.dispatch ("gn_mish");
the XLA composition ships by default per the in-graph microbenchmark
(BASELINE.md / tools/bench_dispatch.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, scale_ref, bias_ref, o_ref, *, groups: int, eps: float,
            with_mish: bool):
    hw = x_ref.shape[1] * x_ref.shape[2]
    c = x_ref.shape[3]
    cg = c // groups
    x = x_ref[0].reshape(hw, c).astype(jnp.float32)

    cid = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    gid = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    onehot = (cid // cg == gid).astype(jnp.float32)  # [C, G]

    n = hw * cg
    s1 = jnp.dot(jnp.sum(x, axis=0, keepdims=True), onehot,
                 preferred_element_type=jnp.float32)          # [1, G]
    s2 = jnp.dot(jnp.sum(x * x, axis=0, keepdims=True), onehot,
                 preferred_element_type=jnp.float32)
    mean_g = s1 / n
    var_g = s2 / n - mean_g * mean_g
    mean_c = jnp.dot(mean_g, onehot.T, preferred_element_type=jnp.float32)
    rstd_c = jnp.dot(jax.lax.rsqrt(var_g + eps), onehot.T,
                     preferred_element_type=jnp.float32)       # [1, C]

    y = (x - mean_c) * rstd_c * scale_ref[0:1, :] + bias_ref[0:1, :]
    if with_mish:
        y = y * jnp.tanh(jax.nn.softplus(y))
    o_ref[0] = y.reshape(x_ref.shape[1], x_ref.shape[2], c).astype(o_ref.dtype)


def group_norm_mish_pallas(x: jax.Array, scale: jax.Array, bias: jax.Array,
                           *, groups: int = 8, eps: float = 1e-5,
                           with_mish: bool = True) -> jax.Array:
    """x: [B, H, W, C] -> GroupNorm(groups)(x)*scale+bias, optionally mish'd."""
    b, h, w, c = x.shape
    scale2 = scale.astype(jnp.float32).reshape(1, c)
    bias2 = bias.astype(jnp.float32).reshape(1, c)
    return pl.pallas_call(
        functools.partial(_kernel, groups=groups, eps=eps, with_mish=with_mish),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=jax.default_backend() != "tpu",
    )(x, scale2, bias2)
