"""Activation functions.

Reference: `mish()` at lunar_generate.py:24-26 / lunar_evaluator.py:48-50,
LeakyReLU(0.2) used throughout lunar_evaluator.py.
"""

import functools
import os

import jax
import jax.numpy as jnp


def mish(x: jax.Array) -> jax.Array:
    """x * tanh(softplus(x)) (lunar_generate.py:24-26).

    Computed in f32 for bf16 inputs: softplus overflows bf16 quickly and the
    tanh curvature near 0 loses precision; the cast pair fuses away on TPU.

    A single-transcendental rewrite (t = e^x; tanh(softplus(x)) =
    (t^2+2t)/(t^2+2t+2), exact in real arithmetic) was MEASURED SLOWER on
    v5e inside the full 128px VAE step: 26.06 vs 21.79 ms at batch 128
    (tools/bench_vae_parts.py --part fullstep, r3) — XLA's tanh/softplus
    lowering plus its fused 1-tanh^2 derivative beat the exp+divide form
    and its autodiff. Kept behind LUNARIS_MISH_IMPL=exp1 for re-measurement
    on other hardware.
    """
    orig = x.dtype
    impl = os.environ.get("LUNARIS_MISH_IMPL", "ref")
    if impl == "bf16":
        # Native-dtype internals: the reference's own fp16 autocast runs
        # softplus/tanh in half precision (torch.amp fp16 list), so bf16
        # internals are AMP-faithful. Worth shipping only if the VPU packs
        # bf16 transcendentals 2x — measured via the sweep.
        return x * jnp.tanh(jax.nn.softplus(x))
    x32 = x.astype(jnp.float32)
    if impl == "exp1":
        xc = jnp.minimum(x32, 20.0)
        t = jnp.exp(xc)
        u = t * t + 2.0 * t
        y = x32 * (u / (u + 2.0))
        return jnp.where(x32 > 20.0, x32, y).astype(orig)
    if impl == "vjp":
        return _mish_stored_grad(x32, orig).astype(orig)
    return (x32 * jnp.tanh(jax.nn.softplus(x32))).astype(orig)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _mish_stored_grad(x32, res_dtype):
    return x32 * jnp.tanh(jax.nn.softplus(x32))


def _mish_sg_fwd(x32, res_dtype):
    """Compute mish AND its derivative in the forward pass; store the
    derivative (in the caller's compute dtype) as the only residual. The
    backward is then a single multiply — no tanh/softplus/sigmoid recompute
    chain on the backward's critical path (mish sits on every VAE
    activation; the fwd+bwd autodiff chain measured 3.2 ms of the 128px
    batch-128 step, tools/bench_vae_parts.py --part ablate, r3)."""
    sp = jax.nn.softplus(x32)
    t = jnp.tanh(sp)
    sig = jax.nn.sigmoid(x32)
    d = t + x32 * (1.0 - t * t) * sig       # mish'(x)
    return x32 * t, d.astype(res_dtype)


def _mish_sg_bwd(res_dtype, d, g):
    return (g * d.astype(jnp.float32),)


_mish_stored_grad.defvjp(_mish_sg_fwd, _mish_sg_bwd)


def leaky_relu(x: jax.Array, negative_slope: float = 0.2) -> jax.Array:
    return jax.nn.leaky_relu(x, negative_slope)
