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
    if impl == "rat":
        return _mish_rational(x32).astype(orig)
    if impl == "exp1":
        xc = jnp.minimum(x32, 20.0)
        t = jnp.exp(xc)
        u = t * t + 2.0 * t
        y = x32 * (u / (u + 2.0))
        return jnp.where(x32 > 20.0, x32, y).astype(orig)
    if impl == "vjp":
        return _mish_stored_grad(x32, orig).astype(orig)
    return (x32 * jnp.tanh(jax.nn.softplus(x32))).astype(orig)


# MEASURED REJECTION (r3, kept for re-measurement on other hardware):
# full step 31.01 vs 20.39 ms at b128; isolated at (128,128,128,64) bf16 the
# REFERENCE chain is memory-bound (0.822 ms/iter = 652 GB/s — the
# exp/log1p/tanh lowerings ride the TPU's hardware transcendental support
# and cost nothing), while this rational's 16-FMA Horner + divide costs
# real VPU cycles (fwd 1.198 ms, fwd+bwd 3.563 vs 0.829 ms). See
# BASELINE.md r3 "Measured rejections" and tools/bench_mish_iso.py.
#
# Minimax rational fit of h(x) = tanh(softplus(x)) over x in [-12, 9]
# (tools/fit_mish.py: SK-iteration + Lawson reweighting, deg (8,8) in the
# scaled variable s = (x+1.5)/10.5). Max |h - R| = 3.7e-7 on the fit
# domain; evaluated in f32 and rounded to bf16, mish(x) = x*R(s) is
# BIT-IDENTICAL to the reference f32-internal mish for 99.35% of all
# 65,280 finite bf16 inputs — every mismatch lies in x in [-91.5, -6.25]
# where |mish| < 2.2e-3, with max absolute deviation 7e-5 (the zero-tail
# select below covers x < -12, where |mish| < 7.4e-5). Cost: ~25 VPU ops
# (16 FMA + 1 divide + clamp/selects) vs the exp->log1p->tanh chain
# (three polynomial lowerings, ~80 ops).
_MISH_RAT_C = -1.5
_MISH_RAT_W = 10.5
_MISH_RAT_P = (
    0.00186411496, 0.004196711784, 0.006756502199, 0.0325963436,
    0.1045538276, 0.1796319188, 0.1759103853, 0.09394192475, 0.0213137939)
_MISH_RAT_Q = (
    0.009380003556, -0.06571993822, 0.302732614, -0.7099194455,
    1.306894246, -1.100581399, 1.046269654, -0.2495117448, 0.08122178027)


def _mish_rational(x32: jax.Array) -> jax.Array:
    s = jnp.clip((x32 - _MISH_RAT_C) * (1.0 / _MISH_RAT_W), -1.0, 1.0)
    num = jnp.float32(_MISH_RAT_P[-1])
    for c in _MISH_RAT_P[-2::-1]:
        num = num * s + jnp.float32(c)
    den = jnp.float32(_MISH_RAT_Q[-1])
    for c in _MISH_RAT_Q[-2::-1]:
        den = den * s + jnp.float32(c)
    y = x32 * (num / den)
    # s clamps at +1 for x > 9 where R(1) = 1 +- 3.7e-7 — y = x to well
    # under a bf16 ulp, no select needed. The negative tail does need one:
    # x*R(-1) grows linearly while mish -> 0 (|mish| < 7.4e-5 past -12).
    return jnp.where(x32 < _MISH_RAT_C - _MISH_RAT_W, 0.0, y)


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
