"""Core layers: conv / linear / norms / dropout / pooling.

Pure functions over explicit param dicts. Layout conventions (TPU-native):
  * activations NHWC, conv weights HWIO (XLA's preferred TPU layouts),
  * norm statistics computed in f32 regardless of compute dtype,
  * transposed conv stored as a *regular* conv weight and applied as an
    input-dilated conv — the exact TPU-friendly realization of
    nn.ConvTranspose2d(k=4, s=2, p=1) (reference lunar_generate.py:168-190).

Parity targets cited per function.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from lunaris_orion_tpu.ops import initializers as init

Params = Dict[str, jax.Array]


# ---------------------------------------------------------------------------
# Convolutions
# ---------------------------------------------------------------------------

_DIMNUMS = ("NHWC", "HWIO", "NHWC")


def conv2d_init(key, in_ch: int, out_ch: int, kernel: int, *, groups: int = 1,
                scheme: str = "torch_default") -> Params:
    if scheme == "torch_default":
        w, b = init.torch_default_conv(key, kernel, kernel, in_ch, out_ch, groups)
    elif scheme == "kaiming_out":
        w, b = init.kaiming_normal_fan_out_conv(key, kernel, kernel, in_ch, out_ch, groups)
    else:
        raise ValueError(scheme)
    return {"w": w, "b": b}


def conv2d(params: Params, x: jax.Array, *, stride: int = 1,
           padding: Optional[int] = None, groups: int = 1) -> jax.Array:
    """3x3/5x5/1x1 conv, padding defaults to torch 'same-ish' (k//2)."""
    w = params["w"].astype(x.dtype)
    k = w.shape[0]
    pad = k // 2 if padding is None else padding
    out = lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=_DIMNUMS,
        feature_group_count=groups,
    )
    return out + params["b"].astype(x.dtype)


def conv2d_transpose_init(key, in_ch: int, out_ch: int, kernel: int = 4,
                          *, scheme: str = "torch_default") -> Params:
    """Weight stored HWIO for the equivalent input-dilated conv.

    PyTorch's ConvTranspose2d fan_in quirk: its weight is [in, out, k, k] and
    torch computes fan_in from dim 1 => fan_in = out_ch * k * k
    (used for both weight and bias bounds).
    """
    import math
    wkey, bkey = jax.random.split(key)
    if scheme == "torch_default":
        bound = 1.0 / math.sqrt(out_ch * kernel * kernel)
        w = init.torch_uniform_bound(wkey, (kernel, kernel, in_ch, out_ch), bound)
        b = init.torch_uniform_bound(bkey, (out_ch,), bound)
    elif scheme == "kaiming_out":
        w, b = init.kaiming_normal_fan_out_conv(wkey, kernel, kernel, in_ch, out_ch)
    else:
        raise ValueError(scheme)
    return {"w": w, "b": b}


def conv2d_transpose(params: Params, x: jax.Array, *, stride: int = 2,
                     kernel: int = 4, padding: int = 1) -> jax.Array:
    """ConvTranspose2d(k, s, p) matching lunar_generate.py:168-190
    (output = (i-1)*s - 2p + k = 2i for k=4,s=2,p=1).

    Default: input-dilated regular conv (the stored weight is already in
    the dilated conv's orientation; the torch->jax converter in
    utils.torch_compat flips). A subpixel *phase decomposition* — ONE k=2
    conv (pad 1) to 4*C_out phase channels + shifted-slice interleave,
    exact to roundoff — is kept behind LUNARIS_CONVT_IMPL=phase. Measured
    r3 on v5e: in ISOLATION (fwd + weight-grad only) the phase form is up
    to 2x faster at the large-spatial stages (tools/bench_vae_parts.py
    --part convt), but inside the FULL train step it is 4.7 ms SLOWER
    (26.51 vs 21.79 ms at batch 128, --part fullstep): the input-gradient
    of the slice/stack interleave lowers to pad/scatter chains and the
    interleave breaks XLA's fusion with the following GroupNorm. This
    reproduces the r1 depth_to_space result with a different interleave
    construction — the dilated lowering is genuinely the fastest
    whole-graph form XLA has for this op.
    """
    import os
    w = params["w"].astype(x.dtype)
    b = params["b"].astype(x.dtype)
    if (kernel != 4 or stride != 2 or padding != 1
            or os.environ.get("LUNARIS_CONVT_IMPL", "dilated") != "phase"):
        if (kernel == 4 and stride == 2 and padding == 1
                and os.environ.get("LUNARIS_CONVT_VJP", "explicit")
                == "explicit"):
            # Custom VJP with hand-derived gradient convs: XLA's transpose
            # rule for the dilated form materialized spatial REVERSES of
            # whole activations (0.63 ms/step at batch 128 in the r3
            # trace, tools/profile_step.py); the explicit forms reverse
            # only the 4x4 weights / the [co,4,4,ci] weight-grad.
            return _convt421_core(x, w) + b
        pad = kernel - 1 - padding
        out = lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding=((pad, pad), (pad, pad)),
            lhs_dilation=(stride, stride), dimension_numbers=_DIMNUMS)
        return out + b
    bs, h, wd, cin = x.shape
    co = w.shape[3]
    # W2[a, b, cin, (r, s, co)] = W[2a+r, 2b+s, cin, co]
    w2 = (w.reshape(2, 2, 2, 2, cin, co)
           .transpose(0, 2, 4, 1, 3, 5)
           .reshape(2, 2, cin, 4 * co))
    ypad = lax.conv_general_dilated(
        x, w2, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=_DIMNUMS)          # [bs, h+1, wd+1, 4co]
    z = ypad.reshape(bs, h + 1, wd + 1, 2, 2, co)
    # out[2j+r, 2l+s, co] = z[j+r, l+s, r, s, co]
    rows = []
    for r in (0, 1):
        cols = [z[:, r:h + r, s:wd + s, r, s, :] for s in (0, 1)]
        rows.append(jnp.stack(cols, axis=3))     # [bs, h, wd, 2, co]
    out = jnp.stack(rows, axis=2)                # [bs, h, 2, wd, 2, co]
    out = out.reshape(bs, 2 * h, 2 * wd, co)
    return out + b


@jax.custom_vjp
def _convt421_core(x, w):
    """ConvTranspose(4,2,1) as the input-dilated conv, with explicit
    gradient convolutions (verified exact vs autodiff):
      dx = conv(dy, reverse(w).swapIO, stride 2, pad 1)
      dW = reverse_spatial(conv(dy, x; B contracted, rhs_dilation 2))."""
    return lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((2, 2), (2, 2)),
        lhs_dilation=(2, 2), dimension_numbers=_DIMNUMS)


def _convt421_fwd(x, w):
    return _convt421_core(x, w), (x, w)


def _convt421_bwd(res, dy):
    x, w = res
    w2 = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))
    dx = lax.conv_general_dilated(
        dy, w2, window_strides=(2, 2), padding=((1, 1), (1, 1)),
        dimension_numbers=_DIMNUMS)
    c = lax.conv_general_dilated(
        dy, x, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        rhs_dilation=(2, 2),
        dimension_numbers=("CHWN", "IHWO", "NHWC"),
        preferred_element_type=jnp.float32)
    dw = jnp.transpose(c[:, ::-1, ::-1, :], (1, 2, 3, 0)).astype(w.dtype)
    return dx, dw


_convt421_core.defvjp(_convt421_fwd, _convt421_bwd)


# ---------------------------------------------------------------------------
# Linear
# ---------------------------------------------------------------------------

def linear_init(key, in_dim: int, out_dim: int, *, scheme: str = "torch_default") -> Params:
    if scheme == "torch_default":
        w, b = init.torch_default_linear(key, in_dim, out_dim)
    elif scheme == "kaiming_out":
        w, b = init.kaiming_normal_fan_out_linear(key, in_dim, out_dim)
    else:
        raise ValueError(scheme)
    return {"w": w, "b": b}


def linear(params: Params, x: jax.Array) -> jax.Array:
    w = params["w"].astype(x.dtype)
    return jnp.dot(x, w, preferred_element_type=x.dtype) + params["b"].astype(x.dtype)


# ---------------------------------------------------------------------------
# Normalization
# ---------------------------------------------------------------------------

def group_norm_init(num_channels: int) -> Params:
    return {"scale": jnp.ones((num_channels,), jnp.float32),
            "bias": jnp.zeros((num_channels,), jnp.float32)}


def group_norm(params: Params, x: jax.Array, *, groups: int = 8,
               eps: float = 1e-5) -> jax.Array:
    """GroupNorm(8, C) over NHWC (reference uses nn.GroupNorm(8, C) everywhere
    in the VAE, lunar_generate.py:37-42,96-119,170-190). Stats in f32.

    TPU formulation: group stats are assembled from *per-channel* moments
    (mean and E[x^2] reduced over H,W — lane-preserving reductions), then a
    tiny [B,C]->[B,G] group average; var_g = E[x^2]_g - mean_g^2 is the same
    math as the direct two-pass. This avoids reshaping the channel (lane)
    axis into (groups, C/groups), which forces a cross-lane relayout of the
    whole activation on TPU. The normalize collapses to one FMA per element
    (scale' = inv_std*gamma, bias' = beta - mean*scale').
    LUNARIS_GN_IMPL=reshape restores the direct form (A/B benchmarks).
    """
    import os
    b, h, w, c = x.shape
    orig = x.dtype
    x32 = x.astype(jnp.float32)
    if os.environ.get("LUNARIS_GN_IMPL") == "reshape":
        xg = x32.reshape(b, h, w, groups, c // groups)
        mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
        var = jnp.mean(jnp.square(xg - mean), axis=(1, 2, 4), keepdims=True)
        xn = ((xg - mean) * lax.rsqrt(var + eps)).reshape(b, h, w, c)
        return (xn * params["scale"] + params["bias"]).astype(orig)
    cg = c // groups
    gmean, inv = _gn_stats(x32, groups, eps)
    scale = jnp.repeat(inv, cg, axis=1) * params["scale"]         # [B, C]
    bias = params["bias"] - jnp.repeat(gmean * inv, cg, axis=1) * params["scale"]
    out = x32 * scale[:, None, None, :] + bias[:, None, None, :]
    return out.astype(orig)


def group_norm_mish(params: Params, x: jax.Array, *, groups: int = 8,
                    eps: float = 1e-5) -> jax.Array:
    """mish(GroupNorm(x)) — the VAE's ubiquitous epilogue
    (lunar_generate.py:35-44,94-120,168-190). Dispatches between the K1
    Pallas kernel (ops/pallas/gn_mish.py) and the XLA composition per
    ops.dispatch; the Pallas path stays differentiable via an XLA-recompute
    backward."""
    from lunaris_orion_tpu.ops import dispatch
    from lunaris_orion_tpu.ops.activations import mish

    import os
    if os.environ.get("LUNARIS_GN_BARRIER") == "1":
        # Experiment knob: fence gn+mish out of XLA's conv fusions. The r3
        # trace shows the GN stat/apply work fused INTO the convolution
        # fusions (convert_reduce_fusion.*) while dragging conv throughput
        # to ~60 TF/s at the wide stages — this isolates whether the convs
        # recover more than the extra materialization passes cost.
        x = lax.optimization_barrier(x)
        out = mish(group_norm(params, x, groups=groups, eps=eps))
        return lax.optimization_barrier(out)

    if (os.environ.get("LUNARIS_GNMISH_IMPL") == "fusedvjp"
            and dispatch.choose("gn_mish") != "pallas"   # forced-K1 wins
            and x.ndim == 4 and x.shape[3] % groups == 0):
        # Residual-minimal custom VJP (r3 experiment, measured-REJECTED):
        # keeps only the conv output + [B, G] stats across fwd->bwd and
        # recomputes the normalized/mish chain in backward. Theory said two
        # fewer activation-sized HBM round trips per stage; measurement
        # (tools/bench_vae_parts.py --part sweep, b128) said 21.43 vs
        # 20.44 ms/step — the custom_vjp boundary fences the GN math out of
        # XLA's conv fusions, costing more than the saved residual traffic
        # (same structural cause as the LUNARIS_GN_BARRIER rejection).
        return _gn_mish_fused(x, params["scale"], params["bias"], groups, eps)

    # r3: the tiled K1 kernel (ops/pallas/gn_mish.py) bounds per-tile VMEM
    # regardless of image size, so it compiles at ALL reference stages
    # including 128px (the r1/r2 whole-image kernel could not). The gate is
    # now only the lane-packing feasibility condition.
    from lunaris_orion_tpu.ops.pallas.gn_mish import supported_shape
    if (dispatch.choose("gn_mish") == "pallas"
            and supported_shape(int(x.shape[1]), int(x.shape[2]),
                                int(x.shape[3]))
            and int(x.shape[3]) % groups == 0):
        from lunaris_orion_tpu.ops.pallas.gn_mish import group_norm_mish_pallas
        import functools

        f = dispatch.pallas_fwd_xla_bwd(
            functools.partial(group_norm_mish_pallas, groups=groups, eps=eps),
            lambda xx, sc, bi: mish(
                group_norm({"scale": sc, "bias": bi}, xx,
                           groups=groups, eps=eps)))
        return f(x, params["scale"], params["bias"])
    return mish(group_norm(params, x, groups=groups, eps=eps))


def _gn_stats(x32: jax.Array, groups: int, eps: float):
    """Per-(B, G) mean and inv-std via lane-preserving per-channel moments
    (the moments form shared by group_norm and the fused VJP).

    E[x^2] - mean^2 cancels catastrophically when |mean| >> std and can go
    slightly NEGATIVE in f32 (NaN through rsqrt, where the two-pass form
    would survive) — clamp to 0 so pathological inputs degrade to the
    eps-floored inv-std instead of poisoning the step."""
    b, h, w, c = x32.shape
    cg = c // groups
    s1 = jnp.mean(x32, axis=(1, 2))                       # [B, C]
    s2 = jnp.mean(jnp.square(x32), axis=(1, 2))           # [B, C]
    gmean = jnp.mean(s1.reshape(b, groups, cg), axis=2)   # [B, G]
    gvar = jnp.mean(s2.reshape(b, groups, cg), axis=2) - jnp.square(gmean)
    inv = lax.rsqrt(jnp.maximum(gvar, 0.0) + eps)
    return gmean, inv


def _mish32(g: jax.Array) -> jax.Array:
    return g * jnp.tanh(jax.nn.softplus(g))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _gn_mish_fused(x, scale, bias, groups, eps):
    """mish(GroupNorm(x)) with a residual-minimal hand VJP.

    Autodiff of the composition stores three activation-sized residuals
    per stage (conv output y, the GN output g for mish's backward, and the
    stage output) — visible in the r3 trace as conv fusions emitting the
    activation twice (e.g. convert_reduce_fusion.65 outputs two
    bf16[128,64,64,64] tensors). This VJP keeps ONLY y plus the [B, G]
    stats and recomputes g / mish' in the backward, where the extra VPU
    work is free (elementwise mish measured memory-bound at 652 GB/s,
    tools/bench_mish_iso.py): per gn_mish site that is two fewer
    activation-sized HBM round trips."""
    return _gn_mish_fused_fwd(x, scale, bias, groups, eps)[0]


def _gn_mish_fused_fwd(x, scale, bias, groups, eps):
    b, h, w, c = x.shape
    cg = c // groups
    x32 = x.astype(jnp.float32)
    gmean, inv = _gn_stats(x32, groups, eps)
    sc = jnp.repeat(inv, cg, axis=1) * scale
    bi = bias - jnp.repeat(gmean * inv, cg, axis=1) * scale
    g = x32 * sc[:, None, None, :] + bi[:, None, None, :]
    g = g.astype(x.dtype).astype(jnp.float32)
    out = _mish32(g).astype(x.dtype)
    return out, (x, scale, bias, gmean, inv)


def _gn_mish_fused_bwd(groups, eps, res, dout):
    x, scale, bias, gmean, inv = res
    b, h, w, c = x.shape
    cg = c // groups
    x32 = x.astype(jnp.float32)
    do32 = dout.astype(jnp.float32)
    invc = jnp.repeat(inv, cg, axis=1)[:, None, None, :]      # [B,1,1,C]
    meanc = jnp.repeat(gmean, cg, axis=1)[:, None, None, :]
    xhat = (x32 - meanc) * invc
    g = (xhat * scale + bias).astype(x.dtype).astype(jnp.float32)
    # mish'(g) at the same rounded point the forward used
    t = jnp.tanh(jax.nn.softplus(g))
    dmish = t + g * (1.0 - t * t) * jax.nn.sigmoid(g)
    dg = do32 * dmish
    dscale = jnp.sum(dg * xhat, axis=(0, 1, 2))
    dbias = jnp.sum(dg, axis=(0, 1, 2))
    dxhat = dg * scale
    # group means over (H, W, C/G), lane-preserving like the forward
    m1c = jnp.mean(dxhat, axis=(1, 2))                        # [B, C]
    m2c = jnp.mean(dxhat * xhat, axis=(1, 2))                 # [B, C]
    m1 = jnp.mean(m1c.reshape(b, groups, cg), axis=2)         # [B, G]
    m2 = jnp.mean(m2c.reshape(b, groups, cg), axis=2)
    m1c = jnp.repeat(m1, cg, axis=1)[:, None, None, :]
    m2c = jnp.repeat(m2, cg, axis=1)[:, None, None, :]
    dx = invc * (dxhat - m1c - xhat * m2c)
    return dx.astype(x.dtype), dscale, dbias


_gn_mish_fused.defvjp(_gn_mish_fused_fwd, _gn_mish_fused_bwd)


def layer_norm_init(dim: int) -> Params:
    return {"scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def layer_norm(params: Params, x: jax.Array, *, eps: float = 1e-5) -> jax.Array:
    orig = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    out = (x32 - mean) * lax.rsqrt(var + eps) * params["scale"] + params["bias"]
    return out.astype(orig)


def batch_norm_init(num_channels: int) -> Tuple[Params, Params]:
    """Returns (params, state). State = running stats (torch BatchNorm2d)."""
    params = {"scale": jnp.ones((num_channels,), jnp.float32),
              "bias": jnp.zeros((num_channels,), jnp.float32)}
    state = {"mean": jnp.zeros((num_channels,), jnp.float32),
             "var": jnp.ones((num_channels,), jnp.float32)}
    return params, state


def batch_norm(params: Params, state: Params, x: jax.Array, *, train: bool,
               momentum: float = 0.1, eps: float = 1e-5
               ) -> Tuple[jax.Array, Params]:
    """BatchNorm2d over NHWC channels (reference lunar_evaluator.py:74-102,...).

    Train: normalize with biased batch stats; running stats updated with the
    unbiased variance (torch semantics). Under a sharded batch axis inside
    jit, jnp.mean over the full array is the *global* mean — XLA inserts the
    cross-replica reduction, giving sync-BN for free (documented deviation:
    the reference is single-device so per-device==global there).
    Eval: running stats. Returns (y, new_state).
    """
    orig = x.dtype
    x32 = x.astype(jnp.float32)
    if train:
        axes = (0, 1, 2)
        mean = jnp.mean(x32, axis=axes)
        var = jnp.mean(jnp.square(x32 - mean), axis=axes)
        n = x.shape[0] * x.shape[1] * x.shape[2]
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    out = (x32 - mean) * lax.rsqrt(var + eps) * params["scale"] + params["bias"]
    return out.astype(orig), new_state


# ---------------------------------------------------------------------------
# Misc
# ---------------------------------------------------------------------------

def dropout(x: jax.Array, rate: float, *, rng: Optional[jax.Array],
            train: bool) -> jax.Array:
    if not train or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


def dropout2d(x: jax.Array, rate: float, *, rng: Optional[jax.Array],
              train: bool) -> jax.Array:
    """Channel dropout (torch Dropout2d): zero whole channels per sample."""
    if not train or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1, x.shape[-1]))
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


def global_avg_pool(x: jax.Array) -> jax.Array:
    """AdaptiveAvgPool2d(1) + flatten, NHWC -> [B, C]."""
    return jnp.mean(x, axis=(1, 2))
