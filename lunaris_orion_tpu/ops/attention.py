"""Spatial multi-head attention over NHWC feature maps.

TPU-native replacement for the reference's "memory-efficient" chunked
attention (`PixelArtAttention`, lunar_evaluator.py:119-227). This module is
the pure-JAX (XLA) realization: a flash-style blockwise kernel with online
softmax written with `lax.scan`, memory-bounded at O(block_q * N) instead of
O(N^2). The Pallas Mosaic kernel that replaces it on TPU lives in
`ops/pallas/flash_attention.py`; `ops.dispatch` chooses between them.

Documented deviations from the reference (SURVEY.md §2.1 #8):
  * The reference's chunk bookkeeping indexes output slices by chunk ordinal
    instead of element offset (lunar_evaluator.py:209,216), so chunks
    overwrite each other. We implement the *correct* blockwise attention.
  * The reference adds its relative-position term per *query* row
    (rel_pos[..., i:i+chunk, :] broadcast over keys) — a per-row constant
    that softmax normalizes away, i.e. a mathematical no-op. We apply it per
    *key* (scores[b,h,q,k] += rel_pos[h,k]) so the learned factorized
    positional parameters (lunar_evaluator.py:136-137) actually condition
    attention, which is the evident intent.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax

from lunaris_orion_tpu.ops import layers

Params = Dict[str, jax.Array]


def attention_init(key, channels: int, *, num_heads: int = 8,
                   rel_pos_size: int = 8) -> Params:
    """qkv/proj 1x1 convs + factorized rel-pos params.

    Init matches the teacher's kaiming(fan_out) override
    (lunar_evaluator.py:399-406) for convs and randn*0.02 for rel-pos
    (lunar_evaluator.py:136-137).
    """
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "qkv": layers.conv2d_init(k1, channels, channels * 3, 1, scheme="kaiming_out"),
        "proj": layers.conv2d_init(k2, channels, channels, 1, scheme="kaiming_out"),
        "rel_pos_h": jax.random.normal(k3, (num_heads, rel_pos_size)) * 0.02,
        "rel_pos_w": jax.random.normal(k4, (num_heads, rel_pos_size)) * 0.02,
    }


def _interp_align_corners(p: jax.Array, out_len: int) -> jax.Array:
    """1-D linear interpolation, align_corners=True (torch F.interpolate
    bilinear on a [*, S, 1] map, lunar_evaluator.py:178-179). p: [H?, S]."""
    s = p.shape[-1]
    if out_len == s:
        return p
    if out_len == 1 or s == 1:
        return jnp.broadcast_to(p[..., :1], p.shape[:-1] + (out_len,))
    scale = (s - 1) / (out_len - 1)
    t = jnp.arange(out_len, dtype=jnp.float32) * scale
    lo = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, s - 2)
    frac = t - lo.astype(jnp.float32)
    p_lo = p[..., lo]
    p_hi = p[..., lo + 1]
    return p_lo * (1.0 - frac) + p_hi * frac


def rel_pos_bias(params: Params, h: int, w: int) -> jax.Array:
    """[heads, N] additive key bias from factorized 8x1 / 1x8 params."""
    rh = _interp_align_corners(params["rel_pos_h"].astype(jnp.float32), h)  # [heads, H]
    rw = _interp_align_corners(params["rel_pos_w"].astype(jnp.float32), w)  # [heads, W]
    grid = rh[:, :, None] + rw[:, None, :]  # [heads, H, W]
    return grid.reshape(grid.shape[0], h * w)


def _pick_block(n: int, desired: int) -> int:
    """Largest divisor of n that is <= desired (prefers powers of two)."""
    b = min(desired, n)
    while n % b != 0:
        b -= 1
    return b


def multihead_qkv(params: Params, x: jax.Array, num_heads: int):
    """x [B,H,W,C] -> q,k,v each [B, heads, N, head_dim]."""
    b, h, w, c = x.shape
    qkv = layers.conv2d(params["qkv"], x)  # [B,H,W,3C]
    qkv = qkv.reshape(b, h * w, 3, num_heads, c // num_heads)
    qkv = qkv.transpose(2, 0, 3, 1, 4)  # [3, B, heads, N, d]
    return qkv[0], qkv[1], qkv[2]


def flash_attention_xla(q, k, v, bias, *, block_q: int = 256,
                        block_k: int = 1024,
                        dropout_rate: float = 0.0,
                        rng: Optional[jax.Array] = None,
                        train: bool = False) -> jax.Array:
    """Blockwise online-softmax attention in pure JAX.

    q,k,v: [B, heads, N, d]; bias: [heads, N] additive key bias,
    [B, heads, N] for callers that batch distinct bias slices (API
    extension, parity-tested in tests/test_local_attention.py; no product
    call site uses it today), or None.
    Memory: O(B * heads * block_q * block_k). Accumulates in f32.
    """
    b, nh, n, d = q.shape
    bq = _pick_block(n, block_q)
    bk = _pick_block(n, block_k)
    nq, nk = n // bq, n // bk
    scale = d ** -0.5
    orig = q.dtype

    qb = q.reshape(b, nh, nq, bq, d).transpose(2, 0, 1, 3, 4)  # [nq,B,h,bq,d]
    kb = k.reshape(b, nh, nk, bk, d).transpose(2, 0, 1, 3, 4)
    vb = v.reshape(b, nh, nk, bk, d).transpose(2, 0, 1, 3, 4)
    if bias is None:
        bias_b = None
    elif bias.ndim == 3:  # [B, heads, N] -> [nk, B, h, bk]
        bias_b = bias.reshape(b, nh, nk, bk).transpose(2, 0, 1, 3)
    else:  # [heads, N] -> [nk, h, bk]
        bias_b = bias.reshape(nh, nk, bk).transpose(1, 0, 2)

    use_drop = train and dropout_rate > 0.0 and rng is not None

    @jax.checkpoint  # recompute per q-block in backward: without this the
    # kv-scan saves O(nq*nk*B*H*bq*bk) probability residuals (OOM at N=16k)
    def q_step(qi, q_blk):
        acc0 = jnp.zeros((b, nh, bq, d), jnp.float32)
        m0 = jnp.full((b, nh, bq, 1), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((b, nh, bq, 1), jnp.float32)

        def kv_step(carry, inputs):
            acc, m, l = carry
            ki, k_blk, v_blk = inputs
            s = jnp.einsum("bhqd,bhkd->bhqk", q_blk.astype(jnp.float32),
                           k_blk.astype(jnp.float32)) * scale
            if bias_b is not None:
                blk = bias_b[ki]
                s = s + (blk[:, :, None, :] if blk.ndim == 3
                         else blk[None, :, None, :])
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            corr = jnp.exp(m - m_new)
            l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
            if use_drop:
                tile_rng = jax.random.fold_in(jax.random.fold_in(rng, qi), ki)
                keep = jax.random.bernoulli(tile_rng, 1.0 - dropout_rate, p.shape)
                p = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
            acc_new = acc * corr + jnp.einsum(
                "bhqk,bhkd->bhqd", p, v_blk.astype(jnp.float32))
            return (acc_new, m_new, l_new), None

        (acc, _, l), _ = lax.scan(
            kv_step, (acc0, m0, l0),
            (jnp.arange(nk), kb, vb))
        return acc / jnp.maximum(l, 1e-30)

    out = lax.map(lambda args: q_step(*args), (jnp.arange(nq), qb))  # [nq,B,h,bq,d]
    out = out.transpose(1, 2, 0, 3, 4).reshape(b, nh, n, d)
    return out.astype(orig)


def full_attention(q, k, v, bias, *, dropout_rate: float = 0.0,
                   rng: Optional[jax.Array] = None,
                   train: bool = False) -> jax.Array:
    """O(N^2)-memory attention for small N / parity tests.

    bias: [heads, N], [B, heads, N] (per-batch; see flash_attention_xla),
    or None."""
    d = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * (d ** -0.5)
    if bias is not None:
        s = s + (bias[:, :, None, :] if bias.ndim == 3
                 else bias[None, :, None, :])
    p = jax.nn.softmax(s, axis=-1)
    if train and dropout_rate > 0.0 and rng is not None:
        keep = jax.random.bernoulli(rng, 1.0 - dropout_rate, p.shape)
        p = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
    out = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
    return out.astype(q.dtype)


def _pallas_vmem_risk(dtype, head_dim: int, n: int) -> bool:
    """True when the Mosaic kernel's scoped-VMEM stack would exceed the
    v5e's 16M limit: measured at f32 / head_dim 64 / N=16384 (16.5M,
    demo/runs_r5_highend r5 crash — the high-end recipe's eval-grid render
    before it moved to bf16). bf16 at the same shape is 8.25M and
    hardware-validated; auto dispatch falls back to the XLA flash path
    for the risky combination instead of failing at compile time."""
    return dtype == jnp.float32 and head_dim >= 64 and n >= 16384


class WindowTilingError(ValueError):
    """A window override cannot tile this input's token count (N % window
    != 0). A dedicated type so callers that degrade gracefully (e.g.
    QualityEvaluator.score_directory's per-group global fallback) catch
    the contract, not an error-message substring."""


def local_window_attention(q, k, v, bias, *, window: int,
                           dropout_rate: float = 0.0,
                           rng: Optional[jax.Array] = None,
                           train: bool = False) -> jax.Array:
    """CORRECT local attention over contiguous windows of the flattened
    token axis — the evident intent of the reference's 'memory-efficient'
    chunked attention (lunar_evaluator.py:190-218), whose shipped
    implementation both overwrites output chunks (ordinal indexing,
    :209,216) and never attends across chunks. This realizes the intended
    semantics (each token attends within its window, softmax and rel-pos
    bias correct) as an opt-in compute knob: score work drops from O(N^2)
    to O(N*window).

    q,k,v: [B, heads, N, d]; bias: [heads, N] additive key bias or None.
    Computed as a sequential (lax.map) sweep over windows, each window one
    dense MXU-shaped [W x W] attention with the backward rematerialized
    per window — peak memory is ONE window's score tile, O(B*heads*W^2),
    regardless of N. (Folding all windows into the batch dim instead was
    measured to OOM at 128px teacher shapes: every window's scores went
    live at once.)
    """
    b, nh, n, d = q.shape
    if window <= 0:
        raise ValueError(f"window must be positive, got {window}")
    if n % window != 0:
        raise WindowTilingError(f"window {window} must divide N={n}")
    nw = n // window

    def per_win(t):  # [B, h, N, d] -> [nW, B, h, W, d]
        return t.reshape(b, nh, nw, window, d).transpose(2, 0, 1, 3, 4)

    qw, kw, vw = per_win(q), per_win(k), per_win(v)
    bias_w = (None if bias is None
              else bias.reshape(nh, nw, window).transpose(1, 0, 2))
    use_drop = train and dropout_rate > 0.0 and rng is not None

    @jax.checkpoint  # recompute the window in backward: keeps one score
    # tile live instead of nW probability residuals
    def win_step(wi, q_blk, k_blk, v_blk):
        return full_attention(
            q_blk, k_blk, v_blk,
            None if bias_w is None else bias_w[wi],
            dropout_rate=dropout_rate,
            rng=jax.random.fold_in(rng, wi) if use_drop else None,
            train=train)

    out = lax.map(lambda args: win_step(*args),
                  (jnp.arange(nw), qw, kw, vw))  # [nW, B, h, W, d]
    return out.transpose(1, 2, 0, 3, 4).reshape(b, nh, n, d)


def self_attention_2d_init(key, channels: int) -> Params:
    """SelfAttention2d (reference lunar_generate.py:56-78): single-head
    spatial self-attention with q/k at C/8 width and a learned gamma-gated
    residual (gamma init 0). The reference defines it but never wires it
    into a model ("optional", :55); provided here for API completeness —
    usable as an optional VAE bottleneck block."""
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "query": layers.conv2d_init(k1, channels, max(channels // 8, 1), 1),
        "key": layers.conv2d_init(k2, channels, max(channels // 8, 1), 1),
        "value": layers.conv2d_init(k3, channels, channels, 1),
        "gamma": jnp.zeros((1,), jnp.float32),
    }


def self_attention_2d(params: Params, x: jax.Array) -> jax.Array:
    """x: [B,H,W,C] -> gamma * attn(x) + x  (lunar_generate.py:68-78)."""
    b, h, w, c = x.shape
    n = h * w
    q = layers.conv2d(params["query"], x).reshape(b, n, -1)
    k = layers.conv2d(params["key"], x).reshape(b, n, -1)
    v = layers.conv2d(params["value"], x).reshape(b, n, c)
    energy = jnp.einsum("bqc,bkc->bqk", q.astype(jnp.float32),
                        k.astype(jnp.float32))
    attn = jax.nn.softmax(energy, axis=-1)
    out = jnp.einsum("bqk,bkc->bqc", attn, v.astype(jnp.float32))
    out = out.reshape(b, h, w, c).astype(x.dtype)
    return params["gamma"].astype(x.dtype) * out + x


def spatial_attention_reference(params: Params, x: jax.Array, *,
                                num_heads: int = 8,
                                dropout_rate: float = 0.0,
                                rng: Optional[jax.Array] = None,
                                train: bool = False,
                                impl: str = "auto",
                                block_q: int = 256,
                                block_k: int = 1024,
                                cp_mesh=None,
                                cp_axis: Optional[str] = None,
                                cp_batch_axis: Optional[str] = None,
                                window: Optional[int] = None) -> jax.Array:
    """Full PixelArtAttention module: qkv -> blockwise attn(+rel-pos) -> proj.

    `impl`: 'auto' | 'full' | 'flash' | 'pallas' | 'ring' | 'allgather'.
    Dropout is
    applied to attention probabilities and to the projected output, as in
    the reference (lunar_evaluator.py:139-140,211-225).

    `window` (opt-in DEVIATION knob, docs/parity.md): tokens attend only
    within contiguous windows of the flattened token axis — the corrected
    realization of the reference's intended memory-efficient chunking
    (local_window_attention). Overrides `impl` when < N.

    impl='ring' / impl='allgather' (both require cp_mesh + cp_axis) shard
    the token axis N = H*W over the mesh axis and run cross-chip context
    parallelism (parallel/ring_attention.py) — a strategy the reference
    cannot express. 'ring' rotates k/v chunks via ppermute (O(N/p)
    streaming memory, XLA chunk compute — measured rho 4-5x the fused
    kernel, BASELINE.md r5); 'allgather' gathers k/v once per call and
    runs the SAME fused Pallas kernel per shard at rho ~= 1 for identical
    wire bytes — prefer it whenever the gathered k/v fits HBM (always at
    sprite scale). Both compose with the teacher's expert vmap (shard_map
    batches cleanly under vmap; parity pinned in
    tests/test_ring_attention.py) and with jax.checkpoint/grad/scan, so
    they are usable as the teacher attention inside the full train step
    (--attn_impl ring|allgather). `cp_batch_axis` names the mesh axis the
    batch dim is sharded over (pass the data axis inside the DP train
    step so CP never gathers the batch; dropout then seeds from global
    batch rows — still bit-identical to the single-device kernel).
    """
    b, h, w, c = x.shape
    n = h * w
    q, k, v = multihead_qkv(params, x, num_heads)
    bias = rel_pos_bias(params, h, w)

    attn_rng = proj_rng = None
    if rng is not None:
        attn_rng, proj_rng = jax.random.split(rng)

    drop_active = train and dropout_rate > 0.0 and attn_rng is not None
    head_dim = c // num_heads
    if window is not None and window <= 0:
        raise ValueError(f"window must be positive, got {window} "
                         "(use None / --attn_window 0 for global)")
    windowed = window is not None and window < n
    if windowed and impl in ("ring", "allgather", "pallas"):
        # Both are explicit requests the window path cannot honor; silent
        # substitution would mask exactly what the forced setting asserts.
        raise ValueError(
            f"window={window} cannot combine with impl={impl!r}: local-"
            "window attention runs its own XLA path (use impl='auto', or "
            "drop --attn_window / use_pallas)")
    if windowed:
        out = local_window_attention(q, k, v, bias, window=window,
                                     dropout_rate=dropout_rate,
                                     rng=attn_rng, train=train)
    else:
        if impl == "auto":
            from lunaris_orion_tpu.ops import dispatch
            from lunaris_orion_tpu.ops.pallas.flash_attention import (
                supported_seq_len)
            if n <= 1024:
                impl = "full"
            elif (dispatch.choose("attention") == "pallas"
                  and supported_seq_len(n)
                  and head_dim % (16 if q.dtype == jnp.bfloat16 else 8) == 0
                  and not _pallas_vmem_risk(q.dtype, head_dim, n)):
                # head_dim gate = Mosaic sublane tiling (bf16 16 / f32 8).
                # d in {8, 16, 48, 64} is hardware-validated
                # (tools/tpu_validate_attention.py PASS, 2026-08-17). Earlier
                # worker crashes attributed to d=48 reproduced on the pure-XLA
                # path too and are a transport property (long single XLA
                # executions kill the relay worker), not a kernel fault.
                impl = "pallas"
            else:
                # non-128-multiple N (arbitrary sizes) or non-TPU backend
                impl = "flash"
        elif impl == "pallas":
            # Forced (use_pallas=True): assert instead of silently degrading
            # — a knob that can't assert its own setting masks regressions.
            from lunaris_orion_tpu.ops.pallas.flash_attention import (
                supported_seq_len)
            if jax.default_backend() != "tpu":
                raise RuntimeError(
                    "use_pallas=True requires a TPU backend (got "
                    f"{jax.default_backend()!r}); use use_pallas=None for "
                    "auto fallback or use_pallas=False for the XLA path")
            if not supported_seq_len(n):
                raise ValueError(
                    f"use_pallas=True: sequence length {n} (= {h}x{w}) is "
                    "not a multiple of 128; the Mosaic kernel cannot tile it")
            mod = 16 if q.dtype == jnp.bfloat16 else 8
            if head_dim % mod != 0:
                # Same sublane-tiling gate the auto path enforces: without it
                # a forced run surfaces as an opaque Mosaic compile error.
                raise ValueError(
                    f"use_pallas=True: head_dim {head_dim} is not a multiple "
                    f"of {mod} (Mosaic sublane tiling for {q.dtype}); use a "
                    "feature_dim whose head_dim satisfies this, or "
                    "use_pallas=None/False")
            if _pallas_vmem_risk(q.dtype, head_dim, n):
                raise ValueError(
                    f"use_pallas=True: {q.dtype} at head_dim {head_dim}, "
                    f"N={n} exceeds the TPU's 16M scoped-VMEM stack "
                    "(measured 16.5M at f32/d64/N16384, r5); run in bf16 "
                    "(--mixed_precision / --bf16) or use_pallas=None/False")
        if impl in ("ring", "allgather"):
            if cp_mesh is None or cp_axis is None:
                raise ValueError(f"impl={impl!r} needs cp_mesh and cp_axis")
            if n % cp_mesh.shape[cp_axis] != 0:
                raise ValueError(
                    f"impl={impl!r}: N={n} not divisible by mesh axis "
                    f"{cp_axis!r} size {cp_mesh.shape[cp_axis]}")
            from lunaris_orion_tpu.parallel.ring_attention import (
                ring_attention_sharded)
            seed = None
            rate = 0.0
            if drop_active:
                rate = dropout_rate
                seed = jax.random.randint(attn_rng, (), 0, 2**31 - 1,
                                          jnp.int32)
            out = ring_attention_sharded(q, k, v, bias, mesh=cp_mesh,
                                         axis=cp_axis, dropout_rate=rate,
                                         seed=seed,
                                         batch_axis=cp_batch_axis,
                                         mode=impl)
        elif impl == "full":
            out = full_attention(q, k, v, bias, dropout_rate=dropout_rate,
                                 rng=attn_rng, train=train)
        elif impl == "pallas":
            from lunaris_orion_tpu.ops.pallas.flash_attention import (
                attention_bhnd)
            seed = None
            rate = 0.0
            if drop_active:
                rate = dropout_rate
                seed = jax.random.randint(attn_rng, (), 0, 2**31 - 1,
                                          jnp.int32)
            out = attention_bhnd(q, k, v, bias, dropout_rate=rate, seed=seed)
        else:
            out = flash_attention_xla(q, k, v, bias, block_q=block_q,
                                      block_k=block_k,
                                      dropout_rate=dropout_rate,
                                      rng=attn_rng, train=train)

    out = out.transpose(0, 2, 1, 3).reshape(b, h, w, c)
    out = layers.conv2d(params["proj"], out)
    out = layers.dropout(out, dropout_rate, rng=proj_rng, train=train)
    return out
