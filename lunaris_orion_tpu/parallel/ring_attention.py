"""Ring attention: cross-chip context parallelism over the spatial sequence.

SURVEY.md §2.6/§5 list sequence parallelism as the one strategy the
reference cannot express at all (its chunked attention,
lunar_evaluator.py:119-227, is a single-device *memory* tactic) and which
this framework documented as an extension; this module implements it.

The sequence axis N = H*W (16384 at the 128px flagship) is sharded over a
mesh axis. Each device holds a q/k/v/bias shard of N/p tokens; k/v/bias
chunks rotate around the ring via `lax.ppermute` while every device
accumulates its q-shard's attention over all N keys with the standard
online-softmax (flash) recurrence carried ACROSS ring steps. Per-chip
attention FLOPs and score memory drop by 1/p; the wire cost per step is the
k/v chunk (2*B*H*d*N/p elements), which rides ICI concurrently with the
next chunk's compute in XLA's pipelined schedule.

Numerics: accumulation is f32; the recurrence is the same blockwise form as
`ops.attention.flash_attention_xla`, so outputs match the single-device
path to roundoff (pinned by tests/test_ring_attention.py on the 8-virtual-
device mesh).

Dropout: the kernel family's stateless hash mask (ops/pallas/
flash_attention.py `_keep_mask`) depends only on (row_seed, ABSOLUTE k,
ABSOLUTE q), so every device regenerates bit-identical decisions for its
(q-shard x rotating-k-chunk) tiles — the ring decomposition cannot desync
dropout between devices or between forward and recompute, for the same
reason the Pallas forward/backward tilings cannot (r1 desync post-mortem).
Masks here are BIT-IDENTICAL to the Pallas kernel's for the same seed:
parity is asserted against the kernel's own `_hash_mask` in tests.

Gradients flow through `lax.ppermute` (its transpose is the inverse
rotation) and the scan; each ring step's score tiles are rematerialized in
backward (`jax.checkpoint` on the chunk step), so residual memory stays
O(B*H*N_local*d) per device instead of O(N_local*N).

Usage (inside or outside jit):

    spec = P(None, None, 'seq', None)
    out = ring_attention_sharded(q, k, v, bias, mesh=mesh, axis='seq',
                                 dropout_rate=0.1, seed=seed)

or call `ring_attention` directly inside an existing `shard_map` region.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from lunaris_orion_tpu.ops.pallas.flash_attention import (
    _C1, _C2, _C3, _dropout_threshold)

try:  # jax >= 0.7: the Shardy-native API. The legacy
    # jax.experimental.shard_map shim forces the old GSPMD partitioner,
    # whose "involuntary full rematerialization" fallback MISCOMPILES
    # gradients of unrelated tensors when this ring shares a program with
    # TP-sharded layers (caught by test_sharding.py::
    # test_ring_attention_train_step: VAE encoder grads off by 1e-2).
    from jax import shard_map as _shard_map_new
    _legacy_shard_map = None
except ImportError:  # pragma: no cover - older jax
    _shard_map_new = None
    from jax.experimental.shard_map import shard_map as _legacy_shard_map


def _keep_mask_qk(row_seed: jax.Array, q0: jax.Array, k0: jax.Array,
                  nq: int, nk: int, keep_prob: float) -> jax.Array:
    """[..., nq, nk] boolean keep-mask, bit-identical per element to the
    Pallas kernel's `_keep_mask` (which builds [bk, bq] tiles — this is the
    q-major transpose of the same hash). row_seed: [..., 1, 1] int32
    (seed ^ (b*H + h) * C1, matching `_row_seeds`); q0/k0: absolute offsets
    of this tile. int32 arithmetic wraps in XLA exactly as in Mosaic."""
    kcol = (row_seed
            + (k0 + lax.broadcasted_iota(jnp.int32, (1, nk), 1))
            * jnp.int32(_C2))
    qrow = ((q0 + lax.broadcasted_iota(jnp.int32, (nq, 1), 0))
            * jnp.int32(_C3))
    h = kcol + qrow
    h = h ^ lax.shift_right_logical(h, 15)
    h = h * jnp.int32(_C2)
    threshold = _dropout_threshold(keep_prob)
    return lax.bitcast_convert_type(h, jnp.uint32) < threshold


def _row_seed_bh(seed: jax.Array, b: int, h: int, b0=None) -> jax.Array:
    """[B, H, 1, 1] int32 per-(batch, head) seed, matching `_row_seeds`'s
    seed ^ row*C1 with row = b*H + h (the kernel's flattened BH order).
    `b0` (traced int32, optional): this shard's global first batch row —
    pass it when the batch dim is itself sharded over a mesh axis so
    every shard seeds from GLOBAL rows (bit-parity with the single-device
    kernel; without it shards would repeat rows 0..B_local-1's masks)."""
    rows = lax.broadcasted_iota(jnp.int32, (b, h, 1, 1), 0) * h \
        + lax.broadcasted_iota(jnp.int32, (b, h, 1, 1), 1)
    if b0 is not None:
        rows = rows + b0.astype(jnp.int32) * h
    return seed.astype(jnp.int32) ^ (rows * jnp.int32(_C1))


def _accum_chunk(acc, m, l, q32, k_chunk, v_chunk, bias_chunk, *,
                 q0: jax.Array, k0: jax.Array, scale: float,
                 block_k: int, dropout_rate: float,
                 row_seed: Optional[jax.Array]):
    """Fold one kv chunk into the online-softmax carry (acc, m, l).

    q32: [B,H,nl,d] f32 (pre-cast); k/v_chunk: [B,H,nc,d]; bias_chunk:
    [H,nc] or None; q0/k0: absolute token offsets of the q shard / this kv
    chunk (k0 is a traced scalar — it changes per ring step).
    Scans block_k-sized sub-blocks so score tiles stay [B,H,nl,block_k];
    each sub-block is checkpointed (recomputed in backward)."""
    bq = q32.shape[2]
    nc = k_chunk.shape[2]
    bk = min(block_k, nc)
    while nc % bk != 0:
        bk -= 1
    nkb = nc // bk
    kb = jnp.moveaxis(
        k_chunk.reshape(*k_chunk.shape[:2], nkb, bk, k_chunk.shape[3]),
        2, 0)  # [nkb,B,H,bk,d]
    vb = jnp.moveaxis(
        v_chunk.reshape(*v_chunk.shape[:2], nkb, bk, v_chunk.shape[3]),
        2, 0)
    bias_b = (None if bias_chunk is None
              else jnp.moveaxis(
                  bias_chunk.reshape(bias_chunk.shape[0], nkb, bk), 1, 0))

    @jax.checkpoint
    def sub_step(carry, inputs):
        acc, m, l = carry
        j, k_blk, v_blk = inputs
        s = jnp.einsum("bhqd,bhkd->bhqk", q32,
                       k_blk.astype(jnp.float32)) * scale
        if bias_b is not None:
            s = s + bias_b[j][None, :, None, :].astype(jnp.float32)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        if dropout_rate > 0.0 and row_seed is not None:
            keep = _keep_mask_qk(row_seed, q0, k0 + j * bk, bq, bk,
                                 1.0 - dropout_rate)
            p = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
        acc_new = acc * corr + jnp.einsum("bhqk,bhkd->bhqd", p,
                                          v_blk.astype(jnp.float32))
        return (acc_new, m_new, l_new), None

    (acc, m, l), _ = lax.scan(sub_step, (acc, m, l),
                              (jnp.arange(nkb), kb, vb))
    return acc, m, l


def ring_attention(q, k, v, bias, *, axis_name: str,
                   dropout_rate: float = 0.0,
                   seed: Optional[jax.Array] = None,
                   block_k: int = 512,
                   varying_axes: Optional[tuple] = None,
                   batch_axis_name: Optional[str] = None) -> jax.Array:
    """Per-shard ring attention body — call INSIDE shard_map/pmap.

    q, k, v: [B, H, N/p, d] — this device's shard of the token axis.
    bias: [H, N/p] per-key additive bias shard, or None.
    Returns the local output shard [B, H, N/p, d] of
    softmax(q k_full^T * d^-0.5 + bias_full) v_full (+ optional hash-mask
    prob dropout, identical to the Pallas kernel's for the same seed).

    `varying_axes`: every mesh axis the INPUTS vary over (default:
    (axis_name,)). Needed because the online-softmax carry starts from
    constants (zeros / -inf) and must be pre-marked varying
    (`lax.pvary`) for shard_map's per-shard type checking
    (check_vma=True) to accept the scan — which is what makes the
    transpose insert the psums for replicated-input cotangents (the bias
    and, under partial replication, q/k/v). Running with the checker off
    silently DROPS those psums: grads wrt bias lose the sum over the
    data axis on a ('data','model') mesh.
    """
    p = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    b, h, nl, d = q.shape
    scale = d ** -0.5
    orig = q.dtype
    q32 = q.astype(jnp.float32)
    q0 = idx * nl

    row_seed = None
    if dropout_rate > 0.0 and seed is not None:
        b0 = (lax.axis_index(batch_axis_name) * b
              if batch_axis_name is not None else None)
        row_seed = _row_seed_bh(jnp.asarray(seed, jnp.int32).reshape(()),
                                b, h, b0)

    vary = tuple(varying_axes) if varying_axes else (axis_name,)
    acc0 = lax.pvary(jnp.zeros((b, h, nl, d), jnp.float32), vary)
    m0 = lax.pvary(jnp.full((b, h, nl, 1), -jnp.inf, jnp.float32), vary)
    l0 = lax.pvary(jnp.zeros((b, h, nl, 1), jnp.float32), vary)
    # receive-from-right rotation: after s steps device i holds the chunk
    # that originated on device (i + s) % p
    perm = [(int((i + 1) % p), int(i)) for i in range(p)]

    def ring_step(carry, _):
        acc, m, l, kc, vc, bc, src = carry
        k0 = src * nl
        acc, m, l = _accum_chunk(
            acc, m, l, q32, kc, vc, bc, q0=q0, k0=k0, scale=scale,
            block_k=block_k, dropout_rate=dropout_rate, row_seed=row_seed)
        kc = lax.ppermute(kc, axis_name, perm)
        vc = lax.ppermute(vc, axis_name, perm)
        if bc is not None:
            bc = lax.ppermute(bc, axis_name, perm)
        src = (src + 1) % p
        return (acc, m, l, kc, vc, bc, src), None

    if _unroll_ring():
        carry = (acc0, m0, l0, k, v, bias, idx)
        for _ in range(p):
            carry, _ = ring_step(carry, None)
        acc, _, l = carry[0], carry[1], carry[2]
    else:
        (acc, _, l, _, _, _, _), _ = lax.scan(
            ring_step, (acc0, m0, l0, k, v, bias, idx), None, length=p)
    return (acc / jnp.maximum(l, 1e-30)).astype(orig)


def _unroll_ring() -> bool:
    import os
    return os.environ.get("LUNARIS_RING_UNROLL", "0") == "1"


def allgather_attention(q, k, v, bias, *, axis_name: str,
                        dropout_rate: float = 0.0,
                        seed: Optional[jax.Array] = None,
                        block_k: int = 512,
                        varying_axes: Optional[tuple] = None,
                        batch_axis_name: Optional[str] = None,
                        use_kernel: Optional[bool] = None) -> jax.Array:
    """Per-shard allgather context parallelism — call INSIDE shard_map.

    Same contract as `ring_attention` (q/k/v [B,H,N/p,d] shards of the
    token axis; bias [H,N/p] or None; returns the local output shard),
    different wire/compute trade: instead of rotating k/v chunks p times
    through an XLA online-softmax carry — measured at rho = 4-5x the
    fused kernel's cost per chip (tools/bench_ring.py, BASELINE.md r5
    "Ring context parallelism, priced") — it all-gathers the full
    k/v/bias ONCE per call and runs the SAME fused Pallas kernel the
    single-chip path uses, on (q shard x full keys) with the shard's
    absolute `q_offset`. The bytes on the wire are identical — each chip
    receives (p-1)/p of k/v(+bias) either way — but the compute runs at
    kernel efficiency (rho ~= 1). The cost is O(N) k/v HBM per chip
    instead of ring's O(N/p) streaming; at sprite scale (N=16384, d=16
    bf16: 17 MB gathered per call) that is never binding — reach for
    `ring_attention` only when the gathered k/v cannot fit.

    Dropout masks are bit-identical to the single-device kernel's and to
    the ring's for the same seed (the hash sees absolute (q, k)
    coordinates via `q_offset`). Gradients: the all_gather transposes to
    a reduce-scatter of the kernel's dk/dv/dbias — GSPMD/Shardy insert
    it; with check_vma on, partially-replicated inputs (bias, and q/k/v
    when the batch axis is replicated) get their cotangent psums exactly
    as in the ring (same failure mode, same guard).

    `use_kernel`: None = auto (fused kernel on TPU when the shard/full
    lengths tile and the dtype/head-dim gates pass — mirrors
    ops.attention's dispatch); False forces the XLA `_accum_chunk` fold
    (the CPU/odd-shape fallback, bit-parity dropout); True forces the
    kernel (interpret mode off-TPU — tests only).
    """
    p = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    b, h, nl, d = q.shape
    n = nl * p
    orig = q.dtype
    q0 = idx * nl
    if seed is None:
        dropout_rate = 0.0

    k_full = lax.all_gather(k, axis_name, axis=2, tiled=True)
    v_full = lax.all_gather(v, axis_name, axis=2, tiled=True)
    bias_full = (lax.all_gather(bias, axis_name, axis=1, tiled=True)
                 if bias is not None else None)

    if use_kernel is None:
        from lunaris_orion_tpu.ops.attention import _pallas_vmem_risk
        from lunaris_orion_tpu.ops.pallas.flash_attention import (
            supported_seq_len)
        use_kernel = (
            jax.default_backend() == "tpu"
            and supported_seq_len(n) and supported_seq_len(nl)
            and d % (16 if orig == jnp.bfloat16 else 8) == 0
            and not _pallas_vmem_risk(orig, d, n))
    b0 = (lax.axis_index(batch_axis_name) * b
          if batch_axis_name is not None else None)
    if use_kernel:
        from lunaris_orion_tpu.ops.pallas.flash_attention import (
            attention_bhnd)
        bias_k = (bias_full if bias_full is not None
                  else jnp.zeros((h, n), jnp.float32))
        return attention_bhnd(q, k_full, v_full, bias_k,
                              dropout_rate=dropout_rate, seed=seed,
                              q_offset=q0,
                              row_offset=(None if b0 is None else b0 * h))

    # XLA fallback: one _accum_chunk fold over the gathered keys — the
    # ring's blockwise recurrence with k0=0, bit-parity hash dropout.
    row_seed = None
    if dropout_rate > 0.0 and seed is not None:
        row_seed = _row_seed_bh(jnp.asarray(seed, jnp.int32).reshape(()),
                                b, h, b0)
    vary = tuple(varying_axes) if varying_axes else (axis_name,)
    acc0 = lax.pvary(jnp.zeros((b, h, nl, d), jnp.float32), vary)
    m0 = lax.pvary(jnp.full((b, h, nl, 1), -jnp.inf, jnp.float32), vary)
    l0 = lax.pvary(jnp.zeros((b, h, nl, 1), jnp.float32), vary)
    acc, _, l = _accum_chunk(
        acc0, m0, l0, q.astype(jnp.float32), k_full, v_full, bias_full,
        q0=q0, k0=jnp.int32(0), scale=d ** -0.5, block_k=block_k,
        dropout_rate=dropout_rate, row_seed=row_seed)
    return (acc / jnp.maximum(l, 1e-30)).astype(orig)


def ring_attention_sharded(q, k, v, bias, *, mesh: Mesh, axis: str,
                           dropout_rate: float = 0.0,
                           seed: Optional[jax.Array] = None,
                           block_k: int = 512,
                           batch_axis: Optional[str] = None,
                           mode: str = "ring",
                           use_kernel: Optional[bool] = None) -> jax.Array:
    """Global-view convenience wrapper: shard q/k/v[B,H,N,d] and bias[H,N]
    on the token axis over `axis` and run context-parallel attention.
    Composable under jit —
    GSPMD inserts any reshards the in_specs demand — and under `jax.vmap`
    (e.g. the teacher's stacked-expert axis; parity pinned in
    tests/test_ring_attention.py).

    `mode`: 'ring' (ppermute k/v rotation, O(N/p) streaming memory) or
    'allgather' (gather k/v once, run the fused Pallas kernel per shard
    at rho ~= 1 — see `allgather_attention`; `use_kernel` forwards there).
    Identical numerics and bit-identical dropout either way; allgather is
    4-5x cheaper per chip whenever the gathered k/v fits HBM
    (BASELINE.md r5 pricing).

    `batch_axis`: mesh axis the batch dim is sharded over (None =
    replicated). Inside the data-parallel train step pass the 'data' axis
    so the ring does NOT force an all-gather of the DP-sharded batch; the
    ring collectives only ever run over `axis`, so batch rows stay
    independent per data shard.

    Per-shard type checking (check_vma) is ON: on a multi-axis mesh the
    transpose must psum the cotangents of partially-replicated inputs
    (bias always; q/k/v when batch_axis=None) over the axes they were
    replicated on — with the checker off those psums are silently
    dropped and grads come back wrong (caught by
    tests/test_sharding.py::test_ring_attention_train_step)."""
    if mode not in ("ring", "allgather"):
        raise ValueError(f"mode must be 'ring' or 'allgather', got {mode!r}")
    spec_qkv = P(batch_axis, None, axis, None)
    has_bias = bias is not None
    in_specs = (spec_qkv, spec_qkv, spec_qkv,
                P(None, axis) if has_bias else None)
    vary = (axis,) + ((batch_axis,) if batch_axis is not None else ())
    body = ring_attention if mode == "ring" else functools.partial(
        allgather_attention, use_kernel=use_kernel)

    if has_bias:
        fn = functools.partial(body, axis_name=axis,
                               dropout_rate=dropout_rate, seed=seed,
                               block_k=block_k, varying_axes=vary,
                               batch_axis_name=batch_axis)
        return _shard_map_checked(fn, mesh, in_specs,
                                  spec_qkv)(q, k, v, bias)

    def fn_nobias(q, k, v):
        return body(q, k, v, None, axis_name=axis,
                    dropout_rate=dropout_rate, seed=seed,
                    block_k=block_k, varying_axes=vary,
                    batch_axis_name=batch_axis)

    return _shard_map_checked(fn_nobias, mesh,
                              (spec_qkv, spec_qkv, spec_qkv),
                              spec_qkv)(q, k, v)


def _shard_map_checked(fn, mesh, in_specs, out_specs):
    """shard_map with per-shard varying-axes checking enabled (check_vma /
    formerly check_rep) — the checker is what makes the transpose insert
    psums for replicated-input cotangents — routed through the modern
    jax.shard_map so lowering goes through Shardy, not the legacy GSPMD
    path (see the import note above)."""
    if _shard_map_new is not None:
        return _shard_map_new(fn, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_vma=True)
    return _legacy_shard_map(fn, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_rep=True)
