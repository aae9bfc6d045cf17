"""K2 — Pallas TPU flash attention over spatial tokens, with custom VJP and
in-kernel attention-probability dropout.

The correct, TPU-native realization of the reference's chunked
PixelArtAttention (lunar_evaluator.py:119-227; defects documented in
ops/attention.py): online-softmax blockwise attention with a per-key
additive rel-pos bias, O(N) memory, custom forward+backward Mosaic kernels.

Layout: the teacher's head_dim is tiny (feature_dim/8 = 16 at defaults), so
q/k/v/o are carried TRANSPOSED as [B*H, d, N]:
  * the lane (128) axis is always N or a block of it — no pad waste from
    d=16 (d sits on sublanes: 16 == the bf16 min tile sublane count),
  * scores are computed directly in transposed form
    sT[k,q] = dot(kT[d,bk], qT[d,bq]) so no in-kernel transposes exist in
    either pass; every matmul contracts over d or over a >=128 block axis.
  * matmuls run on bf16 MXU inputs with f32 accumulation
    (preferred_element_type) — softmax/statistics stay f32.

Row-vector operands (bias / lse / delta / seeds / block positions) are
carried as [*, 1, N]-style 3-D arrays so every BlockSpec's trailing two dims
satisfy Mosaic's (8,128)-divisible-or-full rule.

Dropout (reference: attn_drop(p) after softmax, lunar_evaluator.py:139,212):
masks are never materialized — each element's keep/drop decision is a
STATELESS hash of (per-row seed, absolute k index, absolute q index), so the
backward kernels regenerate bit-identical masks regardless of how each pass
tiles the score matrix (fwd BLOCK_K != BWD_BLOCK_K is safe by construction;
a per-tile PRNG reseed keyed on block indices was NOT — that was round 1's
gradient-desync defect). The per-row seed is carried as DATA (a seed lane
routed by index_map) and block positions likewise, never via pl.program_id —
vmap over stacked teacher experts prepends grid dimensions, which would
silently shift program_id positions. The hash is pure lax ops, so tests
rebuild the exact mask outside Pallas for dense references. Softmax
normalization uses the un-dropped probabilities (torch semantics). Backward
math: with D = mask/keep, o = (D.Pn)V, delta = rowsum(dO.O) still equals
rowsum(Pn.dPn), so ds = Pn.(D.(dO V^T) - delta) and dV = (D.Pn)^T dO.
(Validated on hardware against a dense same-mask reference; see
tests/test_pallas_attention.py + tools/tpu_validate_attention.py.)

Forward saves (o, lse); backward is the standard two-kernel flash
decomposition (dq gridded over q blocks; dk/dv/dbias over kv blocks).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
# Block sizes from an on-device sweep at the production shape
# (B*H=64, N=16384, d=16). fwd 1024/2048 is fastest standalone but
# measured NEUTRAL inside the product hybrid step (3,402 vs 3,386 ms,
# BASELINE.md r3 cont.); 512/2048 is within 10% standalone and fits
# everywhere. The backward kernels hold
# more live buffers (full q/do rows + grad accumulators) and need
# 512/1024 — re-swept for the FUSED backward on-device
# (tools/bench_fused_blocks.py): the surface is flat within 1% across
# every VMEM-feasible combo, so the two-kernel optimum stands for it
# too. _pick_block clamps for small N. Env-overridable as tuning knobs
# (read at import; the hash dropout mask is block-decomposition
# independent, so any override is numerics-safe).
import os as _os

BLOCK_Q = int(_os.environ.get("LUNARIS_ATTN_BLOCK_Q", 512))
BLOCK_K = int(_os.environ.get("LUNARIS_ATTN_BLOCK_K", 2048))
BWD_BLOCK_Q = int(_os.environ.get("LUNARIS_ATTN_BWD_BLOCK_Q", 512))
BWD_BLOCK_K = int(_os.environ.get("LUNARIS_ATTN_BWD_BLOCK_K", 1024))

# A bf16-probability variant (exp/select on bf16 tiles) was benchmarked on
# v5e and measured ~15-25% SLOWER than the f32 path (59.6 vs 51.5 ms fwd at
# the production shape) — Mosaic does not 2x-pack these bf16 VPU ops and
# the extra casts cost; probabilities therefore stay f32 until the MXU cast.

# Single-pass fused backward (see _bwd_fused_kernel): computes exp/masks
# once per tile pair instead of once per backward kernel. DEFAULT ON where
# the dq-accumulator VMEM gate passes (r3 correction, BASELINE.md "fused
# backward, re-measured honestly"): the r2 "9% slower" rejection
# (166.3 vs 152.0 ms) was a benchmarking artifact — its jax.grad was taken
# w.r.t. q ONLY, which let XLA dead-code-eliminate the ENTIRE dkv kernel
# from the two-kernel path. With grads w.r.t. all inputs (what training
# actually computes): two-kernel 283.8 ms vs fused 167.8 ms fwd+bwd at the
# production shape (B8 H8 N16384 d16, dropout 0.1) — fused is 1.69x
# faster. Set LUNARIS_ATTN_FUSED_BWD=0 to restore the two-kernel
# decomposition (still the only path when d*N*4 > 3 MB, e.g. d=64 at
# N=16384 — that row is VMEM-infeasible fused in every tiling; see
# _fused_dq_limit / _bwd_blocks).


def _fused_bwd() -> bool:
    """Read at call time so tests/benchmarks can toggle without reload."""
    return _os.environ.get("LUNARIS_ATTN_FUSED_BWD", "1") == "1"


def _fused_dq_limit() -> int:
    """VMEM byte cap for the fused backward's whole-row f32 dq accumulator
    (read at call time). Default 3 MB, set by the on-chip feasibility
    sweep (tools/bench_fused_blocks.py --dims): d=16 (1 MB row) and
    d=48 @ N=16384 (3 MB row, with the kv tile capped at 512 by
    _bwd_blocks) both compile and win; d=64 (4 MB row) fails scoped-VMEM
    compile in every tiling and must take the two-kernel path."""
    return int(_os.environ.get("LUNARIS_ATTN_FUSED_DQ_BYTES", 3 * 2**20))

# r3 item-8 experiment knobs (BASELINE.md records the measurements):
#  LUNARIS_ATTN_EXP2=1   — carry scores in the log2 domain: q and bias are
#    pre-scaled by log2(e) outside the custom_vjp, kernels use exp2/log2,
#    and the backward's d(exp2)/dx = ln2*exp2 factor is applied once to the
#    small dq/dk/dbias accumulators instead of per score element. Saves the
#    hidden x*log2e multiply inside every exp lowering.
#  LUNARIS_ATTN_DROPOUT=prng — in-kernel pltpu.prng_random_bits dropout:
#    the PRNG is reseeded per fixed 512x512 score subtile from ABSOLUTE
#    block coordinates (row_seed, k_abs/512, q_abs/512), so forward and
#    backward kernels with different tilings regenerate bit-identical
#    masks (the same property the 5-op hash provides, validated by the
#    block-config bit-identity check in tools/tpu_validate_attention.py).
LN2 = 0.6931471805599453
LOG2E = 1.4426950408889634
_PRNG_GRAIN = 512


def _exp2_mode() -> bool:
    return _os.environ.get("LUNARIS_ATTN_EXP2", "0") == "1"


# r4 VPU-floor knobs (VERDICT r3 item 1): the forward is VPU-bound at
# ~6 full-tile ops per score (bias add, running max, sub+exp, row sum,
# bf16 cast) while the MXU idles ~80% — these move per-score VPU work onto
# the MXU. Both are exact reformulations up to dtype rounding noted below.
#  LUNARIS_ATTN_FOLD_BIAS — the per-key bias rides the QK matmul as an
#    extra contraction row (k' = [k; bias], q' = [q; 1]): sT arrives with
#    the bias already added, deleting the [bk, bq] VPU add from every
#    kernel. The bias is cast to the MXU input dtype (bf16 in the product
#    path) — the same rounding class the scores already carry from bf16
#    q/k inputs.
#  LUNARIS_ATTN_MXU_SUM — the softmax row-sum rides the MXU instead of a
#    full-tile VPU reduce. dropout=0: a ones row appended to v makes the
#    accumulator's last row the l recurrence (corr rescale included) for
#    free. dropout>0: l = dot(ones[1, bk], pT) as a separate skinny MXU
#    dot (normalization must sum the UNDROPPED probabilities — torch
#    semantics, module docstring).
def _fold_bias() -> bool:
    return _os.environ.get("LUNARIS_ATTN_FOLD_BIAS", "0") == "1"


def _mxu_sum() -> bool:
    return _os.environ.get("LUNARIS_ATTN_MXU_SUM", "0") == "1"


def _prng_dropout(nq: int, nk: int = None) -> bool:
    """Whole-call PRNG-dropout eligibility, decided ONCE per attention call
    from the sequence length(s): every tile shape the forward AND backward
    kernels will derive from them must be 512-aligned, otherwise ALL
    kernels fall back to the hash mask together. A per-kernel
    (per-tile-shape) decision would let the forward use the PRNG mask
    while a backward kernel with a smaller non-aligned tiling silently
    used the hash mask — different dropout masks between forward and
    backward, i.e. corrupt gradients (found in review; pinned by
    tests/test_pallas_attention.py::test_prng_eligibility_consistent).
    nk defaults to nq (the square single-device call); the CP shard path
    (q rows nq = N/p vs gathered keys nk = N) passes both."""
    if nk is None:
        nk = nq
    if _os.environ.get("LUNARIS_ATTN_DROPOUT", "hash") != "prng":
        return False
    if _interpret():
        return False  # pltpu.prng_* needs real Mosaic
    blocks = (_pick_block(nq, BLOCK_Q), _pick_block(nk, BLOCK_K),
              _pick_block(nq, BWD_BLOCK_Q), _pick_block(nk, BWD_BLOCK_K))
    return all(b % _PRNG_GRAIN == 0 for b in blocks)


def _kexp(x):
    return jnp.exp2(x) if _exp2_mode() else jnp.exp(x)


def _klog(x):
    return jnp.log2(x) if _exp2_mode() else jnp.log(x)


def _prng_keep(row_seed, k0, q0, shape, keep_prob: float):
    """Hardware-PRNG keep-mask, reseeded per 512x512 subtile from absolute
    coordinates — block-decomposition independent like _keep_mask."""
    bk, bq = shape
    threshold = _dropout_threshold(keep_prob)
    rows = []
    for gi in range(bk // _PRNG_GRAIN):
        cols = []
        for gj in range(bq // _PRNG_GRAIN):
            # Mosaic's prng_set_seed takes at most 2 values: fold the
            # absolute (k, q) subtile coordinates into the second word.
            pltpu.prng_seed(
                row_seed,
                (k0 // _PRNG_GRAIN + gi) * jnp.int32(_C2)
                + (q0 // _PRNG_GRAIN + gj) * jnp.int32(_C3))
            cols.append(pltpu.bitcast(
                pltpu.prng_random_bits((_PRNG_GRAIN, _PRNG_GRAIN)),
                jnp.uint32))
        rows.append(cols[0] if len(cols) == 1
                    else jnp.concatenate(cols, axis=1))
    bits = rows[0] if len(rows) == 1 else jnp.concatenate(rows, axis=0)
    return bits < threshold


def supported_seq_len(n: int) -> bool:
    """Mosaic requires lane-dim blocks to be multiples of 128 (or the full
    dim); callers must route other sequence lengths to the XLA fallback."""
    return n % 128 == 0 or n < 128


def _pick_block(n: int, desired: int) -> int:
    """Largest 128-multiple <= desired dividing n (full n for small inputs)."""
    b = (min(desired, n) // 128) * 128
    while b >= 128 and n % b != 0:
        b -= 128
    if b >= 128:
        return b
    b = min(desired, n)
    while n % b != 0:
        b -= 1
    return b


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _out_struct(shape, dtype, *operands):
    """ShapeDtypeStruct for a pallas_call output, carrying the union of the
    operands' varying-mesh-axes (vma) when tracing inside a
    `check_vma=True` shard_map (the CP allgather path calls the kernel
    per shard there); plain struct everywhere else."""
    try:
        vma = frozenset().union(
            *(getattr(jax.typeof(x), "vma", frozenset()) for x in operands))
        if vma:
            return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    except Exception:
        pass
    return jax.ShapeDtypeStruct(shape, dtype)


_C1 = int(np.uint32(0x9E3779B9).astype(np.int32))
_C2 = int(np.uint32(0x85EBCA6B).astype(np.int32))
_C3 = int(np.uint32(0xC2B2AE35).astype(np.int32))


def _dropout_threshold(keep_prob: float) -> jnp.ndarray:
    """uint32 compare threshold for `bits < threshold` keep decisions.

    Clamped to 2**32-1: keep_prob values that round to 1.0 in float (e.g.
    dropout_rate = 1e-17, which still takes the rate>0 branch) must keep
    ~everything — the former `& 0xFFFFFFFF` wrapped int(2**32) to 0 and
    dropped every element instead. Shared by the kernel hash mask, the
    PRNG mode, and ring attention so bit-parity is preserved."""
    return jnp.uint32(min(int(keep_prob * 4294967296.0), 0xFFFFFFFF))


def _row_seeds(seed, bh: int, roff=None) -> jax.Array:
    """[BH, 1, 128] int32 per-(batch*head) seed lane (index_map-routable).
    `roff` (traced int32 scalar, optional): offset added to the flattened
    B*H row index — the CP path with a sharded batch passes its shard's
    global first row (b0*H) so dropout decisions stay bit-identical to
    the single-device call's per GLOBAL (batch, head)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (bh, 1, 1), 0)
    if roff is not None:
        rows = rows + roff.astype(jnp.int32)
    rows = seed.reshape(1, 1, 1).astype(jnp.int32) ^ (
        rows * jnp.int32(_C1))
    return jnp.broadcast_to(rows, (bh, 1, 128))


def _pos_lanes(n_blocks: int) -> jax.Array:
    """[n_blocks, 1, 128] int32 block-position-as-data."""
    pos = jax.lax.broadcasted_iota(jnp.int32, (n_blocks, 1, 1), 0)
    return jnp.broadcast_to(pos, (n_blocks, 1, 128))


def _keep_mask(row_seed, k0, q0, shape, keep_prob: float):
    """Stateless boolean dropout keep-mask from ABSOLUTE (k, q) coordinates.

    Block-decomposition independent: forward and backward kernels tile the
    score matrix differently (BLOCK_* vs BWD_BLOCK_*) yet regenerate
    bit-identical masks, because each element's decision depends only on
    (row_seed, k0+row, q0+col). Pure lax ops: also runs outside Pallas, so
    tests can build dense same-mask references. `shape` is [bk, bq].

    The mixer is deliberately minimal — the VPU is the dropout bottleneck
    (~10 full-tile ops/element was half the kernel's vector time in r1):
    coordinate spreads by large odd constants are factored into a
    column/row vector pair, so the per-element work is one broadcast add,
    one xorshift (high->low), one i32 multiply (low->high avalanche into
    the compared high bits) and the threshold compare — 5 full-tile ops.
    Keep-fraction statistics are pinned by tests/test_pallas_attention.py.
    """
    bk, bq = shape
    col = (row_seed
           + (k0 + jax.lax.broadcasted_iota(jnp.int32, (bk, 1), 0))
           * jnp.int32(_C2))
    row = ((q0 + jax.lax.broadcasted_iota(jnp.int32, (1, bq), 1))
           * jnp.int32(_C3))
    h = col + row
    h = h ^ jax.lax.shift_right_logical(h, 15)
    h = h * jnp.int32(_C2)
    threshold = _dropout_threshold(keep_prob)
    return jax.lax.bitcast_convert_type(h, jnp.uint32) < threshold


def _hash_mask(row_seed, k0, q0, shape, keep_prob: float):
    """f32 {0, 1/keep_prob} mask (dense-reference form of _keep_mask)."""
    keep = _keep_mask(row_seed, k0, q0, shape, keep_prob)
    return keep.astype(jnp.float32) * (1.0 / keep_prob)


def _mask_for(row_seed, k0, q0, shape, keep_prob: float, use_prng: bool):
    """Trace-time dispatch between the 5-op hash mask (default, also runs
    outside Pallas for dense test references) and the hardware-PRNG mask.
    `use_prng` is the WHOLE-CALL _prng_dropout(n) decision threaded in by
    the kernel builders — never re-derived per tile shape, so the forward
    and backward kernels of one call always agree on the mask family."""
    if use_prng:
        assert all(s % _PRNG_GRAIN == 0 for s in shape), shape
        return _prng_keep(row_seed, k0, q0, shape, keep_prob)
    return _keep_mask(row_seed, k0, q0, shape, keep_prob)


# ---------------------------------------------------------------------------
# Forward kernel: grid (BH, n_q_blocks)
# ---------------------------------------------------------------------------

def _fwd_kernel(seed_ref, qpos_ref, bias_ref, q_ref, k_ref, v_ref,
                o_ref, lse_ref, *, block_k: int, dropout_rate: float,
                use_prng: bool, fold_bias: bool, mxu_sum: bool):
    # q arrives PRE-SCALED by d^-0.5 (applied once outside the custom_vjp,
    # saving a full [bk, bq] multiply per tile in all three kernels).
    d = q_ref.shape[1]
    bq = q_ref.shape[2]
    n = k_ref.shape[2]
    nk = n // block_k
    qT = q_ref[0]                       # [d, bq] native dtype (MXU input)
    row_seed = seed_ref[0, 0, 0]
    q_id = qpos_ref[0, 0, 0]
    inv_keep = 1.0 / (1.0 - dropout_rate) if dropout_rate > 0.0 else 1.0
    # fold_bias: q gains a ones row so the bias row appended to k lands as
    # "+bias" in the matmul epilogue — built ONCE per program, [*, bq]-cheap.
    q1 = (jnp.concatenate([qT, jnp.ones((1, bq), qT.dtype)], axis=0)
          if fold_bias else qT)
    # mxu_sum at dropout>0: l = ones @ pT (the UNDROPPED probabilities).
    ones_k = (jnp.ones((1, block_k), jnp.float32)
              if (mxu_sum and dropout_rate > 0.0) else None)
    # mxu_sum at dropout=0: the ones row appended to v makes acc's last row
    # the l recurrence itself (the corr rescale applies to acc uniformly).
    v_ones = mxu_sum and dropout_rate == 0.0

    def body(j, carry):
        acc, m, l = carry
        kT = k_ref[0, :, pl.ds(j * block_k, block_k)]
        vT = v_ref[0, :, pl.ds(j * block_k, block_k)]
        b_blk = bias_ref[0, 0, pl.ds(j * block_k, block_k)]       # [bk]
        if fold_bias:
            k1 = jnp.concatenate(
                [kT, b_blk[None, :].astype(kT.dtype)], axis=0)    # [d+1, bk]
            sT = jax.lax.dot_general(
                k1, q1, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)               # [bk, bq]
        else:
            sT = jax.lax.dot_general(
                kT, qT, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)               # [bk, bq]
            sT = sT + b_blk[:, None]
        m_new = jnp.maximum(m, jnp.max(sT, axis=0, keepdims=True))  # [1, bq]
        corr = _kexp(m - m_new)
        pT = _kexp(sT - m_new)                                  # [bk, bq]
        if mxu_sum and dropout_rate > 0.0:
            l_new = l * corr + jax.lax.dot_general(
                ones_k, pT, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)               # [1, bq]
        elif not v_ones:
            l_new = l * corr + jnp.sum(pT, axis=0, keepdims=True)
        else:
            l_new = l                                             # unused
        if dropout_rate > 0.0:
            keep = _mask_for(row_seed, j * block_k, q_id * bq,
                              pT.shape, 1.0 - dropout_rate, use_prng)
            pT_used = jnp.where(keep, pT * inv_keep, 0.0)
        else:
            pT_used = pT
        vm = (jnp.concatenate([vT, jnp.ones((1, block_k), vT.dtype)], axis=0)
              if v_ones else vT)
        acc_new = acc * corr + jax.lax.dot_general(
            vm, pT_used.astype(vT.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # [d(+1), bq]
        return acc_new, m_new, l_new

    acc0 = jnp.zeros((d + (1 if v_ones else 0), bq), jnp.float32)
    m0 = jnp.full((1, bq), NEG_INF, jnp.float32)
    l0 = jnp.zeros((1, bq), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, nk, body, (acc0, m0, l0))
    if v_ones:
        l = acc[d:d + 1, :]
        acc = acc[:d, :]
    l = jnp.maximum(l, 1e-30)
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0] = m + _klog(l)


def _lane_spec(index_map):
    return pl.BlockSpec((1, 1, 128), index_map, memory_space=pltpu.VMEM)


_PARALLEL2 = pltpu.CompilerParams(
    dimension_semantics=("parallel", "parallel"))


def _fwd(qT, kT, vT, bias3, seed, *, block_q: int, block_k: int,
         dropout_rate: float, qoff=None, roff=None):
    """qT pre-scaled by d^-0.5; bias3: [H, 1, Nk]; seed: int32 scalar array.
    Returns (oT [BH,d,Nq], lse [BH,1,Nq]).

    Rectangular (Nq != Nk) is supported for the context-parallel shard
    path (parallel/ring_attention.py allgather mode): q holds this shard's
    Nq = N/p rows, k/v/bias the full gathered N. `qoff` (traced int32
    scalar, tokens; must be a multiple of the q block size — guaranteed
    when shard boundaries are block-aligned) shifts the q positions the
    dropout hash sees, so shard masks are bit-identical to the
    single-device kernel's at the same seed."""
    bh, d, nq = qT.shape
    nk = kT.shape[2]
    h = bias3.shape[0]
    bq = _pick_block(nq, block_q)
    bk = _pick_block(nk, block_k)
    grid = (bh, nq // bq)
    qpos = _pos_lanes(nq // bq)
    if qoff is not None:
        qpos = qpos + qoff.astype(jnp.int32) // bq
    vm = dict(memory_space=pltpu.VMEM)
    o, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, block_k=bk,
                          dropout_rate=dropout_rate,
                          use_prng=_prng_dropout(nq, nk),
                          fold_bias=_fold_bias(), mxu_sum=_mxu_sum()),
        grid=grid,
        compiler_params=_PARALLEL2,
        in_specs=[
            _lane_spec(lambda b, i: (b, 0, 0)),                     # row seeds
            _lane_spec(lambda b, i: (i, 0, 0)),                     # q pos
            pl.BlockSpec((1, 1, nk), lambda b, i: (jax.lax.rem(b, h), 0, 0),
                         **vm),                                     # bias
            pl.BlockSpec((1, d, bq), lambda b, i: (b, 0, i), **vm),  # qT
            pl.BlockSpec((1, d, nk), lambda b, i: (b, 0, 0), **vm),  # kT
            pl.BlockSpec((1, d, nk), lambda b, i: (b, 0, 0), **vm),  # vT
        ],
        out_specs=(
            pl.BlockSpec((1, d, bq), lambda b, i: (b, 0, i), **vm),
            pl.BlockSpec((1, 1, bq), lambda b, i: (b, 0, i), **vm),
        ),
        out_shape=(
            _out_struct((bh, d, nq), qT.dtype, qT, kT, vT, bias3),
            _out_struct((bh, 1, nq), jnp.float32, qT, kT, vT, bias3),
        ),
        interpret=_interpret(),
    )(_row_seeds(seed, bh, roff), qpos, bias3, qT, kT, vT)
    return o, lse


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------

def _bwd_dq_kernel(seed_ref, qpos_ref, bias_ref, q_ref, k_ref, v_ref, do_ref,
                   lse_ref, delta_ref, dq_ref, *, block_k: int,
                   dropout_rate: float, use_prng: bool):
    # q pre-scaled; dq produced here is the gradient wrt the SCALED q — the
    # chain through the outside scaling restores d^-0.5 automatically.
    d, bq = q_ref.shape[1], q_ref.shape[2]
    n = k_ref.shape[2]
    nk = n // block_k
    qT = q_ref[0]
    doT = do_ref[0]
    lse = lse_ref[0]      # [1, bq]
    delta = delta_ref[0]  # [1, bq]
    row_seed = seed_ref[0, 0, 0]
    q_id = qpos_ref[0, 0, 0]
    inv_keep = 1.0 / (1.0 - dropout_rate) if dropout_rate > 0.0 else 1.0

    def body(j, dq):
        kT = k_ref[0, :, pl.ds(j * block_k, block_k)]
        vT = v_ref[0, :, pl.ds(j * block_k, block_k)]
        sT = jax.lax.dot_general(kT, qT, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        sT = sT + bias_ref[0, 0, pl.ds(j * block_k, block_k)][:, None]
        pT = _kexp(sT - lse)                                     # [bk, bq]
        dpT = jax.lax.dot_general(vT, doT, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        if dropout_rate > 0.0:
            keep = _mask_for(row_seed, j * block_k, q_id * bq,
                              dpT.shape, 1.0 - dropout_rate, use_prng)
            dpT = jnp.where(keep, dpT * inv_keep, 0.0)
        dsT = (pT * (dpT - delta)).astype(qT.dtype)                # [bk, bq]
        return dq + jax.lax.dot_general(
            kT, dsT, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                    # [d, bq]

    dq = jax.lax.fori_loop(0, nk, body, jnp.zeros((d, bq), jnp.float32))
    if _exp2_mode():
        dq = dq * LN2   # d exp2(x)/dx = ln2*exp2(x), applied to the small
    dq_ref[0] = dq.astype(dq_ref.dtype)   # [d, bq] accumulator, not per tile


def _bwd_dkv_kernel(seed_ref, kpos_ref, qoff_ref, bias_ref, q_ref, k_ref,
                    v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
                    dbias_ref, *,
                    block_q: int, dropout_rate: float, use_prng: bool):
    # q pre-scaled: dk = q_scaled @ ds already carries the d^-0.5 factor.
    # qoff_ref: absolute token offset of the q rows (lane input; 0 for the
    # square call, the shard offset on the CP allgather path) — the
    # dropout hash must see ABSOLUTE q positions.
    d, bk = k_ref.shape[1], k_ref.shape[2]
    n = q_ref.shape[2]
    nq = n // block_q
    kT = k_ref[0]
    vT = v_ref[0]
    bias_blk = bias_ref[0, 0, :][:, None]                           # [bk, 1]
    row_seed = seed_ref[0, 0, 0]
    k_id = kpos_ref[0, 0, 0]
    q_off = qoff_ref[0, 0, 0]
    inv_keep = 1.0 / (1.0 - dropout_rate) if dropout_rate > 0.0 else 1.0

    def body(i, carry):
        dk, dv, dbias = carry
        qT = q_ref[0, :, pl.ds(i * block_q, block_q)]
        doT = do_ref[0, :, pl.ds(i * block_q, block_q)]
        lse = lse_ref[0, 0:1, pl.ds(i * block_q, block_q)]
        delta = delta_ref[0, 0:1, pl.ds(i * block_q, block_q)]
        sT = jax.lax.dot_general(kT, qT, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        sT = sT + bias_blk
        pT = _kexp(sT - lse)                                      # [bk, bq]
        dpT = jax.lax.dot_general(vT, doT, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        if dropout_rate > 0.0:
            keep = _mask_for(row_seed, k_id * bk, q_off + i * block_q,
                              pT.shape, 1.0 - dropout_rate, use_prng)
            dpT = jnp.where(keep, dpT * inv_keep, 0.0)
            pT_v = jnp.where(keep, pT * inv_keep, 0.0)
        else:
            pT_v = pT
        dsT = pT * (dpT - delta)
        dk_new = dk + jax.lax.dot_general(
            qT, dsT.astype(qT.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                     # [d, bk]
        dv_new = dv + jax.lax.dot_general(
            doT, pT_v.astype(doT.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                     # [d, bk]
        dbias_new = dbias + jnp.sum(dsT, axis=1, keepdims=True).T   # [1, bk]
        return dk_new, dv_new, dbias_new

    dk0 = jnp.zeros((d, bk), jnp.float32)
    dv0 = jnp.zeros((d, bk), jnp.float32)
    db0 = jnp.zeros((1, bk), jnp.float32)
    dk, dv, dbias = jax.lax.fori_loop(0, nq, body, (dk0, dv0, db0))
    if _exp2_mode():
        dk = dk * LN2        # ds2 = ln2 * p (dp - delta); folded here once
        dbias = dbias * LN2  # (dv uses the probabilities, not ds — no ln2)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)
    dbias_ref[0] = dbias


def _bwd_fused_kernel(seed_ref, kpos_ref, qoff_ref, bias_ref, q_ref, k_ref,
                      v_ref, do_ref, lse_ref, delta_ref, dq_ref, dk_ref,
                      dv_ref, dbias_ref, *, block_q: int,
                      dropout_rate: float, use_prng: bool):
    """Single-pass backward: one program = one (bh, kv-block); dq is a
    whole-row f32 VMEM accumulator revisited across the kv grid dimension
    (1 MB at d=16, N=16384 — fits), zero-initialized at the first kv block.

    Halves the backward's VPU work vs the classic two-kernel decomposition:
    scores, exp and the dropout mask are computed ONCE per (q,k) tile pair
    instead of once in the dq kernel and again in the dk/dv kernel, and
    q/do stream once per bh row instead of once per kv block.
    """
    d, bk = k_ref.shape[1], k_ref.shape[2]
    n = q_ref.shape[2]
    nq = n // block_q
    kT = k_ref[0]
    vT = v_ref[0]
    bias_blk = bias_ref[0, 0, :][:, None]                           # [bk, 1]
    row_seed = seed_ref[0, 0, 0]
    k_id = kpos_ref[0, 0, 0]
    q_off = qoff_ref[0, 0, 0]
    inv_keep = 1.0 / (1.0 - dropout_rate) if dropout_rate > 0.0 else 1.0

    @pl.when(pl.program_id(1) == 0)
    def _():
        dq_ref[0] = jnp.zeros_like(dq_ref[0])

    def body(i, carry):
        dk, dv, dbias = carry
        qT = q_ref[0, :, pl.ds(i * block_q, block_q)]
        doT = do_ref[0, :, pl.ds(i * block_q, block_q)]
        lse = lse_ref[0, 0:1, pl.ds(i * block_q, block_q)]
        delta = delta_ref[0, 0:1, pl.ds(i * block_q, block_q)]
        sT = jax.lax.dot_general(kT, qT, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        sT = sT + bias_blk
        pT = _kexp(sT - lse)                                      # [bk, bq]
        dpT = jax.lax.dot_general(vT, doT, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        if dropout_rate > 0.0:
            keep = _mask_for(row_seed, k_id * bk, q_off + i * block_q,
                              pT.shape, 1.0 - dropout_rate, use_prng)
            dpT = jnp.where(keep, dpT * inv_keep, 0.0)
            pT_v = jnp.where(keep, pT * inv_keep, 0.0)
        else:
            pT_v = pT
        dsT = pT * (dpT - delta)
        dsT_c = dsT.astype(qT.dtype)
        dk = dk + jax.lax.dot_general(
            qT, dsT_c, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                     # [d, bk]
        dv = dv + jax.lax.dot_general(
            doT, pT_v.astype(doT.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                     # [d, bk]
        dq_ref[0, :, pl.ds(i * block_q, block_q)] += jax.lax.dot_general(
            kT, dsT_c, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                     # [d, bq]
        dbias = dbias + jnp.sum(dsT, axis=1, keepdims=True).T       # [1, bk]
        return dk, dv, dbias

    dk0 = jnp.zeros((d, bk), jnp.float32)
    dv0 = jnp.zeros((d, bk), jnp.float32)
    db0 = jnp.zeros((1, bk), jnp.float32)
    dk, dv, dbias = jax.lax.fori_loop(0, nq, body, (dk0, dv0, db0))
    if _exp2_mode():
        dk = dk * LN2
        dbias = dbias * LN2

        # The whole-row dq accumulator is scaled once, at the last kv block
        # (grid dim 1 counts kv blocks — correct for rectangular Nq != Nk
        # too, where q_ref.shape[2] // bk would be wrong).
        @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
        def _():
            dq_ref[0] = dq_ref[0] * LN2
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)
    dbias_ref[0] = dbias


# ---------------------------------------------------------------------------
# custom_vjp wrapper (dropout_rate is a static nondiff arg)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _flash(qT, kT, vT, bias, seed, qoff, roff, dropout_rate):
    """qT PRE-SCALED by d^-0.5 (callers scale once; autodiff through that
    outside multiply restores the factor on dq). qoff: int32 scalar array,
    absolute token offset of the q rows (0 for the square single-device
    call; the CP shard offset in allgather mode). roff: int32 scalar
    array, offset of the flattened B*H dropout-seed row (0 single-device;
    b0*H when the CP batch dim is itself sharded)."""
    o, _ = _fwd(qT, kT, vT, bias[:, None, :], seed, block_q=BLOCK_Q,
                block_k=BLOCK_K, dropout_rate=dropout_rate, qoff=qoff,
                roff=roff)
    return o


def _vjp_fwd(qT, kT, vT, bias, seed, qoff, roff, dropout_rate):
    o, lse = _fwd(qT, kT, vT, bias[:, None, :], seed, block_q=BLOCK_Q,
                  block_k=BLOCK_K, dropout_rate=dropout_rate, qoff=qoff,
                  roff=roff)
    return o, (qT, kT, vT, bias, seed, qoff, roff, o, lse)


def _bwd_blocks(n: int, d: int, fused: bool, nk: int = None):
    """Backward tile sizes, d-aware. The backward kernels hold whole-row
    [d, N] buffers (q/do in both decompositions; +dq f32 in the fused one)
    plus ~3 [bk, bq] f32 score temporaries, so the feasible kv tile
    shrinks as d grows. On-chip feasibility/speed sweep at N=16384
    (tools/bench_fused_blocks.py --dims, BASELINE.md "backward at the
    larger head dims"): two-kernel bk=1024 is fastest through d=48 but
    exceeds scoped VMEM by 44 KB at d=64 (the high-end recipe's head dim
    — it could not compile at all before this rule); bk=512 fits and
    ships there. The fused kernel needs bk<=512 beyond the 2 MB dq row
    (d=48: 89.6 ms vs the two-kernel's 123.9).

    `nk` (default n): the key length when rectangular (CP shard path) —
    q-side tiles derive from n (=Nq), kv-side tiles from nk; the VMEM
    row-cap rule conservatively uses the larger of the two (the dq kernel
    holds [d, Nk] k/v rows, the dkv kernels hold [d, Nq] q/do rows)."""
    if nk is None:
        nk = n
    bq = _pick_block(n, BWD_BLOCK_Q)
    bk = _pick_block(nk, BWD_BLOCK_K)
    row_bytes = d * max(n, nk) * 4
    if fused and row_bytes > 2**21:
        bk = min(bk, _pick_block(nk, 512))
    if not fused and row_bytes > 3 * 2**20:
        bk = min(bk, _pick_block(nk, 512))
    return bq, bk


def _vjp_bwd(dropout_rate, res, doT):
    qT, kT, vT, bias, seed, qoff, roff, o, lse = res
    bh, d, n = qT.shape          # n = Nq (q rows; == Nk except on the CP
    nk = kT.shape[2]             # shard path, where kT holds the full N)
    h = bias.shape[0]
    bias3 = bias[:, None, :]
    seeds = _row_seeds(seed, bh, roff)
    qoff32 = qoff.astype(jnp.int32)
    qoff_lanes = jnp.broadcast_to(qoff32.reshape(1, 1, 1), (1, 1, 128))
    delta = jnp.sum(o.astype(jnp.float32) * doT.astype(jnp.float32),
                    axis=1, keepdims=True)  # [BH, 1, Nq]

    vm = dict(memory_space=pltpu.VMEM)
    # Fused single-pass backward when the whole-row dq accumulator fits
    # VMEM (d*N f32 <= _fused_dq_limit(): 3 MB default — 1 MB at the
    # production d=16 shapes, 3 MB at the mid-range d=48 where the fused
    # kernel measures 1.38x the two-kernel path; d=64's 4 MB row is
    # VMEM-infeasible in every tiling and takes the two-kernel
    # decomposition. LUNARIS_ATTN_FUSED_DQ_BYTES overrides the gate).
    fused = _fused_bwd() and d * n * 4 <= _fused_dq_limit()
    bq, bk = _bwd_blocks(n, d, fused, nk)
    if fused:
        dq32, dk, dv, dbias_bh = pl.pallas_call(
            functools.partial(_bwd_fused_kernel, block_q=bq,
                              dropout_rate=dropout_rate,
                              use_prng=_prng_dropout(n, nk)),
            grid=(bh, nk // bk),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
            in_specs=[
                _lane_spec(lambda b, j: (b, 0, 0)),
                _lane_spec(lambda b, j: (j, 0, 0)),
                _lane_spec(lambda b, j: (0, 0, 0)),                # q offset
                pl.BlockSpec((1, 1, bk),
                             lambda b, j: (jax.lax.rem(b, h), 0, j), **vm),
                pl.BlockSpec((1, d, n), lambda b, j: (b, 0, 0), **vm),
                pl.BlockSpec((1, d, bk), lambda b, j: (b, 0, j), **vm),
                pl.BlockSpec((1, d, bk), lambda b, j: (b, 0, j), **vm),
                pl.BlockSpec((1, d, n), lambda b, j: (b, 0, 0), **vm),
                pl.BlockSpec((1, 1, n), lambda b, j: (b, 0, 0), **vm),
                pl.BlockSpec((1, 1, n), lambda b, j: (b, 0, 0), **vm),
            ],
            out_specs=(
                pl.BlockSpec((1, d, n), lambda b, j: (b, 0, 0), **vm),
                pl.BlockSpec((1, d, bk), lambda b, j: (b, 0, j), **vm),
                pl.BlockSpec((1, d, bk), lambda b, j: (b, 0, j), **vm),
                pl.BlockSpec((1, 1, bk), lambda b, j: (b, 0, j), **vm),
            ),
            out_shape=(
                _out_struct(qT.shape, jnp.float32, qT, kT, vT, bias3, doT),
                _out_struct(kT.shape, kT.dtype, qT, kT, vT, bias3, doT),
                _out_struct(vT.shape, vT.dtype, qT, kT, vT, bias3, doT),
                _out_struct((bh, 1, nk), jnp.float32, qT, kT, vT, bias3,
                            doT),
            ),
            interpret=_interpret(),
        )(seeds, _pos_lanes(nk // bk), qoff_lanes, bias3, qT, kT, vT, doT,
          lse, delta)
        dbias = jnp.sum(dbias_bh.reshape(bh // h, h, nk), axis=0)
        return (dq32.astype(qT.dtype), dk, dv, dbias.astype(bias.dtype),
                None, None, None)
    qpos = _pos_lanes(n // bq) + qoff32 // bq
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, block_k=bk,
                          dropout_rate=dropout_rate,
                          use_prng=_prng_dropout(n, nk)),
        grid=(bh, n // bq),
        compiler_params=_PARALLEL2,
        in_specs=[
            _lane_spec(lambda b, i: (b, 0, 0)),
            _lane_spec(lambda b, i: (i, 0, 0)),
            pl.BlockSpec((1, 1, nk), lambda b, i: (jax.lax.rem(b, h), 0, 0), **vm),
            pl.BlockSpec((1, d, bq), lambda b, i: (b, 0, i), **vm),
            pl.BlockSpec((1, d, nk), lambda b, i: (b, 0, 0), **vm),
            pl.BlockSpec((1, d, nk), lambda b, i: (b, 0, 0), **vm),
            pl.BlockSpec((1, d, bq), lambda b, i: (b, 0, i), **vm),
            pl.BlockSpec((1, 1, bq), lambda b, i: (b, 0, i), **vm),
            pl.BlockSpec((1, 1, bq), lambda b, i: (b, 0, i), **vm),
        ],
        out_specs=pl.BlockSpec((1, d, bq), lambda b, i: (b, 0, i), **vm),
        out_shape=_out_struct(qT.shape, qT.dtype, qT, kT, vT, bias3, doT),
        interpret=_interpret(),
    )(seeds, qpos, bias3, qT, kT, vT, doT, lse, delta)

    dk, dv, dbias_bh = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, block_q=bq,
                          dropout_rate=dropout_rate,
                          use_prng=_prng_dropout(n, nk)),
        grid=(bh, nk // bk),
        compiler_params=_PARALLEL2,
        in_specs=[
            _lane_spec(lambda b, j: (b, 0, 0)),
            _lane_spec(lambda b, j: (j, 0, 0)),
            _lane_spec(lambda b, j: (0, 0, 0)),                    # q offset
            pl.BlockSpec((1, 1, bk), lambda b, j: (jax.lax.rem(b, h), 0, j), **vm),
            pl.BlockSpec((1, d, n), lambda b, j: (b, 0, 0), **vm),
            pl.BlockSpec((1, d, bk), lambda b, j: (b, 0, j), **vm),
            pl.BlockSpec((1, d, bk), lambda b, j: (b, 0, j), **vm),
            pl.BlockSpec((1, d, n), lambda b, j: (b, 0, 0), **vm),
            pl.BlockSpec((1, 1, n), lambda b, j: (b, 0, 0), **vm),
            pl.BlockSpec((1, 1, n), lambda b, j: (b, 0, 0), **vm),
        ],
        out_specs=(
            pl.BlockSpec((1, d, bk), lambda b, j: (b, 0, j), **vm),
            pl.BlockSpec((1, d, bk), lambda b, j: (b, 0, j), **vm),
            pl.BlockSpec((1, 1, bk), lambda b, j: (b, 0, j), **vm),
        ),
        out_shape=(
            _out_struct(kT.shape, kT.dtype, qT, kT, vT, bias3, doT),
            _out_struct(vT.shape, vT.dtype, qT, kT, vT, bias3, doT),
            _out_struct((bh, 1, nk), jnp.float32, qT, kT, vT, bias3, doT),
        ),
        interpret=_interpret(),
    )(seeds, _pos_lanes(nk // bk), qoff_lanes, bias3, qT, kT, vT, doT,
      lse, delta)

    dbias = jnp.sum(dbias_bh.reshape(bh // h, h, nk), axis=0)  # [H, Nk]
    return dq, dk, dv, dbias.astype(bias.dtype), None, None, None


_flash.defvjp(_vjp_fwd, _vjp_bwd)


def flash_attention_tpu(qT: jax.Array, kT: jax.Array, vT: jax.Array,
                        bias: jax.Array, *,
                        dropout_rate: float = 0.0,
                        seed: Optional[jax.Array] = None,
                        q_offset: Optional[jax.Array] = None,
                        row_offset: Optional[jax.Array] = None) -> jax.Array:
    """qT: [B*H, d, Nq]; kT/vT: [B*H, d, Nk]; bias: [H, Nk] f32 per-key.
    Returns oT [B*H, d, Nq] = softmax(qk^T * d^-0.5 + bias) v with
    optional prob-dropout. Nq == Nk for the ordinary square call; the CP
    allgather shard path passes its q shard (Nq = N/p) against the full
    gathered keys (Nk = N) with `q_offset` = the shard's absolute token
    offset (traced int ok; must be a multiple of the q block size, which
    holds whenever Nq is a multiple of 128·#shards-per-block — dropout
    masks are then bit-identical to the square call's)."""
    if seed is None:
        seed = jnp.zeros((), jnp.int32)
    else:
        seed = jnp.asarray(seed, jnp.int32).reshape(())
    if q_offset is None:
        q_offset = jnp.zeros((), jnp.int32)
    else:
        q_offset = jnp.asarray(q_offset, jnp.int32).reshape(())
    if row_offset is None:
        row_offset = jnp.zeros((), jnp.int32)
    else:
        row_offset = jnp.asarray(row_offset, jnp.int32).reshape(())
    # Scale q once here (outside the custom_vjp): kernels then skip the
    # per-tile [bk, bq] multiply, and d^-0.5 re-enters dq via this op's AD.
    # exp2 mode folds log2(e) into q and bias here too — scores then live in
    # the log2 domain end-to-end and the kernels use the cheaper exp2/log2.
    s = qT.shape[1] ** -0.5
    if _exp2_mode():
        s = s * LOG2E
        bias = bias * jnp.asarray(LOG2E, bias.dtype)
    scale = jnp.asarray(s, qT.dtype)
    return _flash(qT * scale, kT, vT, bias, seed, q_offset, row_offset,
                  float(dropout_rate))


def attention_bhnd(q, k, v, bias, *, dropout_rate: float = 0.0,
                   seed: Optional[jax.Array] = None,
                   q_offset: Optional[jax.Array] = None,
                   row_offset: Optional[jax.Array] = None) -> jax.Array:
    """Convenience adapter: q [B, H, Nq, d], k/v [B, H, Nk, d] + bias
    [H, Nk] -> [B, H, Nq, d], converting to/from the kernel's transposed
    layout. Nq != Nk (+ `q_offset`) is the CP allgather shard call — see
    flash_attention_tpu."""
    b, h, nq, d = q.shape
    nk = k.shape[2]
    to_t = lambda x: x.transpose(0, 1, 3, 2).reshape(
        b * h, d, x.shape[2])
    oT = flash_attention_tpu(to_t(q), to_t(k), to_t(v),
                             bias.astype(jnp.float32),
                             dropout_rate=dropout_rate, seed=seed,
                             q_offset=q_offset, row_offset=row_offset)
    return oT.reshape(b, h, d, nq).transpose(0, 1, 3, 2)
