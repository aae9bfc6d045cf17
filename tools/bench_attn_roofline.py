"""Per-op attribution of the flash-attention forward (VERDICT r3 item 1).

The shipped forward measures ~51 ms at the production shape (B=8, H=8,
N=16384, d=16, bf16, dropout 0) vs an r2 back-of-envelope "~40 ms VPU
floor". This tool closes that gap GN-stats style: a family of ablation
kernels — identical grid/tiling/memory layout to the shipped kernel
(ops/pallas/flash_attention.py::_fwd) — each adding ONE stage of the
online-softmax chain, measured on hardware, so every millisecond lands on
a named op:

  dots   : QK matmul + f32->bf16 cast + PV matmul   (MXU + 1 VPU pass)
  +bias  : + the [bk, bq] bias add                  (+1 VPU pass)
  +maxsub: + running-max reduce and the (s - m) sub (+2 VPU passes)
  +exp   : + exp(s - m)                             (+exp pass)
  +sum   : + the l row-sum reduce (full chain)      (+1 VPU pass)
  shipped: attention_bhnd end to end (sanity: == +sum plus dispatch glue)

All ablations keep the m/l carries, the final o = acc/l normalize and the
lse write, so stage deltas isolate exactly the named full-tile op.
Timed by scan-chain slope, min-per-k (the estimator cross-validated by
tools/bench_attn_bisect.py — the interleaved estimator this replaced was
biased 13 ms low).

Usage: python tools/bench_attn_roofline.py [--iters 6] [--reps 3]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lunaris_orion_tpu.ops.pallas import flash_attention as fa

STAGES = ("dots", "bias", "maxsub", "exp", "sum")
B, H, N, D = 8, 8, 16384, 16
BQ, BK = 512, 2048


def log(m):
    print(m, file=sys.stderr, flush=True)


def _stage_kernel(seed_ref, qpos_ref, bias_ref, q_ref, k_ref, v_ref,
                  o_ref, lse_ref, *, block_k: int, stage: str):
    lvl = STAGES.index(stage)
    d = q_ref.shape[1]
    bq = q_ref.shape[2]
    n = k_ref.shape[2]
    nk = n // block_k
    qT = q_ref[0]

    def body(j, carry):
        acc, m, l = carry
        kT = k_ref[0, :, pl.ds(j * block_k, block_k)]
        vT = v_ref[0, :, pl.ds(j * block_k, block_k)]
        sT = jax.lax.dot_general(
            kT, qT, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                   # [bk, bq]
        if lvl >= 1:   # bias
            b_blk = bias_ref[0, 0, pl.ds(j * block_k, block_k)]
            sT = sT + b_blk[:, None]
        if lvl >= 2:   # maxsub: running max + the subtract
            m_new = jnp.maximum(m, jnp.max(sT, axis=0, keepdims=True))
            corr = jnp.exp(m - m_new)
            sT = sT - m_new
        else:
            m_new, corr = m, 1.0
        if lvl >= 3:   # exp
            pT = jnp.exp(sT)
        else:
            pT = sT
        if lvl >= 4:   # sum: the l row-sum reduce (full chain)
            l_new = l * corr + jnp.sum(pT, axis=0, keepdims=True)
        else:
            l_new = l * corr + 1.0
        acc_new = acc * corr + jax.lax.dot_general(
            vT, pT.astype(vT.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                   # [d, bq]
        return acc_new, m_new, l_new

    acc0 = jnp.zeros((d, bq), jnp.float32)
    m0 = jnp.full((1, bq), fa.NEG_INF if lvl >= 2 else 0.0, jnp.float32)
    l0 = jnp.zeros((1, bq), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, nk, body, (acc0, m0, l0))
    l = jnp.maximum(l, 1e-30)
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(l)


def _stage_fwd(qT, kT, vT, bias3, stage: str):
    bh, d, n = qT.shape
    h = bias3.shape[0]
    vm = dict(memory_space=pltpu.VMEM)
    o, lse = pl.pallas_call(
        functools.partial(_stage_kernel, block_k=BK, stage=stage),
        grid=(bh, n // BQ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        in_specs=[
            pl.BlockSpec((1, 1, 128), lambda b, i: (b, 0, 0), **vm),
            pl.BlockSpec((1, 1, 128), lambda b, i: (i, 0, 0), **vm),
            pl.BlockSpec((1, 1, n), lambda b, i: (jax.lax.rem(b, h), 0, 0),
                         **vm),
            pl.BlockSpec((1, d, BQ), lambda b, i: (b, 0, i), **vm),
            pl.BlockSpec((1, d, n), lambda b, i: (b, 0, 0), **vm),
            pl.BlockSpec((1, d, n), lambda b, i: (b, 0, 0), **vm),
        ],
        out_specs=(
            pl.BlockSpec((1, d, BQ), lambda b, i: (b, 0, i), **vm),
            pl.BlockSpec((1, 1, BQ), lambda b, i: (b, 0, i), **vm),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, d, n), qT.dtype),
            jax.ShapeDtypeStruct((bh, 1, n), jnp.float32),
        ),
    )(fa._row_seeds(jnp.int32(7), bh), fa._pos_lanes(n // BQ),
      bias3, qT, kT, vT)
    return o, lse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (B, H, N, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, H, N, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, H, N, D), jnp.bfloat16)
    bias = jax.random.normal(ks[3], (H, N)).astype(jnp.float32) * 0.1
    # Transposed layout exactly as the shipped dispatch builds it.
    qT = jnp.swapaxes(q, 2, 3).reshape(B * H, D, N) * (D ** -0.5)
    kT = jnp.swapaxes(k, 2, 3).reshape(B * H, D, N)
    vT = jnp.swapaxes(v, 2, 3).reshape(B * H, D, N)
    bias3 = bias[:, None, :]

    def slope(make):
        mins = []
        for kk in (1, 1 + args.iters):
            f = make(kk)
            f()
            best = float("inf")
            for _ in range(args.reps):
                t0 = time.time()
                f()
                best = min(best, time.time() - t0)
            mins.append(best)
        return (mins[1] - mins[0]) / args.iters

    def make_stage(stage):
        def make(kk):
            @jax.jit
            def run(qT, kT, vT, bias3):
                def body(c, _):
                    o, _ = _stage_fwd(c, kT, vT, bias3, stage)
                    return c + (1e-6 * o).astype(c.dtype), ()
                o, _ = jax.lax.scan(body, qT, jnp.arange(kk))
                return jnp.sum(o.astype(jnp.float32))
            return lambda: float(run(qT, kT, vT, bias3))
        return make

    def make_shipped(kk):
        @jax.jit
        def run(q, k, v, bias):
            def body(c, _):
                o = fa.attention_bhnd(c, k, v, bias, dropout_rate=0.0,
                                      seed=jnp.int32(7))
                return c + (1e-6 * o).astype(c.dtype), ()
            o, _ = jax.lax.scan(body, q, jnp.arange(kk))
            return jnp.sum(o.astype(jnp.float32))
        return lambda: float(run(q, k, v, bias))

    rows, prev = [], None
    for stage in STAGES:
        ms = slope(make_stage(stage)) * 1e3
        delta = None if prev is None else round(ms - prev, 1)
        prev = ms
        row = {"stage": stage, "fwd_ms": round(ms, 1), "delta_ms": delta}
        log(f"  {row}")
        rows.append(row)
    ms = slope(make_shipped) * 1e3
    row = {"stage": "shipped", "fwd_ms": round(ms, 1),
           "delta_ms": round(ms - prev, 1)}
    log(f"  {row}")
    rows.append(row)
    print(json.dumps(rows), flush=True)


if __name__ == "__main__":
    main()
