#!/usr/bin/env python
"""Price `--attn_impl ring` / `--attn_impl allgather` (cross-chip context
parallelism) vs DP.

r4 wired ring attention into the product with correctness evidence only
(test_ring_attention, dryrun); this prices it, the bench_pod way — ONE
physical chip is reachable, so the pod rows are composed from:

  1. MEASURED per-chip shard workloads on the real chip:
       - the production single-chip attention call (ops.attention
         dispatch -> Pallas fused kernel) at the flagship teacher shape
         [B=8, H=8, N=16384, d=16], dropout 0.1, fwd and fwd+bwd;
       - the ring per-chip shard: q = N/p tokens, k/v folded in p chunks
         through parallel.ring_attention._accum_chunk with the SAME
         online-softmax/checkpoint structure the product ring executes
         per device (ppermute elided — its cost is the analytic wire
         budget below; the compute per chip is identical).
     Their ratio rho = p * t_ring_shard / t_pallas_full is the ring
     path's compute-efficiency price (XLA einsum chunks vs the fused
     Pallas kernel, plus the p-round carry chain).
  2. An ANALYTIC ppermute ICI budget, explicit: per attention call the
     ring moves the k/v (+bias) chunk (p-1) times over the 45 GB/s ring
     axis; backward replays the rotation (checkpointed recompute) and
     counter-rotates cotangents — budgeted at 2x forward wire per
     bwd call. Serial (+wire) and perfectly-overlapped (max) bounds are
     both reported; the truth lies between.
  3. Hybrid-step composition constants from BASELINE.md (overridable):
     step_full_b8 (3.387 s measured r3, fused-bwd default) and
     t_nonattn_b8 (~0.055 s: teacher-minus-attention 35 ms + VAE ~20 ms,
     r2 ablation) — attention seconds/step = step_full - nonattn; ring
     divides ONLY that part by p (the non-attention work stays
     batch-DP-sharded / replicated per the r4 wiring).

Rows: DP strong/weak (bench_pod measured, cited), ring and allgather
strong (global batch 8) / weak (global 64) / batch-1 (the regime DP
cannot shard at all). The allgather shard row (r5) measures the
fused-kernel CP path: q shard x full gathered keys through the SAME
Pallas kernel with q_offset — rho_ag ~= 1 vs the ring's XLA-chunk
rho ~= 4-5. Writes one JSON document; BASELINE.md records the table.

Usage: python tools/bench_ring.py [--iters 8] [--p 8]
"""

from __future__ import annotations

import argparse

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

ICI_BW = 45e9
B, H, N, D = 8, 8, 16384, 16
DROP = 0.1
SEED = 7

# BASELINE.md composition constants (measured r2/r3; --override-able).
STEP_FULL_B8 = 3.387     # s, hybrid step b8 128px fused-bwd default (r3)
T_NONATTN_B8 = 0.055     # s, teacher-no-attn fwd+bwd 35ms + VAE ~20ms (r2)
DP_STRONG = 0.447        # s/chip-step, per-chip batch 1 (bench_pod r3)
DP_COLL = 0.0063         # s, DP grad all-reduce budget (bench_pod)
N_FWD_CALLS = 24         # 3 blocks x 4 experts x 2 teacher calls
N_BWD_CALLS = 12         # grads flow through the recon teacher call only


def log(m):
    print(m, file=sys.stderr, flush=True)


def slope(make_fn, iters, reps=2):
    times = []
    for k in (1, 1 + iters):
        fn = make_fn(k)
        t0 = time.time()
        fn()
        log(f"    k={k}: compile+first {time.time() - t0:.1f}s")
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        times.append(best)
    return (times[1] - times[0]) / iters


def _inputs(nq, nk):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, nq, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, nk, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, nk, D)), jnp.bfloat16)
    bias = jnp.asarray(rng.standard_normal((H, nk)), jnp.bfloat16)
    return q, k, v, bias


def pallas_full_time(iters, bwd):
    """Production single-chip attention call (the DP per-chip path)."""
    from lunaris_orion_tpu.ops.pallas.flash_attention import attention_bhnd
    q, k, v, bias = _inputs(N, N)
    seed = jnp.int32(SEED)

    def fwd(q, k, v, bias):
        return attention_bhnd(q, k, v, bias, dropout_rate=DROP,
                              seed=seed).astype(jnp.float32)

    def loss(q, k, v, bias):
        return jnp.sum(fwd(q, k, v, bias) ** 2)

    body = (jax.grad(loss, argnums=(0, 1, 2)) if bwd else fwd)

    def make(kk):
        @jax.jit
        def run(q, k, v, bias):
            def step(c, _):
                out = body(q + c * 0, k, v, bias)
                leaf = out[0] if isinstance(out, tuple) else out
                return leaf.astype(jnp.bfloat16)[..., :1, :1].mean(), None
            r, _ = jax.lax.scan(step, jnp.bfloat16(0), None, length=kk)
            return r
        return lambda: float(run(q, k, v, bias))

    return slope(make, iters)


def ring_shard_time(p, iters, bwd):
    """One device's ring compute: q shard [B,H,N/p,D] folded over all p
    k/v chunks with the product's _accum_chunk (ppermute elided)."""
    from lunaris_orion_tpu.parallel.ring_attention import (
        _accum_chunk, _row_seed_bh)
    nl = N // p
    q, k, v, bias = _inputs(nl, N)
    kc = jnp.moveaxis(k.reshape(B, H, p, nl, D), 2, 0)   # [p,B,H,nl,D]
    vc = jnp.moveaxis(v.reshape(B, H, p, nl, D), 2, 0)
    bc = jnp.moveaxis(bias.reshape(H, p, nl), 1, 0)       # [p,H,nl]
    row_seed = _row_seed_bh(jnp.int32(SEED), B, H)

    def fwd(q, kc, vc, bc):
        q32 = q.astype(jnp.float32)
        acc = jnp.zeros((B, H, nl, D), jnp.float32)
        m = jnp.full((B, H, nl, 1), -jnp.inf, jnp.float32)
        l = jnp.zeros((B, H, nl, 1), jnp.float32)

        def chunk_step(carry, inp):
            acc, m, l = carry
            j, kj, vj, bj = inp
            acc, m, l = _accum_chunk(
                acc, m, l, q32, kj, vj, bj, q0=jnp.int32(0), k0=j * nl,
                scale=D ** -0.5, block_k=512, dropout_rate=DROP,
                row_seed=row_seed)
            return (acc, m, l), None

        (acc, _, l), _ = jax.lax.scan(
            chunk_step, (acc, m, l), (jnp.arange(p), kc, vc, bc))
        return acc / jnp.maximum(l, 1e-30)

    def loss(q, kc, vc, bc):
        return jnp.sum(fwd(q, kc, vc, bc) ** 2)

    body = (jax.grad(loss, argnums=(0, 1, 2)) if bwd else fwd)

    def make(kk):
        @jax.jit
        def run(q, kc, vc, bc):
            def step(c, _):
                out = body(q + c * 0, kc, vc, bc)
                leaf = out[0] if isinstance(out, tuple) else out
                return leaf.astype(jnp.bfloat16)[..., :1, :1].mean(), None
            r, _ = jax.lax.scan(step, jnp.bfloat16(0), None, length=kk)
            return r
        return lambda: float(run(q, kc, vc, bc))

    return slope(make, iters)


def allgather_shard_time(p, iters, bwd):
    """One device's allgather-CP compute (r5): q shard [B,H,N/p,D] against
    the FULL gathered k/v through the SAME fused Pallas kernel the DP
    path uses, with the shard's q_offset (all_gather elided — its bytes
    are the same analytic wire budget as the ring's). rho_ag =
    p * t_ag_shard / t_pallas_full is the allgather path's
    compute-efficiency price; ~1/p means kernel-rate CP."""
    from lunaris_orion_tpu.ops.pallas.flash_attention import attention_bhnd
    nl = N // p
    q, k, v, bias = _inputs(nl, N)
    seed = jnp.int32(SEED)
    q0 = jnp.int32(2 * nl)  # a non-zero shard for honesty; cost is uniform

    def fwd(q, k, v, bias):
        return attention_bhnd(q, k, v, bias, dropout_rate=DROP, seed=seed,
                              q_offset=q0).astype(jnp.float32)

    def loss(q, k, v, bias):
        return jnp.sum(fwd(q, k, v, bias) ** 2)

    body = (jax.grad(loss, argnums=(0, 1, 2)) if bwd else fwd)

    def make(kk):
        @jax.jit
        def run(q, k, v, bias):
            def step(c, _):
                out = body(q + c * 0, k, v, bias)
                leaf = out[0] if isinstance(out, tuple) else out
                return leaf.astype(jnp.bfloat16)[..., :1, :1].mean(), None
            r, _ = jax.lax.scan(step, jnp.bfloat16(0), None, length=kk)
            return r
        return lambda: float(run(q, k, v, bias))

    return slope(make, iters)


def wire_step_s(p, batch=B):
    """Analytic per-hybrid-step ppermute bytes / ICI bandwidth."""
    chunk = 2 * batch * H * (N // p) * D * 2 + H * (N // p) * 2  # k+v+bias
    per_fwd_call = (p - 1) * chunk
    total = N_FWD_CALLS * per_fwd_call + N_BWD_CALLS * 2 * per_fwd_call
    return total / ICI_BW, per_fwd_call / ICI_BW


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--p", type=int, default=8)
    ap.add_argument("--step-full", type=float, default=STEP_FULL_B8)
    ap.add_argument("--nonattn", type=float, default=T_NONATTN_B8)
    args = ap.parse_args()
    p = args.p
    try:
        cache = Path.home() / ".cache" / "lunaris_jax_cache"
        cache.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    log(f"device: {jax.devices()[0]}")
    out = {"shape": dict(B=B, H=H, N=N, d=D, dropout=DROP), "p": p}

    log("[pallas full] production call, fwd")
    t_pf = pallas_full_time(args.iters, bwd=False)
    log(f"  {t_pf * 1e3:.1f} ms")
    log("[pallas full] production call, fwd+bwd")
    t_pb = pallas_full_time(args.iters, bwd=True)
    log(f"  {t_pb * 1e3:.1f} ms")
    log(f"[ring shard p={p}] fwd")
    t_rf = ring_shard_time(p, args.iters, bwd=False)
    log(f"  {t_rf * 1e3:.1f} ms  (rho_fwd = {p * t_rf / t_pf:.2f})")
    log(f"[ring shard p={p}] fwd+bwd")
    t_rb = ring_shard_time(p, args.iters, bwd=True)
    log(f"  {t_rb * 1e3:.1f} ms  (rho_bwd = {p * t_rb / t_pb:.2f})")

    log(f"[allgather shard p={p}] fwd (fused kernel, q_offset)")
    t_af = allgather_shard_time(p, args.iters, bwd=False)
    log(f"  {t_af * 1e3:.1f} ms  (rho_ag_fwd = {p * t_af / t_pf:.2f})")
    log(f"[allgather shard p={p}] fwd+bwd")
    t_ab = allgather_shard_time(p, args.iters, bwd=True)
    log(f"  {t_ab * 1e3:.1f} ms  (rho_ag_bwd = {p * t_ab / t_pb:.2f})")

    out["pallas_full_ms"] = {"fwd": round(t_pf * 1e3, 1),
                             "fwd_bwd": round(t_pb * 1e3, 1)}
    out["ring_shard_ms"] = {"fwd": round(t_rf * 1e3, 1),
                            "fwd_bwd": round(t_rb * 1e3, 1)}
    out["allgather_shard_ms"] = {"fwd": round(t_af * 1e3, 1),
                                 "fwd_bwd": round(t_ab * 1e3, 1)}
    rho_f, rho_b = p * t_rf / t_pf, p * t_rb / t_pb
    rho_af, rho_ab = p * t_af / t_pf, p * t_ab / t_pb
    out["rho"] = {"fwd": round(rho_f, 3), "fwd_bwd": round(rho_b, 3)}
    out["rho_allgather"] = {"fwd": round(rho_af, 3),
                            "fwd_bwd": round(rho_ab, 3)}

    # Hybrid-step composition. Attention seconds/step split into the
    # grad-bearing part (12 fwd+bwd calls) and no-grad part (12 fwd):
    # scale by the measured call times.
    t_attn = args.step_full - args.nonattn
    frac_bwd = (N_BWD_CALLS * t_pb) / (N_BWD_CALLS * t_pb
                                       + (N_FWD_CALLS - N_BWD_CALLS) * t_pf)
    t_attn_ring = (t_attn * frac_bwd * rho_b
                   + t_attn * (1 - frac_bwd) * rho_f) / p
    t_attn_ag = (t_attn * frac_bwd * rho_ab
                 + t_attn * (1 - frac_bwd) * rho_af) / p
    w_step, w_call = wire_step_s(p)
    rows = {}

    def row(name, global_batch, chip_step, coll, note):
        rate = global_batch / (chip_step + coll)
        rows[name] = {"global_batch": global_batch,
                      "chip_step_s": round(chip_step, 3),
                      "collective_s": round(coll, 4),
                      "pod_sprites_per_s": round(rate, 2), "note": note}
        log(f"  {name}: {chip_step:.3f}s + {coll * 1e3:.0f}ms coll "
            f"=> {rate:.2f} sprites/s per v5e-{p}")

    row("dp_strong_g8", 8, DP_STRONG, DP_COLL,
        "measured bench_pod r3 (per-chip batch 1, global attention)")
    row("ring_strong_g8", 8, args.nonattn + t_attn_ring, w_step + DP_COLL,
        "nonattn replicated + attention/p (measured rho) + serial wire")
    row("ring_strong_g8_overlap", 8, args.nonattn
        + max(t_attn_ring, w_step), DP_COLL,
        "perfect compute/wire overlap bound")
    row("allgather_strong_g8", 8, args.nonattn + t_attn_ag,
        w_step + DP_COLL,
        "fused-kernel CP: nonattn replicated + attention/p at rho_ag "
        "(measured) + serial wire (same bytes as ring)")
    # weak scaling: per-chip batch 8 worth of attention in BOTH schemes
    # (DP: 8 samples x full N; ring: 64 samples x N/8) — attention FLOPs
    # per chip identical, wire scales with batch.
    w_step64, _ = wire_step_s(p, batch=64)
    row("dp_weak_g64", 64, args.step_full, DP_COLL, "measured bench_pod")
    row("ring_weak_g64", 64, args.nonattn * 8 + t_attn_ring * 8,
        w_step64 + DP_COLL,
        "nonattn x8 replicated (batch 64 on every chip) + attention/p x8")
    row("allgather_weak_g64", 64, args.nonattn * 8 + t_attn_ag * 8,
        wire_step_s(p, batch=64)[0] + DP_COLL,
        "fused-kernel CP at per-chip batch 8 worth of attention")
    # the regime DP cannot reach: global batch 1
    w_step1, _ = wire_step_s(p, batch=1)
    row("ring_g1", 1, args.nonattn / 8 + t_attn_ring / 8,
        w_step1 + DP_COLL, "batch 1: DP cannot shard; ring cuts latency")
    row("allgather_g1", 1, args.nonattn / 8 + t_attn_ag / 8,
        w_step1 + DP_COLL,
        "batch 1 fused-kernel CP: the latency row at rho_ag")
    row("single_chip_g1", 1, args.step_full / 8, 0.0,
        "1 chip, batch 1 (linear-in-B approx of the b8 step)")

    out["wire_per_fwd_call_ms"] = round(w_call * 1e3, 2)
    out["rows"] = rows
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
