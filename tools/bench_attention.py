#!/usr/bin/env python
"""On-TPU timing for the K2 flash-attention kernel at production shapes.

Scan-slope methodology (see bench.py): K kernel calls chained inside one
jitted lax.scan; per-call time = slope between K=1 and K=1+iters.

Shapes: the teacher's expert attention at reference defaults runs at
B_eff = batch * num_experts(vmap) with H=8 heads, N=128*128=16384 tokens,
d=16 (BASELINE.md). --fused doubles batch (fuse_teacher concatenates the
two teacher calls).

Usage: python tools/bench_attention.py [--b 32] [--n 16384] [--d 16]
       [--heads 8] [--rate 0.1] [--bwd] [--iters 20]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from lunaris_orion_tpu.ops.pallas import flash_attention as fa


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=32)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--d", type=int, default=16)
    ap.add_argument("--rate", type=float, default=0.1)
    ap.add_argument("--bwd", action="store_true")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--bq", type=int, default=0, help="override fwd BLOCK_Q")
    ap.add_argument("--bk", type=int, default=0, help="override fwd BLOCK_K")
    ap.add_argument("--bwd-bq", type=int, default=0)
    ap.add_argument("--bwd-bk", type=int, default=0)
    args = ap.parse_args()
    if args.bq:
        fa.BLOCK_Q = args.bq
    if args.bk:
        fa.BLOCK_K = args.bk
    if args.bwd_bq:
        fa.BWD_BLOCK_Q = args.bwd_bq
    if args.bwd_bk:
        fa.BWD_BLOCK_K = args.bwd_bk

    bh = args.b * args.heads
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 3)
    shape = (bh, args.d, args.n)
    qT = jax.random.normal(ks[0], shape, jnp.bfloat16)
    kT = jax.random.normal(ks[1], shape, jnp.bfloat16)
    vT = jax.random.normal(ks[2], shape, jnp.bfloat16)
    bias = jax.random.normal(key, (args.heads, args.n), jnp.float32) * 0.1

    def call(i, q):
        o = fa.flash_attention_tpu(q, kT, vT, bias, dropout_rate=args.rate,
                                   seed=i)
        return o

    if args.bwd:
        def one(carry, i):
            g = jax.grad(lambda q: jnp.sum(
                call(i, q).astype(jnp.float32) ** 2))(carry)
            return g.astype(carry.dtype), ()
    else:
        def one(carry, i):
            return call(i, carry).astype(carry.dtype), ()

    def chain(k):
        fn = jax.jit(lambda q: jax.lax.scan(one, q, jnp.arange(k))[0])
        t0 = time.time()
        jax.block_until_ready(fn(qT))
        print(f"  k={k}: compile+first {time.time()-t0:.1f}s",
              file=sys.stderr)
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.time()
            jax.block_until_ready(fn(qT))
            best = min(best, time.time() - t0)
        return best

    t1 = chain(1)
    tk = chain(1 + args.iters)
    dt = (tk - t1) / args.iters

    # analytic flops: scores + pv (x2 MACs); bwd adds ~3 more matmuls + recompute
    mults = 2 if not args.bwd else 7
    flops = mults * 2 * bh * args.n * args.n * args.d
    mode = "fwd+bwd" if args.bwd else "fwd"
    print(f"{mode} B={args.b} H={args.heads} N={args.n} d={args.d} "
          f"rate={args.rate}: {dt*1e3:.2f} ms | {flops/dt/1e12:.1f} TF/s "
          f"(blocks fwd {fa.BLOCK_Q}/{fa.BLOCK_K} "
          f"bwd {fa.BWD_BLOCK_Q}/{fa.BWD_BLOCK_K})")


if __name__ == "__main__":
    main()
