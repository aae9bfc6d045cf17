"""Bisect the r3-vs-r4 attention-forward harness discrepancy.

The same shipped kernel measured 50.8 ms fwd under tools/bench_attn_r3.py
and 38.0 ms under tools/bench_attn_r4.py on the same chip on the same day.
The harnesses differ in exactly two ways; this tool crosses both with one
shared timing estimator to attribute the 13 ms:

  const  : k/v/bias closed over by the jitted fn (trace-time constants,
           r3 style) vs passed as device arguments (r4 style).
  carry  : scan carry = o directly (r3 style: iteration i+1's q IS the
           attention output) vs carry = c + 1e-6*o (r4 style: q stays
           the original tensor up to bf16 rounding).

Timing: scan-chain slope between kk=1 and kk=1+ITERS, min over REPS
timed calls per kk (the r3 estimator; the r4 interleaved-difference
estimator is also derivable from the prints). Production shape
B=8 H=8 N=16384 D=16 bf16, dropout 0.

Usage: python tools/bench_attn_bisect.py [--iters 6] [--reps 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    from lunaris_orion_tpu.ops.pallas import flash_attention as fa

    B, H, N, D = 8, 8, 16384, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (B, H, N, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, H, N, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, H, N, D), jnp.bfloat16)
    bias = jax.random.normal(ks[3], (H, N)).astype(jnp.float32)

    def build(const: bool, carry_o: bool, kk: int):
        if const:
            @jax.jit
            def run(q):
                def body(c, _):
                    o = fa.attention_bhnd(c, k, v, bias, dropout_rate=0.0,
                                          seed=jnp.int32(7))
                    if carry_o:
                        return o, ()
                    return c + (1e-6 * o).astype(c.dtype), ()
                o, _ = jax.lax.scan(body, q, jnp.arange(kk))
                return jnp.sum(o.astype(jnp.float32))
            return lambda: float(run(q))

        @jax.jit
        def run(q, k, v, bias):
            def body(c, _):
                o = fa.attention_bhnd(c, k, v, bias, dropout_rate=0.0,
                                      seed=jnp.int32(7))
                if carry_o:
                    return o, ()
                return c + (1e-6 * o).astype(c.dtype), ()
            o, _ = jax.lax.scan(body, q, jnp.arange(kk))
            return jnp.sum(o.astype(jnp.float32))
        return lambda: float(run(q, k, v, bias))

    kks = (1, 1 + args.iters)
    for const in (True, False):
        for carry_o in (True, False):
            mins = []
            for kk in kks:
                fn = build(const, carry_o, kk)
                fn()  # compile
                best = float("inf")
                for _ in range(args.reps):
                    t0 = time.time()
                    fn()
                    best = min(best, time.time() - t0)
                mins.append(best)
            ms = (mins[1] - mins[0]) / args.iters * 1e3
            row = {"const": const, "carry": "o" if carry_o else "acc",
                   "fwd_ms": round(ms, 1),
                   "t1_ms": round(mins[0] * 1e3, 1),
                   "tN_ms": round(mins[1] * 1e3, 1)}
            log(f"  {row}")
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
