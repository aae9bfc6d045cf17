#!/usr/bin/env python
"""Block-size sweep for the FUSED attention backward kernel.

The shipped BWD_BLOCK_Q/BWD_BLOCK_K = 512/1024 came from the r2 on-device
sweep of the TWO-KERNEL backward decomposition. The fused single-pass
backward (default since the r3 correction; ops/pallas/flash_attention.py
_bwd_fused_kernel) holds a different live-buffer set — whole-row q/do
streams, a whole-row f32 dq accumulator, and [bk, bq] f32 score/prob/grad
temporaries — so its optimum may sit elsewhere. This sweeps (bq, bk) on
the real chip at the production shape (B=8, H=8, N=16384, d=16, bf16,
dropout 0.1), timing the full fwd+bwd with gradients w.r.t. ALL inputs
(the corrected harness — grads w.r.t. q only lets XLA DCE work and was
the source of the r2 mis-rejection, BASELINE.md).

Forward blocks stay at the shipped 512/2048 so the fwd cost is a constant
across combos; combos that exceed VMEM are recorded as OOM.

Usage: python tools/bench_fused_blocks.py [--iters 6]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def log(m):
    print(m, file=sys.stderr, flush=True)


def slope(make_fn, k_small, k_big, reps=3):
    times = []
    for k in (k_small, k_big):
        fn = make_fn(k)
        fn()
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        times.append(best)
    return (times[1] - times[0]) / (k_big - k_small)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--rate", type=float, default=0.1)
    args = ap.parse_args()

    from lunaris_orion_tpu.ops.pallas import flash_attention as fa
    assert jax.default_backend() == "tpu", jax.default_backend()

    B, H, N, D = 8, 8, 16384, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (B, H, N, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, H, N, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, H, N, D), jnp.bfloat16)
    bias = jax.random.normal(ks[3], (H, N)).astype(jnp.float32)

    def make_bwd(kk):
        def loss(q, k, v, bias):
            return jnp.sum(fa.attention_bhnd(
                q, k, v, bias, dropout_rate=args.rate,
                seed=jnp.int32(7)).astype(jnp.float32) ** 2)

        @jax.jit
        def run(q, k, v, bias):
            def body(c, _):
                gq, gk, gv, gb = jax.grad(loss, argnums=(0, 1, 2, 3))(
                    c, k, v, bias)
                return c + 1e-6 * gq.astype(c.dtype), (
                    jnp.sum(gk.astype(jnp.float32))
                    + jnp.sum(gv.astype(jnp.float32))
                    + jnp.sum(gb))
            o, s = jax.lax.scan(body, q, jnp.arange(kk))
            return jnp.sum(o.astype(jnp.float32)) + jnp.sum(s)
        return lambda: float(run(q, k, v, bias))

    sweep = [(bq, bk)
             for bq in (256, 512, 1024, 2048)
             for bk in (512, 1024, 2048, 4096)]
    shipped = (fa.BWD_BLOCK_Q, fa.BWD_BLOCK_K)
    results = []
    try:
        for bq, bk in sweep:
            fa.BWD_BLOCK_Q, fa.BWD_BLOCK_K = bq, bk
            tag = f"bq={bq} bk={bk}" + (
                " (shipped)" if (bq, bk) == shipped else "")
            try:
                dt = slope(make_bwd, 1, 1 + args.iters)
                res = {"bq": bq, "bk": bk,
                       "fwdbwd_ms": round(dt * 1e3, 1)}
            except Exception as e:  # noqa: BLE001 — record OOM/compile fails
                res = {"bq": bq, "bk": bk,
                       "error": f"{type(e).__name__}: {str(e)[:160]}"}
            results.append(res)
            log(f"  {tag}: {res}")
            print(json.dumps(res), flush=True)
    finally:
        fa.BWD_BLOCK_Q, fa.BWD_BLOCK_K = shipped
    ok = [r for r in results if "fwdbwd_ms" in r]
    if ok:
        best = min(ok, key=lambda r: r["fwdbwd_ms"])
        print(json.dumps({"best": best, "shipped":
                          next((r for r in ok if (r["bq"], r["bk"])
                                == shipped), None)}))


if __name__ == "__main__":
    main()
