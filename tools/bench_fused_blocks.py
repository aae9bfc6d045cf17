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


def _inputs(B, H, N, D):
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    return (jax.random.normal(ks[0], (B, H, N, D), jnp.bfloat16),
            jax.random.normal(ks[1], (B, H, N, D), jnp.bfloat16),
            jax.random.normal(ks[2], (B, H, N, D), jnp.bfloat16),
            jax.random.normal(ks[3], (H, N)).astype(jnp.float32))


def _make_bwd(fa, q, k, v, bias, rate):
    def loss(q, k, v, bias):
        return jnp.sum(fa.attention_bhnd(
            q, k, v, bias, dropout_rate=rate,
            seed=jnp.int32(7)).astype(jnp.float32) ** 2)

    def make(kk):
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

    def grads():
        g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))(q, k, v, bias)
        import numpy as np
        return [np.asarray(x.astype(jnp.float32)) for x in g]

    return make, grads


def dims_mode(args):
    """Backward-path feasibility + speed at the larger head dims (d=48:
    the mid-range recipe; d=64: the high-end recipe; both N=16384 at
    128px). First finding (2026-08-18): at d=64 the SHIPPED two-kernel
    tiling (bq512/bk1024) exceeds scoped VMEM by 44 KB — the high-end
    teacher backward could not compile at all. This sweeps both paths
    over candidate tilings per d to pick feasible d-aware defaults, with
    gradient cross-checks between every pair that compiles."""
    import os
    import numpy as np
    from lunaris_orion_tpu.ops.pallas import flash_attention as fa
    assert jax.default_backend() == "tpu", jax.default_backend()

    candidates = {  # (path, bq, bk)
        48: [("two", 512, 1024), ("two", 512, 512),
             ("fused", 512, 512), ("fused", 256, 512), ("fused", 256, 256)],
        64: [("two", 512, 1024), ("two", 512, 512), ("two", 256, 512),
             ("fused", 512, 512), ("fused", 256, 512), ("fused", 256, 256)],
    }
    shipped = (fa.BWD_BLOCK_Q, fa.BWD_BLOCK_K)
    try:
        for D, BH in ((48, 4), (64, 4)):
            B, H, N = BH, 8, 16384
            q, k, v, bias = _inputs(B, H, N, D)
            make, grads = _make_bwd(fa, q, k, v, bias, args.rate)
            g_ref, ref_name = None, None
            for path, bq, bk in candidates[D]:
                fa.BWD_BLOCK_Q, fa.BWD_BLOCK_K = bq, bk
                os.environ["LUNARIS_ATTN_FUSED_DQ_BYTES"] = (
                    str(2**23) if path == "fused" else "0")
                res = {"d": D, "B": B, "path": path, "bq": bq, "bk": bk}
                try:
                    res["fwdbwd_ms"] = round(
                        slope(make, 1, 1 + args.iters) * 1e3, 1)
                    g = grads()
                    if g_ref is None:
                        g_ref, ref_name = g, f"{path}_{bq}_{bk}"
                    else:
                        res["max_rel_grad_diff_vs_" + ref_name] = max(
                            float(np.max(np.abs(a - b))
                                  / max(1e-30, float(np.max(np.abs(b)))))
                            for a, b in zip(g, g_ref))
                except Exception as e:  # noqa: BLE001
                    res["error"] = f"{type(e).__name__}: {str(e)[:120]}"
                log(f"  d={D} {path} bq={bq} bk={bk}: {res}")
                print(json.dumps(res), flush=True)
    finally:
        fa.BWD_BLOCK_Q, fa.BWD_BLOCK_K = shipped
        os.environ.pop("LUNARIS_ATTN_FUSED_DQ_BYTES", None)


def fwd_mode(args):
    """FORWARD-only block sweep at the larger head dims. The shipped
    BLOCK_Q/BLOCK_K = 512/2048 came from the r2 sweep at the production
    d=16; the mid-range (d=48) and high-end (d=64) recipes were never
    swept. The forward kernel holds whole-row kT/vT [d, N] VMEM buffers
    (2 MB each at d=64, N=16384 bf16) plus a [bk, bq] f32 score tile, so
    larger d shifts the feasible/optimal region just as it did for the
    backward. Outputs are cross-checked between tilings (the hash dropout
    mask is block-decomposition independent, so differences are bf16
    reorder drift only)."""
    import numpy as np
    from lunaris_orion_tpu.ops.pallas import flash_attention as fa
    assert jax.default_backend() == "tpu", jax.default_backend()

    combos = [(512, 2048), (512, 1024), (512, 512),
              (1024, 1024), (256, 2048), (1024, 2048)]
    # Hard-coded shipped tiling (not fa.BLOCK_Q/K, which reflect
    # LUNARIS_ATTN_BLOCK_Q/K env overrides and would mislabel rows).
    SHIPPED_FWD = (512, 2048)
    shipped = (fa.BLOCK_Q, fa.BLOCK_K)
    if shipped != SHIPPED_FWD:
        log(f"  note: env-derived baseline blocks {shipped} != shipped "
            f"default {SHIPPED_FWD}; 'shipped' column uses the default")
    try:
        for D, BH in ((48, 4), (64, 4)):
            B, H, N = BH, 8, 16384
            q, k, v, bias = _inputs(B, H, N, D)

            def make(kk):
                # All inputs passed as device arguments (mirrors _make_bwd)
                # so none are baked into the program as constants.
                @jax.jit
                def run(q, k, v, bias):
                    def body(c, _):
                        o = fa.attention_bhnd(
                            c, k, v, bias, dropout_rate=args.rate,
                            seed=jnp.int32(7))
                        return c + 1e-6 * o.astype(c.dtype), ()
                    o, _ = jax.lax.scan(body, q, jnp.arange(kk))
                    return jnp.sum(o.astype(jnp.float32))
                return lambda: float(run(q, k, v, bias))

            o_ref, ref_name = None, None
            for bq, bk in combos:
                fa.BLOCK_Q, fa.BLOCK_K = bq, bk
                res = {"d": D, "B": B, "bq": bq, "bk": bk,
                       "shipped": (bq, bk) == SHIPPED_FWD}
                try:
                    res["fwd_ms"] = round(
                        slope(make, 1, 1 + args.iters) * 1e3, 1)
                    o = np.asarray(jax.jit(
                        lambda q: fa.attention_bhnd(
                            q, k, v, bias, dropout_rate=args.rate,
                            seed=jnp.int32(7)).astype(jnp.float32))(q))
                    if o_ref is None:
                        o_ref, ref_name = o, f"{bq}_{bk}"
                    else:
                        res["max_abs_diff_vs_" + ref_name] = float(
                            np.max(np.abs(o - o_ref)))
                except Exception as e:  # noqa: BLE001
                    res["error"] = f"{type(e).__name__}: {str(e)[:120]}"
                log(f"  d={D} bq={bq} bk={bk}: {res}")
                print(json.dumps(res), flush=True)
    finally:
        fa.BLOCK_Q, fa.BLOCK_K = shipped


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--rate", type=float, default=0.1)
    mode = ap.add_mutually_exclusive_group()
    mode.add_argument("--dims", action="store_true",
                      help="measure two-kernel vs fused at d=48/64 instead "
                           "of the block sweep")
    mode.add_argument("--fwd", action="store_true",
                      help="forward-only block sweep at d=48/64")
    args = ap.parse_args()
    if args.dims:
        dims_mode(args)
        return
    if args.fwd:
        fwd_mode(args)
        return

    from lunaris_orion_tpu.ops.pallas import flash_attention as fa
    assert jax.default_backend() == "tpu", jax.default_backend()

    B, H, N, D = 8, 8, 16384, 16
    q, k, v, bias = _inputs(B, H, N, D)
    make_bwd, _ = _make_bwd(fa, q, k, v, bias, args.rate)

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
