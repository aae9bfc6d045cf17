#!/usr/bin/env python
"""r3 attention VPU-floor experiments (VERDICT item 8a/8b).

Measures, at the production shape (B=8, H=8, N=16384, d=16, bf16):
  * exp2 score domain (LUNARIS_ATTN_EXP2=1) vs default exp,
  * hardware-PRNG in-kernel dropout (LUNARIS_ATTN_DROPOUT=prng) vs the
    5-op hash, at dropout 0.1,
fwd and fwd+bwd, scan-slope timed. Also validates on hardware:
  * exp2 output/grad parity vs the default domain,
  * PRNG-mask block-decomposition independence: fwd outputs bit-identical
    across different BLOCK_K tilings, dq bit-identical across different
    BWD_BLOCK_K tilings (the property that killed r1's per-tile reseed).

Usage: python tools/bench_attn_r3.py [--iters 8] [--validate-only]
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


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


def make_inputs(B=8, H=8, N=16384, D=16):
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (B, H, N, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, H, N, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, H, N, D), jnp.bfloat16)
    bias = jax.random.normal(ks[3], (H, N)).astype(jnp.float32)
    return q, k, v, bias


def set_env(env):
    for k in ("LUNARIS_ATTN_EXP2", "LUNARIS_ATTN_DROPOUT"):
        os.environ.pop(k, None)
    os.environ.update(env)


def bench(iters):
    from lunaris_orion_tpu.ops.pallas import flash_attention as fa
    q, k, v, bias = make_inputs()
    flops = 4 * q.shape[0] * q.shape[1] * q.shape[2] ** 2 * q.shape[3]

    combos = [
        ("baseline", {}),
        ("exp2", {"LUNARIS_ATTN_EXP2": "1"}),
        ("prng_drop", {"LUNARIS_ATTN_DROPOUT": "prng"}),
        ("exp2+prng", {"LUNARIS_ATTN_EXP2": "1",
                       "LUNARIS_ATTN_DROPOUT": "prng"}),
    ]
    for name, env in combos:
        set_env(env)

        def make_fwd(kk, rate):
            @jax.jit
            def run(q):
                def body(c, i):
                    o = fa.attention_bhnd(c, k, v, bias, dropout_rate=rate,
                                          seed=jnp.int32(7))
                    return o, jnp.float32(0)
                o, _ = jax.lax.scan(body, q, jnp.arange(kk))
                return jnp.sum(o.astype(jnp.float32))
            return lambda: float(run(q))

        def make_bwd(kk, rate):
            def loss(q):
                return jnp.sum(fa.attention_bhnd(
                    q, k, v, bias, dropout_rate=rate,
                    seed=jnp.int32(7)).astype(jnp.float32) ** 2)

            @jax.jit
            def run(q):
                def body(c, i):
                    g = jax.grad(loss)(c)
                    return c + 1e-6 * g.astype(c.dtype), jnp.float32(0)
                o, _ = jax.lax.scan(body, q, jnp.arange(kk))
                return jnp.sum(o.astype(jnp.float32))
            return lambda: float(run(q))

        res = {"combo": name}
        if "prng" not in name:
            dt = slope(lambda kk: make_fwd(kk, 0.0), 1, 1 + iters)
            res["fwd_ms"] = round(dt * 1e3, 1)
            res["fwd_tfs"] = round(flops / dt / 1e12, 1)
        dt = slope(lambda kk: make_fwd(kk, 0.1), 1, 1 + iters)
        res["fwd_drop01_ms"] = round(dt * 1e3, 1)
        dt = slope(lambda kk: make_bwd(kk, 0.1), 1, max(2, 1 + iters // 2))
        res["fwdbwd_drop01_ms"] = round(dt * 1e3, 1)
        log(f"  {name}: {res}")
        print(json.dumps(res), flush=True)
    set_env({})


def validate():
    from lunaris_orion_tpu.ops.pallas import flash_attention as fa
    q, k, v, bias = make_inputs(B=2, H=4, N=4096, D=16)

    def out(rate=0.0):
        return np.asarray(jax.jit(lambda q: fa.attention_bhnd(
            q, k, v, bias, dropout_rate=rate, seed=jnp.int32(7)))(q))

    def dq(rate=0.1):
        g = jax.jit(jax.grad(lambda q: jnp.sum(fa.attention_bhnd(
            q, k, v, bias, dropout_rate=rate,
            seed=jnp.int32(7)).astype(jnp.float32) ** 2)))(q)
        return np.asarray(g.astype(jnp.float32))

    # 1. exp2 parity vs default
    set_env({})
    o_ref, g_ref = out(), dq(0.0)
    set_env({"LUNARIS_ATTN_EXP2": "1"})
    o_e2, g_e2 = out(), dq(0.0)
    set_env({})
    oe = float(np.max(np.abs(o_e2.astype(np.float32)
                             - o_ref.astype(np.float32))))
    ge = float(np.max(np.abs(g_e2 - g_ref))) / max(float(np.max(np.abs(g_ref))), 1e-9)
    # Tolerances: bf16 outputs differ by one ulp-level reround (scores are
    # scaled by log2e before the bf16 cast); dq casts ds to bf16 inside the
    # kernel, so outlier elements can shift ~2-3% of the global grad max.
    print(json.dumps({"check": "exp2_parity", "out_max_abs": oe,
                      "dq_max_rel": round(ge, 6),
                      "pass": bool(oe < 0.02 and ge < 0.03)}), flush=True)

    # 2. PRNG-mask block-decomposition independence. Changing BLOCK_K
    # changes the online-softmax accumulation ORDER, so outputs differ at
    # the f32-accumulation/bf16-ulp level even with bit-identical masks —
    # the HASH mask (whose tiling-independence is already hardware-proven)
    # is measured as the control; the PRNG mask passes if its cross-tiling
    # drift is no larger. A mask mismatch would show up at O(1) magnitude
    # (dropped-vs-kept probability elements), orders above ulp noise.
    def drift(env):
        set_env(env)
        o1 = out(0.1).astype(np.float32)
        orig = fa.BLOCK_K
        fa.BLOCK_K = 1024
        o2 = out(0.1).astype(np.float32)
        fa.BLOCK_K = orig
        g1 = dq()
        origb = fa.BWD_BLOCK_K
        fa.BWD_BLOCK_K = 512
        g2 = dq()
        fa.BWD_BLOCK_K = origb
        set_env({})
        return (float(np.max(np.abs(o1 - o2))),
                float(np.max(np.abs(g1 - g2))))

    fwd_hash, dq_hash = drift({})
    fwd_prng, dq_prng = drift({"LUNARIS_ATTN_DROPOUT": "prng"})
    print(json.dumps({"check": "prng_block_independence",
                      "fwd_drift_hash_control": fwd_hash,
                      "fwd_drift_prng": fwd_prng,
                      "dq_drift_hash_control": dq_hash,
                      "dq_drift_prng": dq_prng,
                      "pass": bool(fwd_prng <= max(fwd_hash, 1e-6) * 4
                                   and dq_prng <= max(dq_hash, 1e-6) * 4)}),
          flush=True)

    # 3. PRNG keep fraction
    set_env({"LUNARIS_ATTN_DROPOUT": "prng"})
    ones = jnp.ones_like(v)
    o = np.asarray(jax.jit(lambda: fa.attention_bhnd(
        q, k, jnp.ones_like(v), bias, dropout_rate=0.1,
        seed=jnp.int32(3)))()).astype(np.float32)
    set_env({})
    # E[o] = 1 regardless of mask; Var reveals the keep distribution —
    # just a sanity bound on the mean here.
    print(json.dumps({"check": "prng_keep_mean",
                      "mean": round(float(o.mean()), 4),
                      "pass": bool(abs(o.mean() - 1.0) < 0.05)}), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--validate-only", action="store_true")
    ap.add_argument("--bench-only", action="store_true")
    args = ap.parse_args()
    try:
        cache = Path.home() / ".cache" / "lunaris_jax_cache"
        cache.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    log(f"device: {jax.devices()[0]}")
    if not args.bench_only:
        validate()
    if not args.validate_only:
        bench(args.iters)


if __name__ == "__main__":
    main()
