#!/usr/bin/env python
"""Is the GN+Mish VPU work serialized against conv MXU work inside XLA's
fusions? (r3: the identity ablation charges GN+Mish 6.56 ms of the
20.9 ms step; this tool bounds what a fused conv+GN+Mish Pallas kernel
could recover by measuring the serialization directly.)

At one stage shape (default: the widest, [B,128,128,64] conv3x3 64->64):

  conv_alone      y2 = conv3x3(x)
  gnmish_alone    g  = mish(GN(y))            (pure VPU+HBM pass)
  chain           y2 = conv3x3(mish(GN(y)))   (XLA fuses apply into conv)
  stats_alone     (mean, inv) of y            (the reduction half of GN)

If chain ~= conv_alone + gnmish_alone the VPU work is fully serialized
and a pipelined kernel's ceiling is chain - max(conv_alone, gnmish_alone).
If chain ~= max(...) XLA already overlaps and there is nothing to win.

Usage: python tools/bench_fusion_overlap.py [--batch 128] [--iters 60]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def log(m):
    print(m, file=sys.stderr, flush=True)


def slope_time(step_fn, carry, iters, reps=3, *args):
    """step_fn(carry, i, *args); big operands go through *args so they are
    runtime arguments, not compile-request constants (the relay rejects
    >~100 MB program bodies with HTTP 413)."""
    def chain(k):
        fn = jax.jit(lambda c, *a: lax.scan(
            lambda cc, i: step_fn(cc, i, *a), c, jnp.arange(k))[0])
        jax.block_until_ready(fn(carry, *args))
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            jax.block_until_ready(fn(carry, *args))
            best = min(best, time.time() - t0)
        return best

    return (chain(1 + iters) - chain(1)) / iters


DIMNUMS = ("NHWC", "HWIO", "NHWC")


def gn_apply(y, scale, bias, groups=8, eps=1e-5):
    b, h, w, c = y.shape
    cg = c // groups
    y32 = y.astype(jnp.float32)
    s1 = jnp.mean(y32, axis=(1, 2))
    s2 = jnp.mean(jnp.square(y32), axis=(1, 2))
    gm = jnp.mean(s1.reshape(b, groups, cg), axis=2)
    gv = jnp.mean(s2.reshape(b, groups, cg), axis=2) - jnp.square(gm)
    inv = lax.rsqrt(gv + eps)
    sc = jnp.repeat(inv, cg, axis=1) * scale
    bi = bias - jnp.repeat(gm * inv, cg, axis=1) * scale
    return (y32 * sc[:, None, None, :] + bi[:, None, None, :]).astype(y.dtype)


def mish(x):
    x32 = x.astype(jnp.float32)
    return (x32 * jnp.tanh(jax.nn.softplus(x32))).astype(x.dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--hw", type=int, default=128)
    ap.add_argument("--cin", type=int, default=64)
    ap.add_argument("--cout", type=int, default=64)
    ap.add_argument("--iters", type=int, default=60)
    args = ap.parse_args()
    log(f"device: {jax.devices()[0]}")

    key = jax.random.PRNGKey(0)
    b, hw, cin, cout = args.batch, args.hw, args.cin, args.cout
    y = jax.random.normal(key, (b, hw, hw, cin), jnp.bfloat16)
    w = jax.random.normal(key, (3, 3, cin, cout), jnp.bfloat16) * 0.05
    scale = jnp.ones((cin,), jnp.float32) * 1.1
    bias = jnp.ones((cin,), jnp.float32) * 0.05

    def conv(x):
        return lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=DIMNUMS)

    def affine(x, groups=8, eps=1e-5):
        bb, hh, ww, cc = x.shape
        cg = cc // groups
        x32 = x.astype(jnp.float32)
        s1 = jnp.mean(x32, axis=(1, 2))
        s2 = jnp.mean(jnp.square(x32), axis=(1, 2))
        gm = jnp.mean(s1.reshape(bb, groups, cg), axis=2)
        gv = jnp.mean(s2.reshape(bb, groups, cg), axis=2) - jnp.square(gm)
        inv = lax.rsqrt(gv + eps)
        al = jnp.repeat(inv, cg, axis=1) * scale
        be = bias - jnp.repeat(gm * inv, cg, axis=1) * scale
        return al, be

    def pallas_fused(x, band, variant="dots9"):
        from lunaris_orion_tpu.ops.pallas import fused_stage as fs
        al, be = affine(x)
        return fs.gn_mish_conv3_pallas(
            x, al, be, w, jnp.zeros((cout,), jnp.float32), band=band,
            variant=variant)

    cases = {
        "conv_alone": lambda x: conv(x),
        "gnmish_alone": lambda x: mish(gn_apply(x, scale, bias)),
        "chain": lambda x: conv(mish(gn_apply(x, scale, bias))),
        "stats_alone": lambda x: jnp.stack(
            [jnp.mean(x.astype(jnp.float32), axis=(1, 2)),
             jnp.mean(jnp.square(x.astype(jnp.float32)), axis=(1, 2))]),
        "pallas_fused_b16": lambda x: pallas_fused(x, 16),
        "pallas_im2col_b8": lambda x: pallas_fused(x, 8, "im2col"),
        "pallas_im2col_b16": lambda x: pallas_fused(x, 16, "im2col"),
        "pallas_im2col_b32": lambda x: pallas_fused(x, 32, "im2col"),
    }

    gflop_conv = 2 * b * hw * hw * cin * cout * 9 / 1e9
    res = {}
    for name, f in cases.items():
        def step(c, i, yy, f=f):
            acc, = c
            out = f(yy + (i * 1e-6).astype(yy.dtype))
            return (acc + jnp.mean(out.astype(jnp.float32)),), 0.0

        try:
            t = slope_time(step, (jnp.zeros(()),), args.iters, 3, y)
        except Exception as e:
            log(f"  {name}: FAILED {str(e)[:160]}")
            print(json.dumps({"case": name, "error": str(e)[:160]}),
                  flush=True)
            continue
        res[name] = t
        extra = ""
        if "conv" in name or name == "chain":
            extra = f" ({gflop_conv/t/1e3:.0f} TF/s on conv MACs)"
        log(f"  {name}: {t*1e3:.3f} ms{extra}")
        print(json.dumps({"case": name, "ms": round(t * 1e3, 4)}),
              flush=True)

    serial = res["conv_alone"] + res["gnmish_alone"]
    ceiling = res["chain"] - max(res["conv_alone"], res["gnmish_alone"])
    print(json.dumps({
        "sum_parts_ms": round(serial * 1e3, 4),
        "chain_ms": round(res["chain"] * 1e3, 4),
        "overlap_already_ms": round((serial - res["chain"]) * 1e3, 4),
        "pipelined_kernel_ceiling_saving_ms": round(ceiling * 1e3, 4),
    }), flush=True)


if __name__ == "__main__":
    main()
