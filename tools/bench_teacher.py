#!/usr/bin/env python
"""Decompose the hybrid step's teacher cost on the TPU (scan-slope method).

Times, at reference 128px defaults (feature 128, 4 experts, 3 layers,
batch 8, bf16, dropout 0.1):
  teacher_fwd          one teacher forward (the T1 role)
  teacher_fwd_bwd      teacher forward + backward wrt params (the T2 role)
  *_nodrop             the same without dropout
  *_noattn             the same with attention replaced by identity
                       (isolates conv/BN/gate/head cost)

Usage: python tools/bench_teacher.py [--iters 12] [--batch 8]
"""

import argparse
import sys
import time
from pathlib import Path
from unittest import mock

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from lunaris_orion_tpu.config import TeacherConfig
from lunaris_orion_tpu.models import teacher as teacher_mod
from lunaris_orion_tpu.ops import attention as attn_mod
from lunaris_orion_tpu.ops import layers


def log(m):
    print(m, file=sys.stderr, flush=True)


def slope_time(one, carry, iters, reps=3):
    def chain(k):
        fn = jax.jit(lambda c: jax.lax.scan(one, c, jnp.arange(k))[0])
        t0 = time.time()
        jax.block_until_ready(fn(carry))
        log(f"    k={k}: compile+first {time.time()-t0:.1f}s")
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            jax.block_until_ready(fn(carry))
            best = min(best, time.time() - t0)
        return best

    return (chain(1 + iters) - chain(1)) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--rate", type=float, default=0.1)
    ap.add_argument("--cases", nargs="+", default=[
        "fwd", "fwd_bwd", "fwd_nodrop", "fwd_bwd_nodrop", "fwd_noattn",
        "fwd_bwd_noattn"])
    args = ap.parse_args()
    log(f"device: {jax.devices()[0]}")

    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (args.batch, 128, 128, 3), jnp.bfloat16,
                           minval=-1, maxval=1)

    def identity_attention(params, xx, **kw):
        return layers.conv2d(params["proj"], xx)

    for case in args.cases:
        rate = 0.0 if "nodrop" in case else args.rate
        cfg = TeacherConfig(dropout_rate=rate)
        params, stats = teacher_mod.init(jax.random.fold_in(key, 1), cfg)
        ctx = (mock.patch.object(attn_mod, "spatial_attention_reference",
                                 identity_attention)
               if "noattn" in case else mock.patch.object(
                   attn_mod, "__doc__", attn_mod.__doc__))
        with ctx:
            if case.startswith("fwd_bwd"):
                def one(carry, i):
                    p, s = carry

                    def loss(p):
                        out, ns = teacher_mod.apply(
                            p, s, x, cfg=cfg, train=True,
                            rng=jax.random.fold_in(key, i), remat=False)
                        return (jnp.mean(out["quality_scores"]), ns)

                    (l, ns), g = jax.value_and_grad(loss, has_aux=True)(p)
                    p = jax.tree_util.tree_map(
                        lambda a, b: a - 1e-6 * b.astype(a.dtype), p, g)
                    return (p, ns), l
                carry = (params, stats)
            else:
                def one(carry, i):
                    p, s = carry
                    out, ns = teacher_mod.apply(
                        p, s, x, cfg=cfg, train=True,
                        rng=jax.random.fold_in(key, i), remat=False)
                    p = jax.tree_util.tree_map(
                        lambda a: a + 1e-9 * jnp.mean(
                            out["quality_scores"]).astype(a.dtype), p)
                    return (p, ns), 0.0
                carry = (params, stats)
            log(f"  {case}:")
            dt = slope_time(one, carry, args.iters)
            print(f"{case}: {dt*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
