#!/usr/bin/env python
"""Serving-path throughput: jitted decode and decode+teacher-score.

The reference's inference story (examples/simple_generation.py, broken as
shipped — SURVEY.md §2.3 #25) is batch decode + quality scoring. This
framework serves that contract as one jitted static-shape program
(infer/generator.py); this tool measures its throughput on the real chip
across batch sizes, scan-slope method (BASELINE.md methodology — naive
per-call timing is meaningless through the relay).

Decode-only sweeps serving-scale batches; decode+score sweeps the
production num_samples regime (4-16, infer/generator.py:70 contract) —
the fp32 teacher at 128px exhausts HBM far below serving batch sizes,
and one teacher forward is ~1 s, so score chains are kept short to
respect the relay's single-execution time limit (see memory notes).

Usage: python tools/bench_infer.py [--latent 512] [--batches 64,256,1024]
                                   [--score_batches 4,8,16]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from lunaris_orion_tpu.config import TeacherConfig, VAEConfig
from lunaris_orion_tpu.models import teacher as teacher_mod
from lunaris_orion_tpu.models import vae as vae_mod

ITERS, REPS = 20, 3


def slope(fn, z, iters=ITERS):
    """Per-call time via k-chained scan slope (relay-safe)."""
    def chain(k):
        def body(c, _):
            # fold the carry into z so the chain cannot be collapsed;
            # cast the f32 carry DOWN to z's dtype — bf16 + f32 promotes
            # to f32 and would silently benchmark an f32 decode
            out = fn(z + c.astype(z.dtype))
            return jnp.float32(jnp.real(out)), out
        f = jax.jit(lambda z0: jax.lax.scan(body, jnp.float32(0.0),
                                            None, length=k))
        jax.block_until_ready(f(z))
        best = float("inf")
        for _ in range(REPS):
            t0 = time.time()
            jax.block_until_ready(f(z))
            best = min(best, time.time() - t0)
        return best
    return (chain(1 + iters) - chain(1)) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--latent", type=int, default=512)
    ap.add_argument("--batches", default="64,256,1024")
    ap.add_argument("--score_batches", default="4,8,16")
    ap.add_argument("--iters", type=int, default=ITERS)
    ap.add_argument("--attn_window", type=int, default=0,
                    help=">0: teacher scores with local-window attention "
                         "(docs/parity.md deviation 12)")
    ap.add_argument("--bf16", action="store_true",
                    help="decode+score in bf16 activations (the "
                         "infer --bf16 knob; reference autocast parity)")
    args = ap.parse_args()

    vcfg = VAEConfig(latent_dim=args.latent)
    tcfg = TeacherConfig(attn_window=args.attn_window or None)
    key = jax.random.PRNGKey(0)
    vp = vae_mod.init(key, vcfg)
    tp, ts = teacher_mod.init(jax.random.PRNGKey(1), tcfg)
    dec_bf16 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), vp["decoder"])

    print(f"device: {jax.devices()[0]}  latent={args.latent}")

    def decode_only(zz):
        img = vae_mod.decode(dec_bf16, zz, [], vcfg)
        return jnp.sum(img.astype(jnp.float32))

    score_dtype = jnp.bfloat16 if args.bf16 else jnp.float32

    def decode_score(zz):
        img = vae_mod.decode(vp["decoder"], zz.astype(score_dtype),
                             [], vcfg)
        out, _ = teacher_mod.apply(tp, ts, img, cfg=tcfg, train=False)
        q = jnp.mean(out["quality_scores"].astype(jnp.float32))
        return q + jnp.sum(img.astype(jnp.float32)) * 0.0

    print("| decode batch | ms | sprites/s |")
    print("|---|---|---|")
    for b in [int(x) for x in args.batches.split(",")]:
        z = jax.random.normal(jax.random.PRNGKey(2), (b, args.latent),
                              jnp.bfloat16)
        t_d = slope(decode_only, z, args.iters)
        print(f"| {b} | {t_d*1e3:.2f} | {b/t_d:,.0f} |", flush=True)

    # production generate() regime: fp32 decode + full teacher score; the
    # teacher forward is ~1 s/call, so chain length stays <= 4
    print("| score batch | ms | sprites/s |")
    print("|---|---|---|")
    for b in [int(x) for x in args.score_batches.split(",")]:
        z = jax.random.normal(jax.random.PRNGKey(2), (b, args.latent),
                              jnp.bfloat16)
        t_s = slope(decode_score, z, 3)
        print(f"| {b} | {t_s*1e3:.2f} | {b/t_s:,.0f} |", flush=True)


if __name__ == "__main__":
    main()
