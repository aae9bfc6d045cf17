#!/usr/bin/env python
"""The b64-recipe operating point (reference README.md:102-118), attacked.

BENCH_r04 recorded vs_baseline_b64_recipe = 0.604: at the reference's own
high-end recipe (batch 64, grad-accum 1, latent 512) the step is 16.2-16.7
ms, of which only ~9 ms is per-sprite compute slope — the rest is
per-update fixed cost. This tool decomposes that fixed cost and measures
the candidate attacks in ONE process (rows share the relay's fixed costs,
scan-slope timing — bench.py methodology):

  rows:
    fwdbwd        value_and_grad only, no optimizer (the compute floor)
    opt_only      AdamW update alone on fixed grads (param+state traffic)
    full_1x64     the recipe point as shipped (bench.py companion)
    full_1x64_bf16mu   + bf16 first moments (halves mu read+write)
    accum_{K}x64  K micro-batches of 64 per update (reference
                  --gradient_accumulation_steps semantics) — amortizes the
                  fixed cost at the reference's own micro-batch size
    accum_16x64_bf16mu  both levers together

Usage: python tools/bench_b64_recipe.py [--iters 16] [--accums 4,16]
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

import bench
from lunaris_orion_tpu.config import TrainConfig, VAEConfig
from lunaris_orion_tpu.models import vae as vae_mod
from lunaris_orion_tpu.train import losses as losses_mod
from lunaris_orion_tpu.train.state import make_optimizers

MICRO = 64
LATENT = 512


def log(m):
    print(m, file=sys.stderr, flush=True)


def slope(step_fn, carry, iters, reps):
    """Per-step seconds from the scan-chain slope between k=1 and k=1+iters."""

    def chain(k):
        fn = jax.jit(lambda c: jax.lax.scan(step_fn, c, jnp.arange(k))[0])
        t0 = time.time()
        jax.block_until_ready(fn(carry))
        log(f"    k={k}: compile+first {time.time() - t0:.1f}s")
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            jax.block_until_ready(fn(carry))
            best = min(best, time.time() - t0)
        return best

    t1 = chain(1)
    tk = chain(1 + iters)
    return (tk - t1) / iters


def setup(bf16_momentum: bool):
    vcfg = VAEConfig(latent_dim=LATENT)
    cfg = TrainConfig(latent_dim=LATENT, mixed_precision=True, vae_lr=3e-4,
                      scheduler_t0=10, bf16_momentum=bf16_momentum)
    vae_tx, _ = make_optimizers(cfg)
    key = jax.random.PRNGKey(0)
    params = vae_mod.init(key, vcfg)
    opt_state = vae_tx.init(params)
    batch = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (MICRO, 128, 128, 3), dtype=np.uint8))
    return vcfg, cfg, vae_tx, key, params, opt_state, batch


def make_micro(vcfg, cfg, key, batch):
    def micro(params, j):
        x = batch.astype(jnp.bfloat16) / 127.5 - 1.0
        rng = jax.random.fold_in(key, j)

        def loss_fn(p):
            recon, mu, logvar = vae_mod.apply(p, x, rng=rng, cfg=vcfg)
            rl, kl = losses_mod.recon_kl(recon, x, mu, logvar)
            return cfg.recon_weight * rl + cfg.kl_weight * kl

        return jax.value_and_grad(loss_fn)(params)

    return micro


def measure_fwdbwd(iters, reps):
    vcfg, cfg, _, key, params, _, batch = setup(False)
    micro = make_micro(vcfg, cfg, key, batch)
    g0 = jax.tree_util.tree_map(jnp.zeros_like, params)

    def step(carry, i):
        _, g = micro(params, i)
        return g, None

    return slope(step, g0, iters, reps)


def measure_opt_only(iters, reps, bf16_momentum):
    vcfg, cfg, tx, key, params, opt_state, batch = setup(bf16_momentum)
    micro = make_micro(vcfg, cfg, key, batch)
    _, grads = jax.jit(lambda p: micro(p, 0))(params)
    grads = jax.tree_util.tree_map(lambda g: jax.device_put(g), grads)

    def step(carry, i):
        params, opt_state = carry
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u.astype(p.dtype), params, updates)
        return (params, opt_state), None

    return slope(step, (params, opt_state), iters, reps)


def measure_full(accum, iters, reps, bf16_momentum):
    vcfg, cfg, tx, key, params, opt_state, batch = setup(bf16_momentum)
    micro = make_micro(vcfg, cfg, key, batch)

    def step(carry, i):
        params, opt_state = carry

        def micro_step(g_acc, j):
            _, g = micro(params, i * accum + j)
            return jax.tree_util.tree_map(lambda a, b: a + b, g_acc, g), None

        g0 = jax.tree_util.tree_map(jnp.zeros_like, params)
        grads, _ = jax.lax.scan(micro_step, g0, jnp.arange(accum))
        grads = jax.tree_util.tree_map(lambda g: g / accum, grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u.astype(p.dtype), params, updates)
        return (params, opt_state), None

    return slope(step, (params, opt_state), iters, reps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--accums", default="4,16")
    ap.add_argument("--rows", default="all",
                    help="comma list: fwdbwd,opt,full,bf16mu,accum,combo")
    args = ap.parse_args()
    rows = args.rows.split(",") if args.rows != "all" else [
        "fwdbwd", "opt", "full", "bf16mu", "accum", "combo"]
    try:
        cache = Path.home() / ".cache" / "lunaris_jax_cache"
        cache.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    dev = jax.devices()[0]
    log(f"device: {dev}")
    per_sprite = bench.analytic_vae_step_flops(1, LATENT)
    baseline = bench.A100_PEAK_FLOPS * bench.ASSUMED_REF_MFU / per_sprite
    out = {"micro": MICRO, "latent": LATENT,
           "baseline_sprites_per_s": round(baseline, 1)}

    def record(name, dt, sprites_per_update):
        sps = sprites_per_update / dt
        out[name] = {"ms": round(dt * 1e3, 2),
                     "sprites_per_s": round(sps, 1),
                     "vs_baseline": round(sps / baseline, 3)}
        log(f"  {name}: {dt * 1e3:.2f} ms | {sps:.0f} sprites/s "
            f"| {sps / baseline:.3f}x")

    if "fwdbwd" in rows:
        log("[fwdbwd @ b64] (compute floor, no optimizer)")
        record("fwdbwd_1x64", measure_fwdbwd(args.iters, args.reps), MICRO)
    if "opt" in rows:
        log("[opt_only] AdamW update alone (f32 moments)")
        dt = measure_opt_only(args.iters, args.reps, False)
        out["opt_only_ms"] = round(dt * 1e3, 2)
        log(f"  opt_only: {dt * 1e3:.2f} ms")
        log("[opt_only] AdamW update alone (bf16 mu)")
        dt = measure_opt_only(args.iters, args.reps, True)
        out["opt_only_bf16mu_ms"] = round(dt * 1e3, 2)
        log(f"  opt_only_bf16mu: {dt * 1e3:.2f} ms")
    if "full" in rows:
        log("[full 1x64] the shipped recipe point")
        record("full_1x64", measure_full(1, args.iters, args.reps, False),
               MICRO)
    if "bf16mu" in rows:
        log("[full 1x64 + bf16 mu]")
        record("full_1x64_bf16mu",
               measure_full(1, args.iters, args.reps, True), MICRO)
    if "accum" in rows:
        for k in [int(x) for x in args.accums.split(",")]:
            log(f"[accum {k}x64]")
            record(f"accum_{k}x64",
                   measure_full(k, max(4, args.iters // k), args.reps,
                                False), MICRO * k)
    if "combo" in rows:
        k = max(int(x) for x in args.accums.split(","))
        log(f"[accum {k}x64 + bf16 mu]")
        record(f"accum_{k}x64_bf16mu",
               measure_full(k, max(4, args.iters // k), args.reps, True),
               MICRO * k)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
