#!/usr/bin/env python
"""Bisect the VAE train step's batch-independent fixed cost (VERDICT r1
item 3: ~13 ms/step that dominates small batches).

Times ablated variants of the 128px VAE step on the TPU with the scan-slope
method (see bench.py), at two batch sizes so each variant's cost splits into
slope (per-sprite) and intercept (fixed):

  full        fwd + MSE/KL + bwd + clip + AdamW   (the bench.py step)
  no_opt      fwd + loss + bwd only               (isolates optimizer+clip)
  no_clip     full, but without clip_by_global_norm
  fwd_loss    fwd + loss only
  opt_only    AdamW update of frozen grads        (optimizer traffic alone)
  fwd_only    fwd, mean(recon) reduction

Usage: python tools/bench_vae_ablate.py [--iters 60]
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
import optax

from lunaris_orion_tpu.config import TrainConfig, VAEConfig
from lunaris_orion_tpu.models import vae as vae_mod
from lunaris_orion_tpu.train import losses as losses_mod
from lunaris_orion_tpu.train.schedule import cosine_warm_restarts


def log(m):
    print(m, file=sys.stderr, flush=True)


def slope_time(step_fn, carry, iters, reps=3):
    def chain(k):
        fn = jax.jit(lambda c: jax.lax.scan(step_fn, c, jnp.arange(k))[1])
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


def build(variant, vcfg, cfg, batch, key):
    sched = cosine_warm_restarts(cfg.vae_lr, cfg.scheduler_t0, cfg.min_lr)
    adamw = optax.adamw(sched, b1=0.9, b2=0.999, eps=1e-8,
                        weight_decay=cfg.weight_decay)
    clip = optax.clip_by_global_norm(cfg.max_grad_norm)
    tx_full = optax.chain(clip, adamw)

    params = vae_mod.init(key, vcfg)

    def loss_fn(p, x, rng):
        recon, mu, logvar = vae_mod.apply(p, x, rng=rng, cfg=vcfg)
        rl, kl = losses_mod.recon_kl(recon, x, mu, logvar)
        return cfg.recon_weight * rl + cfg.kl_weight * kl

    x = batch.astype(jnp.bfloat16) / 127.5 - 1.0

    if variant in ("full", "no_clip"):
        tx = tx_full if variant == "full" else adamw
        carry = (params, tx.init(params))

        def step(c, i):
            p, o = c
            loss, grads = jax.value_and_grad(loss_fn)(
                p, x, jax.random.fold_in(key, i))
            u, o = tx.update(grads, o, p)
            p = jax.tree_util.tree_map(lambda a, b: a + b.astype(a.dtype), p, u)
            return (p, o), loss
        return step, carry

    if variant == "no_opt":
        def step(p, i):
            loss, grads = jax.value_and_grad(loss_fn)(
                p, x, jax.random.fold_in(key, i))
            p = jax.tree_util.tree_map(
                lambda a, g: a - 1e-6 * g.astype(a.dtype), p, grads)
            return p, loss
        return step, params

    if variant == "opt_only":
        grads = jax.tree_util.tree_map(
            lambda p: jnp.full_like(p, 1e-4, jnp.float32), params)
        carry = (params, tx_full.init(params))

        def step(c, i):
            p, o = c
            g = jax.tree_util.tree_map(lambda a: a * (1.0 + 1e-6 * i), grads)
            u, o = tx_full.update(g, o, p)
            p = jax.tree_util.tree_map(lambda a, b: a + b.astype(a.dtype), p, u)
            return (p, o), 0.0
        return step, carry

    if variant == "fwd_loss":
        def step(p, i):
            l = loss_fn(p, x, jax.random.fold_in(key, i))
            p = jax.tree_util.tree_map(
                lambda a: a + 1e-9 * l.astype(a.dtype), p)
            return p, l
        return step, params

    if variant == "fwd_only":
        def step(p, i):
            recon, _, _ = vae_mod.apply(p, x, rng=jax.random.fold_in(key, i),
                                        cfg=vcfg)
            m = jnp.mean(recon.astype(jnp.float32))
            p = jax.tree_util.tree_map(
                lambda a: a + 1e-9 * m.astype(a.dtype), p)
            return p, m
        return step, params

    raise ValueError(variant)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--latent", type=int, default=512)
    ap.add_argument("--batches", type=int, nargs="+", default=[32, 128])
    args = ap.parse_args()

    vcfg = VAEConfig(latent_dim=args.latent)
    cfg = TrainConfig(latent_dim=args.latent, mixed_precision=True)
    key = jax.random.PRNGKey(0)
    log(f"device: {jax.devices()[0]}")

    out = {}
    for variant in ("full", "no_clip", "no_opt", "opt_only", "fwd_loss",
                    "fwd_only"):
        times = {}
        for b in args.batches:
            batch = jnp.asarray(np.random.default_rng(0).integers(
                0, 256, (b, 128, 128, 3), dtype=np.uint8))
            step, carry = build(variant, vcfg, cfg, batch, key)
            log(f"  {variant} @ batch {b}:")
            dt = slope_time(step, carry, args.iters)
            times[b] = dt
            log(f"  {variant} @ batch {b}: {dt*1e3:.2f} ms")
        b0, b1 = args.batches[0], args.batches[-1]
        slope = (times[b1] - times[b0]) / (b1 - b0)
        fixed = times[b0] - slope * b0
        out[variant] = {"ms": {str(k): round(v * 1e3, 3)
                               for k, v in times.items()},
                        "per_sprite_us": round(slope * 1e6, 2),
                        "fixed_ms": round(fixed * 1e3, 3)}
        print(json.dumps({"variant": variant, **out[variant]}), flush=True)


if __name__ == "__main__":
    main()
