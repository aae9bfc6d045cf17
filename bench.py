#!/usr/bin/env python
"""Benchmark: train sprites/sec/chip for the 128x128 VAE step.

Primary metric per BASELINE.json: the hybrid trainer's VAE step (forward +
MSE/KL loss + backward + AdamW update) at the reference's high-end config
(batch 64, latent 512, mixed precision; README.md:102-118) on one TPU chip.

vs_baseline: the reference publishes no numbers (BASELINE.md), so the
baseline is an *analytic upper bound* for the reference on its documented
A100 high-end config: step FLOPs (from XLA cost analysis of this exact
model) / (312 TFLOP/s fp16 tensor-core peak * 0.40 assumed MFU) — 40% MFU is
generous for eager PyTorch AMP convnets, so vs_baseline understates the real
speedup. Details appended to BASELINE.md.

Prints ONE JSON line to stdout; human detail goes to stderr.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from lunaris_orion_tpu.config import TrainConfig, VAEConfig
from lunaris_orion_tpu.models import vae as vae_mod
from lunaris_orion_tpu.train import losses as losses_mod
from lunaris_orion_tpu.train.state import make_optimizers

A100_PEAK_FLOPS = 312e12
ASSUMED_REF_MFU = 0.40
# XLA-reported f32 flops for one fwd+bwd+update step at batch 64 / latent 512
# (fallback when cost_analysis is unavailable on the backend).
FALLBACK_FLOPS_PER_STEP = 2.4e12

BATCH = 64
LATENT = 512
WARMUP = 3
ITERS = 20


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    try:
        from pathlib import Path
        cache = Path.home() / ".cache" / "lunaris_jax_cache"
        cache.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")
    vcfg = VAEConfig(latent_dim=LATENT)
    cfg = TrainConfig(latent_dim=LATENT, mixed_precision=True,
                      vae_lr=3e-4, scheduler_t0=10)
    vae_tx, _ = make_optimizers(cfg)

    key = jax.random.PRNGKey(0)
    params = vae_mod.init(key, vcfg)
    opt_state = vae_tx.init(params)

    def vae_train_step(params, opt_state, batch, rng):
        x = batch.astype(jnp.bfloat16) / 127.5 - 1.0

        def loss_fn(p):
            recon, mu, logvar = vae_mod.apply(p, x, rng=rng, cfg=vcfg)
            recon_loss, kl_loss = losses_mod.recon_kl(recon, x, mu, logvar)
            return cfg.recon_weight * recon_loss + cfg.kl_weight * kl_loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = vae_tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u.astype(p.dtype), params, updates)
        return params, opt_state, loss

    step = jax.jit(vae_train_step, donate_argnums=(0, 1))
    batch = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (BATCH, 128, 128, 3),
                                          dtype=np.uint8))
    rng = jax.random.fold_in(key, 1)

    # ---- compile + FLOP count ------------------------------------------
    t0 = time.time()
    lowered = step.lower(params, opt_state, batch, rng)
    compiled = lowered.compile()
    log(f"compile: {time.time() - t0:.1f}s")
    flops = None
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
    except Exception as e:
        log(f"cost_analysis unavailable: {e}")
    if not flops:
        flops = FALLBACK_FLOPS_PER_STEP
    log(f"step flops (XLA): {flops:.3e}")

    mem = compiled.memory_analysis()
    if mem is not None:
        log(f"memory: temp={getattr(mem, 'temp_size_in_bytes', 0)/2**30:.2f}GB "
            f"args={getattr(mem, 'argument_size_in_bytes', 0)/2**30:.2f}GB")

    # ---- run ------------------------------------------------------------
    for _ in range(WARMUP):
        params, opt_state, loss = step(params, opt_state, batch, rng)
    jax.block_until_ready(loss)
    t0 = time.time()
    for _ in range(ITERS):
        params, opt_state, loss = step(params, opt_state, batch, rng)
    jax.block_until_ready(loss)
    dt = (time.time() - t0) / ITERS

    sprites_per_sec = BATCH / dt
    achieved_tflops = flops / dt / 1e12
    log(f"step time: {dt*1e3:.2f} ms | {sprites_per_sec:.1f} sprites/s/chip "
        f"| {achieved_tflops:.1f} TFLOP/s | loss={float(loss):.4f}")

    baseline = A100_PEAK_FLOPS * ASSUMED_REF_MFU / (flops / BATCH)
    log(f"analytic A100 reference baseline: {baseline:.1f} sprites/s "
        f"(peak*{ASSUMED_REF_MFU} MFU over the same step FLOPs)")

    print(json.dumps({
        "metric": "train_sprites_per_sec_per_chip_vae128",
        "value": round(sprites_per_sec, 2),
        "unit": "sprites/s",
        "vs_baseline": round(sprites_per_sec / baseline, 3),
    }))


if __name__ == "__main__":
    main()
