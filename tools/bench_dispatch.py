#!/usr/bin/env python
"""In-graph microbenchmark for the ops.dispatch decisions (K1/K3).

Times the FULL jitted 128px VAE train step (fwd + MSE/KL + bwd + AdamW — the
op's real surroundings, where XLA fusion competes) with each dispatchable op
forced to 'xla' vs 'pallas', using the same scan-slope methodology as
bench.py. The winner per op is what ops.dispatch's _TPU_DEFAULTS should
encode; results are recorded in BASELINE.md.

Usage:  python tools/bench_dispatch.py [--batch 64] [--iters 60]
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

from lunaris_orion_tpu.config import TrainConfig, VAEConfig
from lunaris_orion_tpu.models import vae as vae_mod
from lunaris_orion_tpu.ops import dispatch
from lunaris_orion_tpu.train import losses as losses_mod
from lunaris_orion_tpu.train.state import make_optimizers


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build_step(vcfg, cfg, vae_tx, batch, key):
    def one_step(carry, i):
        params, opt_state = carry
        x = batch.astype(jnp.bfloat16) / 127.5 - 1.0
        rng = jax.random.fold_in(key, i)

        def loss_fn(p):
            recon, mu, logvar = vae_mod.apply(p, x, rng=rng, cfg=vcfg)
            rl, kl = losses_mod.recon_kl(recon, x, mu, logvar)
            return cfg.recon_weight * rl + cfg.kl_weight * kl

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = vae_tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u.astype(p.dtype), params, updates)
        return (params, opt_state), loss

    return one_step


def slope_time(one_step, params, opt_state, iters, reps=3):
    def chain(k):
        fn = jax.jit(lambda p, o: jax.lax.scan(one_step, (p, o),
                                               jnp.arange(k)))
        t0 = time.time()
        fn(params, opt_state)
        log(f"    k={k}: compile+first {time.time()-t0:.1f}s")
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            jax.block_until_ready(fn(params, opt_state))
            best = min(best, time.time() - t0)
        return best

    t1 = chain(1)
    tk = chain(1 + iters)
    return (tk - t1) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--latent", type=int, default=512)
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--ops", type=str, default="gn_mish,mse_kl")
    args = ap.parse_args()

    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")
    vcfg = VAEConfig(latent_dim=args.latent)
    cfg = TrainConfig(latent_dim=args.latent, mixed_precision=True)
    vae_tx, _ = make_optimizers(cfg)
    key = jax.random.PRNGKey(0)
    params = vae_mod.init(key, vcfg)
    opt_state = vae_tx.init(params)
    batch = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (args.batch, 128, 128, 3), dtype=np.uint8))

    results = {}
    ops = tuple(args.ops.split(","))
    for op in ops:
        for impl in ("xla", "pallas"):
            dispatch.clear_overrides()
            dispatch.set_override(op, impl)
            log(f"  {op}={impl}:")
            dt = slope_time(build_step(vcfg, cfg, vae_tx, batch, key),
                            params, opt_state, args.iters)
            results[f"{op}:{impl}"] = dt
            log(f"  {op}={impl}: {dt*1e3:.2f} ms/step "
                f"({args.batch/dt:.0f} sprites/s)")
    dispatch.clear_overrides()

    for op in ops:
        x, p = results[f"{op}:xla"], results[f"{op}:pallas"]
        winner = "pallas" if p < x else "xla"
        print(json.dumps({
            "op": op, "xla_ms": round(x * 1e3, 3),
            "pallas_ms": round(p * 1e3, 3), "winner": winner,
            "batch": args.batch, "backend": dev.platform,
        }))


if __name__ == "__main__":
    main()
