#!/usr/bin/env python
"""XLA compiler-option sweep for the b128 VAE train micro-step.

Round-3 conclusion (BASELINE.md): every *graph-level* and *kernel-level*
form of the GN+Mish/conv serialization loses to XLA's default fusion
strategy, so "beating XLA here needs compiler work". XLA's own tuning
knobs ARE the accessible compiler lever, and they had never been swept.

Transport note (this host): the TPU is behind the axon relay, so the
local process never loads libtpu — TPU-specific `XLA_FLAGS` env flags
hit the *client's* flag parser and abort with "Unknown flag" (measured;
that was this tool's v1). The channel that works is per-compile PJRT
`compiler_options`, which ship with the program to the remote compiler:
`jax.jit(f).lower(args).compile(compiler_options={...})`. Unknown or
rejected options come back as a clean remote-compile error and are
recorded, not skipped silently.

Timing: the same scan-slope method as bench.py (k-step chains, slope
between k=1 and k=1+ITERS, min of REPS) — see BASELINE.md methodology.

Usage:  python tools/bench_xla_flags.py            # full sweep (table)
        python tools/bench_xla_flags.py --only N   # one config
"""

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

CONFIGS = [
    ("baseline", {}),
    ("vmem32M", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("vmem64M", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("vmem96M", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
    ("lhs", {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
    ("licm4", {"xla_tpu_licm_size_inflation_ratio": "4"}),
    ("no_dot_sr", {"xla_tpu_enable_dot_strength_reduction": "false"}),
    ("no_rwb", {"xla_tpu_rwb_fusion": "false"}),
    ("vmem64M+lhs", {"xla_tpu_scoped_vmem_limit_kib": "65536",
                     "xla_tpu_enable_latency_hiding_scheduler": "true"}),
]

MICRO, LATENT, ITERS, REPS = 128, 512, 20, 3


def build():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lunaris_orion_tpu.config import TrainConfig, VAEConfig
    from lunaris_orion_tpu.models import vae as vae_mod
    from lunaris_orion_tpu.train import losses as losses_mod
    from lunaris_orion_tpu.train.state import make_optimizers

    vcfg = VAEConfig(latent_dim=LATENT)
    cfg = TrainConfig(latent_dim=LATENT, mixed_precision=True,
                      vae_lr=3e-4, scheduler_t0=10)
    vae_tx, _ = make_optimizers(cfg)
    key = jax.random.PRNGKey(0)
    params = vae_mod.init(key, vcfg)
    opt_state = vae_tx.init(params)
    batch = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (MICRO, 128, 128, 3),
                                          dtype=np.uint8))

    def one_step(carry, i):
        params, opt_state = carry
        x = batch.astype(jnp.bfloat16) / 127.5 - 1.0
        rng = jax.random.fold_in(key, i)

        def loss_fn(p):
            recon, mu, logvar = vae_mod.apply(p, x, rng=rng, cfg=vcfg)
            rl, kl = losses_mod.recon_kl(recon, x, mu, logvar)
            return cfg.recon_weight * rl + cfg.kl_weight * kl

        l, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = vae_tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u.astype(p.dtype), params, updates)
        return (params, opt_state), l

    def chain(k):
        return jax.jit(lambda p, o: jax.lax.scan(one_step, (p, o),
                                                 jnp.arange(k)))

    return jax, chain, params, opt_state


def measure(jax, chain, params, opt_state, options):
    def timed(k):
        lowered = chain(k).lower(params, opt_state)
        fn = lowered.compile(compiler_options=dict(options) or None)
        jax.block_until_ready(fn(params, opt_state))
        best = float("inf")
        for _ in range(REPS):
            t0 = time.time()
            jax.block_until_ready(fn(params, opt_state))
            best = min(best, time.time() - t0)
        return best

    t1 = timed(1)
    tk = timed(1 + ITERS)
    return (tk - t1) / ITERS * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=int, default=None)
    args = ap.parse_args()

    jax, chain, params, opt_state = build()
    print(f"device: {jax.devices()[0]}  micro={MICRO} latent={LATENT}",
          flush=True)

    rows = []
    sel = CONFIGS if args.only is None else [CONFIGS[args.only]]
    for name, opts in sel:
        try:
            ms = measure(jax, chain, params, opt_state, opts)
            rows.append((name, opts, f"{ms:.2f}"))
            print(f"{name:14s} {ms:8.2f} ms   {json.dumps(opts)}",
                  flush=True)
        except Exception as e:
            err = str(e).replace("\n", " ")[:140]
            rows.append((name, opts, f"ERROR: {err}"))
            print(f"{name:14s}    ERROR   {err}", flush=True)

    print("\n| config | compiler_options | micro-step |")
    print("|---|---|---|")
    for name, opts, ms in rows:
        print(f"| {name} | `{json.dumps(opts) if opts else '(default)'}` "
              f"| {ms} |")


if __name__ == "__main__":
    main()
