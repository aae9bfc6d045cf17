#!/usr/bin/env python
"""Decompose the 128px VAE step cost to direct the r3 kernel work.

Micro-slope benchmarks (scan-slope method, see bench.py) answering:

  1. convT efficiency: does XLA's input-dilated lowering of
     ConvTranspose(4,2,1) waste runtime FLOPs on the zero positions?
     Times each decoder convT stage against (a) a regular conv3x3 with
     comparable *useful* MACs and (b) the phase-decomposed XLA form
     (k2 conv to 4*Cout + depth_to_space).
  2. GroupNorm cost: full-step A/B of the lane-splitting-reshape GN vs the
     per-channel-moments GN (set via LUNARIS_GN_IMPL).
  3. encoder vs decoder forward split.

Usage: python tools/bench_vae_parts.py [--iters 60] [--batch 128] [--part all]
"""

import argparse
import functools
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


def slope_time(step_fn, carry, iters, reps=3):
    def chain(k):
        fn = jax.jit(lambda c: lax.scan(step_fn, c, jnp.arange(k))[0])
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


# ---------------------------------------------------------------------------
# 1. convT stage variants
# ---------------------------------------------------------------------------

DIMNUMS = ("NHWC", "HWIO", "NHWC")


def convt_variants(batch, iters):
    """Each decoder stage (cin -> cout, h -> 2h) three ways, fwd and
    fwd+bwd. 'useful' GFLOP is the 4-taps-per-output count."""
    stages = [(512, 256, 8), (256, 128, 16), (128, 64, 32), (64, 32, 64)]
    key = jax.random.PRNGKey(0)
    out = {}
    for cin, cout, h in stages:
        x = jax.random.normal(key, (batch, h, h, cin), jnp.bfloat16)
        w4 = jax.random.normal(key, (4, 4, cin, cout), jnp.bfloat16) * 0.05
        # phase-decomposed weights: k2 conv producing 4*cout channels
        w2 = jax.random.normal(key, (2, 2, cin, 4 * cout), jnp.bfloat16) * 0.05
        # useful-MAC-matched plain conv: k3 on the OUTPUT grid cout->cout
        # (2h)^2*cout*cout*9 vs useful (2h)^2*cout*cin*4 = same when cin=2cout
        # and 9 ~ 8; close enough for an efficiency ratio.
        y_ref = jax.random.normal(key, (batch, 2 * h, 2 * h, cout), jnp.bfloat16)
        w3 = jax.random.normal(key, (3, 3, cout, cout), jnp.bfloat16) * 0.05

        def convt(xx, w):
            return lax.conv_general_dilated(
                xx, w, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
                dimension_numbers=DIMNUMS)

        def phase(xx, w):
            b, hh, ww, _ = xx.shape
            y = lax.conv_general_dilated(
                xx, w, (1, 1), ((1, 0), (1, 0)), dimension_numbers=DIMNUMS)
            # y: [b, h, w, 4*cout] -> interleave to [b, 2h, 2w, cout]
            y = y.reshape(b, hh, ww, 2, 2, cout)
            y = y.transpose(0, 1, 3, 2, 4, 5)
            return y.reshape(b, 2 * hh, 2 * ww, cout)

        def conv3(yy, w):
            return lax.conv_general_dilated(
                yy, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=DIMNUMS)

        useful_gflop = 2 * (2 * h) ** 2 * cout * cin * 4 * batch / 1e9
        conv3_gflop = 2 * (2 * h) ** 2 * cout * cout * 9 * batch / 1e9

        res = {}
        for name, f, w, inp, gf in (
                ("convT", convt, w4, x, useful_gflop),
                ("phase", phase, w2, x, useful_gflop),
                ("conv3", conv3, w3, y_ref, conv3_gflop)):
            def fwd_step(c, i, f=f, w=w, inp=inp):
                acc, = c
                y = f(inp + (i * 1e-6).astype(inp.dtype), w)
                return (acc + jnp.mean(y.astype(jnp.float32)),), 0.0

            def fb_step(c, i, f=f, w=w, inp=inp):
                acc, = c

                def loss(w):
                    y = f(inp + (i * 1e-6).astype(inp.dtype), w)
                    return jnp.mean(jnp.square(y.astype(jnp.float32)))

                l, g = jax.value_and_grad(loss)(w)
                return (acc + l + jnp.mean(g.astype(jnp.float32)),), 0.0

            tf = slope_time(fwd_step, (jnp.zeros(()),), iters)
            tb = slope_time(fb_step, (jnp.zeros(()),), iters)
            res[name] = {"fwd_ms": round(tf * 1e3, 3),
                         "fwdbwd_ms": round(tb * 1e3, 3),
                         "fwd_tflops_useful": round(gf / tf / 1e3, 1),
                         "fwdbwd_tflops_useful": round(3 * gf / tb / 1e3, 1)}
            log(f"  {cin}->{cout}@{h}: {name} fwd {tf*1e3:.3f} ms "
                f"({gf/tf/1e3:.1f} TF/s useful) fwd+bwd {tb*1e3:.3f} ms")
        out[f"{cin}->{cout}@{h}"] = res
        print(json.dumps({"stage": f"{cin}->{cout}@{h}", **res}), flush=True)
    return out


# ---------------------------------------------------------------------------
# 2. GN A/B inside the full step — relies on LUNARIS_GN_IMPL env switch
# ---------------------------------------------------------------------------

def full_step_time(batch, latent, iters):
    from lunaris_orion_tpu.config import TrainConfig, VAEConfig
    from lunaris_orion_tpu.models import vae as vae_mod
    from lunaris_orion_tpu.train import losses as losses_mod
    from lunaris_orion_tpu.train.state import make_optimizers

    vcfg = VAEConfig(latent_dim=latent)
    cfg = TrainConfig(latent_dim=latent, mixed_precision=True)
    vae_tx, _ = make_optimizers(cfg)
    key = jax.random.PRNGKey(0)
    params = vae_mod.init(key, vcfg)
    opt_state = vae_tx.init(params)
    x = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (batch, 128, 128, 3), dtype=np.uint8))

    def one_step(carry, i):
        params, opt_state = carry
        xx = x.astype(jnp.bfloat16) / 127.5 - 1.0
        rng = jax.random.fold_in(key, i)

        def loss_fn(p):
            recon, mu, logvar = vae_mod.apply(p, xx, rng=rng, cfg=vcfg)
            rl, kl = losses_mod.recon_kl(recon, xx, mu, logvar)
            return cfg.recon_weight * rl + cfg.kl_weight * kl

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = vae_tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u.astype(p.dtype), params, updates)
        return (params, opt_state), loss

    return slope_time(lambda c, i: one_step(c, i), (params, opt_state), iters)


# ---------------------------------------------------------------------------
# 3. encoder / decoder forward split
# ---------------------------------------------------------------------------

def enc_dec_split(batch, latent, iters):
    from lunaris_orion_tpu.config import VAEConfig
    from lunaris_orion_tpu.models import vae as vae_mod

    vcfg = VAEConfig(latent_dim=latent)
    key = jax.random.PRNGKey(0)
    params = vae_mod.init(key, vcfg)
    x = jax.random.normal(key, (batch, 128, 128, 3), jnp.bfloat16)
    mu, logvar, skips = vae_mod.encode(params["encoder"], x, vcfg)
    z = mu

    def enc_step(c, i):
        acc, = c
        m, lv, sk = vae_mod.encode(
            params["encoder"], x + (i * 1e-6).astype(x.dtype), vcfg)
        return (acc + jnp.mean(m.astype(jnp.float32)),), 0.0

    def dec_step(c, i):
        acc, = c
        r = vae_mod.decode(params["decoder"],
                           z + (i * 1e-6).astype(z.dtype), skips, vcfg)
        return (acc + jnp.mean(r.astype(jnp.float32)),), 0.0

    te = slope_time(enc_step, (jnp.zeros(()),), iters)
    td = slope_time(dec_step, (jnp.zeros(()),), iters)
    log(f"  encoder fwd {te*1e3:.3f} ms | decoder fwd {td*1e3:.3f} ms")
    print(json.dumps({"encoder_fwd_ms": round(te * 1e3, 3),
                      "decoder_fwd_ms": round(td * 1e3, 3)}), flush=True)


# ---------------------------------------------------------------------------
# 4. identity ablations: what do GN / Mish cost inside the full step?
# ---------------------------------------------------------------------------

def elementwise_ablation(batch, latent, iters):
    """Full-step slope with GN and/or Mish replaced by identity (semantics
    change — measurement only). The deltas are the fused elementwise+stat
    budget a Pallas custom-VJP kernel could attack."""
    from lunaris_orion_tpu.models import vae as vae_mod
    from lunaris_orion_tpu.ops import layers, activations

    orig_gnm = layers.group_norm_mish
    orig_mish_act = activations.mish
    orig_mish_vae = vae_mod.mish

    def set_impl(gn=True, mish_on=True):
        if gn and mish_on:
            layers.group_norm_mish = orig_gnm
        elif not gn and mish_on:
            layers.group_norm_mish = (
                lambda p, x, **kw: orig_mish_act(x))
        elif gn and not mish_on:
            layers.group_norm_mish = (
                lambda p, x, groups=8, eps=1e-5: layers.group_norm(
                    p, x, groups=groups, eps=eps))
        else:
            layers.group_norm_mish = lambda p, x, **kw: x
        f = orig_mish_act if mish_on else (lambda x: x)
        activations.mish = f
        vae_mod.mish = f

    out = {}
    try:
        for name, gn, mish_on in (("base", True, True),
                                  ("no_mish", True, False),
                                  ("no_gn", False, True),
                                  ("neither", False, False)):
            set_impl(gn, mish_on)
            dt = full_step_time(batch, latent, iters)
            out[name] = round(dt * 1e3, 3)
            log(f"  {name}: {dt*1e3:.2f} ms")
            print(json.dumps({"ablation": name, "full_step_ms": out[name]}),
                  flush=True)
    finally:
        layers.group_norm_mish = orig_gnm
        activations.mish = orig_mish_act
        vae_mod.mish = orig_mish_vae
    return out


_SWEEP_KNOBS = ("LUNARIS_GN_IMPL", "LUNARIS_MISH_IMPL",
                "LUNARIS_CONVT_IMPL", "LUNARIS_GNMISH_IMPL",
                "LUNARIS_CONVT_VJP", "LUNARIS_GN_BARRIER")


def impl_sweep(batch, latent, iters, configs):
    """Same-process sweep over (gn, mish, convt) impl combos — cancels the
    relay's between-process timing jitter (~+-0.5 ms).

    EVERY knob any config can set is cleared before each row AND after the
    sweep (the clear-set is asserted to cover the configs): a leaked knob
    contaminates every following A/B silently — an earlier version cleared
    only four of the six and measured 'gnmish_fusedvjp' with the previous
    row's LUNARIS_GN_BARRIER=1 still active."""
    import os
    for _, env in configs:
        assert set(env) <= set(_SWEEP_KNOBS), (env, _SWEEP_KNOBS)
    out = {}
    for name, env in configs:
        for k in _SWEEP_KNOBS:
            os.environ.pop(k, None)
        os.environ.update(env)
        dt = full_step_time(batch, latent, iters)
        out[name] = round(dt * 1e3, 3)
        log(f"  {name}: {dt*1e3:.2f} ms")
        print(json.dumps({"sweep": name, "env": env,
                          "full_step_ms": out[name]}), flush=True)
    for k in _SWEEP_KNOBS:
        os.environ.pop(k, None)
    return out


SWEEP_CONFIGS = [
    ("anchor_convt_vjp", {}),
    ("convt_vjp_off", {"LUNARIS_CONVT_VJP": "off"}),
    ("gn_barrier", {"LUNARIS_GN_BARRIER": "1"}),
    ("gnmish_fusedvjp", {"LUNARIS_GNMISH_IMPL": "fusedvjp"}),
    ("gnmish_autodiff", {"LUNARIS_GNMISH_IMPL": "off"}),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--latent", type=int, default=512)
    ap.add_argument("--part", default="all",
                    choices=["all", "convt", "gn", "split", "fullstep",
                             "ablate", "sweep"])
    ap.add_argument("--configs", default=None,
                    help="comma-separated SWEEP_CONFIGS names to run")
    args = ap.parse_args()
    log(f"device: {jax.devices()[0]}")

    if args.part == "sweep":
        cfgs = SWEEP_CONFIGS
        if args.configs:
            names = set(args.configs.split(","))
            cfgs = [c for c in SWEEP_CONFIGS if c[0] in names]
        impl_sweep(args.batch, args.latent, args.iters, cfgs)
        return
    if args.part == "ablate":
        elementwise_ablation(args.batch, args.latent, args.iters)
        return

    if args.part in ("all", "convt"):
        log("— convT stage variants —")
        convt_variants(args.batch, args.iters)
    if args.part in ("all", "split"):
        log("— encoder/decoder forward split —")
        enc_dec_split(args.batch, args.latent, args.iters)
    if args.part in ("all", "gn", "fullstep"):
        import os
        impl = os.environ.get("LUNARIS_GN_IMPL", "(default)")
        log(f"— full step (GN impl {impl}) —")
        dt = full_step_time(args.batch, args.latent, args.iters)
        log(f"  full step: {dt*1e3:.2f} ms ({args.batch/dt:.0f} sprites/s)")
        print(json.dumps({"full_step_ms": round(dt * 1e3, 3),
                          "gn_impl": impl,
                          "sprites_per_sec": round(args.batch / dt, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
