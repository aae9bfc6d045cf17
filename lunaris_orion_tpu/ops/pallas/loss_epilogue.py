"""K3 — fused MSE + KL loss epilogue kernel.

One pass over the reconstruction and the posterior stats producing both
scalars of the VAE loss (train_hybrid.py:858-862):
    recon_loss = mean((recon - x)^2)
    kl_loss    = -0.5 * mean(1 + logvar - mu^2 - exp(logvar))
Selectable from train.losses.recon_kl via ops.dispatch ("mse_kl"); the XLA
composition ships by default because XLA already fuses these reductions into
the surrounding step (in-graph microbenchmark in BASELINE.md /
tools/bench_dispatch.py).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(recon_ref, x_ref, mu_ref, logvar_ref, sse_ref, kl_ref):
    r = recon_ref[0].astype(jnp.float32)
    x = x_ref[0].astype(jnp.float32)
    diff = r - x
    sse = jnp.sum(diff * diff)
    mu = mu_ref[0].astype(jnp.float32)
    lv = logvar_ref[0].astype(jnp.float32)
    kl = jnp.sum(1.0 + lv - mu * mu - jnp.exp(lv))
    sse_ref[0, 0, 0] = sse
    kl_ref[0, 0, 0] = kl


def mse_kl_pallas(recon: jax.Array, x: jax.Array, mu: jax.Array,
                  logvar: jax.Array):
    """recon/x: [B, H, W, C]; mu/logvar: [B, L] -> (recon_loss, kl_loss).

    mu/logvar are carried as [B, 1, L] so per-sample blocks are (1, 1, L):
    Mosaic requires the trailing two block dims to divide (8, 128) or equal
    the array dims — a (1, L) block of a [B, L] array is illegal on TPU
    (caught only in compiled mode; interpret-mode tests missed it in r1)."""
    b, h, w, c = recon.shape
    l = mu.shape[1]
    mu3 = mu.reshape(b, 1, l)
    logvar3 = logvar.reshape(b, 1, l)
    sse, kl = pl.pallas_call(
        _kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, l), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, l), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # per-sample scalars as [B, 1, 1] (trailing-dims rule, see above)
        out_specs=(
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, 1, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, 1), jnp.float32),
        ),
        interpret=jax.default_backend() != "tpu",
    )(recon, x, mu3, logvar3)
    recon_loss = jnp.sum(sse) / (b * h * w * c)
    kl_loss = -0.5 * jnp.sum(kl) / (b * l)
    return recon_loss, kl_loss
