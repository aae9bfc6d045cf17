"""LunarisCoreVAE — convolutional VAE with U-Net-style additive skips.

TPU-native re-design of the reference model (lunar_generate.py:84-291):
  * NHWC activations / HWIO weights (XLA's native TPU conv layouts; the
    reference is NCHW torch),
  * transposed convs realized as input-dilated convs (MXU-friendly),
  * the whole forward is jit-compiled as one XLA program; GroupNorm+Mish
    epilogues fuse into the surrounding convs (Pallas variants in ops/pallas).

Architecture parity (defaults): 4 stride-2 down blocks 128->64->32->16->8 px,
channels 3->64->128->256->512 each Conv->GN(8)->Mish->ResBlock
(lunar_generate.py:93-120); fc_mu/fc_logvar from the flattened 512*8*8
bottleneck (:124-125); decoder fc + 4 up blocks with additive skips captured
after down1/2/3 (:139-147, :211-224); final 3x3 conv -> tanh (:192,227-228).
`sample()` decodes N(0,I) latents with no skips (:278-291).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from lunaris_orion_tpu.config import VAEConfig
from lunaris_orion_tpu.ops import layers
from lunaris_orion_tpu.ops.activations import mish

Params = Dict


# ---------------------------------------------------------------------------
# ResBlock (reference lunar_generate.py:28-53)
# ---------------------------------------------------------------------------

def resblock_init(key, in_ch: int, out_ch: int) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "conv1": layers.conv2d_init(k1, in_ch, out_ch, 3),
        "gn1": layers.group_norm_init(out_ch),
        "conv2": layers.conv2d_init(k2, out_ch, out_ch, 3),
        "gn2": layers.group_norm_init(out_ch),
    }
    if in_ch != out_ch:
        p["shortcut"] = layers.conv2d_init(k3, in_ch, out_ch, 1)
    return p


def resblock(p: Params, x: jax.Array, *, groups: int = 8) -> jax.Array:
    identity = layers.conv2d(p["shortcut"], x) if "shortcut" in p else x
    out = layers.group_norm_mish(p["gn1"], layers.conv2d(p["conv1"], x), groups=groups)
    out = layers.group_norm_mish(p["gn2"], layers.conv2d(p["conv2"], out), groups=groups)
    return mish(out + identity)


# ---------------------------------------------------------------------------
# Encoder / Decoder
# ---------------------------------------------------------------------------

def encoder_init(key, cfg: VAEConfig) -> Params:
    chans = cfg.channels
    keys = jax.random.split(key, cfg.num_down + 2)
    p: Params = {}
    in_ch = 3
    for i, ch in enumerate(chans):
        kd, kr = jax.random.split(keys[i])
        p[f"down{i}"] = {
            "conv": layers.conv2d_init(kd, in_ch, ch, 3),
            "gn": layers.group_norm_init(ch),
            "res": resblock_init(kr, ch, ch),
        }
        in_ch = ch
    p["fc_mu"] = layers.linear_init(keys[-2], cfg.bottleneck_dim, cfg.latent_dim)
    p["fc_logvar"] = layers.linear_init(keys[-1], cfg.bottleneck_dim, cfg.latent_dim)
    return p


def encode(p: Params, x: jax.Array, cfg: VAEConfig
           ) -> Tuple[jax.Array, jax.Array, List[jax.Array]]:
    """x: [B, H, W, 3] in [-1, 1] -> (mu, logvar, skips).

    Skips captured after every down block except the last
    (lunar_generate.py:139-147).
    """
    g = cfg.gn_groups
    skips: List[jax.Array] = []
    for i in range(cfg.num_down):
        blk = p[f"down{i}"]
        x = layers.conv2d(blk["conv"], x, stride=2)
        x = layers.group_norm_mish(blk["gn"], x, groups=g)
        x = resblock(blk["res"], x, groups=g)
        if i < cfg.num_down - 1:
            skips.append(x)
    flat = x.reshape(x.shape[0], -1)
    mu = layers.linear(p["fc_mu"], flat)
    logvar = layers.linear(p["fc_logvar"], flat)
    return mu, logvar, skips


def decoder_init(key, cfg: VAEConfig) -> Params:
    chans = cfg.channels
    n = cfg.num_down
    keys = jax.random.split(key, n + 2)
    p: Params = {"fc": layers.linear_init(keys[0], cfg.latent_dim, cfg.bottleneck_dim)}
    out_head = max(cfg.base_channels // 2, cfg.gn_groups)
    for i in range(n):
        in_ch = chans[n - 1 - i]
        out_ch = chans[n - 2 - i] if i < n - 1 else out_head
        p[f"up{i}"] = {
            "conv": layers.conv2d_transpose_init(keys[i + 1], in_ch, out_ch, 4),
            "gn": layers.group_norm_init(out_ch),
        }
    p["final"] = layers.conv2d_init(keys[-1], out_head, 3, 3)
    return p


def decode(p: Params, z: jax.Array, skips: Sequence[jax.Array],
           cfg: VAEConfig) -> jax.Array:
    """z: [B, latent] (+ optional encoder skips) -> [B, H, W, 3] in [-1, 1].

    Additive skip fusion after up1..up{n-1} guarded by len(skips), so
    skip-free prior sampling works (lunar_generate.py:211-224, 288-291).
    """
    g = cfg.gn_groups
    n = cfg.num_down
    hw = cfg.bottleneck_hw
    x = layers.linear(p["fc"], z)
    x = x.reshape(x.shape[0], hw, hw, cfg.channels[-1])
    for i in range(n):
        blk = p[f"up{i}"]
        x = layers.conv2d_transpose(blk["conv"], x)
        x = layers.group_norm_mish(blk["gn"], x, groups=g)
        skip_idx = n - 2 - i
        if 0 <= skip_idx < len(skips):
            x = x + skips[skip_idx]
    x = layers.conv2d(p["final"], x)
    return jnp.tanh(x)


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------

def init(key, cfg: VAEConfig) -> Params:
    ke, kd = jax.random.split(key)
    return {"encoder": encoder_init(ke, cfg), "decoder": decoder_init(kd, cfg)}


def reparameterize(rng, mu: jax.Array, logvar: jax.Array) -> jax.Array:
    """z = mu + eps * exp(0.5*logvar) (lunar_generate.py:248-261). The eps
    draw stays in f32 even under bf16 compute."""
    std = jnp.exp(0.5 * logvar.astype(jnp.float32))
    eps = jax.random.normal(rng, mu.shape, jnp.float32)
    return (mu.astype(jnp.float32) + eps * std).astype(mu.dtype)


def apply(p: Params, x: jax.Array, *, rng: Optional[jax.Array],
          cfg: VAEConfig, sample_posterior: bool = True
          ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Forward: (recon, mu, logvar) (lunar_generate.py:263-276)."""
    mu, logvar, skips = encode(p["encoder"], x, cfg)
    z = reparameterize(rng, mu, logvar) if sample_posterior else mu
    recon = decode(p["decoder"], z, skips, cfg)
    return recon, mu, logvar


def sample(p: Params, rng, num_samples: int, cfg: VAEConfig,
           *, temperature: float = 1.0, dtype=jnp.float32) -> jax.Array:
    """Decode N(0, I)*temperature latents with no skips
    (lunar_generate.py:278-291; temperature from simple_generation.py:99-108)."""
    z = jax.random.normal(rng, (num_samples, cfg.latent_dim), dtype) * temperature
    return decode(p["decoder"], z, [], cfg)


def param_count(p: Params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(p))
