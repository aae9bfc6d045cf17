"""K4 — device-side pixelate / palette-quantize (jittable).

The reference's pixelation post-process is host-side PIL
(generate.py:619-637): LANCZOS downscale by pixel_size -> 64-color
median-cut quantize -> NEAREST upscale. This is the on-device equivalent for
TPU pipelines (batch-vectorized, MXU-friendly):
  * LANCZOS-3 downscale as a separable strided convolution,
  * per-image palette via k-means (Lloyd iterations as one-hot matmuls —
    median-cut is inherently host-sequential; k-means is the jittable
    equivalent and produces comparable 64-color palettes),
  * NEAREST upscale as repeat.
The host PIL path in data/synthesis.py remains the byte-exact parity path
for dataset generation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _lanczos_kernel(scale: int, a: int = 3) -> np.ndarray:
    """1-D Lanczos-a resampling filter for integer downscale factor."""
    support = a * scale
    x = (np.arange(2 * support) - support + 0.5) / scale
    k = np.sinc(x) * np.sinc(x / a)
    return (k / k.sum()).astype(np.float32)


def lanczos_downscale(images: jax.Array, factor: int) -> jax.Array:
    """[B, H, W, C] float -> [B, H/f, W/f, C] via separable Lanczos-3."""
    k = jnp.asarray(_lanczos_kernel(factor))
    t = len(k)
    pad = (t - factor) // 2
    c = images.shape[-1]
    x = images.astype(jnp.float32)
    # edge-replicate padding (PIL renormalizes in-bounds taps; clamp is the
    # standard device-side equivalent — zero pad would darken borders)
    x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
    # depthwise separable: vertical then horizontal strided conv
    kv = jnp.zeros((t, 1, 1, c), jnp.float32) + k[:, None, None, None]
    x = lax.conv_general_dilated(
        x, kv, window_strides=(factor, 1), padding=((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    kh2 = jnp.zeros((1, t, 1, c), jnp.float32) + k[None, :, None, None]
    x = lax.conv_general_dilated(
        x, kh2, window_strides=(1, factor), padding=((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    return x


def kmeans_palette(pixels: jax.Array, num_colors: int = 64,
                   iters: int = 8) -> jax.Array:
    """pixels: [P, 3] float -> palette [num_colors, 3] via Lloyd iterations.
    Deterministic strided init (quantile-spread over a luminance sort)."""
    p = pixels.astype(jnp.float32)
    n = p.shape[0]
    luma = p @ jnp.asarray([0.299, 0.587, 0.114])
    order = jnp.argsort(luma)
    idx = (jnp.arange(num_colors) * (n - 1)) // max(num_colors - 1, 1)
    centroids = p[order[idx]]

    def step(centroids, _):
        d = (jnp.sum(p * p, -1, keepdims=True)
             - 2.0 * p @ centroids.T
             + jnp.sum(centroids * centroids, -1)[None, :])  # [P, K]
        assign = jax.nn.one_hot(jnp.argmin(d, -1), num_colors,
                                dtype=jnp.float32)            # [P, K]
        counts = jnp.sum(assign, 0)[:, None]
        sums = assign.T @ p
        new = jnp.where(counts > 0, sums / jnp.maximum(counts, 1), centroids)
        return new, None

    centroids, _ = lax.scan(step, centroids, None, length=iters)
    return centroids


def quantize_to_palette(pixels: jax.Array, palette: jax.Array) -> jax.Array:
    """Nearest-palette-color replacement. pixels [P,3], palette [K,3]."""
    d = (jnp.sum(pixels * pixels, -1, keepdims=True)
         - 2.0 * pixels @ palette.T
         + jnp.sum(palette * palette, -1)[None, :])
    return palette[jnp.argmin(d, -1)]


@functools.partial(jax.jit, static_argnames=("pixel_size", "num_colors"))
def pixelate_device(images: jax.Array, *, pixel_size: int = 8,
                    num_colors: int = 64) -> jax.Array:
    """uint8/float [B, H, W, 3] -> pixelated uint8 [B, H, W, 3] on device."""
    x = images.astype(jnp.float32)
    if images.dtype == jnp.uint8:
        pass  # already 0..255 scale
    small = lanczos_downscale(x, pixel_size)          # [B, h, w, 3]
    b, h, w, _ = small.shape

    def per_image(img):
        px = img.reshape(-1, 3)
        pal = kmeans_palette(px, num_colors)
        return quantize_to_palette(px, pal).reshape(h, w, 3)

    q = jax.vmap(per_image)(small)
    up = jnp.repeat(jnp.repeat(q, pixel_size, 1), pixel_size, 2)
    return jnp.clip(jnp.round(up), 0, 255).astype(jnp.uint8)
