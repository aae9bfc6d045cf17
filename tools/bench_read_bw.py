#!/usr/bin/env python
"""Disambiguate the ~330 GB/s reduce plateau (BASELINE.md r3 cont.).

H1: read streams cap at ~330 GB/s on this part (elementwise rw 326+326
    is then symmetric saturation) -> reductions are at speed-of-light.
H2: total HBM bw is ~650+ and read-only ops should reach it; the reduce
    HLO is structurally limited -> an MXU dot-based reduction (ones-dot
    reads the activation as a matmul operand) could double the stats rate.

Probes at (128,128,128,64) bf16 (268 MB):
  add2      z = x + y            (3 streams: 2R + 1W)
  copy      y = x * 1.000001     (2 streams: 1R + 1W)
  reduce    s = sum(x, (1,2))    (1R, the measured 322 GB/s baseline)
  onesdot   s1 = ones @ X        (1R through the MXU; X = [B, M, 128])
  gramdiag  diag(X^T X) per B    (1R, sumsq via MXU gram, 128x spare MACs)
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPE = (128, 128, 128, 64)
GB = SHAPE[0] * SHAPE[1] * SHAPE[2] * SHAPE[3] * 2 / 1e9


def measure(make_fn, xs, iters=200):
    def body(c, _):
        out = make_fn(*c)
        bump = (jnp.sum(out[0]) if isinstance(out, tuple)
                else jnp.sum(out)).astype(xs[0].dtype) * 1e-9
        return tuple(x + bump for x in c), None

    res = {}
    for k in (1, 1 + iters):
        fn = jax.jit(lambda *v: jnp.sum(
            lax.scan(body, v, None, length=k)[0][0].astype(jnp.float32)))
        float(fn(*xs))
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            float(fn(*xs))
            best = min(best, time.time() - t0)
        res[k] = best
    return (res[1 + iters] - res[1]) / iters


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    b, h, w, c = SHAPE
    m = h * w * c // 128
    x = jax.random.normal(jax.random.PRNGKey(0), SHAPE, jnp.bfloat16)
    y = jax.random.normal(jax.random.PRNGKey(1), SHAPE, jnp.bfloat16)
    ones = jnp.ones((m,), jnp.bfloat16)

    t = measure(lambda a, bb: a + bb, (x, y))
    print(f"add2     {t*1e3:8.3f} ms  {3*GB/t:6.0f} GB/s total "
          f"({2*GB/t:.0f} read)", flush=True)
    t = measure(lambda a: a * 1.000001, (x,))
    print(f"copy     {t*1e3:8.3f} ms  {2*GB/t:6.0f} GB/s total "
          f"({GB/t:.0f} read)", flush=True)
    t = measure(lambda a: jnp.sum(a.astype(jnp.float32), axis=(1, 2)), (x,))
    print(f"reduce   {t*1e3:8.3f} ms  {GB/t:6.0f} GB/s read", flush=True)
    t = measure(lambda a: jnp.einsum(
        "m,bml->bl", ones, a.reshape(b, m, 128),
        preferred_element_type=jnp.float32), (x,))
    print(f"onesdot  {t*1e3:8.3f} ms  {GB/t:6.0f} GB/s read", flush=True)
    t = measure(lambda a: jnp.einsum(
        "bmk,bml->bkl", a.reshape(b, m, 128), a.reshape(b, m, 128),
        preferred_element_type=jnp.float32), (x,))
    print(f"gram     {t*1e3:8.3f} ms  {GB/t:6.0f} GB/s read "
          f"(if operands share one fetch)", flush=True)


if __name__ == "__main__":
    main()
