#!/usr/bin/env python
"""Isolated GroupNorm statistics pass: XLA convert_reduce vs Pallas.

Motivation (r3 trace, tools/profile_step.py at b128): the 16 standalone
``convert_reduce_fusion`` ops — the GN moment reductions and the GN
backward's (dy, dy*xhat) reductions — cost 4.93 ms/step (23.8%) and run
at only ~270-440 GB/s against the v5e's ~819 GB/s HBM, i.e. the stats
passes burn ~2x their speed-of-light time. This isolates the forward
stats pass per recipe stage and asks whether the Pallas lane-sum kernel
(ops/pallas/gn_mish.py group_stats_pallas) reads closer to peak.

Each pass reads the bf16 activation once (write side is ~KB), so
GB/s = numel*2 / t. Run on the real chip.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the eight GN sites of the 128px recipe at batch 128 (encoder + decoder)
SHAPES = [
    (128, 128, 128, 32),
    (128, 128, 128, 64),
    (128, 64, 64, 64),
    (128, 64, 64, 128),
    (128, 32, 32, 128),
    (128, 32, 32, 256),
    (128, 16, 16, 256),
    (128, 8, 8, 512),
]


def measure(make_fn, x, iters=200):
    def body(c, _):
        # vary the carry so the relay cannot cache identical executions;
        # stats consume the carry, sum of outputs feeds the next carry seed
        out = make_fn(c)
        bump = sum(jnp.sum(o) for o in out).astype(x.dtype)
        return c + bump * 1e-9, None

    res = {}
    for k in (1, 1 + iters):
        fn = jax.jit(lambda v: jnp.sum(
            lax.scan(body, v, None, length=k)[0].astype(jnp.float32)))
        float(fn(x))
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            float(fn(x))
            best = min(best, time.time() - t0)
        res[k] = best
    return (res[1 + iters] - res[1]) / iters


def main():
    from lunaris_orion_tpu.ops.layers import _gn_stats
    from lunaris_orion_tpu.ops.pallas.gn_mish import (group_stats_pallas,
                                                      supported_shape)

    print("device:", jax.devices()[0].device_kind, flush=True)
    print(f"{'shape':>22} {'XLA ms':>8} {'GB/s':>6} {'Pallas ms':>10} "
          f"{'GB/s':>6} {'speedup':>8}")
    tot_x = tot_p = 0.0
    for shape in SHAPES:
        b, h, w, c = shape
        x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.bfloat16)
        read_gb = x.size * 2 / 1e9

        t_xla = measure(
            lambda v: _gn_stats(v.astype(jnp.float32), 8, 1e-5), x)
        if supported_shape(h, w, c):
            t_pal = measure(lambda v: group_stats_pallas(v, groups=8), x)
        else:
            t_pal = float("nan")
        tot_x += t_xla
        tot_p += t_pal if t_pal == t_pal else t_xla
        print(f"{str(shape):>22} {t_xla*1e3:8.3f} {read_gb/t_xla:6.0f} "
              f"{t_pal*1e3:10.3f} {read_gb/t_pal:6.0f} "
              f"{t_xla/t_pal:7.2f}x", flush=True)
    print(f"{'TOTAL (fwd sites)':>22} {tot_x*1e3:8.3f} {'':>6} "
          f"{tot_p*1e3:10.3f}")


if __name__ == "__main__":
    main()
