"""Isolated elementwise mish benchmark: reference chain vs rational.

Separates two hypotheses for the full-step rat-mish regression (31.0 vs
20.4 ms, tools/bench_vae_parts.py): (a) the rational evaluation is itself
slower on the VPU, vs (b) it is fast in isolation but degrades XLA's
conv+GN+mish fusions. Answer (r3, v5e): (a) — and more: the REFERENCE
chain is memory-bound (652 GB/s read+write at (128,128,128,64) bf16), so
its exp/log1p/tanh lowerings are free on this hardware, while the
rational's Horner+divide costs real VPU cycles (fwd 1.198 ms, fwd+bwd
3.563 vs 0.829 ms per pass).

Relay note: the chain MUST end in a host fetch (float(sum)) — through the
axon relay, block_until_ready on a device array returns early for light
programs and slope timings read as zero (see memory/axon-tpu-relay-quirks).
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPE = (128, 128, 128, 64)   # the largest GN+mish stage at batch 128
PASS_GB = 2 * 2 * (128 * 128 * 128 * 64) / 1e9       # bf16 read+write


def measure(f, tag, x, iters=500):
    def body(c, _):
        return f(c), None

    res = {}
    for k in (1, 1 + iters):
        fn = jax.jit(lambda v: jnp.sum(
            lax.scan(body, v, None, length=k)[0].astype(jnp.float32)))
        float(fn(x))                       # compile + warm
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            float(fn(x))                   # host fetch forces completion
            best = min(best, time.time() - t0)
        res[k] = best
    dt = (res[1 + iters] - res[1]) / iters
    print(f"{tag}: {dt * 1e3:.3f} ms/iter  ({PASS_GB / dt:.0f} GB/s rw)",
          flush=True)
    return dt


def main():
    from lunaris_orion_tpu.ops import activations as A
    print("device:", jax.devices()[0].device_kind, flush=True)
    x = jax.random.normal(jax.random.PRNGKey(0), SHAPE, jnp.bfloat16)
    for impl in ("ref", "rat"):
        os.environ["LUNARIS_MISH_IMPL"] = impl
        measure(A.mish, f"{impl} fwd", x)
        g = jax.grad(lambda v: jnp.sum(A.mish(v).astype(jnp.float32)))
        measure(lambda v: g(v).astype(jnp.bfloat16) * 0.99,
                f"{impl} fwd+bwd", x)


if __name__ == "__main__":
    main()
