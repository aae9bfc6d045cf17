"""TPU-only validation of the K2 dropout path: dump the in-kernel dropout
mask for a single-tile config, build a dense same-mask reference in pure
JAX, and compare the Pallas kernel's forward output and all four gradients
against it. (CPU interpret mode cannot run pltpu.prng_random_bits, so this
runs on hardware: `python tools/tpu_validate_attention.py`.)

Also re-checks determinism (same seed -> identical output) and mean
preservation under dropout, and that the vmapped (stacked-expert) call path
keeps forward/backward masks consistent.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lunaris_orion_tpu.ops.pallas import flash_attention as fa

RATE = 0.2
SEED = jnp.int32(13)
B, H, N, D = 1, 1, 256, 8
fa.BLOCK_Q = 256
fa.BLOCK_K = 256


def mask_kernel(seed_ref, o_ref):
    pltpu.prng_seed(fa._tile_seed(seed_ref[0, 0, 0], 0, 0))
    o_ref[0] = fa._dropout_mask((N, N), 1.0 - RATE)


def dump_mask():
    return pl.pallas_call(
        mask_kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec((1, 1, 128), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, N, N), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, N, N), jnp.float32),
    )(fa._row_seeds(SEED, 1))[0]  # [bk, bq]: kernel masks index [k, q]


def main():
    mask = dump_mask()
    print("mask keep rate:", float(jnp.mean(mask > 0)))

    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (B, H, N, D))
    k = jax.random.normal(ks[1], (B, H, N, D))
    v = jax.random.normal(ks[2], (B, H, N, D))
    bias = jnp.zeros((H, N), jnp.float32)
    tgt = jax.random.normal(jax.random.PRNGKey(9), (B, H, N, D))
    dmat = mask.T  # [q, k]

    def dense(q, k, v, bias):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (D ** -0.5) \
            + bias[None, :, None, :]
        p = jax.nn.softmax(s, -1)
        return jnp.einsum("bhqk,bhkd->bhqd", p * dmat[None, None], v)

    def loss_dense(q, k, v, bias):
        return jnp.sum((dense(q, k, v, bias) - tgt) ** 2)

    def loss_pallas(q, k, v, bias):
        o = fa.attention_bhnd(q, k, v, bias, dropout_rate=RATE, seed=SEED)
        return jnp.sum((o - tgt) ** 2)

    o_d = dense(q, k, v, bias)
    o_p = fa.attention_bhnd(q, k, v, bias, dropout_rate=RATE, seed=SEED)
    print("fwd max|diff| pallas vs dense-same-mask:",
          float(jnp.max(jnp.abs(o_d - o_p))))

    gd = jax.grad(loss_dense, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(q, k, v, bias)
    ok = True
    for name, a, b in zip("qkvb", gp, gd):
        diff = float(jnp.max(jnp.abs(a - b)))
        scale = float(jnp.max(jnp.abs(b)))
        print(f"d{name}: max|diff| {diff:.6f} (scale {scale:.3f})")
        ok &= diff < 0.02 * max(scale, 1.0)

    # determinism + vmap consistency (expert-stacked path)
    o1 = fa.attention_bhnd(q, k, v, bias, dropout_rate=RATE, seed=SEED)
    o2 = fa.attention_bhnd(q, k, v, bias, dropout_rate=RATE, seed=SEED)
    print("same-seed deterministic:", bool(jnp.all(o1 == o2)))

    qe = jnp.stack([q, q + 0.1])
    ke, ve = jnp.stack([k, k]), jnp.stack([v, v])
    be = jnp.stack([bias, bias])
    se = jnp.stack([SEED, SEED + 1])

    def one(q, k, v, b, s):
        return jnp.sum((fa.attention_bhnd(q, k, v, b, dropout_rate=RATE,
                                          seed=s) - tgt) ** 2)

    gv = jax.grad(lambda qe: jnp.sum(jax.vmap(one)(qe, ke, ve, be, se)))(qe)
    # expert 0 uses SEED -> must equal the unvmapped dq
    dq_ref = gp[0]
    diff = float(jnp.max(jnp.abs(gv[0] - dq_ref)))
    print(f"vmap expert-0 dq vs unvmapped dq: max|diff| {diff:.6f}")
    ok &= diff < 1e-5
    print("RESULT:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
