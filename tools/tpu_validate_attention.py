"""TPU-only validation of the K2 dropout path at MULTI-TILE configs where
forward and backward tile the score matrix differently (production blocks:
fwd BLOCK_K=2048 vs bwd BWD_BLOCK_K=1024) — the exact configuration whose
masks desynced in round 1's per-tile-PRNG scheme.

The dropout mask is a stateless hash of absolute (k, q) coordinates
(fa._hash_mask, pure lax ops), so the dense same-mask reference is built
directly on host; forward output and all four gradients are compared against
it at N in {256 (single-tile), 4096 (multi-tile)}. Also re-checks
determinism (same seed -> identical output) and that the vmapped
(stacked-expert) call path keeps forward/backward masks consistent.

Run on hardware: `python tools/tpu_validate_attention.py`.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from lunaris_orion_tpu.ops.pallas import flash_attention as fa

RATE = 0.2
SEED = jnp.int32(13)


def dense_same_mask(q, k, v, bias, seed, rate):
    b, h, n, d = q.shape
    # Scale q BEFORE the matmul exactly like the kernel does
    # (flash_attention_tpu pre-scales once outside the custom_vjp): on TPU,
    # f32 matmuls run at default (bf16-pass) MXU precision on BOTH sides,
    # and scaling after the matmul would bf16-round DIFFERENT q values than
    # the kernel rounds — decorrelating the two sides' rounding error and
    # inflating the comparison by ~2x (measured: 0.78% vs the 0.5% gate at
    # d=8). Same math; correlated rounding.
    s = jnp.einsum("bhqd,bhkd->bhqk", q * (d ** -0.5), k) \
        + bias[None, :, None, :]
    p = jax.nn.softmax(s, -1)
    row_seeds = fa._row_seeds(jnp.asarray(seed, jnp.int32), b * h)[:, 0, 0]
    masks = jnp.stack([
        fa._hash_mask(row_seeds[r], 0, 0, (n, n), 1.0 - rate).T  # -> [q, k]
        for r in range(b * h)]).reshape(b, h, n, n)
    return jnp.einsum("bhqk,bhkd->bhqd", p * masks, v)


def check_config(n, d, label):
    print(f"--- {label}: N={n} d={d} "
          f"(fwd bk={fa._pick_block(n, fa.BLOCK_K)}, "
          f"bwd bk={fa._pick_block(n, fa.BWD_BLOCK_K)}) ---")
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (1, 2, n, d))
    k = jax.random.normal(ks[1], (1, 2, n, d))
    v = jax.random.normal(ks[2], (1, 2, n, d))
    bias = (jax.random.normal(jax.random.PRNGKey(5), (2, n)) * 0.2
            ).astype(jnp.float32)
    tgt = jax.random.normal(jax.random.PRNGKey(9), (1, 2, n, d))

    def loss_dense(q, k, v, bias):
        return jnp.sum((dense_same_mask(q, k, v, bias, SEED, RATE) - tgt) ** 2)

    def loss_pallas(q, k, v, bias):
        o = fa.attention_bhnd(q, k, v, bias, dropout_rate=RATE, seed=SEED)
        return jnp.sum((o - tgt) ** 2)

    o_d = dense_same_mask(q, k, v, bias, SEED, RATE)
    o_p = fa.attention_bhnd(q, k, v, bias, dropout_rate=RATE, seed=SEED)
    fdiff = float(jnp.max(jnp.abs(o_d - o_p)))
    fscale = float(jnp.max(jnp.abs(o_d)))
    print(f"fwd max|diff| pallas vs dense-same-mask: {fdiff:.6f} "
          f"(scale {fscale:.3f})")
    ok = fdiff < 0.005 * max(fscale, 1.0)  # MXU f32 pass precision

    gd = jax.jit(jax.grad(loss_dense, argnums=(0, 1, 2, 3)))(q, k, v, bias)
    gp = jax.jit(jax.grad(loss_pallas, argnums=(0, 1, 2, 3)))(q, k, v, bias)
    for name, a, b in zip("qkvb", gp, gd):
        diff = float(jnp.max(jnp.abs(a - b)))
        scale = float(jnp.max(jnp.abs(b)))
        print(f"d{name}: max|diff| {diff:.6f} (scale {scale:.3f})")
        ok &= diff < 0.02 * max(scale, 1.0)

    o2 = fa.attention_bhnd(q, k, v, bias, dropout_rate=RATE, seed=SEED)
    det = bool(jnp.all(o_p == o2))
    print("same-seed deterministic:", det)
    ok &= det

    # vmap (stacked-expert) path: expert 0 with SEED must reproduce the
    # unvmapped gradient exactly.
    qe = jnp.stack([q, q + 0.1])
    ke, ve = jnp.stack([k, k]), jnp.stack([v, v])
    be = jnp.stack([bias, bias])
    se = jnp.stack([SEED, SEED + 1])

    def one(q, k, v, b, s):
        return jnp.sum((fa.attention_bhnd(q, k, v, b, dropout_rate=RATE,
                                          seed=s) - tgt) ** 2)

    gv = jax.grad(lambda qe: jnp.sum(jax.vmap(one)(qe, ke, ve, be, se)))(qe)
    diff = float(jnp.max(jnp.abs(gv[0] - gp[0])))
    print(f"vmap expert-0 dq vs unvmapped dq: max|diff| {diff:.6f}")
    ok &= diff < 1e-5
    return ok


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=str, default=None,
                    help="comma list of n:d pairs, e.g. 256:8,4096:48")
    args = ap.parse_args()
    configs = [(256, 8, "single-tile"),
               (4096, 16, "multi-tile (fwd/bwd blocks differ)"),
               (4096, 48, "mid-range head_dim (feature 384)"),
               (2048, 64, "high-end head_dim (feature 512)")]
    if args.only:
        pairs = {tuple(map(int, p.split(":"))) for p in args.only.split(",")}
        configs = [c for c in configs if (c[0], c[1]) in pairs]
    ok = True
    for n, d, label in configs:
        ok &= check_config(n, d, label)
    print("RESULT:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
