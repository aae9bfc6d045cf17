"""Secondary benchmarks (run manually on a TPU host):
  1) Pallas attention kernel fwd and fwd+bwd at the production shape
     (N=16384, d=16),
  2) the full hybrid train step at 128px reference defaults.

Timing: K invocations chained inside one jitted lax.scan; per-step time is
the slope between K=1 and K=1+ITERS (min of REPS) — robust to the relay's
per-call state shipping and async-dispatch artifacts (see bench.py).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

REPS = 3


def slope(make_fn, k_small: int, k_big: int, reps: int = REPS):
    """make_fn(k) -> zero-arg callable returning a scalar; returns s/step."""
    times = []
    for k in (k_small, k_big):
        fn = make_fn(k)
        fn()  # compile + first
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        times.append(best)
    return (times[1] - times[0]) / (k_big - k_small)


def bench_attention():
    from lunaris_orion_tpu.ops.pallas import flash_attention as fa
    B, H, N, D = 8, 8, 16384, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (B, H, N, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, H, N, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, H, N, D), jnp.bfloat16)
    bias = jax.random.normal(ks[3], (H, N)).astype(jnp.float32)
    flops = 4 * B * H * N * N * D

    def make_fwd(kk):
        @jax.jit
        def run(q):
            def body(c, i):
                o = fa.attention_bhnd(c, k, v, bias)
                return o, jnp.float32(0)
            o, _ = jax.lax.scan(body, q, jnp.arange(kk))
            return jnp.sum(o.astype(jnp.float32))
        return lambda: float(run(q))

    dt = slope(make_fwd, 1, 9)
    print(f"pallas attn fwd (B8 H8 N16384 d16): {dt*1e3:.1f} ms/call = "
          f"{flops/dt/1e12:.1f} TF/s", flush=True)

    def make_bwd(kk, rate=0.0):
        # Grads w.r.t. ALL inputs — what the training step computes. The
        # r2 version differentiated w.r.t. q only, which let XLA
        # dead-code-eliminate the entire dkv kernel from the two-kernel
        # path and produced the spurious "fused backward 9% slower"
        # comparison (BASELINE.md r3 "fused backward, re-measured
        # honestly").
        def loss(q, k, v, bias):
            return jnp.sum(fa.attention_bhnd(q, k, v, bias,
                                             dropout_rate=rate,
                                             seed=jnp.int32(7))
                           .astype(jnp.float32) ** 2)

        @jax.jit
        def run(q, k, v, bias):
            def body(c, i):
                gq, gk, gv, gb = jax.grad(loss, argnums=(0, 1, 2, 3))(*c)
                return (c[0] + 1e-6 * gq.astype(c[0].dtype),
                        c[1] + 1e-6 * gk.astype(c[1].dtype),
                        c[2] + 1e-6 * gv.astype(c[2].dtype),
                        c[3] + 1e-6 * gb.astype(c[3].dtype)), jnp.float32(0)
            cs, _ = jax.lax.scan(body, (q, k, v, bias), jnp.arange(kk))
            return jnp.sum(cs[0].astype(jnp.float32))
        return lambda: float(run(q, k, v, bias))

    dt = slope(make_bwd, 1, 5)
    print(f"pallas attn fwd+bwd (all-input grads): {dt*1e3:.1f} ms/call = "
          f"{3.5*flops/dt/1e12:.1f} TF/s-equiv", flush=True)

    dt = slope(lambda kk: make_bwd(kk, 0.1), 1, 5)
    print(f"pallas attn fwd+bwd dropout=0.1 (hash mask): {dt*1e3:.1f} ms/call",
          flush=True)


def bench_hybrid(fuse: bool = True, attn_window: int = 0, batch: int = 8,
                 latent: int = 256, feature: int = 128, embed: int = 64,
                 remat: bool = False, cached_embed: bool = False):
    """Full hybrid step at 128px. Dim defaults = the reference's CLI
    defaults; --latent/--feature/--embed select the mid-range
    (384/384/192, head_dim 48) or high-end (512/512/256, head_dim 64)
    recipes — the larger recipes may need --remat. remat=False matches
    the static planner's choice at batch 8 / default dims on a 16GB chip
    (BASELINE.md).

    attn_window > 0 measures the --attn_window deviation knob (corrected
    local-window teacher attention, ops/attention.py)."""
    from lunaris_orion_tpu.config import TrainConfig
    from lunaris_orion_tpu.train.state import create_state
    from lunaris_orion_tpu.train.step import make_train_step

    BATCH = batch
    cfg = TrainConfig(batch_size=BATCH, gradient_accumulation_steps=1,
                      mixed_precision=True, fuse_teacher=fuse,
                      attn_window=attn_window, latent_dim=latent,
                      feature_dim=feature, embedding_dim=embed,
                      cached_prompt_embeddings=cached_embed)
    state = create_state(jax.random.PRNGKey(0), cfg)
    step = make_train_step(cfg, remat=remat)
    imgs = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (1, BATCH, 128, 128, 3), dtype=np.uint8))
    embs = (jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, BATCH, embed)), jnp.float32) if cached_embed else None)

    def make(kk):
        @jax.jit
        def run(state):
            def body(s, i):
                s2, m = (step(s, imgs, embs) if cached_embed
                         else step(s, imgs))
                return s2, m["total_loss"]
            s2, losses = jax.lax.scan(body, state, jnp.arange(kk))
            return losses[-1]
        return lambda: float(run(state))

    desc = (f"latent={latent} feature={feature} fuse_teacher={fuse} "
            f"attn_window={attn_window or 'global'} batch={BATCH} "
            f"remat={remat} cached_embed={cached_embed}")
    print(f"compiling hybrid step chains (128px, {desc})...", flush=True)
    dt = slope(make, 1, 4, reps=2)
    print(f"hybrid step ({desc}): "
          f"{dt*1e3:.0f} ms = {BATCH/dt:.2f} sprites/s/chip", flush=True)


if __name__ == "__main__":
    try:
        cache = Path.home() / ".cache" / "lunaris_jax_cache"
        cache.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", choices=["attn", "hybrid"], default=None)
    ap.add_argument("--no-fuse", action="store_true")
    ap.add_argument("--attn_window", type=int, default=0)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--latent", type=int, default=256)
    ap.add_argument("--feature", type=int, default=128)
    ap.add_argument("--embed", type=int, default=64)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--cached_embed", action="store_true",
                    help="price --cached_prompt_embeddings (the reference's "
                         "intended dataset-side embeddings, parity.md #8)")
    a = ap.parse_args()
    if a.only in (None, "attn"):
        bench_attention()
    if a.only in (None, "hybrid"):
        bench_hybrid(fuse=not a.no_fuse, attn_window=a.attn_window,
                     batch=a.batch, latent=a.latent, feature=a.feature,
                     embed=a.embed, remat=a.remat,
                     cached_embed=a.cached_embed)
