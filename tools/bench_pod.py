#!/usr/bin/env python
"""v5e-8 pod-level hybrid-step projection (VERDICT r2 item 2).

Only ONE physical chip is reachable here, so the pod number is built from
three measured ingredients, the way BASELINE.md's other relay-limited
numbers are:

  1. per-chip-equivalent step times measured on the real chip at the exact
     shard shapes each mesh assigns to a chip (scan-slope method):
       mesh (8,1) "DP":     full 4-expert model, per-chip batch = global/8
       mesh (4,2) "DP x EP": 2-of-4 experts per chip (the teacher's expert
                            axis shards over 'model', halving the dominant
                            attention cost), per-chip batch = global/4
  2. an analytic ICI collective budget (all-reduce of the f32 grads over
     the data axis + the tiny EP activation psums), reported explicitly
     and added to the derived step time;
  3. functional validation that the sharded program compiles and runs on
     an 8-virtual-device mesh (the driver's dryrun_multichip artifact +
     tests/test_sharding.py — DP == single-device numerics).

Both strong scaling (reference global batch 8 held fixed) and weak scaling
(per-chip work held at the single-chip operating point, global 64) are
reported. Writes JSON lines; BASELINE.md records the table.

Usage: python tools/bench_pod.py [--iters 3]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

# v5e ICI: ~45 GB/s effective bidirectional per link-pair on a ring axis
# (jax-ml.github.io/scaling-book). Ring all-reduce moves 2*(n-1)/n * bytes.
ICI_BW = 45e9


def log(m):
    print(m, file=sys.stderr, flush=True)


def slope(make_fn, k_small, k_big, reps=2):
    times = []
    for k in (k_small, k_big):
        fn = make_fn(k)
        t0 = time.time()
        fn()
        log(f"    k={k}: compile+first {time.time()-t0:.1f}s")
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        times.append(best)
    return (times[1] - times[0]) / (k_big - k_small)


def hybrid_step_time(batch, num_experts, iters):
    """Hybrid step at 128px reference defaults with `num_experts` experts
    and micro-batch `batch` — the per-chip shard workload."""
    from lunaris_orion_tpu.config import TrainConfig
    from lunaris_orion_tpu.train.state import create_state
    from lunaris_orion_tpu.train.step import make_train_step

    cfg = TrainConfig(batch_size=batch, gradient_accumulation_steps=1,
                      mixed_precision=True, num_experts=num_experts)
    state = create_state(jax.random.PRNGKey(0), cfg)
    step = make_train_step(cfg, remat=False)
    imgs = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (1, batch, 128, 128, 3), dtype=np.uint8))

    def make(kk):
        @jax.jit
        def run(state):
            def body(s, i):
                s2, m = step(s, imgs)
                return s2, m["total_loss"]
            _, losses = jax.lax.scan(body, state, jnp.arange(kk))
            return losses[-1]
        return lambda: float(run(state))

    return slope(make, 1, 1 + iters)


def grad_bytes(num_experts):
    """f32 gradient bytes: (vae + teacher) params at reference defaults."""
    from lunaris_orion_tpu.config import TrainConfig
    from lunaris_orion_tpu.models import teacher as teacher_mod
    from lunaris_orion_tpu.models import vae as vae_mod

    cfg = TrainConfig(num_experts=num_experts)
    vp = vae_mod.init(jax.random.PRNGKey(0), cfg.vae_config())
    tp, _ = teacher_mod.init(jax.random.PRNGKey(1), cfg.teacher_config())
    nv = vae_mod.param_count(vp)
    nt = teacher_mod.param_count(tp)
    return 4 * (nv + nt), nv, nt


def allreduce_s(bytes_, n):
    return 2 * (n - 1) / n * bytes_ / ICI_BW


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()
    try:
        cache = Path.home() / ".cache" / "lunaris_jax_cache"
        cache.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    log(f"device: {jax.devices()[0]}")

    gb4, nv, nt4 = grad_bytes(4)
    gb2, _, nt2 = grad_bytes(2)
    log(f"grad bytes: e4 {gb4/2**20:.0f} MiB (vae {nv/1e6:.1f}M params, "
        f"teacher {nt4/1e6:.1f}M) | e2 {gb2/2**20:.0f} MiB")

    shards = [
        # (label, mesh, per-chip batch, experts/chip, global batch)
        ("dp8_strong", "(8,1)", 1, 4, 8),
        ("dp8_weak", "(8,1)", 8, 4, 64),
        ("ep42_strong", "(4,2)", 2, 2, 8),
        ("ep42_weak", "(4,2)", 16, 2, 64),
    ]
    results = {}
    for label, mesh, b, e, gbatch in shards:
        log(f"  {label}: mesh {mesh}, per-chip batch {b}, {e} experts/chip")
        dt = hybrid_step_time(b, e, args.iters)
        # collective budget: data-axis all-reduce of all grads (DP) or of
        # shared grads + expert grads on the smaller data axis (EP); EP's
        # activation psums (quality/embedding vectors) are <1 MB -> noise.
        if e == 4:
            t_coll = allreduce_s(gb4, 8)
        else:
            t_coll = allreduce_s(gb2, 4)
        rate = gbatch / (dt + t_coll)
        results[label] = {"mesh": mesh, "per_chip_batch": b,
                          "experts_per_chip": e, "global_batch": gbatch,
                          "chip_step_s": round(dt, 3),
                          "collective_s_est": round(t_coll, 4),
                          "pod_sprites_per_s": round(rate, 2)}
        log(f"  {label}: {dt:.3f} s/chip-step + {t_coll*1e3:.1f} ms coll "
            f"=> {rate:.2f} sprites/s per v5e-8")
        print(json.dumps({"shard": label, **results[label]}), flush=True)

    best = max(results.values(), key=lambda r: r["pod_sprites_per_s"])
    print(json.dumps({"best_pod_config": best}), flush=True)


if __name__ == "__main__":
    main()
