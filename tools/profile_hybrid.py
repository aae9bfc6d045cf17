#!/usr/bin/env python
"""Per-op device-time breakdown of the FULL hybrid train step (128px
reference defaults, batch 8) — the hybrid analogue of profile_step.py.

Motivation: the hybrid step runs 4.55 s at reference defaults vs an
~3.3 s attention-only floor claimed from isolated kernel measurements —
~1.2 s is unattributed. This traces the real product step
(train.step.make_train_step on a real TrainState) and aggregates HLO op
self-times so the gap is charged to named ops.

Usage: python tools/profile_hybrid.py [--steps 2] [--batch 8] [--window 0]
"""

import argparse
import json
import sys
import tempfile
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from profile_step import aggregate_trace_json  # shared trace aggregation


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--window", type=int, default=0)
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()
    log(f"device: {jax.devices()[0]}")

    from lunaris_orion_tpu.config import TrainConfig
    from lunaris_orion_tpu.train.state import create_state
    from lunaris_orion_tpu.train.step import make_train_step

    cfg = TrainConfig(batch_size=args.batch, gradient_accumulation_steps=1,
                      mixed_precision=True, attn_window=args.window)
    state = create_state(jax.random.PRNGKey(0), cfg)
    step = make_train_step(cfg, remat=False)
    imgs = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (1, args.batch, 128, 128, 3), dtype=np.uint8))

    import functools

    @functools.partial(jax.jit, static_argnums=1)
    def steps_fn(s, k):
        def body(c, i):
            c2, m = step(c, imgs)
            return c2, m["total_loss"]
        s, losses = jax.lax.scan(body, s, jnp.arange(k))
        return losses[-1]

    lowered = steps_fn.lower(state, args.steps)
    compiled = lowered.compile()
    hlo_path = Path(tempfile.gettempdir()) / "lunaris_hybrid_hlo.txt"
    hlo_path.write_text(compiled.as_text())
    log(f"optimized HLO -> {hlo_path}")
    float(compiled(state))
    logdir = tempfile.mkdtemp(prefix="lunaris_hybrid_prof_")
    with jax.profiler.trace(logdir):
        float(compiled(state))
    log(f"trace -> {logdir}")

    agg, cnt = aggregate_trace_json(logdir, args.steps)
    total = sum(agg.values())
    for name, t in sorted(agg.items(), key=lambda kv: -kv[1])[:args.top]:
        print(json.dumps({"op": name, "ms_per_step": round(t / 1e3, 3),
                          "count": cnt[name] // args.steps,
                          "pct": round(100 * t / total, 2)}), flush=True)

    def cat(n):
        base = n.split(".")[0]
        if "custom-call" in base:
            return "custom-call (pallas attention)"
        if "copy" in base:
            return "copy"
        if "convolution" in base:
            return "convolution"
        if "convert" in base and "reduce" in base:
            return "convert_reduce"
        if "fusion" in base:
            return base
        return "other"

    bycat = defaultdict(float)
    for k, v in agg.items():
        bycat[cat(k)] += v
    print(json.dumps({"rollup_ms_per_step": {
        k: round(v / 1e3, 2)
        for k, v in sorted(bycat.items(), key=lambda kv: -kv[1])},
        "device_total_ms_per_step": round(total / 1e3, 2)}))


if __name__ == "__main__":
    main()
