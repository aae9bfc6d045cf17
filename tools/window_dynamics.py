#!/usr/bin/env python
"""Training dynamics under `--attn_window` vs corrected global attention.

The window knob (docs/parity.md deviation 12) trades teacher attention
scope for compute. This runs the PRODUCT hybrid train step
(train.step.make_train_step) from the SAME init and data stream with
attn_window in {global, W...} and records the loss trajectories, so the
"quality/compute trade-off" claim ships with measured training dynamics
rather than an assertion: the VAE side (recon/KL) should be near-identical
(the teacher enters the VAE loss only through the RL reward scale), while
teacher quality-loss trajectories show how much the local scope changes
the teacher's fit.

Usage:  python tools/window_dynamics.py [--steps 150] [--windows 0,256]
Writes docs/window_dynamics.json incrementally (one entry per mode, so a
timeout cannot lose a finished mode) and prints a summary table.
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

OUT = Path(__file__).resolve().parent.parent / "docs" / "window_dynamics.json"


def run_mode(window: int, steps: int, batch: int):
    from lunaris_orion_tpu.config import TrainConfig
    from lunaris_orion_tpu.train.state import create_state
    from lunaris_orion_tpu.train.step import make_train_step

    cfg = TrainConfig(batch_size=batch, gradient_accumulation_steps=1,
                      mixed_precision=True, attn_window=window)
    state = create_state(jax.random.PRNGKey(0), cfg)
    # Plain jit, no donation: the relay re-ships donated state per
    # Python-level call (BASELINE.md methodology note).
    step = jax.jit(make_train_step(cfg, remat=False))

    # Deterministic synthetic sprite stream: blocky textures, not noise —
    # enough structure for recon/KL to move and the teacher heads to fit.
    from lunaris_orion_tpu.data.synthetic import make_sprites
    data = make_sprites(batch * 16, 128, seed=7)  # 16 distinct batches

    keys = ("total_loss", "recon_loss", "kl_loss", "quality_loss",
            "quality_reward", "pg_loss")
    traj = {k: [] for k in keys}
    t0 = time.time()
    for i in range(steps):
        b = jnp.asarray(data[(i % 16) * batch:((i % 16) + 1) * batch])[None]
        state, metrics = step(state, b)
        for k in keys:
            if k in metrics:
                traj[k].append(float(metrics[k]))
    wall = time.time() - t0
    return {"window": window or "global", "steps": steps, "batch": batch,
            "wall_s": round(wall, 1),
            "ms_per_step": round(1e3 * wall / steps, 1),
            "trajectories": {k: v for k, v in traj.items() if v}}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--windows", default="256,0",
                    help="comma list; 0 = global")
    args = ap.parse_args()

    results = {}
    if OUT.exists():
        results = json.loads(OUT.read_text())
    for w in [int(x) for x in args.windows.split(",")]:
        name = str(w or "global")
        if (name in results and results[name]["steps"] >= args.steps
                and results[name].get("batch") == args.batch):
            # batch is part of the cache key: a rerun at a different batch
            # must re-measure, not present stale trajectories as evidence
            print(f"{name}: cached", flush=True)
            continue
        print(f"running window={name} for {args.steps} steps...", flush=True)
        results[name] = run_mode(w, args.steps, args.batch)
        OUT.write_text(json.dumps(results, indent=1))
        print(f"  {results[name]['ms_per_step']} ms/step", flush=True)

    # Summary: tail means (last 20%) per mode
    print(f"\n{'mode':>8} {'ms/step':>8} " + " ".join(
        f"{k:>14}" for k in ("recon_loss", "kl_loss", "quality_loss",
                             "quality_reward")))
    for name, r in results.items():
        tail = max(1, r["steps"] // 5)
        row = [f"{name:>8}", f"{r['ms_per_step']:>8}"]
        for k in ("recon_loss", "kl_loss", "quality_loss", "quality_reward"):
            v = r["trajectories"].get(k)
            row.append(f"{np.mean(v[-tail:]):>14.5f}" if v else " " * 14)
        print(" ".join(row))


if __name__ == "__main__":
    main()
