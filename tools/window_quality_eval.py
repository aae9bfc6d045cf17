"""Fixed-judge quality evaluation of the --attn_window knob (r4 demo).

The hybrid loop's quality reward is self-reinforcing by reference design
(train_hybrid.py:891-892 — the teacher maximizes its own scores), so the
*in-run* quality curve saturates near 1 on any data and cannot price the
window knob. This tool prices it with fixed judges instead:

  * subjects: each run's final VAE, reconstructing the SAME held-out
    validation sprites (deterministic split replicated from the Trainer);
  * judges: each run's final teacher in eval mode (its own trained
    attention window), scoring BOTH runs' reconstructions.

Reported per (judge, subject): mean quality (mean of the 4 per-expert
scores) and mean semantic score; plus judge-free recon MSE per subject.
The window knob's quality cost = how much every judge prefers one
subject's recons over the other's, net of the MSE difference.

Usage:
  python tools/window_quality_eval.py \
      --corpus demo/corpus_r4 \
      --ckpt global=demo/runs_r4/baseline/checkpoints \
      --ckpt window256=demo/runs_r4/window256/checkpoints \
      --seed 123 --n 256 --batch 16
"""

from __future__ import annotations

import argparse
import glob
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def load_val_images(corpus: str, val_fraction: float, seed: int, n: int):
    from lunaris_orion_tpu.data.dataset import train_val_split
    shards = sorted(glob.glob(str(Path(corpus) / "sprites_*.npy")))
    arrs = [np.load(s, mmap_mode="r") for s in shards]
    total = sum(a.shape[0] for a in arrs)
    _, val_idx = train_val_split(total, val_fraction, seed)
    val_idx = np.sort(val_idx[:n])
    flat = np.concatenate([a[:] for a in arrs], axis=0)
    return flat[val_idx]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--ckpt", action="append", required=True,
                    metavar="NAME=checkpoint_dir[@step]")
    ap.add_argument("--val-fraction", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--best", action="store_true")
    args = ap.parse_args()

    from lunaris_orion_tpu.infer.generator import ImageGenerator
    from lunaris_orion_tpu.models import teacher as teacher_mod
    from lunaris_orion_tpu.models import vae as vae_mod

    imgs = load_val_images(args.corpus, args.val_fraction, args.seed, args.n)
    n = imgs.shape[0]
    args.batch = min(args.batch, n)
    n -= n % args.batch
    imgs = imgs[:n]
    if n == 0:
        raise SystemExit("no validation subjects — corpus too small")
    log(f"val subjects: {imgs.shape}")

    runs = {}
    for spec in args.ckpt:
        name, path = spec.split("=", 1)
        step = None
        if "@" in path:
            path, s = path.rsplit("@", 1)
            step = int(s)
        gen = ImageGenerator(path, best=args.best, step=step)
        dt = jnp.bfloat16 if gen.cfg.mixed_precision else jnp.float32
        vcfg, tcfg = gen.vcfg, gen.tcfg

        @jax.jit
        def recon_fn(vp, x, vcfg=vcfg, dt=dt):
            xn = x.astype(dt) / jnp.asarray(127.5, dt) - 1.0
            recon, _, _ = vae_mod.apply(vp, xn, rng=None, cfg=vcfg,
                                        sample_posterior=False)
            return recon.astype(jnp.float32), xn.astype(jnp.float32)

        @jax.jit
        def judge_fn(tp, ts, r, tcfg=tcfg, dt=dt):
            out, _ = teacher_mod.apply(tp, ts, r.astype(dt), cfg=tcfg,
                                       train=False)
            return (jnp.mean(out["quality_scores"].astype(jnp.float32), -1),
                    out["semantic_score"][:, 0].astype(jnp.float32))

        runs[name] = dict(gen=gen, recon_fn=recon_fn, judge_fn=judge_fn,
                          window=tcfg.attn_window, step=gen.step)
        log(f"run {name}: step={gen.step} attn_window={tcfg.attn_window}")

    # Reconstructions per subject run (+ judge-free MSE).
    recons, mse = {}, {}
    for name, r in runs.items():
        outs, errs = [], []
        for i in range(0, n, args.batch):
            rec, xn = r["recon_fn"](r["gen"].vae_params,
                                    jnp.asarray(imgs[i:i + args.batch]))
            outs.append(np.asarray(rec))
            errs.append(np.asarray(jnp.mean((rec - xn) ** 2,
                                            axis=(1, 2, 3))))
        recons[name] = np.concatenate(outs)
        mse[name] = float(np.mean(np.concatenate(errs)))
        log(f"  recon[{name}]: mse={mse[name]:.5f}")

    # Cross-scoring: every judge scores every subject's recons.
    table = {}
    for jname, r in runs.items():
        for sname in runs:
            qs, ss = [], []
            for i in range(0, n, args.batch):
                q, s = r["judge_fn"](r["gen"].teacher_params,
                                     r["gen"].teacher_stats,
                                     jnp.asarray(recons[sname][i:i + args.batch]))
                qs.append(np.asarray(q))
                ss.append(np.asarray(s))
            table[f"judge={jname}/subject={sname}"] = {
                "quality_mean": round(float(np.mean(np.concatenate(qs))), 4),
                "semantic_mean": round(float(np.mean(np.concatenate(ss))), 4),
            }
            log(f"  {jname} scores {sname}: "
                f"{table[f'judge={jname}/subject={sname}']}")

    print(json.dumps({
        "n_subjects": int(n),
        "runs": {k: {"step": int(v["step"]), "attn_window": v["window"]}
                 for k, v in runs.items()},
        "recon_mse": {k: round(v, 5) for k, v in mse.items()},
        "cross_scores": table,
    }, indent=1))


if __name__ == "__main__":
    main()
