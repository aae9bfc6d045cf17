"""Evaluator CLI — standalone teacher quality scoring of images/shards."""

from __future__ import annotations

import argparse
import json


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Score images with the MoE quality teacher")
    p.add_argument("--checkpoint", type=str, required=True,
                   help="checkpoint directory or a reference .pt file")
    p.add_argument("--input", type=str, required=True,
                   help="directory of PNGs and/or sprites_*.npy shards")
    p.add_argument("--output", type=str, default=None,
                   help="write scores JSON here (default: stdout summary)")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--best", action="store_true")
    p.add_argument("--device", type=str, default=None)
    p.add_argument("--attn_window", type=int, default=None,
                   help="teacher attention window in tokens for scoring "
                        "(local-window attention, ~7x faster at 256 on "
                        "128px; a documented quality/compute deviation — "
                        "docs/parity.md). Default: the checkpoint's "
                        "setting (global)")
    p.add_argument("--bf16", action="store_true",
                   help="score in bfloat16 activations (closer to the "
                        "reference's fp16-autocast attention numerics, "
                        "lunar_evaluator.py:188, and faster on TPU; "
                        "default f32)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.device == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    from lunaris_orion_tpu.infer.evaluator import QualityEvaluator

    ev = QualityEvaluator(args.checkpoint, best=args.best,
                          attn_window=args.attn_window, bf16=args.bf16)
    results = ev.score_directory(args.input, batch_size=args.batch_size)
    if args.output:
        with open(args.output, "w") as f:
            json.dump(results, f, indent=2)
    if results:
        import numpy as np
        mean_q = float(np.mean([r["mean_quality"] for r in results.values()]))
        print(f"Scored {len(results)} images: mean quality {mean_q:.4f}"
              + (f"; wrote {args.output}" if args.output else ""))
    else:
        print("No images found.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
