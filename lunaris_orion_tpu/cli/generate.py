"""Generation CLI — the reference inference surface
(examples/simple_generation.py:220-243): --checkpoint --prompt --num_samples
--output_dir --seed --temperature --quality_threshold --device --no_metadata.
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Generate pixel art from a checkpoint")
    p.add_argument("--checkpoint", type=str, required=True,
                   help="checkpoint directory (output_dir/checkpoints) or a "
                        "reference .pt file (converted on the fly)")
    p.add_argument("--prompt", type=str, default="",
                   help="recorded in metadata (unconditional decoder)")
    p.add_argument("--num_samples", type=int, default=4)
    p.add_argument("--output_dir", type=str, default="generated")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--quality_threshold", type=float, default=0.7)
    p.add_argument("--max_attempts", type=int, default=5)
    p.add_argument("--device", type=str, default=None,
                   help="'cpu' to force CPU; default uses the TPU")
    p.add_argument("--no_metadata", action="store_true")
    p.add_argument("--best", action="store_true",
                   help="load the best checkpoint instead of latest")
    p.add_argument("--bf16", action="store_true",
                   help="decode+score in bfloat16 (closer to the "
                        "reference's fp16-autocast attention numerics, "
                        "lunar_evaluator.py:188, and faster on TPU; "
                        "default f32)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.device == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    from lunaris_orion_tpu.infer.generator import ImageGenerator

    gen = ImageGenerator(args.checkpoint, best=args.best, bf16=args.bf16)
    images, metadata = gen.generate(
        args.num_samples, temperature=args.temperature,
        quality_threshold=args.quality_threshold,
        max_attempts=args.max_attempts, seed=args.seed)
    paths = gen.save_outputs(images, metadata, args.output_dir,
                             prompt=args.prompt,
                             save_metadata=not args.no_metadata)
    kept = sum(1 for m in metadata if not m.get("below_threshold"))
    print(f"Generated {len(images)} images ({kept} above threshold "
          f"{args.quality_threshold}); wrote {len(paths)} files to "
          f"{args.output_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
