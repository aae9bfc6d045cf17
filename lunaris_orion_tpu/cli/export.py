"""Export CLI — serving artifacts (StableHLO) from a checkpoint.

The reference ships no deployment path (its example inference script does
not run, SURVEY.md §2.3 #25). `lunaris-export` produces a self-contained
serving bundle: the decode+score (`generate`) and teacher-scoring
(`score`) programs serialized via jax.export with the checkpoint weights
stored once in a shared weights.bin sidecar, loadable by `infer.exporter.ServingBundle` (or any StableHLO
runtime honoring the jax.export calling convention) with no model code.
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Export serving artifacts (StableHLO) from a checkpoint")
    p.add_argument("--checkpoint", type=str, required=True,
                   help="checkpoint directory or a reference .pt file")
    p.add_argument("--out", type=str, required=True,
                   help="output bundle directory")
    p.add_argument("--batch", type=int, nargs="+", default=[16],
                   help="serving batch size(s); one artifact per size "
                        "(shapes are static — the bundle dispatches on the "
                        "input's leading dim)")
    p.add_argument("--functions", type=str, nargs="+",
                   default=["generate", "score"],
                   choices=["generate", "score"],
                   help="which entry points to export")
    p.add_argument("--best", action="store_true",
                   help="export the best-loss checkpoint slot")
    p.add_argument("--bf16", action="store_true",
                   help="bake bf16 activations into the artifact (closer "
                        "to the reference's fp16-autocast numerics; "
                        "default f32 exact-parity scoring)")
    p.add_argument("--attn", type=str, default="xla",
                   choices=["xla", "pallas"],
                   help="attention lowering: 'xla' = portable pure "
                        "StableHLO (multi-platform capable); 'pallas' = "
                        "Mosaic TPU kernel custom-calls (TPU-only, faster "
                        "at 128px sequence lengths)")
    p.add_argument("--platforms", type=str, default=None,
                   help="comma-separated lowering platforms, e.g. "
                        "'tpu,cpu' (default: the current backend)")
    p.add_argument("--device", type=str, default=None)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.device == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    from lunaris_orion_tpu.infer.exporter import export_serving_bundle

    platforms = args.platforms.split(",") if args.platforms else None
    manifest = export_serving_bundle(
        args.checkpoint, args.out, batch_sizes=args.batch,
        functions=args.functions, best=args.best, bf16=args.bf16,
        attn=args.attn, platforms=platforms)
    names = ", ".join(sorted(manifest["functions"]))
    print(f"Exported {len(manifest['functions'])} artifact(s) to "
          f"{args.out}: {names} (step {manifest['checkpoint_step']}, "
          f"attn={manifest['attn']})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
