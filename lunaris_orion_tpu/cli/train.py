"""Training CLI — flag-for-flag compatible with the reference trainer.

All 35 argparse flags of train_hybrid.py:1076-1133 (inventory SURVEY.md
§2.8), same names and defaults, plus TPU-native extensions under
"tpu options". Flags the reference parses but ignores (--chunk_size,
--memory_efficient, --compile, --num_workers) are accepted for drop-in
compatibility and noted in help text.
"""

from __future__ import annotations

import argparse

import numpy as np

from lunaris_orion_tpu.config import TrainConfig


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Hybrid VAE+Teacher pixel-art training (TPU-native)")
    d = TrainConfig()

    g = p.add_argument_group("data")
    g.add_argument("--data_dir", type=str, required=True,
                   help="dir with sprites_*.npy + labels_*.csv")
    g.add_argument("--output_dir", type=str, default=d.output_dir)
    g.add_argument("--resume_from", type=str, default=None,
                   help="checkpoint dir to resume from, or a reference "
                        ".pt file (full mid-training migration: params, "
                        "BN stats, Adam moments, schedule position)")

    g = p.add_argument_group("training")
    g.add_argument("--batch_size", type=int, default=d.batch_size)
    g.add_argument("--gradient_accumulation_steps", type=int,
                   default=d.gradient_accumulation_steps)
    g.add_argument("--chunk_size", type=int, default=d.chunk_size,
                   help="compat flag; attention blocking is autotuned")
    g.add_argument("--num_epochs", type=int, default=d.num_epochs)
    g.add_argument("--num_workers", type=int, default=d.num_workers,
                   help="compat flag; the input pipeline is device-side")
    g.add_argument("--seed", type=int, default=d.seed)
    g.add_argument("--compile", action="store_true",
                   help="compat flag; steps are always jit-compiled")
    g.add_argument("--mixed_precision", action="store_true",
                   help="bf16 compute (TPU-native; no loss scaling needed)")

    g = p.add_argument_group("model")
    g.add_argument("--latent_dim", type=int, default=d.latent_dim)
    g.add_argument("--embedding_dim", type=int, default=d.embedding_dim)
    g.add_argument("--feature_dim", type=int, default=d.feature_dim)
    g.add_argument("--num_experts", type=int, default=d.num_experts)

    g = p.add_argument_group("optimizer")
    g.add_argument("--vae_lr", type=float, default=d.vae_lr)
    g.add_argument("--teacher_lr", type=float, default=d.teacher_lr)
    g.add_argument("--min_lr", type=float, default=d.min_lr)
    g.add_argument("--weight_decay", type=float, default=d.weight_decay)
    g.add_argument("--max_grad_norm", type=float, default=d.max_grad_norm)
    g.add_argument("--scheduler_t0", type=int, default=d.scheduler_t0)

    g = p.add_argument_group("loss weights")
    g.add_argument("--recon_weight", type=float, default=d.recon_weight)
    g.add_argument("--kl_weight", type=float, default=d.kl_weight)
    g.add_argument("--quality_weight", type=float, default=d.quality_weight)

    g = p.add_argument_group("logging / checkpoints")
    g.add_argument("--log_every", type=int, default=d.log_every)
    g.add_argument("--save_every", type=int, default=d.save_every)
    g.add_argument("--sample_every", type=int, default=d.sample_every)
    g.add_argument("--keep_n_checkpoints", type=int,
                   default=d.keep_n_checkpoints)
    g.add_argument("--early_stopping_patience", type=int,
                   default=d.early_stopping_patience)
    g.add_argument("--eval_save_freq", type=int, default=d.eval_save_freq)

    g = p.add_argument_group("rl")
    g.add_argument("--reward_scale", type=float, default=d.reward_scale)
    g.add_argument("--semantic_weight", type=float, default=d.semantic_weight)
    g.add_argument("--baseline_momentum", type=float,
                   default=d.baseline_momentum)

    g = p.add_argument_group("device")
    g.add_argument("--force_cpu", action="store_true")
    g.add_argument("--memory_efficient", action="store_true",
                   help="compat flag (a no-op in the reference too)")

    g = p.add_argument_group("tpu options")
    g.add_argument("--image_size", type=int, default=d.image_size)
    g.add_argument("--mesh_shape", type=int, nargs=2, default=None,
                   metavar=("DATA", "MODEL"),
                   help="mesh layout, e.g. 4 2; default: all devices on data")
    g.add_argument("--val_fraction", type=float, default=d.val_fraction)
    g.add_argument("--prefetch_depth", type=int, default=d.prefetch_depth)
    g.add_argument("--steps_per_call", type=int, default=d.steps_per_call,
                   help="optimizer steps chained inside one dispatched XLA "
                        "call (1 = reference-exact per-step loop). K>1 "
                        "decouples the host loop from the device: per-step "
                        "metrics still log at their exact steps, but "
                        "checkpoints/eval grids land on call boundaries "
                        "and epochs drop trailing batches that do not "
                        "fill a K-chunk")
    g.add_argument("--device_data", action=argparse.BooleanOptionalAction,
                   default=d.device_data,
                   help="stage the whole corpus into HBM once and gather "
                        "batches on device (zero per-step host->device "
                        "batch traffic). Auto-falls-back to streaming when "
                        "it does not fit beside the compiled step")
    g.add_argument("--hang_watchdog_secs", type=float,
                   default=d.hang_watchdog_secs,
                   help=">0: exit(66) if no training heartbeat lands within "
                        "this many seconds (wedged device transport); a "
                        "supervisor restarts with --resume_from. Size >= 2x "
                        "steps_per_call x step time and above checkpoint "
                        "save latency")
    g.add_argument("--profile_steps", type=int, default=d.profile_steps,
                   help=">0: capture a jax.profiler trace of that many steps")
    g.add_argument("--debug_nans", action="store_true",
                   help="enable jax nan-checking (slow; debugging aid)")
    g.add_argument("--use_pallas", action=argparse.BooleanOptionalAction,
                   default=d.use_pallas,
                   help="force (--use_pallas, asserts TPU+shape support) or "
                        "forbid (--no-use_pallas) the Pallas attention "
                        "kernel; default: auto dispatch")
    g.add_argument("--attn_impl", type=str, default=d.attn_impl,
                   choices=("auto", "full", "flash", "pallas", "ring",
                            "allgather"),
                   help="teacher attention implementation. 'ring' / "
                        "'allgather' = cross-chip context parallelism: the "
                        "token axis shards over the mesh model axis "
                        "(--mesh_shape DATA MODEL with MODEL > 1); experts "
                        "are replicated. 'allgather' runs the fused kernel "
                        "per shard (4-5x cheaper compute than 'ring' for "
                        "the same wire bytes; prefer it unless the "
                        "gathered k/v exceeds HBM). Use CP when one chip "
                        "cannot hold the attention working set (large "
                        "--image_size) or per-step latency at tiny batch "
                        "matters; at 128px batch>=chips a single chip per "
                        "batch row is faster (docs/parallelism.md, "
                        "BASELINE.md r5)")
    g.add_argument("--attn_window", type=int, default=d.attn_window,
                   help="teacher attention window in tokens (0 = global). "
                        "The CORRECTED form of the reference's intended "
                        "memory-efficient chunked attention (its shipped "
                        "chunking is defective; docs/parity.md) — a "
                        "documented quality/compute deviation knob that "
                        "cuts the teacher's O(N^2) attention to "
                        "O(N*window)")
    g.add_argument("--fuse_teacher", action=argparse.BooleanOptionalAction,
                   default=d.fuse_teacher,
                   help="run the two per-micro-batch teacher calls as one "
                        "2B forward (off by default: measured SLOWER on "
                        "v5e, 7.32 vs 4.96 s/step, and deviates BN batch "
                        "stats — see BASELINE.md)")
    g.add_argument("--bf16_momentum", action="store_true",
                   default=d.bf16_momentum,
                   help="bf16 Adam first moments (halves m-state HBM "
                        "traffic; second moments stay f32)")
    g.add_argument("--cached_prompt_embeddings", action="store_true",
                   default=d.cached_prompt_embeddings,
                   help="dataset-side prompt-embedding table (the "
                        "reference's intended hook, train_hybrid.py:157-171)"
                        " refreshed every --embed_refresh_epochs; skips the "
                        "per-batch teacher call on inputs (~30%% step time)")
    g.add_argument("--embed_refresh_epochs", type=int,
                   default=d.embed_refresh_epochs)
    g.add_argument("--remat", action=argparse.BooleanOptionalAction,
                   default=d.remat,
                   help="force gradient rematerialization on/off; default: "
                        "the memory planner elides it when the step fits HBM")
    g.add_argument("--fast_rng", action=argparse.BooleanOptionalAction,
                   default=d.fast_rng,
                   help="rbg PRNG for dropout masks (default on; ~1.3x "
                        "faster hybrid steps on TPU). DEVIATION knob: the "
                        "mask distribution is identical but the bit stream "
                        "differs from threefry — pass --no-fast_rng for "
                        "threefry determinism-class behavior "
                        "(docs/parity.md)")
    return p


def config_from_args(args: argparse.Namespace) -> TrainConfig:
    kw = vars(args).copy()
    if kw.get("mesh_shape") is not None:
        kw["mesh_shape"] = tuple(kw["mesh_shape"])
    return TrainConfig(**kw)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    np.random.seed(args.seed)
    cfg = config_from_args(args)
    from lunaris_orion_tpu.train.loop import Trainer
    trainer = Trainer(cfg)
    result = trainer.train()
    trainer.logger.info("Done: %s", result)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
