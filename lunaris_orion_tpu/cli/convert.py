"""Checkpoint conversion CLI — migrate between the PyTorch reference and
this framework in either direction, mid-training state included.

    # Reference -> here: resume a torch run on TPU (params, BN stats, both
    # Adam m/v/step, schedule position, best_loss all carry over)
    lunaris-convert to-jax --checkpoint latest.pt --out output/checkpoints

    # Here -> reference: export a TPU run as a latest.pt the reference
    # trainer resumes from (train_hybrid.py:791-846 restore contract)
    lunaris-convert to-torch --checkpoint output/checkpoints --out latest.pt

`to-jax` reads the model/optimizer hyperparameters from the checkpoint's
own vars(args) snapshot (train_hybrid.py:605) unless overridden. The
produced directory is a regular CheckpointService tree: point
`lunaris-train --resume_from` or `lunaris-generate --checkpoint` at it.

Note `lunaris-train --resume_from latest.pt` converts on the fly; this
command exists for one-time conversion and for the reverse export.
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Convert checkpoints between the PyTorch reference "
                    "format (.pt) and this framework's Orbax directories")
    sub = p.add_subparsers(dest="cmd", required=True)

    tj = sub.add_parser("to-jax", help="reference .pt -> Orbax directory")
    tj.add_argument("--checkpoint", required=True, help="latest.pt / best.pt")
    tj.add_argument("--out", required=True,
                    help="checkpoint directory to create")
    tj.add_argument("--best", action="store_true",
                    help="also fill the 'best' slot")
    for flag in ("latent_dim", "embedding_dim", "feature_dim", "num_experts"):
        tj.add_argument(f"--{flag}", type=int, default=None,
                        help=f"override {flag} (default: checkpoint args)")

    tt = sub.add_parser("to-torch", help="Orbax directory -> reference .pt")
    tt.add_argument("--checkpoint", required=True,
                    help="checkpoint directory (output_dir/checkpoints)")
    tt.add_argument("--out", required=True, help=".pt file to write")
    tt.add_argument("--step", type=int, default=None,
                    help="specific step (default: latest)")
    tt.add_argument("--best", action="store_true",
                    help="export the 'best' slot instead of latest")
    return p


def _to_jax(args) -> int:
    import torch

    from lunaris_orion_tpu.config import TrainConfig
    from lunaris_orion_tpu.train.checkpoint import CheckpointService
    from lunaris_orion_tpu.utils import torch_compat

    ckpt = torch.load(args.checkpoint, map_location="cpu", weights_only=True)
    cfg = (torch_compat.train_config_from_reference_args(ckpt["args"])
           if "args" in ckpt else TrainConfig())
    overrides = {k: getattr(args, k) for k in
                 ("latent_dim", "embedding_dim", "feature_dim", "num_experts")
                 if getattr(args, k) is not None}
    if overrides:
        cfg = cfg.replace(**overrides)

    state = torch_compat.train_state_from_torch_checkpoint(
        args.checkpoint, cfg, ckpt=ckpt)
    svc = CheckpointService(args.out, keep_n=cfg.keep_n_checkpoints)
    svc.save(int(state.step), state, config=cfg, best=args.best)
    svc.wait()
    svc.close()
    print(f"Converted {args.checkpoint} -> {args.out} at step "
          f"{int(state.step)} (latent={cfg.latent_dim}, "
          f"feature={cfg.feature_dim}, experts={cfg.num_experts}"
          f"{', best slot filled' if args.best else ''})")
    return 0


def _to_torch(args) -> int:
    import jax
    import torch

    from lunaris_orion_tpu.train.checkpoint import CheckpointService
    from lunaris_orion_tpu.train.state import create_state
    from lunaris_orion_tpu.utils import torch_compat

    svc = CheckpointService(args.checkpoint)
    cfg = svc.load_config()
    if cfg is None:
        raise FileNotFoundError(
            f"no config.json beside checkpoints in {args.checkpoint}")
    abstract = jax.eval_shape(
        lambda k: create_state(k, cfg), jax.random.PRNGKey(0))
    state = svc.restore(abstract, step=args.step, best=args.best)
    svc.close()

    out = torch_compat.torch_checkpoint_from_state(state, cfg)
    torch.save(out, args.out)
    print(f"Exported step {out['global_step']} -> {args.out} "
          f"(reference train_hybrid.py resume format)")
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return _to_jax(args) if args.cmd == "to-jax" else _to_torch(args)


if __name__ == "__main__":
    raise SystemExit(main())
