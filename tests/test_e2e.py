"""End-to-end: train CLI on a synthetic dataset; checkpoint/resume round-trip."""

import json
from pathlib import Path

import jax
import numpy as np
import pytest

from lunaris_orion_tpu.cli.train import build_parser, config_from_args
from lunaris_orion_tpu.data.synthetic import write_synthetic_dataset


TINY_ARGS = [
    "--batch_size", "8", "--gradient_accumulation_steps", "2",
    "--num_epochs", "2", "--latent_dim", "16", "--feature_dim", "16",
    "--num_experts", "2", "--embedding_dim", "8", "--image_size", "16",
    "--log_every", "2", "--save_every", "8", "--eval_save_freq", "8",
    "--vae_lr", "1e-3", "--teacher_lr", "1e-4", "--val_fraction", "0.125",
]


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e_sprites")
    write_synthetic_dataset(d, 72, image_size=16)
    return d


class TestCLI:
    def test_full_flag_surface(self):
        """All 35 reference flags parse (SURVEY.md §2.8)."""
        flags = [
            "--data_dir", "--output_dir", "--resume_from", "--batch_size",
            "--gradient_accumulation_steps", "--chunk_size", "--num_epochs",
            "--num_workers", "--seed", "--compile", "--mixed_precision",
            "--latent_dim", "--embedding_dim", "--feature_dim",
            "--num_experts", "--vae_lr", "--teacher_lr", "--min_lr",
            "--weight_decay", "--max_grad_norm", "--scheduler_t0",
            "--recon_weight", "--kl_weight", "--quality_weight",
            "--log_every", "--save_every", "--sample_every",
            "--keep_n_checkpoints", "--early_stopping_patience",
            "--eval_save_freq", "--reward_scale", "--semantic_weight",
            "--baseline_momentum", "--force_cpu", "--memory_efficient",
        ]
        parser = build_parser()
        known = {a for action in parser._actions
                 for a in action.option_strings}
        missing = [f for f in flags if f not in known]
        assert not missing, missing

    def test_defaults_match_reference(self):
        args = build_parser().parse_args(["--data_dir", "x"])
        cfg = config_from_args(args)
        # train_hybrid.py:1076-1133 defaults
        assert cfg.batch_size == 16 and cfg.gradient_accumulation_steps == 2
        assert cfg.latent_dim == 256 and cfg.embedding_dim == 64
        assert cfg.feature_dim == 128 and cfg.num_experts == 4
        assert cfg.vae_lr == 1e-4 and cfg.kl_weight == 0.1
        assert cfg.scheduler_t0 == 10 and cfg.early_stopping_patience == 7
        assert cfg.reward_scale == 0.1 and cfg.baseline_momentum == 0.9

    def test_attn_impl_knob_resolution(self):
        """--attn_impl resolves directly; conflicts with use_pallas raise
        instead of one knob silently overriding the other."""
        from lunaris_orion_tpu.config import TrainConfig
        from lunaris_orion_tpu.train.loop import _attn_impl
        assert _attn_impl(TrainConfig(attn_impl="ring")) == "ring"
        assert _attn_impl(TrainConfig(attn_impl="full")) == "full"
        assert _attn_impl(
            TrainConfig(attn_impl="pallas", use_pallas=True)) == "pallas"
        with pytest.raises(ValueError, match="conflicts"):
            _attn_impl(TrainConfig(attn_impl="ring", use_pallas=True))
        with pytest.raises(ValueError, match="conflicts"):
            _attn_impl(TrainConfig(attn_impl="pallas", use_pallas=False))
        # CLI threads the choice
        cfg = config_from_args(build_parser().parse_args(
            ["--data_dir", "x", "--attn_impl", "ring"]))
        assert cfg.attn_impl == "ring"

    def test_fast_rng_flag_threads_to_config(self):
        """--fast_rng / --no-fast_rng controls TrainConfig.fast_rng
        (default True; the last deviation knob to get a CLI flag)."""
        base = ["--data_dir", "x"]
        assert config_from_args(build_parser().parse_args(base)).fast_rng
        assert config_from_args(
            build_parser().parse_args(base + ["--fast_rng"])).fast_rng
        assert not config_from_args(
            build_parser().parse_args(base + ["--no-fast_rng"])).fast_rng


@pytest.mark.slow
class TestEndToEnd:
    def test_train_checkpoint_resume(self, data_dir, tmp_path):
        from lunaris_orion_tpu.train.loop import Trainer

        out1 = tmp_path / "run1"
        args = build_parser().parse_args(
            ["--data_dir", str(data_dir), "--output_dir", str(out1)]
            + TINY_ARGS)
        cfg = config_from_args(args)
        trainer = Trainer(cfg)
        result = trainer.train()
        assert result["epochs"] == 2
        assert np.isfinite(result["best_loss"])

        # checkpoints + config snapshot + metrics + eval grid on disk
        ckpt_root = out1 / "checkpoints"
        assert (ckpt_root / "config.json").exists()
        steps = [int(p.name) for p in (ckpt_root / "steps").iterdir()
                 if p.name.isdigit()]
        assert steps, "no step checkpoints written"
        assert list((ckpt_root / "best").iterdir()), "no best checkpoint"
        assert (out1 / "training.log").exists()
        assert list((out1 / "eval_samples").glob("comparison_*.png"))
        saved_cfg = json.loads((ckpt_root / "config.json").read_text())
        assert saved_cfg["latent_dim"] == 16

        # ---- resume into a second run dir, training continues ----
        out2 = tmp_path / "run2"
        args2 = build_parser().parse_args(
            ["--data_dir", str(data_dir), "--output_dir", str(out2),
             "--resume_from", str(ckpt_root)] + TINY_ARGS)
        trainer2 = Trainer(config_from_args(args2))
        start_step = int(trainer2.state.step)
        assert start_step == max(steps), "resume should restore latest step"
        result2 = trainer2.train()
        assert int(trainer2.state.step) > start_step

    def test_resume_restores_exact_state(self, data_dir, tmp_path):
        """Params after restore are bit-identical to what was saved."""
        from lunaris_orion_tpu.train.loop import Trainer

        out = tmp_path / "exact"
        args = build_parser().parse_args(
            ["--data_dir", str(data_dir), "--output_dir", str(out),
             "--num_epochs", "1"] + TINY_ARGS[2:])
        cfg = config_from_args(args)
        t1 = Trainer(cfg)
        t1.train()
        saved_leaf = np.asarray(
            t1.state.vae_params["encoder"]["fc_mu"]["w"])
        baseline = float(t1.state.baseline)

        args2 = build_parser().parse_args(
            ["--data_dir", str(data_dir), "--output_dir", str(tmp_path / "x"),
             "--resume_from", str(out / "checkpoints"), "--num_epochs", "1"]
            + TINY_ARGS[2:])
        t2 = Trainer(config_from_args(args2))
        np.testing.assert_array_equal(
            np.asarray(t2.state.vae_params["encoder"]["fc_mu"]["w"]),
            saved_leaf)
        assert float(t2.state.baseline) == baseline
        assert bool(t2.state.baseline_initialized)


@pytest.mark.slow
class TestStepsPerCall:
    """--steps_per_call K chains K optimizer steps in ONE dispatched XLA
    call (train/loop.py _chain_steps). K>1 must be mathematically
    identical to the K=1 per-step loop on the same data order, and
    per-step metrics must still log at their exact steps."""

    def test_k3_matches_k1(self, tmp_path):
        from lunaris_orion_tpu.train.loop import Trainer

        d = tmp_path / "sprites80"
        write_synthetic_dataset(d, 80, image_size=16)
        # 80 sprites, val 0.1 -> 72 train -> 9 batches of 8: divisible by 3
        base = ["--data_dir", str(d), "--num_epochs", "1",
                "--batch_size", "8", "--gradient_accumulation_steps", "1",
                "--latent_dim", "16", "--feature_dim", "16",
                "--num_experts", "2", "--embedding_dim", "8",
                "--image_size", "16", "--log_every", "2",
                "--save_every", "0", "--eval_save_freq", "0",
                "--sample_every", "0", "--val_fraction", "0.1",
                "--vae_lr", "1e-3", "--teacher_lr", "1e-4"]
        runs = {}
        for k in (1, 3):
            out = tmp_path / f"k{k}"
            args = build_parser().parse_args(
                base + ["--output_dir", str(out), "--steps_per_call", str(k)])
            t = Trainer(config_from_args(args))
            t.train()
            runs[k] = t

        assert int(runs[1].state.step) == 9
        assert int(runs[3].state.step) == 9
        for name in ("vae_params", "teacher_params"):
            a = jax.tree_util.tree_leaves(getattr(runs[1].state, name))
            b = jax.tree_util.tree_leaves(getattr(runs[3].state, name))
            for x, y in zip(a, b):
                np.testing.assert_allclose(
                    np.asarray(x, np.float64), np.asarray(y, np.float64),
                    rtol=2e-5, atol=2e-6)
        assert float(runs[1].state.baseline) == pytest.approx(
            float(runs[3].state.baseline), rel=1e-5)

        # per-step metric rows land on their exact steps in both runs
        for k in (1, 3):
            rows = [json.loads(line) for line in
                    open(tmp_path / f"k{k}" / "tensorboard" / "metrics.jsonl")]
            steps = {r["step"] for r in rows if "recon_loss" in r}
            assert {2, 4, 6, 8}.issubset(steps), (k, sorted(steps))

    def test_k_chunk_drop_last(self, tmp_path):
        """Trailing batches that do not fill a K-chunk are dropped (the
        documented drop_last-at-chunk-granularity deviation)."""
        from lunaris_orion_tpu.train.loop import Trainer

        d = tmp_path / "sprites72"
        write_synthetic_dataset(d, 80, image_size=16)
        args = build_parser().parse_args(
            ["--data_dir", str(d), "--output_dir", str(tmp_path / "o"),
             "--num_epochs", "1", "--batch_size", "8",
             "--gradient_accumulation_steps", "1", "--latent_dim", "16",
             "--feature_dim", "16", "--num_experts", "2",
             "--embedding_dim", "8", "--image_size", "16",
             "--val_fraction", "0.1", "--steps_per_call", "4",
             "--save_every", "0", "--eval_save_freq", "0",
             "--sample_every", "0"])
        t = Trainer(config_from_args(args))
        t.train()
        # 9 train batches, K=4 -> 2 chunks = 8 steps; 1 batch dropped
        assert int(t.state.step) == 8


@pytest.mark.slow
class TestCachedEmbeddings:
    def test_trainer_cached_prompt_embeddings(self, data_dir, tmp_path):
        """Trainer path of --cached_prompt_embeddings: embed table built and
        refreshed, loader yields indices, the step consumes table slices."""
        from lunaris_orion_tpu.train.loop import Trainer

        out = tmp_path / "cached_run"
        base = list(TINY_ARGS)
        idx = base.index("--num_epochs")
        base[idx + 1] = "1"
        args = build_parser().parse_args(
            ["--data_dir", str(data_dir), "--output_dir", str(out),
             "--cached_prompt_embeddings"] + base)
        trainer = Trainer(config_from_args(args))
        result = trainer.train()
        assert result["epochs"] == 1
        assert np.isfinite(result["best_loss"])
        assert trainer._embed_table.shape == (72, 8)
        # table is non-trivial (teacher produced real embeddings)
        assert np.abs(trainer._embed_table).sum() > 0
        assert "Prompt-embedding table refreshed" in \
            (out / "training.log").read_text()
