"""Mid-training migration: full optimizer-state interop in both directions.

The reference checkpoints its AdamW and CosineAnnealingWarmRestarts states
and restores all four on resume (train_hybrid.py:594-615, 791-846). These
tests pin that a migrated run *continues identically*: after converting a
torch checkpoint, one more update with the same gradients produces the same
parameters on both sides (and the reverse export loads into real torch
AdamW/scheduler objects and does the same).

Reuses the independently-written torch mirrors from test_torch_parity /
test_teacher_interop.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from test_teacher_interop import CFG as TCFG
from test_teacher_interop import MirrorTeacher
from test_torch_parity import CFG as VCFG
from test_torch_parity import TorchMirrorVAE

from lunaris_orion_tpu.config import TrainConfig
from lunaris_orion_tpu.train.state import create_state, make_optimizers
from lunaris_orion_tpu.utils import torch_compat as tc

CFG = TrainConfig(latent_dim=VCFG.latent_dim, image_size=VCFG.image_size,
                  feature_dim=TCFG.feature_dim,
                  num_experts=TCFG.num_experts,
                  embedding_dim=TCFG.embedding_dim,
                  vae_lr=1e-3, teacher_lr=5e-4, scheduler_t0=5,
                  min_lr=1e-6, weight_decay=0.01, max_grad_norm=1.0,
                  seed=0)


def _torch_update(model, opt, sched):
    """One reference-style update: grad = 0.1*param (deterministic,
    layout-revealing), clip 1.0, AdamW step, scheduler step
    (train_hybrid.py:907-926 ordering)."""
    opt.zero_grad(set_to_none=True)
    for p in model.parameters():
        p.grad = 0.1 * p.detach().clone()
    torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
    opt.step()
    sched.step()


def _optax_update(tx, params, opt_state):
    grads = jax.tree_util.tree_map(lambda p: 0.1 * p, params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    return params, opt_state


def _torch_opt_pair(model, lr):
    opt = torch.optim.AdamW(model.parameters(), lr=lr, betas=(0.9, 0.999),
                            eps=1e-8, weight_decay=CFG.weight_decay)
    sched = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(
        opt, T_0=CFG.scheduler_t0, T_mult=2, eta_min=CFG.min_lr)
    return opt, sched


def _reference_ckpt(vae, teacher, vopt, topt, vsched, tsched, step,
                    best=0.25):
    """The reference's exact save dict (train_hybrid.py:594-615)."""
    return {
        "global_step": step,
        "vae_state_dict": vae.state_dict(),
        "teacher_state_dict": teacher.state_dict(),
        "vae_optimizer": vopt.state_dict(),
        "teacher_optimizer": topt.state_dict(),
        "vae_scheduler": vsched.state_dict(),
        "teacher_scheduler": tsched.state_dict(),
        "best_loss": best,
        "args": {"latent_dim": VCFG.latent_dim, "seed": 0},
    }


@pytest.fixture(scope="module")
def torch_run(tmp_path_factory):
    """A 3-step torch 'training run' checkpointed in reference format."""
    torch.manual_seed(0)
    vae = TorchMirrorVAE(VCFG)
    teacher = MirrorTeacher(TCFG)
    vopt, vsched = _torch_opt_pair(vae, CFG.vae_lr)
    topt, tsched = _torch_opt_pair(teacher, CFG.teacher_lr)
    for _ in range(3):
        _torch_update(vae, vopt, vsched)
        _torch_update(teacher, topt, tsched)
    path = tmp_path_factory.mktemp("migrate") / "latest.pt"
    torch.save(_reference_ckpt(vae, teacher, vopt, topt, vsched, tsched, 3),
               path)
    return str(path), vae, teacher, vopt, vsched, topt, tsched


def _allclose_tree(a, b, **kw):
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x, np.float64),
                                   np.asarray(y, np.float64), **kw)


class TestTorchToJax:
    @pytest.mark.slow
    def test_state_carries_everything(self, torch_run):
        path, vae, teacher, vopt, *_ = torch_run
        state = tc.train_state_from_torch_checkpoint(
            path, CFG, vcfg=VCFG, tcfg=TCFG)
        assert int(state.step) == 3
        assert float(state.best_loss) == pytest.approx(0.25)
        # params match the weight converters
        _allclose_tree(
            state.vae_params,
            tc.vae_params_from_torch(
                {k: v.numpy() for k, v in vae.state_dict().items()}, VCFG),
            rtol=0, atol=0)
        # Adam moments landed: counts = 3, mu matches torch exp_avg
        mu, nu, count = tc.extract_adam_state(state.vae_opt)
        assert count == 3
        sd = {k: v.numpy() for k, v in vae.state_dict().items()}
        mu_ref = tc.vae_params_from_torch(
            tc._overlay_opt_field(sd, vopt.state_dict(), "exp_avg"), VCFG)
        _allclose_tree(mu, mu_ref, rtol=0, atol=0)
        # nu populated (zero only where grads are structurally zero:
        # grad = 0.1*p is 0 for zero-initialized GN biases)
        nonzero = [float(jnp.abs(x).max()) > 0
                   for x in jax.tree_util.tree_leaves(nu)]
        assert sum(nonzero) > len(nonzero) * 0.5

    @pytest.mark.slow
    def test_migrated_run_continues_identically(self, torch_run):
        """THE migration guarantee: after conversion, the next update with
        identical gradients produces identical parameters."""
        path, vae, _, vopt, vsched, *_ = torch_run
        state = tc.train_state_from_torch_checkpoint(
            path, CFG, vcfg=VCFG, tcfg=TCFG)
        vae_tx, _ = make_optimizers(CFG)
        jp, _ = _optax_update(vae_tx, state.vae_params, state.vae_opt)

        _torch_update(vae, vopt, vsched)  # step 4 on the torch side
        tp = tc.vae_params_from_torch(
            {k: v.numpy() for k, v in vae.state_dict().items()}, VCFG)
        _allclose_tree(jp, tp, rtol=1e-5, atol=1e-7)


class TestJaxToTorch:
    @pytest.fixture(scope="class")
    def jax_run(self):
        """A 3-step optax 'run' on a fresh TrainState."""
        state = create_state(jax.random.PRNGKey(0), CFG, VCFG, TCFG)
        vae_tx, teacher_tx = make_optimizers(CFG)
        vp, vo = state.vae_params, state.vae_opt
        tp, to = state.teacher_params, state.teacher_opt
        for _ in range(3):
            vp, vo = _optax_update(vae_tx, vp, vo)
            tp, to = _optax_update(teacher_tx, tp, to)
        return state.replace(vae_params=vp, vae_opt=vo, teacher_params=tp,
                             teacher_opt=to,
                             step=jnp.asarray(3, jnp.int32),
                             best_loss=jnp.asarray(0.5, jnp.float32))

    def test_export_has_reference_keys(self, jax_run):
        out = tc.torch_checkpoint_from_state(jax_run, CFG, VCFG, TCFG)
        assert set(out) == {"global_step", "vae_state_dict",
                            "teacher_state_dict", "vae_optimizer",
                            "teacher_optimizer", "vae_scheduler",
                            "teacher_scheduler", "best_loss", "args"}
        assert out["global_step"] == 3
        assert out["best_loss"] == pytest.approx(0.5)

    def test_exported_run_continues_identically_in_torch(self, jax_run,
                                                         tmp_path):
        """Reverse migration: the exported .pt loads into real torch
        AdamW/scheduler objects and the next identical-gradient update
        matches optax."""
        out = tc.torch_checkpoint_from_state(jax_run, CFG, VCFG, TCFG)
        p = tmp_path / "exported.pt"
        torch.save(out, p)
        ckpt = torch.load(p, map_location="cpu", weights_only=True)

        vae = TorchMirrorVAE(VCFG)
        missing, unexpected = vae.load_state_dict(ckpt["vae_state_dict"],
                                                  strict=True)
        assert not missing and not unexpected
        vopt, vsched = _torch_opt_pair(vae, CFG.vae_lr)
        vopt.load_state_dict(ckpt["vae_optimizer"])
        vsched.load_state_dict(ckpt["vae_scheduler"])
        # the restored schedule position: LR at optimizer-step 3
        from lunaris_orion_tpu.train.schedule import cosine_warm_restarts
        want_lr = float(cosine_warm_restarts(
            CFG.vae_lr, CFG.scheduler_t0, CFG.min_lr)(3))
        assert vsched.get_last_lr()[0] == pytest.approx(want_lr, rel=1e-6)

        _torch_update(vae, vopt, vsched)  # step 4, torch side
        vae_tx, _ = make_optimizers(CFG)
        jp, _ = _optax_update(vae_tx, jax_run.vae_params, jax_run.vae_opt)
        tp = tc.vae_params_from_torch(
            {k: v.numpy() for k, v in vae.state_dict().items()}, VCFG)
        _allclose_tree(jp, tp, rtol=1e-5, atol=1e-7)

    def test_state_roundtrip_through_pt(self, jax_run, tmp_path):
        """TrainState -> .pt -> TrainState: params, stats, moments, counts,
        step, best_loss all survive exactly."""
        p = tmp_path / "rt.pt"
        torch.save(tc.torch_checkpoint_from_state(jax_run, CFG, VCFG, TCFG),
                   p)
        back = tc.train_state_from_torch_checkpoint(
            str(p), CFG, vcfg=VCFG, tcfg=TCFG)
        _allclose_tree(back.vae_params, jax_run.vae_params, rtol=0, atol=0)
        _allclose_tree(back.teacher_params, jax_run.teacher_params,
                       rtol=0, atol=0)
        _allclose_tree(back.teacher_stats, jax_run.teacher_stats,
                       rtol=0, atol=0)
        for field in ("vae_opt", "teacher_opt"):
            mu0, nu0, c0 = tc.extract_adam_state(getattr(jax_run, field))
            mu1, nu1, c1 = tc.extract_adam_state(getattr(back, field))
            assert c0 == c1 == 3
            _allclose_tree(mu0, mu1, rtol=0, atol=0)
            _allclose_tree(nu0, nu1, rtol=0, atol=0)
        assert int(back.step) == 3
        assert float(back.best_loss) == pytest.approx(0.5)


class TestSchedulerStateSynthesis:
    @pytest.mark.parametrize("count", [0, 1, 5, 10, 14, 15, 29, 30, 61])
    def test_matches_organically_stepped_torch_scheduler(self, count):
        """scheduler_to_torch_sd(count) == a real torch scheduler stepped
        `count` times (T_0=5, T_mult=2)."""
        opt = torch.optim.AdamW([torch.nn.Parameter(torch.zeros(1))],
                                lr=1e-3)
        sched = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(
            opt, T_0=5, T_mult=2, eta_min=1e-6)
        for _ in range(count):
            sched.step()
        organic = sched.state_dict()
        synth = tc.scheduler_to_torch_sd(1e-3, 5, 1e-6, count)
        for k in ("T_0", "T_i", "T_mult", "eta_min", "last_epoch", "T_cur"):
            assert synth[k] == pytest.approx(organic[k]), k
        assert synth["_last_lr"][0] == pytest.approx(
            organic["_last_lr"][0], rel=1e-9)


# --- a run at TrainConfig-expressible dims (what real reference checkpoints
# have: the reference hard-codes extractor_dim 128, 3 expert layers, 8 heads;
# only latent/embedding/feature/num_experts vary via flags) ------------------

STD_CFG = TrainConfig(latent_dim=16, image_size=16, feature_dim=16,
                      num_experts=2, embedding_dim=8, vae_lr=1e-3,
                      teacher_lr=5e-4, scheduler_t0=5, seed=0)


@pytest.fixture(scope="module")
def std_run(tmp_path_factory):
    """A reference-format checkpoint whose dims the CLI can reconstruct
    from the vars(args) snapshot alone."""
    torch.manual_seed(1)
    vcfg, tcfg = STD_CFG.vae_config(), STD_CFG.teacher_config()
    vae = TorchMirrorVAE(vcfg)
    teacher = MirrorTeacher(tcfg)
    vopt, vsched = _torch_opt_pair(vae, STD_CFG.vae_lr)
    topt, tsched = _torch_opt_pair(teacher, STD_CFG.teacher_lr)
    _torch_update(vae, vopt, vsched)
    _torch_update(teacher, topt, tsched)
    ckpt = _reference_ckpt(vae, teacher, vopt, topt, vsched, tsched, 1)
    # a real reference snapshot carries every flag; the dims matter here
    ckpt["args"] = {"latent_dim": 16, "image_size": 16, "feature_dim": 16,
                    "num_experts": 2, "embedding_dim": 8, "vae_lr": 1e-3,
                    "teacher_lr": 5e-4, "scheduler_t0": 5, "seed": 0}
    path = tmp_path_factory.mktemp("std") / "latest.pt"
    torch.save(ckpt, path)
    return str(path), vae, teacher


class TestConvertCLI:
    @pytest.mark.slow
    def test_roundtrip_via_cli(self, std_run, tmp_path):
        """to-jax produces a directory the inference stack loads; to-torch
        exports params byte-identically back. Dims come from the
        checkpoint's own args snapshot."""
        from lunaris_orion_tpu.cli.convert import main as convert_main

        path, vae, teacher = std_run
        out_dir = tmp_path / "converted"
        assert convert_main(["to-jax", "--checkpoint", path,
                             "--out", str(out_dir)]) == 0
        assert (out_dir / "config.json").exists()

        back = tmp_path / "back.pt"
        assert convert_main(["to-torch", "--checkpoint", str(out_dir),
                             "--out", str(back)]) == 0
        ckpt = torch.load(back, map_location="cpu", weights_only=True)
        assert ckpt["global_step"] == 1
        for model, key in ((vae, "vae_state_dict"),
                           (teacher, "teacher_state_dict")):
            for k, v in model.state_dict().items():
                if k.endswith("num_batches_tracked"):
                    continue  # not tracked here (functional BN)
                np.testing.assert_array_equal(ckpt[key][k].numpy(),
                                              v.numpy(), err_msg=k)

    def test_cli_dims_mismatch_without_overrides(self, torch_run, tmp_path):
        """A checkpoint whose architecture the args snapshot does not
        describe must raise from the converter, not silently mis-load."""
        from lunaris_orion_tpu.cli.convert import main as convert_main

        path, *_ = torch_run  # mirrors at non-default extractor dims
        with pytest.raises((KeyError, ValueError)):
            convert_main(["to-jax", "--checkpoint", path,
                          "--out", str(tmp_path / "x")])


class TestPtInInference:
    def test_generator_accepts_pt(self, std_run):
        """ImageGenerator pointed at a reference .pt decodes and scores,
        config read from the checkpoint's args snapshot."""
        from lunaris_orion_tpu.infer.generator import ImageGenerator

        path, *_ = std_run
        gen = ImageGenerator(path)
        imgs, meta = gen.generate(2, max_attempts=1, seed=0)
        assert imgs.shape == (2, 16, 16, 3)
        assert imgs.dtype == np.uint8
        assert len(meta) == 2 and meta[0]["checkpoint_step"] == 1

    def test_evaluator_accepts_pt(self, std_run):
        from lunaris_orion_tpu.infer.evaluator import QualityEvaluator

        path, *_ = std_run
        ev = QualityEvaluator(path)
        x = np.zeros((2, 16, 16, 3), np.uint8)
        rows = ev.score_batch(x)
        assert len(rows) == 2
        assert 0.0 <= rows[0]["mean_quality"] <= 1.0

    def test_evaluator_attn_window_override(self, std_run):
        """--attn_window threads through to the scoring teacher config."""
        from lunaris_orion_tpu.infer.evaluator import QualityEvaluator

        path, *_ = std_run
        ev = QualityEvaluator(path, attn_window=64)
        assert ev.tcfg.attn_window == 64
        x = np.zeros((1, 16, 16, 3), np.uint8)
        assert len(ev.score_batch(x)) == 1

    def test_best_flag_with_pt_raises(self, std_run):
        """best=True only means something for Orbax slot directories; a
        .pt path must refuse instead of silently loading latest weights."""
        from lunaris_orion_tpu.infer.evaluator import QualityEvaluator
        from lunaris_orion_tpu.infer.generator import ImageGenerator

        path, *_ = std_run
        with pytest.raises(ValueError, match="best.pt"):
            ImageGenerator(path, best=True)
        with pytest.raises(ValueError, match="best.pt"):
            QualityEvaluator(path, best=True)


@pytest.mark.slow
class TestTrainerPtResume:
    def test_trainer_resumes_from_pt(self, std_run, tmp_path):
        """`--resume_from latest.pt`: the Trainer migrates the torch run
        (step count, params, Adam moments) and trains on."""
        from lunaris_orion_tpu.data.synthetic import write_synthetic_dataset
        from lunaris_orion_tpu.train.loop import Trainer
        from lunaris_orion_tpu.utils.torch_compat import (
            extract_adam_state, vae_params_from_torch)

        path, vae, _ = std_run
        data = tmp_path / "sprites"
        data.mkdir()
        write_synthetic_dataset(data, 24, image_size=16)
        cfg = STD_CFG.replace(
            data_dir=str(data), output_dir=str(tmp_path / "out"),
            resume_from=path, batch_size=8,
            gradient_accumulation_steps=1, num_epochs=1,
            val_fraction=0.34, log_every=1, save_every=100,
            eval_save_freq=100, sample_every=0)
        tr = Trainer(cfg)
        assert int(tr.state.step) == 1
        _, _, count = extract_adam_state(tr.state.vae_opt)
        assert count == 1
        _allclose_tree(
            jax.device_get(tr.state.vae_params),
            vae_params_from_torch(
                {k: v.numpy() for k, v in vae.state_dict().items()},
                STD_CFG.vae_config()),
            rtol=0, atol=0)
        tr.train()
        assert int(tr.state.step) > 1
