"""Interop against the ACTUAL reference implementation, end to end.

Every other interop test in this suite pins conversions against
independently-written torch mirrors. These tests close the loop with the
real thing: the reference checkout is imported as an *oracle* (its
`TrainingManager`, `LunarisCoreVAE`, `LunarMoETeacher` — train_hybrid.py,
lunar_generate.py, lunar_evaluator.py) and we assert that

  1. a checkpoint exported by `torch_compat.torch_checkpoint_from_state`
     strict-loads into the reference's own model classes (no missing or
     unexpected keys),
  2. the reference trainer's real resume path (`TrainingManager.__init__`
     -> `_load_checkpoint`, train_hybrid.py:791-836) restores our export:
     global_step, best_loss, Adam moments, and the scheduler position all
     land,
  3. the reference trainer's own `_save_checkpoint` output
     (train_hybrid.py:594-615) converts back into a TrainState whose
     params/stats/moments are byte-identical to what we exported — a full
     circle through the reference's code.

Skipped when no reference checkout is present (CI portability); marked
slow (constructs the reference trainer, which loads a 128px dataset).
"""

import os
import sys
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest
import torch

import jax

from lunaris_orion_tpu.config import TrainConfig
from lunaris_orion_tpu.train.schedule import cosine_warm_restarts
from lunaris_orion_tpu.train.state import create_state, make_optimizers
from lunaris_orion_tpu.utils import torch_compat as tc

REF = Path(os.environ.get("LUNARIS_REFERENCE_DIR", "/root/reference"))

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not (REF / "train_hybrid.py").exists(),
                       reason="reference checkout not available"),
]

# Dims the reference CLI can express (its models hard-code everything
# except these four flags, train_hybrid.py:393-400); small enough for the
# 1-core CPU host.
CFG = TrainConfig(latent_dim=16, feature_dim=32, num_experts=2,
                  embedding_dim=32, vae_lr=1e-3, teacher_lr=5e-4,
                  scheduler_t0=5, min_lr=1e-6, weight_decay=0.01, seed=0)
STEPS = 2  # optimizer steps taken on our side before export


@pytest.fixture(scope="module")
def ref():
    """Import the reference modules (sys.path scoped to this module)."""
    sys.path.insert(0, str(REF))
    try:
        import train_hybrid  # noqa: F401
        yield train_hybrid
    finally:
        sys.path.remove(str(REF))


def _optax_update(tx, params, opt_state):
    """Deterministic layout-revealing update: grad = 0.1 * param."""
    grads = jax.tree_util.tree_map(lambda p: 0.1 * p, params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    return params, opt_state


@pytest.fixture(scope="module")
def our_run(tmp_path_factory):
    """A short run on our side, exported as a reference latest.pt."""
    state = create_state(jax.random.PRNGKey(0), CFG)
    vae_tx, teacher_tx = make_optimizers(CFG)
    vp, vo = state.vae_params, state.vae_opt
    tp, to = state.teacher_params, state.teacher_opt
    for _ in range(STEPS):
        vp, vo = _optax_update(vae_tx, vp, vo)
        tp, to = _optax_update(teacher_tx, tp, to)
    state = state.replace(
        vae_params=vp, vae_opt=vo, teacher_params=tp, teacher_opt=to,
        step=np.int32(STEPS), best_loss=np.float32(0.75))
    out = tc.torch_checkpoint_from_state(state, CFG)
    path = tmp_path_factory.mktemp("export") / "latest.pt"
    torch.save(out, path)
    return state, out, str(path)


@pytest.fixture(scope="module")
def ref_trainer(ref, our_run, tmp_path_factory):
    """The reference's real TrainingManager resumed from our export."""
    from lunaris_orion_tpu.data.synthetic import write_synthetic_dataset

    _, _, ckpt_path = our_run
    data = tmp_path_factory.mktemp("refdata")
    write_synthetic_dataset(data, 12, image_size=128)  # ref requires 128px
    out_dir = tmp_path_factory.mktemp("refout")

    # The full flag surface main() would hand TrainingManager
    # (train_hybrid.py:1076-1133 defaults, CPU + our dims + resume).
    args = SimpleNamespace(
        data_dir=str(data), output_dir=str(out_dir), resume_from=ckpt_path,
        batch_size=2, gradient_accumulation_steps=1, chunk_size=32,
        num_epochs=1, num_workers=0, seed=0, compile=False,
        mixed_precision=False, latent_dim=CFG.latent_dim,
        embedding_dim=CFG.embedding_dim, feature_dim=CFG.feature_dim,
        num_experts=CFG.num_experts, vae_lr=CFG.vae_lr,
        teacher_lr=CFG.teacher_lr, min_lr=CFG.min_lr,
        weight_decay=CFG.weight_decay, max_grad_norm=1.0,
        scheduler_t0=CFG.scheduler_t0, recon_weight=1.0, kl_weight=0.1,
        quality_weight=0.5, log_every=100, save_every=1000,
        sample_every=500, keep_n_checkpoints=5, early_stopping_patience=7,
        eval_save_freq=500, reward_scale=0.1, semantic_weight=0.5,
        baseline_momentum=0.9, force_cpu=True, memory_efficient=False,
        sample_count=4)

    # Reference defect workaround: _setup_data passes 'timeout': 120
    # unconditionally (train_hybrid.py:570), which current torch rejects
    # for single-process loaders ("_SingleProcessDataLoaderIter requires
    # timeout == 0") — the reference's own --force_cpu path cannot start.
    orig_loader = ref.DataLoader

    def _loader(*a, **kw):
        if kw.get("num_workers", 0) == 0:
            kw["timeout"] = 0
        return orig_loader(*a, **kw)

    import signal as _signal
    old_sigint = _signal.getsignal(_signal.SIGINT)
    ref.DataLoader = _loader
    try:
        tm = ref.TrainingManager(args)
    finally:
        ref.DataLoader = orig_loader
        _signal.signal(_signal.SIGINT, old_sigint)  # undo the ref's handler
    yield tm
    tm.writer.close()


class TestStrictLoad:
    def test_vae_strict(self, ref, our_run):
        from lunar_generate import LunarisCoreVAE
        _, out, _ = our_run
        vae = LunarisCoreVAE(latent_dim=CFG.latent_dim)
        missing, unexpected = vae.load_state_dict(out["vae_state_dict"],
                                                  strict=True)
        assert not missing and not unexpected

    def test_teacher_strict(self, ref, our_run):
        from lunar_evaluator import LunarMoETeacher
        _, out, _ = our_run
        teacher = LunarMoETeacher(num_experts=CFG.num_experts,
                                  feature_dim=CFG.feature_dim,
                                  embedding_dim=CFG.embedding_dim)
        missing, unexpected = teacher.load_state_dict(
            out["teacher_state_dict"], strict=True)
        assert not missing and not unexpected


class TestRealVAEForwardParity:
    def test_encode_decode_parity(self, ref, our_run):
        """Deterministic (z = mu) encode->decode through the REAL reference
        VAE vs ours at the converted weights: the <1/255-per-pixel decode
        north star, previously pinned only against the torch mirror
        (test_torch_parity.py), here against lunar_generate.py itself.
        Runs at 128px because the reference's bottleneck FC hard-codes the
        32768-dim flatten (lunar_generate.py:124-125)."""
        import jax.numpy as jnp
        from lunar_generate import LunarisCoreVAE

        from lunaris_orion_tpu.models import vae as jvae

        state, out, _ = our_run
        vae = LunarisCoreVAE(latent_dim=CFG.latent_dim)
        vae.load_state_dict(out["vae_state_dict"], strict=True)
        vae.eval()

        rng = np.random.default_rng(3)
        x = rng.uniform(-1.0, 1.0, (1, 128, 128, 3)).astype(np.float32)
        with torch.no_grad():
            mu_t, logvar_t, skips_t = vae.encoder(
                torch.tensor(x.transpose(0, 3, 1, 2)))
            rec_t = vae.decoder(mu_t, skips_t).numpy().transpose(0, 2, 3, 1)

        vcfg = CFG.vae_config()
        mu_j, logvar_j, skips_j = jvae.encode(
            state.vae_params["encoder"], jnp.asarray(x), vcfg)
        rec_j = np.asarray(jvae.decode(
            state.vae_params["decoder"], mu_j, skips_j, vcfg))

        np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(),
                                   atol=2e-3, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(logvar_j), logvar_t.numpy(),
                                   atol=2e-3, rtol=1e-3)
        assert float(np.max(np.abs(rec_j - rec_t))) < 1.0 / 255.0


class TestReferenceTrainerResume:
    def test_restore_lands(self, ref_trainer, our_run):
        """_load_checkpoint succeeded: step/best_loss/schedule restored."""
        tm = ref_trainer
        assert tm.global_step == STEPS
        assert tm.best_loss == pytest.approx(0.75)
        want_lr = float(cosine_warm_restarts(
            CFG.vae_lr, CFG.scheduler_t0, CFG.min_lr)(STEPS))
        assert tm.vae_scheduler.get_last_lr()[0] == \
            pytest.approx(want_lr, rel=1e-6)

    def test_adam_moments_landed(self, ref_trainer, our_run):
        """The restored torch AdamW carries our exported moments."""
        state, _, _ = our_run
        opt_sd = ref_trainer.vae_optimizer.state_dict()
        assert all(int(ent["step"]) == STEPS
                   for ent in opt_sd["state"].values())
        mu, _, _ = tc.extract_adam_state(state.vae_opt)
        sd = {k: v.detach().numpy()
              for k, v in ref_trainer.vae.state_dict().items()}
        # Map the restored torch exp_avg back into our layout and compare.
        mu_back = tc.vae_params_from_torch(
            tc._overlay_opt_field(sd, opt_sd, "exp_avg"), CFG.vae_config())
        for a, b in zip(jax.tree_util.tree_leaves(mu),
                        jax.tree_util.tree_leaves(mu_back)):
            np.testing.assert_allclose(np.asarray(a, np.float64),
                                       np.asarray(b, np.float64),
                                       rtol=0, atol=0)

    def test_reference_save_roundtrips_to_us(self, ref_trainer, our_run,
                                             tmp_path):
        """tm._save_checkpoint() -> convert back -> byte-identical state."""
        state, _, _ = our_run
        tm = ref_trainer
        tm._save_checkpoint()
        saved = Path(tm.checkpoints_dir) / "latest.pt"
        assert saved.exists()
        back = tc.train_state_from_torch_checkpoint(str(saved), CFG)
        assert int(back.step) == STEPS
        assert float(back.best_loss) == pytest.approx(0.75)
        for field in ("vae_params", "teacher_params", "teacher_stats"):
            for a, b in zip(
                    jax.tree_util.tree_leaves(getattr(state, field)),
                    jax.tree_util.tree_leaves(getattr(back, field))):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for field in ("vae_opt", "teacher_opt"):
            mu0, nu0, c0 = tc.extract_adam_state(getattr(state, field))
            mu1, nu1, c1 = tc.extract_adam_state(getattr(back, field))
            assert c0 == c1 == STEPS
            for a, b in zip(jax.tree_util.tree_leaves((mu0, nu0)),
                            jax.tree_util.tree_leaves((mu1, nu1))):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
