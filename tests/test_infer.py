"""Inference-tier tests: generator rejection sampling + evaluator scoring."""

import json

import jax
import numpy as np
import pytest

from lunaris_orion_tpu.config import TrainConfig, VAEConfig, TeacherConfig
from lunaris_orion_tpu.train.checkpoint import CheckpointService
from lunaris_orion_tpu.train.state import create_state

CFG = TrainConfig(batch_size=4, latent_dim=16, feature_dim=16, num_experts=2,
                  embedding_dim=8, image_size=16)
VCFG = CFG.vae_config()
TCFG = CFG.teacher_config()


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ckpt")
    state = create_state(jax.random.PRNGKey(0), CFG, VCFG, TCFG)
    svc = CheckpointService(str(d), keep_n=2)
    svc.save(0, state, config=CFG, best=True)
    svc.close()
    return d


class TestGenerator:
    @pytest.mark.slow
    def test_generate_and_save(self, ckpt_dir, tmp_path):
        from lunaris_orion_tpu.infer.generator import ImageGenerator
        gen = ImageGenerator(str(ckpt_dir))
        imgs, meta = gen.generate(3, temperature=0.8, quality_threshold=0.0,
                                  seed=7)
        assert imgs.shape == (3, 16, 16, 3) and imgs.dtype == np.uint8
        assert len(meta) == 3
        assert all(0.0 <= m["quality"] <= 1.0 for m in meta)

        out = tmp_path / "gen"
        paths = gen.save_outputs(imgs, meta, str(out), prompt="test prompt")
        pngs = list(out.glob("sample_*.png"))
        assert len(pngs) == 3
        assert list(out.glob("grid_*.png"))
        meta_files = list(out.glob("metadata_*.json"))
        assert meta_files
        data = json.loads(meta_files[0].read_text())
        assert data["prompt"] == "test prompt"
        assert len(data["samples"]) == 3

    def test_threshold_fallback(self, ckpt_dir):
        """Impossible threshold: still returns n images, flagged."""
        from lunaris_orion_tpu.infer.generator import ImageGenerator
        gen = ImageGenerator(str(ckpt_dir))
        imgs, meta = gen.generate(2, quality_threshold=1.1, max_attempts=2,
                                  seed=1)
        assert imgs.shape[0] == 2
        assert all(m.get("below_threshold") for m in meta)

    def test_seed_reproducible(self, ckpt_dir):
        from lunaris_orion_tpu.infer.generator import ImageGenerator
        gen = ImageGenerator(str(ckpt_dir))
        a, _ = gen.generate(2, quality_threshold=0.0, seed=42)
        b, _ = gen.generate(2, quality_threshold=0.0, seed=42)
        np.testing.assert_array_equal(a, b)

    def test_step_pinned_load(self, tmp_path):
        """step= loads a specific rotation slot, not just the latest —
        needed for step-matched A/B evaluation (tools/window_quality_eval)."""
        from lunaris_orion_tpu.infer.generator import ImageGenerator
        d = tmp_path / "ckpt2"
        s0 = create_state(jax.random.PRNGKey(0), CFG, VCFG, TCFG)
        s1 = s0.replace(step=s0.step + 10)
        svc = CheckpointService(str(d), keep_n=2)
        svc.save(0, s0, config=CFG)
        svc.save(10, s1)
        svc.close()
        assert ImageGenerator(str(d)).step == 10
        assert ImageGenerator(str(d), step=0).step == 0
        with pytest.raises(ValueError, match="single checkpoint"):
            ImageGenerator(str(tmp_path / "x.pt"), step=0)


class TestEvaluator:
    def test_score_batch_fields(self, ckpt_dir):
        from lunaris_orion_tpu.infer.evaluator import QualityEvaluator
        ev = QualityEvaluator(str(ckpt_dir))
        imgs = np.random.default_rng(0).integers(
            0, 256, (3, 16, 16, 3), dtype=np.uint8)
        scores = ev.score_batch(imgs)
        assert len(scores) == 3
        s = scores[0]
        assert {"edge_quality", "color_consistency", "detail", "overall",
                "mean_quality", "semantic_score", "expert_weights"} <= set(s)
        assert len(s["expert_weights"]) == TCFG.num_experts
        np.testing.assert_allclose(sum(s["expert_weights"]), 1.0, rtol=1e-4)

    @pytest.mark.slow
    def test_score_directory_shard(self, ckpt_dir, tmp_path):
        from lunaris_orion_tpu.infer.evaluator import QualityEvaluator
        from lunaris_orion_tpu.data.synthetic import write_synthetic_dataset
        write_synthetic_dataset(tmp_path, 6, image_size=16)
        ev = QualityEvaluator(str(ckpt_dir))
        results = ev.score_directory(str(tmp_path), batch_size=4)
        assert len(results) == 6

    @pytest.mark.slow
    def test_bf16_scoring_close_to_f32(self, ckpt_dir):
        """--bf16 scoring (reference-autocast-like numerics) stays close to
        the f32 path and returns f32 finite fields."""
        from lunaris_orion_tpu.infer.evaluator import QualityEvaluator
        imgs = np.random.default_rng(1).integers(
            0, 256, (4, 16, 16, 3), dtype=np.uint8)
        s32 = QualityEvaluator(str(ckpt_dir)).score_batch(imgs)
        s16 = QualityEvaluator(str(ckpt_dir), bf16=True).score_batch(imgs)
        for a, b in zip(s32, s16):
            assert np.isfinite(b["mean_quality"])
            assert abs(a["mean_quality"] - b["mean_quality"]) < 0.05
            assert abs(a["semantic_score"] - b["semantic_score"]) < 0.05

    def test_bf16_generation(self, ckpt_dir):
        from lunaris_orion_tpu.infer.generator import ImageGenerator
        gen = ImageGenerator(str(ckpt_dir), bf16=True)
        imgs, meta = gen.generate(2, quality_threshold=0.0, seed=3)
        assert imgs.shape == (2, 16, 16, 3) and imgs.dtype == np.uint8
        assert all(np.isfinite(m["quality"]) for m in meta)

    @pytest.mark.slow
    def test_score_directory_window_fallback(self, ckpt_dir, tmp_path):
        """A shape group whose token count the attn_window override cannot
        tile (N=256, window=96) falls back to global attention for that
        group instead of aborting and losing all results — and the fallback
        scores equal the window-free evaluator's."""
        from PIL import Image
        from lunaris_orion_tpu.infer.evaluator import QualityEvaluator

        r = np.random.default_rng(3)
        for i in range(3):
            img = r.integers(0, 256, (16, 16, 3), dtype=np.uint8)
            Image.fromarray(img).save(tmp_path / f"s_{i}.png")
        ev = QualityEvaluator(str(ckpt_dir), attn_window=96)
        with pytest.warns(UserWarning, match="global-fallback"):
            results = ev.score_directory(str(tmp_path), batch_size=2)
        assert len(results) == 3
        ref = QualityEvaluator(str(ckpt_dir)).score_directory(
            str(tmp_path), batch_size=2)
        for name, s in results.items():
            # the mode switch is marked, never silent (scores deviate
            # between window and global modes by design)
            assert s["attn_mode"] == "global-fallback"
            np.testing.assert_allclose(s["mean_quality"],
                                       ref[name]["mean_quality"], rtol=1e-5)
