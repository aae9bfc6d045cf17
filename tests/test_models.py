"""Model-tier tests: VAE and Teacher shapes, determinism, gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lunaris_orion_tpu.models import vae, teacher


class TestVAE:
    @pytest.mark.slow
    def test_forward_shapes(self, rng, tiny_vae_cfg):
        cfg = tiny_vae_cfg
        p = vae.init(rng, cfg)
        x = jax.random.normal(jax.random.fold_in(rng, 1),
                              (2, cfg.image_size, cfg.image_size, 3))
        recon, mu, logvar = vae.apply(p, x, rng=jax.random.fold_in(rng, 2), cfg=cfg)
        assert recon.shape == x.shape
        assert mu.shape == (2, cfg.latent_dim)
        assert logvar.shape == (2, cfg.latent_dim)
        assert float(jnp.max(jnp.abs(recon))) <= 1.0  # tanh output

    def test_default_config_param_count(self):
        """Docs claim ~35M params for the 128px/latent-256 VAE
        (reference docs/models.md:154-157)."""
        from lunaris_orion_tpu.config import VAEConfig
        cfg = VAEConfig()
        p = jax.eval_shape(lambda k: vae.init(k, cfg), jax.random.PRNGKey(0))
        n = sum(np.prod(l.shape) for l in jax.tree_util.tree_leaves(p))
        assert 25e6 < n < 45e6, n

    @pytest.mark.slow
    def test_sample_no_skips(self, rng, tiny_vae_cfg):
        cfg = tiny_vae_cfg
        p = vae.init(rng, cfg)
        imgs = vae.sample(p, jax.random.fold_in(rng, 9), 3, cfg)
        assert imgs.shape == (3, cfg.image_size, cfg.image_size, 3)

    @pytest.mark.slow
    def test_deterministic_with_mean_latent(self, rng, tiny_vae_cfg):
        cfg = tiny_vae_cfg
        p = vae.init(rng, cfg)
        x = jax.random.normal(jax.random.fold_in(rng, 1), (1, 32, 32, 3))
        r1, _, _ = vae.apply(p, x, rng=None, cfg=cfg, sample_posterior=False)
        r2, _, _ = vae.apply(p, x, rng=None, cfg=cfg, sample_posterior=False)
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))

    @pytest.mark.slow
    def test_grads_finite(self, rng, tiny_vae_cfg):
        cfg = tiny_vae_cfg
        p = vae.init(rng, cfg)
        x = jax.random.normal(jax.random.fold_in(rng, 1), (2, 32, 32, 3))

        def loss(pp):
            recon, mu, logvar = vae.apply(pp, x, rng=jax.random.fold_in(rng, 2),
                                          cfg=cfg)
            return (jnp.mean((recon - x) ** 2)
                    - 0.5 * jnp.mean(1 + logvar - mu**2 - jnp.exp(logvar)))

        grads = jax.grad(loss)(p)
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)
        # every parameter receives gradient signal
        nonzero = [float(jnp.max(jnp.abs(g))) > 0 for g in leaves]
        assert sum(nonzero) == len(nonzero)

    @pytest.mark.slow
    def test_bf16_compute(self, rng, tiny_vae_cfg):
        cfg = tiny_vae_cfg
        p = vae.init(rng, cfg)
        x = jax.random.normal(jax.random.fold_in(rng, 1), (2, 32, 32, 3),
                              jnp.bfloat16)
        recon, mu, logvar = vae.apply(p, x, rng=jax.random.fold_in(rng, 2),
                                      cfg=cfg)
        assert recon.dtype == jnp.bfloat16


class TestTeacher:
    @pytest.mark.slow
    def test_forward_shapes(self, rng, tiny_teacher_cfg):
        cfg = tiny_teacher_cfg
        p, s = teacher.init(rng, cfg)
        x = jax.random.normal(jax.random.fold_in(rng, 1),
                              (2, cfg.image_size, cfg.image_size, 3))
        out, ns = teacher.apply(p, s, x, cfg=cfg, train=False)
        assert out["quality_scores"].shape == (2, 4)
        assert out["expert_weights"].shape == (2, cfg.num_experts)
        assert out["style_embedding"].shape == (2, cfg.embedding_dim)
        assert out["prompt_embedding"].shape == (2, cfg.embedding_dim)
        assert out["semantic_score"].shape == (2, 1)
        w = np.asarray(out["expert_weights"])
        np.testing.assert_allclose(w.sum(-1), 1.0, rtol=1e-5)
        q = np.asarray(out["quality_scores"])
        assert ((q >= 0) & (q <= 1)).all()

    def test_eval_stats_unchanged(self, rng, tiny_teacher_cfg):
        cfg = tiny_teacher_cfg
        p, s = teacher.init(rng, cfg)
        x = jax.random.normal(jax.random.fold_in(rng, 1), (2, 32, 32, 3))
        _, ns = teacher.apply(p, s, x, cfg=cfg, train=False)
        for a, b in zip(jax.tree_util.tree_leaves(s),
                        jax.tree_util.tree_leaves(ns)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    @pytest.mark.slow
    def test_train_updates_stats(self, rng, tiny_teacher_cfg):
        cfg = tiny_teacher_cfg
        p, s = teacher.init(rng, cfg)
        x = jax.random.normal(jax.random.fold_in(rng, 1), (2, 32, 32, 3))
        _, ns = teacher.apply(p, s, x, cfg=cfg, train=True,
                              rng=jax.random.fold_in(rng, 2), remat=False)
        changed = [
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree_util.tree_leaves(s),
                            jax.tree_util.tree_leaves(ns))
        ]
        assert any(changed)
        # tree structure preserved (required for the jitted train-step carry)
        assert (jax.tree_util.tree_structure(s)
                == jax.tree_util.tree_structure(ns))

    def test_semantic_conditioning(self, rng, tiny_teacher_cfg):
        """semantic_score must depend on the provided prompt embedding
        (reference defect #10: it never did)."""
        cfg = tiny_teacher_cfg
        p, s = teacher.init(rng, cfg)
        x = jax.random.normal(jax.random.fold_in(rng, 1), (2, 32, 32, 3))
        out_none, _ = teacher.apply(p, s, x, cfg=cfg, train=False)
        emb = out_none["prompt_embedding"]
        out_self, _ = teacher.apply(p, s, x, cfg=cfg, train=False,
                                    prompt_embedding=emb)
        out_neg, _ = teacher.apply(p, s, x, cfg=cfg, train=False,
                                   prompt_embedding=-emb)
        # cos-sim with itself == 1 -> same score as unconditioned
        np.testing.assert_allclose(np.asarray(out_self["semantic_score"]),
                                   np.asarray(out_none["semantic_score"]),
                                   rtol=1e-5)
        # opposite embedding flips the sign
        np.testing.assert_allclose(np.asarray(out_neg["semantic_score"]),
                                   -np.asarray(out_none["semantic_score"]),
                                   rtol=1e-4, atol=1e-6)

    @pytest.mark.slow
    def test_grads_finite_with_remat(self, rng, tiny_teacher_cfg):
        cfg = tiny_teacher_cfg
        p, s = teacher.init(rng, cfg)
        x = jax.random.normal(jax.random.fold_in(rng, 1), (2, 32, 32, 3))

        def loss(pp):
            out, _ = teacher.apply(pp, s, x, cfg=cfg, train=True,
                                   rng=jax.random.fold_in(rng, 3), remat=True)
            return -jnp.mean(out["quality_scores"])

        grads = jax.grad(loss)(p)
        assert all(bool(jnp.all(jnp.isfinite(g)))
                   for g in jax.tree_util.tree_leaves(grads))

    def test_expert_stacking_matches_loop(self, rng, tiny_teacher_cfg):
        """vmapped stacked experts == running each expert's slice alone."""
        cfg = tiny_teacher_cfg
        p, s = teacher.init(rng, cfg)
        x = jax.random.normal(jax.random.fold_in(rng, 1), (2, 32, 32, 3))
        out, _ = teacher.apply(p, s, x, cfg=cfg, train=False,
                               want_feature_maps=True)
        fm = out["feature_maps"]  # [E, B, H, W, C]
        # Re-run expert 1 alone by slicing its params
        import jax.tree_util as jtu
        from lunaris_orion_tpu.models.teacher import (extractor_apply,
                                                      expert_block_apply, _Rng)
        feats, _ = extractor_apply(p["extractor"], s["extractor"], x, cfg=cfg,
                                   train=False, rng=_Rng(None))
        ex = feats
        for li in range(cfg.expert_layers):
            lp = jtu.tree_map(lambda a: a[1], p["experts"][f"layer{li}"])
            ls = jtu.tree_map(lambda a: a[1], s["experts"][f"layer{li}"])
            ex, _ = expert_block_apply(lp, ls, ex, cfg=cfg, train=False,
                                       rng=_Rng(None), remat=False)
        np.testing.assert_allclose(np.asarray(fm[1]), np.asarray(ex),
                                   rtol=1e-4, atol=1e-5)
