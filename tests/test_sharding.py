"""Multi-device sharding tests on the 8-virtual-device CPU mesh.

Validates the DP/TP/EP placement plan (SURVEY.md §2.6) end-to-end: the full
hybrid train step jit-compiles and executes over a ('data','model') mesh
with batch sharded over 'data', the bottleneck FC pair sharded over 'model',
and the stacked experts sharded over 'model'.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from lunaris_orion_tpu.config import TrainConfig, VAEConfig, TeacherConfig
from lunaris_orion_tpu.parallel import make_mesh, state_shardings, batch_sharding
from lunaris_orion_tpu.train.state import create_state
from lunaris_orion_tpu.train.step import make_train_step

VCFG = VAEConfig(latent_dim=16, image_size=16, base_channels=16)
TCFG = TeacherConfig(
    num_experts=2, feature_dim=16, extractor_dim=16, extractor_stem=8,
    branch_dim=8, expert_layers=1, intermediate_dim=16, embedding_dim=8,
    num_heads=4, rel_pos_size=4, image_size=16)
CFG = TrainConfig(batch_size=8, gradient_accumulation_steps=2,
                  latent_dim=16, feature_dim=16, num_experts=2,
                  embedding_dim=8, image_size=16)


@pytest.fixture(scope="module")
def sharded():
    assert len(jax.devices()) == 8, "conftest must force 8 cpu devices"
    mesh = make_mesh((4, 2))
    abstract = jax.eval_shape(
        lambda k: create_state(k, CFG, VCFG, TCFG), jax.random.PRNGKey(0))
    shards = state_shardings(abstract, mesh, num_experts=TCFG.num_experts,
                             latent_dim=VCFG.latent_dim)
    state = jax.jit(lambda k: create_state(k, CFG, VCFG, TCFG),
                    out_shardings=shards)(jax.random.PRNGKey(0))
    return mesh, shards, state


@pytest.mark.slow
class TestShardingPlacement:
    def test_fc_mu_is_tensor_parallel(self, sharded):
        mesh, shards, state = sharded
        s = state.vae_params["encoder"]["fc_mu"]["w"].sharding
        assert s.spec == P(None, "model")
        s2 = state.vae_params["decoder"]["fc"]["w"].sharding
        assert s2.spec == P("model", None)

    def test_experts_are_expert_parallel(self, sharded):
        mesh, shards, state = sharded
        leaf = state.teacher_params["experts"]["layer0"]["conv1"]["conv"]["w"]
        assert leaf.sharding.spec[0] == "model"

    def test_opt_state_mirrors_params(self, sharded):
        """adam mu/nu clones of the TP weights carry the same spec."""
        mesh, shards, state = sharded
        mu_tree = state.vae_opt[1][0].mu  # chain(clip, adamw) -> adamw state
        assert mu_tree["encoder"]["fc_mu"]["w"].sharding.spec == P(None, "model")

    def test_train_step_runs_sharded(self, sharded):
        mesh, shards, state = sharded
        step = jax.jit(make_train_step(CFG, VCFG, TCFG),
                       in_shardings=(shards, batch_sharding(mesh)),
                       out_shardings=(shards, None))
        imgs = jax.device_put(
            np.random.default_rng(0).integers(
                0, 256, (2, 8, 16, 16, 3), dtype=np.uint8),
            batch_sharding(mesh))
        state2, metrics = step(state, imgs)
        assert np.isfinite(float(metrics["total_loss"]))
        assert int(state2.step) == 1
        # TP placement preserved through the update
        assert (state2.vae_params["encoder"]["fc_mu"]["w"].sharding.spec
                == P(None, "model"))

    @pytest.mark.slow
    def test_ring_attention_train_step(self):
        """--attn_impl ring e2e: the FULL hybrid train step with the
        teacher's attention running as cross-chip ring context parallelism
        over the model axis (tokens sharded, k/v rotating via ppermute,
        experts replicated) compiles, executes, and matches the
        single-device step's metrics. Dropout 0 so the hash-mask ring and
        the rng-based single-device path are comparable."""
        vcfg = VCFG
        tcfg = TeacherConfig(
            num_experts=2, feature_dim=16, extractor_dim=16,
            extractor_stem=8, branch_dim=8, expert_layers=1,
            intermediate_dim=16, embedding_dim=8, num_heads=4,
            rel_pos_size=4, image_size=16, dropout_rate=0.0)
        cfg = CFG  # dropout lives in TeacherConfig; VAE rng use is identical
        state = create_state(jax.random.PRNGKey(0), cfg, vcfg, tcfg)
        imgs = np.random.default_rng(2).integers(
            0, 256, (2, 8, 16, 16, 3), dtype=np.uint8)

        single = jax.jit(make_train_step(cfg, vcfg, tcfg, attn_impl="full"))
        _, m1 = single(state, jnp.asarray(imgs))

        mesh = make_mesh((2, 4))  # tokens 256 -> 64 per model shard
        abstract = jax.eval_shape(
            lambda k: create_state(k, cfg, vcfg, tcfg), jax.random.PRNGKey(0))
        shards = state_shardings(abstract, mesh,
                                 num_experts=tcfg.num_experts,
                                 latent_dim=vcfg.latent_dim,
                                 shard_experts=False)
        state_r = jax.device_put(state, shards)
        step = jax.jit(
            make_train_step(cfg, vcfg, tcfg, attn_impl="ring",
                            cp_mesh=mesh, cp_axis="model",
                            cp_batch_axis="data"),
            in_shardings=(shards, batch_sharding(mesh)),
            out_shardings=(shards, None))
        state2, m2 = step(state_r, jax.device_put(imgs, batch_sharding(mesh)))
        assert int(state2.step) == 1
        for k in m1:
            np.testing.assert_allclose(float(m1[k]), float(m2[k]),
                                       rtol=2e-4, atol=1e-6, err_msg=k)

    @pytest.mark.slow
    def test_dp_matches_single_device(self):
        """Pure-DP sharded step == single-device step (same seed)."""
        state = create_state(jax.random.PRNGKey(0), CFG, VCFG, TCFG)
        imgs = np.random.default_rng(1).integers(
            0, 256, (2, 8, 16, 16, 3), dtype=np.uint8)

        single = jax.jit(make_train_step(CFG, VCFG, TCFG))
        _, m1 = single(state, jnp.asarray(imgs))

        mesh = make_mesh((8, 1))
        abstract = jax.eval_shape(
            lambda k: create_state(k, CFG, VCFG, TCFG), jax.random.PRNGKey(0))
        shards = state_shardings(abstract, mesh,
                                 num_experts=TCFG.num_experts,
                                 latent_dim=VCFG.latent_dim)
        state_r = jax.device_put(state, shards)
        stepd = jax.jit(make_train_step(CFG, VCFG, TCFG),
                        in_shardings=(shards, batch_sharding(mesh)),
                        out_shardings=(shards, None))
        _, m2 = stepd(state_r, jax.device_put(imgs, batch_sharding(mesh)))
        for k in m1:
            np.testing.assert_allclose(float(m1[k]), float(m2[k]),
                                       rtol=2e-4, atol=1e-6, err_msg=k)
