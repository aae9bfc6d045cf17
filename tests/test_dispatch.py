"""ops.dispatch: Pallas/XLA selection, differentiable wrappers, strict
use_pallas semantics (VERDICT r1 items 5 and 8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lunaris_orion_tpu.ops import attention as attn_mod
from lunaris_orion_tpu.ops import dispatch, layers
from lunaris_orion_tpu.train import losses


@pytest.fixture(autouse=True)
def _clean_overrides():
    dispatch.clear_overrides()
    yield
    dispatch.clear_overrides()


class TestChoose:
    def test_cpu_defaults_to_xla(self):
        assert jax.default_backend() == "cpu"
        for op in ("attention", "gn_mish", "mse_kl"):
            assert dispatch.choose(op) == "xla"

    def test_override_wins(self):
        dispatch.set_override("gn_mish", "pallas")
        assert dispatch.choose("gn_mish") == "pallas"
        dispatch.set_override("gn_mish", None)
        assert dispatch.choose("gn_mish") == "xla"

    def test_env_override(self, monkeypatch):
        monkeypatch.setenv("LUNARIS_DISPATCH", "mse_kl=pallas, gn_mish=xla")
        assert dispatch.choose("mse_kl") == "pallas"
        assert dispatch.choose("gn_mish") == "xla"


class TestDispatchedOps:
    @pytest.mark.slow
    def test_gn_mish_pallas_matches_xla_fwd_and_grad(self):
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (2, 8, 8, 16), jnp.float32)
        p = layers.group_norm_init(16)

        def loss(xx, impl):
            dispatch.set_override("gn_mish", impl)
            try:
                return jnp.sum(layers.group_norm_mish(p, xx, groups=8) ** 2)
            finally:
                dispatch.set_override("gn_mish", None)

        y_x, g_x = jax.value_and_grad(lambda xx: loss(xx, "xla"))(x)
        y_p, g_p = jax.value_and_grad(lambda xx: loss(xx, "pallas"))(x)
        np.testing.assert_allclose(y_p, y_x, rtol=1e-5)
        np.testing.assert_allclose(g_p, g_x, rtol=1e-4, atol=1e-5)

    def test_mse_kl_pallas_matches_xla_fwd_and_grad(self):
        key = jax.random.PRNGKey(1)
        ks = jax.random.split(key, 4)
        recon = jax.random.normal(ks[0], (2, 8, 8, 3))
        x = jax.random.normal(ks[1], (2, 8, 8, 3))
        mu = jax.random.normal(ks[2], (2, 16))
        lv = jax.random.normal(ks[3], (2, 16)) * 0.1

        def total(r, m, l, impl):
            dispatch.set_override("mse_kl", impl)
            try:
                rl, kl = losses.recon_kl(r, x, m, l)
            finally:
                dispatch.set_override("mse_kl", None)
            return rl + 0.1 * kl

        f_x = jax.value_and_grad(lambda r, m, l: total(r, m, l, "xla"),
                                 argnums=(0, 1, 2))
        f_p = jax.value_and_grad(lambda r, m, l: total(r, m, l, "pallas"),
                                 argnums=(0, 1, 2))
        y_x, g_x = f_x(recon, mu, lv)
        y_p, g_p = f_p(recon, mu, lv)
        np.testing.assert_allclose(y_p, y_x, rtol=1e-5)
        for a, b in zip(g_p, g_x):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


class TestUsePallasStrict:
    def test_forced_pallas_on_cpu_raises(self):
        key = jax.random.PRNGKey(0)
        p = attn_mod.attention_init(key, 16, num_heads=4, rel_pos_size=4)
        x = jax.random.normal(key, (1, 16, 16, 16))
        with pytest.raises(RuntimeError, match="requires a TPU backend"):
            attn_mod.spatial_attention_reference(p, x, num_heads=4,
                                                 impl="pallas")

    def test_trainer_maps_use_pallas_flag(self):
        from lunaris_orion_tpu.config import TrainConfig
        from lunaris_orion_tpu.train.loop import _attn_impl
        assert _attn_impl(TrainConfig(use_pallas=True)) == "pallas"
        assert _attn_impl(TrainConfig(use_pallas=False)) == "flash"
        assert _attn_impl(TrainConfig(use_pallas=None)) == "auto"


class TestAutoHeadDimGate:
    """Auto dispatch routes to the Pallas kernel only when head_dim
    satisfies Mosaic sublane tiling (bf16 %16 / f32 %8) — other dims take
    the XLA flash path (ops/attention.py)."""

    def _probe(self, monkeypatch, channels, heads, dtype):
        from lunaris_orion_tpu.ops.pallas import flash_attention as fa
        key = jax.random.PRNGKey(0)
        p = attn_mod.attention_init(key, channels, num_heads=heads,
                                    rel_pos_size=4)
        x = jax.random.normal(key, (1, 48, 48, channels), dtype)  # N=2304
        dispatch.set_override("attention", "pallas")
        hit = {}

        def sentinel(*a, **k):
            hit["pallas"] = True
            raise RuntimeError("pallas-sentinel")

        monkeypatch.setattr(fa, "attention_bhnd", sentinel)
        try:
            attn_mod.spatial_attention_reference(p, x, num_heads=heads)
        except RuntimeError as e:
            assert "pallas-sentinel" in str(e)
        finally:
            dispatch.set_override("attention", None)
        return "pallas" in hit

    def test_tiling_compatible_dim_takes_pallas(self, monkeypatch):
        # f32, head_dim 8: 8 % 8 == 0 -> pallas
        assert self._probe(monkeypatch, channels=32, heads=4,
                           dtype=jnp.float32)

    def test_incompatible_dim_falls_back(self, monkeypatch):
        # f32, head_dim 12: 12 % 8 != 0 -> XLA flash (sentinel not hit)
        assert not self._probe(monkeypatch, channels=48, heads=4,
                               dtype=jnp.float32)

    def test_bf16_needs_16_multiple(self, monkeypatch):
        # bf16, head_dim 8: 8 % 16 != 0 -> XLA flash
        assert not self._probe(monkeypatch, channels=32, heads=4,
                               dtype=jnp.bfloat16)


class TestForcedPallasHeadDimGate:
    """use_pallas=True must surface the same head_dim sublane gate the auto
    path enforces as a clear ValueError, not an opaque Mosaic compile error
    (ADVICE r2). Backend is mocked to TPU so the gate itself is reached."""

    def _forced(self, monkeypatch, channels, heads, dtype):
        key = jax.random.PRNGKey(0)
        p = attn_mod.attention_init(key, channels, num_heads=heads,
                                    rel_pos_size=4)
        x = jax.random.normal(key, (1, 16, 16, channels), dtype)  # N=256
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        return attn_mod.spatial_attention_reference(
            p, x, num_heads=heads, impl="pallas")

    def test_f32_head_dim_12_raises(self, monkeypatch):
        with pytest.raises(ValueError, match="head_dim 12 is not a multiple"):
            self._forced(monkeypatch, channels=48, heads=4, dtype=jnp.float32)

    def test_bf16_head_dim_8_raises(self, monkeypatch):
        with pytest.raises(ValueError, match="head_dim 8 is not a multiple"):
            self._forced(monkeypatch, channels=32, heads=4, dtype=jnp.bfloat16)

    def test_seq_len_gate_still_first(self, monkeypatch):
        key = jax.random.PRNGKey(0)
        p = attn_mod.attention_init(key, 48, num_heads=4, rel_pos_size=4)
        x = jax.random.normal(key, (1, 15, 15, 48))  # N=225, not %128
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        with pytest.raises(ValueError, match="not a.*multiple of 128"):
            attn_mod.spatial_attention_reference(p, x, num_heads=4,
                                                 impl="pallas")
