"""Local-window attention: the corrected realization of the reference's
intended memory-efficient chunked attention (lunar_evaluator.py:190-218,
whose shipped chunking overwrites output slices — docs/parity.md). An
opt-in deviation knob: tokens attend within contiguous windows of the
flattened token axis, cutting score work from O(N^2) to O(N*window).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lunaris_orion_tpu.config import TeacherConfig, TrainConfig
from lunaris_orion_tpu.ops import attention as attn


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


def _qkvb(rng, b=2, h=2, n=256, d=8, with_bias=True):
    ks = jax.random.split(rng, 4)
    q = jax.random.normal(ks[0], (b, h, n, d))
    k = jax.random.normal(ks[1], (b, h, n, d))
    v = jax.random.normal(ks[2], (b, h, n, d))
    bias = jax.random.normal(ks[3], (h, n)) if with_bias else None
    return q, k, v, bias


def _dense_local(q, k, v, bias, window):
    """Block-diagonal dense reference: per-window softmax attention."""
    b, h, n, d = q.shape
    nw = n // window
    out = np.zeros((b, h, n, d), np.float32)
    qn, kn, vn = (np.asarray(t, np.float32) for t in (q, k, v))
    bn = None if bias is None else np.asarray(bias, np.float32)
    for wi in range(nw):
        sl = slice(wi * window, (wi + 1) * window)
        s = np.einsum("bhqd,bhkd->bhqk", qn[:, :, sl], kn[:, :, sl])
        s = s * (d ** -0.5)
        if bn is not None:
            s = s + bn[None, :, None, sl]
        s = s - s.max(-1, keepdims=True)
        p = np.exp(s)
        p /= p.sum(-1, keepdims=True)
        out[:, :, sl] = np.einsum("bhqk,bhkd->bhqd", p, vn[:, :, sl])
    return out


class TestLocalWindow:
    @pytest.mark.parametrize("window", [64, 128, 256])
    def test_matches_dense_blockdiagonal(self, rng, window):
        q, k, v, bias = _qkvb(rng, n=256)
        out = attn.local_window_attention(q, k, v, bias, window=window)
        ref = _dense_local(q, k, v, bias, window)
        np.testing.assert_allclose(np.asarray(out), ref,
                                   rtol=2e-5, atol=2e-5)

    def test_window_equal_n_matches_full(self, rng):
        q, k, v, bias = _qkvb(rng, n=128)
        out = attn.local_window_attention(q, k, v, bias, window=128)
        ref = attn.full_attention(q, k, v, bias)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_no_bias(self, rng):
        q, k, v, _ = _qkvb(rng, n=256, with_bias=False)
        out = attn.local_window_attention(q, k, v, None, window=64)
        ref = _dense_local(q, k, v, None, 64)
        np.testing.assert_allclose(np.asarray(out), ref,
                                   rtol=2e-5, atol=2e-5)

    def test_large_window(self, rng):
        """A >1k window at multi-window N (the window-sweep lax.map with a
        big per-window tile)."""
        q, k, v, bias = _qkvb(rng, b=1, h=1, n=4096, d=4)
        out = attn.local_window_attention(q, k, v, bias, window=2048)
        ref = _dense_local(q, k, v, bias, 2048)
        np.testing.assert_allclose(np.asarray(out), ref,
                                   rtol=5e-5, atol=5e-5)

    def test_indivisible_window_raises(self, rng):
        q, k, v, bias = _qkvb(rng, n=256)
        with pytest.raises(ValueError, match="divide"):
            attn.local_window_attention(q, k, v, bias, window=100)

    def test_grads_flow_and_are_local(self, rng):
        """d out[first window] / d v[other windows] must be exactly zero."""
        q, k, v, bias = _qkvb(rng, b=1, h=1, n=128, d=4)

        def f(vv):
            o = attn.local_window_attention(q, k, vv, bias, window=64)
            return jnp.sum(o[:, :, :64] ** 2)

        g = jax.grad(f)(v)
        assert float(jnp.abs(g[:, :, :64]).max()) > 0
        np.testing.assert_array_equal(np.asarray(g[:, :, 64:]), 0.0)


class TestBatchedBias:
    def test_flash_xla_batched_bias(self, rng):
        """flash_attention_xla with [B, heads, N] bias == per-sample full
        attention with that sample's [heads, N] bias."""
        q, k, v, _ = _qkvb(rng, b=3, h=2, n=256, d=8, with_bias=False)
        bb = jax.random.normal(jax.random.fold_in(rng, 9), (3, 2, 256))
        out = attn.flash_attention_xla(q, k, v, bb, block_q=64, block_k=128)
        for i in range(3):
            ref = attn.full_attention(q[i:i + 1], k[i:i + 1], v[i:i + 1],
                                      bb[i])
            np.testing.assert_allclose(np.asarray(out[i:i + 1]),
                                       np.asarray(ref), rtol=2e-5,
                                       atol=2e-5)

    def test_full_attention_batched_bias(self, rng):
        q, k, v, _ = _qkvb(rng, b=2, h=2, n=64, d=8, with_bias=False)
        bb = jax.random.normal(jax.random.fold_in(rng, 9), (2, 2, 64))
        out = attn.full_attention(q, k, v, bb)
        for i in range(2):
            ref = attn.full_attention(q[i:i + 1], k[i:i + 1], v[i:i + 1],
                                      bb[i])
            np.testing.assert_allclose(np.asarray(out[i:i + 1]),
                                       np.asarray(ref), rtol=2e-5,
                                       atol=2e-5)


class TestModuleAndConfig:
    def test_module_window_matches_local(self, rng):
        """spatial_attention_reference(window=...) routes to the local path
        and matches composing the pieces by hand."""
        from lunaris_orion_tpu.ops import layers

        p = attn.attention_init(rng, 16, num_heads=4, rel_pos_size=4)
        x = jax.random.normal(jax.random.fold_in(rng, 1), (2, 16, 16, 16))
        out = attn.spatial_attention_reference(p, x, num_heads=4, window=64)
        q, k, v = attn.multihead_qkv(p, x, 4)
        bias = attn.rel_pos_bias(p, 16, 16)
        o = attn.local_window_attention(q, k, v, bias, window=64)
        o = o.transpose(0, 2, 1, 3).reshape(2, 16, 16, 16)
        ref = layers.conv2d(p["proj"], o)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_module_window_geq_n_is_global(self, rng):
        p = attn.attention_init(rng, 16, num_heads=4, rel_pos_size=4)
        x = jax.random.normal(jax.random.fold_in(rng, 1), (1, 8, 8, 16))
        out_w = attn.spatial_attention_reference(p, x, num_heads=4,
                                                 window=64)
        out_g = attn.spatial_attention_reference(p, x, num_heads=4,
                                                 impl="full")
        np.testing.assert_allclose(np.asarray(out_w), np.asarray(out_g),
                                   rtol=2e-5, atol=2e-5)

    def test_window_rejects_ring(self, rng):
        p = attn.attention_init(rng, 16, num_heads=4, rel_pos_size=4)
        x = jax.random.normal(rng, (1, 8, 8, 16))
        with pytest.raises(ValueError, match="ring"):
            attn.spatial_attention_reference(p, x, num_heads=4, window=16,
                                             impl="ring")

    def test_window_rejects_forced_pallas(self, rng):
        """use_pallas=True is an assertion; the window path must refuse it
        rather than silently substituting the XLA local path."""
        p = attn.attention_init(rng, 16, num_heads=4, rel_pos_size=4)
        x = jax.random.normal(rng, (1, 8, 8, 16))
        with pytest.raises(ValueError, match="pallas"):
            attn.spatial_attention_reference(p, x, num_heads=4, window=16,
                                             impl="pallas")

    def test_nonpositive_window_raises(self, rng):
        """window<=0 must fail with a validation message, not
        ZeroDivisionError / an opaque negative-dim reshape error.
        (TrainConfig 0 means global and is normalized at the config seam,
        config.py teacher_config; these are direct-caller values.)"""
        q, k, v, bias = _qkvb(rng, n=256)
        with pytest.raises(ValueError, match="positive"):
            attn.local_window_attention(q, k, v, bias, window=0)
        p = attn.attention_init(rng, 16, num_heads=4, rel_pos_size=4)
        x = jax.random.normal(rng, (1, 8, 8, 16))
        for w in (0, -64):
            with pytest.raises(ValueError, match="positive"):
                attn.spatial_attention_reference(p, x, num_heads=4, window=w)

    def test_config_threading(self):
        cfg = TrainConfig(attn_window=512)
        assert cfg.teacher_config().attn_window == 512
        assert TrainConfig().teacher_config().attn_window is None

    @pytest.mark.slow
    def test_teacher_forward_with_window(self, rng):
        """The full teacher runs under the window knob (vmapped experts
        included) and differs from the global-attention output."""
        import dataclasses

        from lunaris_orion_tpu.models import teacher as teacher_mod

        tcfg = TeacherConfig(num_experts=2, feature_dim=16,
                             extractor_dim=16, extractor_stem=8,
                             branch_dim=8, expert_layers=2,
                             intermediate_dim=16, embedding_dim=8,
                             num_heads=4, rel_pos_size=4, image_size=32)
        params, stats = teacher_mod.init(rng, tcfg)
        x = jax.random.normal(jax.random.fold_in(rng, 2), (2, 32, 32, 3))
        out_g, _ = teacher_mod.apply(params, stats, x, cfg=tcfg,
                                     train=False)
        wcfg = dataclasses.replace(tcfg, attn_window=64)
        out_w, _ = teacher_mod.apply(params, stats, x, cfg=wcfg,
                                     train=False)
        q_g = np.asarray(out_g["quality_scores"])
        q_w = np.asarray(out_w["quality_scores"])
        assert q_w.shape == q_g.shape
        assert np.all(np.isfinite(q_w))
        assert float(np.abs(q_w - q_g).max()) > 0  # semantics differ

    @pytest.mark.slow
    def test_dropout_trains(self, rng):
        """Window + dropout: gradients finite and nonzero through the
        module."""
        p = attn.attention_init(rng, 16, num_heads=4, rel_pos_size=4)
        x = jax.random.normal(jax.random.fold_in(rng, 3), (2, 16, 16, 16))

        def f(pp):
            o = attn.spatial_attention_reference(
                pp, x, num_heads=4, window=64, dropout_rate=0.2,
                rng=jax.random.PRNGKey(5), train=True)
            return jnp.sum(o ** 2)

        g = jax.grad(f)(p)
        norms = [float(jnp.linalg.norm(t)) for t in
                 jax.tree_util.tree_leaves(g)]
        assert all(np.isfinite(norms)) and max(norms) > 0
