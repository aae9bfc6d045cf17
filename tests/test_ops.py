"""Unit tests for the ops tier: conv/transpose torch parity, norms, attention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as tF

from lunaris_orion_tpu.ops import layers, attention
from lunaris_orion_tpu.ops.activations import mish


def _np(x):
    return np.asarray(x)


class TestConvTorchParity:
    def test_conv2d_matches_torch(self, rng):
        x = jax.random.normal(rng, (2, 16, 16, 5))
        p = layers.conv2d_init(jax.random.fold_in(rng, 1), 5, 7, 3)
        out = layers.conv2d(p, x)
        # torch: NCHW, OIHW
        tx = torch.tensor(_np(x).transpose(0, 3, 1, 2))
        tw = torch.tensor(_np(p["w"]).transpose(3, 2, 0, 1))
        tb = torch.tensor(_np(p["b"]))
        tout = tF.conv2d(tx, tw, tb, padding=1).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(_np(out), tout, rtol=1e-4, atol=1e-5)

    def test_strided_conv_matches_torch(self, rng):
        x = jax.random.normal(rng, (2, 16, 16, 4))
        p = layers.conv2d_init(jax.random.fold_in(rng, 2), 4, 8, 3)
        out = layers.conv2d(p, x, stride=2)
        assert out.shape == (2, 8, 8, 8)
        tx = torch.tensor(_np(x).transpose(0, 3, 1, 2))
        tw = torch.tensor(_np(p["w"]).transpose(3, 2, 0, 1))
        tout = tF.conv2d(tx, tw, torch.tensor(_np(p["b"])), stride=2,
                         padding=1).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(_np(out), tout, rtol=1e-4, atol=1e-5)

    def test_conv_transpose_matches_torch(self, rng):
        """Pins the dilated-conv realization of ConvTranspose2d(4,2,1).

        torch weight [in, out, kh, kw]; ours is the equivalent regular-conv
        weight: spatially flipped, HWIO.
        """
        x = jax.random.normal(rng, (2, 8, 8, 6))
        p = layers.conv2d_transpose_init(jax.random.fold_in(rng, 3), 6, 4, 4)
        out = layers.conv2d_transpose(p, x)
        assert out.shape == (2, 16, 16, 4)
        w = _np(p["w"])  # [kh, kw, in, out]
        tw = torch.tensor(w[::-1, ::-1].copy().transpose(2, 3, 0, 1))
        tx = torch.tensor(_np(x).transpose(0, 3, 1, 2))
        tout = tF.conv_transpose2d(tx, tw, torch.tensor(_np(p["b"])),
                                   stride=2, padding=1)
        np.testing.assert_allclose(_np(out), tout.permute(0, 2, 3, 1).numpy(),
                                   rtol=1e-4, atol=1e-5)

    def test_depthwise_conv_matches_torch(self, rng):
        x = jax.random.normal(rng, (2, 8, 8, 8))
        p = layers.conv2d_init(jax.random.fold_in(rng, 4), 8, 8, 5, groups=8)
        out = layers.conv2d(p, x, groups=8)
        tx = torch.tensor(_np(x).transpose(0, 3, 1, 2))
        tw = torch.tensor(_np(p["w"]).transpose(3, 2, 0, 1))
        tout = tF.conv2d(tx, tw, torch.tensor(_np(p["b"])), padding=2,
                         groups=8).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(_np(out), tout, rtol=1e-4, atol=1e-5)


class TestNorms:
    def test_group_norm_matches_torch(self, rng):
        x = jax.random.normal(rng, (2, 8, 8, 16))
        p = layers.group_norm_init(16)
        out = layers.group_norm(p, x, groups=8)
        tx = torch.tensor(_np(x).transpose(0, 3, 1, 2))
        tout = tF.group_norm(tx, 8, torch.ones(16), torch.zeros(16), 1e-5)
        np.testing.assert_allclose(_np(out),
                                   tout.permute(0, 2, 3, 1).numpy(),
                                   rtol=1e-4, atol=1e-5)

    def test_group_norm_large_offset_no_nan(self):
        """Moments-form variance (E[x^2] - mean^2) cancels catastrophically
        in f32 when |mean| >> std and can go NEGATIVE (this exact input
        gives gvar = -1.25 unclamped -> NaN through rsqrt); the clamp in
        _gn_stats must keep the output finite. Both the default moments
        path and the torch-parity check at healthy scales stay intact."""
        x = jnp.asarray(
            (2048.0 + 0.01 * np.random.default_rng(0)
             .standard_normal((2, 8, 8, 16))).astype(np.float32))
        p = layers.group_norm_init(16)
        out = layers.group_norm(p, x, groups=8)
        assert np.isfinite(np.asarray(out)).all()
        gm = layers.group_norm_mish(p, x, groups=8)
        assert np.isfinite(np.asarray(gm)).all()

    def test_batch_norm_train_and_eval(self, rng):
        x = jax.random.normal(rng, (4, 8, 8, 6))
        p, s = layers.batch_norm_init(6)
        out, ns = layers.batch_norm(p, s, x, train=True)
        # Normalized output has ~zero mean / unit var per channel
        m = jnp.mean(out, axis=(0, 1, 2))
        v = jnp.var(out, axis=(0, 1, 2))
        np.testing.assert_allclose(_np(m), 0, atol=1e-5)
        np.testing.assert_allclose(_np(v), 1, atol=1e-3)
        # Running stats moved toward batch stats (torch momentum 0.1)
        bm = jnp.mean(x, axis=(0, 1, 2))
        np.testing.assert_allclose(_np(ns["mean"]), _np(0.1 * bm), atol=1e-5)
        # Eval uses running stats and leaves them unchanged
        out_e, ns_e = layers.batch_norm(p, ns, x, train=False)
        assert ns_e is ns

    def test_batch_norm_matches_torch_train(self, rng):
        x = jax.random.normal(rng, (4, 5, 5, 3))
        p, s = layers.batch_norm_init(3)
        out, ns = layers.batch_norm(p, s, x, train=True)
        tbn = torch.nn.BatchNorm2d(3)
        tbn.train()
        tout = tbn(torch.tensor(_np(x).transpose(0, 3, 1, 2)))
        np.testing.assert_allclose(_np(out),
                                   tout.detach().permute(0, 2, 3, 1).numpy(),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(_np(ns["mean"]),
                                   tbn.running_mean.numpy(), atol=1e-5)
        np.testing.assert_allclose(_np(ns["var"]),
                                   tbn.running_var.numpy(), rtol=1e-4)

    def test_mish_matches_torch(self, rng):
        x = jax.random.normal(rng, (128,)) * 4
        out = mish(x)
        tout = tF.mish(torch.tensor(_np(x))).numpy()
        np.testing.assert_allclose(_np(out), tout, rtol=1e-5, atol=1e-6)


class TestAttention:
    def test_flash_matches_full(self, rng):
        """Blockwise online-softmax == full attention."""
        b, h, n, d = 2, 4, 64, 8
        ks = jax.random.split(rng, 4)
        q = jax.random.normal(ks[0], (b, h, n, d))
        k = jax.random.normal(ks[1], (b, h, n, d))
        v = jax.random.normal(ks[2], (b, h, n, d))
        bias = jax.random.normal(ks[3], (h, n)) * 0.1
        full = attention.full_attention(q, k, v, bias)
        flash = attention.flash_attention_xla(q, k, v, bias,
                                              block_q=16, block_k=16)
        np.testing.assert_allclose(_np(flash), _np(full), rtol=1e-5, atol=1e-5)

    def test_rel_pos_interp_matches_torch(self, rng):
        """align_corners=True bilinear resize of the factorized rel-pos."""
        heads, s, H = 3, 8, 13
        p = jax.random.normal(rng, (heads, s))
        ours = attention._interp_align_corners(p, H)
        tin = torch.tensor(_np(p)).reshape(1, heads, s, 1)
        tout = tF.interpolate(tin, size=(H, 1), mode="bilinear",
                              align_corners=True)
        np.testing.assert_allclose(_np(ours),
                                   tout.numpy().reshape(heads, H),
                                   rtol=1e-5, atol=1e-6)

    def test_module_shapes_and_grad(self, rng):
        c, heads = 16, 4
        p = attention.attention_init(rng, c, num_heads=heads, rel_pos_size=4)
        x = jax.random.normal(jax.random.fold_in(rng, 1), (2, 8, 8, c))
        out = attention.spatial_attention_reference(p, x, num_heads=heads)
        assert out.shape == x.shape

        def loss(pp):
            return jnp.sum(attention.spatial_attention_reference(
                pp, x, num_heads=heads, impl="flash") ** 2)

        grads = jax.grad(loss)(p)
        for leaf in jax.tree_util.tree_leaves(grads):
            assert jnp.all(jnp.isfinite(leaf))

    def test_key_bias_changes_output(self, rng):
        """The rel-pos bias must influence the result (reference defect was a
        per-query constant that softmax removed — a no-op)."""
        c, heads = 16, 4
        p = attention.attention_init(rng, c, num_heads=heads, rel_pos_size=4)
        p2 = dict(p, rel_pos_h=p["rel_pos_h"] + 1.7, rel_pos_w=p["rel_pos_w"] - 0.9)
        x = jax.random.normal(jax.random.fold_in(rng, 1), (1, 8, 8, c))
        o1 = attention.spatial_attention_reference(p, x, num_heads=heads)
        o2 = attention.spatial_attention_reference(p2, x, num_heads=heads)
        assert not np.allclose(_np(o1), _np(o2))


class TestDropout:
    def test_dropout_scaling(self, rng):
        x = jnp.ones((1000,))
        out = layers.dropout(x, 0.5, rng=rng, train=True)
        assert abs(float(jnp.mean(out)) - 1.0) < 0.1
        assert float(jnp.max(out)) == 2.0
        out_eval = layers.dropout(x, 0.5, rng=rng, train=False)
        np.testing.assert_array_equal(_np(out_eval), _np(x))

    def test_dropout2d_channelwise(self, rng):
        x = jnp.ones((4, 8, 8, 16))
        out = layers.dropout2d(x, 0.5, rng=rng, train=True)
        # each (sample, channel) slice is all-zero or all-scaled
        per = np.asarray(jnp.std(out, axis=(1, 2)))
        np.testing.assert_allclose(per, 0, atol=1e-6)


class TestSelfAttention2d:
    """Reference lunar_generate.py:56-78 (defined there but never wired)."""

    def test_gamma_zero_is_identity(self, rng):
        from lunaris_orion_tpu.ops.attention import (self_attention_2d,
                                                     self_attention_2d_init)
        p = self_attention_2d_init(rng, 16)
        x = jax.random.normal(jax.random.fold_in(rng, 1), (2, 8, 8, 16))
        out = self_attention_2d(p, x)
        np.testing.assert_allclose(_np(out), _np(x), atol=1e-6)

    def test_nonzero_gamma_changes_output(self, rng):
        from lunaris_orion_tpu.ops.attention import (self_attention_2d,
                                                     self_attention_2d_init)
        p = self_attention_2d_init(rng, 16)
        p = dict(p, gamma=jnp.ones((1,)))
        x = jax.random.normal(jax.random.fold_in(rng, 1), (2, 8, 8, 16))
        out = self_attention_2d(p, x)
        assert out.shape == x.shape
        assert not np.allclose(_np(out), _np(x))


class TestImplVariants:
    """r3 measured A/B variants must stay numerically exact to their
    defaults (BASELINE.md records which ships and why)."""

    @pytest.mark.slow
    def test_moments_gn_matches_reshape_gn(self, rng, monkeypatch):
        for (b, h, w, c, g) in [(2, 16, 16, 64, 8), (3, 8, 8, 32, 8)]:
            x = jax.random.normal(rng, (b, h, w, c)) * 3.0 + 1.7
            p = {"scale": jax.random.normal(rng, (c,)) * 0.5 + 1.0,
                 "bias": jax.random.normal(rng, (c,)) * 0.2}
            new = layers.group_norm(p, x, groups=g)
            monkeypatch.setenv("LUNARIS_GN_IMPL", "reshape")
            old = layers.group_norm(p, x, groups=g)
            monkeypatch.delenv("LUNARIS_GN_IMPL")
            np.testing.assert_allclose(_np(new), _np(old), atol=2e-5)
            gn = jax.grad(lambda xx: jnp.sum(
                jnp.square(layers.group_norm(p, xx, groups=g))))(x)
            monkeypatch.setenv("LUNARIS_GN_IMPL", "reshape")
            go = jax.grad(lambda xx: jnp.sum(
                jnp.square(layers.group_norm(p, xx, groups=g))))(x)
            monkeypatch.delenv("LUNARIS_GN_IMPL")
            np.testing.assert_allclose(_np(gn), _np(go), rtol=1e-4,
                                       atol=1e-4)

    @pytest.mark.slow
    def test_phase_convt_matches_dilated(self, rng, monkeypatch):
        for (b, h, cin, co) in [(2, 8, 32, 16), (1, 5, 12, 7)]:
            x = jax.random.normal(rng, (b, h, h, cin))
            p = layers.conv2d_transpose_init(rng, cin, co, 4)
            old = layers.conv2d_transpose(p, x)
            monkeypatch.setenv("LUNARIS_CONVT_IMPL", "phase")
            new = layers.conv2d_transpose(p, x)
            gw_new = jax.grad(lambda w: jnp.sum(jnp.square(
                layers.conv2d_transpose({"w": w, "b": p["b"]}, x))))(p["w"])
            gx_new = jax.grad(lambda xx: jnp.sum(jnp.square(
                layers.conv2d_transpose(p, xx))))(x)
            monkeypatch.delenv("LUNARIS_CONVT_IMPL")
            gw_old = jax.grad(lambda w: jnp.sum(jnp.square(
                layers.conv2d_transpose({"w": w, "b": p["b"]}, x))))(p["w"])
            gx_old = jax.grad(lambda xx: jnp.sum(jnp.square(
                layers.conv2d_transpose(p, xx))))(x)
            np.testing.assert_allclose(_np(new), _np(old), atol=1e-5)
            np.testing.assert_allclose(_np(gw_new), _np(gw_old), rtol=1e-4,
                                       atol=1e-4)
            np.testing.assert_allclose(_np(gx_new), _np(gx_old), rtol=1e-4,
                                       atol=1e-4)

    def test_mish_exp1_matches_ref(self, monkeypatch):
        from lunaris_orion_tpu.ops.activations import mish
        x = jnp.asarray(np.concatenate(
            [np.linspace(-50, 50, 2001, dtype=np.float32),
             np.array([-1e4, -88, 19.999, 20, 20.001, 88, 1e4],
                      np.float32)]))
        ref = mish(x)
        monkeypatch.setenv("LUNARIS_MISH_IMPL", "exp1")
        new = mish(x)
        g_new = jax.grad(lambda v: jnp.sum(mish(v)))(x)
        monkeypatch.delenv("LUNARIS_MISH_IMPL")
        g_ref = jax.grad(lambda v: jnp.sum(mish(v)))(x)
        np.testing.assert_allclose(_np(new), _np(ref), atol=5e-6)
        np.testing.assert_allclose(_np(g_new), _np(g_ref), atol=1e-5)
        assert np.isfinite(_np(new)).all() and np.isfinite(_np(g_new)).all()

    def test_mish_rational_exhaustive_bf16(self, monkeypatch):
        """The rational mish (LUNARIS_MISH_IMPL=rat) over EVERY finite bf16
        value: >=99.3% bit-identical to the reference f32-internal mish,
        with all mismatches confined to x < -6 where |mish(x)| < 2.2e-3
        and the deviation bounded by 7e-5 (tools/fit_mish.py report)."""
        from lunaris_orion_tpu.ops.activations import mish
        bits = (np.arange(1 << 16, dtype=np.uint32) << 16).view(np.float32)
        xb = jnp.asarray(bits[np.isfinite(bits)]).astype(jnp.bfloat16)
        ref = mish(xb)
        monkeypatch.setenv("LUNARIS_MISH_IMPL", "rat")
        new = mish(xb)
        same = np.asarray(ref == new)
        assert same.mean() >= 0.993
        bad_x = np.asarray(xb, np.float64)[~same]
        assert bad_x.max() < -6.0
        dev = np.abs(np.asarray(ref, np.float64) - np.asarray(new, np.float64))
        core = np.asarray(xb, np.float64) >= -6.0
        assert dev[~core].max() < 1e-4 or not (~core).any()
        # 1-ulp worst case on the rare boundary-rounding points in the core
        assert dev[core].max() <= 0.002

    def test_mish_rational_gradient(self, monkeypatch):
        from lunaris_orion_tpu.ops.activations import mish
        x = jnp.linspace(-14.0, 11.0, 4001, dtype=jnp.float32)
        g_ref = jax.grad(lambda v: jnp.sum(mish(v)))(x)
        monkeypatch.setenv("LUNARIS_MISH_IMPL", "rat")
        g_new = jax.grad(lambda v: jnp.sum(mish(v)))(x)
        new = mish(x)
        assert np.isfinite(_np(new)).all() and np.isfinite(_np(g_new)).all()
        np.testing.assert_allclose(_np(g_new), _np(g_ref), atol=5e-4)

    def test_gnmish_fusedvjp_matches_autodiff(self, rng, monkeypatch):
        """LUNARIS_GNMISH_IMPL=fusedvjp (residual-minimal custom VJP,
        measured-rejected r3 — see ops/layers.py) stays forward-bit-exact
        and gradient-close to the default autodiff composition."""
        for dtype, gtol in ((jnp.float32, 1e-4), (jnp.bfloat16, 5e-2)):
            x = (jax.random.normal(rng, (2, 16, 16, 64)) * 2).astype(dtype)
            p = {"scale": jnp.ones((64,)) * 1.3, "bias": jnp.ones((64,)) * .1}
            ct = jax.random.normal(jax.random.PRNGKey(7), x.shape)

            def loss(xx, sc, bi):
                out = layers.group_norm_mish({"scale": sc, "bias": bi}, xx)
                return jnp.sum(out.astype(jnp.float32) * ct)

            ref = layers.group_norm_mish(p, x)
            g_ref = jax.grad(loss, argnums=(0, 1, 2))(
                x, p["scale"], p["bias"])
            monkeypatch.setenv("LUNARIS_GNMISH_IMPL", "fusedvjp")
            new = layers.group_norm_mish(p, x)
            g_new = jax.grad(loss, argnums=(0, 1, 2))(
                x, p["scale"], p["bias"])
            monkeypatch.delenv("LUNARIS_GNMISH_IMPL")
            assert np.array_equal(_np(ref), _np(new))  # fwd bit-exact
            for a, b in zip(g_ref, g_new):
                np.testing.assert_allclose(
                    _np(a).astype(np.float32), _np(b).astype(np.float32),
                    rtol=gtol, atol=gtol)


class TestVmemRiskGate:
    """The f32/d>=64/N>=16384 Pallas combination exceeds the v5e's 16M
    scoped-VMEM stack (measured 16.5M, r5 high-end eval-grid crash):
    auto dispatch must route it to the XLA flash path, and a forced
    use_pallas=True must fail actionably instead of at Mosaic compile."""

    def test_truth_table(self):
        from lunaris_orion_tpu.ops.attention import _pallas_vmem_risk
        assert _pallas_vmem_risk(jnp.float32, 64, 16384)
        assert not _pallas_vmem_risk(jnp.bfloat16, 64, 16384)  # hw-validated
        assert not _pallas_vmem_risk(jnp.float32, 48, 16384)   # 3/4 stack
        assert not _pallas_vmem_risk(jnp.float32, 64, 8192)    # half stack

    def test_forced_pallas_raises_actionably(self, rng, monkeypatch):
        """use_pallas=True at the risky combo raises the scoped-VMEM
        ValueError during tracing (eval_shape: no FLOPs, no TPU needed)."""
        heads, c = 8, 8 * 64  # head_dim 64
        p = attention.attention_init(rng, c, num_heads=heads, rel_pos_size=4)
        x = jnp.zeros((1, 128, 128, c), jnp.float32)  # N = 16384
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        with pytest.raises(ValueError, match="scoped-VMEM"):
            jax.eval_shape(lambda pp, xx: attention.spatial_attention_reference(
                pp, xx, num_heads=heads, impl="pallas"), p, x)

    def test_auto_routes_risky_combo_to_flash(self, rng, monkeypatch):
        """With the dispatcher forced to prefer Pallas, auto must still
        refuse the risky combo and take the XLA flash path (observed via
        a poisoned kernel import)."""
        from lunaris_orion_tpu.ops import dispatch
        import lunaris_orion_tpu.ops.pallas.flash_attention as fa
        monkeypatch.setattr(dispatch, "choose",
                            lambda op: "pallas" if op == "attention" else "xla")

        def boom(*a, **k):
            raise AssertionError("Pallas kernel must not be dispatched")

        monkeypatch.setattr(fa, "attention_bhnd", boom)
        heads, c = 8, 8 * 64
        p = attention.attention_init(rng, c, num_heads=heads, rel_pos_size=4)
        x = jnp.zeros((1, 128, 128, c), jnp.float32)
        out = jax.eval_shape(lambda pp, xx: attention.spatial_attention_reference(
            pp, xx, num_heads=heads), p, x)  # impl='auto'
        assert out.shape == x.shape
