"""Ring attention (cross-chip context parallelism) parity tests.

Runs on the 8-virtual-device CPU mesh (conftest). The single-device
references are `ops.attention.full_attention` (no dropout) and a dense
softmax with the kernel family's hash mask (dropout), so these tests pin:
  * output parity ring(p=8) == single-device attention,
  * gradient parity through ppermute + the checkpointed scan,
  * shard-count invariance (p=2 vs p=8),
  * bit-identical dropout decisions vs the Pallas kernel's `_keep_mask`.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lunaris_orion_tpu.ops import attention
from lunaris_orion_tpu.ops.pallas import flash_attention as fa
from lunaris_orion_tpu.parallel import ring_attention as ra


def _mesh(n, name="seq"):
    return Mesh(np.asarray(jax.devices()[:n]).reshape(n), (name,))


def _qkvb(key, b=2, h=2, n=64, d=4, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (b, h, n, d), dtype)
    k = jax.random.normal(ks[1], (b, h, n, d), dtype)
    v = jax.random.normal(ks[2], (b, h, n, d), dtype)
    bias = (jax.random.normal(ks[3], (h, n), jnp.float32) * 0.1)
    return q, k, v, bias


class TestRingParity:
    def test_matches_full_attention(self):
        q, k, v, bias = _qkvb(jax.random.PRNGKey(0))
        ref = attention.full_attention(q, k, v, bias)
        out = ra.ring_attention_sharded(q, k, v, bias, mesh=_mesh(8),
                                        axis="seq")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-6)

    def test_no_bias(self):
        q, k, v, _ = _qkvb(jax.random.PRNGKey(1))
        ref = attention.full_attention(q, k, v, None)
        out = ra.ring_attention_sharded(q, k, v, None, mesh=_mesh(8),
                                        axis="seq")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-6)

    def test_bf16_io(self):
        q, k, v, bias = _qkvb(jax.random.PRNGKey(2), dtype=jnp.bfloat16)
        ref = attention.full_attention(q, k, v, bias)
        out = ra.ring_attention_sharded(q, k, v, bias, mesh=_mesh(8),
                                        axis="seq")
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=2e-2, atol=2e-2)

    def test_shard_count_invariance(self):
        q, k, v, bias = _qkvb(jax.random.PRNGKey(3))
        o2 = ra.ring_attention_sharded(q, k, v, bias, mesh=_mesh(2),
                                       axis="seq")
        o8 = ra.ring_attention_sharded(q, k, v, bias, mesh=_mesh(8),
                                       axis="seq")
        np.testing.assert_allclose(np.asarray(o2), np.asarray(o8),
                                   rtol=2e-5, atol=2e-6)

    @pytest.mark.slow
    def test_gradients_match_full_attention(self):
        q, k, v, bias = _qkvb(jax.random.PRNGKey(4))
        cot = jax.random.normal(jax.random.PRNGKey(5), q.shape)

        def loss(fn):
            def inner(q, k, v, bias):
                return jnp.sum(fn(q, k, v, bias) * cot)
            return inner

        g_ref = jax.grad(loss(lambda *a: attention.full_attention(*a)),
                         argnums=(0, 1, 2, 3))(q, k, v, bias)
        g_ring = jax.grad(
            loss(lambda *a: ra.ring_attention_sharded(
                *a, mesh=_mesh(8), axis="seq")),
            argnums=(0, 1, 2, 3))(q, k, v, bias)
        for gr, gg, name in zip(g_ref, g_ring, "qkvb"):
            np.testing.assert_allclose(
                np.asarray(gg), np.asarray(gr), rtol=5e-5, atol=1e-5,
                err_msg=f"grad mismatch for {name}")

    def test_under_jit_with_sharded_inputs(self):
        mesh = _mesh(8)
        q, k, v, bias = _qkvb(jax.random.PRNGKey(6))
        sh = NamedSharding(mesh, P(None, None, "seq", None))
        qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))

        @jax.jit
        def f(q, k, v, bias):
            return ra.ring_attention_sharded(q, k, v, bias, mesh=mesh,
                                             axis="seq")

        out = f(qs, ks, vs, bias)
        ref = attention.full_attention(q, k, v, bias)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-6)


class TestModuleRingImpl:
    """spatial_attention_reference(impl='ring'): the full module (qkv +
    rel-pos bias + proj) over the sharded token axis must match the
    single-device impl='full' path."""

    def test_module_parity_eval(self):
        key = jax.random.PRNGKey(11)
        p = attention.attention_init(key, 32, num_heads=4)
        x = jax.random.normal(jax.random.PRNGKey(12), (2, 8, 8, 32))
        ref = attention.spatial_attention_reference(
            p, x, num_heads=4, impl="full")
        out = attention.spatial_attention_reference(
            p, x, num_heads=4, impl="ring", cp_mesh=_mesh(8),
            cp_axis="seq")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=1e-5)

    def test_ring_requires_mesh_and_divisibility(self):
        p = attention.attention_init(jax.random.PRNGKey(13), 32,
                                     num_heads=4)
        x = jax.random.normal(jax.random.PRNGKey(14), (1, 8, 8, 32))
        with pytest.raises(ValueError, match="cp_mesh"):
            attention.spatial_attention_reference(
                p, x, num_heads=4, impl="ring")
        x_bad = jax.random.normal(jax.random.PRNGKey(15), (1, 6, 7, 32))
        with pytest.raises(ValueError, match="not divisible"):
            attention.spatial_attention_reference(
                p, x_bad, num_heads=4, impl="ring", cp_mesh=_mesh(8),
                cp_axis="seq")


class TestRingUnderVmap:
    """The teacher calls attention inside `jax.vmap` over the stacked
    expert axis, inside `jax.checkpoint` (remat), inside `jax.grad` —
    pin that ring_attention_sharded composes with that exact nesting
    (the --attn_impl ring product path, train/loop.py)."""

    @pytest.mark.slow
    def test_vmap_fwd_and_grad_parity(self):
        mesh = _mesh(8)
        E = 3
        ks = jax.random.split(jax.random.PRNGKey(20), 4)
        q = jax.random.normal(ks[0], (E, 2, 2, 64, 4))
        k = jax.random.normal(ks[1], (E, 2, 2, 64, 4))
        v = jax.random.normal(ks[2], (E, 2, 2, 64, 4))
        bias = jax.random.normal(ks[3], (E, 2, 64)) * 0.1

        def ring(q, k, v, bias):
            return ra.ring_attention_sharded(q, k, v, bias, mesh=mesh,
                                             axis="seq")

        def full(q, k, v, bias):
            return attention.full_attention(q, k, v, bias)

        out = jax.vmap(ring)(q, k, v, bias)
        ref = jax.vmap(full)(q, k, v, bias)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-6)

        cot = jax.random.normal(jax.random.PRNGKey(21), q.shape)

        def loss(fn):
            @jax.jit
            def inner(q, k, v, bias):
                @jax.checkpoint
                def path(q):
                    return jax.vmap(fn)(q, k, v, bias)
                return jnp.sum(path(q) * cot)
            return inner

        g_ref = jax.grad(loss(full))(q, k, v, bias)
        g_ring = jax.grad(loss(ring))(q, k, v, bias)
        np.testing.assert_allclose(np.asarray(g_ring), np.asarray(g_ref),
                                   rtol=5e-5, atol=1e-5)

    @pytest.mark.slow
    def test_vmap_per_expert_dropout_seeds(self):
        """Batched (per-expert) traced seeds under vmap: each expert's
        slice must equal the unbatched ring call with that seed."""
        mesh = _mesh(8)
        E = 2
        ks = jax.random.split(jax.random.PRNGKey(22), 3)
        q = jax.random.normal(ks[0], (E, 2, 2, 64, 4))
        k = jax.random.normal(ks[1], (E, 2, 2, 64, 4))
        v = jax.random.normal(ks[2], (E, 2, 2, 64, 4))
        seeds = jnp.asarray([11, 77], jnp.int32)

        def ring(q, k, v, seed):
            return ra.ring_attention_sharded(q, k, v, None, mesh=mesh,
                                             axis="seq", dropout_rate=0.25,
                                             seed=seed)

        out = jax.jit(jax.vmap(ring))(q, k, v, seeds)
        for e in range(E):
            ref = ring(q[e], k[e], v[e], seeds[e])
            np.testing.assert_allclose(np.asarray(out[e]), np.asarray(ref),
                                       rtol=2e-5, atol=2e-6,
                                       err_msg=f"expert {e}")


class TestRingDropout:
    def test_mask_bit_identical_to_kernel(self):
        """_keep_mask_qk must be the q-major transpose of the Pallas
        kernel's _keep_mask for the same (row_seed, offsets)."""
        seed = jnp.int32(1234)
        rs_kernel = jnp.int32(5678)
        kp = 0.9
        m_kernel = fa._keep_mask(rs_kernel, 16, 32, (8, 12), kp)  # [bk, bq]
        m_ring = ra._keep_mask_qk(rs_kernel.reshape(1, 1, 1, 1),
                                  jnp.int32(32), jnp.int32(16),
                                  12, 8, kp)[0, 0]                # [nq, nk]
        np.testing.assert_array_equal(np.asarray(m_kernel).T,
                                      np.asarray(m_ring))
        # row-seed derivation matches _row_seeds' seed ^ (b*H + h)*C1
        rs = ra._row_seed_bh(seed, 2, 3)
        rows = fa._row_seeds(seed, 6)[:, 0, 0]
        np.testing.assert_array_equal(np.asarray(rs).reshape(6),
                                      np.asarray(rows))

    def test_dropout_matches_dense_hash_reference(self):
        q, k, v, bias = _qkvb(jax.random.PRNGKey(7))
        seed = jnp.int32(99)
        rate = 0.25
        b, h, n, d = q.shape

        # dense reference with the same hash mask, torch normalization
        # semantics (l from undropped probabilities)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (d ** -0.5)
        s = s + bias[None, :, None, :]
        p = jax.nn.softmax(s, axis=-1)
        keep = ra._keep_mask_qk(ra._row_seed_bh(seed, b, h),
                                jnp.int32(0), jnp.int32(0), n, n,
                                1.0 - rate)
        p = jnp.where(keep, p / (1.0 - rate), 0.0)
        ref = jnp.einsum("bhqk,bhkd->bhqd", p, v)

        out = ra.ring_attention_sharded(q, k, v, bias, mesh=_mesh(8),
                                        axis="seq", dropout_rate=rate,
                                        seed=seed)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-6)

    @pytest.mark.slow
    def test_dropout_shard_count_invariant(self):
        q, k, v, bias = _qkvb(jax.random.PRNGKey(8))
        kw = dict(axis="seq", dropout_rate=0.25, seed=jnp.int32(7))
        o2 = ra.ring_attention_sharded(q, k, v, bias, mesh=_mesh(2), **kw)
        o8 = ra.ring_attention_sharded(q, k, v, bias, mesh=_mesh(8), **kw)
        np.testing.assert_allclose(np.asarray(o2), np.asarray(o8),
                                   rtol=2e-5, atol=2e-6)

    @pytest.mark.slow
    def test_dropout_grads_finite_and_match_dense(self):
        q, k, v, bias = _qkvb(jax.random.PRNGKey(9))
        seed = jnp.int32(3)
        rate = 0.25
        b, h, n, d = q.shape

        def dense(q, k, v, bias):
            s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (d ** -0.5)
            s = s + bias[None, :, None, :]
            p = jax.nn.softmax(s, axis=-1)
            keep = ra._keep_mask_qk(ra._row_seed_bh(seed, b, h),
                                    jnp.int32(0), jnp.int32(0), n, n,
                                    1.0 - rate)
            p = jnp.where(keep, p / (1.0 - rate), 0.0)
            return jnp.einsum("bhqk,bhkd->bhqd", p, v)

        def ring(q, k, v, bias):
            return ra.ring_attention_sharded(
                q, k, v, bias, mesh=_mesh(8), axis="seq",
                dropout_rate=rate, seed=seed)

        cot = jax.random.normal(jax.random.PRNGKey(10), q.shape)
        g_ref = jax.grad(lambda *a: jnp.sum(dense(*a) * cot),
                         argnums=(0, 1, 2, 3))(q, k, v, bias)
        g_ring = jax.grad(lambda *a: jnp.sum(ring(*a) * cot),
                          argnums=(0, 1, 2, 3))(q, k, v, bias)
        for gr, gg, name in zip(g_ref, g_ring, "qkvb"):
            assert np.isfinite(np.asarray(gg)).all()
            np.testing.assert_allclose(
                np.asarray(gg), np.asarray(gr), rtol=5e-5, atol=1e-5,
                err_msg=f"grad mismatch for {name}")


class TestRingUnrollKnob:
    @pytest.mark.slow
    def test_unrolled_ring_matches_scan(self, monkeypatch):
        """LUNARIS_RING_UNROLL=1 replaces the lax.scan over ring steps with
        a Python unroll (trades compile time for scheduler freedom) — the
        math must be identical, fwd and grad."""
        q, k, v, bias = _qkvb(jax.random.PRNGKey(30))
        mesh = _mesh(8)

        def run():
            def loss(q, k, v, bias):
                o = ra.ring_attention_sharded(q, k, v, bias, mesh=mesh,
                                              axis="seq")
                return jnp.sum(o ** 2)
            val, grads = jax.value_and_grad(loss, argnums=(0, 3))(q, k, v,
                                                                  bias)
            return val, grads

        monkeypatch.delenv("LUNARIS_RING_UNROLL", raising=False)
        v_scan, g_scan = run()
        monkeypatch.setenv("LUNARIS_RING_UNROLL", "1")
        v_un, g_un = run()
        np.testing.assert_allclose(float(v_un), float(v_scan), rtol=1e-6)
        for a, b in zip(g_un, g_scan):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7)


class TestAllgatherCP:
    """mode='allgather' (r5): CP that gathers k/v once per call and runs
    the rectangular fused kernel (TPU) / one `_accum_chunk` fold (CPU)
    per shard — same contract and bit-identical dropout as the ring at
    rho ~= 1 compute (pricing: BASELINE.md r5). These pin output/grad
    parity vs the single-device kernel path, shard-count invariance,
    the multi-shard KERNEL path itself (interpret mode, fwd), and the
    global-row dropout seeds under a sharded batch axis."""

    def test_matches_full_attention(self):
        q, k, v, bias = _qkvb(jax.random.PRNGKey(20))
        ref = attention.full_attention(q, k, v, bias)
        out = ra.ring_attention_sharded(q, k, v, bias, mesh=_mesh(8),
                                        axis="seq", mode="allgather")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-6)

    def test_dropout_bit_parity_with_kernel(self):
        q, k, v, bias = _qkvb(jax.random.PRNGKey(21))
        seed = jnp.int32(321)
        ref = fa.attention_bhnd(q, k, v, bias, dropout_rate=0.25,
                                seed=seed)
        out = ra.ring_attention_sharded(q, k, v, bias, mesh=_mesh(8),
                                        axis="seq", dropout_rate=0.25,
                                        seed=seed, mode="allgather")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-6)

    def test_kernel_path_multi_shard_fwd(self):
        """The fused-kernel path itself (rectangular q shard + q_offset)
        under an 8-shard mesh: interpret-mode Pallas inside a
        check_vma=False shard_map (the vma checker cannot evaluate
        interpret-mode pallas_call; the product runs this path on real
        TPU where pallas lowers natively — grads of the kernel path are
        pinned single-device in test_pallas_attention)."""
        import functools
        q, k, v, bias = _qkvb(jax.random.PRNGKey(22))
        seed = jnp.int32(77)
        ref = fa.attention_bhnd(q, k, v, bias, dropout_rate=0.25,
                                seed=seed)
        mesh = _mesh(8)
        spec = P(None, None, "seq", None)
        fn = jax.shard_map(
            functools.partial(ra.allgather_attention, axis_name="seq",
                              dropout_rate=0.25, seed=seed,
                              use_kernel=True),
            mesh=mesh, in_specs=(spec, spec, spec, P(None, "seq")),
            out_specs=spec, check_vma=False)
        out = fn(q, k, v, bias)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-6, atol=1e-7)

    @pytest.mark.slow
    def test_gradients_match_kernel(self):
        q, k, v, bias = _qkvb(jax.random.PRNGKey(23))
        seed = jnp.int32(5)

        def loss(fn):
            def g(q, k, v, bias):
                return jnp.sum(jnp.sin(fn(q, k, v, bias)))
            return jax.grad(g, argnums=(0, 1, 2, 3))

        g_ref = loss(lambda q, k, v, b: fa.attention_bhnd(
            q, k, v, b, dropout_rate=0.25, seed=seed))(q, k, v, bias)
        g_ag = loss(lambda q, k, v, b: ra.ring_attention_sharded(
            q, k, v, b, mesh=_mesh(8), axis="seq", dropout_rate=0.25,
            seed=seed, mode="allgather"))(q, k, v, bias)
        for name, a, b2 in zip(("dq", "dk", "dv", "dbias"), g_ref, g_ag):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                       rtol=2e-4, atol=2e-5, err_msg=name)

    def test_shard_count_invariance(self):
        q, k, v, bias = _qkvb(jax.random.PRNGKey(24))
        kw = dict(axis="seq", dropout_rate=0.25, seed=jnp.int32(9),
                  mode="allgather")
        o2 = ra.ring_attention_sharded(q, k, v, bias, mesh=_mesh(2), **kw)
        o8 = ra.ring_attention_sharded(q, k, v, bias, mesh=_mesh(8), **kw)
        np.testing.assert_allclose(np.asarray(o2), np.asarray(o8),
                                   rtol=2e-5, atol=2e-6)

    @pytest.mark.slow
    def test_batch_axis_dropout_global_rows(self):
        """r5 fix: with the batch dim itself sharded (cp_batch_axis) AND
        dropout active, both CP modes now seed from GLOBAL batch rows —
        bit-identical to the single-device kernel (before, each data
        shard repeated rows 0..B_local-1's masks and no parity was
        possible; the old train-step parity test had to set dropout 0)."""
        q, k, v, bias = _qkvb(jax.random.PRNGKey(25), b=4)
        seed = jnp.int32(55)
        mesh = Mesh(np.asarray(jax.devices()).reshape(4, 2),
                    ("data", "seq"))
        ref = fa.attention_bhnd(q, k, v, bias, dropout_rate=0.25,
                                seed=seed)
        for mode in ("ring", "allgather"):
            out = ra.ring_attention_sharded(
                q, k, v, bias, mesh=mesh, axis="seq", dropout_rate=0.25,
                seed=seed, batch_axis="data", mode=mode)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=2e-5, atol=2e-6,
                                       err_msg=mode)

    def test_module_impl_allgather(self):
        key = jax.random.PRNGKey(26)
        p = attention.attention_init(key, 32, num_heads=4)
        x = jax.random.normal(jax.random.PRNGKey(27), (2, 8, 8, 32))
        ref = attention.spatial_attention_reference(
            p, x, num_heads=4, impl="full")
        out = attention.spatial_attention_reference(
            p, x, num_heads=4, impl="allgather", cp_mesh=_mesh(8),
            cp_axis="seq")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=1e-5)

    def test_requires_mesh_and_divisibility(self):
        p = attention.attention_init(jax.random.PRNGKey(28), 32,
                                     num_heads=4)
        x = jax.random.normal(jax.random.PRNGKey(29), (1, 8, 8, 32))
        with pytest.raises(ValueError, match="cp_mesh"):
            attention.spatial_attention_reference(
                p, x, num_heads=4, impl="allgather")
        with pytest.raises(ValueError, match="mode"):
            ra.ring_attention_sharded(
                x[..., :4], x[..., :4], x[..., :4], None, mesh=_mesh(8),
                axis="seq", mode="bogus")
