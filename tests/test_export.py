"""Serving-export tests: StableHLO bundle round-trip vs direct execution.

The exported `generate`/`score` programs must reproduce the in-process
inference paths exactly (same weights, same graph), load with no model
code, and fail clearly for unknown batch sizes. Reference parity target:
the *intended* serving contract of examples/simple_generation.py (which
does not run there, SURVEY.md §2.3 #25) — here it ships as a versioned
artifact.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lunaris_orion_tpu.config import TrainConfig
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


@pytest.fixture(scope="module")
def bundle_dir(ckpt_dir, tmp_path_factory):
    from lunaris_orion_tpu.infer.exporter import export_serving_bundle
    d = tmp_path_factory.mktemp("bundle")
    manifest = export_serving_bundle(
        str(ckpt_dir), str(d), batch_sizes=(2, 3),
        functions=("generate", "score"))
    assert len(manifest["functions"]) == 4
    return d


class TestExport:
    def test_manifest_contents(self, bundle_dir):
        m = json.loads((bundle_dir / "manifest.json").read_text())
        assert m["format"] == "lunaris-serving-bundle-v2"
        assert m["latent_dim"] == CFG.latent_dim
        assert m["image_size"] == CFG.image_size
        assert m["config"]["num_experts"] == CFG.num_experts
        for e in m["functions"].values():
            assert (bundle_dir / e["file"]).exists()

    def test_weights_stored_once_not_baked(self, bundle_dir):
        """v2 dedup: weights live ONCE in weights.bin; the per-(function,
        batch) programs are parameter-free and so stay small — each
        .stablehlo must be well under the weight payload, and the index
        must cover decoder+teacher+stats byte-exactly."""
        m = json.loads((bundle_dir / "manifest.json").read_text())
        wsize = (bundle_dir / m["weights_file"]).stat().st_size
        assert wsize == sum(e["nbytes"] for e in m["weights"])
        assert len(m["weights"]) > 10
        for e in m["functions"].values():
            psize = (bundle_dir / e["file"]).stat().st_size
            assert psize < 0.5 * wsize, (
                f"{e['file']} is {psize} B vs {wsize} B of weights — "
                "weights look baked into the program")

    @pytest.mark.slow
    def test_generate_matches_direct(self, ckpt_dir, bundle_dir):
        """Bundle generate == ImageGenerator's decode+score on same z."""
        from lunaris_orion_tpu.infer.exporter import ServingBundle
        from lunaris_orion_tpu.infer.generator import ImageGenerator
        from lunaris_orion_tpu.utils.image import to_uint8

        z = np.asarray(jax.random.normal(jax.random.PRNGKey(7),
                                         (2, CFG.latent_dim)), np.float32)
        bundle = ServingBundle(str(bundle_dir))
        imgs, q, s = bundle.generate(z)
        assert imgs.shape == (2, 16, 16, 3) and imgs.dtype == np.uint8
        assert q.shape == (2,) and s.shape == (2,)

        gen = ImageGenerator(str(ckpt_dir))
        d_imgs, d_q, d_s = gen._decode_and_score(
            gen.vae_params, gen.teacher_params, gen.teacher_stats,
            jnp.asarray(z))
        np.testing.assert_array_equal(imgs, to_uint8(np.asarray(d_imgs)))
        np.testing.assert_allclose(q, np.asarray(d_q), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(s, np.asarray(d_s), rtol=1e-5, atol=1e-6)

    def test_score_matches_evaluator(self, ckpt_dir, bundle_dir):
        from lunaris_orion_tpu.infer.exporter import ServingBundle
        from lunaris_orion_tpu.infer.evaluator import QualityEvaluator

        imgs = np.random.default_rng(0).integers(
            0, 256, (3, 16, 16, 3), dtype=np.uint8)
        bundle = ServingBundle(str(bundle_dir))
        q, w, s, style = bundle.score(imgs)
        assert q.shape == (3, 4) and w.shape == (3, CFG.num_experts)
        assert s.shape == (3,) and style.shape == (3, CFG.embedding_dim)

        ev = QualityEvaluator(str(ckpt_dir))
        ref = ev.score_batch(imgs)
        for i, r in enumerate(ref):
            np.testing.assert_allclose(float(np.mean(q[i])),
                                       r["mean_quality"], rtol=1e-5)
            np.testing.assert_allclose(s[i], r["semantic_score"], rtol=1e-5,
                                       atol=1e-6)
            np.testing.assert_allclose(w[i], r["expert_weights"], rtol=1e-4)

    def test_unknown_batch_size_raises(self, bundle_dir):
        from lunaris_orion_tpu.infer.exporter import ServingBundle
        bundle = ServingBundle(str(bundle_dir))
        with pytest.raises(ValueError, match="batch 5.*\\[2, 3\\]"):
            bundle.generate(np.zeros((5, CFG.latent_dim), np.float32))

    def test_bad_args_raise(self, ckpt_dir, tmp_path):
        from lunaris_orion_tpu.infer.exporter import export_serving_bundle
        with pytest.raises(ValueError, match="pallas"):
            export_serving_bundle(str(ckpt_dir), str(tmp_path / "x"),
                                  attn="pallas", platforms=["tpu", "cpu"])
        with pytest.raises(ValueError, match="unknown functions"):
            export_serving_bundle(str(ckpt_dir), str(tmp_path / "y"),
                                  functions=("generate", "nope"))

    def test_cli_roundtrip(self, ckpt_dir, tmp_path):
        from lunaris_orion_tpu.cli.export import main as export_main
        from lunaris_orion_tpu.infer.exporter import ServingBundle
        out = tmp_path / "cli_bundle"
        rc = export_main(["--checkpoint", str(ckpt_dir), "--out", str(out),
                          "--batch", "2", "--functions", "score"])
        assert rc == 0
        bundle = ServingBundle(str(out))
        assert bundle.batch_sizes("score") == [2]
        imgs = np.zeros((2, 16, 16, 3), np.uint8)
        q, _, _, _ = bundle.score(imgs)
        assert np.isfinite(q).all()


def test_weights_blob_roundtrip_bf16(tmp_path):
    """_write_weights/_load round-trip covers non-native dtypes (bf16):
    raw bytes + typed index must reproduce every leaf bit-exactly."""
    import jax.numpy as jnp
    from lunaris_orion_tpu.infer.exporter import _np_dtype, _write_weights

    leaves = [np.arange(6, dtype=np.float32).reshape(2, 3),
              np.asarray(jnp.linspace(-2, 2, 8).astype(jnp.bfloat16)),
              np.asarray(3, dtype=np.int32)]
    index = _write_weights(tmp_path, leaves)
    blob = (tmp_path / "weights.bin").read_bytes()
    for leaf, e in zip(leaves, index):
        count = int(np.prod(e["shape"], dtype=np.int64)) if e["shape"] else 1
        back = np.frombuffer(blob, dtype=_np_dtype(e["dtype"]), count=count,
                             offset=e["offset"]).reshape(e["shape"])
        assert back.dtype == leaf.dtype
        np.testing.assert_array_equal(back, leaf)
