"""Data-tier tests: contract validation, gather, split, loader determinism."""

import numpy as np
import pytest

from lunaris_orion_tpu.data.dataset import SpriteDataset, BatchLoader, train_val_split
from lunaris_orion_tpu.data.synthetic import write_synthetic_dataset


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sprites")
    write_synthetic_dataset(d, 100, image_size=32, shards=3)
    return d


class TestSpriteDataset:
    def test_multi_shard_load_and_len(self, data_dir):
        ds = SpriteDataset(data_dir, image_size=32)
        assert len(ds) == 100
        assert len(ds.shards) == 3
        assert len(ds.labels) == 100

    def test_gather_cross_shard(self, data_dir):
        ds = SpriteDataset(data_dir, image_size=32)
        idx = np.array([0, 50, 99, 34, 33])  # spans shards, unsorted
        out = ds.gather(idx)
        assert out.shape == (5, 32, 32, 3) and out.dtype == np.uint8
        for k, i in enumerate(idx):
            sid = np.searchsorted(ds.cumulative, i, side="right") - 1
            np.testing.assert_array_equal(
                out[k], ds.shards[sid][i - ds.cumulative[sid]])

    def test_metadata_columns(self, data_dir):
        ds = SpriteDataset(data_dir, image_size=32)
        md = ds.metadata(7)
        assert set(md) == {"filename", "category", "prompt", "seed",
                           "pixel_size", "guidance_scale", "pag_scale",
                           "num_steps"}

    def test_wrong_shape_rejected(self, tmp_path):
        write_synthetic_dataset(tmp_path, 4, image_size=16)
        with pytest.raises(ValueError, match="Expected 32x32x3"):
            SpriteDataset(tmp_path, image_size=32)

    def test_count_mismatch_rejected(self, tmp_path):
        write_synthetic_dataset(tmp_path, 4, image_size=16)
        import pandas as pd
        f = next(tmp_path.glob("labels*.csv"))
        pd.read_csv(f).iloc[:2].to_csv(f, index=False)
        with pytest.raises(AssertionError, match="Mismatch"):
            SpriteDataset(tmp_path, image_size=16)

    def test_empty_dir_rejected(self, tmp_path):
        with pytest.raises(ValueError, match="No sprites"):
            SpriteDataset(tmp_path)


class TestSplitAndLoader:
    def test_split_deterministic_disjoint(self):
        a1, b1 = train_val_split(100, 0.1, seed=42)
        a2, b2 = train_val_split(100, 0.1, seed=42)
        np.testing.assert_array_equal(a1, a2)
        assert len(b1) == 10 and len(a1) == 90
        assert not set(a1) & set(b1)
        a3, _ = train_val_split(100, 0.1, seed=43)
        assert not np.array_equal(a1, a3)

    def test_loader_shapes_and_epoch_shuffle(self, data_dir):
        ds = SpriteDataset(data_dir, image_size=32)
        idx, _ = train_val_split(len(ds), 0.1, seed=0)
        loader = BatchLoader(ds, idx, batch_size=4, accum_steps=2, seed=0)
        batches = list(loader)
        assert len(batches) == len(loader) == 90 // 8
        assert batches[0].shape == (2, 4, 32, 32, 3)
        assert batches[0].dtype == np.uint8
        # same epoch -> same order; next epoch -> different
        again = list(loader)
        np.testing.assert_array_equal(batches[0], again[0])
        loader.set_epoch(1)
        other = list(loader)
        assert not np.array_equal(batches[0], other[0])

    def test_device_prefetch(self, data_dir):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P
        from lunaris_orion_tpu.parallel import make_mesh
        ds = SpriteDataset(data_dir, image_size=32)
        mesh = make_mesh((8, 1))
        shard = NamedSharding(mesh, P(None, "data"))
        loader = BatchLoader(ds, np.arange(64), batch_size=8, accum_steps=2,
                             sharding=shard)
        got = list(loader)
        assert len(got) == 4
        assert got[0].sharding == shard
        assert got[0].shape == (2, 8, 32, 32, 3)


class TestMetadataSurfacing:
    def test_metadata_batch_vectorized(self, data_dir):
        ds = SpriteDataset(data_dir, image_size=32)
        idx = np.array([3, 77, 12])
        md = ds.metadata_batch(idx)
        assert set(md) == {"filename", "category", "prompt", "seed",
                           "pixel_size", "guidance_scale", "pag_scale",
                           "num_steps"}
        for k, i in enumerate(idx):
            assert md["prompt"][k] == ds.metadata(int(i))["prompt"]

    def test_loader_with_metadata(self, data_dir):
        """BatchLoader surfaces the reference's per-sample metadata
        (train_hybrid.py:186-195) alongside each batch."""
        ds = SpriteDataset(data_dir, image_size=32)
        loader = BatchLoader(ds, np.arange(32), batch_size=4, accum_steps=2,
                             shuffle=False, with_metadata=True)
        batch, meta = next(iter(loader))
        assert batch.shape == (2, 4, 32, 32, 3)
        assert len(meta["category"]) == 8
        np.testing.assert_array_equal(
            meta["seed"], ds.metadata_batch(np.arange(8))["seed"])


class TestPromptDiversity:
    """VERDICT r1 item 10: prompt-bank breadth (reference: ~550 bank lines,
    generate.py:81-617). Diversity target: dedup rate at 2,000 prompts < 1%
    and >= 3x round-1 combination counts."""

    def test_dedup_rate_under_one_percent(self):
        from lunaris_orion_tpu.data.prompts import PromptEngine
        eng = PromptEngine(seed=0)
        n = 2000
        prompts = [eng.build_prompt()[0] for _ in range(n)]
        dupes = n - len(set(prompts))
        assert dupes / n < 0.01, f"{dupes} duplicates in {n}"

    def test_combination_counts(self):
        from lunaris_orion_tpu.data.prompts import (CATEGORY_WEIGHTS,
                                                    combination_count)
        # round-1 character-category space was 96,000 combinations
        for cat in CATEGORY_WEIGHTS:
            assert combination_count(cat) >= 3 * 96_000, cat

    def test_token_cap_and_envelope(self):
        from lunaris_orion_tpu.data.prompts import (MAX_PROMPT_TOKENS,
                                                    PromptEngine)
        eng = PromptEngine(seed=1)
        for _ in range(200):
            p, cat = eng.build_prompt()
            assert len(p.split()) <= MAX_PROMPT_TOKENS
            assert p.startswith(f"[CATEGORY]{cat}[SUBJECT]")
            assert p.endswith("[END]")


class TestMultiHostSlicing:
    """Per-host slicing of the global batch axis (BatchLoader multi-host
    path): each process must take its contiguous slice of the BATCH axis of
    [accum, batch, ...], not of the flattened rows."""

    def test_local_slice_partitions_batch_axis(self, data_dir, monkeypatch):
        import jax
        ds = SpriteDataset(data_dir, image_size=32)
        full = BatchLoader(ds, np.arange(64), batch_size=8, accum_steps=2,
                           shuffle=False)
        full_batch = next(iter(full._host_batches()))  # [2, 8, 32, 32, 3]

        monkeypatch.setattr(jax, "process_count", lambda: 2)
        got = {}
        for pidx in (0, 1):
            monkeypatch.setattr(jax, "process_index", lambda p=pidx: p)
            loader = BatchLoader(ds, np.arange(64), batch_size=8,
                                 accum_steps=2, shuffle=False,
                                 sharding=object())  # enables multihost path
            got[pidx] = next(iter(loader._host_batches()))
            assert got[pidx].shape == (2, 4, 32, 32, 3)
        np.testing.assert_array_equal(got[0], full_batch[:, :4])
        np.testing.assert_array_equal(got[1], full_batch[:, 4:])

    def test_uneven_split_rejected(self, data_dir, monkeypatch):
        import jax
        ds = SpriteDataset(data_dir, image_size=32)
        monkeypatch.setattr(jax, "process_count", lambda: 3)
        monkeypatch.setattr(jax, "process_index", lambda: 0)
        loader = BatchLoader(ds, np.arange(64), batch_size=8, accum_steps=1,
                             shuffle=False, sharding=object())
        with pytest.raises(AssertionError, match="not divisible"):
            next(iter(loader._host_batches()))

    def test_cached_embedding_staging_matches_loader_slices(
            self, data_dir, monkeypatch):
        """Cached-prompt-embedding staging under multi-host (ADVICE r2
        medium): the loader yields process-local index slices, so the
        embedding rows looked up from the host table are this process's
        shard and Trainer._stage_pe must assemble them with
        make_array_from_process_local_data — and the union of per-process
        rows must reconstruct the full global [accum, batch] table lookup."""
        import jax
        from lunaris_orion_tpu.train.loop import Trainer

        ds = SpriteDataset(data_dir, image_size=32)
        table = np.arange(64 * 3, dtype=np.float32).reshape(64, 3)
        full = BatchLoader(ds, np.arange(64), batch_size=8, accum_steps=2,
                           shuffle=False, with_indices=True)
        _, full_idx = next(iter(full._host_batches()))
        global_pe = table[full_idx]  # [2, 8, 3]

        monkeypatch.setattr(jax, "process_count", lambda: 2)
        staged = {}
        monkeypatch.setattr(
            jax, "make_array_from_process_local_data",
            lambda shard, rows: staged.setdefault("call", (shard, rows)))
        for pidx in (0, 1):
            monkeypatch.setattr(jax, "process_index", lambda p=pidx: p)
            loader = BatchLoader(ds, np.arange(64), batch_size=8,
                                 accum_steps=2, shuffle=False,
                                 sharding=object(), with_indices=True)
            _, b_idx = next(iter(loader._host_batches()))
            shard_sentinel = object()
            fake_self = type("T", (), {"batch_shard": shard_sentinel})()
            staged.clear()
            Trainer._stage_pe(fake_self, table[b_idx])
            shard, rows = staged["call"]
            assert shard is shard_sentinel
            # Process p's staged rows == its batch-axis slice of the global
            # lookup — the contract make_array_from_process_local_data needs.
            np.testing.assert_array_equal(
                rows, global_pe[:, pidx * 4:(pidx + 1) * 4])


class TestDeviceResidentLoader:
    """--device_data (r5): the corpus lives in HBM, batches are on-device
    gathers. Contract: bit-identical batch content AND order vs the
    streaming loader at the same seed/epoch, same extras, zero host bytes
    per step (nothing to assert directly on CPU; parity is the guarantee)."""

    def _loaders(self, data_dir, **kw):
        import numpy as np
        from jax.sharding import NamedSharding, PartitionSpec as P
        from lunaris_orion_tpu.parallel import make_mesh
        ds = SpriteDataset(data_dir, image_size=32)
        idx, _ = train_val_split(len(ds), 0.1, seed=3)
        mesh = make_mesh((8, 1))
        shard = NamedSharding(mesh, P(None, "data"))
        mk = lambda dd: BatchLoader(ds, idx, batch_size=8, accum_steps=2,
                                    seed=5, sharding=shard,
                                    device_data=dd, **kw)
        return mk(False), mk(True)

    def test_matches_streaming_loader_across_epochs(self, data_dir):
        stream, dev = self._loaders(data_dir)
        for epoch in (0, 1):
            stream.set_epoch(epoch)
            dev.set_epoch(epoch)
            a, b = list(stream), list(dev)
            assert len(a) == len(b) == len(stream)
            for x, y in zip(a, b):
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_with_indices_extras_match(self, data_dir):
        stream, dev = self._loaders(data_dir, with_indices=True)
        for (xa, ia), (xb, ib) in zip(stream, dev):
            np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))
            np.testing.assert_array_equal(ia, ib)

    def test_squeeze_accum_val_shape(self, data_dir):
        from jax.sharding import NamedSharding, PartitionSpec as P
        from lunaris_orion_tpu.parallel import make_mesh
        ds = SpriteDataset(data_dir, image_size=32)
        mesh = make_mesh((8, 1))
        shard = NamedSharding(mesh, P("data"))
        loader = BatchLoader(ds, np.arange(64), batch_size=8, accum_steps=1,
                             shuffle=False, squeeze_accum=True,
                             sharding=shard, device_data=True)
        got = list(loader)
        assert got[0].shape == (8, 32, 32, 3)
        assert loader.corpus_nbytes() == 64 * 32 * 32 * 3

    def test_rejected_without_sharding_or_with_metadata(self, data_dir):
        ds = SpriteDataset(data_dir, image_size=32)
        with pytest.raises(ValueError):
            BatchLoader(ds, np.arange(16), batch_size=4, device_data=True)
