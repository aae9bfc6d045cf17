"""Sprite-shard dataset and the device-feeding batch loader.

Data contract (identical to the reference, train_hybrid.py:100-147 /
generate.py:858-904): a directory of
  * `sprites*.npy` — uint8 arrays of shape (N, H, W, 3), H=W=128,
  * `labels*.csv`  — rows with columns filename, category, prompt, seed,
    pixel_size, guidance_scale, pag_scale, num_steps,
with total row count equal to total sprite count.

TPU-native differences from the torch DataLoader pipeline
(train_hybrid.py:529-585):
  * sprites stay uint8 end-to-end on the host; normalization to [-1,1]
    happens on device inside the jitted train step (the torch pipeline does
    float conversion + permute per sample in CPU workers, :181-182),
  * batches are gathered from the memmaps with vectorized per-shard fancy
    indexing (no per-item Python hop, no worker processes / IPC),
  * a background thread stages the next batches onto the device
    (`jax.device_put` with the batch NamedSharding) so host IO overlaps
    device compute.
"""

from __future__ import annotations

import logging
import queue
import threading
from pathlib import Path
from typing import Iterator, List, Tuple

import numpy as np

logger = logging.getLogger(__name__)

LABEL_COLUMNS = ("filename", "category", "prompt", "seed", "pixel_size",
                 "guidance_scale", "pag_scale", "num_steps")


class SpriteDataset:
    """Memory-mapped multi-shard sprite dataset with CSV metadata."""

    def __init__(self, data_dir: str, *, image_size: int = 128,
                 load_labels: bool = True, validate_counts: bool = True):
        self.data_dir = Path(data_dir)
        self.image_size = image_size
        self.sprites_files = sorted(self.data_dir.glob("sprites*.npy"))
        self.labels_files = sorted(self.data_dir.glob("labels*.csv"))
        if not self.sprites_files or (load_labels and not self.labels_files):
            raise ValueError(
                f"No sprites or labels files found in {data_dir}")

        self.shards: List[np.memmap] = []
        for f in self.sprites_files:
            arr = np.load(f, mmap_mode="r")
            if arr.shape[1:] != (image_size, image_size, 3):
                raise ValueError(
                    f"Expected {image_size}x{image_size}x3 images in {f}, "
                    f"got {arr.shape[1:]}")
            self.shards.append(arr)
            logger.info("Loaded %s with %d images", f.name, len(arr))
        self.cumulative = np.cumsum([0] + [len(s) for s in self.shards])

        # Native C++ gather fast path (falls back to numpy transparently).
        self._native = None
        try:
            from lunaris_orion_tpu.data.native import NativeGatherer
            self._native = NativeGatherer(self.shards)
        except Exception as e:
            logger.debug("native gather disabled: %s", e)

        self.labels = None
        if load_labels and self.labels_files:
            import pandas as pd
            frames = []
            for f in self.labels_files:
                for chunk in pd.read_csv(f, chunksize=10000):
                    frames.append(chunk)
            self.labels = pd.concat(frames, ignore_index=True)
            if validate_counts:
                assert len(self.labels) == len(self), (
                    f"Mismatch between total sprites ({len(self)}) and "
                    f"labels ({len(self.labels)})")

    def __len__(self) -> int:
        return int(self.cumulative[-1])

    def metadata(self, idx: int) -> dict:
        if self.labels is None:
            return {}
        row = self.labels.iloc[idx]
        return {c: row[c] for c in LABEL_COLUMNS if c in row}

    def metadata_batch(self, indices: np.ndarray) -> dict:
        """Column-wise metadata for a batch of indices: {column: np.ndarray}.
        The reference's per-sample 8-field metadata dict
        (train_hybrid.py:186-195), vectorized. Empty without labels."""
        if self.labels is None:
            return {}
        rows = self.labels.iloc[np.asarray(indices)]
        return {c: rows[c].to_numpy() for c in LABEL_COLUMNS
                if c in rows.columns}

    def gather(self, indices: np.ndarray) -> np.ndarray:
        """Vectorized uint8 gather across shards -> [n, H, W, 3].
        Uses the native C++ gatherer when built (data/native.py)."""
        indices = np.asarray(indices)
        if self._native is not None:
            return self._native.gather(indices)
        shard_ids = np.searchsorted(self.cumulative, indices, side="right") - 1
        out = np.empty((len(indices), self.image_size, self.image_size, 3),
                       np.uint8)
        for sid in np.unique(shard_ids):
            sel = np.flatnonzero(shard_ids == sid)
            local = indices[sel] - self.cumulative[sid]
            order = np.argsort(local)  # sorted memmap reads
            out[sel[order]] = self.shards[sid][local[order]]
        return out


def train_val_split(n: int, val_fraction: float, seed: int
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Deterministic shuffled split (reference: random_split 90/10 with the
    global torch seed, train_hybrid.py:551-555)."""
    perm = np.random.default_rng(seed).permutation(n)
    n_val = int(round(n * val_fraction))
    return perm[n_val:], perm[:n_val]


class BatchLoader:
    """Yields device-resident uint8 batches [accum, micro_b, H, W, 3].

    Shuffles per epoch with a deterministic per-epoch rng; drops the ragged
    tail (reference drop_last=True, train_hybrid.py:569). If `sharding` is
    given, batches are staged to devices by a prefetch thread.

    Multi-host (SURVEY.md §2.7 DCN axis): when `jax.process_count() > 1`,
    every process iterates the same deterministic global index order but
    gathers ONLY its own contiguous slice of each global batch, and the
    staged array is assembled with `jax.make_array_from_process_local_data`
    — per-host IO, one global array. Assumes the standard process-contiguous
    device order along the batch axis (jax.make_mesh default). Single-host
    behavior is unchanged. `with_metadata=True` additionally yields the
    host-side per-sample metadata columns for the batch (the reference's
    dataset metadata dict, train_hybrid.py:186-195 — its trainer never
    consumes it either, so it stays off the device path by default).
    """

    def __init__(self, dataset: SpriteDataset, indices: np.ndarray, *,
                 batch_size: int, accum_steps: int = 1, seed: int = 0,
                 shuffle: bool = True, sharding=None, prefetch: int = 2,
                 squeeze_accum: bool = False, with_metadata: bool = False,
                 with_indices: bool = False, device_data: bool = False):
        self.ds = dataset
        self.indices = np.asarray(indices)
        self.batch_size = batch_size
        self.accum = accum_steps
        self.seed = seed
        self.shuffle = shuffle
        self.sharding = sharding
        self.prefetch = prefetch
        self.squeeze_accum = squeeze_accum and accum_steps == 1
        self.with_metadata = with_metadata
        self.with_indices = with_indices
        self.epoch = 0
        # Device-resident corpus (r5): stage this loader's whole subset to
        # HBM ONCE and build every batch with an on-device gather, so the
        # steady-state step pays zero host->device batch bytes. The r5 K
        # A/B showed the live-vs-bare gap at fast operating points is
        # per-BATCH staging, not per-call dispatch (BASELINE.md r5) —
        # chaining can't amortize bytes; residency removes them.
        self._corpus = None
        self._dev_gather = None
        if device_data:
            import jax
            if sharding is None or with_metadata or jax.process_count() > 1:
                raise ValueError(
                    "device_data needs a sharding, no metadata streaming, "
                    "and a single process (multi-host residency would "
                    "duplicate the corpus per host slice — unimplemented)")
            self._init_device_corpus()

    def corpus_nbytes(self) -> int:
        """HBM the device-resident corpus occupies (0 when streaming)."""
        return 0 if self._corpus is None else self._corpus.nbytes

    def _init_device_corpus(self):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec
        mesh = self.sharding.mesh
        replicated = NamedSharding(mesh, PartitionSpec())
        # Corpus rows follow self.indices order; epochs permute POSITIONS.
        self._corpus = jax.device_put(self.ds.gather(self.indices),
                                      replicated)
        accum, bs, sq = self.accum, self.batch_size, self.squeeze_accum

        def gather(corpus, pos):
            batch = jnp.take(corpus, pos, axis=0)
            if not sq:
                batch = batch.reshape(accum, bs, *batch.shape[1:])
            return batch

        self._dev_gather = jax.jit(
            gather, in_shardings=(replicated, replicated),
            out_shardings=self.sharding)

    def __len__(self) -> int:
        return len(self.indices) // (self.batch_size * self.accum)

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _local_slice(self, n: int) -> Tuple[int, int]:
        """This process's contiguous row range of a global batch of n."""
        import jax
        p, np_ = jax.process_index(), jax.process_count()
        assert n % np_ == 0, (
            f"global batch {n} not divisible by {np_} processes")
        per = n // np_
        return p * per, (p + 1) * per

    def _host_batches(self) -> Iterator[np.ndarray]:
        import jax
        idx = self.indices
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self.epoch))
            idx = rng.permutation(idx)
        step = self.batch_size * self.accum
        multihost = self.sharding is not None and jax.process_count() > 1
        for start in range(0, len(idx) - step + 1, step):
            chunk = idx[start:start + step]
            if multihost:
                # The global batch axis (sharded over 'data') is axis 1 of
                # [accum, batch, ...] (axis 0 when squeeze_accum) — slice
                # THAT axis per process, not flat rows.
                if self.squeeze_accum:
                    lo, hi = self._local_slice(len(chunk))
                    chunk = chunk[lo:hi]
                else:
                    lo, hi = self._local_slice(self.batch_size)
                    chunk = chunk.reshape(
                        self.accum, self.batch_size)[:, lo:hi].reshape(-1)
            flat = self.ds.gather(chunk)
            if not self.squeeze_accum:
                flat = flat.reshape(self.accum, -1, *flat.shape[1:])
            extras = []
            if self.with_metadata:
                extras.append(self.ds.metadata_batch(chunk))
            if self.with_indices:
                extras.append(chunk if self.squeeze_accum
                              else chunk.reshape(self.accum, -1))
            yield (flat, *extras) if extras else flat

    def _stage(self, hb):
        """Host batch -> device array under self.sharding."""
        import jax
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(self.sharding, hb)
        return jax.device_put(hb, self.sharding)

    def _device_batches(self):
        """Device-resident twin of _host_batches: SAME deterministic
        per-epoch index order (the identical rng.permutation over dataset
        indices), but each batch is an on-device jnp.take from the staged
        corpus — the only host->device traffic is the int32 position
        vector. Yields the same (batch[, indices]) structure."""
        import numpy as np
        idx = self.indices
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self.epoch))
            idx = rng.permutation(idx)
        # dataset index value -> corpus row (corpus rows follow
        # self.indices order; split indices are unique)
        order = np.argsort(self.indices)
        step = self.batch_size * self.accum
        for start in range(0, len(idx) - step + 1, step):
            chunk = idx[start:start + step]
            pos = order[np.searchsorted(self.indices[order], chunk)]
            batch = self._dev_gather(self._corpus, pos.astype(np.int32))
            if self.with_indices:
                yield (batch, chunk if self.squeeze_accum
                       else chunk.reshape(self.accum, -1))
            else:
                yield batch

    def __iter__(self):
        if self._corpus is not None:
            yield from self._device_batches()
            return
        if self.sharding is None:
            yield from self._host_batches()
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        err: list = []

        def producer():
            try:
                for item in self._host_batches():
                    if isinstance(item, tuple):
                        q.put((self._stage(item[0]), *item[1:]))
                    else:
                        q.put(self._stage(item))
            except Exception as e:  # pragma: no cover
                err.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        if err:
            raise err[0]
