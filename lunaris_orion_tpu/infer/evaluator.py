"""Teacher-based quality scoring of existing images (evaluator CLI backend).

The reference exposes the teacher only inside training; its docs describe a
standalone quality assessor (lunar_evaluator.py module docstring, items 1-4).
This provides that: score a directory of PNGs or a sprites_*.npy shard.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lunaris_orion_tpu.config import TrainConfig
from lunaris_orion_tpu.models import teacher as teacher_mod


class QualityEvaluator:
    def __init__(self, checkpoint_dir: str, *, best: bool = False,
                 config: Optional[TrainConfig] = None,
                 attn_window: Optional[int] = None, bf16: bool = False):
        """attn_window: override the teacher's attention window for scoring
        (local-window attention, docs/parity.md deviation 12) — batch
        scoring is ~7x faster at window 256 on 128px inputs. None keeps
        the checkpoint's own setting.

        bf16: score in bfloat16 activations — CLOSER to the reference's
        numerics than f32 (its attention forward autocasts to fp16 on GPU
        unconditionally, lunar_evaluator.py:188) and measured faster on
        TPU; f32 (default) keeps exact-parity scoring."""
        self._compute_dtype = jnp.bfloat16 if bf16 else jnp.float32
        if str(checkpoint_dir).endswith(".pt"):
            # Reference torch checkpoints score directly (weights via
            # utils.torch_compat, config from the vars(args) snapshot).
            if best:
                raise ValueError(
                    "best=True selects a slot in an Orbax checkpoint "
                    "directory; for reference checkpoints point "
                    "--checkpoint at best.pt directly")
            from lunaris_orion_tpu.utils import torch_compat

            self.cfg, loaded = torch_compat.load_reference_inference_bundle(
                str(checkpoint_dir), config)
            if attn_window is not None:
                self.cfg = self.cfg.replace(attn_window=attn_window)
            self.tcfg = self.cfg.teacher_config()
            self.params = loaded["teacher_params"]
            self.stats = loaded["teacher_stats"]
        else:
            from lunaris_orion_tpu.train.checkpoint import CheckpointService
            from lunaris_orion_tpu.train.state import create_state

            ckpt = CheckpointService(checkpoint_dir)
            self.cfg = config or ckpt.load_config()
            if self.cfg is None:
                raise FileNotFoundError(
                    f"no config.json beside checkpoints in {checkpoint_dir}")
            if attn_window is not None:
                self.cfg = self.cfg.replace(attn_window=attn_window)
            self.tcfg = self.cfg.teacher_config()
            abstract = jax.eval_shape(
                lambda k: create_state(k, self.cfg, self.cfg.vae_config(),
                                       self.tcfg), jax.random.PRNGKey(0))
            state = ckpt.restore(abstract, best=best)
            self.params = state.teacher_params
            self.stats = state.teacher_stats
        self._score = self._make_score(self.tcfg)
        self._score_global = None  # lazy window-free fallback

    def _make_score(self, tcfg):
        dtype = self._compute_dtype

        @jax.jit
        def _score(tp, ts, x):
            out, _ = teacher_mod.apply(tp, ts, x.astype(dtype), cfg=tcfg,
                                       train=False)
            return (out["quality_scores"].astype(jnp.float32),
                    out["expert_weights"].astype(jnp.float32),
                    out["semantic_score"].astype(jnp.float32),
                    out["style_embedding"].astype(jnp.float32))

        return _score

    def score_batch(self, images: np.ndarray, *,
                    global_attn: bool = False) -> List[Dict]:
        """images: uint8 [n,H,W,3] or float [-1,1]. Returns per-image dicts
        with the 4 quality metrics + overall + semantic + expert weights.

        global_attn=True scores with the attention window override removed
        (the faithful global path) — used by score_directory for shape
        groups whose token count the window cannot tile."""
        fn = self._score
        if global_attn:
            if self._score_global is None:
                import dataclasses
                self._score_global = self._make_score(
                    dataclasses.replace(self.tcfg, attn_window=None))
            fn = self._score_global
        x = jnp.asarray(images)
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) / 127.5 - 1.0
        q, w, s, _ = fn(self.params, self.stats, x)
        q, w, s = np.asarray(q), np.asarray(w), np.asarray(s)
        names = ("edge_quality", "color_consistency", "detail", "overall")
        return [
            {
                **{n: float(q[i, j]) for j, n in enumerate(names)},
                "mean_quality": float(q[i].mean()),
                "semantic_score": float(s[i, 0]),
                "expert_weights": [float(v) for v in w[i]],
            }
            for i in range(len(q))
        ]

    def score_directory(self, path: str, *, batch_size: int = 64) -> Dict:
        """Scores all PNGs or sprite shards under `path`."""
        from PIL import Image
        p = Path(path)
        results: Dict[str, Dict] = {}
        # Group PNGs by shape (a sample dir can also hold grid/montage images
        # of a different size; each uniform group is scored as one batch).
        by_shape: Dict[tuple, List] = {}
        for f in sorted(p.glob("*.png")):
            arr = np.asarray(Image.open(f).convert("RGB"), np.uint8)
            by_shape.setdefault(arr.shape, []).append((f.name, arr))

        def _score_group(pairs):
            # One uniform-shape group. An attn_window override may not tile
            # this shape's token count (e.g. odd-sized montage PNGs): fall
            # back to the faithful global path for the group instead of
            # aborting the run and losing every already-scored group. The
            # switch is surfaced (attn_window is a scoring deviation, so
            # windowed and global scores must not mix silently): a warning
            # per group + an "attn_mode" field on the affected entries.
            from lunaris_orion_tpu.ops.attention import WindowTilingError
            global_attn = False
            for start in range(0, len(pairs), batch_size):
                chunk = pairs[start:start + batch_size]
                imgs = np.stack([a for _, a in chunk])
                try:
                    scores = self.score_batch(imgs, global_attn=global_attn)
                except WindowTilingError as e:
                    import warnings
                    warnings.warn(
                        f"attn_window cannot tile shape {imgs.shape[1:]} "
                        f"({e}); scoring this group with global attention "
                        "— its scores are marked attn_mode="
                        "'global-fallback'", stacklevel=3)
                    global_attn = True
                    scores = self.score_batch(imgs, global_attn=True)
                if global_attn:
                    for s in scores:
                        s["attn_mode"] = "global-fallback"
                for (key, _), s in zip(chunk, scores):
                    results[key] = s

        for shape, items in by_shape.items():
            _score_group(items)
        for shard in sorted(p.glob("sprites*.npy")):
            arr = np.load(shard, mmap_mode="r")
            _score_group([(f"{shard.name}[{i}]", arr[i])
                          for i in range(len(arr))])
        return results
