"""Checkpoint-driven generation with quality-threshold rejection sampling.

Implements the *intended* inference contract of the reference's
examples/simple_generation.py:33-218 (its actual code imports a nonexistent
`models` package and calls nonexistent methods — SURVEY.md §2.3 #25):
draw z ~ N(0, I) * temperature, decode, teacher-score, keep images whose
mean quality >= quality_threshold, retry up to max_attempts rounds; export
PNGs named with scores, a grid image, and JSON metadata.

TPU-native: decode+score is one jitted batch program of static shape; every
attempt draws `num_samples` fresh latents (so the program never retraces) and
accepted images fill the remaining slots, with a best-scoring fallback pool
for slots still empty after max_attempts.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lunaris_orion_tpu.config import TrainConfig
from lunaris_orion_tpu.models import teacher as teacher_mod
from lunaris_orion_tpu.models import vae as vae_mod
from lunaris_orion_tpu.utils.image import save_png, sample_grid, to_uint8


class ImageGenerator:
    """Loads a training checkpoint and generates quality-filtered sprites."""

    def __init__(self, checkpoint_dir: str, *, best: bool = False,
                 step: Optional[int] = None,
                 config: Optional[TrainConfig] = None, bf16: bool = False):
        """bf16=True runs decode+score in bfloat16 (params stay f32 in the
        checkpoint; activations carry the compute dtype). This is CLOSER to
        the reference's inference numerics than f32 scoring — its attention
        forward is wrapped in @torch.amp.autocast('cuda') unconditionally
        (lunar_evaluator.py:188), so reference scoring runs half precision
        on GPU — while f32 (default) keeps exact-parity scoring."""
        if str(checkpoint_dir).endswith(".pt"):
            # A reference torch checkpoint works directly: weights convert
            # via utils.torch_compat, the model config comes from the
            # checkpoint's own vars(args) snapshot (train_hybrid.py:605).
            if best:
                raise ValueError(
                    "best=True selects a slot in an Orbax checkpoint "
                    "directory; for reference checkpoints point "
                    "--checkpoint at best.pt directly")
            if step is not None:
                raise ValueError(
                    "step= selects a step in an Orbax checkpoint directory; "
                    "a reference .pt file is a single checkpoint")
            from lunaris_orion_tpu.utils import torch_compat

            self.cfg, loaded = torch_compat.load_reference_inference_bundle(
                str(checkpoint_dir), config)
            self.vcfg = self.cfg.vae_config()
            self.tcfg = self.cfg.teacher_config()
            self.vae_params = loaded["vae_params"]
            self.teacher_params = loaded["teacher_params"]
            self.teacher_stats = loaded["teacher_stats"]
            self.step = loaded["global_step"]
        else:
            from lunaris_orion_tpu.train.checkpoint import CheckpointService
            from lunaris_orion_tpu.train.state import create_state

            self.ckpt = CheckpointService(checkpoint_dir)
            self.cfg = config or self.ckpt.load_config()
            if self.cfg is None:
                raise FileNotFoundError(
                    f"no config.json beside checkpoints in {checkpoint_dir}")
            self.vcfg = self.cfg.vae_config()
            self.tcfg = self.cfg.teacher_config()

            abstract = jax.eval_shape(
                lambda k: create_state(k, self.cfg, self.vcfg, self.tcfg),
                jax.random.PRNGKey(0))
            state = self.ckpt.restore(abstract, best=best, step=step)
            self.vae_params = state.vae_params
            self.teacher_params = state.teacher_params
            self.teacher_stats = state.teacher_stats
            self.step = int(state.step)

        vcfg, tcfg = self.vcfg, self.tcfg
        compute_dtype = jnp.bfloat16 if bf16 else jnp.float32

        @jax.jit
        def _decode_and_score(vp, tp, ts, z):
            imgs = vae_mod.decode(vp["decoder"], z.astype(compute_dtype),
                                  [], vcfg)
            out, _ = teacher_mod.apply(tp, ts, imgs, cfg=tcfg, train=False)
            quality = jnp.mean(out["quality_scores"].astype(jnp.float32), -1)
            sem = out["semantic_score"][:, 0].astype(jnp.float32)
            return imgs.astype(jnp.float32), quality, sem

        self._decode_and_score = _decode_and_score

    def generate(self, num_samples: int = 4, *, temperature: float = 1.0,
                 quality_threshold: float = 0.7, max_attempts: int = 5,
                 seed: Optional[int] = None
                 ) -> Tuple[np.ndarray, List[Dict]]:
        """Returns (images uint8 [n,H,W,3], per-image metadata).

        Mirrors simple_generation.py:71-134: keep scoring batches until
        num_samples pass the threshold or attempts run out; if short, the
        best-scoring rejects fill the remainder (reference keeps generating
        up to max_attempts * num_samples draws).
        """
        key = jax.random.PRNGKey(seed if seed is not None else time.time_ns() % 2**31)
        kept_imgs: List[np.ndarray] = []
        kept_meta: List[Dict] = []
        fallback: List[Tuple[float, np.ndarray, Dict]] = []

        for attempt in range(max_attempts):
            key, zkey = jax.random.split(key)
            z = jax.random.normal(
                zkey, (num_samples, self.vcfg.latent_dim)) * temperature
            imgs, quality, sem = self._decode_and_score(
                self.vae_params, self.teacher_params, self.teacher_stats, z)
            imgs_np = to_uint8(np.asarray(imgs))
            q_np = np.asarray(quality)
            s_np = np.asarray(sem)
            for i in range(num_samples):
                meta = {"quality": float(q_np[i]),
                        "semantic": float(s_np[i]),
                        "temperature": temperature,
                        "attempt": attempt,
                        "checkpoint_step": self.step}
                if q_np[i] >= quality_threshold and len(kept_imgs) < num_samples:
                    kept_imgs.append(imgs_np[i])
                    kept_meta.append(meta)
                else:
                    fallback.append((float(q_np[i]), imgs_np[i], meta))
            if len(kept_imgs) >= num_samples:
                break

        if len(kept_imgs) < num_samples and fallback:
            fallback.sort(key=lambda t: -t[0])
            for q, img, meta in fallback[:num_samples - len(kept_imgs)]:
                meta = dict(meta, below_threshold=True)
                kept_imgs.append(img)
                kept_meta.append(meta)
        return np.stack(kept_imgs), kept_meta

    def save_outputs(self, images: np.ndarray, metadata: List[Dict],
                     output_dir: str, *, prompt: str = "",
                     save_metadata: bool = True) -> List[Path]:
        """PNGs named with their scores + grid + metadata JSON
        (simple_generation.py:136-218)."""
        out = Path(output_dir)
        out.mkdir(parents=True, exist_ok=True)
        ts = int(time.time())
        paths = []
        for i, (img, meta) in enumerate(zip(images, metadata)):
            p = out / f"sample_{ts}_{i}_q{meta['quality']:.3f}.png"
            save_png(img.astype(np.float32) / 127.5 - 1.0, p)
            paths.append(p)
        grid = sample_grid(images.astype(np.float32) / 127.5 - 1.0)
        grid_path = out / f"grid_{ts}.png"
        grid.save(grid_path)
        paths.append(grid_path)
        if save_metadata:
            meta_path = out / f"metadata_{ts}.json"
            meta_path.write_text(json.dumps(
                {"prompt": prompt, "generated_at": ts, "samples": metadata},
                indent=2))
            paths.append(meta_path)
        return paths
