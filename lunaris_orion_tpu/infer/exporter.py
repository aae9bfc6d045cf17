"""Ahead-of-time serving export: inference entry points as StableHLO.

The reference has no deployment story beyond running a Python script with
the full model code importable (examples/simple_generation.py — which does
not even run, SURVEY.md §2.3 #25). Production serving wants a *versioned
artifact*: something a serving process can load and execute without the
model source, with the weights pinned at export time. This module provides
that via `jax.export`:

  * ``generate``: z f32 [B, latent_dim] -> (images uint8 [B, H, W, 3],
    quality_mean f32 [B], semantic f32 [B]) — the generator's fused
    decode+score program (infer/generator.py), uint8 conversion in-graph.
    Callers bring their own latents, so the artifact stays a pure
    function (temperature = scale z before the call; rejection loops are
    a few lines of caller code over the returned scores).
  * ``score``: images uint8 [B, H, W, 3] -> (quality f32 [B, 4],
    expert_weights f32 [B, E], semantic f32 [B], style f32 [B, emb]) —
    the evaluator's scoring program (infer/evaluator.py), normalization
    in-graph.

Weights are stored ONCE per bundle in a sidecar blob (``weights.bin`` +
a typed index in the manifest) and every exported program takes them as
arguments — so a bundle with 4 batch sizes is ~checkpoint-sized, not 4x
(bundle-v1 baked them into every artifact as constants; the loader still
reads v1 bundles). Shapes are static — export one artifact per serving
batch size; a loaded bundle dispatches on the input's leading dimension
and feeds the shared weights automatically. Attention defaults to the XLA
composition
(``attn="xla"``) so the artifact is pure portable StableHLO and can be
exported for several platforms at once (``platforms=["tpu", "cpu"]``);
``attn="pallas"`` embeds the Mosaic kernel custom-calls (TPU-only,
faster at N=16384) under jax.export's custom-call compatibility
guarantees.

Artifact layout::

    out_dir/
      manifest.json            # functions, weight index, config snapshot
      weights.bin              # every weight leaf ONCE (raw, concatenated)
      generate_b16.stablehlo   # one SMALL program per (function, batch)
      score_b16.stablehlo
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from lunaris_orion_tpu.config import TrainConfig
from lunaris_orion_tpu.models import teacher as teacher_mod
from lunaris_orion_tpu.models import vae as vae_mod

_SUFFIX = ".stablehlo"


def _build_generate(vcfg, tcfg, weights_treedef, compute_dtype,
                    attn_impl: str):
    """(weight leaves, z) -> (uint8 images, quality_mean, semantic).

    Weights arrive as the bundle's shared flat leaf list (v2 format) and
    are unflattened with the treedef closed over at trace time — only the
    *structure* is baked into the program, never the values."""

    def fn(leaves, z):
        decoder, teacher_params, teacher_stats = jax.tree_util.tree_unflatten(
            weights_treedef, leaves)
        imgs = vae_mod.decode(decoder, z.astype(compute_dtype), [], vcfg)
        out, _ = teacher_mod.apply(teacher_params, teacher_stats, imgs,
                                   cfg=tcfg, train=False,
                                   attn_impl=attn_impl)
        quality = jnp.mean(out["quality_scores"].astype(jnp.float32), -1)
        sem = out["semantic_score"][:, 0].astype(jnp.float32)
        u8 = jnp.clip((imgs.astype(jnp.float32) + 1.0) * 127.5,
                      0, 255).astype(jnp.uint8)  # = utils.image.to_uint8
        return u8, quality, sem

    return fn


def _build_score(tcfg, weights_treedef, compute_dtype, attn_impl: str):
    """(weight leaves, uint8 images) -> (quality, expert_weights, semantic,
    style). The decoder leaves in the shared list go unused here; XLA
    drops them, and sharing one leaf list keeps the loader trivial."""

    def fn(leaves, images):
        _, teacher_params, teacher_stats = jax.tree_util.tree_unflatten(
            weights_treedef, leaves)
        x = images.astype(compute_dtype) / jnp.asarray(
            127.5, compute_dtype) - 1.0  # = train.step.normalize_images
        out, _ = teacher_mod.apply(teacher_params, teacher_stats, x,
                                   cfg=tcfg, train=False,
                                   attn_impl=attn_impl)
        return (out["quality_scores"].astype(jnp.float32),
                out["expert_weights"].astype(jnp.float32),
                out["semantic_score"][:, 0].astype(jnp.float32),
                out["style_embedding"].astype(jnp.float32))

    return fn


def _np_dtype(name: str):
    """dtype name -> numpy dtype, covering the ml_dtypes extras (bf16)."""
    try:
        return np.dtype(name)
    except TypeError:
        import ml_dtypes
        return np.dtype(getattr(ml_dtypes, name))


def _write_weights(out: Path, leaves) -> List[Dict]:
    """Concatenate every leaf's raw bytes into weights.bin; return the
    typed index (dtype/shape/offset per leaf, manifest['weights'])."""
    index, offset = [], 0
    with (out / "weights.bin").open("wb") as f:
        for leaf in leaves:
            arr = np.asarray(leaf)
            data = np.ascontiguousarray(arr).tobytes()
            index.append({"dtype": arr.dtype.name,
                          "shape": list(arr.shape),
                          "offset": offset, "nbytes": len(data)})
            f.write(data)
            offset += len(data)
    return index


def export_serving_bundle(checkpoint: str, out_dir: str, *,
                          batch_sizes: Sequence[int] = (16,),
                          functions: Sequence[str] = ("generate", "score"),
                          best: bool = False,
                          config: Optional[TrainConfig] = None,
                          bf16: bool = False, attn: str = "xla",
                          platforms: Optional[Sequence[str]] = None) -> Dict:
    """Export serving artifacts for `checkpoint` into `out_dir`.

    checkpoint: an Orbax checkpoint directory or a reference ``.pt`` file
    (both load exactly as in ImageGenerator). Returns the manifest dict.
    """
    if attn not in ("xla", "pallas"):
        raise ValueError(f"attn must be 'xla' or 'pallas', got {attn!r}")
    if attn == "pallas" and platforms and set(platforms) != {"tpu"}:
        raise ValueError("attn='pallas' artifacts embed Mosaic TPU "
                         "custom-calls; platforms must be ['tpu']")
    bad = set(functions) - {"generate", "score"}
    if bad:
        raise ValueError(f"unknown functions: {sorted(bad)}")

    # Reuse the generator's checkpoint bootstrap (handles .pt and Orbax,
    # config snapshots, best-slot selection).
    from lunaris_orion_tpu.infer.generator import ImageGenerator
    gen = ImageGenerator(checkpoint, best=best, config=config)
    vcfg, tcfg = gen.vcfg, gen.tcfg
    compute_dtype = jnp.bfloat16 if bf16 else jnp.float32

    # One shared weight leaf list for the whole bundle (written ONCE);
    # every program takes it as its first argument.
    weights = (gen.vae_params["decoder"], gen.teacher_params,
               gen.teacher_stats)
    leaves, treedef = jax.tree_util.tree_flatten(weights)
    leaf_specs = [jax.ShapeDtypeStruct(l.shape, l.dtype) for l in leaves]

    builders = {
        "generate": (
            _build_generate(vcfg, tcfg, treedef, compute_dtype, attn),
            lambda b: jax.ShapeDtypeStruct((b, vcfg.latent_dim),
                                           jnp.float32)),
        "score": (
            _build_score(tcfg, treedef, compute_dtype, attn),
            lambda b: jax.ShapeDtypeStruct(
                (b, tcfg.image_size, tcfg.image_size, 3), jnp.uint8)),
    }

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    weight_index = _write_weights(out, leaves)
    kwargs = {"platforms": list(platforms)} if platforms else {}
    entries = {}
    for name in functions:
        fn, arg_spec = builders[name]
        for b in batch_sizes:
            spec = arg_spec(int(b))
            exp = jax_export.export(jax.jit(fn), **kwargs)(leaf_specs, spec)
            fname = f"{name}_b{b}{_SUFFIX}"
            (out / fname).write_bytes(exp.serialize())
            entries[f"{name}_b{b}"] = {
                "file": fname, "function": name, "batch": int(b),
                "in_avals": [f"{spec.dtype}{list(spec.shape)}"],
                "platforms": list(exp.platforms),
            }

    manifest = {
        "format": "lunaris-serving-bundle-v2",
        "functions": entries,
        "weights_file": "weights.bin",
        "weights": weight_index,
        "checkpoint_step": gen.step,
        "attn": attn,
        "bf16": bf16,
        "jax_version": jax.__version__,
        "image_size": tcfg.image_size,
        "latent_dim": vcfg.latent_dim,
        "config": dataclasses.asdict(gen.cfg),
    }
    (out / "manifest.json").write_text(json.dumps(manifest, indent=1))
    return manifest


class ServingBundle:
    """Loads an exported bundle and dispatches calls by batch size.

    No model code runs — each call executes the deserialized StableHLO
    through jax.export's calling convention on the current backend. The
    v2 format's shared weights load from weights.bin once, lazily, and
    are fed to every program; v1 bundles (weights baked as constants)
    still load.
    """

    def __init__(self, path: str):
        self.path = Path(path)
        self.manifest = json.loads((self.path / "manifest.json").read_text())
        fmt = self.manifest.get("format")
        if fmt not in ("lunaris-serving-bundle-v1",
                       "lunaris-serving-bundle-v2"):
            raise ValueError(f"{path} is not a lunaris serving bundle")
        self._shared_weights = "weights" in self.manifest
        self._weights: Optional[List[jnp.ndarray]] = None
        self._loaded: Dict[str, object] = {}

    def batch_sizes(self, function: str) -> List[int]:
        return sorted(e["batch"]
                      for e in self.manifest["functions"].values()
                      if e["function"] == function)

    def _load_weights(self) -> List[jnp.ndarray]:
        if self._weights is None:
            blob = (self.path
                    / self.manifest.get("weights_file",
                                        "weights.bin")).read_bytes()
            self._weights = [
                jnp.asarray(np.frombuffer(
                    blob, dtype=_np_dtype(e["dtype"]), count=int(
                        np.prod(e["shape"], dtype=np.int64)) if e["shape"]
                    else 1, offset=e["offset"]).reshape(e["shape"]))
                for e in self.manifest["weights"]]
        return self._weights

    def _call(self, function: str, arr):
        b = arr.shape[0]
        key = f"{function}_b{b}"
        entry = self.manifest["functions"].get(key)
        if entry is None:
            raise ValueError(
                f"bundle has no {function!r} artifact for batch {b}; "
                f"available: {self.batch_sizes(function)}")
        if key not in self._loaded:
            data = (self.path / entry["file"]).read_bytes()
            self._loaded[key] = jax_export.deserialize(data)
        if self._shared_weights:
            return self._loaded[key].call(self._load_weights(), arr)
        return self._loaded[key].call(arr)

    def generate(self, z: np.ndarray):
        """z f32 [B, latent_dim] -> (images uint8, quality_mean, semantic).
        Scale z by your temperature before calling."""
        imgs, q, s = self._call("generate", jnp.asarray(z, jnp.float32))
        return np.asarray(imgs), np.asarray(q), np.asarray(s)

    def score(self, images: np.ndarray):
        """uint8 [B, H, W, 3] -> (quality [B,4], expert_weights, semantic,
        style)."""
        out = self._call("score", jnp.asarray(images, jnp.uint8))
        return tuple(np.asarray(o) for o in out)
