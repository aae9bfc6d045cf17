"""The jitted hybrid train step.

One call == one optimizer step == `gradient_accumulation_steps` micro-batches
processed by `lax.scan` (replacing the reference's Python-side accumulation
loop, train_hybrid.py:907-926). Everything — uint8 normalization, both model
forwards, the RL reward/baseline, both grads, clipping, both AdamW updates,
metric reduction — compiles into a single XLA program. Under a sharded mesh
the gradient all-reduce over ICI is inserted by the SPMD partitioner.

Per micro-batch (mirrors _process_batch, train_hybrid.py:838-905):
  1. normalize uint8 -> [-1,1] in the compute dtype (on device; the torch
     pipeline does this per-sample on CPU workers, train_hybrid.py:181-182),
  2. VAE forward (posterior sample),
  3. teacher forward on the *inputs* (outside grad == torch.no_grad,
     :853-855) -> prompt embeddings; BN stats advance,
  4. grad of [vae_loss(recon,kl,pg) + teacher_loss(quality)] wrt both models
     — equivalent to the reference's two separate backwards because recon is
     stop_gradient'd into the teacher and the advantage is stop_gradient'd,
  5. baseline EMA carried through the scan (the torch code syncs to host
     via .item() every batch, :876-879 — ours never leaves the device).

Fused teacher mode (cfg.fuse_teacher, default False): the reference runs the
teacher TWICE per micro-batch on same-shaped inputs (train_hybrid.py:853,865).
Fused, both calls become ONE forward on the batch-concatenation
[x; stop_gradient(recon)] at 2B; the semantic-conditioning cosine
(teacher.apply's prompt branch) is applied post-hoc to the recon half
against the x half's embedding — identical math. MEASURED SLOWER on v5e
(7.32 s vs 4.96 s per step at 128px defaults, tools/bench_hybrid.py):
both calls already inline into ONE jitted XLA program, so fusing saves no
dispatch overhead, while the first call — which is gradient-free in the
sequential form (outside jax.grad) — starts paying backward FLOPs for its
half of the 2B batch (+50% teacher backward). Kept as an option for
hardware where occupancy dominates. Deviation when enabled: BatchNorm
train-mode batch statistics are joint over 2B and running stats advance
once (not twice) per micro-batch (docs/parity.md).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from lunaris_orion_tpu.config import TrainConfig, VAEConfig, TeacherConfig
from lunaris_orion_tpu.models import teacher as teacher_mod
from lunaris_orion_tpu.models import vae as vae_mod
from lunaris_orion_tpu.train import losses as losses_mod
from lunaris_orion_tpu.train.losses import LossWeights
from lunaris_orion_tpu.train.state import TrainState, make_optimizers

Metrics = Dict[str, jax.Array]


def normalize_images(batch: jax.Array, dtype) -> jax.Array:
    """uint8 [0,255] -> [-1,1] (train_hybrid.py:181); float passes through."""
    if batch.dtype == jnp.uint8:
        return batch.astype(dtype) / jnp.asarray(127.5, dtype) - 1.0
    return batch.astype(dtype)


def make_train_step(cfg: TrainConfig,
                    vcfg: VAEConfig | None = None,
                    tcfg: TeacherConfig | None = None,
                    *, attn_impl: str = "auto", remat: bool = True,
                    cp_mesh=None, cp_axis=None, cp_batch_axis=None):
    """Returns train_step(state, images[A, mb, H, W, C]) -> (state, metrics).

    cp_mesh/cp_axis/cp_batch_axis (attn_impl='ring'/'allgather' only):
    the mesh and axis names for context parallelism — the teacher's
    attention token axis shards over cp_axis and the batch stays sharded
    over cp_batch_axis (the DP axis), see parallel/ring_attention.py."""
    vcfg = vcfg or cfg.vae_config()
    tcfg = tcfg or cfg.teacher_config()
    cp = dict(cp_mesh=cp_mesh, cp_axis=cp_axis, cp_batch_axis=cp_batch_axis)

    # Ring CP: pin the batch layout of every tensor at the fork between the
    # VAE branch and the teacher (ring) branch. Without this, the ring's
    # shard_map in_specs propagate a model-axis sharding backwards through
    # the teacher stem onto the SHARED inputs (x, recon), and the GSPMD
    # partitioner's "involuntary full rematerialization" resharding fallback
    # MISCOMPILES the gradients of the *other* branch: with the constraint
    # absent, d(kl)/d(vae_params) came back 24% wrong on an 8-device mesh
    # while the primal and the teacher grads stayed exact (repro pinned in
    # tests/test_sharding.py::test_ring_attention_train_step; jax 0.9.0,
    # Shardy on or off). The constraint costs nothing — batch-sharded,
    # model-replicated is exactly the layout both branches want — and
    # restores grad parity to ~1e-6.
    if cp_mesh is not None and cp_batch_axis is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        _img_sh = NamedSharding(
            cp_mesh, PartitionSpec(cp_batch_axis, None, None, None))

        def _pin_batch(t):
            return jax.lax.with_sharding_constraint(t, _img_sh)
    else:
        def _pin_batch(t):
            return t
    vae_tx, teacher_tx = make_optimizers(cfg)
    w = LossWeights(cfg.recon_weight, cfg.kl_weight, cfg.quality_weight,
                    cfg.reward_scale, cfg.semantic_weight,
                    cfg.baseline_momentum)
    compute_dtype = jnp.bfloat16 if cfg.mixed_precision else jnp.float32

    # Fallback False matches the TrainConfig default: an ad-hoc config object
    # without the field must NOT silently take the measured-slower fused path.
    fuse = getattr(cfg, "fuse_teacher", False)
    cached = getattr(cfg, "cached_prompt_embeddings", False)

    def micro_step(params, carry, batch, pe_cached=None):
        vae_params, teacher_params = params
        baseline, binit, stats, rng = carry
        rng, r_vae, r_t1, r_t2 = jax.random.split(rng, 4)
        x = _pin_batch(normalize_images(batch, compute_dtype))

        if cached:
            # Dataset-side prompt embeddings (the reference's INTENDED
            # design, train_hybrid.py:157-171, which its trainer never
            # enables): the Trainer refreshes a per-sample embedding table
            # periodically and the per-batch teacher call on the inputs is
            # skipped entirely. Deviations (opt-in, docs/parity.md):
            # embeddings lag the teacher by <= the refresh interval, and BN
            # stats advance once (recon call) per micro-batch.
            prompt_emb = jax.lax.stop_gradient(
                pe_cached.astype(jnp.float32))
            stats1 = stats
        elif not fuse:
            # (3) teacher on inputs — outside grad (torch.no_grad parity).
            t1_out, stats1 = teacher_mod.apply(
                teacher_params, stats, x, cfg=tcfg, train=True, rng=r_t1,
                attn_impl=attn_impl, remat=remat, **cp)
            prompt_emb = jax.lax.stop_gradient(t1_out["prompt_embedding"])

        def loss_fn(diff_params):
            vp, tp = diff_params
            recon, mu, logvar = vae_mod.apply(vp, x, rng=r_vae, cfg=vcfg)
            recon = _pin_batch(recon)  # same fork: recon_loss vs teacher
            recon_loss, kl_loss = losses_mod.recon_kl(recon, x, mu, logvar)
            if fuse and not cached:
                # Both teacher calls as ONE 2B forward (module docstring).
                both = jnp.concatenate(
                    [x, jax.lax.stop_gradient(recon)], axis=0)
                t_out, stats2 = teacher_mod.apply(
                    tp, stats, both, cfg=tcfg, train=True, rng=r_t2,
                    attn_impl=attn_impl, remat=remat, **cp)
                b = x.shape[0]
                own_emb = t_out["prompt_embedding"]
                # x half's embedding conditions the recon half's semantic
                # score — the same cosine the teacher applies internally
                # when given prompt_embedding (models/teacher.py).
                a = own_emb[b:].astype(jnp.float32)
                pe = jax.lax.stop_gradient(own_emb[:b].astype(jnp.float32))
                cos = jnp.sum(a * pe, -1) / jnp.maximum(
                    jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(pe, axis=-1),
                    1e-8)
                quality_scores = t_out["quality_scores"][b:]
                semantic_score = t_out["semantic_score"][b:] * cos[:, None]
            else:
                t2_out, stats2 = teacher_mod.apply(
                    tp, stats1, jax.lax.stop_gradient(recon), cfg=tcfg,
                    prompt_embedding=prompt_emb, train=True, rng=r_t2,
                    attn_impl=attn_impl, remat=remat, **cp)
                quality_scores = t2_out["quality_scores"]
                semantic_score = t2_out["semantic_score"]
            vae_loss, teacher_loss, nb, nbi, metrics = losses_mod.hybrid_losses(
                recon_loss=recon_loss, kl_loss=kl_loss,
                quality_scores=quality_scores,
                semantic_score=semantic_score,
                baseline=baseline, baseline_initialized=binit, w=w)
            return vae_loss + teacher_loss, (nb, nbi, stats2, metrics)

        grads, (nb, nbi, stats2, metrics) = jax.grad(
            loss_fn, has_aux=True)((vae_params, teacher_params))
        return grads, (nb, nbi, stats2, rng), metrics

    def _run(state: TrainState, images: jax.Array,
             prompt_embs) -> Tuple[TrainState, Metrics]:
        params = (state.vae_params, state.teacher_params)
        accum = images.shape[0]

        def scan_body(carry, xs):
            grads_acc, inner = carry
            batch, pe = xs
            grads, inner, metrics = micro_step(params, inner, batch, pe)
            grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
            return (grads_acc, inner), metrics

        zero_grads = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, jnp.float32), params)
        inner0 = (state.baseline, state.baseline_initialized,
                  state.teacher_stats, state.rng)
        xs = (images, prompt_embs if cached
              else jnp.zeros((accum, 1), jnp.float32))  # unused placeholder
        (grads_sum, inner), metrics_stack = jax.lax.scan(
            scan_body, (zero_grads, inner0), xs)
        baseline, binit, stats, rng = inner

        inv = 1.0 / accum
        vae_grads, teacher_grads = jax.tree_util.tree_map(
            lambda g: g * inv, grads_sum)

        vae_updates, vae_opt = vae_tx.update(
            vae_grads, state.vae_opt, state.vae_params)
        vae_params = jax.tree_util.tree_map(
            lambda p, u: p + u.astype(p.dtype),
            state.vae_params, vae_updates)
        teacher_updates, teacher_opt = teacher_tx.update(
            teacher_grads, state.teacher_opt, state.teacher_params)
        teacher_params = jax.tree_util.tree_map(
            lambda p, u: p + u.astype(p.dtype),
            state.teacher_params, teacher_updates)

        metrics = jax.tree_util.tree_map(
            lambda m: jnp.mean(m.astype(jnp.float32)), metrics_stack)
        metrics["baseline"] = baseline  # current EMA, not window mean

        new_state = state.replace(
            step=state.step + 1,
            vae_params=vae_params,
            teacher_params=teacher_params,
            teacher_stats=stats,
            vae_opt=vae_opt,
            teacher_opt=teacher_opt,
            baseline=baseline,
            baseline_initialized=binit,
            rng=rng,
        )
        return new_state, metrics

    if cached:
        def train_step(state: TrainState, images: jax.Array,
                       prompt_embs: jax.Array) -> Tuple[TrainState, Metrics]:
            return _run(state, images, prompt_embs)
    else:
        def train_step(state: TrainState, images: jax.Array
                       ) -> Tuple[TrainState, Metrics]:
            return _run(state, images, None)

    return train_step


def make_embed_step(cfg: TrainConfig, tcfg: TeacherConfig | None = None,
                    *, attn_impl: str = "auto",
                    cp_mesh=None, cp_axis=None, cp_batch_axis=None):
    """Deterministic (eval-mode) per-image prompt embeddings for the cached
    table: images [B, H, W, C] uint8 -> [B, embedding_dim] f32."""
    tcfg = tcfg or cfg.teacher_config()
    compute_dtype = jnp.bfloat16 if cfg.mixed_precision else jnp.float32

    def embed_step(state: TrainState, images: jax.Array) -> jax.Array:
        x = normalize_images(images, compute_dtype)
        out, _ = teacher_mod.apply(
            state.teacher_params, state.teacher_stats, x, cfg=tcfg,
            train=False, attn_impl=attn_impl, cp_mesh=cp_mesh,
            cp_axis=cp_axis, cp_batch_axis=cp_batch_axis)
        return out["prompt_embedding"].astype(jnp.float32)

    return embed_step


def make_eval_step(cfg: TrainConfig,
                   vcfg: VAEConfig | None = None,
                   tcfg: TeacherConfig | None = None,
                   *, attn_impl: str = "auto",
                   cp_mesh=None, cp_axis=None, cp_batch_axis=None):
    """Deterministic validation: recon from the mean latent + KL + teacher
    quality in eval mode. (The reference builds a val loader but never runs
    validation — its early stopping reads an empty list, SURVEY.md §2.2 #19.
    This is the repaired behavior.)"""
    vcfg = vcfg or cfg.vae_config()
    tcfg = tcfg or cfg.teacher_config()
    compute_dtype = jnp.bfloat16 if cfg.mixed_precision else jnp.float32

    def eval_step(state: TrainState, images: jax.Array) -> Metrics:
        x = normalize_images(images, compute_dtype)
        recon, mu, logvar = vae_mod.apply(
            state.vae_params, x, rng=None, cfg=vcfg, sample_posterior=False)
        recon_loss, kl_loss = losses_mod.recon_kl(recon, x, mu, logvar)
        t_out, _ = teacher_mod.apply(
            state.teacher_params, state.teacher_stats, recon, cfg=tcfg,
            train=False, attn_impl=attn_impl, cp_mesh=cp_mesh,
            cp_axis=cp_axis, cp_batch_axis=cp_batch_axis)
        val_loss = cfg.recon_weight * recon_loss + cfg.kl_weight * kl_loss
        return {
            "val_recon_loss": recon_loss,
            "val_kl_loss": kl_loss,
            "val_loss": val_loss,
            "val_quality": jnp.mean(t_out["quality_scores"].astype(jnp.float32)),
        }

    return eval_step
