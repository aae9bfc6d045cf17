"""Hybrid VAE + teacher losses with the policy-gradient reward term.

Formula-exact to the live loss path of the reference
(`_process_batch`, train_hybrid.py:838-896):

    recon_loss  = mean((recon - images)^2)                      (:859)
    kl_loss     = -0.5 * mean(1 + logvar - mu^2 - exp(logvar))  (:862)
    reward      = mean_q(quality) + semantic_weight * semantic  (:869-872)
    baseline    <- EMA(momentum) of mean reward                 (:874-879)
    advantage   = (reward - baseline).detach() * reward_scale   (:881-883)
    pg_loss     = -(advantage * recon_loss).mean()              (:886)
    vae_loss    = recon_w*recon + kl_w*kl + pg_loss             (:887-889)
    teacher_loss= quality_w * (-mean(quality_scores))           (:891-892)

All reductions in f32. The losses are written so that one jax.grad over
(vae_params, teacher_params) of vae_loss + teacher_loss yields exactly the
reference's two separate backward passes: the advantage is stop_gradient'd,
the teacher sees stop_gradient(recon), and the prompt embeddings from the
first (no-grad) teacher call are stop_gradient'd.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class LossWeights(NamedTuple):
    recon_weight: float = 1.0
    kl_weight: float = 0.1
    quality_weight: float = 0.5
    reward_scale: float = 0.1
    semantic_weight: float = 0.5
    baseline_momentum: float = 0.9


def _recon_kl_xla(recon: jax.Array, images: jax.Array, mu: jax.Array,
                  logvar: jax.Array) -> Tuple[jax.Array, jax.Array]:
    recon32 = recon.astype(jnp.float32)
    img32 = images.astype(jnp.float32)
    mu32 = mu.astype(jnp.float32)
    lv32 = logvar.astype(jnp.float32)
    recon_loss = jnp.mean(jnp.square(recon32 - img32))
    kl_loss = -0.5 * jnp.mean(1.0 + lv32 - jnp.square(mu32) - jnp.exp(lv32))
    return recon_loss, kl_loss


def recon_kl(recon: jax.Array, images: jax.Array, mu: jax.Array,
             logvar: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """MSE + KL (train_hybrid.py:858-862). Dispatches between the K3 fused
    Pallas epilogue and the XLA composition per ops.dispatch (the Pallas
    path stays differentiable via an XLA-recompute backward)."""
    from lunaris_orion_tpu.ops import dispatch

    if dispatch.choose("mse_kl") == "pallas" and recon.ndim == 4:
        from lunaris_orion_tpu.ops.pallas.loss_epilogue import mse_kl_pallas
        f = dispatch.pallas_fwd_xla_bwd(mse_kl_pallas, _recon_kl_xla)
        return f(recon, images, mu, logvar)
    return _recon_kl_xla(recon, images, mu, logvar)


def hybrid_losses(
    *,
    recon_loss: jax.Array,
    kl_loss: jax.Array,
    quality_scores: jax.Array,          # [B, 4]
    semantic_score: Optional[jax.Array],  # [B, 1] or None
    baseline: jax.Array,                 # f32 scalar (EMA carry)
    baseline_initialized: jax.Array,     # bool scalar
    w: LossWeights,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, Dict[str, jax.Array]]:
    """Returns (vae_loss, teacher_loss, new_baseline, new_initialized, metrics)."""
    q32 = quality_scores.astype(jnp.float32)
    quality_reward = jnp.mean(q32, axis=1, keepdims=True)  # [B,1]
    if semantic_score is None:
        semantic_reward = jnp.zeros_like(quality_reward)
    else:
        semantic_reward = semantic_score.astype(jnp.float32)
    total_reward = quality_reward + w.semantic_weight * semantic_reward

    mean_reward = jax.lax.stop_gradient(jnp.mean(total_reward))
    new_baseline = jnp.where(
        baseline_initialized,
        w.baseline_momentum * baseline + (1.0 - w.baseline_momentum) * mean_reward,
        mean_reward)
    new_initialized = jnp.ones_like(baseline_initialized)

    advantage = jax.lax.stop_gradient(total_reward - new_baseline) * w.reward_scale
    pg_loss = -jnp.mean(advantage * recon_loss)

    vae_loss = w.recon_weight * recon_loss + w.kl_weight * kl_loss + pg_loss
    quality_loss = -jnp.mean(q32)
    teacher_loss = w.quality_weight * quality_loss

    metrics = {
        "recon_loss": recon_loss,
        "kl_loss": kl_loss,
        "quality_loss": quality_loss,
        "pg_loss": pg_loss,
        "semantic_reward": jnp.mean(semantic_reward),
        "quality_reward": jnp.mean(quality_reward),
        "baseline": new_baseline,
        "advantage": jnp.mean(advantage),
        "vae_loss": vae_loss,
        "teacher_loss": teacher_loss,
        "total_loss": vae_loss + teacher_loss,
        "quality_scores": jnp.mean(q32),
    }
    return vae_loss, teacher_loss, new_baseline, new_initialized, metrics
