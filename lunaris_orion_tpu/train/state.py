"""TrainState: the complete training-run pytree carried through the jitted step.

Logical contents match the reference checkpoint dict
(train_hybrid.py:594-615): step, both models' params, both optimizer states,
best_loss — plus what torch keeps implicitly: teacher BatchNorm running
stats, the RL baseline EMA (train_hybrid.py:283-286, kept host-side there;
device-side here so the step never syncs), and the PRNG key.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from lunaris_orion_tpu.config import TrainConfig, VAEConfig, TeacherConfig
from lunaris_orion_tpu.models import vae as vae_mod
from lunaris_orion_tpu.models import teacher as teacher_mod
from lunaris_orion_tpu.train.schedule import cosine_warm_restarts


@struct.dataclass
class TrainState:
    step: jax.Array
    vae_params: Any
    teacher_params: Any
    teacher_stats: Any
    vae_opt: Any
    teacher_opt: Any
    baseline: jax.Array
    baseline_initialized: jax.Array
    best_loss: jax.Array
    rng: jax.Array


def make_optimizers(cfg: TrainConfig) -> Tuple[optax.GradientTransformation,
                                               optax.GradientTransformation]:
    """2x (clip_by_global_norm -> AdamW with cosine-warm-restart LR),
    matching train_hybrid.py:504-527 + the per-step clip at :913-914."""

    # bf16 first moments (optax mu_dtype) halve Adam's m-state HBM traffic
    # — a standard production knob; v (second moments) stay f32 for
    # stability. Off by default = reference-faithful f32 state.
    mu_dtype = (jnp.bfloat16 if getattr(cfg, "bf16_momentum", False)
                else None)

    def tx(base_lr: float) -> optax.GradientTransformation:
        sched = cosine_warm_restarts(base_lr, cfg.scheduler_t0, cfg.min_lr)
        return optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.adamw(sched, b1=0.9, b2=0.999, eps=1e-8,
                        weight_decay=cfg.weight_decay, mu_dtype=mu_dtype),
        )

    return tx(cfg.vae_lr), tx(cfg.teacher_lr)


def create_state(key: jax.Array, cfg: TrainConfig,
                 vcfg: VAEConfig | None = None,
                 tcfg: TeacherConfig | None = None) -> TrainState:
    vcfg = vcfg or cfg.vae_config()
    tcfg = tcfg or cfg.teacher_config()
    kv, kt, krun = jax.random.split(key, 3)
    vae_params = vae_mod.init(kv, vcfg)
    teacher_params, teacher_stats = teacher_mod.init(kt, tcfg)
    vae_tx, teacher_tx = make_optimizers(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        vae_params=vae_params,
        teacher_params=teacher_params,
        teacher_stats=teacher_stats,
        vae_opt=vae_tx.init(vae_params),
        teacher_opt=teacher_tx.init(teacher_params),
        baseline=jnp.zeros((), jnp.float32),
        baseline_initialized=jnp.zeros((), jnp.bool_),
        best_loss=jnp.asarray(jnp.inf, jnp.float32),
        rng=krun,
    )
