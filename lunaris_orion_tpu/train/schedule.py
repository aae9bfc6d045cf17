"""LR schedules.

The reference uses torch CosineAnnealingWarmRestarts(T_0, T_mult=2,
eta_min=min_lr) stepped once per *optimizer step* (train_hybrid.py:516-527,
924-926), so the restart period is measured in optimizer steps. This is the
closed-form optax-compatible equivalent.
"""

from __future__ import annotations

import jax.numpy as jnp


def cosine_warm_restarts(base_lr: float, t0: int, eta_min: float = 0.0,
                         t_mult: int = 2):
    """Closed-form CosineAnnealingWarmRestarts schedule.

    For t_mult=2 the cycle containing step t starts at t0*(2^n - 1) with
    length t0*2^n where n = floor(log2(t/t0 + 1)).
    """
    assert t_mult in (1, 2), "closed form implemented for t_mult in {1,2}"

    def schedule(step):
        t = jnp.asarray(step, jnp.float32)
        if t_mult == 1:
            t_cur = jnp.mod(t, t0)
            cycle_len = jnp.asarray(t0, jnp.float32)
        else:
            n = jnp.floor(jnp.log2(t / t0 + 1.0))
            cycle_start = t0 * (jnp.exp2(n) - 1.0)
            cycle_len = t0 * jnp.exp2(n)
            t_cur = t - cycle_start
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * t_cur / cycle_len))
        return eta_min + (base_lr - eta_min) * cos

    return schedule
