"""Op-level dispatch: Pallas TPU kernel vs XLA composition, per op.

The native tier (ops/pallas) ships three kernels with XLA-composed
equivalents; this module is the single place that decides which
implementation runs. Defaults encode *in-graph* measurements from
``tools/bench_dispatch.py`` on a v5e (numbers recorded in BASELINE.md):

  * ``attention`` (K2): Pallas wins decisively at the teacher's N=16384
    (the XLA composition cannot even run the backward at that size without
    remat) — dispatched from ops/attention.py's ``auto`` path.
  * ``gn_mish`` (K1) and ``mse_kl`` (K3): XLA fuses these epilogues into the
    surrounding convs inside the jitted step; the Pallas kernels are at
    parity or behind there, so the XLA composition ships by default and the
    kernels stay selectable for re-measurement on new hardware.

Override per op with the env var ``LUNARIS_DISPATCH``
(e.g. ``LUNARIS_DISPATCH=gn_mish=pallas,mse_kl=pallas``) or
programmatically via :func:`set_override` (tests, benchmarks).

Pallas kernels are forward-only Mosaic programs; :func:`pallas_fwd_xla_bwd`
wraps one in a ``jax.custom_vjp`` whose backward recomputes through the XLA
composition, so dispatched ops stay differentiable in the train step.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional

import jax

# op -> implementation on TPU backends. Non-TPU backends always take "xla"
# (the Pallas interpreter is for tests, not production dispatch).
_TPU_DEFAULTS: Dict[str, str] = {
    "attention": "pallas",
    "gn_mish": "xla",
    "mse_kl": "xla",
}

_overrides: Dict[str, str] = {}


def _env_overrides() -> Dict[str, str]:
    out: Dict[str, str] = {}
    for part in os.environ.get("LUNARIS_DISPATCH", "").split(","):
        if "=" in part:
            k, v = part.split("=", 1)
            out[k.strip()] = v.strip()
    return out


def set_override(op: str, impl: Optional[str]) -> None:
    """Force `op` to 'pallas'/'xla' (None clears). For tests/benchmarks."""
    if impl is None:
        _overrides.pop(op, None)
    else:
        assert impl in ("pallas", "xla"), impl
        _overrides[op] = impl


def clear_overrides() -> None:
    _overrides.clear()


def choose(op: str) -> str:
    """Returns 'pallas' or 'xla' for `op` on the current backend."""
    ov = _overrides.get(op) or _env_overrides().get(op)
    if ov:
        return ov
    if jax.default_backend() != "tpu":
        return "xla"
    return _TPU_DEFAULTS.get(op, "xla")


def pallas_fwd_xla_bwd(pallas_fn: Callable, xla_fn: Callable) -> Callable:
    """Differentiable wrapper for a forward-only Pallas kernel.

    Forward runs `pallas_fn`; backward recomputes through `xla_fn` (the
    numerically equivalent XLA composition) with `jax.vjp`. Both must take
    the same positional array arguments (close over statics beforehand).
    """

    @jax.custom_vjp
    def f(*args):
        return pallas_fn(*args)

    def fwd(*args):
        return pallas_fn(*args), args

    def bwd(args, g):
        _, vjp = jax.vjp(xla_fn, *args)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f
