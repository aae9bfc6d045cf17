"""Sharding rules: map every TrainState leaf to a PartitionSpec by path.

Rules are applied with `tree_map_with_path` over the *abstract* state from
`jax.eval_shape`, so they cover optimizer-state clones (adam mu/nu mirror the
param subtree paths) for free.

Placement plan (SURVEY.md §2.6 table):
  * DP: batch dim of images over 'data'; grads all-reduce over ICI
    (inserted by the SPMD partitioner from these annotations).
  * TP: the two bottleneck FCs — fc_mu / fc_logvar [32768, latent] column-
    sharded, decoder fc [latent, 32768] row-sharded over 'model', so z stays
    'model'-sharded between them and only the small latent activations move.
  * EP: stacked teacher expert leaves [E, ...] sharded on the expert axis
    over 'model' when divisible.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lunaris_orion_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "name"):
            parts.append(str(k.name))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def param_spec(path_str: str, leaf, *, model_size: int,
               num_experts: int, latent_dim: int,
               shard_experts: bool = True) -> P:
    """PartitionSpec for one leaf given its tree path.

    `shard_experts=False` keeps the stacked expert leaves replicated —
    required when the model axis carries the token dim instead (ring
    context parallelism, --attn_impl ring): one mesh axis cannot shard
    both the expert and the sequence dimension."""
    shape = getattr(leaf, "shape", ())
    if model_size <= 1 or not shape:
        return P()

    # Teacher experts / quality heads: stacked [E, ...] leaves -> EP.
    if (shard_experts
            and ("experts/" in path_str or "quality_heads" in path_str)
            and len(shape) >= 1 and shape[0] == num_experts
            and num_experts % model_size == 0):
        return P(MODEL_AXIS, *([None] * (len(shape) - 1)))

    # VAE bottleneck FC pair -> TP over the latent dim.
    if latent_dim % model_size == 0:
        if ("fc_mu/w" in path_str or "fc_logvar/w" in path_str) \
                and len(shape) == 2 and shape[1] == latent_dim:
            return P(None, MODEL_AXIS)
        if ("fc_mu/b" in path_str or "fc_logvar/b" in path_str) \
                and len(shape) == 1 and shape[0] == latent_dim:
            return P(MODEL_AXIS)
        if "decoder/fc/w" in path_str and len(shape) == 2 \
                and shape[0] == latent_dim:
            return P(MODEL_AXIS, None)
    return P()


def state_shardings(abstract_state: Any, mesh: Mesh, *, num_experts: int,
                    latent_dim: int, shard_experts: bool = True) -> Any:
    """Tree of NamedShardings matching `abstract_state` (from eval_shape)."""
    model_size = mesh.shape[MODEL_AXIS]

    def rule(path, leaf):
        spec = param_spec(_path_str(path), leaf, model_size=model_size,
                          num_experts=num_experts, latent_dim=latent_dim,
                          shard_experts=shard_experts)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(rule, abstract_state)


def batch_sharding(mesh: Mesh, *, leading_accum: bool = True) -> NamedSharding:
    """Images [accum, micro_b, H, W, C] (or [B, H, W, C]) sharded on batch."""
    if leading_accum:
        return NamedSharding(mesh, P(None, DATA_AXIS))
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
