"""LunarMoETeacher — Mixture-of-Experts pixel-art quality critic.

TPU-native re-design of the reference model (lunar_evaluator.py:278-462):

  * Experts are *stacked* along a leading axis and executed with `jax.vmap`
    — one traced program instead of a Python loop over nn.ModuleList
    (lunar_evaluator.py:422-428). The expert axis is shardable over the
    'model' mesh axis (expert parallelism); gating stays a dense weighted
    sum over expert outputs, exactly like the reference (dense MoE — every
    expert sees every input, gate weights outputs only,
    lunar_evaluator.py:420-432).
  * BatchNorm is functional: `apply` threads a running-stats pytree and
    returns the updated one. Under a sharded batch inside jit the batch
    statistics are global (sync-BN), see ops.layers.batch_norm.
  * Attention is the corrected blockwise kernel (see ops/attention.py for
    the two documented defect fixes vs lunar_evaluator.py:119-227).
  * Semantic conditioning fix (SURVEY.md §2.1 #10): the reference shadows
    its `prompt_embedding` argument with the locally computed embedding
    (lunar_evaluator.py:438) making cosine_similarity(e, e.detach()) == 1.
    Here the provided external embedding *is* compared against the image's
    own prompt embedding, which is the evident intent — so the hybrid
    trainer's semantic reward actually measures recon-vs-original
    correspondence.

Gradient checkpointing (lunar_evaluator.py:195,271,411-412) maps to
`jax.checkpoint` around the expert-block body and the feature extractor.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from lunaris_orion_tpu.config import TeacherConfig
from lunaris_orion_tpu.ops import layers
from lunaris_orion_tpu.ops.activations import leaky_relu
from lunaris_orion_tpu.ops import attention as attn_mod

Params = Dict[str, Any]


class _Rng:
    """Deterministic rng splitter: fold_in with a trace-time counter."""

    def __init__(self, key: Optional[jax.Array]):
        self._key = key
        self._n = 0

    def __call__(self) -> Optional[jax.Array]:
        if self._key is None:
            return None
        self._n += 1
        return jax.random.fold_in(self._key, self._n)


# ---------------------------------------------------------------------------
# conv -> LeakyReLU(0.2) -> BatchNorm building unit (the reference's ordering)
# ---------------------------------------------------------------------------

def _cbn_init(key, in_ch, out_ch, kernel, groups=1):
    params = {"conv": layers.conv2d_init(key, in_ch, out_ch, kernel,
                                         groups=groups, scheme="kaiming_out")}
    bn_p, bn_s = layers.batch_norm_init(out_ch)
    params["bn"] = bn_p
    return params, {"bn": bn_s}


def _cbn(p, s, x, *, train, groups=1):
    x = layers.conv2d(p["conv"], x, groups=groups)
    x = leaky_relu(x, 0.2)
    x, bn_s = layers.batch_norm(p["bn"], s["bn"], x, train=train)
    return x, {"bn": bn_s}


def _conv_bn(p, s, x, *, train):
    """Conv -> BatchNorm with NO activation — the reference's ExpertBlock
    shortcut path (lunar_evaluator.py:254-257) is nn.Conv2d -> BatchNorm2d
    only, unlike its main-path conv stacks."""
    x = layers.conv2d(p["conv"], x)
    x, bn_s = layers.batch_norm(p["bn"], s["bn"], x, train=train)
    return x, {"bn": bn_s}


# ---------------------------------------------------------------------------
# PixelArtFeatureExtractor (lunar_evaluator.py:57-112)
# ---------------------------------------------------------------------------

def extractor_init(key, cfg: TeacherConfig):
    ks = jax.random.split(key, 8)
    stem, branch = cfg.extractor_stem, cfg.branch_dim
    p: Params = {}
    s: Params = {}
    p["conv1"], s["conv1"] = _cbn_init(ks[0], 3, stem, 3)
    for i, (name, k) in enumerate((("edge", 3), ("color", 5), ("detail", 3))):
        kdw, kpw = jax.random.split(ks[1 + i])
        dw = layers.conv2d_init(kdw, stem, stem, k, groups=stem, scheme="kaiming_out")
        pw, pw_s = _cbn_init(kpw, stem, branch, 1)
        p[name] = {"dw": dw, **pw}
        s[name] = pw_s
    p["fusion"], s["fusion"] = _cbn_init(ks[4], branch * 3, cfg.extractor_dim, 1)
    return p, s


def extractor_apply(p, s, x, *, cfg: TeacherConfig, train: bool, rng: _Rng):
    ns: Params = {}
    x, ns["conv1"] = _cbn(p["conv1"], s["conv1"], x, train=train)
    branches = []
    for name in ("edge", "color", "detail"):
        bp = p[name]
        y = layers.conv2d(bp["dw"], x, groups=cfg.extractor_stem)
        y, ns[name] = _cbn({"conv": bp["conv"], "bn": bp["bn"]},
                           s[name], y, train=train)
        branches.append(y)
    combined = jnp.concatenate(branches, axis=-1)
    combined = layers.dropout(combined, cfg.dropout_rate, rng=rng(), train=train)
    out, ns["fusion"] = _cbn(p["fusion"], s["fusion"], combined, train=train)
    return out, ns


# ---------------------------------------------------------------------------
# ExpertBlock (lunar_evaluator.py:234-275)
# ---------------------------------------------------------------------------

def expert_block_init(key, in_ch, out_ch, cfg: TeacherConfig):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p: Params = {}
    s: Params = {}
    p["conv1"], s["conv1"] = _cbn_init(k1, in_ch, out_ch, 3)
    p["attn"] = attn_mod.attention_init(k2, out_ch, num_heads=cfg.num_heads,
                                        rel_pos_size=cfg.rel_pos_size)
    p["conv2"], s["conv2"] = _cbn_init(k3, out_ch, out_ch, 3)
    if in_ch != out_ch:
        p["shortcut"], s["shortcut"] = _cbn_init(k4, in_ch, out_ch, 1)
    p["layer_scale"] = jnp.full((out_ch,), cfg.layer_scale_init, jnp.float32)
    return p, s


def expert_block_apply(p, s, x, *, cfg: TeacherConfig, train: bool, rng: _Rng,
                       attn_impl: str = "auto", remat: bool = True,
                       cp_mesh=None, cp_axis=None, cp_batch_axis=None):
    """conv1 -> attention -> conv2, *layer_scale, + shortcut, leaky(0.2).

    The reference drops whole channels (Dropout2d) after each conv stack and
    gradient-checkpoints the main path during training
    (lunar_evaluator.py:241-275); we remat the same region.

    cp_mesh/cp_axis/cp_batch_axis: ring context parallelism
    (attn_impl='ring') — the attention token axis shards over cp_axis and
    k/v rotate cross-chip (parallel/ring_attention.py); forwarded verbatim
    to spatial_attention_reference.
    """
    if "shortcut" in p:
        identity, sc_s = _conv_bn(p["shortcut"], s["shortcut"], x, train=train)
    else:
        identity, sc_s = x, None

    drop1_rng, drop2_rng, attn_rng = rng(), rng(), rng()

    def path(px, c1s, c2s):
        out, c1s = _cbn(p["conv1"], c1s, px, train=train)
        out = layers.dropout2d(out, cfg.dropout_rate, rng=drop1_rng, train=train)
        out = attn_mod.spatial_attention_reference(
            p["attn"], out, num_heads=cfg.num_heads,
            dropout_rate=cfg.dropout_rate, rng=attn_rng, train=train,
            impl=attn_impl, window=cfg.attn_window,
            cp_mesh=cp_mesh, cp_axis=cp_axis, cp_batch_axis=cp_batch_axis)
        out, c2s = _cbn(p["conv2"], c2s, out, train=train)
        out = layers.dropout2d(out, cfg.dropout_rate, rng=drop2_rng, train=train)
        return out * p["layer_scale"].astype(out.dtype), c1s, c2s

    if remat and train:
        path = jax.checkpoint(path)
    out, c1s, c2s = path(x, s["conv1"], s["conv2"])

    ns = {"conv1": c1s, "conv2": c2s}
    if sc_s is not None:
        ns["shortcut"] = sc_s
    return leaky_relu(out + identity, 0.2), ns


# ---------------------------------------------------------------------------
# Heads (lunar_evaluator.py:353-397)
# ---------------------------------------------------------------------------

def _mlp_head_init(key, in_dim, hidden, out_dim, *, with_ln=True):
    k1, k2 = jax.random.split(key)
    p = {"fc1": layers.linear_init(k1, in_dim, hidden, scheme="kaiming_out"),
         "fc2": layers.linear_init(k2, hidden, out_dim, scheme="kaiming_out")}
    if with_ln:
        p["ln"] = layers.layer_norm_init(in_dim)
    return p


def _mlp_head(p, x, *, dropout_rate, rng, train):
    """[B, in] -> [B, out]: (LN) -> fc -> leaky(0.2) -> dropout -> fc."""
    if "ln" in p:
        x = layers.layer_norm(p["ln"], x)
    x = leaky_relu(layers.linear(p["fc1"], x), 0.2)
    x = layers.dropout(x, dropout_rate, rng=rng, train=train)
    return layers.linear(p["fc2"], x)


# ---------------------------------------------------------------------------
# LunarMoETeacher
# ---------------------------------------------------------------------------

def init(key, cfg: TeacherConfig) -> Tuple[Params, Params]:
    """Returns (params, batch_stats). Expert-axis leaves are stacked [E, ...]."""
    kx, kg, kq, ks, kst, kpr, kexp = jax.random.split(key, 7)
    p: Params = {}
    s: Params = {}
    p["extractor"], s["extractor"] = extractor_init(kx, cfg)

    # Experts: per-layer stacked params, vmapped init over expert keys.
    p["experts"], s["experts"] = {}, {}
    layer_keys = jax.random.split(kexp, cfg.expert_layers)
    in_ch = cfg.extractor_dim
    for li in range(cfg.expert_layers):
        ekeys = jax.random.split(layer_keys[li], cfg.num_experts)
        blk_init = functools.partial(expert_block_init, in_ch=in_ch,
                                     out_ch=cfg.feature_dim, cfg=cfg)
        stacked_p, stacked_s = jax.vmap(lambda k: blk_init(k))(ekeys)
        p["experts"][f"layer{li}"] = stacked_p
        s["experts"][f"layer{li}"] = stacked_s
        in_ch = cfg.feature_dim

    p["gate"] = _mlp_head_init(kg, cfg.extractor_dim, cfg.intermediate_dim,
                               cfg.num_experts, with_ln=False)
    qkeys = jax.random.split(kq, cfg.num_experts)
    p["quality_heads"] = jax.vmap(
        lambda k: _mlp_head_init(k, cfg.feature_dim, cfg.intermediate_dim // 4, 4)
    )(qkeys)
    p["semantic_head"] = _mlp_head_init(ks, cfg.feature_dim,
                                        cfg.intermediate_dim // 2, 1)
    p["style_net"] = _mlp_head_init(kst, cfg.feature_dim,
                                    cfg.intermediate_dim // 2, cfg.embedding_dim)
    p["prompt_net"] = _mlp_head_init(kpr, cfg.feature_dim,
                                     cfg.intermediate_dim // 2, cfg.embedding_dim)
    return p, s


def apply(p: Params, stats: Params, x: jax.Array, *,
          cfg: TeacherConfig,
          prompt_embedding: Optional[jax.Array] = None,
          train: bool = False,
          rng: Optional[jax.Array] = None,
          attn_impl: str = "auto",
          remat: bool = True,
          cp_mesh=None, cp_axis=None, cp_batch_axis=None,
          want_feature_maps: bool = False
          ) -> Tuple[Dict[str, jax.Array], Params]:
    """Forward (lunar_evaluator.py:408-462). Returns (outputs, new_stats).

    outputs: quality_scores [B,4] (sigmoid), expert_weights [B,E],
    style_embedding / prompt_embedding [B,emb], semantic_score [B,1],
    feature_maps [E,B,H,W,C] (optional).
    """
    rng_stream = _Rng(rng)
    ns: Params = {}

    feats, ns["extractor"] = extractor_apply(
        p["extractor"], stats["extractor"], x, cfg=cfg, train=train,
        rng=rng_stream)

    # Gate on pooled extractor features -> [B, E] softmax
    pooled = layers.global_avg_pool(feats)
    gate_logits = _mlp_head(p["gate"], pooled, dropout_rate=cfg.dropout_rate,
                            rng=rng_stream(), train=train)
    expert_weights = jax.nn.softmax(gate_logits.astype(jnp.float32), axis=-1)

    # Experts: vmap over the stacked expert axis, layer by layer.
    ns["experts"] = {}
    ex = jnp.broadcast_to(feats, (cfg.num_experts,) + feats.shape)
    expert_rngs = (None if rng is None
                   else jax.random.split(rng_stream(), cfg.num_experts))
    for li in range(cfg.expert_layers):
        lp = p["experts"][f"layer{li}"]
        lst = stats["experts"][f"layer{li}"]

        def blk(bp, bs, bx, brng):
            return expert_block_apply(bp, bs, bx, cfg=cfg, train=train,
                                      rng=_Rng(brng), attn_impl=attn_impl,
                                      remat=remat, cp_mesh=cp_mesh,
                                      cp_axis=cp_axis,
                                      cp_batch_axis=cp_batch_axis)

        if expert_rngs is None:
            ex, lns = jax.vmap(lambda a, b, c: blk(a, b, c, None))(lp, lst, ex)
        else:
            li_rngs = jax.vmap(lambda k: jax.random.fold_in(k, li))(expert_rngs)
            ex, lns = jax.vmap(blk)(lp, lst, ex, li_rngs)
        ns["experts"][f"layer{li}"] = lns

    # Quality heads per expert -> weighted sum -> sigmoid [B, 4]
    q_rngs = (None if rng is None
              else jax.random.split(rng_stream(), cfg.num_experts))
    pooled_ex = jnp.mean(ex, axis=(2, 3))  # [E, B, C]

    def qhead(hp, hx, hrng):
        return _mlp_head(hp, hx, dropout_rate=cfg.dropout_rate, rng=hrng,
                         train=train)

    if q_rngs is None:
        quality = jax.vmap(lambda a, b: qhead(a, b, None))(p["quality_heads"], pooled_ex)
    else:
        quality = jax.vmap(qhead)(p["quality_heads"], pooled_ex, q_rngs)
    # quality: [E, B, 4]; weights: [B, E]
    w = expert_weights.astype(jnp.float32)
    weighted_quality = jnp.einsum("ebq,be->bq", quality.astype(jnp.float32), w)
    quality_scores = jax.nn.sigmoid(weighted_quality)

    # Combined pooled features -> style / prompt embeddings
    combined = jnp.einsum("ebc,be->bc", pooled_ex.astype(jnp.float32), w)
    combined = combined.astype(ex.dtype)
    style_embedding = _mlp_head(p["style_net"], combined,
                                dropout_rate=cfg.dropout_rate,
                                rng=rng_stream(), train=train)
    own_prompt_embedding = _mlp_head(p["prompt_net"], combined,
                                     dropout_rate=cfg.dropout_rate,
                                     rng=rng_stream(), train=train)

    # Semantic score from expert 0 (lunar_evaluator.py:441-449), conditioned
    # on the *provided* prompt embedding (defect #10 fixed, see module doc).
    sem = _mlp_head(p["semantic_head"], jnp.mean(ex[0], axis=(1, 2)),
                    dropout_rate=cfg.dropout_rate, rng=rng_stream(),
                    train=train)
    semantic_score = jax.nn.sigmoid(sem.astype(jnp.float32))
    if prompt_embedding is not None:
        a = own_prompt_embedding.astype(jnp.float32)
        b = jax.lax.stop_gradient(prompt_embedding.astype(jnp.float32))
        cos = jnp.sum(a * b, -1) / jnp.maximum(
            jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1), 1e-8)
        semantic_score = semantic_score * cos[:, None]

    out = {
        "quality_scores": quality_scores,
        "expert_weights": expert_weights,
        "style_embedding": style_embedding,
        "prompt_embedding": own_prompt_embedding,
        "semantic_score": semantic_score,
    }
    if want_feature_maps:
        out["feature_maps"] = ex
    return out, ns


def param_count(p: Params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(p))
