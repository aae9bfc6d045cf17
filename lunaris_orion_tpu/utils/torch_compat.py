"""PyTorch-reference weight interop — both models, both directions.

Converts reference state_dicts (NCHW/OIHW torch tensors) into this package's
NHWC/HWIO param pytrees and back, so checkpoints trained with the reference
can be used here and vice versa — the basis of the per-pixel decode-parity
guarantee (BASELINE.json north star). Covers:

  * LunarisCoreVAE (lunar_generate.py:84-291)            vae_params_from_torch
  * LunarMoETeacher (lunar_evaluator.py:278-462) incl.
    conv/BN running stats/rel-pos/heads              teacher_params_from_torch
  * full training checkpoints (train_hybrid.py:594-615:
    global_step + vae/teacher state_dicts + best_loss)  load_torch_checkpoint
  * the reverse exports (*_state_dict_to_torch) for byte-exact round trips.

Layout mapping:
  torch Conv2d weight  [O, I, kh, kw]  -> HWIO [kh, kw, I, O]
  torch ConvT2d weight [I, O, kh, kw]  -> our dilated-conv HWIO, spatially
                                          flipped: w[h,w,i,o] = t[i,o,kh-1-h,kw-1-w]
  torch Linear weight  [O, I]          -> [I, O]
  GroupNorm/LayerNorm weight/bias      -> scale/bias
  BatchNorm2d weight/bias/running_*    -> scale/bias params + mean/var stats
  rel_pos_h/w [1, heads, S, 1]/[1, heads, 1, S] -> [heads, S]
  layer_scale [1, C, 1, 1]             -> [C]
  per-expert ModuleLists               -> stacked leading expert axis [E, ...]
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np

from lunaris_orion_tpu.config import TeacherConfig, VAEConfig


def _conv(sd: Mapping, prefix: str) -> Dict:
    w = np.asarray(sd[f"{prefix}.weight"], np.float32)
    b = np.asarray(sd[f"{prefix}.bias"], np.float32)
    return {"w": w.transpose(2, 3, 1, 0), "b": b}


def _convT(sd: Mapping, prefix: str) -> Dict:
    w = np.asarray(sd[f"{prefix}.weight"], np.float32)  # [I, O, kh, kw]
    b = np.asarray(sd[f"{prefix}.bias"], np.float32)
    w = w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)  # flip -> [kh, kw, I, O]
    return {"w": np.ascontiguousarray(w), "b": b}


def _linear(sd: Mapping, prefix: str) -> Dict:
    w = np.asarray(sd[f"{prefix}.weight"], np.float32)  # [O, I]
    b = np.asarray(sd[f"{prefix}.bias"], np.float32)
    return {"w": w.T.copy(), "b": b}


def _gn(sd: Mapping, prefix: str) -> Dict:
    return {"scale": np.asarray(sd[f"{prefix}.weight"], np.float32),
            "bias": np.asarray(sd[f"{prefix}.bias"], np.float32)}


def _resblock(sd: Mapping, prefix: str, in_ch: int, out_ch: int) -> Dict:
    p = {
        "conv1": _conv(sd, f"{prefix}.conv1.0"),
        "gn1": _gn(sd, f"{prefix}.conv1.1"),
        "conv2": _conv(sd, f"{prefix}.conv2.0"),
        "gn2": _gn(sd, f"{prefix}.conv2.1"),
    }
    if in_ch != out_ch:
        p["shortcut"] = _conv(sd, f"{prefix}.shortcut")
    return p


def vae_params_from_torch(state_dict: Mapping, cfg: VAEConfig) -> Dict:
    """Reference module names (lunar_generate.py:94-125, 165-192):
    encoder.downN = Sequential(Conv, GN, Mish, ResBlock);
    decoder.upN = Sequential(ConvT, GN, Mish); decoder.final_conv."""
    sd = state_dict
    enc: Dict = {}
    chans = cfg.channels
    for i in range(cfg.num_down):
        t = f"encoder.down{i + 1}"
        enc[f"down{i}"] = {
            "conv": _conv(sd, f"{t}.0"),
            "gn": _gn(sd, f"{t}.1"),
            "res": _resblock(sd, f"{t}.3", chans[i], chans[i]),
        }
    # Bottleneck FCs: torch flattens NCHW (C-major), we flatten NHWC — the
    # 32768-dim axis must be reordered C,H,W -> H,W,C.
    c, hw = chans[-1], cfg.bottleneck_hw

    def _reorder_in(lin):  # [in=C*H*W, out] -> [in=H*W*C, out]
        w = lin["w"].reshape(c, hw, hw, -1).transpose(1, 2, 0, 3)
        return {"w": np.ascontiguousarray(w.reshape(c * hw * hw, -1)),
                "b": lin["b"]}

    enc["fc_mu"] = _reorder_in(_linear(sd, "encoder.fc_mu"))
    enc["fc_logvar"] = _reorder_in(_linear(sd, "encoder.fc_logvar"))

    fc = _linear(sd, "decoder.fc")  # [latent, out=C*H*W] -> out H,W,C order
    wfc = fc["w"].reshape(-1, c, hw, hw).transpose(0, 2, 3, 1)
    bfc = fc["b"].reshape(c, hw, hw).transpose(1, 2, 0)
    dec: Dict = {"fc": {"w": np.ascontiguousarray(wfc.reshape(-1, c * hw * hw)),
                        "b": np.ascontiguousarray(bfc.reshape(-1))}}
    for i in range(cfg.num_down):
        t = f"decoder.up{i + 1}"
        dec[f"up{i}"] = {"conv": _convT(sd, f"{t}.0"), "gn": _gn(sd, f"{t}.1")}
    dec["final"] = _conv(sd, "decoder.final_conv")
    return {"encoder": enc, "decoder": dec}


# ---------------------------------------------------------------------------
# LunarMoETeacher (lunar_evaluator.py:278-462)
# ---------------------------------------------------------------------------

def _bn(sd: Mapping, prefix: str) -> Tuple[Dict, Dict]:
    """BatchNorm2d -> (params{scale,bias}, stats{mean,var})."""
    p = {"scale": np.asarray(sd[f"{prefix}.weight"], np.float32),
         "bias": np.asarray(sd[f"{prefix}.bias"], np.float32)}
    s = {"mean": np.asarray(sd[f"{prefix}.running_mean"], np.float32),
         "var": np.asarray(sd[f"{prefix}.running_var"], np.float32)}
    return p, s


def _ln(sd: Mapping, prefix: str) -> Dict:
    return {"scale": np.asarray(sd[f"{prefix}.weight"], np.float32),
            "bias": np.asarray(sd[f"{prefix}.bias"], np.float32)}


def _cbn_from(sd: Mapping, conv: str, bn: str) -> Tuple[Dict, Dict]:
    """Conv(+LeakyReLU)+BatchNorm unit -> ({conv, bn}, {bn: stats})."""
    p = {"conv": _conv(sd, conv)}
    bn_p, bn_s = _bn(sd, bn)
    p["bn"] = bn_p
    return p, {"bn": bn_s}


def _mlp_from(sd: Mapping, prefix: str, *, ln: bool = True) -> Dict:
    """Pool->Flatten->(LN)->Linear->LeakyReLU->Dropout->Linear Sequential:
    indices 2/3/6 with LN (quality/semantic/style/prompt heads,
    lunar_evaluator.py:364-397), 2/5 without (gate, :353-362)."""
    if ln:
        return {"ln": _ln(sd, f"{prefix}.2"),
                "fc1": _linear(sd, f"{prefix}.3"),
                "fc2": _linear(sd, f"{prefix}.6")}
    return {"fc1": _linear(sd, f"{prefix}.2"),
            "fc2": _linear(sd, f"{prefix}.5")}


def _stack(trees):
    import jax
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *trees)


def _expert_block_from_torch(sd: Mapping, prefix: str, in_ch: int,
                             out_ch: int) -> Tuple[Dict, Dict]:
    """ExpertBlock (lunar_evaluator.py:234-258): conv1/attention/conv2 +
    optional Conv+BN shortcut + layer_scale."""
    p: Dict = {}
    s: Dict = {}
    p["conv1"], s["conv1"] = _cbn_from(sd, f"{prefix}.conv1.0",
                                       f"{prefix}.conv1.2")
    p["conv2"], s["conv2"] = _cbn_from(sd, f"{prefix}.conv2.0",
                                       f"{prefix}.conv2.2")
    p["attn"] = {
        "qkv": _conv(sd, f"{prefix}.attention.qkv"),
        "proj": _conv(sd, f"{prefix}.attention.proj"),
        # [1, heads, S, 1] / [1, heads, 1, S] -> [heads, S]
        "rel_pos_h": np.asarray(sd[f"{prefix}.attention.rel_pos_h"],
                                np.float32)[0, :, :, 0],
        "rel_pos_w": np.asarray(sd[f"{prefix}.attention.rel_pos_w"],
                                np.float32)[0, :, 0, :],
    }
    if in_ch != out_ch:
        p["shortcut"], s["shortcut"] = _cbn_from(sd, f"{prefix}.shortcut.0",
                                                 f"{prefix}.shortcut.1")
    p["layer_scale"] = np.asarray(sd[f"{prefix}.layer_scale"],
                                  np.float32).reshape(-1)
    return p, s


def teacher_params_from_torch(state_dict: Mapping, cfg: TeacherConfig
                              ) -> Tuple[Dict, Dict]:
    """Reference module names (lunar_evaluator.py:291-397). Returns
    (params, batch_stats) matching models.teacher.init's structure: expert
    ModuleLists become stacked [E, ...] leaves (one vmapped program)."""
    sd = state_dict
    p: Dict = {}
    s: Dict = {}

    ext_p: Dict = {}
    ext_s: Dict = {}
    fx = "feature_extractor"
    ext_p["conv1"], ext_s["conv1"] = _cbn_from(sd, f"{fx}.conv1.0",
                                               f"{fx}.conv1.2")
    for name in ("edge", "color", "detail"):
        br = f"{fx}.{name}_branch"
        pw, pw_s = _cbn_from(sd, f"{br}.1", f"{br}.3")
        ext_p[name] = {"dw": _conv(sd, f"{br}.0"), **pw}
        ext_s[name] = pw_s
    ext_p["fusion"], ext_s["fusion"] = _cbn_from(sd, f"{fx}.fusion.0",
                                                 f"{fx}.fusion.2")
    p["extractor"], s["extractor"] = ext_p, ext_s

    p["experts"], s["experts"] = {}, {}
    in_ch = cfg.extractor_dim
    for li in range(cfg.expert_layers):
        blocks = [_expert_block_from_torch(sd, f"experts.{e}.{li}",
                                           in_ch, cfg.feature_dim)
                  for e in range(cfg.num_experts)]
        p["experts"][f"layer{li}"] = _stack([b[0] for b in blocks])
        s["experts"][f"layer{li}"] = _stack([b[1] for b in blocks])
        in_ch = cfg.feature_dim

    p["gate"] = _mlp_from(sd, "gate", ln=False)
    p["quality_heads"] = _stack([_mlp_from(sd, f"quality_heads.{e}")
                                 for e in range(cfg.num_experts)])
    p["semantic_head"] = _mlp_from(sd, "semantic_head")
    p["style_net"] = _mlp_from(sd, "style_net")
    p["prompt_net"] = _mlp_from(sd, "prompt_net")
    return p, s


# ---------------------------------------------------------------------------
# Reverse direction: params -> reference-layout state_dicts (round trip)
# ---------------------------------------------------------------------------

def _np(x):
    return np.asarray(x, np.float32)


def _conv_to(out: Dict, prefix: str, p: Dict) -> None:
    out[f"{prefix}.weight"] = _np(p["w"]).transpose(3, 2, 0, 1)  # HWIO->OIHW
    out[f"{prefix}.bias"] = _np(p["b"])


def _convT_to(out: Dict, prefix: str, p: Dict) -> None:
    w = _np(p["w"])[::-1, ::-1]                   # unflip spatial
    out[f"{prefix}.weight"] = np.ascontiguousarray(
        w.transpose(2, 3, 0, 1))                  # HWIO -> [I, O, kh, kw]
    out[f"{prefix}.bias"] = _np(p["b"])


def _linear_to(out: Dict, prefix: str, p: Dict) -> None:
    out[f"{prefix}.weight"] = np.ascontiguousarray(_np(p["w"]).T)
    out[f"{prefix}.bias"] = _np(p["b"])


def _norm_to(out: Dict, prefix: str, p: Dict) -> None:
    out[f"{prefix}.weight"] = _np(p["scale"])
    out[f"{prefix}.bias"] = _np(p["bias"])


def _bn_to(out: Dict, prefix: str, p: Dict, s: Dict) -> None:
    _norm_to(out, prefix, p)
    out[f"{prefix}.running_mean"] = _np(s["mean"])
    out[f"{prefix}.running_var"] = _np(s["var"])
    out[f"{prefix}.num_batches_tracked"] = np.asarray(0, np.int64)


def vae_state_dict_to_torch(params: Dict, cfg: VAEConfig) -> Dict:
    """Inverse of vae_params_from_torch: reference lunar_generate.py names."""
    out: Dict = {}
    enc, dec = params["encoder"], params["decoder"]
    c, hw = cfg.channels[-1], cfg.bottleneck_hw
    for i in range(cfg.num_down):
        t = f"encoder.down{i + 1}"
        blk = enc[f"down{i}"]
        _conv_to(out, f"{t}.0", blk["conv"])
        _norm_to(out, f"{t}.1", blk["gn"])
        res = blk["res"]
        _conv_to(out, f"{t}.3.conv1.0", res["conv1"])
        _norm_to(out, f"{t}.3.conv1.1", res["gn1"])
        _conv_to(out, f"{t}.3.conv2.0", res["conv2"])
        _norm_to(out, f"{t}.3.conv2.1", res["gn2"])
        if "shortcut" in res:
            _conv_to(out, f"{t}.3.shortcut", res["shortcut"])

    def _reorder_out(lin):  # [in=H*W*C, out] -> torch [in=C*H*W, out]
        w = _np(lin["w"]).reshape(hw, hw, c, -1).transpose(2, 0, 1, 3)
        return {"w": np.ascontiguousarray(w.reshape(c * hw * hw, -1)),
                "b": _np(lin["b"])}

    _linear_to(out, "encoder.fc_mu", _reorder_out(enc["fc_mu"]))
    _linear_to(out, "encoder.fc_logvar", _reorder_out(enc["fc_logvar"]))

    wfc = _np(dec["fc"]["w"]).reshape(-1, hw, hw, c).transpose(0, 3, 1, 2)
    bfc = _np(dec["fc"]["b"]).reshape(hw, hw, c).transpose(2, 0, 1)
    _linear_to(out, "decoder.fc",
               {"w": np.ascontiguousarray(wfc.reshape(-1, c * hw * hw)),
                "b": np.ascontiguousarray(bfc.reshape(-1))})
    for i in range(cfg.num_down):
        t = f"decoder.up{i + 1}"
        _convT_to(out, f"{t}.0", dec[f"up{i}"]["conv"])
        _norm_to(out, f"{t}.1", dec[f"up{i}"]["gn"])
    _conv_to(out, "decoder.final_conv", dec["final"])
    return out


def _unstack(tree, e: int):
    import jax
    return jax.tree_util.tree_map(lambda x: np.asarray(x)[e], tree)


def _cbn_to(out: Dict, conv: str, bn: str, p: Dict, s: Dict) -> None:
    _conv_to(out, conv, p["conv"])
    _bn_to(out, bn, p["bn"], s["bn"])


def _mlp_to(out: Dict, prefix: str, p: Dict) -> None:
    if "ln" in p:
        _norm_to(out, f"{prefix}.2", p["ln"])
        _linear_to(out, f"{prefix}.3", p["fc1"])
        _linear_to(out, f"{prefix}.6", p["fc2"])
    else:
        _linear_to(out, f"{prefix}.2", p["fc1"])
        _linear_to(out, f"{prefix}.5", p["fc2"])


def teacher_state_dict_to_torch(params: Dict, stats: Dict,
                                cfg: TeacherConfig) -> Dict:
    """Inverse of teacher_params_from_torch: lunar_evaluator.py names."""
    out: Dict = {}
    fx = "feature_extractor"
    ep, es = params["extractor"], stats["extractor"]
    _cbn_to(out, f"{fx}.conv1.0", f"{fx}.conv1.2", ep["conv1"], es["conv1"])
    for name in ("edge", "color", "detail"):
        br = f"{fx}.{name}_branch"
        _conv_to(out, f"{br}.0", ep[name]["dw"])
        _cbn_to(out, f"{br}.1", f"{br}.3",
                {"conv": ep[name]["conv"], "bn": ep[name]["bn"]}, es[name])
    _cbn_to(out, f"{fx}.fusion.0", f"{fx}.fusion.2", ep["fusion"],
            es["fusion"])

    # Key insertion ORDER matters beyond cosmetics: the reference's AdamW
    # states are indexed by `model.parameters()` position, and
    # adam_to_torch_opt_sd derives that order from this dict via
    # _param_key_order. Iterate expert-major and mirror the ExpertBlock's
    # exact registration order (layer_scale, conv1, attention[rel_pos_h,
    # rel_pos_w, last_spatial_shapes, qkv, proj], conv2, shortcut) so the
    # exported moments land on the right reference parameters
    # (lunar_evaluator.py ExpertBlock.__init__; verified strict against
    # the real module in tests/test_reference_interop.py).
    for e in range(cfg.num_experts):
        for li in range(cfg.expert_layers):
            lp = params["experts"][f"layer{li}"]
            ls = stats["experts"][f"layer{li}"]
            bp, bs = _unstack(lp, e), _unstack(ls, e)
            t = f"experts.{e}.{li}"
            out[f"{t}.layer_scale"] = \
                _np(bp["layer_scale"]).reshape(1, -1, 1, 1)
            _cbn_to(out, f"{t}.conv1.0", f"{t}.conv1.2", bp["conv1"],
                    bs["conv1"])
            out[f"{t}.attention.rel_pos_h"] = \
                _np(bp["attn"]["rel_pos_h"])[None, :, :, None]
            out[f"{t}.attention.rel_pos_w"] = \
                _np(bp["attn"]["rel_pos_w"])[None, :, None, :]
            # Cache-validity buffer (lunar_evaluator.py:144): zeros = a
            # fresh module's state, forcing rel-pos cache recompute on the
            # first forward after restore. Required for strict=True loads.
            out[f"{t}.attention.last_spatial_shapes"] = \
                np.zeros(2, np.float32)
            _conv_to(out, f"{t}.attention.qkv", bp["attn"]["qkv"])
            _conv_to(out, f"{t}.attention.proj", bp["attn"]["proj"])
            _cbn_to(out, f"{t}.conv2.0", f"{t}.conv2.2", bp["conv2"],
                    bs["conv2"])
            if "shortcut" in bp:
                _cbn_to(out, f"{t}.shortcut.0", f"{t}.shortcut.1",
                        bp["shortcut"], bs["shortcut"])

    _mlp_to(out, "gate", params["gate"])
    for e in range(cfg.num_experts):
        _mlp_to(out, f"quality_heads.{e}", _unstack(params["quality_heads"], e))
    _mlp_to(out, "semantic_head", params["semantic_head"])
    _mlp_to(out, "style_net", params["style_net"])
    _mlp_to(out, "prompt_net", params["prompt_net"])
    return out


# ---------------------------------------------------------------------------
# Checkpoint files (train_hybrid.py:594-615)
# ---------------------------------------------------------------------------

def load_torch_checkpoint(path: str, cfg: VAEConfig, *,
                          key: str = "vae_state_dict") -> Dict:
    """Load a reference training checkpoint (.pt) and convert the VAE weights
    (checkpoint layout: train_hybrid.py:594-615)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    sd = ckpt.get(key, ckpt)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    return vae_params_from_torch(sd, cfg)


def load_full_torch_checkpoint(path: str, vcfg: VAEConfig,
                               tcfg: TeacherConfig, *,
                               ckpt: Mapping | None = None) -> Dict:
    """Load a full reference checkpoint: both models + trainer scalars.

    Returns {vae_params, teacher_params, teacher_stats, global_step,
    best_loss} (reference save dict: train_hybrid.py:594-615). Pass `ckpt`
    (already torch.load()ed) to skip re-reading the file."""
    import torch
    if ckpt is None:
        ckpt = torch.load(path, map_location="cpu", weights_only=True)

    def _numpy(sd):
        return {k: v.numpy() if hasattr(v, "numpy") else v
                for k, v in sd.items()}

    out: Dict = {
        "global_step": int(ckpt.get("global_step", 0)),
        "best_loss": float(ckpt.get("best_loss", float("inf"))),
    }
    if "vae_state_dict" in ckpt:
        out["vae_params"] = vae_params_from_torch(
            _numpy(ckpt["vae_state_dict"]), vcfg)
    if "teacher_state_dict" in ckpt:
        tp, ts = teacher_params_from_torch(
            _numpy(ckpt["teacher_state_dict"]), tcfg)
        out["teacher_params"] = tp
        out["teacher_stats"] = ts
    return out


def load_reference_inference_bundle(path: str, config=None):
    """One-torch.load bootstrap for running inference straight off a
    reference .pt: returns (cfg, bundle) where bundle holds device-ready
    jnp param/stat trees plus global_step/best_loss, and cfg comes from
    the checkpoint's own vars(args) snapshot (train_hybrid.py:605) unless
    overridden. Shared by ImageGenerator / QualityEvaluator."""
    import torch

    import jax
    import jax.numpy as jnp
    from lunaris_orion_tpu.config import TrainConfig

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    cfg = config or (train_config_from_reference_args(ckpt["args"])
                     if "args" in ckpt else TrainConfig())
    out = load_full_torch_checkpoint(path, cfg.vae_config(),
                                     cfg.teacher_config(), ckpt=ckpt)
    for k in ("vae_params", "teacher_params", "teacher_stats"):
        if k in out:
            out[k] = jax.tree_util.tree_map(jnp.asarray, out[k])
    return cfg, out


# ---------------------------------------------------------------------------
# Optimizer-state interop — mid-training migration in both directions
# ---------------------------------------------------------------------------
# The reference checkpoints its two torch.optim.AdamW states and two
# CosineAnnealingWarmRestarts scheduler states (train_hybrid.py:594-615) and
# restores all four on resume (:835-846).  Params-only conversion would
# restart Adam's moments from zero and the LR schedule from step 0 — a
# visible loss bump on migration.  These functions convert the full
# optimizer state: torch exp_avg/exp_avg_sq map onto optax's
# ScaleByAdamState mu/nu (the per-tensor layout transforms are the same
# pure permutations as the weights, so moment tensors convert with the
# weight converters), the shared step count maps onto every optax count
# (Adam bias correction AND the closed-form cosine-warm-restart schedule
# position — both sides step their scheduler once per optimizer step).

# Non-Parameter state_dict entries: BatchNorm stats plus the reference
# attention's rel-pos interpolation cache (registered buffers at
# lunar_evaluator.py:143-144; rel_pos_cache only appears in checkpoints
# saved after a forward has populated it).
_BUFFER_SUFFIXES = ("running_mean", "running_var", "num_batches_tracked",
                    "last_spatial_shapes", "rel_pos_cache")


def _param_key_order(model_sd: Mapping) -> list:
    """state_dict keys that are Parameters, in registration order.

    torch's `model.parameters()` (the order AdamW indexes its state by,
    train_hybrid.py:504-515) enumerates in the same registration order as
    `state_dict()`, minus the BatchNorm buffers."""
    return [k for k in model_sd if not k.endswith(_BUFFER_SUFFIXES)]


def _torch_opt_order(opt_sd: Mapping) -> list:
    """Parameter indices in the optimizer's construction order."""
    return [i for g in opt_sd["param_groups"] for i in g["params"]]


def _overlay_opt_field(model_sd: Mapping, opt_sd: Mapping,
                       field: str) -> Dict:
    """model_sd with each Parameter replaced by its optimizer moment
    (`exp_avg` or `exp_avg_sq`); buffers kept.  Feeding the result through
    the weight converters yields the moment tree in this package's layout.
    Params the optimizer has not touched yet (torch creates state lazily on
    first step) become zeros — exactly torch's effective initial state."""
    keys = _param_key_order(model_sd)
    order = _torch_opt_order(opt_sd)
    if len(order) != len(keys):
        raise ValueError(
            f"optimizer state covers {len(order)} params but the model has "
            f"{len(keys)} — checkpoint/model mismatch")
    state = opt_sd.get("state", {})
    out = dict(model_sd)
    for k, idx in zip(keys, order):
        ent = state.get(idx, state.get(str(idx)))
        if ent is not None and field in ent:
            out[k] = np.asarray(ent[field], np.float32)
        else:
            out[k] = np.zeros_like(np.asarray(model_sd[k], np.float32))
    return out


def torch_adam_step_count(opt_sd: Mapping) -> int:
    """AdamW's per-param 'step' (identical across params under the
    reference's every-param-every-step training)."""
    for ent in opt_sd.get("state", {}).values():
        if "step" in ent:
            return int(ent["step"])
    return 0


def _map_adam_states(opt_state, fn):
    """Rebuild an optax state pytree, transforming the stateful nodes via
    fn(node) (nodes are NamedTuples; containers are tuples/lists)."""
    def rec(s):
        name = type(s).__name__
        if name in ("ScaleByAdamState", "ScaleByScheduleState"):
            return fn(s)
        if isinstance(s, tuple):
            vals = [rec(x) for x in s]
            return type(s)(*vals) if hasattr(s, "_fields") else tuple(vals)
        if isinstance(s, list):
            return [rec(x) for x in s]
        return s
    return rec(opt_state)


def _cast_like(template, tree):
    """tree with every leaf cast to the matching template leaf's dtype."""
    import jax
    import jax.numpy as jnp
    return jax.tree_util.tree_map(
        lambda t, x: jnp.asarray(x, t.dtype), template, tree)


def inject_adam_state(opt_state, mu, nu, count: int):
    """Return opt_state with ScaleByAdamState(mu, nu, count) and every
    schedule count set — dtypes/structure cast to match the template (so
    e.g. bf16_momentum mu dtype is respected)."""
    import jax.numpy as jnp

    def fn(s):
        if type(s).__name__ == "ScaleByAdamState":
            return s._replace(count=jnp.asarray(count, s.count.dtype),
                              mu=_cast_like(s.mu, mu),
                              nu=_cast_like(s.nu, nu))
        return s._replace(count=jnp.asarray(count, s.count.dtype))

    return _map_adam_states(opt_state, fn)


def extract_adam_state(opt_state):
    """(mu, nu, count) out of an optax chain state."""
    found: Dict = {}

    def fn(s):
        if type(s).__name__ == "ScaleByAdamState":
            found["mu"], found["nu"] = s.mu, s.nu
            found["count"] = int(s.count)
        return s

    _map_adam_states(opt_state, fn)
    if "mu" not in found:
        raise ValueError("no ScaleByAdamState in optimizer state")
    return found["mu"], found["nu"], found["count"]


def vae_adam_from_torch(opt_sd: Mapping, model_sd: Mapping, cfg: VAEConfig):
    """torch AdamW state_dict -> (mu, nu, count) in this package's layout."""
    mu = vae_params_from_torch(_overlay_opt_field(model_sd, opt_sd,
                                                  "exp_avg"), cfg)
    nu = vae_params_from_torch(_overlay_opt_field(model_sd, opt_sd,
                                                  "exp_avg_sq"), cfg)
    return mu, nu, torch_adam_step_count(opt_sd)


def teacher_adam_from_torch(opt_sd: Mapping, model_sd: Mapping,
                            cfg: TeacherConfig):
    mu, _ = teacher_params_from_torch(_overlay_opt_field(model_sd, opt_sd,
                                                         "exp_avg"), cfg)
    nu, _ = teacher_params_from_torch(_overlay_opt_field(model_sd, opt_sd,
                                                         "exp_avg_sq"), cfg)
    return mu, nu, torch_adam_step_count(opt_sd)


def _torch_adamw_param_group(n_params: int, *, base_lr: float,
                             current_lr: float,
                             weight_decay: float) -> Dict:
    """A param_group dict carrying the hyperparameters the reference's
    AdamW would save (train_hybrid.py:504-515), defaults taken from a live
    torch.optim.AdamW so the key set tracks the installed torch version.

    `lr` must be the *scheduled* LR at the export step (torch's scheduler
    writes it into param_groups every step, and Optimizer.load_state_dict
    replaces group values wholesale); `initial_lr` is what the scheduler
    records at construction and reads back as base_lrs."""
    import torch
    probe = torch.optim.AdamW([torch.nn.Parameter(torch.zeros(1))],
                              lr=current_lr, betas=(0.9, 0.999), eps=1e-8,
                              weight_decay=weight_decay)
    group = dict(probe.param_groups[0])
    group["params"] = list(range(n_params))
    group["initial_lr"] = base_lr
    return group


def adam_to_torch_opt_sd(moment_sds: Tuple[Mapping, Mapping], key_order: list,
                         count: int, *, base_lr: float, current_lr: float,
                         weight_decay: float) -> Dict:
    """(mu_sd, nu_sd) in torch tensor layout -> torch AdamW state_dict."""
    import torch
    mu_sd, nu_sd = moment_sds
    state = {}
    for i, k in enumerate(key_order):
        # np.array (not as_tensor over a device-array view): AdamW updates
        # these in place (exp_avg.mul_().add_()), so the tensors must own
        # writable storage.
        state[i] = {
            "step": torch.tensor(float(count)),
            "exp_avg": torch.from_numpy(np.array(mu_sd[k], np.float32)),
            "exp_avg_sq": torch.from_numpy(np.array(nu_sd[k], np.float32)),
        }
    return {"state": state,
            "param_groups": [_torch_adamw_param_group(
                len(key_order), base_lr=base_lr, current_lr=current_lr,
                weight_decay=weight_decay)]}


def scheduler_to_torch_sd(base_lr: float, t0: int, eta_min: float,
                          count: int, *, t_mult: int = 2) -> Dict:
    """Synthesize a torch CosineAnnealingWarmRestarts state_dict at
    optimizer-step `count` (the reference steps its scheduler once per
    optimizer step, train_hybrid.py:924-926; load_state_dict is a plain
    __dict__.update so this key set restores the schedule position)."""
    import math
    if count <= 0:
        t_i, t_cur = t0, 0
    elif t_mult == 1:
        t_i, t_cur = t0, count % t0
    else:
        n = int(math.floor(math.log2(count / t0 + 1.0)))
        t_i = t0 * (t_mult ** n)
        t_cur = count - t0 * (t_mult ** n - 1)
    lr = eta_min + (base_lr - eta_min) * 0.5 * (
        1.0 + math.cos(math.pi * t_cur / t_i))
    return {"T_0": t0, "T_i": t_i, "T_mult": t_mult, "eta_min": eta_min,
            "base_lrs": [base_lr], "last_epoch": count, "T_cur": t_cur,
            "_step_count": count + 1, "_last_lr": [lr]}


# ---------------------------------------------------------------------------
# Full-checkpoint migration, both directions
# ---------------------------------------------------------------------------

def train_config_from_reference_args(args: Mapping) -> "TrainConfig":
    """TrainConfig from a reference checkpoint's vars(args) snapshot
    (train_hybrid.py:605) — the flag names are field names here."""
    from lunaris_orion_tpu.config import TrainConfig
    return TrainConfig.from_dict(dict(args))


def train_state_from_torch_checkpoint(path: str, cfg,
                                      vcfg: VAEConfig | None = None,
                                      tcfg: TeacherConfig | None = None,
                                      *, ckpt: Mapping | None = None):
    """Reference latest.pt/best.pt -> a complete TrainState: params, BN
    running stats, both Adam m/v/count, schedule position, step, best_loss.
    The RL baseline EMA resets, exactly as a reference resume does (its
    save dict has no baseline key, train_hybrid.py:594-615).

    Pass `ckpt` (an already torch.load()ed dict) to skip re-reading the
    file — real reference checkpoints are hundreds of MB to GBs.

    Built on the host; callers shard with jax.device_put(state, shardings).
    """
    import torch

    import jax
    from lunaris_orion_tpu.train.state import create_state

    vcfg = vcfg or cfg.vae_config()
    tcfg = tcfg or cfg.teacher_config()
    if ckpt is None:
        ckpt = torch.load(path, map_location="cpu", weights_only=True)

    def _numpy(sd):
        return {k: v.numpy() if hasattr(v, "numpy") else v
                for k, v in sd.items()}

    # Convert everything BEFORE building the (possibly large) fresh state,
    # so an architecture mismatch fails fast with the converter's error.
    converted: Dict = {}
    vae_sd = teacher_sd = None
    if "vae_state_dict" in ckpt:
        vae_sd = _numpy(ckpt["vae_state_dict"])
        converted["vae_params"] = vae_params_from_torch(vae_sd, vcfg)
    if "teacher_state_dict" in ckpt:
        teacher_sd = _numpy(ckpt["teacher_state_dict"])
        converted["teacher_params"], converted["teacher_stats"] = \
            teacher_params_from_torch(teacher_sd, tcfg)
    vae_adam = teacher_adam = None
    if "vae_optimizer" in ckpt and vae_sd is not None:
        vae_adam = vae_adam_from_torch(ckpt["vae_optimizer"], vae_sd, vcfg)
    if "teacher_optimizer" in ckpt and teacher_sd is not None:
        teacher_adam = teacher_adam_from_torch(ckpt["teacher_optimizer"],
                                               teacher_sd, tcfg)

    base = create_state(jax.random.PRNGKey(int(cfg.seed)), cfg, vcfg, tcfg)

    updates: Dict = {
        "step": np.int32(int(ckpt.get("global_step", 0))),
        "best_loss": np.float32(ckpt.get("best_loss", np.inf)),
    }
    for name in ("vae_params", "teacher_params", "teacher_stats"):
        if name in converted:
            updates[name] = _cast_like(getattr(base, name), converted[name])
    if vae_adam is not None:
        updates["vae_opt"] = inject_adam_state(base.vae_opt, *vae_adam)
    if teacher_adam is not None:
        updates["teacher_opt"] = inject_adam_state(base.teacher_opt,
                                                   *teacher_adam)
    return base.replace(**updates)


def torch_checkpoint_from_state(state, cfg,
                                vcfg: VAEConfig | None = None,
                                tcfg: TeacherConfig | None = None) -> Dict:
    """TrainState -> the reference's exact checkpoint dict
    (train_hybrid.py:594-615): model/optimizer/scheduler state_dicts +
    global_step + best_loss + vars(args).  torch.save the result as
    latest.pt and the reference trainer resumes from it."""
    import torch

    vcfg = vcfg or cfg.vae_config()
    tcfg = tcfg or cfg.teacher_config()

    def t(sd):
        # np.array copy: torch load_state_dict consumers may mutate these
        # in place (e.g. BN running-stat updates), so no read-only views.
        return {k: torch.from_numpy(np.array(v, np.float32))
                for k, v in sd.items()}

    vae_sd = vae_state_dict_to_torch(state.vae_params, vcfg)
    teacher_sd = teacher_state_dict_to_torch(state.teacher_params,
                                             state.teacher_stats, tcfg)

    mu, nu, v_count = extract_adam_state(state.vae_opt)
    vae_sched = scheduler_to_torch_sd(
        cfg.vae_lr, cfg.scheduler_t0, cfg.min_lr, v_count)
    vae_opt = adam_to_torch_opt_sd(
        (vae_state_dict_to_torch(mu, vcfg),
         vae_state_dict_to_torch(nu, vcfg)),
        _param_key_order(vae_sd), v_count,
        base_lr=cfg.vae_lr, current_lr=vae_sched["_last_lr"][0],
        weight_decay=cfg.weight_decay)

    tmu, tnu, t_count = extract_adam_state(state.teacher_opt)
    teacher_sched = scheduler_to_torch_sd(
        cfg.teacher_lr, cfg.scheduler_t0, cfg.min_lr, t_count)
    teacher_opt = adam_to_torch_opt_sd(
        (teacher_state_dict_to_torch(tmu, state.teacher_stats, tcfg),
         teacher_state_dict_to_torch(tnu, state.teacher_stats, tcfg)),
        _param_key_order(teacher_sd), t_count,
        base_lr=cfg.teacher_lr, current_lr=teacher_sched["_last_lr"][0],
        weight_decay=cfg.weight_decay)

    return {
        "global_step": int(state.step),
        "vae_state_dict": t(vae_sd),
        "teacher_state_dict": t(teacher_sd),
        "vae_optimizer": vae_opt,
        "teacher_optimizer": teacher_opt,
        "vae_scheduler": vae_sched,
        "teacher_scheduler": teacher_sched,
        "best_loss": float(state.best_loss),
        "args": cfg.to_dict(),
    }
