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

    for li in range(cfg.expert_layers):
        lp = params["experts"][f"layer{li}"]
        ls = stats["experts"][f"layer{li}"]
        for e in range(cfg.num_experts):
            bp, bs = _unstack(lp, e), _unstack(ls, e)
            t = f"experts.{e}.{li}"
            _cbn_to(out, f"{t}.conv1.0", f"{t}.conv1.2", bp["conv1"],
                    bs["conv1"])
            _cbn_to(out, f"{t}.conv2.0", f"{t}.conv2.2", bp["conv2"],
                    bs["conv2"])
            _conv_to(out, f"{t}.attention.qkv", bp["attn"]["qkv"])
            _conv_to(out, f"{t}.attention.proj", bp["attn"]["proj"])
            out[f"{t}.attention.rel_pos_h"] = \
                _np(bp["attn"]["rel_pos_h"])[None, :, :, None]
            out[f"{t}.attention.rel_pos_w"] = \
                _np(bp["attn"]["rel_pos_w"])[None, :, None, :]
            if "shortcut" in bp:
                _cbn_to(out, f"{t}.shortcut.0", f"{t}.shortcut.1",
                        bp["shortcut"], bs["shortcut"])
            out[f"{t}.layer_scale"] = \
                _np(bp["layer_scale"]).reshape(1, -1, 1, 1)

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
                               tcfg: TeacherConfig) -> Dict:
    """Load a full reference checkpoint: both models + trainer scalars.

    Returns {vae_params, teacher_params, teacher_stats, global_step,
    best_loss} (reference save dict: train_hybrid.py:594-615)."""
    import torch
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
