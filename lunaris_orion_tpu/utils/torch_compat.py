"""PyTorch-reference weight interop.

Converts a reference LunarisCoreVAE state_dict (lunar_generate.py layout,
NCHW/OIHW torch tensors) into this package's NHWC/HWIO param pytree, so
checkpoints trained with the reference can be decoded here and vice versa —
the basis of the per-pixel decode-parity guarantee (BASELINE.json north
star).

Layout mapping:
  torch Conv2d weight  [O, I, kh, kw]  -> HWIO [kh, kw, I, O]
  torch ConvT2d weight [I, O, kh, kw]  -> our dilated-conv HWIO, spatially
                                          flipped: w[h,w,i,o] = t[i,o,kh-1-h,kw-1-w]
  torch Linear weight  [O, I]          -> [I, O]
  GroupNorm weight/bias                -> scale/bias
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from lunaris_orion_tpu.config import VAEConfig


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


def load_torch_checkpoint(path: str, cfg: VAEConfig, *,
                          key: str = "vae_state_dict") -> Dict:
    """Load a reference training checkpoint (.pt) and convert the VAE weights
    (checkpoint layout: train_hybrid.py:594-615)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    sd = ckpt.get(key, ckpt)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    return vae_params_from_torch(sd, cfg)
