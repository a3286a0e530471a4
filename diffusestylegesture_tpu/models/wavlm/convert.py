"""WavLM torch checkpoint → Flax params converter.

Handles the `WavLM-Large.pt` layout the reference loads
(`main/mydiffusion_zeggs/sample.py:30-41`): a dict with 'cfg' and 'model'
entries. The pos_conv weight-norm reparameterization (g, v) is folded
into a plain kernel (the encoder is frozen on all live paths).
"""
from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from .model import WavLMConfig


# shared torch→flax primitives live in models/convert.py; only the
# optional-bias conv variant is WavLM-specific
from ..convert import _dense, _layernorm as _ln, _np  # noqa: E402


def _conv1d(sd, prefix, has_bias=False):
    out = {"kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 1, 0)}
    if has_bias and f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def fold_weight_norm(g: np.ndarray, v: np.ndarray, dim: int = 2) -> np.ndarray:
    """torch weight_norm(dim=2) fold: w = g · v / ||v||_{dims≠2}."""
    axes = tuple(i for i in range(v.ndim) if i != dim)
    norm = np.sqrt((v**2).sum(axis=axes, keepdims=True))
    return g * v / norm


def convert_wavlm(sd: Mapping[str, Any], cfg: WavLMConfig) -> Dict[str, Any]:
    params: Dict[str, Any] = {}

    fe: Dict[str, Any] = {}
    for i in range(len(cfg.conv_feature_layers)):
        fe[f"conv_{i}"] = _conv1d(sd, f"feature_extractor.conv_layers.{i}.0", cfg.conv_bias)
        if cfg.extractor_mode == "layer_norm":
            fe[f"ln_{i}"] = _ln(sd, f"feature_extractor.conv_layers.{i}.2.1")
        elif cfg.extractor_mode == "default" and i == 0:
            fe["gn_scale"] = _np(sd["feature_extractor.conv_layers.0.2.weight"])
            fe["gn_bias"] = _np(sd["feature_extractor.conv_layers.0.2.bias"])
    params["feature_extractor"] = fe

    params["layer_norm"] = _ln(sd, "layer_norm")
    if "post_extract_proj.weight" in sd:
        params["post_extract_proj"] = _dense(sd, "post_extract_proj")

    g = _np(sd["encoder.pos_conv.0.weight_g"])
    v = _np(sd["encoder.pos_conv.0.weight_v"])
    w = fold_weight_norm(g, v, dim=2)  # (out, in/groups, k)
    params["pos_conv"] = {
        "kernel": w.transpose(2, 1, 0),
        "bias": _np(sd["encoder.pos_conv.0.bias"]),
    }

    params["encoder_layer_norm"] = _ln(sd, "encoder.layer_norm")

    for i in range(cfg.encoder_layers):
        p = f"encoder.layers.{i}"
        attn: Dict[str, Any] = {
            "q_proj": _dense(sd, f"{p}.self_attn.q_proj"),
            "k_proj": _dense(sd, f"{p}.self_attn.k_proj"),
            "v_proj": _dense(sd, f"{p}.self_attn.v_proj"),
            "out_proj": _dense(sd, f"{p}.self_attn.out_proj"),
        }
        if cfg.gru_rel_pos:
            attn["grep_linear"] = _dense(sd, f"{p}.self_attn.grep_linear")
            attn["grep_a"] = _np(sd[f"{p}.self_attn.grep_a"])
        if cfg.relative_position_embedding and i == 0:
            attn["relative_attention_bias"] = _np(
                sd[f"{p}.self_attn.relative_attention_bias.weight"]
            )
        params[f"layers_{i}"] = {
            "self_attn": attn,
            "self_attn_layer_norm": _ln(sd, f"{p}.self_attn_layer_norm"),
            "fc1": _dense(sd, f"{p}.fc1"),
            "fc2": _dense(sd, f"{p}.fc2"),
            "final_layer_norm": _ln(sd, f"{p}.final_layer_norm"),
        }
    return params


def load_wavlm_checkpoint(path: str):
    """WavLM-Large.pt → (WavLMConfig, flax params)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    cfg = WavLMConfig.from_torch_cfg(ckpt["cfg"])
    params = convert_wavlm({k: _np(v) for k, v in ckpt["model"].items()}, cfg)
    return cfg, {"params": params}
