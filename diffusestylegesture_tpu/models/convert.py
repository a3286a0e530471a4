"""PyTorch-checkpoint → Flax-params converters.

Imports the reference's released checkpoints (e.g. ZEGGS
`model000450000.pt`, `main/train/training_loop.py:300-320` save format)
into this framework's parameter pytrees. Linear weights transpose
(torch stores (out, in); Flax Dense kernels are (in, out)); LayerNorm
weight→scale. `clip_model.*` keys are dropped, mirroring
`load_model_wo_clip` (`main/utils/model_util.py:8-12`).
"""
from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _dense(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {
        "kernel": _np(sd[f"{prefix}.weight"]).T,
        "bias": _np(sd[f"{prefix}.bias"]),
    }


def _layernorm(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {
        "scale": _np(sd[f"{prefix}.weight"]),
        "bias": _np(sd[f"{prefix}.bias"]),
    }


def _encoder_layer(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    return {
        "self_attn": {
            "in_proj": {
                "kernel": _np(sd[f"{prefix}.self_attn.in_proj_weight"]).T,
                "bias": _np(sd[f"{prefix}.self_attn.in_proj_bias"]),
            },
            "out_proj": _dense(sd, f"{prefix}.self_attn.out_proj"),
        },
        "linear1": _dense(sd, f"{prefix}.linear1"),
        "linear2": _dense(sd, f"{prefix}.linear2"),
        "norm1": _layernorm(sd, f"{prefix}.norm1"),
        "norm2": _layernorm(sd, f"{prefix}.norm2"),
    }


def transformer_encoder_params(
    sd: Mapping[str, Any], prefix: str, num_layers: int
) -> Dict[str, Any]:
    return {
        f"layers_{i}": _encoder_layer(sd, f"{prefix}.layers.{i}") for i in range(num_layers)
    }


def convert_mdm_zeggs(sd: Mapping[str, Any], num_layers: int = 8) -> Dict[str, Any]:
    """Reference ZEGGS `MDM` state_dict → `models.mdm.MDM` params.

    Covers the live cross_local_attention3_style1 + wavlm configuration
    (`main/model/mdm.py`); unused buffers (`rel_pos.inv_freq`,
    `sequence_pos_encoder.pe`) are recomputed, `clip_model.*` dropped.
    """
    sd = {k: v for k, v in sd.items() if not k.startswith("clip_model.")}
    params: Dict[str, Any] = {
        "embed_timestep": {
            "time_embed_0": _dense(sd, "embed_timestep.time_embed.0"),
            "time_embed_2": _dense(sd, "embed_timestep.time_embed.2"),
        },
        "input_process": {"poseEmbedding": _dense(sd, "input_process.poseEmbedding")},
        "input_process2": _dense(sd, "input_process2"),
        "output_process": {"poseFinal": _dense(sd, "output_process.poseFinal")},
        "seqTransEncoder": transformer_encoder_params(sd, "seqTransEncoder", num_layers),
    }
    if "embed_style.weight" in sd:
        params["embed_style"] = _dense(sd, "embed_style")
    if "embed_text.weight" in sd:
        params["embed_text"] = _dense(sd, "embed_text")
    if "embed_text_last.weight" in sd:
        params["embed_text_last"] = _dense(sd, "embed_text_last")
    if "WavEncoder.audio_feature_map.weight" in sd:
        params["WavEncoder"] = {
            "audio_feature_map": _dense(sd, "WavEncoder.audio_feature_map")
        }
    return params


def convert_mdm_beat_twh(sd: Mapping[str, Any], num_layers: int = 8) -> Dict[str, Any]:
    """Reference BEAT/TWH `MDM` state_dict → `models.mdm_plus.MDMPlus` params.

    Same layout as ZEGGS plus the per-frame seed projection(s) used by
    cross_local_attention4/5 (`BEAT-TWH-main/model/mdm.py:187-264`) and the
    WavEncoder operating on the 1434/1435-d text+audio feature
    (`BEAT-TWH-main/model/mdm.py`).
    """
    return convert_mdm_zeggs(sd, num_layers)


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a .pt state_dict without CUDA, returning numpy arrays.

    `weights_only=True`: these checkpoints are plain tensor dicts, so the
    restricted unpickler suffices — a malicious .pt cannot execute code.
    (The WavLM loader relaxes this separately for its embedded cfg dict.)"""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "model_state_dict" in sd:
        sd = sd["model_state_dict"]
    return {k: _np(v) for k, v in sd.items()}


def _conv1d_t(sd, prefix):
    """torch Conv1d (out, in, k) → flax Conv kernel (k, in, out)."""
    out = {"kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _gru_layer(sd, prefix, layer, reverse=False):
    sfx = f"_l{layer}" + ("_reverse" if reverse else "")
    return {
        "ih": {
            "kernel": _np(sd[f"{prefix}.weight_ih{sfx}"]).T,
            "bias": _np(sd[f"{prefix}.bias_ih{sfx}"]),
        },
        "hh": {
            "kernel": _np(sd[f"{prefix}.weight_hh{sfx}"]).T,
            "bias": _np(sd[f"{prefix}.bias_hh{sfx}"]),
        },
    }


def convert_zeroeggs_speech_encoder(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """ZeroEGGS `SpeechEncoder` (`modules.py:237-260`) → flax params."""
    return {
        "layer0": _conv1d_t(sd, "layer0"),
        "layer1": _conv1d_t(sd, "layer1"),
        "layer2": _dense(sd, "layer2"),
    }


def convert_zeroeggs_style_encoder(sd: Mapping[str, Any], vae: bool = True) -> Dict[str, Any]:
    """ZeroEGGS `StyleEncoder(type='gru')` (`modules.py:266-331`)."""
    enc = {
        "conv0": _conv1d_t(sd, "encoder.convs.0.conv"),
        "conv1": _conv1d_t(sd, "encoder.convs.2.conv"),
        "rnn": {
            "l0_fwd": _gru_layer(sd, "encoder.rnn_layer", 0, reverse=False),
            "l0_bwd": _gru_layer(sd, "encoder.rnn_layer", 0, reverse=True),
        },
        "projection": _dense(sd, "encoder.projection_layer.linear_layer"),
    }
    return {"encoder": enc} if vae else enc


def convert_zeroeggs_decoder(sd: Mapping[str, Any], num_rnn_layers: int = 2) -> Dict[str, Any]:
    """ZeroEGGS `Decoder` (`modules.py:13-173`) → `ZeroEGGSDecoder` params."""
    rec = {
        "layer0": _dense(sd, "recurrent_decoder.layer0"),
        "layer2": _dense(sd, "recurrent_decoder.layer2"),
    }
    for k in range(num_rnn_layers):
        rec[f"gru_l{k}"] = _gru_layer(sd, "recurrent_decoder.layer1", k)
    return {
        "recurrent_decoder": rec,
        "cell_state_encoder": {
            "layer0": _dense(sd, "cell_state_encoder.layer0"),
            "layer1": _dense(sd, "cell_state_encoder.layer1"),
            "layer2": _dense(sd, "cell_state_encoder.layer2"),
        },
    }


def convert_zeroeggs_style_encoder_attn(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """ZeroEGGS `StyleEncoderAttn` (`modules.py:334-408`) → flax params."""
    return {
        "conv0": _conv1d_t(sd, "convs.0.conv"),
        "ln0": _layernorm(sd, "convs.2"),
        "conv1": _conv1d_t(sd, "convs.4.conv"),
        "ln1": _layernorm(sd, "convs.6"),
        "block0": {
            "mha": {
                "in_proj": {
                    "kernel": _np(sd["blocks.0.attention.multi_head_attention.in_proj_weight"]).T,
                    "bias": _np(sd["blocks.0.attention.multi_head_attention.in_proj_bias"]),
                },
                "out_proj": _dense(sd, "blocks.0.attention.multi_head_attention.out_proj"),
            },
            "attn_norm": _layernorm(sd, "blocks.0.attention.layer_norm"),
            "ff": {
                "conv0": _conv1d_t(sd, "blocks.0.feed_forward.convs.0.conv"),
                "conv1": _conv1d_t(sd, "blocks.0.feed_forward.convs.2.conv"),
                "layer_norm": _layernorm(sd, "blocks.0.feed_forward.layer_norm"),
            },
        },
    }


def convert_local_transformer(sd: Mapping[str, Any], depth: int) -> Dict[str, Any]:
    """lucidrains `LocalTransformer` (`main/model/local_attention/transformer.py:98-131`)
    → `models/local_transformer.LocalTransformer` params (bare tree, wrap in
    {"params": ...} for apply — same convention as every other converter).

    Layer i is `layers.{i}.0` (LocalMHA: norm, to_qkv, to_out — all biasless
    except the LayerNorm) and `layers.{i}.1` (Sequential LayerNorm/Dense/
    GEGLU/Dropout/Dense); head is `to_logits.{0,1}` (LayerNorm + Dense)."""
    params: Dict[str, Any] = {
        "token_emb": {"embedding": _np(sd["token_emb.weight"])},
        "pos_emb": {"embedding": _np(sd["pos_emb.weight"])},
        "to_logits_norm": _layernorm(sd, "to_logits.0"),
        "to_logits": {"kernel": _np(sd["to_logits.1.weight"]).T},
    }
    for i in range(depth):
        params[f"attn_{i}"] = {
            "norm": _layernorm(sd, f"layers.{i}.0.norm"),
            "to_qkv": {"kernel": _np(sd[f"layers.{i}.0.to_qkv.weight"]).T},
            "to_out": {"kernel": _np(sd[f"layers.{i}.0.to_out.weight"]).T},
        }
        params[f"ff_{i}"] = {
            "norm": _layernorm(sd, f"layers.{i}.1.0"),
            "linear1": {"kernel": _np(sd[f"layers.{i}.1.1.weight"]).T},
            "linear2": {"kernel": _np(sd[f"layers.{i}.1.4.weight"]).T},
        }
    return params
