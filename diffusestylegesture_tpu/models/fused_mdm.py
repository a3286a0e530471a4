"""Serving-path ZEGGS MDM forward with the fused Pallas trunk.

Functionally identical to `models/mdm.py::MDM.__call__` (inference mode,
cross_local_attention3_style1 — validated by `tests/test_fused_mdm.py`),
but written as a plain function over the parameter pytree so the
transformer trunk can run through `ops/encoder_layer_pallas.py` (8 kernel
launches instead of ~60 XLA fusions per denoiser step — the batch-1
sampling chain is dispatch-bound, see that module's docstring).

Built for the sampler: `make_fused_zeggs_apply(cfg)` returns an apply fn
with the `(params, x, t, cond, uncond=None)` signature `ZeggsSampler`
expects.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from . import rotary
from .embeddings import sinusoidal_pe
from .local_attention import local_attention
from .mdm import MDMConfig
from ..ops.encoder_layer_pallas import fused_trunk_apply


def _dense(p, x):
    return x @ p["kernel"] + p["bias"]


def make_fused_zeggs_apply(cfg: MDMConfig, attn_impl: str = "xla", mxu_bf16: bool = True):
    assert "cross_local_attention3" in cfg.cond_mode and "style1" in cfg.cond_mode

    D = cfg.latent_dim
    H = cfg.local_heads
    pe = jnp.asarray(sinusoidal_pe(5000, D))

    # shared packed-head helpers (rotary.py) — same definitions as the
    # flax MDM path, so the layouts cannot drift
    heads_split = rotary.heads_split
    heads_merge = rotary.heads_merge
    rope = rotary.rope

    def apply(params: Dict[str, Any], x, timesteps, cond, uncond: Optional[jax.Array] = None):
        p = params["params"] if "params" in params else params
        B, njoints, nfeats, T = x.shape

        # timestep embedding
        h = pe[timesteps]
        h = _dense(p["embed_timestep"]["time_embed_0"], h)
        h = jax.nn.silu(h)
        emb_t = _dense(p["embed_timestep"]["time_embed_2"], h)

        keep = jnp.ones((B, 1), jnp.float32)
        if uncond is not None:
            keep = keep * (1.0 - uncond.astype(jnp.float32)[:, None])

        style_emb = _dense(p["embed_style"], cond["style"]) * keep
        seed_flat = cond["seed"].reshape(B, -1) * keep
        seed_emb = _dense(p["embed_text"], seed_flat)
        emb_1 = jnp.concatenate([style_emb, seed_emb], axis=-1)

        if cfg.audio_feat == "wavlm":
            enc_audio = _dense(p["WavEncoder"]["audio_feature_map"], cond["audio"])
        else:
            enc_audio = cond["audio"]

        token = emb_1 + emb_t
        x_seq = x.transpose(0, 3, 1, 2).reshape(B, T, njoints * nfeats)
        x_ = _dense(p["input_process"]["poseEmbedding"], x_seq)

        tok = jnp.broadcast_to(token[:, None, :], (B, T, D))
        cat = jnp.concatenate([tok, x_, enc_audio], axis=-1)
        hloc = _dense(p["input_process2"], cat)
        hh = rope(heads_split(hloc, H))
        out = local_attention(
            hh, hh, hh, cfg.window_size, cond.get("mask_local"), heads=H, impl=attn_impl
        )
        hloc = heads_merge(out, B, H)

        seq = jnp.concatenate([token[:, None, :], hloc], axis=1)
        hh = rope(heads_split(seq, H))
        seq = heads_merge(hh, B, H)

        trunk_out = fused_trunk_apply(seq, p["seqTransEncoder"], cfg.num_heads, mxu_bf16)[:, 1:]

        out = _dense(p["output_process"]["poseFinal"], trunk_out)
        out = out.reshape(B, T, njoints, nfeats)
        return out.transpose(0, 2, 3, 1)

    return apply
