"""Text-conditioned MDM denoiser (MDM-legacy text-to-motion).

Completes the one reference call stack with no runnable model: the
MDM-legacy product path `main/train/train_mdm.py` + `main/sample/generate.py`
builds `MDM(cond_mode='text', ...)` (`main/utils/model_util.py:27-57`) —
but the gesture fork STRIPPED the CLIP text branch from the vendored
denoiser (`main/model/mdm.py:104-124` has only style/seed embeds;
`parameters_wo_clip`/`load_model_wo_clip` still reference the removed
`clip_model`). This module is the intent-port of that branch, matching
the upstream MDM semantics the reference CLIs were written against:

  x_t (B, njoints, 1, T) hml_vec -> InputProcess linear -> prepend
  [t_embed + embed_text(mask_cond(clip_features))] token -> additive
  sinusoidal PE -> trans_enc stack -> drop token -> OutputProcess.

Conditioning is a precomputed CLIP ViT-B/32 text embedding (512-d,
`models/clip_text.py` is the TPU-native encoder); CFG dropout uses the
same `mask_cond` as the gesture models, so `make_cfg_model_fn` /
guidance_param semantics carry over unchanged
(`main/model/cfg_sampler.py:8-31`).

HumanML3D defaults: njoints=263 (RIC feature vector), latent 512,
8 layers, ff 1024, heads 4 — `main/utils/parser_util.py` defaults.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .embeddings import (
    InputProcess,
    OutputProcess,
    TimestepEmbedder,
    mask_cond,
    sinusoidal_pe,
)
from .transformer import encoder_trunk


@dataclasses.dataclass(frozen=True)
class TextMDMConfig:
    njoints: int = 263        # HumanML3D hml_vec; KIT = 251
    nfeats: int = 1
    latent_dim: int = 512
    ff_size: int = 1024
    num_layers: int = 8
    num_heads: int = 4
    dropout: float = 0.1
    activation: str = "gelu"
    clip_dim: int = 512
    cond_mask_prob: float = 0.1
    # trunk knobs shared with MDM/MDMPlus (transformer.encoder_trunk)
    trunk_impl: str = "loop"
    pipe_mesh: Any = None
    pipe_axis: str = "pipe"
    pipe_microbatches: int = 0
    remat: bool = False
    split_qkv: bool = False
    moe_experts: int = 0
    moe_capacity_factor: float = 2.0
    dtype: Any = jnp.float32

    @property
    def input_feats(self) -> int:
        return self.njoints * self.nfeats


class TextMDM(nn.Module):
    """__call__(x, timesteps, cond, train=False, uncond=None)

    x: (B, njoints, nfeats, T) noisy hml_vec window
    timesteps: (B,) int32
    cond: {'text_emb': (B, clip_dim)} — CLIP text features
          (`clip_text.encode_text`), precomputed like the reference
          caches them per prompt.
    uncond: optional (B,) bool CFG force-mask.
    Returns predicted x0, (B, njoints, nfeats, T).
    """

    cfg: TextMDMConfig

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        timesteps: jax.Array,
        cond: Dict[str, jax.Array],
        *,
        train: bool = False,
        uncond: Optional[jax.Array] = None,
    ) -> jax.Array:
        cfg = self.cfg
        B, njoints, nfeats, T = x.shape
        D = cfg.latent_dim

        emb_t = TimestepEmbedder(D, name="embed_timestep")(timesteps)  # (B, D)

        cm_rng = (self.make_rng("cond_mask")
                  if (train and cfg.cond_mask_prob > 0) else None)
        text = mask_cond(
            cond["text_emb"], cond_mask_prob=cfg.cond_mask_prob,
            train=train, uncond=uncond, rng=cm_rng,
        )
        token = emb_t + nn.Dense(D, name="embed_text")(text)  # (B, D)

        x_ = InputProcess(D, name="input_process")(x)  # (B, T, D)

        cdt = cfg.dtype
        seq = jnp.concatenate(
            [token[:, None, :].astype(cdt), x_.astype(cdt)], axis=1)
        pe = jnp.asarray(sinusoidal_pe(5000, D), cdt)
        seq = seq + pe[None, : T + 1]
        out = encoder_trunk(self, cfg, seq, train)[:, 1:]

        return OutputProcess(
            cfg.input_feats, njoints, nfeats, name="output_process"
        )(out.astype(jnp.float32))


def make_t2m_cond_builder():
    """Text-to-motion batch -> (x_start, cond, mask) for
    `train.state.make_train_step`.

    batch: {'motion' (B, T, njoints), 'text_emb' (B, clip_dim),
            'lengths' (B,) int} — the `t2m_collate` layout with the
    caption replaced by its CLIP embedding. The loss mask replicates the
    reference's `lengths_to_mask` conditioning (`main/data_loaders/
    tensors.py:2-23` -> `masked_l2`): zero-padded frames past each
    clip's length do not contribute.
    """

    def builder(batch: Dict):
        motion = batch["motion"].transpose(0, 2, 1)[:, :, None, :]  # (B,C,1,T)
        B, _, _, T = motion.shape
        cond = {"text_emb": batch["text_emb"]}
        mask = (jnp.arange(T)[None, :] < batch["lengths"][:, None]).astype(
            jnp.float32)[:, None, None, :]
        return motion, cond, mask

    return builder
