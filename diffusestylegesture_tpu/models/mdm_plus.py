"""MDM+ / MDM++ denoiser (DiffuseStyleGesture+ on BEAT and TWH).

Behavioral parity with `BEAT-TWH-main/model/mdm.py:10-267`:
  * style = speaker one-hot (2 BEAT / 17 TWH) via `embed_style`;
  * audio input is the fused 1434/1435-d text+audio per-frame feature,
    projected by `WavEncoder` Linear(source_audio_dim → audio_feat_dim);
  * window 15, local/rope heads 8;
  * three conditioning variants:
      - `cross_local_attention3` ("DSG"): token = style(64) ⊕ seed-embed,
        audio spans all n frames (ref `:147-185`);
      - `cross_local_attention4` ("+"): style embed is full-width latent;
        the n_seed seed frames are each projected
        Linear(njoints → audio_feat_dim) and *prepended along time* to the
        (n − n_seed)-frame audio features (ref `:187-224`);
      - `cross_local_attention5` ("++"): like 4 plus a `seed_last` block
        appended at the end for inpainting-style both-ends continuation
        (ref `:226-264`).
    In variants 4/5 only the style embedding passes through CFG masking
    (ref `:145`); the seed path is never dropped.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from . import rotary
from .embeddings import (
    InputProcess,
    OutputProcess,
    TimestepEmbedder,
    WavEncoder,
    mask_cond,
)
from .local_attention import local_attention
from .transformer import encoder_trunk


@dataclasses.dataclass(frozen=True)
class MDMPlusConfig:
    njoints: int = 2232  # TWH (2052 BEAT): motion·3 (pos+vel+acc)
    nfeats: int = 1
    latent_dim: int = 512  # 384 BEAT
    ff_size: int = 1024
    num_layers: int = 8
    num_heads: int = 4
    local_heads: int = 8
    dropout: float = 0.1
    activation: str = "gelu"
    source_audio_dim: int = 1435  # 1434 BEAT (audio 1133 + text 301/302)
    audio_feat_dim: int = 128  # audio_feat_dim_latent (64 BEAT)
    style_dim_in: int = 17  # speakers (2 BEAT)
    style_dim: int = 64  # attention3 only; 4/5 use latent_dim
    n_seed: int = 30
    cond_mode: str = "cross_local_attention4_style1"
    cond_mask_prob: float = 0.1
    window_size: int = 15
    # "xla" | "pallas" | "seq_parallel" (time-sharded local attention over
    # seq_axis of seq_mesh — see `models/mdm.py` and parallel/seq_parallel)
    attn_impl: str = "xla"
    seq_mesh: Any = None
    seq_axis: str = "seq"
    # "loop" | "pipeline" — GPipe-pipelined trunk over pipe_axis of
    # pipe_mesh (`parallel/pipeline.py`; see models/mdm.py)
    trunk_impl: str = "loop"
    pipe_mesh: Any = None
    pipe_axis: str = "pipe"
    pipe_microbatches: int = 0
    remat: bool = False
    # separate q/k/v trunk projections instead of the torch-packed
    # in_proj — head-aligned under tensor parallelism (see models/mdm.py)
    split_qkv: bool = False
    # >0 swaps the trunk FFN for a Switch-routed MoE (`models/moe.py`)
    moe_experts: int = 0
    moe_capacity_factor: float = 2.0
    dtype: Any = jnp.float32

    @property
    def input_feats(self) -> int:
        return self.njoints * self.nfeats


class MDMPlus(nn.Module):
    """BEAT/TWH gesture denoiser.

    cond keys: 'style' (B, style_dim_in), 'seed' (B, njoints, 1, n_seed),
    'audio' (B, T_a, source_audio_dim), 'mask_local' (B, T) and, for
    cross_local_attention5, 'seed_last' (B, njoints, 1, n_seed).
    T_a = T (attn3), T − n_seed (attn4), T − 2·n_seed (attn5).
    """

    cfg: MDMPlusConfig

    # shared packed-head helpers (rotary.py)
    def _heads_split(self, x, heads):
        return rotary.heads_split(x, heads)

    def _heads_merge(self, x, B, heads):
        return rotary.heads_merge(x, B, heads)

    def _rope(self, x):
        return rotary.rope(x)

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
        H = cfg.local_heads
        mode = cfg.cond_mode

        emb_t = TimestepEmbedder(D, name="embed_timestep")(timesteps)
        cm_rng = self.make_rng("cond_mask") if (train and cfg.cond_mask_prob > 0) else None
        # independent dropout masks for style and seed (ref: separate
        # torch.bernoulli draws per mask_cond call)
        cm_style, cm_seed = (jax.random.split(cm_rng)
                             if cm_rng is not None else (None, None))
        mk = lambda c, r: mask_cond(  # noqa: E731
            c, cond_mask_prob=cfg.cond_mask_prob, train=train, uncond=uncond, rng=r
        )

        style_width = cfg.style_dim if "cross_local_attention3" in mode else D
        style_emb = mk(nn.Dense(style_width, name="embed_style")(cond["style"]), cm_style)

        audio_enc = WavEncoder(cfg.audio_feat_dim, name="WavEncoder")(cond["audio"])

        if "cross_local_attention3" in mode:
            seed_flat = mk(cond["seed"].reshape(B, -1), cm_seed)
            seed_emb = nn.Dense(D - cfg.style_dim, name="embed_text")(seed_flat)
            token = jnp.concatenate([style_emb, seed_emb], axis=-1) + emb_t
            enc_text = audio_enc  # (B, T, A)
        elif "cross_local_attention4" in mode:
            seed_frames = cond["seed"][:, :, 0].transpose(0, 2, 1)  # (B, n_seed, njoints)
            seed_proj = nn.Dense(cfg.audio_feat_dim, name="embed_text")(seed_frames)
            enc_text = jnp.concatenate([seed_proj, audio_enc], axis=1)
            token = style_emb + emb_t
        elif "cross_local_attention5" in mode:
            seed_frames = cond["seed"][:, :, 0].transpose(0, 2, 1)
            seed_proj = nn.Dense(cfg.audio_feat_dim, name="embed_text")(seed_frames)
            seed_last = cond["seed_last"][:, :, 0].transpose(0, 2, 1)
            seed_last_proj = nn.Dense(cfg.audio_feat_dim, name="embed_text_last")(seed_last)
            enc_text = jnp.concatenate([seed_proj, audio_enc, seed_last_proj], axis=1)
            token = style_emb + emb_t
        else:
            raise NotImplementedError(mode)

        x_ = InputProcess(D, name="input_process")(x)  # (B, T, D)
        # compute-dtype discipline as in MDM (`mdm.py:157-163`): the trunk
        # runs in cfg.dtype (bf16 serving mode), output cast back to f32
        cdt = cfg.dtype
        token = token.astype(cdt)
        x_ = x_.astype(cdt)
        enc_text = enc_text.astype(cdt)
        tok = jnp.broadcast_to(token[:, None, :], (B, T, D))
        cat = jnp.concatenate([tok, x_, enc_text], axis=-1)
        h = nn.Dense(D, name="input_process2")(cat)
        hh = self._rope(self._heads_split(h, H))
        out = local_attention(
            hh, hh, hh, cfg.window_size, cond.get("mask_local"), heads=H,
            impl=cfg.attn_impl, seq_mesh=cfg.seq_mesh, seq_axis=cfg.seq_axis,
        )
        h = self._heads_merge(out, B, H)

        seq = jnp.concatenate([token[:, None, :], h], axis=1)
        hh = self._rope(self._heads_split(seq, H))
        seq = self._heads_merge(hh, B, H)
        # sequential loop or GPipe pipeline (`transformer.encoder_trunk`
        # dispatches on cfg.trunk_impl; same params either way)
        out = encoder_trunk(self, cfg, seq, train)[:, 1:]

        return OutputProcess(cfg.input_feats, njoints, nfeats,
                             name="output_process")(out.astype(jnp.float32))


def beat_mdm(**overrides) -> MDMPlus:
    """BEAT config (`BEAT-TWH-main/mydiffusion_beat_twh/end2end.py:81-89`)."""
    base = dict(
        njoints=2052, latent_dim=384, source_audio_dim=1434, audio_feat_dim=96,
        style_dim_in=2,
    )
    base.update(overrides)
    return MDMPlus(MDMPlusConfig(**base))


def twh_mdm(**overrides) -> MDMPlus:
    """TWH config (`BEAT-TWH-main/mydiffusion_beat_twh/end2end.py:90-99`)."""
    base = dict(
        njoints=2232, latent_dim=512, source_audio_dim=1435, audio_feat_dim=128,
        style_dim_in=17,
    )
    base.update(overrides)
    return MDMPlus(MDMPlusConfig(**base))
