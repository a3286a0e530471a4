"""Shared embedding components for the denoisers.

Parity targets: `PositionalEncoding` (`main/model/mdm.py:372-389`),
`TimestepEmbedder` (`main/model/mdm.py:434-448`), `InputProcess`
(`:451-475`), `OutputProcess` (`:478-504`), `WavEncoder` (`:545-552`).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def sinusoidal_pe(max_len: int, d_model: int) -> np.ndarray:
    """The classic interleaved sin/cos table (ref `:377-382`), (L, D)."""
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    position = np.arange(0, max_len, dtype=np.float32)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2).astype(np.float32) * (-np.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


class TimestepEmbedder(nn.Module):
    """PE-lookup → Linear → SiLU → Linear (ref `:434-448`)."""

    latent_dim: int
    max_len: int = 5000

    @nn.compact
    def __call__(self, timesteps: jax.Array) -> jax.Array:
        pe = jnp.asarray(sinusoidal_pe(self.max_len, self.latent_dim))
        h = pe[timesteps]  # (B, D)
        h = nn.Dense(self.latent_dim, name="time_embed_0")(h)
        h = nn.silu(h)
        h = nn.Dense(self.latent_dim, name="time_embed_2")(h)
        return h


class InputProcess(nn.Module):
    """Per-frame linear pose embedding (ref `:451-475`, rot6d path).

    Input (B, C, 1, T) → (B, T, latent).
    """

    latent_dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, C, F, T = x.shape
        x = x.transpose(0, 3, 1, 2).reshape(B, T, C * F)
        return nn.Dense(self.latent_dim, name="poseEmbedding")(x)


class OutputProcess(nn.Module):
    """Latent → pose features (ref `:478-504`). (B, T, D) → (B, C, F, T)."""

    input_feats: int
    njoints: int
    nfeats: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, T, _ = x.shape
        out = nn.Dense(self.input_feats, name="poseFinal")(x)
        out = out.reshape(B, T, self.njoints, self.nfeats)
        return out.transpose(0, 2, 3, 1)


class WavEncoder(nn.Module):
    """WavLM-feature projection 1024 → 64 (ref `:545-552`)."""

    out_dim: int = 64

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Dense(self.out_dim, name="audio_feature_map")(x)


def mask_cond(
    cond: jax.Array,
    *,
    cond_mask_prob: float,
    train: bool,
    uncond: jax.Array | None = None,
    rng: jax.Array | None = None,
) -> jax.Array:
    """Classifier-free-guidance condition dropout (ref `mask_cond:156-164`).

    `uncond`: per-example boolean force-mask (generalizes the reference's
    all-or-nothing `force_mask` so CFG can run cond+uncond in one batch).
    """
    B = cond.shape[0]
    keep = jnp.ones((B, 1), dtype=cond.dtype)
    if uncond is not None:
        keep = keep * (1.0 - uncond.astype(cond.dtype)[:, None])
    if train and cond_mask_prob > 0.0:
        assert rng is not None, "mask_cond in train mode needs an rng"
        bern = jax.random.bernoulli(rng, cond_mask_prob, (B, 1))
        keep = keep * (1.0 - bern.astype(cond.dtype))
    return cond * keep
