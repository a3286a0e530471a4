"""Rotary position embeddings, GPT-NeoX-style half rotation.

Parity with the vendored lucidrains rotary module
(`main/model/local_attention/rotary.py:6-25`): inverse-frequency table
``1/10000^(2i/d)``, frequencies duplicated across the two halves, and
``rotate_half`` that splits the feature dim into [first half | second
half] and maps (x1, x2) → (-x2, x1).

The MDM denoiser applies this rotation to the *token embeddings
themselves* (not q/k inside attention) before both the local-attention
block and the transformer stack (`main/model/mdm.py:211-212,224-225`);
`apply_rotary` here reproduces exactly that.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sinusoidal_freqs(n: int, dim: int, dtype=jnp.float32) -> jax.Array:
    """(n, dim) angle table: freqs duplicated across halves (ref `:12-16`)."""
    inv_freq = 1.0 / (10000 ** (jnp.arange(0, dim, 2, dtype=dtype) / dim))
    t = jnp.arange(n, dtype=dtype)
    freqs = jnp.einsum("i,j->ij", t, inv_freq)
    return jnp.concatenate([freqs, freqs], axis=-1)


def rotate_half(x: jax.Array) -> jax.Array:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rotary(x: jax.Array, freqs: jax.Array) -> jax.Array:
    """Rotate the last dim of x by per-position angles.

    x: (..., n, d); freqs: (n, d) from `sinusoidal_freqs`. The angle table
    and cos/sin are evaluated in f32 even when x is bf16 — a bf16 angle at
    window-tail positions is off by up to 0.14 rad (~30× bf16 rounding),
    visibly mis-rotating the positional embedding. Only the rotated
    result returns in x's dtype.
    """
    f = freqs.astype(jnp.float32)
    out = x.astype(jnp.float32) * jnp.cos(f) + \
        rotate_half(x).astype(jnp.float32) * jnp.sin(f)
    return out.astype(x.dtype)


def heads_split(x: jax.Array, heads: int) -> jax.Array:
    """(B, T, D) → (B·heads, T, D/heads) packed layout (shared by MDM,
    MDMPlus and the fused Pallas path so the layouts cannot drift)."""
    B, T, D = x.shape
    x = x.reshape(B, T, heads, D // heads).transpose(0, 2, 1, 3)
    return x.reshape(B * heads, T, D // heads)


def heads_merge(x: jax.Array, B: int, heads: int) -> jax.Array:
    BH, T, hd = x.shape
    x = x.reshape(B, heads, T, hd).transpose(0, 2, 1, 3)
    return x.reshape(B, T, heads * hd)


def rope(x: jax.Array) -> jax.Array:
    """Apply rotary over (•, T, d) using the table for x's length."""
    freqs = sinusoidal_freqs(x.shape[1], x.shape[2])
    return apply_rotary(x, freqs)
