"""Translation-invariant self-attention positional scores (TISA).

Port of the reference's vendored `main/model/tisa.py:8-107` (Wennberg &
Henter 2021): per-head radial-basis scores over relative offsets,
expanded into a Toeplitz (seq_len × seq_len) additive attention-bias
matrix. In the reference it is reachable only through the unexecutable
`mytrans_enc` arch; here it is a standalone bias module usable with
`TorchTransformerEncoder(attn_mask=...)`-style additive biases or any
custom attention.

TPU notes: the Toeplitz expansion is a single gather from the
(2·seq_len+1) score vector — O(T²) memory like any dense bias, computed
once per length and closed over by jit.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class Tisa(nn.Module):
    """`Tisa(num_attention_heads, num_kernels)` → (H, T, T) scores."""

    num_attention_heads: int = 12
    num_kernels: int = 5

    def setup(self):
        shape = (self.num_kernels, self.num_attention_heads)
        self.kernel_offsets = self.param(
            "kernel_offsets", nn.initializers.normal(5.0), shape
        )
        self.kernel_amplitudes = self.param(
            "kernel_amplitudes",
            lambda key, s: 0.1 + 0.01 * jax.random.normal(key, s),
            shape,
        )
        self.kernel_sharpness = self.param(
            "kernel_sharpness",
            lambda key, s: 0.1 + 0.01 * jax.random.normal(key, s),
            shape,
        )

    def positional_scores(self, offsets: jax.Array) -> jax.Array:
        """RBF scores per head over relative offsets (ref `:30-41`)."""
        d = self.kernel_offsets[..., None] - offsets  # (K, H, 2T+1)
        rbf = self.kernel_amplitudes[..., None] * jnp.exp(
            -jnp.abs(self.kernel_sharpness[..., None]) * d**2
        )
        return rbf.sum(axis=0)  # (H, 2T+1)

    def __call__(self, seq_len: int) -> jax.Array:
        if not self.num_kernels:
            return jnp.zeros((self.num_attention_heads, seq_len, seq_len))
        offsets = jnp.arange(-seq_len, seq_len + 1)
        scores = self.positional_scores(offsets)  # (H, 2T+1)
        # Toeplitz expansion (ref `:43-61`): index map such that
        # M[i, j] = scores[(j - i) + seq_len - 1 + ...]; reproduce the
        # reference's exact deformed index arithmetic.
        idx = (
            jnp.arange(0, -(seq_len**2), -1) + (seq_len - 1)
        ).reshape(seq_len, seq_len) + (seq_len + 1) * jnp.arange(seq_len)[:, None]
        return scores[:, idx.reshape(-1)].reshape(
            self.num_attention_heads, seq_len, seq_len
        )
