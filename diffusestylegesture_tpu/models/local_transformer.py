"""Autoregressive token transformer with windowed local attention.

Port of the vendored lucidrains `LocalTransformer` wrapper
(`main/model/local_attention/transformer.py:34-180`): LocalMHA blocks
(prenorm, packed QKV without biases, causal local attention with
`exact_windowsize`), GEGLU feed-forward, learned absolute position
embeddings, tied-nothing output head, cross-entropy loss with
`ignore_index`, and top-k autoregressive `generate`.

The reference copy is **unrunnable as vendored** (SURVEY §2.1 #12, Used ✗):
`LocalMHA.forward` calls `self.attn_fn(q, k, v, mask=mask)` but the
vendored `LocalAttention.forward` requires a `packed_shape` positional
argument (`local_attention.py:91`), so every forward raises TypeError —
pinned by `tests/test_local_transformer.py`. This port repairs that
intent (upstream lucidrains packs the head axis before the call) and
additionally honours `autopad` (upstream behavior; commented out in the
vendored copy, `local_attention.py:106-109,163-166`), so generation at
arbitrary lengths works. Parity is tested against a minimally repaired
reference module.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .local_attention import local_attention


class LocalMHA(nn.Module):
    """`transformer.py:34-77` — prenorm packed-QKV local attention block."""

    dim: int
    window_size: int
    dim_head: int = 64
    heads: int = 8
    causal: bool = False
    prenorm: bool = False
    exact_windowsize: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        assert self.causal, "only the causal configuration is ported (wrapper default)"
        B, N, _ = x.shape
        inner = self.dim_head * self.heads
        if self.prenorm:
            x = nn.LayerNorm(name="norm")(x)
        qkv = nn.Dense(3 * inner, use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_first(t):
            # 'b n (h d) -> (b h) n d'
            return t.reshape(B, N, self.heads, self.dim_head).transpose(0, 2, 1, 3) \
                    .reshape(B * self.heads, N, self.dim_head)

        q, k, v = map(heads_first, (q, k, v))

        # autopad (upstream `pad_to_multiple`): pad to a window multiple.
        # Under causal attention the pad tail sits in every real query's
        # future, so no synthetic mask is needed — synthesizing one would
        # also hide window-0's look-back pads, which the reference leaves
        # visible when the caller passes no mask (`local_attention.py:169`).
        pad = (-N) % self.window_size
        if pad:
            q, k, v = (jnp.pad(t, ((0, 0), (0, pad), (0, 0))) for t in (q, k, v))
            if mask is not None:
                mask = jnp.pad(mask, ((0, 0), (0, pad)), constant_values=False)

        out = local_attention(q, k, v, self.window_size, mask=mask,
                              heads=self.heads,
                              exact_windowsize=self.exact_windowsize)
        out = out[:, :N]
        # '(b h) n d -> b n (h d)'
        out = out.reshape(B, self.heads, N, self.dim_head).transpose(0, 2, 1, 3) \
                 .reshape(B, N, inner)
        return nn.Dense(self.dim, use_bias=False, name="to_out")(out)


class GEGLUFeedForward(nn.Module):
    """`transformer.py:80-94` — LayerNorm → Dense(2·inner) → x·gelu(gate) → Dense."""

    dim: int
    mult: int = 4

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        inner = int(self.dim * self.mult * 2 / 3)
        x = nn.LayerNorm(name="norm")(x)
        h = nn.Dense(inner * 2, use_bias=False, name="linear1")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * jax.nn.gelu(gate, approximate=False)
        return nn.Dense(self.dim, use_bias=False, name="linear2")(h)


class LocalTransformer(nn.Module):
    """`transformer.py:98-180`."""

    num_tokens: int
    max_seq_len: int
    dim: int
    depth: int
    causal: bool = True
    local_attn_window_size: int = 512
    dim_head: int = 64
    heads: int = 8
    ff_mult: int = 4
    ignore_index: int = -1

    @nn.compact
    def __call__(self, tokens: jax.Array, mask: Optional[jax.Array] = None,
                 return_loss: bool = False):
        if return_loss:
            tokens, labels = tokens[:, :-1], tokens[:, 1:]
            if mask is not None:
                # keep the mask aligned with the sliced input (the
                # vendored reference forgets this and crashes/misaligns
                # when a full-length mask meets the T-1 sequence)
                mask = mask[:, :-1]
        n = tokens.shape[1]
        assert n <= self.max_seq_len
        x = nn.Embed(self.num_tokens, self.dim, name="token_emb")(tokens)
        x = x + nn.Embed(self.max_seq_len, self.dim, name="pos_emb")(jnp.arange(n))
        for i in range(self.depth):
            x = LocalMHA(dim=self.dim, dim_head=self.dim_head, heads=self.heads,
                         causal=self.causal,
                         window_size=self.local_attn_window_size,
                         prenorm=True, name=f"attn_{i}")(x, mask=mask) + x
            x = GEGLUFeedForward(dim=self.dim, mult=self.ff_mult,
                                 name=f"ff_{i}")(x) + x
        x = nn.LayerNorm(name="to_logits_norm")(x)
        logits = nn.Dense(self.num_tokens, use_bias=False, name="to_logits")(x)
        if not return_loss:
            return logits
        return cross_entropy_ignore(logits, labels, self.ignore_index)


def cross_entropy_ignore(logits: jax.Array, labels: jax.Array,
                         ignore_index: int = -1) -> jax.Array:
    """torch `F.cross_entropy(..., ignore_index=)`: mean NLL over kept targets."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    keep = labels != ignore_index
    safe = jnp.where(keep, labels, 0)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * keep) / jnp.maximum(jnp.sum(keep), 1)


def top_k_filter(logits: jax.Array, thres: float = 0.9) -> jax.Array:
    """`transformer.py:25-30`: keep the top `(1-thres)·vocab` logits, -inf rest.

    Clamped to k ≥ 1: the reference's `int((1-thres)*vocab)` reaches 0 for
    small vocabularies, where its scatter leaves every logit -inf and
    sampling crashes — degrade to greedy instead."""
    k = max(1, int((1 - thres) * logits.shape[-1]))
    vals, _ = jax.lax.top_k(logits, k)
    kth = vals[..., -1:]
    return jnp.where(logits < kth, -jnp.inf, logits)


def generate(model: LocalTransformer, params, prime: jax.Array, seq_len: int,
             key: jax.Array, temperature: float = 1.0,
             filter_thres: float = 0.9) -> jax.Array:
    """Autoregressive top-k sampling (`transformer.py:133-157`): crop the
    context to `max_seq_len`, filter the last-position logits, sample,
    append; returns only the generated suffix."""
    n = prime.shape[1]
    out = prime
    # growing shapes would recompile a jitted step every iteration; this is a
    # vestigial surface, so run it eagerly
    step = partial(model.apply, params)
    for _ in range(seq_len):
        logits = step(out[:, -model.max_seq_len:])
        filtered = top_k_filter(logits[:, -1], thres=filter_thres)
        key, sub = jax.random.split(key)
        sampled = jax.random.categorical(sub, filtered / temperature, axis=-1)
        out = jnp.concatenate([out, sampled[:, None]], axis=-1)
    return out[:, n:]
