"""CLIP text encoder (MDM-legacy text-to-motion conditioning).

The reference's MDM-legacy pipeline conditions on CLIP ViT-B/32 text
features (`main/model/mdm.py:13` declares `clip_dim=512`; the actual
`clip_model` encode path was stripped from the gesture fork, and
`load_model_wo_clip` (`main/utils/model_util.py:8-12`) drops `clip_model.*`
weights at load time).  This module supplies that capability TPU-natively:
the OpenAI CLIP text transformer in Flax plus a converter from a
HuggingFace `CLIPTextModelWithProjection` state dict (the public
distribution format of the same weights).

Semantics follow OpenAI CLIP `encode_text`:
  token embedding + learned positions → 12 pre-LN causal transformer
  blocks (quick_gelu MLP) → final LayerNorm → take the hidden state at
  `argmax(input_ids)` (the EOT token has the highest id in CLIP's vocab)
  → linear projection without bias.

Tokenization needs CLIP's BPE vocab artifact; pass pre-tokenized
`input_ids` (from `transformers.CLIPTokenizer` or `clip.tokenize`) — no
vocab file ships here.
"""
from __future__ import annotations

import dataclasses
from typing import Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ClipTextConfig:
    vocab_size: int = 49408
    width: int = 512          # hidden size
    layers: int = 12
    heads: int = 8
    context_length: int = 77
    projection_dim: int = 512


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


class ClipAttention(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x: jax.Array, causal_mask: jax.Array) -> jax.Array:
        head_dim = self.width // self.heads
        b, t, _ = x.shape
        q = nn.Dense(self.width, name="q_proj")(x)
        k = nn.Dense(self.width, name="k_proj")(x)
        v = nn.Dense(self.width, name="v_proj")(x)
        q = q.reshape(b, t, self.heads, head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, self.heads, head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, self.heads, head_dim).transpose(0, 2, 1, 3)
        scores = (q @ k.transpose(0, 1, 3, 2)) / np.sqrt(head_dim)
        scores = jnp.where(causal_mask, scores, -jnp.inf)
        probs = jax.nn.softmax(scores, axis=-1)
        out = (probs @ v).transpose(0, 2, 1, 3).reshape(b, t, self.width)
        return nn.Dense(self.width, name="out_proj")(out)


class ClipBlock(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x: jax.Array, causal_mask: jax.Array) -> jax.Array:
        x = x + ClipAttention(self.width, self.heads, name="attn")(
            nn.LayerNorm(epsilon=1e-5, name="ln_1")(x), causal_mask)
        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        h = nn.Dense(4 * self.width, name="mlp_fc1")(h)
        h = quick_gelu(h)
        return x + nn.Dense(self.width, name="mlp_fc2")(h)


class ClipTextEncoder(nn.Module):
    config: ClipTextConfig = ClipTextConfig()

    @nn.compact
    def __call__(self, input_ids: jax.Array) -> jax.Array:
        """(B, T) token ids -> (B, projection_dim) text embeddings."""
        cfg = self.config
        tok = self.param(
            "token_embedding", nn.initializers.normal(0.02),
            (cfg.vocab_size, cfg.width))
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.01),
            (cfg.context_length, cfg.width))
        t = input_ids.shape[1]
        x = tok[input_ids] + pos[:t]
        mask = jnp.tril(jnp.ones((t, t), bool))[None, None]
        for i in range(cfg.layers):
            x = ClipBlock(cfg.width, cfg.heads, name=f"block{i}")(x, mask)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)
        eot = jnp.argmax(input_ids, axis=-1)
        pooled = x[jnp.arange(x.shape[0]), eot]
        return nn.Dense(cfg.projection_dim, use_bias=False,
                        name="text_projection")(pooled)


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def _dense(sd: Mapping, prefix: str, bias: bool = True) -> dict:
    out = {"kernel": _t(sd[f"{prefix}.weight"]).T}
    if bias:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def _ln(sd: Mapping, prefix: str) -> dict:
    return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}


def convert_hf_clip_text(sd: Mapping, layers: int = 12) -> dict:
    """HuggingFace `CLIPTextModelWithProjection.state_dict()` -> params."""
    base = "text_model"
    params = {
        "token_embedding": _t(sd[f"{base}.embeddings.token_embedding.weight"]),
        "position_embedding": _t(sd[f"{base}.embeddings.position_embedding.weight"]),
        "ln_final": _ln(sd, f"{base}.final_layer_norm"),
        "text_projection": {"kernel": _t(sd["text_projection.weight"]).T},
    }
    for i in range(layers):
        lp = f"{base}.encoder.layers.{i}"
        params[f"block{i}"] = {
            "ln_1": _ln(sd, f"{lp}.layer_norm1"),
            "ln_2": _ln(sd, f"{lp}.layer_norm2"),
            "attn": {
                "q_proj": _dense(sd, f"{lp}.self_attn.q_proj"),
                "k_proj": _dense(sd, f"{lp}.self_attn.k_proj"),
                "v_proj": _dense(sd, f"{lp}.self_attn.v_proj"),
                "out_proj": _dense(sd, f"{lp}.self_attn.out_proj"),
            },
            "mlp_fc1": _dense(sd, f"{lp}.mlp.fc1"),
            "mlp_fc2": _dense(sd, f"{lp}.mlp.fc2"),
        }
    return params


def convert_openai_clip_text(sd: Mapping, layers: int = 12) -> dict:
    """OpenAI `clip` checkpoint state dict (the format `clip.load` returns,
    with fused `in_proj_weight`) -> params. Covers users converting the
    original `ViT-B/32` file the reference's MDM-legacy path downloads."""
    params = {
        "token_embedding": _t(sd["token_embedding.weight"]),
        "position_embedding": _t(sd["positional_embedding"]),
        "ln_final": _ln(sd, "ln_final"),
        "text_projection": {"kernel": _t(sd["text_projection"])},
    }
    for i in range(layers):
        lp = f"transformer.resblocks.{i}"
        in_w = _t(sd[f"{lp}.attn.in_proj_weight"])
        in_b = _t(sd[f"{lp}.attn.in_proj_bias"])
        qw, kw, vw = np.split(in_w, 3, axis=0)
        qb, kb, vb = np.split(in_b, 3, axis=0)
        params[f"block{i}"] = {
            "ln_1": _ln(sd, f"{lp}.ln_1"),
            "ln_2": _ln(sd, f"{lp}.ln_2"),
            "attn": {
                "q_proj": {"kernel": qw.T, "bias": qb},
                "k_proj": {"kernel": kw.T, "bias": kb},
                "v_proj": {"kernel": vw.T, "bias": vb},
                "out_proj": _dense(sd, f"{lp}.attn.out_proj"),
            },
            "mlp_fc1": _dense(sd, f"{lp}.mlp.c_fc"),
            "mlp_fc2": _dense(sd, f"{lp}.mlp.c_proj"),
        }
    return params


def encode_text(params: dict, input_ids, config: ClipTextConfig = ClipTextConfig()):
    """Functional wrapper: tokens -> normalized-scale text features."""
    return ClipTextEncoder(config).apply({"params": params},
                                         jnp.asarray(input_ids))


SOT_TOKEN = 49406  # CLIP '<|startoftext|>'
EOT_TOKEN = 49407  # '<|endoftext|>' — the max vocab id, so argmax finds it


def hash_tokenize(texts, context_length: int = 77,
                  vocab_size: int = 49408) -> np.ndarray:
    """Deterministic word-hash tokenizer — the BPE-free stand-in used
    when CLIP's `bpe_simple_vocab_16e6` artifact is unavailable (it ships
    with neither this repo nor the reference; `clip.tokenize` downloads
    it). Layout matches `clip.tokenize`: [SOT, ids..., EOT, 0-pad] with
    EOT at the highest vocab id so the encoder's argmax pooling
    (`ClipTextEncoder.__call__`) lands on it. NOT CLIP-vocab-compatible —
    pair it with a consistently trained (toy or from-scratch) encoder,
    never with converted OpenAI/HF weights; for those, tokenize with
    `transformers.CLIPTokenizer` and pass the ids straight to
    `encode_text`."""
    import zlib

    sot, eot = vocab_size - 2, vocab_size - 1  # = SOT/EOT_TOKEN at 49408
    out = np.zeros((len(texts), context_length), np.int32)
    for i, text in enumerate(texts):
        words = text.lower().replace(".", " ").replace(",", " ").split()
        ids = [1 + zlib.crc32(w.encode()) % (vocab_size - 3) for w in words]
        ids = [sot] + ids[: context_length - 2] + [eot]
        out[i, : len(ids)] = ids
    return out


def make_caption_encoder(params_path: str | None = None, *, seed: int = 0,
                         width: int = 512, layers: int = 12, heads: int = 8,
                         vocab_size: int = 49408, projection_dim: int = 512,
                         context_length: int = 77, tokenizer_dir: str | None = None):
    """Build a `captions -> (N, projection_dim) np.ndarray` callable plus
    the JSON-serializable spec that reconstructs it bit-identically.

    The reference treats CLIP as an external frozen artifact
    (`load_model_wo_clip` strips it from checkpoints) — here the encoder
    is likewise NOT part of the denoiser checkpoint; `cli.train_t2m`
    records this spec in `t2m_config.json` and `cli.generate` rebuilds
    the identical encoder from it.

    params_path: npz of converted HF/OpenAI CLIP text weights
      (`convert_hf_clip_text` / `convert_openai_clip_text`, saved via
      `np.savez` of the flattened tree) — requires a real tokenizer in
      `tokenizer_dir` (`transformers.CLIPTokenizer`).
    Without params_path: a frozen deterministically-initialized encoder
      (PRNGKey(seed)) with `hash_tokenize` — self-consistent between
      training and generation, for toy/from-scratch models.
    """
    cfg = ClipTextConfig(vocab_size=vocab_size, width=width, layers=layers,
                         heads=heads, context_length=context_length,
                         projection_dim=projection_dim)
    enc = ClipTextEncoder(cfg)
    if params_path:
        from ..train.checkpoint import load_params_npz

        params = load_params_npz(params_path)
        if "params" in params:
            params = params["params"]
    else:
        params = enc.init(
            jax.random.PRNGKey(seed),
            jnp.zeros((1, context_length), jnp.int32))["params"]

    if tokenizer_dir:
        from transformers import CLIPTokenizer

        tok = CLIPTokenizer.from_pretrained(tokenizer_dir)

        def tokenize(texts):
            return np.asarray(
                tok(list(texts), padding="max_length", truncation=True,
                    max_length=context_length)["input_ids"], np.int32)
    else:
        def tokenize(texts):
            return hash_tokenize(texts, context_length, vocab_size)

    apply = jax.jit(lambda ids: enc.apply({"params": params}, ids))

    def encode(texts) -> np.ndarray:
        return np.asarray(apply(jnp.asarray(tokenize(list(texts)))))

    spec = {"params_path": params_path, "seed": seed, "width": width,
            "layers": layers, "heads": heads, "vocab_size": vocab_size,
            "projection_dim": projection_dim,
            "context_length": context_length, "tokenizer_dir": tokenizer_dir}
    return encode, spec
