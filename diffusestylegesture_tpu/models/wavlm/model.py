"""WavLM speech encoder in Flax (Microsoft WavLM, Base and Large layouts).

Behavioral parity with the vendored reference
(`main/mydiffusion_zeggs/WavLM/WavLM.py` + `modules_WavLM.py`, duplicated
under `BEAT-TWH-main/process/WavLM/`):

  * 7-layer conv feature extractor, strides (5,2,2,2,2,2,2) → ~49.94 Hz
    (`WavLM.py:378-504`); "default" mode = GroupNorm(512, 512) after the
    first conv (per-channel instance norm), "layer_norm" mode = per-block
    LayerNorm (WavLM-Large). Exact (erf) GELU throughout.
  * feature LayerNorm + optional 512→D projection (`WavLM.py:341-348`).
  * convolutional positional embedding: depthwise-ish Conv1d
    (kernel 128, groups 16, pad 64) + SamePad trim + GELU
    (`WavLM.py:514-527`); the torch weight-norm reparameterization is
    folded into a plain kernel at conversion time.
  * transformer with T5-style bucketed relative position bias computed at
    layer 0 and shared across layers (`modules_WavLM.py:417-455`), each
    layer applying its own GRU-style gate
    `g_a·(g_b·a − 1) + 2` from its queries (`modules_WavLM.py:523-533`),
    pre-LN (Large) or post-LN (Base) residual blocks
    (`WavLM.py:615-742`).

The encoder is frozen on every reference live path, so inference-mode
(deterministic) computation is the contract; dropout args are kept for
completeness.
"""
from __future__ import annotations

import ast
import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


def _ln(x: jax.Array, name: str) -> jax.Array:
    """LayerNorm with f32 statistics, output cast back to the input dtype.

    Mixed-precision discipline (mirrors `models/mdm.py`'s trunk): matmuls
    run in `cfg.dtype` (bf16 halves the HBM weight traffic of this
    317 M-param encoder — the dominant cost of few-step serving), while
    normalization statistics accumulate in f32; bf16 mean/var over d=1024
    would otherwise compound over 24 layers. A no-op cast under the f32
    default, so converted-checkpoint parity is untouched.
    """
    out = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=name)(x)
    return out.astype(x.dtype)


@dataclasses.dataclass(frozen=True)
class WavLMConfig:
    extractor_mode: str = "layer_norm"  # Large; "default" for Base
    encoder_layers: int = 24
    encoder_embed_dim: int = 1024
    encoder_ffn_embed_dim: int = 4096
    encoder_attention_heads: int = 16
    activation_fn: str = "gelu"
    layer_norm_first: bool = True  # Large; False for Base
    conv_feature_layers: Tuple[Tuple[int, int, int], ...] = (
        (512, 10, 5), (512, 3, 2), (512, 3, 2), (512, 3, 2), (512, 3, 2),
        (512, 2, 2), (512, 2, 2),
    )
    conv_bias: bool = False
    normalize: bool = True  # Large input layer-norm; False for Base
    conv_pos: int = 128
    conv_pos_groups: int = 16
    relative_position_embedding: bool = True
    num_buckets: int = 320
    max_distance: int = 800
    gru_rel_pos: bool = True
    dtype: Any = jnp.float32

    @classmethod
    def base(cls, **kw) -> "WavLMConfig":
        d = dict(
            extractor_mode="default", encoder_layers=12, encoder_embed_dim=768,
            encoder_ffn_embed_dim=3072, encoder_attention_heads=12,
            layer_norm_first=False, normalize=False,
        )
        d.update(kw)
        return cls(**d)

    @classmethod
    def from_torch_cfg(cls, cfg: dict) -> "WavLMConfig":
        """Build from a checkpoint's stored cfg dict (`WavLM.py:213-217`)."""
        layers = cfg.get("conv_feature_layers", "[(512,10,5)] + [(512,3,2)] * 4 + [(512,2,2)] * 2")
        if isinstance(layers, str):
            layers = tuple(tuple(t) for t in _parse_conv_layers(layers))
        keep = {f.name for f in dataclasses.fields(cls)} - {"conv_feature_layers", "dtype"}
        kwargs = {k: v for k, v in cfg.items() if k in keep}
        return cls(conv_feature_layers=layers, **kwargs)


def _parse_conv_layers(spec: str):
    """Safely evaluate a fairseq conv-layer spec like
    ``"[(512,10,5)] + [(512,3,2)] * 4 + [(512,2,2)] * 2"``.

    The torch checkpoints store this as a Python expression string
    (`WavLM.py:170`); we evaluate only list/tuple/int literals combined
    with ``+`` (concat) and ``*`` (repeat) — never arbitrary code.
    """

    def ev(node):
        if isinstance(node, ast.Expression):
            return ev(node.body)
        if isinstance(node, ast.BinOp):
            left, right = ev(node.left), ev(node.right)
            if isinstance(node.op, ast.Add):
                return left + right
            if isinstance(node.op, ast.Mult):
                return left * right
            raise ValueError(f"unsupported operator in conv spec: {ast.dump(node.op)}")
        if isinstance(node, (ast.List, ast.Tuple)):
            elts = [ev(e) for e in node.elts]
            return elts if isinstance(node, ast.List) else tuple(elts)
        if isinstance(node, ast.Constant) and isinstance(node.value, int):
            return node.value
        raise ValueError(f"unsupported node in conv spec: {ast.dump(node)}")

    return ev(ast.parse(spec, mode="eval"))


class ConvFeatureExtractor(nn.Module):
    cfg: WavLMConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """(B, S) waveform → (B, T, 512) features (channel-last)."""
        cfg = self.cfg
        h = x[:, :, None]  # (B, S, 1) NWC
        for i, (dim, k, stride) in enumerate(cfg.conv_feature_layers):
            h = nn.Conv(
                dim, (k,), strides=(stride,), padding="VALID",
                use_bias=cfg.conv_bias, name=f"conv_{i}",
            )(h)
            if cfg.extractor_mode == "layer_norm":
                h = _ln(h, f"ln_{i}")
            elif cfg.extractor_mode == "default" and i == 0:
                # Fp32GroupNorm(dim, dim): per-channel normalization over time
                h32 = h.astype(jnp.float32)
                mean = jnp.mean(h32, axis=1, keepdims=True)
                var = jnp.var(h32, axis=1, keepdims=True)
                h = (h32 - mean) * jax.lax.rsqrt(var + 1e-5)
                scale = self.param("gn_scale", nn.initializers.ones, (dim,))
                bias = self.param("gn_bias", nn.initializers.zeros, (dim,))
                h = (h * scale + bias).astype(x.dtype)
            h = _gelu(h)
        return h


def relative_position_bucket(
    relative_position: jax.Array, num_buckets: int, max_distance: int
) -> jax.Array:
    """T5 bidirectional bucketing (parity: `modules_WavLM.py:417-442`)."""
    num_buckets = num_buckets // 2
    rel_buckets = (relative_position > 0).astype(jnp.int32) * num_buckets
    rp = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = rp < max_exact
    rp_large = max_exact + (
        jnp.log(rp.astype(jnp.float32) / max_exact)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    rp_large = jnp.minimum(rp_large, num_buckets - 1)
    return rel_buckets + jnp.where(is_small, rp, rp_large)


class GatedRelPosAttention(nn.Module):
    """Self-attention with (shared) rel-pos bias and per-layer GRU gating."""

    cfg: WavLMConfig
    has_relative_attention_bias: bool

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        position_bias: Optional[jax.Array],
        padding_mask: Optional[jax.Array] = None,
    ):
        cfg = self.cfg
        D = cfg.encoder_embed_dim
        H = cfg.encoder_attention_heads
        hd = D // H
        B, T, _ = x.shape

        if self.has_relative_attention_bias and position_bias is None:
            pos = jnp.arange(T)
            rel = pos[None, :] - pos[:, None]  # memory - context
            buckets = relative_position_bucket(rel, cfg.num_buckets, cfg.max_distance)
            table = self.param(
                "relative_attention_bias",
                nn.initializers.xavier_normal(),
                (cfg.num_buckets, H),
            )
            position_bias = table[buckets].transpose(2, 0, 1)  # (H, T, T)

        q = nn.Dense(D, name="q_proj")(x)
        k = nn.Dense(D, name="k_proj")(x)
        v = nn.Dense(D, name="v_proj")(x)
        qh = q.reshape(B, T, H, hd).transpose(0, 2, 1, 3)
        kh = k.reshape(B, T, H, hd).transpose(0, 2, 1, 3)
        vh = v.reshape(B, T, H, hd).transpose(0, 2, 1, 3)

        bias = None
        if position_bias is not None:
            bias = jnp.broadcast_to(position_bias[None], (B, H, T, T))
            if cfg.gru_rel_pos:
                # gate from raw queries (pre-scaling), `modules_WavLM.py:523-533`
                gates = nn.Dense(8, name="grep_linear")(qh)  # (B, H, T, 8)
                gates = jax.nn.sigmoid(gates.reshape(B, H, T, 2, 4).sum(-1))
                gate_a, gate_b = gates[..., 0:1], gates[..., 1:2]
                grep_a = self.param("grep_a", nn.initializers.ones, (1, H, 1, 1))
                gate = gate_a * (gate_b * grep_a - 1.0) + 2.0  # (B, H, T, 1)
                bias = gate * bias

        scale = hd**-0.5
        sim = jnp.einsum("bhid,bhjd->bhij", qh * scale, kh, preferred_element_type=jnp.float32)
        if bias is not None:
            sim = sim + bias
        if padding_mask is not None:
            sim = jnp.where(padding_mask[:, None, None, :], float(jnp.finfo(jnp.float32).min), sim)
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, vh, preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, D).astype(x.dtype)
        return nn.Dense(D, name="out_proj")(out), position_bias


class EncoderLayer(nn.Module):
    cfg: WavLMConfig
    has_relative_attention_bias: bool

    @nn.compact
    def __call__(self, x, position_bias, padding_mask=None):
        cfg = self.cfg
        attn = GatedRelPosAttention(
            cfg, self.has_relative_attention_bias, name="self_attn"
        )
        if cfg.layer_norm_first:
            h = _ln(x, "self_attn_layer_norm")
            h, position_bias = attn(h, position_bias, padding_mask)
            x = x + h
            h = _ln(x, "final_layer_norm")
            h = _gelu(nn.Dense(cfg.encoder_ffn_embed_dim, name="fc1")(h))
            h = nn.Dense(cfg.encoder_embed_dim, name="fc2")(h)
            x = x + h
        else:
            h, position_bias = attn(x, position_bias, padding_mask)
            x = _ln(x + h, "self_attn_layer_norm")
            h = _gelu(nn.Dense(cfg.encoder_ffn_embed_dim, name="fc1")(x))
            h = nn.Dense(cfg.encoder_embed_dim, name="fc2")(h)
            x = _ln(x + h, "final_layer_norm")
        return x, position_bias


class WavLM(nn.Module):
    """extract_features parity (`WavLM.py:323-375`), deterministic mode."""

    cfg: WavLMConfig

    @nn.compact
    def __call__(
        self,
        source: jax.Array,
        padding_mask: Optional[jax.Array] = None,
        output_layer: Optional[int] = None,
    ) -> jax.Array:
        cfg = self.cfg
        # NB: input wav normalization (cfg.normalize) is the ADAPTER's job:
        # the TWH adapter layer-norms the whole wav first
        # (`process_TWH_bvh.py:84-85`) while the ZEGGS adapter skips it
        # (`main/mydiffusion_zeggs/sample.py:44-48`, reference quirk kept).
        #
        # Compute-dtype discipline: activations are cast to cfg.dtype here,
        # so with bf16-cast params every conv/matmul runs on the MXU in
        # bf16 (f32 activations would silently promote bf16 params back to
        # f32 compute — the encoder is the dominant FLOPs of few-step
        # serving). LayerNorm statistics and softmax accumulation stay f32
        # (`_ln`, `preferred_element_type`); output is returned in
        # cfg.dtype and the denoiser casts as it pleases.
        source = source.astype(cfg.dtype)
        feats = ConvFeatureExtractor(cfg, name="feature_extractor")(source)
        feats = _ln(feats, "layer_norm")
        if feats.shape[-1] != cfg.encoder_embed_dim:
            feats = nn.Dense(cfg.encoder_embed_dim, name="post_extract_proj")(feats)

        # conv positional embedding (weight-norm folded at conversion)
        pad = cfg.conv_pos // 2
        pos = nn.Conv(
            cfg.encoder_embed_dim, (cfg.conv_pos,), padding=pad,
            feature_group_count=cfg.conv_pos_groups, name="pos_conv",
        )(feats)
        if cfg.conv_pos % 2 == 0:
            pos = pos[:, :-1]  # SamePad trim (`modules_WavLM.py:72-84`)
        x = feats + _gelu(pos)

        if not cfg.layer_norm_first:
            x = _ln(x, "encoder_layer_norm")

        position_bias = None
        n_layers = cfg.encoder_layers if output_layer is None else output_layer
        for i in range(cfg.encoder_layers):
            if i >= n_layers:
                break
            x, position_bias = EncoderLayer(
                cfg,
                has_relative_attention_bias=(cfg.relative_position_embedding and i == 0),
                name=f"layers_{i}",
            )(x, position_bias, padding_mask)

        if cfg.layer_norm_first and output_layer is None:
            x = _ln(x, "encoder_layer_norm")
        return x


def interpolate_linear(x: jax.Array, size: int) -> jax.Array:
    """torch F.interpolate(mode='linear', align_corners=True) over axis 1.

    Parity with the WavLM adapters (`main/mydiffusion_zeggs/sample.py:44-48`).
    x: (B, T, C) → (B, size, C).
    """
    B, T, C = x.shape
    if T == 1:
        return jnp.broadcast_to(x, (B, size, C))
    pos = jnp.linspace(0.0, T - 1.0, size)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, T - 2)
    # weights in x.dtype: an f32 linspace would promote a bf16 encoder
    # output back to f32 at the adapter boundary (and materialize the
    # (W, n_poses, 1024) feature buffer in f32 even in bf16 serving)
    w = (pos - lo.astype(pos.dtype))[None, :, None].astype(x.dtype)
    return x[:, lo] * (1 - w) + x[:, lo + 1] * w
