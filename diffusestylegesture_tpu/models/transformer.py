"""Post-LN transformer encoder with torch-1.9 weight semantics.

The reference denoisers run their trunk through
``nn.TransformerEncoder(nn.TransformerEncoderLayer(...))``
(`main/model/mdm.py:77-86`): post-norm residual blocks with a packed-QKV
`nn.MultiheadAttention`. This module reproduces that computation in Flax
with a parameter layout chosen so a torch checkpoint maps 1:1
(`in_proj` packed as one (3D, D) matrix, `out_proj`, `linear1/2`,
`norm1/2`) — see `models/convert.py` for the mapping.

Batch-first (B, T, D) layout; attention runs in f32 accumulations on the
MXU via `preferred_element_type`.
"""
from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class TorchMultiheadAttention(nn.Module):
    """`nn.MultiheadAttention` parity: packed in-proj, out-proj.

    ``split_qkv=True`` stores the projection as three separate
    ``q_proj``/``k_proj``/``v_proj`` (D, D) kernels instead of the packed
    (D, 3D) ``in_proj`` — the SAME computation (convert checkpoints with
    `parallel.tp.split_qkv_params` / `merge_qkv_params`), but each kernel
    column-shards head-aligned under tensor parallelism, which the packed
    layout cannot (a contiguous chunk of the 3D output dim straddles the
    Q/K/V block boundaries, forcing GSPMD to re-gather activations before
    attention)."""

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    split_qkv: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True,
                 attn_mask: Optional[jax.Array] = None,
                 kv: Optional[jax.Array] = None) -> jax.Array:
        """Self-attention over `x`, or cross-attention to `kv` when given
        (torch semantics: one packed (3D, D) in-proj whose q rows hit the
        query input and k/v rows the key/value input)."""
        D, H = self.embed_dim, self.num_heads
        head_dim = D // H
        if self.split_qkv:
            q = nn.Dense(D, name="q_proj")(x)
            k = nn.Dense(D, name="k_proj")(x if kv is None else kv)
            v = nn.Dense(D, name="v_proj")(x if kv is None else kv)
        elif kv is None:
            in_proj = nn.Dense(3 * D, name="in_proj")
            q, k, v = jnp.split(in_proj(x), 3, axis=-1)
        else:
            # packed (3D, D) projection, but only the needed thirds are
            # computed: q rows on the query input, k/v rows on kv —
            # projecting both inputs fully would double the FLOPs
            in_proj = nn.Dense(3 * D, name="in_proj")
            W = in_proj.variables["params"]["kernel"] if in_proj.has_variable(
                "params", "kernel") else None
            if W is None:  # during init, materialize the params once
                in_proj(x)
                W = in_proj.variables["params"]["kernel"]
            b = in_proj.variables["params"]["bias"]
            q = x @ W[:, :D] + b[:D]
            kvp = kv @ W[:, D:] + b[D:]
            k, v = jnp.split(kvp, 2, axis=-1)

        B, T, _ = q.shape
        S = k.shape[1]
        q = q.reshape(B, T, H, head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(B, S, H, head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(B, S, H, head_dim).transpose(0, 2, 1, 3)

        scale = head_dim**-0.5
        sim = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32) * scale
        if attn_mask is not None:
            # torch nn.MultiheadAttention semantics: a BOOL mask marks
            # positions to EXCLUDE (True = masked); a float mask is an
            # ADDITIVE bias (e.g. TISA positional scores)
            if attn_mask.dtype == jnp.bool_:
                sim = jnp.where(attn_mask, float(jnp.finfo(jnp.float32).min), sim)
            else:
                sim = sim + attn_mask
        attn = jax.nn.softmax(sim, axis=-1)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v, preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, D).astype(x.dtype)
        return nn.Dense(D, name="out_proj")(out)


def _activation(name: str) -> Callable:
    """torch F.gelu is the exact (erf) form; flax's default is tanh-approx.
    'gelu_tanh' is a serving-speed option: on v5e the erf polynomial is
    ~30% of the whole trunk time at d=256 shapes (scripts/
    trunk_microprobe.py); the tanh form differs by <2e-3 on unit-scale
    activations and is gated by an on-device output-tolerance check in
    bench.py before it is ever reported."""
    return {
        "gelu": lambda x: nn.gelu(x, approximate=False),
        "gelu_tanh": lambda x: nn.gelu(x, approximate=True),
        "relu": nn.relu,
    }[name]


class TorchEncoderLayer(nn.Module):
    """torch-1.9 `nn.TransformerEncoderLayer` (post-norm) parity.

    ``moe_experts > 0`` swaps the dense FFN for a Switch-routed
    mixture-of-experts block (`models/moe.py`) — a beyond-parity scaling
    option; checkpoints are layout-compatible only within the same
    setting."""

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "gelu"
    split_qkv: bool = False
    moe_experts: int = 0
    moe_capacity_factor: float = 2.0

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True,
                 attn_mask: Optional[jax.Array] = None) -> jax.Array:
        # `deterministic` is positional so nn.remat can mark it static
        # (argnum 2 counting self) — as a traced kwarg it breaks
        # rematerialized training (TracerBoolConversionError)
        act = _activation(self.activation)
        attn_out = TorchMultiheadAttention(
            self.d_model, self.nhead, self.dropout, self.split_qkv,
            name="self_attn"
        )(x, deterministic=deterministic, attn_mask=attn_mask)
        x = x + nn.Dropout(self.dropout)(attn_out, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)

        if self.moe_experts > 0:
            from .moe import MoEFeedForward

            h = MoEFeedForward(
                self.d_model, self.dim_feedforward, self.moe_experts,
                self.moe_capacity_factor, act, self.dropout,
                name="moe")(x, deterministic=deterministic)
        else:
            h = nn.Dense(self.dim_feedforward, name="linear1")(x)
            h = act(h)
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
            h = nn.Dense(self.d_model, name="linear2")(h)
        x = x + nn.Dropout(self.dropout)(h, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        return x


class TorchDecoderLayer(nn.Module):
    """torch-1.9 `nn.TransformerDecoderLayer` (post-norm) parity:
    self-attn → cross-attn(memory) → FFN, each residual + LayerNorm."""

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "gelu"

    @nn.compact
    def __call__(self, x: jax.Array, memory: jax.Array, *,
                 deterministic: bool = True) -> jax.Array:
        act = _activation(self.activation)
        sa = TorchMultiheadAttention(
            self.d_model, self.nhead, self.dropout, name="self_attn"
        )(x, deterministic=deterministic)
        x = x + nn.Dropout(self.dropout)(sa, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)

        ca = TorchMultiheadAttention(
            self.d_model, self.nhead, self.dropout, name="multihead_attn"
        )(x, deterministic=deterministic, kv=memory)
        x = x + nn.Dropout(self.dropout)(ca, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)

        h = nn.Dense(self.dim_feedforward, name="linear1")(x)
        h = act(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.d_model, name="linear2")(h)
        x = x + nn.Dropout(self.dropout)(h, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="norm3")(x)
        return x


class TorchTransformerDecoder(nn.Module):
    """Stack of `TorchDecoderLayer`s (no final norm, torch default)."""

    num_layers: int
    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "gelu"

    @nn.compact
    def __call__(self, x: jax.Array, memory: jax.Array, *,
                 deterministic: bool = True) -> jax.Array:
        for i in range(self.num_layers):
            x = TorchDecoderLayer(
                self.d_model,
                self.nhead,
                self.dim_feedforward,
                self.dropout,
                self.activation,
                name=f"layers_{i}",
            )(x, memory, deterministic=deterministic)
        return x


def encoder_trunk(parent: nn.Module, cfg, seq: jax.Array, train: bool,
                  name: str = "seqTransEncoder") -> jax.Array:
    """Build/apply the MDM/MDMPlus trunk, dispatching on cfg.trunk_impl.

    "loop" runs the sequential `TorchTransformerEncoder`; "pipeline"
    routes the SAME named-layer params through the GPipe schedule
    (`parallel/pipeline.py` — layers stacked at apply time, sharded over
    cfg.pipe_axis of cfg.pipe_mesh). Init always runs the sequential
    encoder so the param tree / checkpoint layout is impl-independent.
    Called from inside the parent's @nn.compact __call__ (submodules
    register with the parent). NB under the pipelined trunk the MoE aux
    loss is not sown (layers apply outside the parent's scope).
    """
    enc = TorchTransformerEncoder(
        num_layers=cfg.num_layers,
        d_model=cfg.latent_dim,
        nhead=cfg.num_heads,
        dim_feedforward=cfg.ff_size,
        dropout=cfg.dropout,
        activation=cfg.activation,
        remat=cfg.remat,
        split_qkv=cfg.split_qkv,
        moe_experts=cfg.moe_experts,
        moe_capacity_factor=cfg.moe_capacity_factor,
        name=name,
    )
    if cfg.trunk_impl == "pipeline" and not parent.is_initializing():
        from ..parallel.pipeline import pipeline_apply, stack_layer_params

        enc_params = parent.variables["params"][name]
        stacked = stack_layer_params(enc_params, cfg.num_layers)
        layer = TorchEncoderLayer(
            cfg.latent_dim, cfg.num_heads, cfg.ff_size, cfg.dropout,
            cfg.activation, cfg.split_qkv, cfg.moe_experts,
            cfg.moe_capacity_factor)

        def layer_fn(lp, h, key):
            det = key is None

            def body(lp_, h_, key_):
                rngs = None if key_ is None else {"dropout": key_}
                return layer.apply({"params": lp_}, h_, det, rngs=rngs)

            if cfg.remat:
                # honor cfg.remat on the pipelined trunk too (the loop
                # trunk uses nn.remat) — without this, enabling --pp
                # silently disabled rematerialization exactly where
                # activation memory matters most
                body = jax.checkpoint(body)
            return body(lp, h, key)

        rng = (parent.make_rng("dropout")
               if train and cfg.dropout > 0 else None)
        return pipeline_apply(
            stacked, seq, layer_fn, cfg.pipe_mesh, axis=cfg.pipe_axis,
            num_microbatches=cfg.pipe_microbatches or None, rng=rng)
    return enc(seq, deterministic=not train)


class TorchTransformerEncoder(nn.Module):
    """Stack of `TorchEncoderLayer`s (no final norm, matching the ref)."""

    num_layers: int
    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "gelu"
    remat: bool = False
    split_qkv: bool = False
    moe_experts: int = 0
    moe_capacity_factor: float = 2.0

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True,
                 attn_mask: Optional[jax.Array] = None) -> jax.Array:
        layer_cls = TorchEncoderLayer
        if self.remat:
            # static_argnums counts (self=0, x=1, deterministic=2)
            layer_cls = nn.remat(TorchEncoderLayer, static_argnums=(2,))
        for i in range(self.num_layers):
            x = layer_cls(
                self.d_model,
                self.nhead,
                self.dim_feedforward,
                self.dropout,
                self.activation,
                self.split_qkv,
                self.moe_experts,
                self.moe_capacity_factor,
                name=f"layers_{i}",
            )(x, deterministic, attn_mask=attn_mask)
        return x
