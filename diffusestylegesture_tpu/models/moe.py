"""Mixture-of-Experts feed-forward with expert parallelism (GShard/Switch).

The reference's denoiser trunk uses a dense FFN inside
`nn.TransformerEncoderLayer` (`main/model/mdm.py:77-86`) and has no
model scaling story at all (`SURVEY §2.4`). This module adds the
TPU-native sparse-FFN alternative as beyond-parity scaling scaffolding:
Switch-style top-1 routing with fixed expert capacity and fully static
shapes — tokens scatter into `(E, C, D)` expert buffers and gather back
by `(expert, slot)` index, so dispatch memory is `O(E·C·D + G·E)`, NOT
the `O(G·E·C) = O(G²)` of the one-hot dispatch-einsum formulation
(which at the flagship train batch of G=26 400 tokens would materialize
~5.6 GB per layer). The expert compute stays stacked einsums over
`[E, ...]` weights sharded on an `expert` mesh axis; GSPMD partitions
the scatter/gather. No dynamic shapes, no host routing.

Router follows Switch Transformer: top-1 expert, output scaled by the
router probability (keeps the router differentiable), tokens over
capacity dropped (they keep their residual-path value), load-balance
auxiliary loss `E * Σ_e f_e · p_e` sown into the `losses` collection
for the train step to pick up.
"""
from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


class MoEFeedForward(nn.Module):
    """Drop-in FFN block: (B, T, D) → (B, T, D) via E routed experts."""

    d_model: int
    d_ff: int
    num_experts: int
    capacity_factor: float = 2.0
    activation: Any = None  # callable; default exact gelu
    dropout: float = 0.0  # FFN-internal, mirrors the dense act→Dropout→Dense

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        D, F, E = self.d_model, self.d_ff, self.num_experts
        act = self.activation or (lambda h: nn.gelu(h, approximate=False))
        B, T, _ = x.shape
        G = B * T
        # static capacity: tokens per expert the dispatch tensor can hold
        C = max(1, int(math.ceil(G / E * self.capacity_factor)))

        xf = x.reshape(G, D)
        # routing in f32 regardless of trunk compute dtype
        logits = nn.Dense(E, name="router")(xf.astype(jnp.float32))
        probs = jax.nn.softmax(logits, axis=-1)  # (G, E)
        expert = jnp.argmax(probs, axis=-1)
        gate = jnp.max(probs, axis=-1)  # top-1 prob, scales the output
        mask = jax.nn.one_hot(expert, E, dtype=jnp.float32)  # (G, E)

        # position of each token within its expert's buffer; over-capacity
        # tokens are dropped (keep their residual value downstream)
        pos = jnp.cumsum(mask, axis=0) * mask - mask  # (G, E), 0-based
        slot = jnp.sum(pos * mask, axis=-1).astype(jnp.int32)  # (G,)
        keep = (slot < C).astype(jnp.float32)  # (G,)
        slot = jnp.clip(slot, 0, C - 1)

        # load-balance aux loss (Switch eq. 4): E · Σ_e f_e · p_e, minimized
        # at uniform routing. Sown for the caller; harmless if unread.
        f_e = jnp.mean(mask, axis=0)
        p_e = jnp.mean(probs, axis=0)
        self.sow("losses", "moe_aux", E * jnp.sum(f_e * p_e))

        w1 = self.param(
            "w1", nn.initializers.lecun_normal(), (E, D, F), jnp.float32)
        b1 = self.param("b1", nn.initializers.zeros, (E, F), jnp.float32)
        w2 = self.param(
            "w2", nn.initializers.lecun_normal(), (E, F, D), jnp.float32)
        b2 = self.param("b2", nn.initializers.zeros, (E, D), jnp.float32)

        cdt = x.dtype
        # dispatch: scatter tokens into (E, C, D) expert buffers. Each
        # (e, c) slot receives at most one token (slot is a per-expert
        # running count), so scatter-add is exact, and its gradient is the
        # gather used below (and vice versa) — fully differentiable.
        xin = jnp.zeros((E, C, D), cdt).at[expert, slot].add(
            xf.astype(cdt) * keep[:, None].astype(cdt))
        h = act(jnp.einsum(
            "ecd,edf->ecf", xin, w1.astype(cdt),
            preferred_element_type=jnp.float32).astype(cdt) + b1[:, None, :].astype(cdt))
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        y = jnp.einsum(
            "ecf,efd->ecd", h, w2.astype(cdt),
            preferred_element_type=jnp.float32).astype(cdt) + b2[:, None, :].astype(cdt)
        # combine: gather each token's expert output, scaled by its router
        # probability; dropped tokens contribute zero (residual passthrough)
        out = y[expert, slot] * (gate * keep)[:, None].astype(cdt)
        return out.reshape(B, T, D)


def make_moe_apply(model) -> Any:
    """Wrap `model.apply` to surface the sown MoE aux losses.

    Returns an apply fn with the train-step signature whose TRAIN-mode
    result is `(prediction, mean_aux)` — the tuple convention
    `train.state.make_train_step` recognizes when
    `TrainConfig.moe_aux_weight > 0`. Eval-mode calls return the bare
    prediction (samplers/engines are unchanged).
    """
    import jax.numpy as jnp

    def apply(params, x, t, cond, train=False, rngs=None, uncond=None):
        if isinstance(params, dict) and "params" in params:
            # drop any sown collections captured at init (model.init
            # returns a stale 'losses' entry): passing it back through
            # apply(mutable=['losses']) would seed the fresh sow with the
            # stale scalar — a differentiable input the optimizer then
            # drives down, contaminating the aux loss and its metric
            params = {"params": params["params"]}
        if not train:
            return model.apply(params, x, t, cond, train=train, rngs=rngs,
                               uncond=uncond)
        out, mut = model.apply(params, x, t, cond, train=train, rngs=rngs,
                               uncond=uncond, mutable=["losses"])
        leaves = jax.tree.leaves(mut)
        aux = (sum(jnp.asarray(l).mean() for l in leaves) / len(leaves)
               if leaves else jnp.zeros(()))
        return out, aux

    return apply


def moe_param_specs(params: Any, axis: str = "expert") -> Any:
    """PartitionSpecs sharding every MoE expert stack's leading E dim
    over `axis`; router and non-MoE leaves replicated.

    Apply to a param tree containing `MoEFeedForward` submodules (their
    scope name contains 'moe'); compose with `fsdp_param_specs` /
    `mdm_param_specs` via their `base_specs` hook.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_keys(path):
        # keystr-quality identity per entry: DictKey/GetAttrKey have .key/
        # .name, SequenceKey has .idx — getattr(p, 'key', '') alone would
        # stringify every list index to '' and collapse distinct paths
        return tuple(
            str(getattr(p, "key", getattr(p, "name", getattr(p, "idx", p))))
            for p in path)

    # an MoE module is recognized structurally: a subtree holding both a
    # `router` child and the stacked expert leaves w1/b1/w2/b2
    moe_parents = {
        path_keys(path)[:-2] for path, _ in flat
        if len(path) >= 2 and path_keys(path)[-2] == "router"
    }
    leaves = []
    for path, _ in flat:
        keys = path_keys(path)
        expertish = keys[-1] in ("w1", "b1", "w2", "b2") and keys[:-1] in moe_parents
        leaves.append(P(axis) if expertish else P())
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params), leaves)
