"""Tensor-parallel parameter sharding (Megatron-style) for the denoisers.

The reference has no TP (single GPU). Here the transformer trunk shards
over a `model` mesh axis with the classic column→row parallel pairing:

  * attention `in_proj` (packed QKV) and MLP `linear1` kernels shard on
    their OUTPUT dim (column-parallel, no comm on entry);
  * attention `out_proj` and MLP `linear2` kernels shard on their INPUT
    dim (row-parallel — XLA inserts the psum over ICI at their output);
  * everything else (embeddings, norms, heads) stays replicated.

No module changes are needed: shardings are expressed as a PartitionSpec
pytree over the existing parameter tree and applied with
`jax.device_put` / jit constraints — GSPMD propagates the rest.

Two attention-projection layouts are supported:

  * packed `in_proj` (the torch-parity default): output-sharding the
    (D, 3D) kernel gives contiguous chunks that straddle the Q/K/V block
    boundaries, so GSPMD must re-gather activations before attention —
    correct, but communication-heavy. Kept for checkpoints converted
    straight from torch.
  * split `q_proj`/`k_proj`/`v_proj` (`MDMConfig.split_qkv=True`):
    each (D, D) kernel column-shards HEAD-ALIGNED (requires
    num_heads % model_axis_size == 0), attention computes per-head
    local to its shard, and the row-parallel `out_proj` psum is the
    only attention collective — the textbook Megatron pairing. Convert
    existing packed params with `split_qkv_params` (inverse:
    `merge_qkv_params`); forward outputs are bit-identical.

For the small gesture denoisers TP remains about demonstrated
scale-out; DP is still the recommended layout at this parameter count
(measured batch-knee analysis in ROADMAP.md).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def mdm_param_specs(params: Any, model_axis: str = "model") -> Any:
    """PartitionSpec pytree for an MDM/MDMPlus param tree."""

    def spec_for(path, leaf):
        keys = [str(getattr(p, "key", "")) for p in path]
        joined = "/".join(keys)
        if "seqTransEncoder" in joined and leaf.ndim == 2:
            if ("in_proj" in joined or "linear1" in joined
                    or "q_proj" in joined or "k_proj" in joined
                    or "v_proj" in joined):
                return P(None, model_axis)  # column parallel
            if "out_proj" in joined or "linear2" in joined:
                return P(model_axis, None)  # row parallel
        if "seqTransEncoder" in joined and leaf.ndim == 1 and (
                "in_proj" in joined or "q_proj" in joined
                or "k_proj" in joined or "v_proj" in joined
                or "linear1" in joined):
            # column-parallel biases live on the sharded output dim
            return P(model_axis)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def wavlm_param_specs(params: Any, model_axis: str = "model") -> Any:
    """Megatron specs for the WavLM encoder (`models/wavlm/model.py`).

    Unlike the gesture denoisers, WavLM is where TP actually pays: the
    317 M-param Large encoder runs d=1024/4096 matmuls whose shards stay
    MXU-efficient. Its attention is already split q/k/v, so the classic
    pairing applies directly — q/k/v + fc1 column-parallel, out_proj +
    fc2 row-parallel (psum over ICI at their outputs). The per-head
    gated-rel-pos state (bias table (buckets, H), `grep_a` (1, H, 1, 1))
    shards on the HEAD dim so the bias math stays local to each head
    shard; requires encoder_attention_heads % tp == 0. Conv extractor,
    positional conv and norms replicate.
    """

    def spec_for(path, leaf):
        joined = "/".join(str(getattr(p, "key", "")) for p in path)
        if "layers_" not in joined:
            return P()
        if leaf.ndim == 2:
            if any(s in joined for s in ("q_proj", "k_proj", "v_proj", "fc1")):
                return P(None, model_axis)  # column parallel
            if "out_proj" in joined or "fc2" in joined:
                return P(model_axis, None)  # row parallel
            if "relative_attention_bias" in joined:
                return P(None, model_axis)  # (buckets, H) — head shard
        if leaf.ndim == 1 and any(
                s in joined for s in ("q_proj", "k_proj", "v_proj", "fc1")):
            return P(model_axis)
        if "grep_a" in joined and leaf.ndim == 4:
            return P(None, model_axis, None, None)  # (1, H, 1, 1)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def _convert_qkv(tree: Any, scope: str, to_split: bool) -> Any:
    """Shared traversal for the qkv layout converters. Handles not just
    param dicts but whole TrainStates: lists/tuples/namedtuples (optax
    chain states) and dataclasses (TrainState, ScaleByAdamState) are
    traversed too, so the AdamW moments — which mirror the param tree
    elementwise, making the split/merge exact on them — and EMA convert
    in one call."""
    import dataclasses as _dc

    def rec(node, in_scope):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                here = in_scope or scope in k
                if (to_split and here and isinstance(v, dict)
                        and isinstance(v.get("in_proj"), dict)):
                    v = dict(v)
                    ip = v.pop("in_proj")
                    kern = jnp.split(ip["kernel"], 3, axis=-1)
                    bias = jnp.split(ip["bias"], 3, axis=-1)
                    for name, kk, bb in zip(
                            ("q_proj", "k_proj", "v_proj"), kern, bias):
                        v[name] = {"kernel": kk, "bias": bb}
                    out[k] = {k2: rec(v2, True) for k2, v2 in v.items()}
                elif (not to_split and here and isinstance(v, dict)
                        and all(n in v for n in ("q_proj", "k_proj", "v_proj"))):
                    v = dict(v)
                    parts = [v.pop(n) for n in ("q_proj", "k_proj", "v_proj")]
                    v["in_proj"] = {
                        "kernel": jnp.concatenate(
                            [p["kernel"] for p in parts], axis=-1),
                        "bias": jnp.concatenate(
                            [p["bias"] for p in parts], axis=-1),
                    }
                    out[k] = {k2: rec(v2, True) for k2, v2 in v.items()}
                else:
                    out[k] = rec(v, here)
            return out
        if isinstance(node, (list, tuple)):
            vals = [rec(v, in_scope) for v in node]
            if hasattr(node, "_fields"):  # namedtuple (optax states)
                return type(node)(*vals)
            return type(node)(vals)
        if _dc.is_dataclass(node) and not isinstance(node, type):
            return _dc.replace(node, **{
                f.name: rec(getattr(node, f.name), in_scope)
                for f in _dc.fields(node)
            })
        return node

    return rec(tree, False)


def split_qkv_params(params: Any, scope: str = "seqTransEncoder") -> Any:
    """Packed-`in_proj` tree → split `q_proj`/`k_proj`/`v_proj` layout
    (for `MDMConfig.split_qkv=True`). Only attention dicts under a module
    whose name contains `scope` are converted — the local attention /
    WavLM / decoder params are untouched. Pure tree op, no numerics: flax
    Dense kernels are (in, out), so the packed (D, 3D) kernel splits into
    three (D, D) kernels along the output dim. Accepts a bare param dict
    OR a whole TrainState (optimizer moments and EMA convert too —
    elementwise state, so the relayout is exact)."""
    return _convert_qkv(params, scope, to_split=True)


def merge_qkv_params(params: Any, scope: str = "seqTransEncoder") -> Any:
    """Inverse of `split_qkv_params`: back to the torch-packed layout
    (e.g. to save a checkpoint loadable by the parity converters)."""
    return _convert_qkv(params, scope, to_split=False)


def shard_params(mesh: Mesh, params: Any, specs: Any) -> Any:
    return jax.tree.map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), params, specs
    )


def shard_train_state(mesh: Mesh, state: Any, specs: Any) -> Any:
    """Apply param PartitionSpecs to EVERY params-shaped subtree of a
    TrainState: `params`, `ema_params`, and the optimizer moments (AdamW
    mu/nu mirror the param tree inside the optax state). Without this the
    optimizer state stays replicated — 2× param memory per device, and a
    sharding mismatch on the first donated step forces a recompile.

    `specs` is the spec pytree for `state.params` (same structure).
    """
    params_struct = jax.tree.structure(state.params)

    def shard_like_params(tree):
        return shard_params(mesh, tree, specs)

    def rec(node):
        try:
            if jax.tree.structure(node) == params_struct:
                return shard_like_params(node)
        except Exception:
            pass
        if isinstance(node, dict):
            return {k: rec(v) for k, v in node.items()}
        if isinstance(node, tuple):
            vals = [rec(v) for v in node]
            # namedtuples (optax states) rebuild from positional fields
            return type(node)(*vals) if hasattr(node, "_fields") else tuple(vals)
        if isinstance(node, list):
            return [rec(v) for v in node]
        return node

    new_params = shard_like_params(state.params)
    new_ema = None if state.ema_params is None else shard_like_params(state.ema_params)
    new_opt = rec(state.opt_state)
    return state.replace(params=new_params, ema_params=new_ema, opt_state=new_opt)
