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

NB: `in_proj` packs Q|K|V along the output dim, so output-sharding it
splits each of Q, K, V only when num_heads % model_axis == 0 holds per
packed block; with packed layout the per-shard blocks mix Q/K/V rows but
the math stays correct because attention heads are data-local under
GSPMD propagation (XLA re-shards as needed). For the small gesture
denoisers TP is about demonstrated scale-out; DP remains the recommended
layout at this parameter count.
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def mdm_param_specs(params: Any, model_axis: str = "model") -> Any:
    """PartitionSpec pytree for an MDM/MDMPlus param tree."""

    def spec_for(path, leaf):
        keys = [str(getattr(p, "key", "")) for p in path]
        joined = "/".join(keys)
        if "seqTransEncoder" in joined and leaf.ndim == 2:
            if "in_proj" in joined or "linear1" in joined:
                return P(None, model_axis)  # column parallel
            if "out_proj" in joined or "linear2" in joined:
                return P(model_axis, None)  # row parallel
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


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
        return jax.tree.map(
            lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), tree, specs
        )

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
