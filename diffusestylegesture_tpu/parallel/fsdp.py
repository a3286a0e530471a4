"""Fully-sharded data parallelism (ZeRO-3 style) via GSPMD.

The reference trains single-GPU with replicated state everywhere
(`main/train/training_loop.py:100-101` keeps the DDP scaffolding dead);
here optimizer+parameter sharding is a first-class mesh layout. The
TPU-native construction needs no hand-written gather/scatter: shard every
large parameter leaf along the `data` mesh axis and let XLA insert the
all-gather before each layer's matmul and the reduce-scatter behind the
gradient — exactly the ZeRO-3 schedule, derived by the compiler from the
sharding annotations (scaling-book recipe: annotate, don't orchestrate).

Per-device memory for params + AdamW moments + EMA drops ~Nx on an
N-way `data` axis; compute and the loss are unchanged (equality-tested
against plain DP in `tests/test_fsdp.py`).

Composes with tensor parallelism: leaves already sharded by
`tp.mdm_param_specs` keep their Megatron layout, and only dimensions the
TP spec leaves unsharded are eligible for the fsdp axis.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
from jax.sharding import PartitionSpec as P


def fsdp_param_specs(
    params: Any,
    axis_size: int,
    axis: str = "data",
    min_leaf_size: int = 2 ** 14,
    base_specs: Optional[Any] = None,
) -> Any:
    """PartitionSpec pytree sharding each large leaf along `axis`.

    For every array leaf, the largest dimension divisible by `axis_size`
    (and not already taken by `base_specs`, e.g. TP's 'model' axis) is
    sharded; leaves smaller than `min_leaf_size` elements, or with no
    divisible free dimension, stay as their base spec — tiny biases and
    layernorm scales cost more to gather than they save.

    `axis_size` must be passed explicitly (specs are built before any
    mesh context is entered); divisibility decides shardability, so an
    uneven dim is silently left alone rather than padded.
    """
    if base_specs is None:
        base_specs = jax.tree.map(lambda _: P(), params)

    def spec_for(leaf, base):
        if not hasattr(leaf, "shape") or leaf.size < min_leaf_size:
            return base
        parts = list(base) + [None] * (leaf.ndim - len(base))
        if axis in parts:  # already fsdp-sharded by the base
            return base
        # largest free divisible dim wins: most even split, fewest
        # stragglers on the all-gather
        cand = [
            (leaf.shape[d], d)
            for d in range(leaf.ndim)
            if parts[d] is None and leaf.shape[d] % axis_size == 0
            and leaf.shape[d] >= axis_size
        ]
        if not cand:
            return base
        _, d = max(cand)
        parts[d] = axis
        while parts and parts[-1] is None:
            parts.pop()
        return P(*parts)

    return jax.tree.map(spec_for, params, base_specs)


def count_sharded(specs: Any, axis: str = "data") -> int:
    """Number of leaves carrying `axis` — used by tests/diagnostics."""
    return sum(
        1 for s in jax.tree.leaves(specs, is_leaf=lambda x: isinstance(x, P))
        if isinstance(s, P) and axis in s
    )
