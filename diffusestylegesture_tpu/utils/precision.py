"""Precision helpers shared by serving scripts and benches.

The f32→bf16 pytree cast was re-implemented inline in five scripts
(bench.py, b1_latency_probe, serving_bench, streaming_bench, beat_bench)
— one shared helper so a future policy change (e.g. keeping LayerNorm
params in f32, a common mixed-precision serving fix) lands everywhere.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def bf16_cast(tree):
    """Cast every float32 leaf to bfloat16; other dtypes pass through."""
    return jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if getattr(a, "dtype", None) == jnp.float32 else a,
        tree,
    )
