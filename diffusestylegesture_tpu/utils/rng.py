"""TPU-fast PRNG helpers.

JAX's default ``threefry2x32`` PRNG is computed in plain vector-ALU ops.
At the flagship ZEGGS train shapes (B=300, T=88, d=256, 8 layers) the
per-step dropout masks alone cost ~88 ms on a v5e chip — 6.4x the rest
of the f32 train-mode forward (measured round 4: 104.8 ms with dropout
0.1 vs 16.3 ms with dropout 0.0; the masks are ~25 bernoulli draws over
(B,T,256)-shaped activations). The ``rbg`` implementation keeps
threefry for key splits/folds (cheap — they operate on 4 words) but
lowers bulk bit generation to XLA's ``RngBitGenerator``, the hardware
generator: the same forward measures 17.8 ms.

Dropout-mask *values* have no parity or reproducibility requirement —
the reference draws them from torch's Philox stream, a third sequence —
so the train step re-wraps only its dropout stream as an rbg key and
leaves every parity-relevant draw (noise, timestep sampling,
conditioning mask) on threefry. Caveat, documented where used: rbg bit
sequences are stable for a fixed key on a fixed backend, but are not
guaranteed identical across mesh layouts or XLA versions, so
loss traces may differ between e.g. dp8 and dp4tp2 runs of the same
seed. ``TrainConfig.dropout_rng_impl = "threefry"`` restores
layout-invariant masks.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def rbg_key(key: jax.Array) -> jax.Array:
    """Re-wrap any PRNG key (typed or raw uint32 data) as an ``rbg``-impl
    typed key carrying the same entropy. jit-safe: wrap/unwrap are
    metadata-only bitcasts.

    rbg keys are 4 uint32 words; a 2-word threefry key is duplicated —
    the downstream split/fold mixing makes the correlation irrelevant
    for dropout masks.
    """
    arr = jnp.asarray(key)
    if jnp.issubdtype(arr.dtype, jax.dtypes.prng_key):
        data = jax.random.key_data(arr)
    else:
        data = arr.astype(jnp.uint32)
    if data.shape[-1] == 2:
        data = jnp.concatenate([data, data], axis=-1)
    return jax.random.wrap_key_data(data, impl="rbg")
