"""Device-resident training data with in-jit batch sampling.

The whole ZEGGS window cache fits in HBM (~1.3 GB for the full dataset:
poses + WavLM features), so instead of streaming ~230 MB host batches
per step (the reference's DataLoader-worker pattern — and a measured
7.5 s/step of transfer in tunneled environments vs a 79 ms step), the
arrays are uploaded ONCE and each step gathers a random batch on device
inside the compiled train step. Epoch semantics become with-replacement
uniform sampling (the BEAT loader's own `RandomSampler` behavior,
`h5_data_loader.py:71-77`).
"""
from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np


class DeviceWindowCache:
    """Uploads dataset arrays once; provides a jittable batch sampler."""

    def __init__(self, arrays: Dict[str, np.ndarray], sharding=None):
        n = None
        self.arrays = {}
        for k, v in arrays.items():
            if v is None:
                continue
            if sharding is not None:
                # place directly from host — jnp.asarray first would commit
                # ~GBs to device 0 and then re-copy (transient 2x HBM peak)
                arr = jax.device_put(np.asarray(v), sharding)
            else:
                arr = jnp.asarray(v)
            self.arrays[k] = arr
            n = arr.shape[0] if n is None else n
            assert arr.shape[0] == n, f"{k} length mismatch"
        self.n = n or 0

    @staticmethod
    def sample_batch(arrays: Dict[str, jax.Array], key: jax.Array,
                     batch_size: int) -> Dict[str, jax.Array]:
        """Uniform with-replacement batch gather.

        Takes the array dict EXPLICITLY so jitted callers pass it as an
        argument — a method closing over `self.arrays` inside a jit would
        bake the whole dataset into the HLO as literal constants (the
        failure mode documented below in `make_device_data_train_step`)."""
        n = next(iter(arrays.values())).shape[0]
        idx = jax.random.randint(key, (batch_size,), 0, n)
        return {k: v[idx] for k, v in arrays.items()}

    @classmethod
    def from_zeggs(cls, dataset, sharding=None) -> "DeviceWindowCache":
        arrays = {"motion": dataset.poses, "style": dataset.styles}
        if dataset.wavlm is not None:
            arrays["wavlm"] = dataset.wavlm
        return cls(arrays, sharding)


def make_device_data_train_step(
    model_apply: Callable,
    sched,
    train_cfg,
    cond_builder: Callable,
    batch_size: int,
    batch_sharding=None,
) -> Callable:
    """Train step `(state, key, arrays) → (state, metrics)` with on-device
    batching.

    The batch gather fuses into the compiled step — zero host traffic per
    iteration. `batch_sharding` (a NamedSharding over the mesh's 'data'
    axis) constrains the sampled batch: without it GSPMD propagates the
    replicated cache through the whole step and every chip redundantly
    computes the identical full batch — data parallelism silently lost.

    The cache arrays enter as an explicit jit ARGUMENT (`arrays` =
    `cache.arrays`): closing over them would embed hundreds of MB of
    dataset as literal constants in the serialized HLO — which breaks
    remote-compile transports (HTTP 413 through the axon tunnel) and
    bloats the compile either way. Passed as arguments, the already-
    on-device buffers are just parameter bindings.
    """
    from ..train.state import make_train_step

    inner = make_train_step(model_apply, sched, train_cfg, cond_builder)

    def step(state, key, arrays):
        k_data, k_step = jax.random.split(key)
        batch = DeviceWindowCache.sample_batch(arrays, k_data, batch_size)
        if batch_sharding is not None:
            batch = jax.tree.map(
                lambda a: jax.lax.with_sharding_constraint(a, batch_sharding),
                batch)
        return inner(state, batch, k_step)

    return step
