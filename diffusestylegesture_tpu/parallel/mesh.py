"""Device mesh and sharding utilities.

The reference is single-GPU with dead DDP scaffolding
(`main/train/training_loop.py:100-101`, `main/utils/dist_util.py:18-67`).
Here multi-chip is first-class: an SPMD `Mesh` with a `data` axis (pure DP
covers the ~17 M-param denoiser; the mesh accepts extra axes for tensor
sharding of larger encoders), `NamedSharding` helpers, and host→device
batch placement. Collectives ride ICI via jit-inserted all-reduces; no
hand-written NCCL-style code.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axes: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
    devices=None,
) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    if shape is None:
        shape = [len(devices)] + [1] * (len(axes) - 1)
    return Mesh(devices.reshape(shape), tuple(axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Batch-axis (leading dim) sharding."""
    return NamedSharding(mesh, P(axis))


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place a host pytree of (B, ...) arrays with the batch dim sharded.

    Multi-process: each process passes ITS slice of the global batch —
    assembly goes through `make_array_from_process_local_data` (a plain
    device_put would wrongly treat every host's different local batch as
    the same global value)."""
    if jax.process_count() > 1:
        from .multihost import global_batch_from_host_local

        return global_batch_from_host_local(mesh, batch, axis=axis)
    sh = data_sharded(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
