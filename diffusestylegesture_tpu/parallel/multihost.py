"""Multi-host (multi-process) SPMD setup.

The reference's `dist_util.setup_dist` is commented out
(`main/utils/dist_util.py:18-41`); the TPU-native equivalent is
`jax.distributed.initialize` + a global mesh spanning all processes.
Data enters per-host over DCN and becomes one global sharded batch via
`make_array_from_process_local_data`; gradients all-reduce over ICI.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None, **kw) -> None:
    """Process-group init (TPU pods auto-discover when args omitted)."""
    jax.distributed.initialize(coordinator_address=coordinator_address, **kw)


def global_mesh(axes: Sequence[str] = ("data",), shape=None) -> Mesh:
    """Alias of `mesh.make_mesh` (one mesh-construction implementation)."""
    from .mesh import make_mesh

    return make_mesh(axes=axes, shape=shape)


def global_batch_from_host_local(mesh: Mesh, batch, axis: str = "data"):
    """Per-host numpy batch shard → one global jax.Array batch.

    Each process passes ITS slice of the global batch (global_batch_size /
    num_processes rows); the result is a global array sharded over `axis`.
    """
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        batch,
    )
