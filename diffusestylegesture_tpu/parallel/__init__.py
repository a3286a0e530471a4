from .mesh import (  # noqa: F401
    data_sharded,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)
