from .mesh import (  # noqa: F401
    data_sharded,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)
from .tp import mdm_param_specs, shard_params, shard_train_state  # noqa: F401
