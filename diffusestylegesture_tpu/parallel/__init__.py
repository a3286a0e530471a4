from .mesh import (  # noqa: F401
    data_sharded,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)
from .fsdp import count_sharded, fsdp_param_specs  # noqa: F401
from .pipeline import (  # noqa: F401
    pipeline_apply,
    stack_layer_params,
    unstack_layer_params,
)
from .tp import (  # noqa: F401
    wavlm_param_specs,
    mdm_param_specs,
    merge_qkv_params,
    shard_params,
    shard_train_state,
    split_qkv_params,
)
