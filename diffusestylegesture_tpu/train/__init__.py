from .state import (  # noqa: F401
    TrainConfig,
    TrainState,
    create_train_state,
    make_beat_cond_builder,
    make_zeggs_cond_builder,
    make_train_step,
    zeggs_cond_builder,
)
from .loop import LoopConfig, TrainLoop  # noqa: F401
from .logger import KVLogger  # noqa: F401
from .checkpoint import CheckpointManager, save_params_npz  # noqa: F401
