from .engine import ZeggsEngineConfig, ZeggsSampler, slice_audio_windows  # noqa: F401
from .engine_beat import (  # noqa: F401
    BeatEngineConfig,
    BeatTwhSampler,
    prepare_seed_gesture,
)
from .styles import blend_styles, style_grid, style_vector  # noqa: F401
