from .engine import ZeggsEngineConfig, ZeggsSampler, slice_audio_windows  # noqa: F401
from .engine_beat import (  # noqa: F401
    BeatEngineConfig,
    BeatTwhSampler,
    prepare_seed_gesture,
)
from .styles import blend_styles, style_grid, style_vector  # noqa: F401
from .engine import generate_multi_clip, make_mfcc_window_fn  # noqa: F401
from .edit import edit_motion, feature_mask, in_between_mask  # noqa: F401
from .server import GestureServer, ServerConfig  # noqa: F401
from .restyle import restyle_window  # noqa: F401
from .streaming import ZeggsStreamSampler  # noqa: F401
from .streaming import BeatTwhStreamSampler  # noqa: F401
