from .model import WavLM, WavLMConfig, interpolate_linear  # noqa: F401
from .convert import convert_wavlm, load_wavlm_checkpoint  # noqa: F401
from .adapters import make_twh_wavlm_fn, make_zeggs_wavlm_fn  # noqa: F401
