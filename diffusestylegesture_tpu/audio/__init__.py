from .sphinx_mfcc import sphinx_mfcc_energy, sphinx_filterbank, s2dctmat  # noqa: F401
from . import features  # noqa: F401
from .loudness import integrated_loudness, normalize_loudness, true_peak_db  # noqa: F401
