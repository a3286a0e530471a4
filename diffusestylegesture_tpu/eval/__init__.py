from .metrics import (  # noqa: F401
    beat_alignment,
    diversity,
    frechet_distance,
    multimodality,
)
from . import t2m  # noqa: F401
from . import unconstrained  # noqa: F401
