from .metrics import (  # noqa: F401
    beat_alignment,
    diversity,
    frechet_distance,
    multimodality,
)
