from .zeggs import ZeggsWindowDataset, build_zeggs_dataset, load_wav_16k  # noqa: F401
from .h5_loader import (  # noqa: F401
    SpeechGestureDataset,
    build_h5_dataset,
    gesture_statistics,
)
