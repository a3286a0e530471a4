"""Style-space utilities for batched multi-style sampling.

Covers the BASELINE "batched multi-clip, multi-style × guidance-scale
sampling" config and the ZeroEGGS-style blending concepts
(`ubisoft-laforge-ZeroEGGS-main/ZEGGS/generate.py:20-62`, style blend
"add"), expressed in the one-hot/continuous style space the diffusion
models condition on: the batch axis is free on TPU, so a whole
styles × intensities grid saturates the MXU in one generation pass.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np

from ..motion.zeggs_features import STYLE_NAMES


def style_vector(name: str, intensity: float = 1.0) -> np.ndarray:
    """One-hot × intensity (the reference scales one-hots for intensity)."""
    idx = STYLE_NAMES.index(name)
    v = np.zeros(len(STYLE_NAMES), np.float32)
    v[idx] = intensity
    return v


def blend_styles(names: Sequence[str], weights: Sequence[float]) -> np.ndarray:
    """Additive style blending (ZeroEGGS 'add' blend, `generate.py`)."""
    v = np.zeros(len(STYLE_NAMES), np.float32)
    for n, w in zip(names, weights):
        v[STYLE_NAMES.index(n)] += w
    return v


def style_grid(
    names: Sequence[str] = tuple(STYLE_NAMES),
    intensities: Sequence[float] = (1.0,),
) -> np.ndarray:
    """(len(names)·len(intensities), 6) batch of style vectors."""
    return np.stack(
        [style_vector(n, s) for n in names for s in intensities]
    )
