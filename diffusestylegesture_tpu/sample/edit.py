"""Motion editing via diffusion inpainting.

Parity with the MDM-legacy editing modes (`main/sample/edit.py`,
`edit_mode in_between/upper_body`) built on the inpainting hook the
diffusion core supports (`gaussian_diffusion.py:317-324` — model x0
prediction overwritten where the mask is set; our samplers take the same
hook as the `inpaint=(mask, motion)` argument).

Masks are built in the (B, C, 1, T) tensor layout of the gesture models:
  * `in_between_mask`: keep prefix/suffix frames fixed, synthesize the
    middle;
  * `feature_mask`: keep a channel subset fixed every frame (the gesture
    analog of upper_body editing — e.g. freeze the root/lower-body slice
    of the 1141-d ZEGGS vector while resampling the rest).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion import Schedule, SamplerConfig, p_sample_loop


def in_between_mask(shape, prefix_frames: int, suffix_frames: int = 0) -> jnp.ndarray:
    """(B, C, 1, T) boolean: True = keep the reference motion."""
    B, C, F, T = shape
    t = np.arange(T)
    keep = (t < prefix_frames) | (t >= T - suffix_frames)  # suffix 0 → all-False term
    mask = np.broadcast_to(keep[None, None, None, :], shape)
    return jnp.asarray(mask)


def feature_mask(shape, keep_channels: Sequence[int]) -> jnp.ndarray:
    """(B, C, 1, T) boolean: True on the given channel rows."""
    B, C, F, T = shape
    keep = np.zeros(C, bool)
    keep[np.asarray(keep_channels, dtype=int)] = True  # () defaults to float64: invalid index
    mask = np.broadcast_to(keep[None, :, None, None], shape)
    return jnp.asarray(mask)


ZEGGS_ROOT_CHANNELS = tuple(range(13))  # root pos/rot/vel/vrt of the 1141-d layout


def edit_motion(
    sched: Schedule,
    model_fn,
    reference_motion: jax.Array,  # (B, C, 1, T) normalized
    inpainting_mask: jax.Array,  # True = keep reference
    key: jax.Array,
    cfg: SamplerConfig = SamplerConfig(),
) -> jax.Array:
    """Resample the unmasked region conditioned on the kept region."""
    return p_sample_loop(
        sched,
        model_fn,
        reference_motion.shape,
        key,
        cfg=cfg,
        inpaint=(inpainting_mask, reference_motion),
    )
