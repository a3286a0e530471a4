"""WavLM → gesture-framework adapters.

Parity targets:
  * ZEGGS `wav2wavlm` (`main/mydiffusion_zeggs/sample.py:44-48`): raw
    window → extract_features → linear-interpolate (align_corners) to
    n_poses frames. NOTE the reference does NOT apply the checkpoint's
    `cfg.normalize` wav layer-norm here — quirk preserved.
  * TWH/BEAT `wav2wavlm` (`BEAT-TWH-main/process/process_TWH_bvh.py:81-98`):
    layer-norm the whole wav, zero-pad to 5 s chunks, batch the chunks,
    concatenate features.

On TPU the window/chunk axis is just a batch axis — one big MXU call.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .model import WavLM, interpolate_linear


def make_zeggs_wavlm_fn(model: WavLM, n_poses: int = 88) -> Callable:
    """Returns wavlm_apply(params, windows (W, S)) → (W, n_poses, 1024)."""

    def apply(params, windows: jax.Array) -> jax.Array:
        rep = model.apply(params, windows)
        return interpolate_linear(rep, n_poses)

    return apply


def make_twh_wavlm_fn(model: WavLM, chunk_secs: int = 5, sr: int = 16000) -> Callable:
    """Returns wavlm_apply(params, wav (S,)) → (T', 1024) whole-clip features."""

    def apply(params, wav: jax.Array) -> jax.Array:
        mean = jnp.mean(wav)
        var = jnp.var(wav)
        wav = (wav - mean) * jax.lax.rsqrt(var + 1e-5)
        chunk = sr * chunk_secs
        num = wav.shape[0] // chunk + 1
        wav = jnp.pad(wav, (0, chunk * num - wav.shape[0]))
        rep = model.apply(params, wav.reshape(num, chunk))
        return rep.reshape(-1, rep.shape[-1])

    return apply
