"""ZeroEGGS generation engine: stylized RNN gesture synthesis.

Parity with `ubisoft-laforge-ZeroEGGS-main/ZEGGS/generate.py:20-330`:
  * style encodings from example-motion feature matrices (the
    [root_vel | root_vrt | lpos | ltxy | lvel | lvrt | zeros(3)] layout
    with the gaze slot zeroed, `generate.py:228-246`), or direct
    embedding vectors;
  * style blending: "add" = ratio-weighted sum of embeddings
    (`generate.py:272-281`), "stitch" = per-frame piecewise-constant
    schedule split proportionally to the ratios (`generate.py:253-270`);
  * first-pose state from a featurized BVH frame; speech encoding →
    `lax.scan` decoder rollout → BVH via the shared writer.

Audio features are taken precomputed (the reference's `preprocess_audio`
mel pipeline; `audio.features.log_melspectrogram` is the in-framework
equivalent) and z-normalized with the dataset stats, as in the reference.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple, Union

import jax.numpy as jnp
import numpy as np

from ..models.zeroeggs import SpeechEncoder, StyleEncoderVAE, ZeroEGGSConfig, ZeroEGGSDecoder


def example_feature_vec(
    root_vel, root_vrt, lpos, ltxy, lvel, lvrt, anim_input_mean, anim_input_std
) -> np.ndarray:
    """(T, 15J+9) style-example features (`generate.py:222-246`)."""
    T = len(root_vel)
    vec = np.concatenate(
        [
            root_vel.reshape(T, -1),
            root_vrt.reshape(T, -1),
            lpos.reshape(T, -1),
            ltxy.reshape(T, -1),
            lvel.reshape(T, -1),
            lvrt.reshape(T, -1),
            np.zeros((T, 3), np.float32),
        ],
        axis=1,
    )
    return (vec - anim_input_mean) / anim_input_std


def split_by_ratio(n: int, ratios: Sequence[float]) -> List[np.ndarray]:
    """Consecutive index segments proportional to ratios."""
    ratios = np.asarray(ratios, np.float64)
    bounds = np.floor(np.cumsum(ratios / ratios.sum()) * n).astype(int)
    out = []
    start = 0
    for b in bounds:
        out.append(np.arange(start, b))
        start = b
    if start < n:
        out[-1] = np.arange(out[-1][0] if len(out[-1]) else start, n)
    return out


def blend_style_encodings(
    encodings: Sequence[jnp.ndarray],
    n_frames: int,
    blend_type: str = "add",
    blend_ratio: Optional[Sequence[float]] = None,
) -> jnp.ndarray:
    """(B, T, E) per-frame style schedule (`generate.py:253-281,329-330`)."""
    blend_ratio = blend_ratio or [1.0 / len(encodings)] * len(encodings)
    if len(encodings) == 1:
        enc = encodings[0]
        return jnp.broadcast_to(enc[:, None, :], (enc.shape[0], n_frames, enc.shape[1]))
    if blend_type == "add":
        stacked = jnp.stack(encodings, axis=1)  # (B, K, E)
        w = jnp.asarray(blend_ratio, jnp.float32)
        enc = jnp.einsum("bke,k->be", stacked, w)
        return jnp.broadcast_to(enc[:, None, :], (enc.shape[0], n_frames, enc.shape[1]))
    if blend_type == "stitch":
        segs = split_by_ratio(n_frames, blend_ratio)
        parts = [
            jnp.broadcast_to(
                enc[:, None, :], (enc.shape[0], len(seg), enc.shape[1])
            )
            for enc, seg in zip(encodings, segs)
        ]
        return jnp.concatenate(parts, axis=1)
    raise ValueError(blend_type)


@dataclasses.dataclass
class ZeroEggsGenerator:
    cfg: ZeroEGGSConfig
    speech_params: dict
    style_params: dict
    decoder_params: dict
    stats: dict  # audio_input_mean/std, anim_input_mean/std, anim_output_mean/std

    def __post_init__(self):
        self.speech_encoder = SpeechEncoder(
            hidden_size=self.cfg.hidden_size, output_size=self.cfg.speech_encoding_size
        )
        self.style_encoder = StyleEncoderVAE(
            self.cfg.hidden_size, self.cfg.style_embedding_size,
            encoder_type=getattr(self.cfg, "style_encoder_type", "gru"),
        )
        self.decoder = ZeroEGGSDecoder(self.cfg)

    def encode_style(
        self, example_features: np.ndarray, key=None, temperature: float = 1.0
    ) -> jnp.ndarray:
        z, mu, _ = self.style_encoder.apply(
            self.style_params, jnp.asarray(example_features)[None],
            key=key, temperature=temperature,
        )
        return z

    def generate(
        self,
        audio_features: np.ndarray,  # (T, A), un-normalized
        styles: Sequence[Union[np.ndarray, jnp.ndarray]],  # encodings (1, E)
        first_pose_state: Tuple,  # (root_pos ... lvrt) single-frame arrays
        gaze_pos: Optional[np.ndarray] = None,
        blend_type: str = "add",
        blend_ratio: Optional[Sequence[float]] = None,
    ):
        st = self.stats
        af = (jnp.asarray(audio_features) - st["audio_input_mean"]) / st["audio_input_std"]
        speech = self.speech_encoder.apply(self.speech_params, af[None])
        T = speech.shape[1]
        style_seq = blend_style_encodings(
            [jnp.atleast_2d(jnp.asarray(s)) for s in styles], T, blend_type, blend_ratio
        )
        if gaze_pos is None:
            gaze_pos = jnp.zeros((1, T, 3))
        init = tuple(jnp.asarray(np.asarray(x))[None] for x in first_pose_state)
        return self.decoder.apply(
            self.decoder_params, init, jnp.asarray(gaze_pos), speech, style_seq,
            jnp.asarray(st["anim_input_mean"]), jnp.asarray(st["anim_input_std"]),
            jnp.asarray(st["anim_output_mean"]), jnp.asarray(st["anim_output_std"]),
        )
