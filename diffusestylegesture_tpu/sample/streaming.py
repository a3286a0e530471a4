"""Streaming long-form generation: push audio as it arrives, pull motion
window by window.

Beyond-parity serving surface (the reference generates only whole clips,
`main/mydiffusion_zeggs/sample.py:210-338`): a live client feeds 16 kHz
audio incrementally; as soon as one window's worth of new samples
(`stride·sr/fps`, 4 s at the reference config) is buffered, one compiled
window step runs — DDPM chain + seed-continuation + root-delta correction
+ crossfade, identical math to `ZeggsSampler._generate_impl`'s scan body —
and the new motion frames stream back ~0.15 s later (batch-1 v5e).

The per-window step is a single jitted program reused for every window
(first/subsequent behavior selected by a traced flag, exactly like the
batch engine's scan), so the output equals `ZeggsSampler.generate` /
`BeatTwhSampler.generate` on the same audio, key and params (tested in
`tests/test_streaming.py`; exact on CPU at ≤2e-6). On TPU the standalone
window program and the scan-fused batch program are DIFFERENT XLA
programs, and their fusion-order rounding differences are amplified by
the autoregressive diffusion chain: measured ~1.5e-2 max-err f32 on v5e —
the same order as the accepted bf16 serving deviation, far below the
schedule's own noise floor.
"""
from __future__ import annotations

from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .engine import ZeggsSampler, crossfade_weights, unnormalize_poses
from .engine_beat import BeatTwhSampler


def _stream_step(sampler, params, wavlm_params, window_audio, seed, style,
                 key, is_first, *, host_feats=False):
    """One window: mirrors `ZeggsSampler._generate_impl`'s scan body
    (`engine.py:236-260`) so streamed output equals the batch engine.

    `host_feats` (static): `window_audio` already holds the per-frame
    features computed host-side (the Sphinx-MFCC mode, like the batch
    engine's `host_feats` branch) — a host fn cannot run under tracing.
    """
    cfg = sampler.cfg
    if host_feats:
        feats = window_audio
    else:
        feats = sampler.wavlm_apply(wavlm_params, window_audio[None])[0]
    key, sub = jax.random.split(key)
    sample = sampler._window_sample(params, sub, feats, seed, style)

    if cfg.root_delta_correction:
        delta = (sample[:, 0:3, :, 0] - seed[:, 0:3, :, 0])[..., None]
        corrected = sample.at[:, 0:3].add(-delta)
        sample = jnp.where(is_first, sample, corrected)

    wa, wb = crossfade_weights(cfg.n_seed, style.shape[0], cfg.crossfade_n)
    blended_head = seed * wa + sample[..., : cfg.n_seed] * wb
    head = jnp.where(is_first, sample[..., : cfg.n_seed], blended_head)
    sample = jnp.concatenate([head, sample[..., cfg.n_seed:]], axis=-1)
    new_seed = sample[..., -cfg.n_seed:]
    return sample[..., : cfg.stride], new_seed, key


class ZeggsStreamSampler:
    """Stateful incremental wrapper around a :class:`ZeggsSampler`.

    Usage::

        stream = ZeggsStreamSampler(sampler, params, wavlm_params,
                                    style, key, mean=mean, std=std)
        for audio_chunk in microphone():       # any chunk sizes
            for motion in stream.push(audio_chunk):
                play(motion)                   # (B, stride, njoints) frames

    The first emitted window is `stride - n_seed` frames (the engine drops
    the warm-up seed frames globally, ref `sample.py:296`); every
    subsequent one is `stride` frames. Audio shorter than a full window
    stays buffered — like the batch engine, an incomplete tail window is
    never generated.
    """

    def __init__(self, sampler: ZeggsSampler, params, wavlm_params,
                 style: np.ndarray, key: jax.Array,
                 mean: Optional[np.ndarray] = None,
                 std: Optional[np.ndarray] = None):
        self.sampler = sampler
        cfg = sampler.cfg
        self.cfg = cfg
        self.params = params
        self.wavlm_params = wavlm_params
        self.style = jnp.atleast_2d(jnp.asarray(style, jnp.float32))
        self.mean = None if mean is None else np.asarray(mean).squeeze()
        self.std = None if std is None else np.asarray(std).squeeze()

        B = self.style.shape[0]
        self._seed = jnp.zeros((B, cfg.njoints, 1, cfg.n_seed), jnp.float32)
        self._key = key
        self._window_index = 0
        self._buffer = np.zeros(0, np.float32)
        self._prev_tail = np.zeros(cfg.samples_per_seed, np.float32)
        # host-side feature fns (e.g. the Sphinx-MFCC mode,
        # `make_mfcc_window_fn`) cannot run under tracing — mirror the
        # batch engine's host_feats branch and call them outside the jit
        self._host_feats = bool(getattr(sampler.wavlm_apply, "host_side", False))
        # one compiled step per underlying sampler, shared by every stream
        # session over it (a new session per request must not re-jit)
        step = getattr(sampler, "_stream_step", None)
        if step is None:
            step = jax.jit(
                partial(_stream_step, sampler, host_feats=self._host_feats))
            sampler._stream_step = step
        self._step = step

    def push(self, audio_chunk: np.ndarray) -> List[np.ndarray]:
        """Feed new audio samples; returns 0+ ready motion chunks, each
        (B, frames, njoints) un-normalized like `ZeggsSampler.generate`."""
        self._buffer = np.concatenate(
            [self._buffer, np.asarray(audio_chunk, np.float32)])
        out = []
        sps = self.cfg.samples_per_stride
        while len(self._buffer) >= sps:
            main, self._buffer = self._buffer[:sps], self._buffer[sps:]
            window_audio = np.concatenate([self._prev_tail, main])
            self._prev_tail = main[-self.cfg.samples_per_seed:]
            if self._host_feats:
                window_audio = np.asarray(
                    self.sampler.wavlm_apply(self.wavlm_params, window_audio[None])
                )[0]
            chunk, self._seed, self._key = self._step(
                self.params, self.wavlm_params, jnp.asarray(window_audio),
                self._seed, self.style, self._key,
                jnp.asarray(self._window_index == 0),
            )
            seq = np.asarray(chunk)[:, :, 0].transpose(0, 2, 1)  # (B, T, C)
            if self._window_index == 0:
                seq = seq[:, self.cfg.n_seed:]  # ref `sample.py:296`
            seq = unnormalize_poses(seq, self.mean, self.std)
            self._window_index += 1
            out.append(seq)
        return out

    @property
    def frames_emitted(self) -> int:
        if self._window_index == 0:
            return 0
        return self._window_index * self.cfg.stride - self.cfg.n_seed


def _beat_stream_step(sampler, params, audio_i, seed, style, seed_last, key,
                      is_first):
    """One BEAT/TWH window: mirrors `BeatTwhSampler._generate_impl`'s scan
    body (`engine_beat.py:173-186`)."""
    cfg = sampler.cfg
    key, sub = jax.random.split(key)
    sample = sampler._window_sample(params, sub, audio_i, seed, style, seed_last)
    wa, wb = crossfade_weights(cfg.n_seed, style.shape[0], cfg.crossfade_n)
    blended = seed * wa + sample[..., : cfg.n_seed] * wb
    head = jnp.where(is_first, sample[..., : cfg.n_seed], blended)
    sample = jnp.concatenate([head, sample[..., cfg.n_seed:]], axis=-1)
    return sample, sample[..., -cfg.n_seed:], key


class BeatTwhStreamSampler:
    """Streaming BEAT/TWH generation: push fused text+audio feature frames
    (30 fps rows of `data.beat_twh` features) as they arrive; each complete
    stride (120 frames = 4 s) yields motion. `flush()` generates the final
    zero-padded partial window exactly like the batch engine
    (`engine_beat.py` / ref `sample.py:57-73`), so
    push(...)+flush() equals `BeatTwhSampler.generate` on the whole clip.
    """

    def __init__(self, sampler: BeatTwhSampler, params,
                 seed_gesture: np.ndarray, style: np.ndarray, key: jax.Array,
                 mean: np.ndarray, std: np.ndarray,
                 seed_last: Optional[np.ndarray] = None):
        self.sampler = sampler
        cfg = sampler.cfg
        self.cfg = cfg
        self.params = params
        self.style = jnp.atleast_2d(jnp.asarray(style, jnp.float32))
        self.mean = np.asarray(mean)
        self.std = np.asarray(std)
        B = self.style.shape[0]
        seed0 = jnp.asarray(seed_gesture.T[None, :, None, :], jnp.float32)
        self._seed = jnp.broadcast_to(seed0, (B,) + seed0.shape[1:])
        self._seed_last = None
        if seed_last is not None:
            self._seed_last = jnp.broadcast_to(
                jnp.asarray(seed_last.T[None, :, None, :], jnp.float32),
                (B, cfg.njoints, 1, cfg.n_seed))
        self._key = key
        self._window_index = 0
        self._frames_in = 0
        self._emitted = 0
        self._buffer = np.zeros((0, cfg.audio_dim), np.float32)
        self._prev_tail = np.zeros((cfg.n_seed, cfg.audio_dim), np.float32)
        step = getattr(sampler, "_stream_step", None)
        if step is None:
            step = jax.jit(partial(_beat_stream_step, sampler))
            sampler._stream_step = step
        self._step = step

    def _model_window(self, main: np.ndarray) -> np.ndarray:
        """Variant-dependent audio window (`engine_beat.slice_windows`)."""
        cfg = self.cfg
        if cfg.variant == "attention3":
            win = np.concatenate([self._prev_tail, main], axis=0)
        elif cfg.variant == "attention4":
            win = main
        elif cfg.variant == "attention5":
            win = main[: cfg.stride - cfg.n_seed]
        else:
            raise ValueError(cfg.variant)
        self._prev_tail = main[-cfg.n_seed:]
        return win

    def _run_window(self, main: np.ndarray, final: bool) -> np.ndarray:
        """Generate one window; emit its [0:stride) frames (the trailing
        n_seed are the NEXT window's crossfaded head — batch assembly trims
        every window but the last, `engine_beat.py` ref `:180-188`). The
        full-window tail is retained so `flush` can emit it when this turns
        out to be the final window of an exact-stride clip."""
        cfg = self.cfg
        sample, self._seed, self._key = self._step(
            self.params, jnp.asarray(self._model_window(main)), self._seed,
            self.style, self._seed_last, self._key,
            jnp.asarray(self._window_index == 0),
        )
        keep = cfg.njoints // cfg.motion_feature_division
        seq = np.asarray(sample)[:, :keep, 0].transpose(0, 2, 1)  # (B,n_poses,keep)
        self._last_tail = seq[:, cfg.stride:]
        if not final:
            seq = seq[:, : cfg.stride]
        if self._window_index == 0:
            seq = seq[:, cfg.n_seed:]
        self._window_index += 1
        if final:
            seq = seq[:, : max(0, self._frames_in - self._emitted)]
        self._emitted += seq.shape[1]
        return seq * self.std + self.mean

    def push(self, features: np.ndarray) -> List[np.ndarray]:
        """Feed (t, audio_dim) fused feature rows; returns ready
        (B, frames, motion_dim) un-normalized motion chunks."""
        features = np.asarray(features, np.float32).reshape(-1, self.cfg.audio_dim)
        self._frames_in += features.shape[0]
        self._buffer = np.concatenate([self._buffer, features])
        out = []
        stride = self.cfg.stride
        while len(self._buffer) >= stride:
            main, self._buffer = self._buffer[:stride], self._buffer[stride:]
            out.append(self._run_window(main, final=False))
        return out

    def flush(self) -> List[np.ndarray]:
        """Finish the clip with batch parity (ref `:57-73,180-188`): a
        buffered partial stride becomes the zero-padded last window; an
        exact-stride clip instead emits the retained full tail of the last
        generated window (the batch engine keeps the last window whole)."""
        cfg = self.cfg
        out = []
        if self._frames_in == 0 and self._window_index == 0:
            # nothing was ever pushed: don't burn a full diffusion window
            # on all-zero features just to emit an empty chunk
            return out
        if len(self._buffer) > 0 or self._window_index == 0:
            pad = cfg.stride - len(self._buffer)
            main = np.concatenate(
                [self._buffer, np.zeros((pad, cfg.audio_dim), np.float32)])
            self._buffer = self._buffer[:0]
            out.append(self._run_window(main, final=True))
        elif self._emitted < self._frames_in:
            tail = self._last_tail[:, : self._frames_in - self._emitted]
            self._emitted += tail.shape[1]
            out.append(tail * self.std + self.mean)
        return out
