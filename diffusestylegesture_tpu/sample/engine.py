"""Windowed long-form gesture generation engines.

Parity targets:
  * ZEGGS: `main/mydiffusion_zeggs/sample.py:210-338` — split audio into
    ⌊T/(n_poses−n_seed)⌋ windows, per-window WavLM features with an
    n_seed-frame audio prefix (zeros for window 0, the previous window's
    tail otherwise), 1000-step DDPM per window, root-translation delta
    correction between windows (`:269-282`), linear crossfade over the
    n_seed overlap frames (`:284-288`), trim + un-normalize.
  * BEAT/TWH: `BEAT-TWH-main/mydiffusion_beat_twh/sample.py:44-201` —
    ⌈T/(n_poses−n_seed)⌉ windows over zero-padded text+audio features,
    real-clip seed with velocity/acceleration channels, per-variant audio
    slicing, position-third extraction (`motion_feature_division`).

TPU-first restructuring (same outputs, different schedule):
  * All window audio slices are gathered up front and the audio encoder
    (WavLM) runs ONCE as a batch over windows — large MXU batches instead
    of the reference's per-window CPU↔GPU round trips.
  * The per-window 1000-step DDPM chain is a `lax.scan`; the
    autoregressive window loop (seed carry + crossfade + root-delta) is a
    second, outer `lax.scan`. One XLA program generates the whole clip.
  * Batched multi-style / multi-guidance sampling: the batch axis is free
    — pass stacked styles and a guidance scale to saturate the chip.
"""
from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion import (
    Schedule,
    SamplerConfig,
    ddim_sample_loop,
    dpmpp2m_sample_loop,
    p_sample_loop,
    plms_sample_loop,
)
from ..diffusion.sampling import make_cfg_model_fn

SAMPLE_LOOPS = {
    "ddpm": p_sample_loop,
    "ddim": ddim_sample_loop,
    "plms": plms_sample_loop,
    "dpmpp": dpmpp2m_sample_loop,
}


def unnormalize_poses(seq, mean, std):
    """Shared output epilogue: std clipped at 0.01 (ref `sample.py:320-326`),
    then mean added. One definition for engine, multi-clip, and server."""
    if std is not None:
        seq = seq * np.clip(np.asarray(std).squeeze(), 0.01, None)
    if mean is not None:
        seq = seq + np.asarray(mean).squeeze()
    return seq


def crossfade_weights(n_seed: int, batch: int, crossfade_n):
    """Linear crossfade weights over the n_seed overlap frames.

    `crossfade_n=None` preserves the reference quirk: its blend loop runs
    over the BATCH axis (`sample.py:284-288`), so n = batch. Shared by the
    batch engines and the streaming steps so the quirk cannot drift.
    """
    n = batch if crossfade_n is None else int(crossfade_n)
    j = np.arange(n_seed, dtype=np.float32)
    wa = np.where(j < n, (n - j) / (n + 1), 0.0).astype(np.float32)
    wb = np.where(j < n, (j + 1) / (n + 1), 1.0).astype(np.float32)
    return jnp.asarray(wa), jnp.asarray(wb)


@dataclasses.dataclass(frozen=True)
class ZeggsEngineConfig:
    n_poses: int = 88
    n_seed: int = 8
    njoints: int = 1141
    fps: int = 20
    sr: int = 16000
    guidance_scale: float = 0.0  # 0 → plain conditional (reference default)
    # Crossfade width. None replicates the reference quirk: its blend loop
    # runs `for j in range(len(last_poses))` where `last_poses` is the
    # BATCH axis (`sample.py:284-288`), so with batch 1 only frame 0 is
    # blended, 50/50. An int selects a proper linear crossfade over that
    # many overlap frames (the behavior the code comments describe).
    crossfade_n: Optional[int] = None
    root_delta_correction: bool = True  # ref `:269-282` (ZEGGS on, BEAT off)
    sampler: str = "ddpm"  # ddpm | ddim | plms | dpmpp (use a respaced Schedule for ddimN)
    # Warm-start: skip the first N reverse steps, q_sampling the init
    # image (zeros when none) to t0 (ref `sample_fn(skip_timesteps=...)`,
    # `gaussian_diffusion.py:700-713`; the reference CLI threads it as 0).
    skip_timesteps: int = 0

    @property
    def stride(self) -> int:
        return self.n_poses - self.n_seed

    @property
    def samples_per_stride(self) -> int:
        return int(self.stride * self.sr / self.fps)

    @property
    def samples_per_seed(self) -> int:
        return int(self.n_seed * self.sr / self.fps)


def slice_audio_windows(audio: np.ndarray, cfg: ZeggsEngineConfig) -> np.ndarray:
    """Raw 16 kHz audio → (num_windows, seed_pad + stride samples).

    Window i's audio = [tail of window i−1 (zeros for i=0) | own stride]
    (parity: `sample.py:233-248`).
    """
    sps, spd = cfg.samples_per_stride, cfg.samples_per_seed
    num = len(audio) // sps
    audio = audio[: num * sps]
    main = audio.reshape(num, sps)
    prev_tails = np.zeros((num, spd), dtype=audio.dtype)
    prev_tails[1:] = main[:-1, -spd:]
    return np.concatenate([prev_tails, main], axis=1)


class ZeggsSampler:
    """End-to-end compiled ZEGGS long-form sampler.

    Args:
      model_apply: (params, x, t, cond, uncond=None) → x0 prediction.
      wavlm_apply: (wavlm_params, audio_windows (W, S)) → (W, n_poses, 1024)
        per-frame features (already interpolated to the motion rate).
      schedule: diffusion Schedule (1000-step cosine for parity).
    """

    def __init__(
        self,
        model_apply: Callable,
        wavlm_apply: Callable,
        schedule: Schedule,
        cfg: ZeggsEngineConfig = ZeggsEngineConfig(),
        sampler_cfg: SamplerConfig = SamplerConfig(),
        aot_dir: Optional[str] = None,
        program_tag: str = "",
    ):
        """`aot_dir`: directory for ahead-of-time executable snapshots
        (`utils/aot.py`) keyed by (sampler, steps, window-count, batch) —
        warm process starts skip tracing/lowering/compiling entirely
        (measured 2.4 s to a ready 1000-step engine vs 34.5 s with only
        the persistent compile cache, `scripts/aot_coldstart.py`).
        `program_tag`: set when the MODEL program differs for identical
        engine config + shapes (e.g. bf16/gelu_tanh serving) — the
        model_apply closure is outside the snapshot identity otherwise."""
        self.program_tag = program_tag
        self.model_apply = model_apply
        # device-side audio encoders get one jit wrapper here: callers
        # that run the encoder OUTSIDE the compiled sampler (multi-clip
        # path, server, streaming) would otherwise dispatch the whole
        # WavLM conv+transformer stack eagerly op-by-op per batch.
        # Host-side fns (mfcc mode, `host_side=True`) stay as-is.
        if not getattr(wavlm_apply, "host_side", False):
            jitted = jax.jit(wavlm_apply)
            jitted.host_side = False
            wavlm_apply = jitted
        self.wavlm_apply = wavlm_apply
        self.schedule = schedule
        self.cfg = cfg
        self.sampler_cfg = sampler_cfg
        self.aot_dir = aot_dir
        self._aot_runners: dict = {}
        self._generate = jax.jit(
            self._generate_impl, static_argnames=("num_windows", "host_feats")
        )

    def _aot_generate(self, params, wavlm_params, windows, style, key,
                      num_windows: int, host_feats: bool):
        """AOT-snapshot path for the no-injected-noise engine call."""
        from ..utils.aot import aot_compile

        B = style.shape[0]
        cache_key = (num_windows, B, host_feats)
        runner = self._aot_runners.get(cache_key)
        if runner is None:
            # the full engine config participates in the snapshot identity —
            # guidance/skip/crossfade change the program but not the shapes,
            # so a shared aot_dir must not mix them up
            import hashlib

            cfg_tag = hashlib.sha1(
                repr((self.cfg, self.sampler_cfg, self.program_tag)).encode()
            ).hexdigest()[:8]
            name = (
                f"zeggs_{self.cfg.sampler}{self.schedule.num_timesteps}"
                f"_nj{self.cfg.njoints}_W{num_windows}_B{B}"
                f"{'_hostfeats' if host_feats else ''}_{cfg_tag}.aotx"
            )
            path = os.path.join(self.aot_dir, name)

            def engine_fn(p, wp, w, s, k):
                return self._generate_impl(
                    p, wp, w, s, k, None,
                    num_windows=num_windows, host_feats=host_feats,
                )

            runner = aot_compile(
                engine_fn, (params, wavlm_params, windows, style, key), path
            )
            self._aot_runners[cache_key] = runner
        return runner(params, wavlm_params, windows, style, key)

    def _window_sample(self, params, key, wavlm_feats, seed, style, noise=None):
        """One 88-frame window: DDPM chain with seed/style conditioning.

        `noise` optionally injects the initial x_T (the reference's `noise=`
        hook, `gaussian_diffusion.py:612,631`) — used by the cross-framework
        parity harness to drive both samplers from identical noise.
        """
        cfg = self.cfg
        B = style.shape[0]
        cond = {
            "style": style,
            "seed": seed,
            "audio": jnp.broadcast_to(wavlm_feats[None], (B,) + wavlm_feats.shape),
            "mask_local": jnp.ones((B, cfg.n_poses), bool),
        }

        if self.cfg.guidance_scale and self.cfg.guidance_scale != 1.0:
            model_fn = make_cfg_model_fn(
                self.model_apply, self.cfg.guidance_scale, B,
                params=params, cond=cond)
        else:
            def model_fn(x, t):
                return self.model_apply(params, x, t, cond)

        shape = (B, cfg.njoints, 1, cfg.n_poses)
        loop = SAMPLE_LOOPS[self.cfg.sampler]
        return loop(self.schedule, model_fn, shape, key, cfg=self.sampler_cfg,
                    noise=noise, skip_timesteps=cfg.skip_timesteps)

    def _generate_impl(self, params, wavlm_params, audio_windows, style, key,
                       noise_windows=None, *, num_windows, host_feats=False):
        cfg = self.cfg
        B = style.shape[0]
        n_seed, n_poses = cfg.n_seed, cfg.n_poses

        if host_feats:
            # features were computed host-side (e.g. the Sphinx-MFCC mode,
            # reference `inference_mfcc` — offline DSP, not jittable);
            # audio_windows already holds (W, n_poses, A)
            feats = audio_windows
        else:
            # One batched audio-encoder pass over all windows, inside the
            # compiled program.
            feats = self.wavlm_apply(wavlm_params, audio_windows)  # (W, n_poses, 1024)

        wa, wb = crossfade_weights(n_seed, B, cfg.crossfade_n)

        def body(carry, xs):
            seed, k = carry
            feats_i, idx, noise_i = xs
            k, sub = jax.random.split(k)
            sample = self._window_sample(params, sub, feats_i, seed, style, noise=noise_i)
            is_first = idx == 0

            if cfg.root_delta_correction:
                # root-translation delta removal (ref `:269-282`)
                delta = (sample[:, 0:3, :, 0] - seed[:, 0:3, :, 0])[..., None]
                corrected = sample.at[:, 0:3].add(-delta)
                sample = jnp.where(is_first, sample, corrected)

            blended_head = seed * wa + sample[..., :n_seed] * wb
            head = jnp.where(is_first, sample[..., :n_seed], blended_head)
            sample = jnp.concatenate([head, sample[..., n_seed:]], axis=-1)

            new_seed = sample[..., -n_seed:]
            return (new_seed, k), sample[..., : n_poses - n_seed]

        seed0 = jnp.zeros((B, cfg.njoints, 1, n_seed), jnp.float32)
        (_, _), chunks = jax.lax.scan(
            body,
            (seed0, key),
            (feats, jnp.arange(num_windows), noise_windows),
        )
        # (W, B, C, 1, stride) → (B, C, 1, W·stride)
        out = jnp.moveaxis(chunks, 0, -2).reshape(
            B, cfg.njoints, 1, num_windows * (n_poses - n_seed)
        )
        return out[..., n_seed:]  # drop warm-up seed frames (ref `:296`)

    def generate(
        self,
        params,
        wavlm_params,
        audio: np.ndarray,
        style: np.ndarray,
        key: jax.Array,
        mean: Optional[np.ndarray] = None,
        std: Optional[np.ndarray] = None,
        noise_windows: Optional[np.ndarray] = None,
        mesh=None,
        window_buckets: Optional[tuple] = None,
        device_out: bool = False,
        transfer_dtype=None,
    ) -> "np.ndarray | jax.Array":
        """Full pipeline: audio → (B, T_frames, njoints) un-normalized poses.

        `audio` is a 1-D 16 kHz waveform; a 2-D array is treated as
        ALREADY-SLICED windows (the output of `slice_audio_windows`),
        host or device — benchmarks pre-stage the windows on device once
        so the timed region measures the chip, not the input transfer.

        `transfer_dtype` (e.g. ``jnp.float16``) casts the finished result
        ON DEVICE before pulling it to the host, halving the output
        transfer bytes — the measured delivered-fps ceiling (dev tunnel
        ~23 MB/s; PCIe on a production host). f16 keeps ~3.3 significant
        digits: ≤0.1° absolute on pose channels spanning ±200, far below
        the SG-filter smoothing the BVH export applies anyway. The
        returned array is converted back to float32. Ignored with
        `device_out=True` (nothing is transferred).

        `device_out=True` keeps the result on device and returns a
        `jax.Array` instead of pulling an `np.ndarray` to the host — see
        the epilogue comment below for why (dev-tunnel output transfer
        caps end-to-end fps at ~5,000 while the chip runs 10-60× faster).

        `noise_windows` (num_windows, B, njoints, 1, n_poses) injects each
        window's initial x_T for deterministic cross-framework comparison.

        `mesh`: a `jax.sharding.Mesh` with a 'data' axis → multi-chip
        serving: the style batch (and injected noise) shard over the axis,
        params/audio features replicate, and GSPMD partitions the whole
        windowed scan — batch-16 throughput scales ~linearly with chips
        since the chains are independent.

        `window_buckets`: pad the window count up to the next bucket (e.g.
        (2, 4, 8, 16)) with zero audio so arbitrary clip lengths reuse a
        few compiled/AOT programs instead of one per length. Padded windows
        are causally downstream of the real ones, so the (truncated) output
        is identical to the unpadded run — equality-tested. The XLA-native
        answer to the reference's dynamic `num_subdivision` Python loop
        (`sample.py:217-224`).
        """
        if getattr(audio, "ndim", 1) == 2:
            windows = audio  # pre-sliced (W, S) windows, host or device
        else:
            windows = slice_audio_windows(
                np.asarray(audio, np.float32), self.cfg)
        num_windows = real_windows = windows.shape[0]
        if num_windows == 0:
            raise ValueError(
                f"audio too short: {len(audio)} samples < one "
                f"{self.cfg.samples_per_stride}-sample window "
                f"({self.cfg.stride / self.cfg.fps:.0f} s at "
                f"{self.cfg.sr} Hz)")
        if window_buckets:
            fits = [b for b in sorted(window_buckets) if b >= num_windows]
            if fits:
                num_windows = fits[0]
                pad = num_windows - real_windows
                windows = np.concatenate(
                    [windows, np.zeros((pad,) + windows.shape[1:], windows.dtype)])
                if noise_windows is not None and pad:
                    noise_windows = np.concatenate([
                        np.asarray(noise_windows),
                        np.zeros((pad,) + np.asarray(noise_windows).shape[1:],
                                 np.float32)])
        style = jnp.atleast_2d(jnp.asarray(style, jnp.float32))
        if noise_windows is not None:
            noise_windows = jnp.asarray(noise_windows, jnp.float32)
        host_feats = bool(getattr(self.wavlm_apply, "host_side", False))
        if host_feats:
            windows = np.asarray(self.wavlm_apply(wavlm_params, windows))
        windows = jnp.asarray(windows)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            batch_shard = NamedSharding(mesh, P("data"))
            repl = NamedSharding(mesh, P())
            style = jax.device_put(style, batch_shard)
            windows = jax.device_put(windows, repl)
            params = jax.device_put(params, repl)
            wavlm_params = jax.device_put(wavlm_params, repl)
            if noise_windows is not None:
                noise_windows = jax.device_put(
                    noise_windows, NamedSharding(mesh, P(None, "data"))
                )
        if self.aot_dir is not None and noise_windows is None and mesh is None:
            out = self._aot_generate(
                params, wavlm_params, windows, style, key,
                num_windows=num_windows, host_feats=host_feats,
            )
        else:
            out = self._generate(
                params, wavlm_params, windows, style, key,
                noise_windows,
                num_windows=num_windows, host_feats=host_feats,
            )
        if device_out:
            # keep the result on device: the epilogue (transpose/crop/
            # unnormalize) runs as a handful of jax ops and the caller gets
            # a jax.Array. Through the dev tunnel the f32 output transfer
            # is ~4.5 KB/frame at ~23 MB/s — it CAPS end-to-end throughput
            # at ~5,000 fps while the chip computes 60-80x faster
            # (KNEE_CLIFF_PROBE.jsonl); on a production host the same
            # transfer rides PCIe and is <2% of wall time. Device-side
            # consumers (eval metrics, chained pipelines, multi-chip
            # serving) should never round-trip the host.
            seq = jnp.transpose(out[:, :, 0], (0, 2, 1))  # (B, T, C)
            seq = seq[:, : real_windows * self.cfg.stride - self.cfg.n_seed]
            return unnormalize_poses(seq, mean, std)
        if transfer_dtype is not None:
            # full epilogue on device, then a narrow cast JUST for the
            # host transfer (see docstring) — unnormalize first so the
            # cast error is on the final values, not amplified by std
            seq = jnp.transpose(out[:, :, 0], (0, 2, 1))
            seq = seq[:, : real_windows * self.cfg.stride - self.cfg.n_seed]
            seq = unnormalize_poses(seq, mean, std).astype(transfer_dtype)
            return np.asarray(seq).astype(np.float32)
        seq = np.asarray(out)[:, :, 0].transpose(0, 2, 1)  # (B, T, C)
        seq = seq[:, : real_windows * self.cfg.stride - self.cfg.n_seed]
        return unnormalize_poses(seq, mean, std)


def generate_multi_clip(
    sampler: "ZeggsSampler",
    params,
    wavlm_params,
    audios,  # sequence of 1-D 16 kHz arrays (different lengths OK)
    styles: np.ndarray,  # (n_clips, 6)
    key,
    mean=None,
    std=None,
    noise_windows=None,  # (w_max, n_clips, njoints, 1, n_poses) injected x_T
):
    """Batched MULTI-CLIP sampling (BASELINE config: saturate the chip).

    Different clips are padded to the max window count and generated as
    one batch through the compiled engine — window w of every clip runs
    in the same denoiser call — then cropped per clip on the host.
    Returns a list of (T_i, njoints) arrays.
    """
    import jax

    cfg = sampler.cfg
    sliced = [slice_audio_windows(np.asarray(a, np.float32), cfg) for a in audios]
    counts = [s.shape[0] for s in sliced]
    w_max = max(counts)
    S = sliced[0].shape[1]
    B = len(audios)

    padded = np.zeros((B, w_max, S), np.float32)
    for i, s in enumerate(sliced):
        padded[i, : s.shape[0]] = s

    # batch the encoder over clips×windows, then scan windows with
    # per-clip features
    flat = padded.reshape(B * w_max, S)
    feats = np.asarray(sampler.wavlm_apply(wavlm_params, jnp.asarray(flat)))
    feats = feats.reshape(B, w_max, cfg.n_poses, -1)

    if noise_windows is not None:
        noise_windows = jnp.asarray(noise_windows, jnp.float32)
    out = _generate_multi(sampler, params, jnp.asarray(feats),
                          jnp.asarray(styles, jnp.float32), key, w_max,
                          noise_windows)
    seq = np.asarray(out)[:, :, 0].transpose(0, 2, 1)  # (B, T_max, C)
    seq = unnormalize_poses(seq, mean, std)
    results = []
    for i, c in enumerate(counts):
        # c == 0 (clip shorter than one stride) must yield an empty result,
        # not a negative-index slice full of padded-window motion
        results.append(seq[i, : max(0, c * cfg.stride - cfg.n_seed)])
    return results


def _generate_multi(sampler, params, feats, styles, key, w_max, noise_windows=None):
    B = styles.shape[0]
    # one jitted runner per (sampler, batch) — rebuilding the jit wrapper
    # per call would retrace the whole window scan on EVERY served batch
    # (and fully recompile without the persistent cache)
    cache = getattr(sampler, "_multi_runners", None)
    if cache is None:
        cache = sampler._multi_runners = {}
    run = cache.get(B)
    if run is None:
        run = cache[B] = _build_multi_runner(sampler, B)
    return run(params, feats, styles, key, noise_windows, num_windows=w_max)


def _build_multi_runner(sampler, B):
    cfg = sampler.cfg
    n_seed, n_poses = cfg.n_seed, cfg.n_poses

    wa, wb = crossfade_weights(sampler.cfg.n_seed, B, cfg.crossfade_n)

    @partial(jax.jit, static_argnames=("num_windows",))
    def run(params, feats, styles, key, noise_windows, *, num_windows):
        def window_sample(params, key, feats_i, seed, style, noise):
            cond = {
                "style": style,
                "seed": seed,
                "audio": feats_i,  # (B, n_poses, A) — per-clip features
                "mask_local": jnp.ones((B, cfg.n_poses), bool),
            }

            if cfg.guidance_scale and cfg.guidance_scale != 1.0:
                # same shared CFG doubling as `ZeggsSampler._window_sample`
                model_fn = make_cfg_model_fn(
                    sampler.model_apply, cfg.guidance_scale, B,
                    params=params, cond=cond)
            else:
                def model_fn(x, t):
                    return sampler.model_apply(params, x, t, cond)

            shape = (B, cfg.njoints, 1, cfg.n_poses)
            loop = SAMPLE_LOOPS[cfg.sampler]
            return loop(sampler.schedule, model_fn, shape, key,
                        cfg=sampler.sampler_cfg, noise=noise,
                        skip_timesteps=cfg.skip_timesteps)

        def body(carry, xs):
            seed, k = carry
            feats_i, idx, noise_i = xs
            k, sub = jax.random.split(k)
            sample = window_sample(params, sub, feats_i, seed, styles, noise_i)
            is_first = idx == 0
            if cfg.root_delta_correction:
                delta = (sample[:, 0:3, :, 0] - seed[:, 0:3, :, 0])[..., None]
                corrected = sample.at[:, 0:3].add(-delta)
                sample = jnp.where(is_first, sample, corrected)
            blended = seed * wa + sample[..., :n_seed] * wb
            head = jnp.where(is_first, sample[..., :n_seed], blended)
            sample = jnp.concatenate([head, sample[..., n_seed:]], axis=-1)
            return (sample[..., -n_seed:], k), sample[..., : n_poses - n_seed]

        seed0 = jnp.zeros((B, cfg.njoints, 1, n_seed), jnp.float32)
        feats_t = jnp.swapaxes(feats, 0, 1)  # (W, B, n_poses, A)
        (_, _), chunks = jax.lax.scan(
            body, (seed0, key), (feats_t, jnp.arange(num_windows), noise_windows)
        )
        out = jnp.moveaxis(chunks, 0, -2).reshape(
            B, cfg.njoints, 1, num_windows * (n_poses - n_seed)
        )
        return out[..., n_seed:]

    return run


def make_mfcc_window_fn(n_poses: int = 88, fps: int = 20):
    """Audio-feature fn for the MFCC conditioning mode.

    Drop-in for the WavLM window encoder in `ZeggsSampler` when the model
    was trained with `audio_feat='mfcc'` (reference `inference_mfcc`,
    `main/mydiffusion_zeggs/sample.py:59-207`): per window, 13 Sphinx
    cepstra at the motion frame rate. Host-side numpy (offline DSP), the
    result feeds the compiled sampler.
    """
    from ..audio import sphinx_mfcc_energy

    def fn(_unused_params, windows) -> jnp.ndarray:
        windows = np.asarray(windows)
        feats = []
        for w in windows:
            m = sphinx_mfcc_energy(w, frate=fps)[:, :-2]  # (T', 13)
            if len(m) < n_poses:
                m = np.pad(m, ((0, n_poses - len(m)), (0, 0)))
            feats.append(m[:n_poses])
        return jnp.asarray(np.stack(feats), jnp.float32)

    fn.host_side = True  # ZeggsSampler runs this OUTSIDE the compiled program
    return fn
