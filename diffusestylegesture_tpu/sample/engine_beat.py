"""BEAT/TWH (DiffuseStyleGesture / + / ++) long-form sampling engine.

Parity with `BEAT-TWH-main/mydiffusion_beat_twh/sample.py:44-201`:
  * num_subdivision = ⌈T/(n_poses−n_seed)⌉ over zero-padded text+audio
    features (`:57-73`);
  * per-variant audio window slicing (`:100-138`): attention3 prepends the
    previous window's n_seed audio tail (zeros for window 0); attention4
    feeds the plain stride window; attention5 drops the trailing n_seed;
  * window-0 seed = a real reference clip, z-normalized, with velocity and
    acceleration channels (`:112-129` — prepared by the caller via
    `prepare_seed_gesture`); later windows seed from the previous sample;
  * crossfade quirk preserved (`:166-170`, see ZeggsEngineConfig), no
    root-delta correction (commented out in the reference `:158-165`);
  * assembly: all windows trimmed of the trailing n_seed except the LAST
    (kept full, `:180-188`), drop the first n_seed frames, crop to the
    real frame count, and keep the first njoints/motion_feature_division
    channels (position block, `:173-188`).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion import Schedule, SamplerConfig
from ..diffusion.sampling import make_cfg_model_fn
from .engine import SAMPLE_LOOPS, crossfade_weights


def prepare_seed_gesture(raw: np.ndarray, mean: np.ndarray, std: np.ndarray) -> np.ndarray:
    """(n_seed+2, motion_dim) raw clip → (n_seed, 3·motion_dim) seed with
    vel+acc channels (parity: `sample.py:115-129`)."""
    g = (raw - mean) / std
    vel = g[1:] - g[:-1]
    acc = vel[1:] - vel[:-1]
    return np.concatenate([g[2:], vel[1:], acc], axis=1).astype(np.float32)


@dataclasses.dataclass(frozen=True)
class BeatEngineConfig:
    n_poses: int = 150
    n_seed: int = 30
    njoints: int = 2232  # motion_dim·3
    audio_dim: int = 1435
    variant: str = "attention4"  # attention3 | attention4 | attention5
    motion_feature_division: int = 3  # v0; 1 for v2
    guidance_scale: float = 0.0
    crossfade_n: Optional[int] = None  # None = reference quirk
    sampler: str = "ddpm"  # ddpm | ddim | plms | dpmpp (use a respaced Schedule for ddimN)

    @property
    def stride(self) -> int:
        return self.n_poses - self.n_seed


class BeatTwhSampler:
    def __init__(
        self,
        model_apply: Callable,
        schedule: Schedule,
        cfg: BeatEngineConfig = BeatEngineConfig(),
        sampler_cfg: SamplerConfig = SamplerConfig(),
        aot_dir: Optional[str] = None,
    ):
        """`aot_dir` as in `ZeggsSampler`: executable snapshots keyed by
        (variant, steps, window-count, batch) for tracing-free warm starts."""
        self.model_apply = model_apply
        self.schedule = schedule
        self.cfg = cfg
        self.sampler_cfg = sampler_cfg
        self.aot_dir = aot_dir
        self._aot_runners: dict = {}
        self._generate = jax.jit(self._generate_impl, static_argnames=("num_windows",))

    def _aot_generate(self, params, windows, seed0, style, key, sl, num_windows: int):
        import os

        from ..utils.aot import aot_compile

        B = style.shape[0]
        cache_key = (num_windows, B, sl is not None)
        runner = self._aot_runners.get(cache_key)
        if runner is None:
            import hashlib

            cfg_tag = hashlib.sha1(
                repr((self.cfg, self.sampler_cfg)).encode()
            ).hexdigest()[:8]
            name = (
                f"beat_{self.cfg.variant}_{self.cfg.sampler}"
                f"{self.schedule.num_timesteps}_nj{self.cfg.njoints}"
                f"_W{num_windows}_B{B}_{cfg_tag}.aotx"
            )
            path = os.path.join(self.aot_dir, name)

            def engine_fn(p, w, s0, st, k, s_last):
                return self._generate_impl(
                    p, w, s0, st, k, s_last, None, num_windows=num_windows
                )

            runner = aot_compile(
                engine_fn, (params, windows, seed0, style, key, sl), path
            )
            self._aot_runners[cache_key] = runner
        return runner(params, windows, seed0, style, key, sl)

    def slice_windows(self, textaudio: np.ndarray):
        """(T, A) fused features → per-window model audio inputs."""
        cfg = self.cfg
        stride = cfg.stride
        real_n = textaudio.shape[0]
        num = max(1, -(-real_n // stride))
        pad = num * stride - real_n
        ta = np.concatenate(
            [textaudio, np.zeros((pad, cfg.audio_dim), textaudio.dtype)], axis=0
        )
        main = ta.reshape(num, stride, cfg.audio_dim)
        if cfg.variant == "attention3":
            prev = np.zeros((num, cfg.n_seed, cfg.audio_dim), ta.dtype)
            prev[1:] = main[:-1, -cfg.n_seed:]
            return np.concatenate([prev, main], axis=1), num, real_n
        if cfg.variant == "attention4":
            return main, num, real_n
        if cfg.variant == "attention5":
            return main[:, : stride - cfg.n_seed], num, real_n
        raise ValueError(cfg.variant)

    def _window_sample(self, params, key, audio_i, seed, style, seed_last, noise=None):
        cfg = self.cfg
        B = style.shape[0]
        cond = {
            "style": style,
            "seed": seed,
            "audio": jnp.broadcast_to(audio_i[None], (B,) + audio_i.shape),
            "mask_local": jnp.ones((B, cfg.n_poses), bool),
        }
        if seed_last is not None:
            cond["seed_last"] = seed_last

        if cfg.guidance_scale and cfg.guidance_scale != 1.0:
            model_fn = make_cfg_model_fn(
                self.model_apply, cfg.guidance_scale, B,
                params=params, cond=cond)
        else:
            def model_fn(x, t):
                return self.model_apply(params, x, t, cond)

        shape = (B, cfg.njoints, 1, cfg.n_poses)
        loop = SAMPLE_LOOPS[cfg.sampler]
        return loop(self.schedule, model_fn, shape, key, cfg=self.sampler_cfg, noise=noise)

    def _generate_impl(
        self, params, audio_windows, seed0, style, key, seed_last,
        noise_windows=None, *, num_windows
    ):
        cfg = self.cfg
        n_seed = cfg.n_seed
        B = style.shape[0]

        wa, wb = crossfade_weights(cfg.n_seed, B, cfg.crossfade_n)

        def body(carry, xs):
            seed, k = carry
            audio_i, idx, noise_i = xs
            k, sub = jax.random.split(k)
            sample = self._window_sample(
                params, sub, audio_i, seed, style, seed_last, noise=noise_i
            )
            is_first = idx == 0
            blended = seed * wa + sample[..., :n_seed] * wb
            head = jnp.where(is_first, sample[..., :n_seed], blended)
            sample = jnp.concatenate([head, sample[..., n_seed:]], axis=-1)
            return (sample[..., -n_seed:], k), sample

        (_, _), samples = jax.lax.scan(
            body, (seed0, key),
            (audio_windows, jnp.arange(num_windows), noise_windows),
        )
        return samples  # (W, B, C, 1, n_poses)

    def generate(
        self,
        params,
        textaudio: np.ndarray,
        seed_gesture: np.ndarray,
        style: np.ndarray,
        key: jax.Array,
        mean: np.ndarray,
        std: np.ndarray,
        seed_last: Optional[np.ndarray] = None,
        max_len: int = 0,
        noise_windows: Optional[np.ndarray] = None,
        mesh=None,
        window_buckets: Optional[tuple] = None,
    ) -> np.ndarray:
        """→ (B, real_n_frames, motion_dim) un-normalized position block.

        `noise_windows` (num_windows, B, njoints, 1, n_poses) injects each
        window's initial x_T (deterministic cross-framework comparison).
        `mesh`: shard the style batch over the mesh's 'data' axis
        (multi-chip serving, as in `ZeggsSampler.generate`).
        `window_buckets`: pad the window count to the next bucket with zero
        features so arbitrary clip lengths reuse a few compiled programs;
        the `real_n` crop already discards the padded tail (equality-tested,
        see `ZeggsSampler.generate`).
        """
        cfg = self.cfg
        if max_len:
            textaudio = textaudio[:max_len]
        windows, num, real_n = self.slice_windows(np.asarray(textaudio, np.float32))
        real_num = num
        if window_buckets:
            fits = [b for b in sorted(window_buckets) if b >= num]
            if fits:
                pad = fits[0] - num
                num = fits[0]
                windows = np.concatenate(
                    [windows, np.zeros((pad,) + windows.shape[1:], windows.dtype)])
                if noise_windows is not None and pad:
                    noise_windows = np.concatenate([
                        np.asarray(noise_windows),
                        np.zeros((pad,) + np.asarray(noise_windows).shape[1:],
                                 np.float32)])
        style = jnp.atleast_2d(jnp.asarray(style, jnp.float32))
        B = style.shape[0]
        if noise_windows is not None:
            noise_windows = jnp.asarray(noise_windows, jnp.float32)
        seed0 = jnp.asarray(seed_gesture.T[None, :, None, :], jnp.float32)  # (1,C,1,n_seed)
        seed0 = jnp.broadcast_to(seed0, (B,) + seed0.shape[1:])
        sl = None
        if seed_last is not None:
            sl = jnp.broadcast_to(
                jnp.asarray(seed_last.T[None, :, None, :], jnp.float32),
                (B, cfg.njoints, 1, cfg.n_seed),
            )
        windows = jnp.asarray(windows)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            batch_shard = NamedSharding(mesh, P("data"))
            repl = NamedSharding(mesh, P())
            style = jax.device_put(style, batch_shard)
            seed0 = jax.device_put(seed0, batch_shard)
            windows = jax.device_put(windows, repl)
            params = jax.device_put(params, repl)
            if sl is not None:
                sl = jax.device_put(sl, batch_shard)
            if noise_windows is not None:
                noise_windows = jax.device_put(
                    noise_windows, NamedSharding(mesh, P(None, "data"))
                )
        if self.aot_dir is not None and noise_windows is None and mesh is None:
            samples = self._aot_generate(params, windows, seed0, style, key, sl, num)
        else:
            samples = self._generate(
                params, windows, seed0, style, key, sl, noise_windows,
                num_windows=num,
            )
        samples = np.asarray(samples)  # (W, B, C, 1, n_poses)
        keep = cfg.njoints // cfg.motion_feature_division
        samples = samples[:, :, :keep, 0]  # (W, B, keep, n_poses)
        # assemble from the REAL windows only: the last real window is the
        # one kept full (ref `:180-188`) — bucket-padded windows are
        # generated (causally downstream) but must never reach the output
        parts = [samples[i][..., : cfg.stride] for i in range(real_num - 1)]
        parts.append(samples[real_num - 1])
        seq = np.concatenate(parts, axis=-1).transpose(0, 2, 1)  # (B, T, keep)
        seq = seq[:, cfg.n_seed:]
        seq = seq * np.asarray(std) + np.asarray(mean)
        return seq[:, :real_n]
