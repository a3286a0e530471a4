"""Streaming samplers: incremental push/pull equals the batch engines."""
import numpy as np

import jax
import pytest

from diffusestylegesture_tpu import diffusion as D
from diffusestylegesture_tpu.sample import (
    BeatEngineConfig,
    BeatTwhSampler,
    ZeggsEngineConfig,
    ZeggsSampler,
    prepare_seed_gesture,
)
from diffusestylegesture_tpu.sample.streaming import (
    BeatTwhStreamSampler,
    ZeggsStreamSampler,
)
from test_engine import NJ, SCHED, toy_model_apply, toy_wavlm_apply


def _setup(cfg=None):
    cfg = cfg or ZeggsEngineConfig(njoints=NJ)
    eng = ZeggsSampler(toy_model_apply, toy_wavlm_apply, SCHED, cfg)
    style = np.eye(6, dtype=np.float32)[:1]
    return eng, cfg, style


class TestStreamEqualsBatch:
    def test_full_clip_equality(self):
        eng, cfg, style = _setup()
        rng = np.random.default_rng(0)
        audio = rng.standard_normal(cfg.samples_per_stride * 3 + 50).astype(np.float32)
        key = jax.random.PRNGKey(7)
        batch_out = eng.generate({}, {}, audio, style, key)

        stream = ZeggsStreamSampler(eng, {}, {}, style, key)
        chunks = []
        # ragged chunk sizes, unaligned with windows
        for piece in np.array_split(audio, 11):
            chunks += stream.push(piece)
        streamed = np.concatenate(chunks, axis=1)
        assert streamed.shape == batch_out.shape
        np.testing.assert_allclose(streamed, batch_out, atol=1e-5)
        assert stream.frames_emitted == batch_out.shape[1]

    def test_unnormalize_matches(self):
        eng, cfg, style = _setup()
        rng = np.random.default_rng(1)
        audio = rng.standard_normal(cfg.samples_per_stride * 2).astype(np.float32)
        mean = np.full(NJ, 5.0, np.float32)
        std = np.full(NJ, 2.0, np.float32)
        key = jax.random.PRNGKey(3)
        batch_out = eng.generate({}, {}, audio, style, key, mean=mean, std=std)
        stream = ZeggsStreamSampler(eng, {}, {}, style, key, mean=mean, std=std)
        chunks = stream.push(audio)
        streamed = np.concatenate(chunks, axis=1)
        np.testing.assert_allclose(streamed, batch_out, atol=1e-4)

    def test_incomplete_window_stays_buffered(self):
        eng, cfg, style = _setup()
        stream = ZeggsStreamSampler(eng, {}, {}, style, jax.random.PRNGKey(0))
        assert stream.push(np.zeros(cfg.samples_per_stride - 1, np.float32)) == []
        assert stream.frames_emitted == 0
        out = stream.push(np.zeros(1, np.float32))
        assert len(out) == 1
        assert out[0].shape[1] == cfg.stride - cfg.n_seed

    def test_one_program_many_windows(self):
        """All windows reuse one compiled step (traced is_first)."""
        eng, cfg, style = _setup()
        stream = ZeggsStreamSampler(eng, {}, {}, style, jax.random.PRNGKey(1))
        audio = np.random.default_rng(2).standard_normal(
            cfg.samples_per_stride * 4).astype(np.float32)
        chunks = stream.push(audio)
        assert len(chunks) == 4
        assert stream._step._cache_size() == 1

    def test_sessions_share_compiled_step(self):
        eng, cfg, style = _setup()
        s1 = ZeggsStreamSampler(eng, {}, {}, style, jax.random.PRNGKey(1))
        s2 = ZeggsStreamSampler(eng, {}, {}, style, jax.random.PRNGKey(2))
        assert s1._step is s2._step


class TestBeatStreamEqualsBatch:
    MOTION_DIM = 8

    def _setup(self, variant):
        njoints = self.MOTION_DIM * 3
        cfg = BeatEngineConfig(njoints=njoints, audio_dim=16, variant=variant)
        eng = BeatTwhSampler(toy_model_apply, SCHED, cfg)
        rng = np.random.default_rng(5)
        raw_seed = rng.standard_normal((32, self.MOTION_DIM)).astype(np.float32)
        mean = np.zeros(self.MOTION_DIM, np.float32)
        std = np.ones(self.MOTION_DIM, np.float32)
        seed = prepare_seed_gesture(raw_seed, mean, std)
        style = np.eye(4, dtype=np.float32)[:1]
        return eng, cfg, seed, style, mean, std

    @pytest.mark.parametrize("variant", ["attention3", "attention4", "attention5"])
    @pytest.mark.parametrize("n_frames", [250, 240, 100])
    def test_equality(self, variant, n_frames):
        """250: padded tail window; 240: exact stride multiple (batch keeps
        the last window full); 100: single short window."""
        eng, cfg, seed, style, mean, std = self._setup(variant)
        rng = np.random.default_rng(6)
        ta = rng.standard_normal((n_frames, 16)).astype(np.float32)
        key = jax.random.PRNGKey(0)
        kwargs = {"seed_last": seed} if variant == "attention5" else {}
        batch_out = eng.generate({}, ta, seed, style, key, mean, std, **kwargs)

        stream = BeatTwhStreamSampler(eng, {}, seed, style, key, mean, std,
                                      **kwargs)
        chunks = []
        for piece in np.array_split(ta, 7):
            chunks += stream.push(piece)
        chunks += stream.flush()
        streamed = np.concatenate(chunks, axis=1)
        assert streamed.shape == batch_out.shape
        np.testing.assert_allclose(streamed, batch_out, atol=1e-5)

    def test_sessions_share_compiled_step(self):
        eng, cfg, seed, style, mean, std = self._setup("attention4")
        s1 = BeatTwhStreamSampler(eng, {}, seed, style, jax.random.PRNGKey(1), mean, std)
        s2 = BeatTwhStreamSampler(eng, {}, seed, style, jax.random.PRNGKey(2), mean, std)
        assert s1._step is s2._step

    def test_flush_without_push_is_empty(self):
        """flush() on a fresh stream returns [] without running a full
        diffusion window on all-zero features."""
        eng, cfg, seed, style, mean, std = self._setup("attention4")
        stream = BeatTwhStreamSampler(
            eng, {}, seed, style, jax.random.PRNGKey(3), mean, std)
        assert stream.flush() == []


class TestHostFeatsStreaming:
    def test_mfcc_mode_equals_batch(self):
        """The Sphinx-MFCC (host-side) feature mode must stream too — the
        host fn runs outside the jitted step, like the batch engine's
        host_feats branch."""
        from diffusestylegesture_tpu.sample import make_mfcc_window_fn

        cfg = ZeggsEngineConfig(njoints=NJ)
        mfcc_fn = make_mfcc_window_fn(n_poses=cfg.n_poses, fps=cfg.fps)

        def model_apply(params, x, t, cond, uncond=None):
            # shrink the 15-d mfcc cond into the toy model's audio slot
            B, C, _, T = x.shape
            sig = jnp.mean(cond["audio"], axis=-1)[:, None, None, :]
            return 0.5 * x + 0.002 * sig + 0.1 * jnp.mean(
                cond["seed"], axis=-1, keepdims=True)

        import jax.numpy as jnp

        eng = ZeggsSampler(model_apply, mfcc_fn, SCHED, cfg)
        rng = np.random.default_rng(8)
        audio = rng.standard_normal(cfg.samples_per_stride * 2).astype(np.float32)
        style = np.eye(6, dtype=np.float32)[:1]
        key = jax.random.PRNGKey(3)
        batch_out = eng.generate({}, {}, audio, style, key)

        stream = ZeggsStreamSampler(eng, {}, {}, style, key)
        chunks = []
        for piece in np.array_split(audio, 5):
            chunks += stream.push(piece)
        streamed = np.concatenate(chunks, axis=1)
        np.testing.assert_allclose(streamed, batch_out, atol=1e-5)
