"""Long-form generation engine tests (tiny dims, CPU)."""
import numpy as np

import jax
import jax.numpy as jnp

from diffusestylegesture_tpu import diffusion as D
from diffusestylegesture_tpu.sample import (
    BeatEngineConfig,
    BeatTwhSampler,
    ZeggsEngineConfig,
    ZeggsSampler,
    prepare_seed_gesture,
    slice_audio_windows,
)

NJ = 12
SCHED = D.Schedule.create(D.named_beta_schedule("cosine", 8))


def toy_model_apply(params, x, t, cond, uncond=None):
    """Deterministic pseudo-denoiser that uses seed + style + audio."""
    B, C, _, T = x.shape
    audio_sig = jnp.mean(cond["audio"], axis=-1)  # (B, T) or (B, T_a)
    audio_sig = jnp.resize(audio_sig, (B, T))
    style_sig = jnp.sum(cond["style"], axis=-1)[:, None, None, None]
    seed_sig = jnp.mean(cond["seed"], axis=-1, keepdims=True)
    out = 0.5 * x + 0.1 * seed_sig + 0.01 * style_sig
    if uncond is not None:
        out = out * (1.0 - 0.5 * uncond.astype(jnp.float32)[:, None, None, None])
    return out + 0.001 * audio_sig[:, None, None, :]


def toy_wavlm_apply(params, windows):
    W, S = windows.shape
    feats = jnp.mean(windows.reshape(W, 88, -1), axis=-1, keepdims=True)
    return jnp.broadcast_to(feats, (W, 88, 1024))


class TestZeggsEngine:
    def test_window_slicing(self):
        cfg = ZeggsEngineConfig()
        audio = np.arange(cfg.samples_per_stride * 3 + 100, dtype=np.float32)
        w = slice_audio_windows(audio, cfg)
        assert w.shape == (3, cfg.samples_per_seed + cfg.samples_per_stride)
        # window 0 pad is zeros; window 1 prefix is tail of window 0
        assert (w[0, : cfg.samples_per_seed] == 0).all()
        np.testing.assert_array_equal(
            w[1, : cfg.samples_per_seed], w[0, -cfg.samples_per_seed:]
        )

    def test_generate_shapes_and_determinism(self):
        cfg = ZeggsEngineConfig(njoints=NJ)
        eng = ZeggsSampler(toy_model_apply, toy_wavlm_apply, SCHED, cfg)
        audio = np.random.default_rng(0).standard_normal(cfg.samples_per_stride * 3).astype(np.float32)
        style = np.eye(6, dtype=np.float32)[:1]
        out1 = eng.generate({}, {}, audio, style, jax.random.PRNGKey(7))
        out2 = eng.generate({}, {}, audio, style, jax.random.PRNGKey(7))
        T_expected = 3 * cfg.stride - cfg.n_seed
        assert out1.shape == (1, T_expected, NJ)
        np.testing.assert_array_equal(out1, out2)

    def test_batched_styles_and_guidance(self):
        cfg = ZeggsEngineConfig(njoints=NJ, guidance_scale=2.0, crossfade_n=8)
        eng = ZeggsSampler(toy_model_apply, toy_wavlm_apply, SCHED, cfg)
        audio = np.random.default_rng(1).standard_normal(cfg.samples_per_stride * 2).astype(np.float32)
        style = np.eye(6, dtype=np.float32)[:3]
        out = eng.generate({}, {}, audio, style, jax.random.PRNGKey(0))
        assert out.shape[0] == 3
        assert np.isfinite(out).all()

    def test_unnormalize(self):
        cfg = ZeggsEngineConfig(njoints=NJ)
        eng = ZeggsSampler(toy_model_apply, toy_wavlm_apply, SCHED, cfg)
        audio = np.zeros(cfg.samples_per_stride, np.float32)
        style = np.eye(6, dtype=np.float32)[:1]
        mean = np.full(NJ, 5.0, np.float32)
        std = np.full(NJ, 2.0, np.float32)
        raw = eng.generate({}, {}, audio, style, jax.random.PRNGKey(3))
        scaled = eng.generate({}, {}, audio, style, jax.random.PRNGKey(3), mean=mean, std=std)
        np.testing.assert_allclose(scaled, raw * 2.0 + 5.0, atol=1e-4)


class TestBeatEngine:
    def test_seed_preparation(self):
        rng = np.random.default_rng(0)
        motion_dim = 10
        raw = rng.standard_normal((32, motion_dim)).astype(np.float32)
        mean = raw.mean(0)
        std = raw.std(0) + 1e-6
        seed = prepare_seed_gesture(raw[:32], mean, std)
        assert seed.shape == (30, 30)

    def test_variants(self):
        motion_dim = 8
        njoints = motion_dim * 3
        rng = np.random.default_rng(1)
        for variant, alen in (("attention3", 150), ("attention4", 120), ("attention5", 90)):
            cfg = BeatEngineConfig(njoints=njoints, audio_dim=16, variant=variant)
            eng = BeatTwhSampler(toy_model_apply, SCHED, cfg)
            ta = rng.standard_normal((250, 16)).astype(np.float32)
            win, num, real_n = eng.slice_windows(ta)
            assert num == 3 and real_n == 250
            assert win.shape == (3, alen, 16)
            raw_seed = rng.standard_normal((32, motion_dim)).astype(np.float32)
            mean = np.zeros(motion_dim, np.float32)
            std = np.ones(motion_dim, np.float32)
            seed = prepare_seed_gesture(raw_seed, mean, std)
            kwargs = {}
            if variant == "attention5":
                kwargs["seed_last"] = seed
            out = eng.generate(
                {}, ta, seed, np.eye(4, dtype=np.float32)[:1], jax.random.PRNGKey(0),
                mean, std, **kwargs,
            )
            assert out.shape == (1, 250, motion_dim)
            assert np.isfinite(out).all()


class TestEditing:
    def test_in_between_inpainting(self):
        from diffusestylegesture_tpu.sample.edit import (
            edit_motion,
            feature_mask,
            in_between_mask,
        )

        rng = np.random.default_rng(0)
        shape = (1, NJ, 1, 24)
        ref_motion = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        mask = in_between_mask(shape, prefix_frames=6, suffix_frames=4)

        out = edit_motion(SCHED, lambda x, t: 0.3 * x, ref_motion, mask, jax.random.PRNGKey(0))
        out = np.asarray(out)
        refm = np.asarray(ref_motion)
        # kept regions equal the reference; middle differs
        np.testing.assert_allclose(out[..., :6], refm[..., :6], atol=1e-6)
        np.testing.assert_allclose(out[..., -4:], refm[..., -4:], atol=1e-6)
        assert np.abs(out[..., 6:-4] - refm[..., 6:-4]).max() > 1e-3

        fmask = feature_mask(shape, keep_channels=range(3))
        out2 = np.asarray(
            edit_motion(SCHED, lambda x, t: 0.3 * x, ref_motion, fmask, jax.random.PRNGKey(1))
        )
        np.testing.assert_allclose(out2[:, :3], refm[:, :3], atol=1e-6)
        assert np.abs(out2[:, 3:] - refm[:, 3:]).max() > 1e-3


class TestSkipTimesteps:
    def test_warm_start_differs_and_runs(self):
        """skip_timesteps warm-starts the chain from q_sample(0) at t0
        (ref `gaussian_diffusion.py:700-713`): fewer denoise steps, output
        differs from the full chain but stays finite."""
        cfg_full = ZeggsEngineConfig(njoints=NJ, sampler="ddim")
        cfg_skip = ZeggsEngineConfig(njoints=NJ, sampler="ddim", skip_timesteps=5)
        rng = np.random.default_rng(17)
        audio = rng.standard_normal(cfg_full.samples_per_stride).astype(np.float32)
        style = np.eye(6, dtype=np.float32)[:1]
        noise = rng.standard_normal((1, 1, NJ, 1, cfg_full.n_poses)).astype(np.float32)

        full = ZeggsSampler(toy_model_apply, toy_wavlm_apply, SCHED, cfg_full)
        skip = ZeggsSampler(toy_model_apply, toy_wavlm_apply, SCHED, cfg_skip)
        a = full.generate({}, {}, audio, style, jax.random.PRNGKey(0),
                          noise_windows=noise)
        b = skip.generate({}, {}, audio, style, jax.random.PRNGKey(0),
                          noise_windows=noise)
        assert np.isfinite(b).all()
        assert np.abs(a - b).max() > 1e-4  # genuinely different chain length


class TestBeatServingFeatures:
    def _setup(self, **cfg_kw):
        cfg = BeatEngineConfig(n_poses=22, n_seed=4, njoints=NJ, audio_dim=9,
                               variant="attention4", sampler="ddim", **cfg_kw)
        eng = BeatTwhSampler(toy_model_apply, SCHED, cfg)
        rng = np.random.default_rng(31)
        textaudio = rng.standard_normal((30, 9)).astype(np.float32)
        seed = rng.standard_normal((cfg.n_seed, NJ)).astype(np.float32)
        mean = np.zeros(NJ // 3, np.float32)
        std = np.ones(NJ // 3, np.float32)
        style = np.eye(6, dtype=np.float32)
        return eng, textaudio, seed, mean, std, style

    def test_aot_dir_matches_jit(self, tmp_path):
        import os as _os

        eng, ta, seed, mean, std, style = self._setup()
        want = eng.generate({}, ta, seed, style[:1], jax.random.PRNGKey(4), mean, std)

        eng2 = BeatTwhSampler(toy_model_apply, SCHED, eng.cfg,
                              aot_dir=str(tmp_path / "aot"))
        got = eng2.generate({}, ta, seed, style[:1], jax.random.PRNGKey(4), mean, std)
        assert any(f.endswith(".aotx") for f in _os.listdir(tmp_path / "aot"))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_mesh_matches_single_device(self):
        from diffusestylegesture_tpu.parallel import make_mesh

        eng, ta, seed, mean, std, style = self._setup()
        rng = np.random.default_rng(32)
        noise = rng.standard_normal((2, 8, NJ, 1, 22)).astype(np.float32)
        styles = style[np.arange(8) % 6]
        single = eng.generate({}, ta, seed, styles, jax.random.PRNGKey(5),
                              mean, std, noise_windows=noise)
        sharded = eng.generate({}, ta, seed, styles, jax.random.PRNGKey(5),
                               mean, std, noise_windows=noise, mesh=make_mesh())
        np.testing.assert_allclose(sharded, single, atol=1e-5)


class TestRestyle:
    """DDIM-inversion re-styling. The roundtrip identity only holds for a
    CONSISTENT denoiser (the ODE flows of encode/decode must be the same
    vector field), so the tests use the analytically optimal denoiser for
    Gaussian data: data ~ N(mu(style), s²I) ⇒
    x0*(x,t) = (s²·√ab·x + (1−ab)·mu) / (ab·s² + (1−ab))."""

    S2 = 0.16

    def _model(self, sched):
        from diffusestylegesture_tpu.diffusion import gaussian as G

        def model_apply(x, t, cond):
            ab = G._bcast(sched.alphas_cumprod, t, x.ndim)
            mu = jnp.sum(cond["style"], axis=-1)[:, None, None, None] * 0.2
            return (self.S2 * jnp.sqrt(ab) * x + (1 - ab) * mu) / (
                ab * self.S2 + (1 - ab)
            )

        return model_apply

    def test_roundtrip_converges_first_order(self):
        from diffusestylegesture_tpu import diffusion as D
        from diffusestylegesture_tpu.sample import restyle_window

        rng = np.random.default_rng(21)
        B, C, T = 2, NJ, 16
        motion = jnp.asarray(
            rng.standard_normal((B, C, 1, T)).astype(np.float32) * np.sqrt(self.S2)
        )
        cond = {"style": jnp.zeros((B, 6))}
        errs = {}
        for n in (32, 128):
            sched = D.Schedule.create(D.named_beta_schedule("cosine", n))
            out = restyle_window(sched, self._model(sched), motion, cond, cond)
            errs[n] = float(
                jnp.abs(out - motion).mean() / jnp.abs(motion).mean()
            )
        assert errs[32] < 0.15
        assert errs[128] < 0.35 * errs[32]  # ~first-order convergence

    def test_style_transfer_moves_the_mean(self):
        from diffusestylegesture_tpu import diffusion as D
        from diffusestylegesture_tpu.sample import restyle_window

        rng = np.random.default_rng(22)
        B, C, T = 2, NJ, 16
        sched = D.Schedule.create(D.named_beta_schedule("cosine", 64))
        model = self._model(sched)
        cond_a = {"style": jnp.zeros((B, 6))}  # mu = 0
        cond_b = {"style": jnp.ones((B, 6))}  # mu = 1.2
        motion = jnp.asarray(
            rng.standard_normal((B, C, 1, T)).astype(np.float32) * np.sqrt(self.S2)
        )
        out = restyle_window(sched, model, motion, cond_a, cond_b)
        assert np.isfinite(np.asarray(out)).all()
        # target distribution's mean pulls the output up from ~0
        assert float(jnp.mean(out)) > 0.3
        # partial strength re-styles less than full strength
        partial = restyle_window(
            sched, model, motion, cond_a, cond_b, strength=0.25
        )
        assert float(jnp.mean(partial)) < float(jnp.mean(out))


class TestAotServing:
    def test_aot_dir_roundtrip_matches_jit(self, tmp_path):
        """With aot_dir set, generate() routes through the snapshot path
        and a second sampler instance reloads it; outputs match the plain
        jit path (deterministic toy chain: DDIM)."""
        import os as _os

        cfg = ZeggsEngineConfig(njoints=NJ, sampler="ddim")
        aot_dir = str(tmp_path / "aot")
        rng = np.random.default_rng(13)
        audio = rng.standard_normal(cfg.samples_per_stride).astype(np.float32)
        style = np.eye(6, dtype=np.float32)[:1]
        key = jax.random.PRNGKey(2)

        plain = ZeggsSampler(toy_model_apply, toy_wavlm_apply, SCHED, cfg)
        want = plain.generate({}, {}, audio, style, key)

        s1 = ZeggsSampler(toy_model_apply, toy_wavlm_apply, SCHED, cfg, aot_dir=aot_dir)
        out1 = s1.generate({}, {}, audio, style, key)
        assert any(f.endswith(".aotx") for f in _os.listdir(aot_dir))
        s2 = ZeggsSampler(toy_model_apply, toy_wavlm_apply, SCHED, cfg, aot_dir=aot_dir)
        out2 = s2.generate({}, {}, audio, style, key)
        np.testing.assert_allclose(out1, want, atol=1e-5)
        np.testing.assert_allclose(out2, want, atol=1e-5)


class TestMeshServing:
    def test_sharded_generate_matches_single_device(self):
        """generate(mesh=...) with the batch sharded over 8 virtual devices
        reproduces the single-device output (pure layout change)."""
        from diffusestylegesture_tpu.parallel import make_mesh

        cfg = ZeggsEngineConfig(njoints=NJ)
        eng = ZeggsSampler(toy_model_apply, toy_wavlm_apply, SCHED, cfg)
        rng = np.random.default_rng(6)
        audio = rng.standard_normal(cfg.samples_per_stride * 2).astype(np.float32)
        styles = np.eye(6, dtype=np.float32)[np.arange(8) % 6]
        noise = rng.standard_normal((2, 8, NJ, 1, cfg.n_poses)).astype(np.float32)

        single = eng.generate({}, {}, audio, styles, jax.random.PRNGKey(3),
                              noise_windows=noise)
        mesh = make_mesh()
        sharded = eng.generate({}, {}, audio, styles, jax.random.PRNGKey(3),
                               noise_windows=noise, mesh=mesh)
        np.testing.assert_allclose(sharded, single, atol=1e-5)


class TestMfccMode:
    def test_mfcc_window_fn_through_engine(self):
        """MFCC conditioning path (reference `inference_mfcc`,
        `main/mydiffusion_zeggs/sample.py:59-207`): per-window 13-d Sphinx
        cepstra at the motion rate instead of WavLM features."""
        from diffusestylegesture_tpu.sample import make_mfcc_window_fn

        cfg = ZeggsEngineConfig(njoints=NJ)
        mfcc_fn = make_mfcc_window_fn(n_poses=cfg.n_poses, fps=cfg.fps)
        rng = np.random.default_rng(4)
        audio = rng.standard_normal(cfg.samples_per_stride * 2).astype(np.float32)

        # the feature fn itself: (W, S) → (W, n_poses, 13)
        windows = slice_audio_windows(audio, cfg)
        feats = np.asarray(mfcc_fn(None, windows))
        assert feats.shape == (2, cfg.n_poses, 13)
        assert np.isfinite(feats).all()
        assert np.abs(feats).max() > 0  # real cepstra, not zeros

        eng = ZeggsSampler(toy_model_apply, mfcc_fn, SCHED, cfg)
        out = eng.generate(
            {}, {}, audio, np.eye(6, dtype=np.float32)[:1], jax.random.PRNGKey(0)
        )
        assert out.shape == (1, 2 * cfg.stride - cfg.n_seed, NJ)
        assert np.isfinite(out).all()


class TestMultiClip:
    def test_different_lengths(self):
        from diffusestylegesture_tpu.sample.engine import generate_multi_clip

        cfg = ZeggsEngineConfig(njoints=NJ)
        eng = ZeggsSampler(toy_model_apply, toy_wavlm_apply, SCHED, cfg)
        rng = np.random.default_rng(0)
        audios = [
            rng.standard_normal(cfg.samples_per_stride * 1).astype(np.float32),
            rng.standard_normal(cfg.samples_per_stride * 3).astype(np.float32),
        ]
        styles = np.eye(6, dtype=np.float32)[:2]
        outs = generate_multi_clip(eng, {}, {}, audios, styles, jax.random.PRNGKey(0))
        assert len(outs) == 2
        assert outs[0].shape == (1 * cfg.stride - cfg.n_seed, NJ)
        assert outs[1].shape == (3 * cfg.stride - cfg.n_seed, NJ)
        for o in outs:
            assert np.isfinite(o).all()

    def test_multi_clip_matches_per_clip_runs(self):
        """With injected per-window noise and the deterministic DDIM chain
        (eta=0 — ancestral DDPM draws fresh per-step noise from the key so
        only DDIM is key-independent), each clip of the packed batch equals
        its own single-clip ZeggsSampler.generate run — the padding and
        batching must not change the math. crossfade_n is pinned because the
        reference's crossfade quirk weights by BATCH size (`sample.py:284-288`)
        which would differ between the packed (B=2) and single (B=1) runs."""
        from diffusestylegesture_tpu.sample.engine import generate_multi_clip

        cfg = ZeggsEngineConfig(njoints=NJ, sampler="ddim", crossfade_n=4)
        eng = ZeggsSampler(toy_model_apply, toy_wavlm_apply, SCHED, cfg)
        rng = np.random.default_rng(11)
        counts = [1, 3]
        audios = [
            rng.standard_normal(cfg.samples_per_stride * c).astype(np.float32)
            for c in counts
        ]
        styles = np.eye(6, dtype=np.float32)[:2]
        w_max = max(counts)
        noise = rng.standard_normal((w_max, 2, NJ, 1, cfg.n_poses)).astype(np.float32)

        outs = generate_multi_clip(
            eng, {}, {}, audios, styles, jax.random.PRNGKey(0),
            noise_windows=noise,
        )
        for i, c in enumerate(counts):
            single = eng.generate(
                {}, {}, audios[i], styles[i : i + 1], jax.random.PRNGKey(9),
                noise_windows=noise[:c, i : i + 1],
            )[0]
            np.testing.assert_allclose(outs[i], single, atol=1e-4,
                                       err_msg=f"clip {i}")


class TestWindowBuckets:
    """Window-count bucketing: padded runs equal unpadded runs (the padded
    windows are causally downstream), so a few compiled programs serve all
    clip lengths."""

    def test_zeggs_bucketed_equals_exact(self):
        cfg = ZeggsEngineConfig(njoints=NJ)
        eng = ZeggsSampler(toy_model_apply, toy_wavlm_apply, SCHED, cfg)
        audio = np.random.default_rng(3).standard_normal(
            cfg.samples_per_stride * 3).astype(np.float32)
        style = np.eye(6, dtype=np.float32)[:1]
        exact = eng.generate({}, {}, audio, style, jax.random.PRNGKey(7))
        bucketed = eng.generate({}, {}, audio, style, jax.random.PRNGKey(7),
                                window_buckets=(2, 4, 8))
        np.testing.assert_allclose(bucketed, exact, atol=1e-5)

    def test_zeggs_oversize_falls_back(self):
        cfg = ZeggsEngineConfig(njoints=NJ)
        eng = ZeggsSampler(toy_model_apply, toy_wavlm_apply, SCHED, cfg)
        audio = np.zeros(cfg.samples_per_stride * 3, np.float32)
        style = np.eye(6, dtype=np.float32)[:1]
        out = eng.generate({}, {}, audio, style, jax.random.PRNGKey(0),
                           window_buckets=(1, 2))  # no bucket fits → exact
        assert out.shape[1] == 3 * cfg.stride - cfg.n_seed

    def test_beat_bucketed_equals_exact(self):
        motion_dim = 8
        cfg = BeatEngineConfig(njoints=motion_dim * 3, audio_dim=16,
                               variant="attention4")
        eng = BeatTwhSampler(toy_model_apply, SCHED, cfg)
        rng = np.random.default_rng(4)
        ta = rng.standard_normal((250, 16)).astype(np.float32)
        raw_seed = rng.standard_normal((32, motion_dim)).astype(np.float32)
        mean = np.zeros(motion_dim, np.float32)
        std = np.ones(motion_dim, np.float32)
        seed = prepare_seed_gesture(raw_seed, mean, std)
        style = np.eye(4, dtype=np.float32)[:1]
        exact = eng.generate({}, ta, seed, style, jax.random.PRNGKey(1), mean, std)
        bucketed = eng.generate({}, ta, seed, style, jax.random.PRNGKey(1),
                                mean, std, window_buckets=(4, 8))
        np.testing.assert_allclose(bucketed, exact, atol=1e-5)


class TestReviewRegressions:
    def test_beat_bucketed_exact_stride_multiple(self):
        """real_n ≡ 0 (mod stride): the batch engine keeps the last REAL
        window full; bucketed assembly must not substitute the padded
        window's motion for the final n_seed frames."""
        motion_dim = 8
        cfg = BeatEngineConfig(njoints=motion_dim * 3, audio_dim=16,
                               variant="attention4")
        eng = BeatTwhSampler(toy_model_apply, SCHED, cfg)
        rng = np.random.default_rng(9)
        ta = rng.standard_normal((2 * cfg.stride, 16)).astype(np.float32)
        raw_seed = rng.standard_normal((32, motion_dim)).astype(np.float32)
        mean = np.zeros(motion_dim, np.float32)
        std = np.ones(motion_dim, np.float32)
        seed = prepare_seed_gesture(raw_seed, mean, std)
        style = np.eye(4, dtype=np.float32)[:1]
        exact = eng.generate({}, ta, seed, style, jax.random.PRNGKey(2), mean, std)
        bucketed = eng.generate({}, ta, seed, style, jax.random.PRNGKey(2),
                                mean, std, window_buckets=(4,))
        np.testing.assert_allclose(bucketed, exact, atol=1e-5)

    def test_zeggs_too_short_audio_raises(self):
        cfg = ZeggsEngineConfig(njoints=NJ)
        eng = ZeggsSampler(toy_model_apply, toy_wavlm_apply, SCHED, cfg)
        with np.testing.assert_raises(ValueError):
            eng.generate({}, {}, np.zeros(100, np.float32),
                         np.eye(6, dtype=np.float32)[:1], jax.random.PRNGKey(0))

    def test_multi_clip_short_clip_empty_not_garbage(self):
        from diffusestylegesture_tpu.sample import generate_multi_clip

        cfg = ZeggsEngineConfig(njoints=NJ, crossfade_n=8)
        eng = ZeggsSampler(toy_model_apply, toy_wavlm_apply, SCHED, cfg)
        short = np.zeros(100, np.float32)  # < one stride
        ok = np.random.default_rng(0).standard_normal(
            cfg.samples_per_stride * 2).astype(np.float32)
        styles = np.eye(6, dtype=np.float32)[:2]
        outs = generate_multi_clip(eng, {}, {}, [short, ok], styles,
                                   jax.random.PRNGKey(1))
        assert outs[0].shape[0] == 0
        assert outs[1].shape[0] == 2 * cfg.stride - cfg.n_seed

    def test_multi_clip_respects_guidance_and_skip(self):
        """generate_multi_clip must honour guidance_scale/skip_timesteps
        like the single-clip engine (it silently ignored both)."""
        from diffusestylegesture_tpu.sample import generate_multi_clip

        rng = np.random.default_rng(3)
        audio = rng.standard_normal(
            ZeggsEngineConfig().samples_per_stride).astype(np.float32)
        styles = np.eye(6, dtype=np.float32)[:1]
        outs = {}
        for gs in (0.0, 3.0):
            cfg = ZeggsEngineConfig(njoints=NJ, crossfade_n=8, guidance_scale=gs)
            eng = ZeggsSampler(toy_model_apply, toy_wavlm_apply, SCHED, cfg)
            outs[gs] = generate_multi_clip(eng, {}, {}, [audio], styles,
                                           jax.random.PRNGKey(5))[0]
        assert np.abs(outs[0.0] - outs[3.0]).max() > 1e-4
        cfg = ZeggsEngineConfig(njoints=NJ, crossfade_n=8, skip_timesteps=4)
        eng = ZeggsSampler(toy_model_apply, toy_wavlm_apply, SCHED, cfg)
        skipped = generate_multi_clip(eng, {}, {}, [audio], styles,
                                      jax.random.PRNGKey(5))[0]
        assert np.isfinite(skipped).all()
        assert np.abs(skipped - outs[0.0]).max() > 1e-4


class TestDeviceOut:
    def test_device_out_matches_host_path(self):
        """generate(device_out=True) returns the SAME values as the host
        path, as a jax.Array that never crossed to the host — the serving
        answer to the dev tunnel's output-transfer ceiling
        (KNEE_CLIFF_PROBE.jsonl: ~23 MB/s caps e2e fps at ~5,000 while the
        chip computes 60-80x faster)."""
        cfg = ZeggsEngineConfig(njoints=NJ)
        eng = ZeggsSampler(toy_model_apply, toy_wavlm_apply, SCHED, cfg)
        audio = np.random.default_rng(1).standard_normal(
            cfg.samples_per_stride * 2).astype(np.float32)
        style = np.eye(6, dtype=np.float32)[:2]
        mean = np.random.default_rng(2).standard_normal(NJ).astype(np.float32)
        std = np.abs(np.random.default_rng(3).standard_normal(NJ)) + 0.1
        host = eng.generate({}, {}, audio, style, jax.random.PRNGKey(5),
                            mean=mean, std=std)
        dev = eng.generate({}, {}, audio, style, jax.random.PRNGKey(5),
                           mean=mean, std=std, device_out=True)
        assert isinstance(dev, jax.Array)
        np.testing.assert_allclose(np.asarray(dev), host, rtol=1e-6, atol=1e-6)

    def test_transfer_dtype_halves_bytes_within_f16_error(self):
        """generate(transfer_dtype=f16) returns float32 values equal to
        the full-precision path within f16 rounding (rel ~5e-4) — the
        half-bytes output-transfer mode for tunnel/PCIe-bound serving."""
        cfg = ZeggsEngineConfig(njoints=NJ)
        eng = ZeggsSampler(toy_model_apply, toy_wavlm_apply, SCHED, cfg)
        audio = np.random.default_rng(8).standard_normal(
            cfg.samples_per_stride * 2).astype(np.float32)
        style = np.eye(6, dtype=np.float32)[:1]
        mean = np.random.default_rng(9).standard_normal(NJ).astype(np.float32)
        std = np.abs(np.random.default_rng(10).standard_normal(NJ)) + 0.1
        full = eng.generate({}, {}, audio, style, jax.random.PRNGKey(11),
                            mean=mean, std=std)
        compact = eng.generate({}, {}, audio, style, jax.random.PRNGKey(11),
                               mean=mean, std=std,
                               transfer_dtype=jnp.float16)
        assert compact.dtype == np.float32
        scale = np.maximum(np.abs(full), 1.0)
        assert np.max(np.abs(compact - full) / scale) < 1e-3

    def test_presliced_device_windows_match_host_audio(self):
        """generate() accepts ALREADY-SLICED (W, S) windows, host or
        device — bench.py pre-stages them so its device-side timing
        window excludes the input transfer; values must be identical to
        the 1-D audio path."""
        from diffusestylegesture_tpu.sample.engine import slice_audio_windows

        cfg = ZeggsEngineConfig(njoints=NJ)
        eng = ZeggsSampler(toy_model_apply, toy_wavlm_apply, SCHED, cfg)
        audio = np.random.default_rng(4).standard_normal(
            cfg.samples_per_stride * 2).astype(np.float32)
        style = np.eye(6, dtype=np.float32)[:1]
        host = eng.generate({}, {}, audio, style, jax.random.PRNGKey(7))
        win_dev = jnp.asarray(slice_audio_windows(audio, cfg))
        assert win_dev.ndim == 2
        out = eng.generate({}, {}, win_dev, style, jax.random.PRNGKey(7),
                           device_out=True)
        assert isinstance(out, jax.Array)
        np.testing.assert_allclose(np.asarray(out), host,
                                   rtol=1e-6, atol=1e-6)
