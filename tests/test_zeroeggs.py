"""ZeroEGGS RNN system parity tests vs the reference torch modules."""
import sys

import numpy as np
import pytest

from conftest import requires_reference, REFERENCE_ROOT

import jax
import jax.numpy as jnp

from diffusestylegesture_tpu.models import convert
from diffusestylegesture_tpu.models.zeroeggs import (
    CellStateEncoder,
    RecurrentDecoderNormal,
    SpeechEncoder,
    StyleEncoderVAE,
    ZeroEGGSConfig,
    ZeroEGGSDecoder,
    kl_divergence,
)

NJ = 5
POSE_IN = NJ * 15 + 9
POSE_OUT = NJ * 15 + 6
HID = 32
SPEECH = 12
STYLE = 8


def _ref_modules():
    import torch

    sys.path.insert(0, f"{REFERENCE_ROOT}/ubisoft-laforge-ZeroEGGS-main/ZEGGS")
    import pdb as _pdb

    _pdb.set_trace = lambda *a, **k: None  # Decoder.forward has a live set_trace
    import modules as ref  # type: ignore

    assert "ubisoft" in ref.__file__
    torch.manual_seed(0)
    return ref


class TestComponents:
    @requires_reference
    def test_speech_encoder(self):
        import torch

        ref_mod = _ref_modules()
        ref = ref_mod.SpeechEncoder(7, HID, SPEECH)
        ref.eval()
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 40, 7)).astype(np.float32)
        with torch.no_grad():
            theirs = ref(torch.as_tensor(x)).numpy()
        params = {"params": convert.convert_zeroeggs_speech_encoder(ref.state_dict())}
        ours = np.asarray(SpeechEncoder(HID, SPEECH).apply(params, jnp.asarray(x)))
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    @requires_reference
    def test_style_encoder_vae_mu(self):
        import torch

        ref_mod = _ref_modules()
        ref = ref_mod.StyleEncoder(9, HID, STYLE, type="gru", use_vae=True)
        ref.eval()
        rng = np.random.default_rng(1)
        x = rng.standard_normal((2, 25, 9)).astype(np.float32)
        with torch.no_grad():
            _, mu_t, logvar_t = ref(torch.as_tensor(x))
        params = {"params": convert.convert_zeroeggs_style_encoder(ref.state_dict())}
        _, mu, logvar = StyleEncoderVAE(HID, STYLE).apply(params, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(mu), mu_t.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(logvar), logvar_t.numpy(), atol=1e-5)

    @requires_reference
    def test_decoder_rollout(self):
        import torch

        ref_mod = _ref_modules()
        ref = ref_mod.Decoder(POSE_IN, POSE_OUT, SPEECH, STYLE, HID, 2, rnn_cond="normal")
        ref.eval()

        rng = np.random.default_rng(2)
        B, T = 2, 6
        q = rng.standard_normal((B, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        state = dict(
            root_pos=rng.standard_normal((B, 3)).astype(np.float32),
            root_rot=q,
            root_vel=rng.standard_normal((B, 3)).astype(np.float32) * 0.1,
            root_vrt=rng.standard_normal((B, 3)).astype(np.float32) * 0.1,
            lpos=rng.standard_normal((B, NJ, 3)).astype(np.float32),
            ltxy=rng.standard_normal((B, NJ, 2, 3)).astype(np.float32),
            lvel=rng.standard_normal((B, NJ, 3)).astype(np.float32) * 0.1,
            lvrt=rng.standard_normal((B, NJ, 3)).astype(np.float32) * 0.1,
        )
        gaze = rng.standard_normal((B, T, 3)).astype(np.float32)
        speech = rng.standard_normal((B, T, SPEECH)).astype(np.float32)
        style = rng.standard_normal((B, T, STYLE)).astype(np.float32)
        in_mean = rng.standard_normal(POSE_IN).astype(np.float32) * 0.1
        in_std = (rng.uniform(0.5, 2.0, POSE_IN)).astype(np.float32)
        out_mean = rng.standard_normal(POSE_OUT).astype(np.float32) * 0.1
        out_std = (rng.uniform(0.5, 2.0, POSE_OUT)).astype(np.float32)

        with torch.no_grad():
            t = {k: torch.as_tensor(v) for k, v in state.items()}
            ref_out = ref(
                t["root_pos"], t["root_rot"], t["root_vel"], t["root_vrt"],
                t["lpos"], t["ltxy"], t["lvel"], t["lvrt"],
                torch.as_tensor(gaze), torch.as_tensor(speech), torch.as_tensor(style),
                None,
                torch.as_tensor(in_mean), torch.as_tensor(in_std),
                torch.as_tensor(out_mean), torch.as_tensor(out_std),
                1.0 / 60.0,
            )
        rp_ref, rr_ref, lp_ref, lt_ref = (
            ref_out[0].numpy(), ref_out[1].numpy(), ref_out[4].numpy(), ref_out[5].numpy()
        )

        cfg = ZeroEGGSConfig(
            njoints=NJ, pose_input_size=POSE_IN, pose_output_size=POSE_OUT,
            speech_encoding_size=SPEECH, style_embedding_size=STYLE,
            hidden_size=HID, num_rnn_layers=2,
        )
        model = ZeroEGGSDecoder(cfg)
        params = {"params": convert.convert_zeroeggs_decoder(ref.state_dict(), 2)}
        init = tuple(jnp.asarray(state[k]) for k in
                     ("root_pos", "root_rot", "root_vel", "root_vrt", "lpos", "ltxy", "lvel", "lvrt"))
        rp, rr, lp, lt = model.apply(
            params, init, jnp.asarray(gaze), jnp.asarray(speech), jnp.asarray(style),
            jnp.asarray(in_mean), jnp.asarray(in_std), jnp.asarray(out_mean), jnp.asarray(out_std),
        )
        np.testing.assert_allclose(np.asarray(rp), rp_ref, atol=2e-4)
        np.testing.assert_allclose(np.asarray(rr), rr_ref, atol=2e-4)
        np.testing.assert_allclose(np.asarray(lp), lp_ref, atol=2e-4)
        np.testing.assert_allclose(np.asarray(lt), lt_ref, atol=2e-4)


class TestSelf:
    def test_kl(self):
        mu = jnp.zeros((4, 8))
        logvar = jnp.zeros((4, 8))
        assert float(kl_divergence(mu, logvar)) < 1e-6

    def test_rollout_shapes(self):
        cfg = ZeroEGGSConfig(
            njoints=NJ, pose_input_size=POSE_IN, pose_output_size=POSE_OUT,
            speech_encoding_size=SPEECH, style_embedding_size=STYLE,
            hidden_size=HID, num_rnn_layers=2,
        )
        rng = np.random.default_rng(3)
        B, T = 2, 5
        q = np.tile(np.array([1, 0, 0, 0], np.float32), (B, 1))
        init = (
            jnp.zeros((B, 3)), jnp.asarray(q), jnp.zeros((B, 3)), jnp.zeros((B, 3)),
            jnp.zeros((B, NJ, 3)), jnp.zeros((B, NJ, 2, 3)), jnp.zeros((B, NJ, 3)),
            jnp.zeros((B, NJ, 3)),
        )
        model = ZeroEGGSDecoder(cfg)
        args = (
            init, jnp.zeros((B, T, 3)), jnp.zeros((B, T, SPEECH)), jnp.zeros((B, T, STYLE)),
            jnp.zeros(POSE_IN), jnp.ones(POSE_IN), jnp.zeros(POSE_OUT), jnp.ones(POSE_OUT),
        )
        params = model.init(jax.random.PRNGKey(0), *args)
        rp, rr, lp, lt = model.apply(params, *args)
        assert rp.shape == (B, T, 3) and rr.shape == (B, T, 4)
        assert lp.shape == (B, T, NJ, 3) and lt.shape == (B, T, NJ, 2, 3)


class TestGenerator:
    def test_generate_and_blends(self):
        from diffusestylegesture_tpu.sample.engine_zeroeggs import (
            ZeroEggsGenerator,
            blend_style_encodings,
            split_by_ratio,
        )

        cfg = ZeroEGGSConfig(
            njoints=NJ, pose_input_size=POSE_IN, pose_output_size=POSE_OUT,
            speech_encoding_size=SPEECH, style_embedding_size=STYLE,
            hidden_size=HID, num_rnn_layers=2,
        )
        rng = np.random.default_rng(4)
        A = 11
        key = jax.random.PRNGKey(0)

        sp_enc = SpeechEncoder(hidden_size=cfg.hidden_size, output_size=SPEECH)
        sp_params = sp_enc.init(key, jnp.zeros((1, 8, A)))
        st_enc = StyleEncoderVAE(cfg.hidden_size, STYLE)
        st_params = st_enc.init(key, jnp.zeros((1, 9, POSE_IN)))
        dec = ZeroEGGSDecoder(cfg)
        q = np.tile(np.array([1, 0, 0, 0], np.float32), (1, 1))
        init1 = (
            jnp.zeros((1, 3)), jnp.asarray(q), jnp.zeros((1, 3)), jnp.zeros((1, 3)),
            jnp.zeros((1, NJ, 3)), jnp.zeros((1, NJ, 2, 3)), jnp.zeros((1, NJ, 3)),
            jnp.zeros((1, NJ, 3)),
        )
        dec_params = dec.init(
            key, init1, jnp.zeros((1, 4, 3)), jnp.zeros((1, 4, SPEECH)),
            jnp.zeros((1, 4, STYLE)), jnp.zeros(POSE_IN), jnp.ones(POSE_IN),
            jnp.zeros(POSE_OUT), jnp.ones(POSE_OUT),
        )

        stats = dict(
            audio_input_mean=np.zeros(A, np.float32), audio_input_std=np.ones(A, np.float32),
            anim_input_mean=np.zeros(POSE_IN, np.float32), anim_input_std=np.ones(POSE_IN, np.float32),
            anim_output_mean=np.zeros(POSE_OUT, np.float32), anim_output_std=np.ones(POSE_OUT, np.float32),
        )
        gen = ZeroEggsGenerator(cfg, sp_params, st_params, dec_params, stats)

        ex = rng.standard_normal((9, POSE_IN)).astype(np.float32)
        z1 = gen.encode_style(ex)
        z2 = gen.encode_style(ex * -1.0)
        assert z1.shape == (1, STYLE)

        audio = rng.standard_normal((12, A)).astype(np.float32)
        first = tuple(np.asarray(x[0]) for x in init1)
        rp, rr, lp, lt = gen.generate(audio, [z1, z2], first, blend_type="add")
        assert rp.shape[1] == 12 and lt.shape[2] == NJ

        rp2, *_ = gen.generate(audio, [z1, z2], first, blend_type="stitch",
                               blend_ratio=[0.3, 0.7])
        assert rp2.shape == rp.shape

        segs = split_by_ratio(10, [0.3, 0.7])
        assert sum(len(s) for s in segs) == 10

        sched = blend_style_encodings([z1, z2], 10, "stitch", [0.5, 0.5])
        assert sched.shape == (1, 10, STYLE)
        np.testing.assert_allclose(np.asarray(sched[0, 0]), np.asarray(z1[0]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(sched[0, -1]), np.asarray(z2[0]), atol=1e-6)


class TestZeroEggsTraining:
    def test_train_step_decreases_loss(self):
        from diffusestylegesture_tpu.models.zeroeggs import make_zeroeggs_train_step

        cfg = ZeroEGGSConfig(
            njoints=NJ, pose_input_size=POSE_IN, pose_output_size=POSE_OUT,
            speech_encoding_size=SPEECH, style_embedding_size=STYLE,
            hidden_size=HID, num_rnn_layers=2,
        )
        key = jax.random.PRNGKey(0)
        A = 7
        sp = SpeechEncoder(hidden_size=HID, output_size=SPEECH)
        st = StyleEncoderVAE(HID, STYLE)
        dec = ZeroEGGSDecoder(cfg)

        rng = np.random.default_rng(5)
        B, T = 2, 6
        q = np.tile(np.array([1, 0, 0, 0], np.float32), (B, 1))
        init_state = (
            jnp.zeros((B, 3)), jnp.asarray(q), jnp.zeros((B, 3)), jnp.zeros((B, 3)),
            jnp.zeros((B, NJ, 3)), jnp.zeros((B, NJ, 2, 3)), jnp.zeros((B, NJ, 3)),
            jnp.zeros((B, NJ, 3)),
        )
        params = {
            "speech": sp.init(key, jnp.zeros((B, T, A))),
            "style": st.init(key, jnp.zeros((B, 9, POSE_IN))),
            "decoder": dec.init(
                key, init_state, jnp.zeros((B, T, 3)), jnp.zeros((B, T, SPEECH)),
                jnp.zeros((B, T, STYLE)), jnp.zeros(POSE_IN), jnp.ones(POSE_IN),
                jnp.zeros(POSE_OUT), jnp.ones(POSE_OUT),
            ),
        }
        stats = dict(
            audio_input_mean=jnp.zeros(A), audio_input_std=jnp.ones(A),
            anim_input_mean=jnp.zeros(POSE_IN), anim_input_std=jnp.ones(POSE_IN),
            anim_output_mean=jnp.zeros(POSE_OUT), anim_output_std=jnp.ones(POSE_OUT),
        )
        batch = dict(
            initial_state=init_state,
            gaze=jnp.zeros((B, T, 3)),
            audio_features=jnp.asarray(rng.standard_normal((B, T, A)).astype(np.float32)),
            style_example=jnp.asarray(rng.standard_normal((B, 9, POSE_IN)).astype(np.float32)),
            target_root_pos=jnp.asarray(rng.standard_normal((B, T, 3)).astype(np.float32) * 0.1),
            target_root_rot=jnp.broadcast_to(jnp.asarray(q)[:, None], (B, T, 4)),
            target_lpos=jnp.zeros((B, T, NJ, 3)),
            target_ltxy=jnp.zeros((B, T, NJ, 2, 3)),
        )
        init_fn, step_fn = make_zeroeggs_train_step(sp, st, dec, stats, lr=1e-3)
        step_fn = jax.jit(step_fn, static_argnames=())
        opt_state = init_fn(params)
        losses = []
        for i in range(8):
            # fixed VAE key so the loss comparison is apples-to-apples
            params, opt_state, aux = step_fn(params, opt_state, batch, jax.random.PRNGKey(0), i)
            losses.append(float(aux["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]


@requires_reference
class TestStyleEncoderAttn:
    def test_parity(self):
        import torch

        from diffusestylegesture_tpu.models.zeroeggs import StyleEncoderAttn

        ref_mod = _ref_modules()
        ref = ref_mod.StyleEncoderAttn(9, HID, STYLE)
        ref.eval()
        rng = np.random.default_rng(7)
        x = rng.standard_normal((2, 25, 9)).astype(np.float32)
        with torch.no_grad():
            theirs = ref(torch.as_tensor(x)).numpy()
        from diffusestylegesture_tpu.models.convert import (
            convert_zeroeggs_style_encoder_attn,
        )

        params = {"params": convert_zeroeggs_style_encoder_attn(ref.state_dict())}
        ours = np.asarray(StyleEncoderAttn(HID, STYLE).apply(params, jnp.asarray(x)))
        np.testing.assert_allclose(ours, theirs, atol=2e-5)


class TestZeroEggsData:
    def test_audio_features(self):
        from diffusestylegesture_tpu.data.zeroeggs_data import audio_features

        from test_audio import synth_wav

        y = synth_wav(2.0)
        T = int(2.0 * 60)
        feats = audio_features(y, 16000, 60.0, T)
        assert feats.shape == (T, 81)
        assert np.isfinite(feats).all()
        # energy channel correlates with the bursty envelope
        assert feats[:, -1].std() > 0

    def test_window_index(self):
        from diffusestylegesture_tpu.data.zeroeggs_data import window_index

        R, L, S = window_index([(0, 20), (100, 115)], [2, 0], nlabels=3, window=10)
        assert R.shape == (10 + 5, 10)
        assert (L[:10] == [0, 0, 1]).all()
        assert S[-1] == 1

    def test_feature_statistics(self):
        from diffusestylegesture_tpu.data.zeroeggs_data import feature_statistics

        rng = np.random.default_rng(0)
        st = feature_statistics({"anim_input": rng.standard_normal((100, 5))})
        assert st["anim_input_mean"].shape == (5,)
        assert (st["anim_input_std"] > 0).all()
