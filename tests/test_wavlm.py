"""WavLM parity tests vs the reference torch implementation (random small cfg)."""
import sys

import numpy as np
import pytest

from conftest import requires_reference, REFERENCE_ROOT

import jax
import jax.numpy as jnp

from diffusestylegesture_tpu.models.wavlm import (
    WavLM,
    WavLMConfig,
    convert_wavlm,
    interpolate_linear,
)

SMALL = dict(
    encoder_layers=2,
    encoder_embed_dim=64,
    encoder_ffn_embed_dim=96,
    encoder_attention_heads=4,
    conv_pos=16,
    conv_pos_groups=4,
    num_buckets=40,
    max_distance=80,
    conv_feature_layers=((24, 10, 5), (24, 3, 2), (24, 2, 2)),
)


def small_cfg(**kw):
    base = dict(SMALL)
    base.update(kw)
    return WavLMConfig(**base)


def _ref_wavlm(jcfg: WavLMConfig):
    import torch

    sys.path.insert(0, f"{REFERENCE_ROOT}/main/mydiffusion_zeggs/WavLM")
    from WavLM import WavLM as RefWavLM, WavLMConfig as RefCfg  # type: ignore

    layers_str = repr([tuple(t) for t in jcfg.conv_feature_layers])
    rcfg = RefCfg(
        dict(
            extractor_mode=jcfg.extractor_mode,
            encoder_layers=jcfg.encoder_layers,
            encoder_embed_dim=jcfg.encoder_embed_dim,
            encoder_ffn_embed_dim=jcfg.encoder_ffn_embed_dim,
            encoder_attention_heads=jcfg.encoder_attention_heads,
            layer_norm_first=jcfg.layer_norm_first,
            conv_feature_layers=layers_str,
            conv_pos=jcfg.conv_pos,
            conv_pos_groups=jcfg.conv_pos_groups,
            relative_position_embedding=jcfg.relative_position_embedding,
            num_buckets=jcfg.num_buckets,
            max_distance=jcfg.max_distance,
            gru_rel_pos=jcfg.gru_rel_pos,
            normalize=jcfg.normalize,
            dropout=0.0,
            attention_dropout=0.0,
            activation_dropout=0.0,
            encoder_layerdrop=0.0,
        )
    )
    torch.manual_seed(0)
    model = RefWavLM(rcfg)
    model.eval()
    return model


def _compare(jcfg, atol=2e-4, S=2000):
    import torch

    ref = _ref_wavlm(jcfg)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {"params": convert_wavlm(sd, jcfg)}
    model = WavLM(jcfg)

    rng = np.random.default_rng(0)
    wav = rng.standard_normal((2, S)).astype(np.float32)
    with torch.no_grad():
        theirs = ref.extract_features(torch.as_tensor(wav))[0].numpy()
    ours = np.asarray(model.apply(params, jnp.asarray(wav)))
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=atol)


@requires_reference
class TestWavLMParity:
    def test_large_style(self):
        # Large layout: layer_norm extractor, pre-LN, rel-pos + gating
        _compare(small_cfg(extractor_mode="layer_norm", layer_norm_first=True))

    def test_base_style(self):
        _compare(
            small_cfg(
                extractor_mode="default",
                layer_norm_first=False,
                normalize=False,
            )
        )

    def test_no_relpos(self):
        _compare(
            small_cfg(
                relative_position_embedding=False,
                gru_rel_pos=False,
            )
        )

    def test_interpolate_parity(self):
        import torch
        import torch.nn.functional as F

        rng = np.random.default_rng(1)
        x = rng.standard_normal((2, 37, 8)).astype(np.float32)
        theirs = (
            F.interpolate(torch.as_tensor(x).transpose(1, 2), size=88,
                          align_corners=True, mode="linear")
            .transpose(1, 2)
            .numpy()
        )
        ours = np.asarray(interpolate_linear(jnp.asarray(x), 88))
        np.testing.assert_allclose(ours, theirs, atol=5e-5)


class TestWavLMShapes:
    def test_frame_rate(self):
        cfg = small_cfg()
        model = WavLM(cfg)
        wav = jnp.zeros((1, 2000))
        params = model.init(jax.random.PRNGKey(0), wav)
        out = model.apply(params, wav)
        # strides 5·2·2 = 20, kernel footprint shrinks a bit
        assert out.shape[0] == 1 and out.shape[2] == cfg.encoder_embed_dim
        assert 90 <= out.shape[1] <= 100


class TestConvSpecParser:
    """`WavLMConfig.from_torch_cfg` must parse fairseq's conv-layer spec
    string without `eval` (VERDICT r2 item 9)."""

    def test_reference_spec(self):
        from diffusestylegesture_tpu.models.wavlm.model import (
            WavLMConfig, _parse_conv_layers)

        s = "[(512,10,5)] + [(512,3,2)] * 4 + [(512,2,2)] * 2"
        layers = _parse_conv_layers(s)
        assert layers == [(512, 10, 5)] + [(512, 3, 2)] * 4 + [(512, 2, 2)] * 2
        cfg = WavLMConfig.from_torch_cfg({"conv_feature_layers": s})
        assert len(cfg.conv_feature_layers) == 7

    def test_rejects_code(self):
        import pytest

        from diffusestylegesture_tpu.models.wavlm.model import _parse_conv_layers

        with pytest.raises(ValueError):
            _parse_conv_layers("__import__('os').system('true')")
        with pytest.raises(ValueError):
            _parse_conv_layers("[(512,10,5)] - [(1,1,1)]")


class TestWavLMBf16Compute:
    """Serving mixed precision: WavLMConfig.dtype=bf16 must run the encoder
    in bf16 COMPUTE (bf16 params alone would silently promote back to f32
    against the f32 wav input), while LayerNorm statistics stay f32 — the
    encoder dominates few-step serving wall time (bench.py)."""

    def _run(self, dtype):
        import dataclasses

        from diffusestylegesture_tpu.utils.precision import bf16_cast

        cfg = small_cfg()
        rng = np.random.default_rng(1)
        wav = rng.standard_normal((2, 2000)).astype(np.float32) * 0.1
        params = WavLM(cfg).init(jax.random.PRNGKey(0), jnp.asarray(wav))
        if dtype == jnp.bfloat16:
            cfg = dataclasses.replace(cfg, dtype=jnp.bfloat16)
            params = bf16_cast(params)
        out = WavLM(cfg).apply(params, jnp.asarray(wav))
        return out

    def test_bf16_close_to_f32_and_actually_bf16(self):
        f32 = np.asarray(self._run(jnp.float32))
        out16 = self._run(jnp.bfloat16)
        # output dtype proves the trunk computed in bf16 (f32 promotion
        # anywhere would re-widen the activations)
        assert out16.dtype == jnp.bfloat16
        b16 = np.asarray(out16, np.float32)
        rms = np.sqrt(np.mean((b16 - f32) ** 2)) / (np.sqrt(np.mean(f32**2)) + 1e-9)
        # 0.02: tighter than the serving gate's BF16_TOL (bench.py) so a
        # precision regression in the encoder (e.g. a lost f32 LayerNorm)
        # fails HERE before it degrades the gated end-to-end number —
        # measured margin at this config is ~0.009
        assert rms < 0.02, rms

    def test_f32_default_unchanged(self):
        out = self._run(jnp.float32)
        assert out.dtype == jnp.float32
