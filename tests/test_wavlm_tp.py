"""Tensor-parallel WavLM tests (`parallel.tp.wavlm_param_specs`).

The reference runs WavLM-Large single-GPU through torch
(`main/mydiffusion_zeggs/WavLM/WavLM.py`); TP sharding of the 317 M-param
encoder is a beyond-parity scaling feature, so correctness is equality
with the unsharded forward on the virtual mesh.
"""
import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from diffusestylegesture_tpu.models.wavlm import WavLM, WavLMConfig
from diffusestylegesture_tpu.parallel import make_mesh, wavlm_param_specs


def _small_wavlm():
    # same recipe as __graft_entry__'s serving leg: tiny depth, real
    # architecture (conv extractor, conv-pos, gated rel-pos bias)
    cfg = WavLMConfig(
        encoder_layers=2, encoder_embed_dim=64, encoder_ffn_embed_dim=96,
        encoder_attention_heads=4, conv_pos=16, conv_pos_groups=4,
        num_buckets=40, max_distance=80,
        conv_feature_layers=((24, 10, 5), (24, 3, 2), (24, 2, 2)),
    )
    model = WavLM(cfg)
    wav = jnp.asarray(
        np.random.default_rng(0).standard_normal((4, 4000)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), wav)
    return model, params, wav


class TestSpecs:
    def test_megatron_pairing(self):
        _, params, _ = _small_wavlm()
        specs = wavlm_param_specs(params["params"])
        l0 = specs["layers_0"]["self_attn"]
        assert l0["q_proj"]["kernel"] == P(None, "model")
        assert l0["q_proj"]["bias"] == P("model")
        assert l0["out_proj"]["kernel"] == P("model", None)
        assert l0["out_proj"]["bias"] == P()
        assert specs["layers_0"]["fc1"]["kernel"] == P(None, "model")
        assert specs["layers_0"]["fc2"]["kernel"] == P("model", None)
        # per-head gated-rel-pos state shards on H
        assert l0["relative_attention_bias"] == P(None, "model")
        assert l0["grep_a"] == P(None, "model", None, None)
        # conv extractor / pos conv / norms replicate
        for leaf in jax.tree.leaves(specs["feature_extractor"]):
            assert leaf == P()
        for leaf in jax.tree.leaves(specs["pos_conv"]):
            assert leaf == P()

    def test_tp_forward_matches_single_device(self):
        model, params, wav = _small_wavlm()
        ref = model.apply(params, wav)

        mesh = make_mesh(axes=("data", "model"), shape=(2, 4),
                         devices=jax.devices()[:8])
        specs = wavlm_param_specs(params["params"])
        sharded = {
            "params": jax.tree.map(
                lambda p, s: jax.device_put(p, NamedSharding(mesh, s)),
                dict(params["params"]), jax.tree.map(lambda s: s, specs),
            )
        }
        wav_s = jax.device_put(wav, NamedSharding(mesh, P("data")))
        with mesh:
            out = jax.jit(lambda v, w: model.apply(v, w))(sharded, wav_s)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)
