"""CLIP text encoder parity vs HuggingFace's torch CLIPTextModelWithProjection
(the public distribution of the OpenAI CLIP weights the reference's
MDM-legacy path loads via `clip.load('ViT-B/32')`)."""
import numpy as np
import jax.numpy as jnp
import pytest
import torch

from diffusestylegesture_tpu.models import clip_text as ct


@pytest.fixture(scope="module")
def hf_model():
    from transformers import CLIPTextConfig, CLIPTextModelWithProjection

    torch.manual_seed(0)
    # eos_token_id must be the highest vocab id so HF's eos-position
    # pooling and OpenAI's argmax pooling coincide (as they do for the
    # real CLIP vocab, where EOT = 49407 is the max id)
    cfg = CLIPTextConfig(
        vocab_size=120, hidden_size=32, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4,
        max_position_embeddings=16, projection_dim=24,
        hidden_act="quick_gelu", eos_token_id=119,
    )
    return CLIPTextModelWithProjection(cfg).eval()


@pytest.fixture(scope="module")
def our_config():
    return ct.ClipTextConfig(
        vocab_size=120, width=32, layers=3, heads=4,
        context_length=16, projection_dim=24)


@pytest.fixture(scope="module")
def input_ids():
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 100, (4, 16))
    # OpenAI pooling takes the hidden state at argmax(ids) — make the
    # 'EOT' the largest id, at different positions per row
    for row, pos in enumerate([15, 8, 3, 11]):
        ids[row, pos] = 119
    return ids


class TestHFParity:
    def test_text_embeds(self, hf_model, our_config, input_ids):
        params = ct.convert_hf_clip_text(hf_model.state_dict(), layers=3)
        with torch.no_grad():
            ref = hf_model(input_ids=torch.from_numpy(input_ids)).text_embeds.numpy()
        ours = ct.ClipTextEncoder(our_config).apply(
            {"params": params}, jnp.asarray(input_ids))
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)

    def test_openai_format_converter(self, hf_model, our_config, input_ids):
        # synthesize an OpenAI-format state dict from the HF weights
        # (fused qkv, unsuffixed names) and check both converters agree
        hf_sd = hf_model.state_dict()
        sd = {
            "token_embedding.weight": hf_sd["text_model.embeddings.token_embedding.weight"],
            "positional_embedding": hf_sd["text_model.embeddings.position_embedding.weight"],
            "ln_final.weight": hf_sd["text_model.final_layer_norm.weight"],
            "ln_final.bias": hf_sd["text_model.final_layer_norm.bias"],
            "text_projection": hf_sd["text_projection.weight"].T,
        }
        for i in range(3):
            hp = f"text_model.encoder.layers.{i}"
            op = f"transformer.resblocks.{i}"
            sd[f"{op}.attn.in_proj_weight"] = torch.cat(
                [hf_sd[f"{hp}.self_attn.q_proj.weight"],
                 hf_sd[f"{hp}.self_attn.k_proj.weight"],
                 hf_sd[f"{hp}.self_attn.v_proj.weight"]], dim=0)
            sd[f"{op}.attn.in_proj_bias"] = torch.cat(
                [hf_sd[f"{hp}.self_attn.q_proj.bias"],
                 hf_sd[f"{hp}.self_attn.k_proj.bias"],
                 hf_sd[f"{hp}.self_attn.v_proj.bias"]], dim=0)
            sd[f"{op}.attn.out_proj.weight"] = hf_sd[f"{hp}.self_attn.out_proj.weight"]
            sd[f"{op}.attn.out_proj.bias"] = hf_sd[f"{hp}.self_attn.out_proj.bias"]
            sd[f"{op}.ln_1.weight"] = hf_sd[f"{hp}.layer_norm1.weight"]
            sd[f"{op}.ln_1.bias"] = hf_sd[f"{hp}.layer_norm1.bias"]
            sd[f"{op}.ln_2.weight"] = hf_sd[f"{hp}.layer_norm2.weight"]
            sd[f"{op}.ln_2.bias"] = hf_sd[f"{hp}.layer_norm2.bias"]
            sd[f"{op}.mlp.c_fc.weight"] = hf_sd[f"{hp}.mlp.fc1.weight"]
            sd[f"{op}.mlp.c_fc.bias"] = hf_sd[f"{hp}.mlp.fc1.bias"]
            sd[f"{op}.mlp.c_proj.weight"] = hf_sd[f"{hp}.mlp.fc2.weight"]
            sd[f"{op}.mlp.c_proj.bias"] = hf_sd[f"{hp}.mlp.fc2.bias"]
        p_openai = ct.convert_openai_clip_text(sd, layers=3)
        p_hf = ct.convert_hf_clip_text(hf_sd, layers=3)
        a = ct.ClipTextEncoder(our_config).apply(
            {"params": p_openai}, jnp.asarray(input_ids))
        b = ct.ClipTextEncoder(our_config).apply(
            {"params": p_hf}, jnp.asarray(input_ids))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_eot_pooling_position_matters(self, hf_model, our_config, input_ids):
        params = ct.convert_hf_clip_text(hf_model.state_dict(), layers=3)
        moved = input_ids.copy()
        moved[0, 15], moved[0, 5] = moved[0, 5], moved[0, 15]  # move EOT
        a = ct.encode_text(params, input_ids, our_config)
        b = ct.encode_text(params, moved, our_config)
        assert not np.allclose(np.asarray(a[0]), np.asarray(b[0]), atol=1e-3)
        np.testing.assert_allclose(np.asarray(a[1:]), np.asarray(b[1:]), atol=1e-6)
