"""Sampling CLI integration: torch checkpoints → cli.sample → BVH on disk.

Covers the reference demo flow (`main/mydiffusion_zeggs/sample.py:400-420`):
a converted torch MDM checkpoint + WavLM .pt + wav with the style token in
the filename, through the compiled windowed sampler, to a written .bvh.
"""
import os

import numpy as np
import pytest
import yaml

from conftest import requires_reference

from test_ref_e2e_parity import MDM_KW, NJOINTS, WAVLM_KW, _build_reference_models


@requires_reference
@pytest.mark.parametrize(
    "serve_fast,extra,n_out",
    [
        (False, [], 1),
        (True, [], 1),
        (False, ["--sampler", "dpmpp", "--respace", "2"], 1),
        (False, ["--styles", "Happy,Sad"], 2),
    ],
    ids=["f32", "fast", "dpmpp", "styles"],
)
def test_sample_cli_end_to_end(tmp_path, serve_fast, extra, n_out):
    import torch

    from diffusestylegesture_tpu.cli import sample as sample_cli
    from diffusestylegesture_tpu.motion import bvh

    _, ref_mdm, ref_wavlm, jcfg = _build_reference_models()

    # --- checkpoints in the formats the CLI loaders expect ---
    mdm_pt = str(tmp_path / "model000000100.pt")
    torch.save(ref_mdm.state_dict(), mdm_pt)
    wavlm_pt = str(tmp_path / "WavLM-Small.pt")
    cfg_dict = dict(
        extractor_mode=jcfg.extractor_mode,
        encoder_layers=jcfg.encoder_layers,
        encoder_embed_dim=jcfg.encoder_embed_dim,
        encoder_ffn_embed_dim=jcfg.encoder_ffn_embed_dim,
        encoder_attention_heads=jcfg.encoder_attention_heads,
        layer_norm_first=jcfg.layer_norm_first,
        conv_feature_layers=repr([tuple(t) for t in jcfg.conv_feature_layers]),
        conv_pos=jcfg.conv_pos,
        conv_pos_groups=jcfg.conv_pos_groups,
        relative_position_embedding=jcfg.relative_position_embedding,
        num_buckets=jcfg.num_buckets,
        max_distance=jcfg.max_distance,
        gru_rel_pos=jcfg.gru_rel_pos,
        normalize=jcfg.normalize,
    )
    torch.save({"cfg": cfg_dict, "model": ref_wavlm.state_dict()}, wavlm_pt)

    # --- data dir with normalization stats ---
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    rng = np.random.default_rng(5)
    np.savez(data_dir / "mean.npz", mean=rng.standard_normal(NJOINTS).astype(np.float32))
    np.savez(data_dir / "std.npz", std=(0.5 + rng.random(NJOINTS)).astype(np.float32))

    # --- wav with the style token in the filename (ref `sample.py:378`) ---
    from scipy.io import wavfile

    wav_path = str(tmp_path / "015_Happy_4_x_1_0.wav")
    audio = (rng.standard_normal(16000 * 8) * 1000).astype(np.int16)
    wavfile.write(wav_path, 16000, audio)

    # --- config ---
    cfg = dict(
        njoints=NJOINTS, latent_dim=MDM_KW["latent_dim"],
        ff_size=MDM_KW["ff_size"], num_layers=MDM_KW["num_layers"],
        n_seed=MDM_KW["n_seed"], cond_mode="cross_local_attention3_style1",
        cond_mask_prob=0.1, audio_feat="wavlm", wavlm_path=wavlm_pt,
        noise_schedule="cosine", diffusion_steps=4, n_poses=88,
        motion_resampling_framerate=20, data_dir=str(data_dir),
    )
    cfg_path = str(tmp_path / "cfg.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    save_dir = str(tmp_path / "out")
    sample_cli.main([
        "--config", cfg_path,
        "--model_path", mdm_pt,
        "--audiowavlm_path", wav_path,
        "--save_dir", save_dir,
        "--seed", "7",
    ] + (["--serve_fast"] if serve_fast else []) + extra)

    files = sorted(f for f in os.listdir(save_dir) if f.endswith(".bvh"))
    assert len(files) == n_out
    assert any("Happy" in f for f in files)
    if n_out == 2:
        assert any("Sad" in f for f in files)
    for f in files:
        loaded = bvh.load(os.path.join(save_dir, f))
        # 8 s audio → 2 windows → (2·80 − 8) frames at 20 fps, ×3 fps upsample
        assert loaded["rotations"].shape == (152 * 3, 75, 3)
        assert np.isfinite(loaded["positions"]).all()


@requires_reference
def test_sample_cli_moe_checkpoint(tmp_path, capsys):
    """An MoE-trained orbax checkpoint (`cli.train --moe_experts`) serves
    without the sampling yaml carrying the flag: the CLI infers the expert
    count from the 'moe/w1' stacks (regression: it used to build a dense
    MDMConfig and fail on the missing 'linear1' params)."""
    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp
    import torch

    from diffusestylegesture_tpu.cli import sample as sample_cli
    from diffusestylegesture_tpu.models.mdm import MDM, MDMConfig
    from diffusestylegesture_tpu.motion import bvh

    _, _, ref_wavlm, jcfg = _build_reference_models()
    wavlm_pt = str(tmp_path / "WavLM-Small.pt")
    cfg_dict = dict(
        extractor_mode=jcfg.extractor_mode,
        encoder_layers=jcfg.encoder_layers,
        encoder_embed_dim=jcfg.encoder_embed_dim,
        encoder_ffn_embed_dim=jcfg.encoder_ffn_embed_dim,
        encoder_attention_heads=jcfg.encoder_attention_heads,
        layer_norm_first=jcfg.layer_norm_first,
        conv_feature_layers=repr([tuple(t) for t in jcfg.conv_feature_layers]),
        conv_pos=jcfg.conv_pos,
        conv_pos_groups=jcfg.conv_pos_groups,
        relative_position_embedding=jcfg.relative_position_embedding,
        num_buckets=jcfg.num_buckets,
        max_distance=jcfg.max_distance,
        gru_rel_pos=jcfg.gru_rel_pos,
        normalize=jcfg.normalize,
    )
    torch.save({"cfg": cfg_dict, "model": ref_wavlm.state_dict()}, wavlm_pt)

    mcfg = MDMConfig(
        njoints=NJOINTS, n_seed=MDM_KW["n_seed"], moe_experts=2,
        cond_mask_prob=0.1, **{k: MDM_KW[k]
                               for k in ("latent_dim", "ff_size", "num_layers")})
    model = MDM(mcfg)
    x = jnp.zeros((1, NJOINTS, 1, 88))
    cond = {
        "seed": x[..., :MDM_KW["n_seed"]],
        "style": jnp.zeros((1, 6)),
        "audio": jnp.zeros((1, 88, 1024)),
        "mask_local": jnp.ones((1, 88), bool),
    }
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32), cond)
    ckpt_dir = str(tmp_path / "moe_ckpt")
    ckptr = ocp.StandardCheckpointer()  # async: wait before the CLI reads
    ckptr.save(ckpt_dir, dict(params))
    ckptr.wait_until_finished()

    data_dir = tmp_path / "data"
    data_dir.mkdir()
    rng = np.random.default_rng(5)
    np.savez(data_dir / "mean.npz", mean=rng.standard_normal(NJOINTS).astype(np.float32))
    np.savez(data_dir / "std.npz", std=(0.5 + rng.random(NJOINTS)).astype(np.float32))

    from scipy.io import wavfile

    wav_path = str(tmp_path / "015_Happy_4_x_1_0.wav")
    wavfile.write(wav_path, 16000,
                  (rng.standard_normal(16000 * 8) * 1000).astype(np.int16))

    cfg = dict(  # deliberately NO moe_experts key
        njoints=NJOINTS, latent_dim=MDM_KW["latent_dim"],
        ff_size=MDM_KW["ff_size"], num_layers=MDM_KW["num_layers"],
        n_seed=MDM_KW["n_seed"], cond_mode="cross_local_attention3_style1",
        cond_mask_prob=0.1, audio_feat="wavlm", wavlm_path=wavlm_pt,
        noise_schedule="cosine", diffusion_steps=4, n_poses=88,
        motion_resampling_framerate=20, data_dir=str(data_dir),
    )
    cfg_path = str(tmp_path / "cfg.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    save_dir = str(tmp_path / "out")
    sample_cli.main([
        "--config", cfg_path, "--model_path", ckpt_dir,
        "--audiowavlm_path", wav_path, "--save_dir", save_dir, "--seed", "7",
    ])
    assert "MoE-trained (2 experts)" in capsys.readouterr().out
    files = [f for f in os.listdir(save_dir) if f.endswith(".bvh")]
    assert len(files) == 1
    loaded = bvh.load(os.path.join(save_dir, files[0]))
    assert np.isfinite(loaded["positions"]).all()
