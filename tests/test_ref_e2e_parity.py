"""Whole-pipeline cross-framework inference parity.

Runs the reference's ACTUAL windowed generation path
(`main/mydiffusion_zeggs/sample.py:210-338`: audio split → WavLM →
denoise loop → root-delta → crossfade → un-normalize → `pose2bvh`)
end-to-end with a random-weight torch MDM + torch WavLM, then the same
inputs through the converted-weight `ZeggsSampler`, and asserts the final
un-normalized pose arrays and the written BVH channel values match.

Determinism: DDIM with eta=0 is noise-free past the initial x_T, and both
frameworks accept injected initial noise (ref `gaussian_diffusion.py:612,631`;
ours `ZeggsSampler.generate(noise_windows=...)`), so the only RNG is the
per-window x_T tensor which the test fixes for both sides.
"""
import os

import numpy as np
import pytest

from conftest import requires_reference

import jax
import jax.numpy as jnp

from diffusestylegesture_tpu import diffusion as D
from diffusestylegesture_tpu.models import convert
from diffusestylegesture_tpu.models.mdm import MDM, MDMConfig
from diffusestylegesture_tpu.models.wavlm import (
    WavLM,
    WavLMConfig,
    convert_wavlm,
    make_zeggs_wavlm_fn,
)
from diffusestylegesture_tpu.motion import bvh
from diffusestylegesture_tpu.motion import zeggs_features as zf
from diffusestylegesture_tpu.sample import ZeggsEngineConfig, ZeggsSampler

NJOINTS = 1141  # hardcoded in the reference inference (`sample.py:244`)
N_POSES, N_SEED = 88, 8
BASE_STEPS, DDIM_SECTIONS = 100, "ddim10"

# Small WavLM whose output dim matches the MDM WavEncoder's hardcoded
# Linear(1024, 64) input (`main/model/mdm.py:545-552`): conv dim 24 with
# post_extract_proj 24→1024, one encoder layer. Conv strides multiply to
# 80 → ~880 frames per 70400-sample window before interpolation to 88.
WAVLM_KW = dict(
    encoder_layers=1,
    encoder_embed_dim=1024,
    encoder_ffn_embed_dim=64,
    encoder_attention_heads=4,
    conv_pos=16,
    conv_pos_groups=4,
    num_buckets=40,
    max_distance=80,
    conv_feature_layers=((24, 10, 5), (24, 8, 4), (24, 4, 2), (24, 4, 2)),
    extractor_mode="layer_norm",
    layer_norm_first=True,
)

MDM_KW = dict(latent_dim=128, ff_size=128, num_layers=2, n_seed=N_SEED)


def _build_reference_models():
    import torch

    from ref_compat import import_ref_mdm, import_ref_zeggs_sample

    sample_mod = import_ref_zeggs_sample()
    RefMDM = import_ref_mdm()

    torch.manual_seed(7)
    ref_mdm = RefMDM(
        modeltype="", njoints=NJOINTS, nfeats=1,
        cond_mode="cross_local_attention3_style1", audio_feat="wavlm",
        arch="trans_enc", cond_mask_prob=0.1, **MDM_KW,
    )
    ref_mdm.eval()

    import sys

    sys.path.insert(0, "/root/reference/main/mydiffusion_zeggs/WavLM")
    from WavLM import WavLM as RefWavLM, WavLMConfig as RefWavLMCfg  # type: ignore

    jcfg = WavLMConfig(**WAVLM_KW)
    rcfg = RefWavLMCfg(
        dict(
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
            dropout=0.0,
            attention_dropout=0.0,
            activation_dropout=0.0,
            encoder_layerdrop=0.0,
        )
    )
    torch.manual_seed(8)
    ref_wavlm = RefWavLM(rcfg)
    ref_wavlm.eval()
    return sample_mod, ref_mdm, ref_wavlm, jcfg


def _run_reference(sample_mod, ref_mdm, ref_wavlm, audio, style, noise_np, tmp_path):
    """Drive the reference `inference()` exactly as its CLI does
    (smoothing + SG_filter + minibatch), but with a DDIM-respaced
    deterministic sample_fn and injected per-window x_T noise."""
    import argparse

    import torch

    from ref_compat import import_ref_diffusion

    gd, respace = import_ref_diffusion()
    betas = gd.get_named_beta_schedule("cosine", BASE_STEPS)
    spaced = respace.SpacedDiffusion(
        use_timesteps=respace.space_timesteps(BASE_STEPS, DDIM_SECTIONS),
        betas=betas,
        model_mean_type=gd.ModelMeanType.START_X,
        model_var_type=gd.ModelVarType.FIXED_SMALL,
        loss_type=gd.LossType.MSE,
        rescale_timesteps=False,
        lambda_vel=0.0,
        lambda_rcxyz=0.0,
        lambda_fc=0.0,
    )

    window_counter = []

    def sample_fn(model, shape, **kw):
        i = len(window_counter)
        window_counter.append(i)
        return spaced.ddim_sample_loop(
            model, shape,
            noise=torch.as_tensor(noise_np[i]),
            clip_denoised=kw["clip_denoised"],
            model_kwargs=kw["model_kwargs"],
            progress=False,
            eta=0.0,
        )

    # fake the CWD-relative mean/std layout the reference hardcodes
    # (`sample.py:320-321`)
    rng = np.random.default_rng(123)
    mean = rng.standard_normal(NJOINTS).astype(np.float32)
    std = (0.5 + rng.random(NJOINTS)).astype(np.float32)
    std[::97] = 0.001  # exercise the std clipping path
    fake_root = tmp_path / "fake"
    cwd_dir = fake_root / "main" / "mydiffusion_zeggs"
    stats_dir = fake_root / "ubisoft-laforge-ZeroEGGS-main" / "data" / "processed_v1" / "processed"
    cwd_dir.mkdir(parents=True)
    stats_dir.mkdir(parents=True)
    np.savez(stats_dir / "mean.npz", mean=mean)
    np.savez(stats_dir / "std.npz", std=std)

    save_dir = tmp_path / "ref_out"
    save_dir.mkdir()
    sample_mod.mydevice = torch.device("cpu")
    sample_mod.batch_size = 1
    sample_mod.save_dir = str(save_dir)

    captured = {}
    real_pose2bvh = sample_mod.pose2bvh

    def capture_pose2bvh(poses, outpath, length, smoothing=False, smooth_foot=False):
        captured["poses"] = np.array(poses)
        captured["length"] = length
        return real_pose2bvh(poses, outpath, length, smoothing=smoothing)

    sample_mod.pose2bvh = capture_pose2bvh
    args = argparse.Namespace(n_poses=N_POSES)
    cwd = os.getcwd()
    os.chdir(cwd_dir)
    try:
        with torch.no_grad():
            sample_mod.inference(
                args, ref_wavlm, audio.copy(), sample_fn, ref_mdm,
                n_frames=0, smoothing=True, SG_filter=True, minibatch=True,
                skip_timesteps=0, n_seed=N_SEED, style=style, seed=123456,
            )
    finally:
        os.chdir(cwd)
        sample_mod.pose2bvh = real_pose2bvh

    bvh_files = [f for f in os.listdir(save_dir) if f.endswith(".bvh")]
    assert len(bvh_files) == 1
    return captured["poses"], str(save_dir / bvh_files[0]), mean, std


@requires_reference
class TestZeggsEndToEndParity:
    @pytest.fixture(scope="class")
    def both(self, tmp_path_factory):
        import torch

        tmp_path = tmp_path_factory.mktemp("e2e")
        sample_mod, ref_mdm, ref_wavlm, jcfg = _build_reference_models()

        num_windows = 2
        n_frames = num_windows * (N_POSES - N_SEED)
        rng = np.random.default_rng(42)
        audio = (rng.standard_normal(n_frames * 800) * 0.1).astype(np.float32)
        style = [0, 0, 1, 0, 0, 0]  # Neutral one-hot (`sample.py:22-27`)
        noise_np = rng.standard_normal(
            (num_windows, 1, NJOINTS, 1, N_POSES)
        ).astype(np.float32)

        ref_poses, ref_bvh, mean, std = _run_reference(
            sample_mod, ref_mdm, ref_wavlm, audio, style, noise_np, tmp_path
        )

        # ---- ours: converted weights through the compiled engine ----
        params = {
            "params": convert.convert_mdm_zeggs(
                ref_mdm.state_dict(), num_layers=MDM_KW["num_layers"]
            )
        }
        wavlm_sd = {k: v.detach().numpy() for k, v in ref_wavlm.state_dict().items()}
        wavlm_params = {"params": convert_wavlm(wavlm_sd, jcfg)}

        mcfg = MDMConfig(njoints=NJOINTS, window_size=11, **MDM_KW)
        model = MDM(mcfg)

        def model_apply(p, xx, tt, cc, uncond=None):
            return model.apply(p, xx, tt, cc, uncond=uncond)

        sched = D.spaced_schedule(
            D.named_beta_schedule("cosine", BASE_STEPS),
            D.space_timesteps(BASE_STEPS, DDIM_SECTIONS),
        )
        ecfg = ZeggsEngineConfig(njoints=NJOINTS, sampler="ddim")
        sampler = ZeggsSampler(
            model_apply, make_zeggs_wavlm_fn(WavLM(jcfg), N_POSES), sched, ecfg
        )
        ours_poses = sampler.generate(
            params, wavlm_params, audio,
            np.asarray([style], np.float32), jax.random.PRNGKey(0),
            mean=mean, std=std, noise_windows=noise_np,
        )[0]

        ours_bvh = str(tmp_path / "ours.bvh")
        zf.pose_features_to_bvh(ours_poses, ours_bvh, smoothing=True)
        del torch
        return ref_poses, ref_bvh, ours_poses, ours_bvh

    def test_pose_arrays_match(self, both):
        ref_poses, _, ours_poses, _ = both
        assert ref_poses.shape == ours_poses.shape
        scale = np.abs(ref_poses).mean()
        err = np.abs(ref_poses - ours_poses).max()
        assert err < 2e-3 * max(scale, 1.0), f"max abs err {err} (scale {scale})"

    def test_bvh_files_match(self, both):
        _, ref_bvh, _, ours_bvh = both
        ref = bvh.load(ref_bvh)
        ours = bvh.load(ours_bvh)
        assert ref["rotations"].shape == ours["rotations"].shape
        np.testing.assert_allclose(
            ours["positions"], ref["positions"], atol=5e-3
        )
        # Euler angles in degrees, compared modulo 360. The 6d→quat→euler
        # chain is ill-conditioned where the two predicted axis vectors are
        # nearly parallel (random-weight outputs hit this), so the fp32
        # pose-level agreement (≤2e-3 rel) can amplify to a few tenths of a
        # degree at isolated joints — bound the tail and the bulk separately.
        diff = np.abs(ours["rotations"] - ref["rotations"])
        diff = np.minimum(diff, 360.0 - diff)
        assert diff.max() < 1.0, f"max rotation diff {diff.max()} deg"
        assert np.percentile(diff, 99) < 0.05, (
            f"p99 rotation diff {np.percentile(diff, 99)} deg"
        )

    def test_trajectories_actually_moved(self, both):
        ref_poses, _, _, _ = both
        # guard against a degenerate all-zeros comparison
        assert np.abs(ref_poses).max() > 0.1


@requires_reference
def test_zeggs_end_to_end_parity_plms(tmp_path):
    """Same whole-pipeline harness with the PLMS sampler (deterministic
    order-2 Adams-Bashforth, ref `plms_sample_loop:1089`)."""
    import torch

    sample_mod, ref_mdm, ref_wavlm, jcfg = _build_reference_models()

    num_windows = 2
    n_frames = num_windows * (N_POSES - N_SEED)
    rng = np.random.default_rng(77)
    audio = (rng.standard_normal(n_frames * 800) * 0.1).astype(np.float32)
    style = [1, 0, 0, 0, 0, 0]
    noise_np = rng.standard_normal((num_windows, 1, NJOINTS, 1, N_POSES)).astype(np.float32)

    import argparse

    from ref_compat import import_ref_diffusion

    gd, respace = import_ref_diffusion()
    spaced = respace.SpacedDiffusion(
        use_timesteps=respace.space_timesteps(BASE_STEPS, DDIM_SECTIONS),
        betas=gd.get_named_beta_schedule("cosine", BASE_STEPS),
        model_mean_type=gd.ModelMeanType.START_X,
        model_var_type=gd.ModelVarType.FIXED_SMALL,
        loss_type=gd.LossType.MSE,
        rescale_timesteps=False,
        lambda_vel=0.0, lambda_rcxyz=0.0, lambda_fc=0.0,
    )
    calls = []

    def sample_fn(model, shape, **kw):
        i = len(calls)
        calls.append(i)
        return spaced.plms_sample_loop(
            model, shape, noise=torch.as_tensor(noise_np[i]),
            clip_denoised=kw["clip_denoised"], model_kwargs=kw["model_kwargs"],
            progress=False, order=2,
        )

    # minimal reference-side driving (no BVH this time; un-normalization
    # identity so the captured pose tensor is the raw model output)
    mean = np.zeros(NJOINTS, np.float32)
    std = np.ones(NJOINTS, np.float32)
    fake_root = tmp_path / "fake"
    cwd_dir = fake_root / "main" / "mydiffusion_zeggs"
    stats_dir = fake_root / "ubisoft-laforge-ZeroEGGS-main" / "data" / "processed_v1" / "processed"
    cwd_dir.mkdir(parents=True)
    stats_dir.mkdir(parents=True)
    np.savez(stats_dir / "mean.npz", mean=mean)
    np.savez(stats_dir / "std.npz", std=std)
    save_dir = tmp_path / "ref_out"
    save_dir.mkdir()
    sample_mod.mydevice = torch.device("cpu")
    sample_mod.batch_size = 1
    sample_mod.save_dir = str(save_dir)
    captured = {}
    real = sample_mod.pose2bvh
    sample_mod.pose2bvh = lambda poses, outpath, length, smoothing=False, smooth_foot=False: captured.update(poses=np.array(poses))
    cwd = os.getcwd()
    os.chdir(cwd_dir)
    try:
        with torch.no_grad():
            sample_mod.inference(
                argparse.Namespace(n_poses=N_POSES), ref_wavlm, audio.copy(),
                sample_fn, ref_mdm, n_frames=0, smoothing=True, SG_filter=True,
                minibatch=True, skip_timesteps=0, n_seed=N_SEED, style=style,
                seed=123456,
            )
    finally:
        os.chdir(cwd)
        sample_mod.pose2bvh = real
    ref_poses = captured["poses"]

    params = {"params": convert.convert_mdm_zeggs(ref_mdm.state_dict(), num_layers=MDM_KW["num_layers"])}
    wavlm_sd = {k: v.detach().numpy() for k, v in ref_wavlm.state_dict().items()}
    wavlm_params = {"params": convert_wavlm(wavlm_sd, jcfg)}
    model = MDM(MDMConfig(njoints=NJOINTS, window_size=11, **MDM_KW))

    def model_apply(p, xx, tt, cc, uncond=None):
        return model.apply(p, xx, tt, cc, uncond=uncond)

    sched = D.spaced_schedule(
        D.named_beta_schedule("cosine", BASE_STEPS),
        D.space_timesteps(BASE_STEPS, DDIM_SECTIONS),
    )
    sampler = ZeggsSampler(
        model_apply, make_zeggs_wavlm_fn(WavLM(jcfg), N_POSES), sched,
        ZeggsEngineConfig(njoints=NJOINTS, sampler="plms"),
    )
    ours = sampler.generate(
        params, wavlm_params, audio, np.asarray([style], np.float32),
        jax.random.PRNGKey(0), mean=mean, std=std, noise_windows=noise_np,
    )[0]
    assert ref_poses.shape == ours.shape
    scale = np.abs(ref_poses).mean()
    err = np.abs(ref_poses - ours).max()
    assert err < 2e-3 * max(scale, 1.0), f"plms max abs err {err} (scale {scale})"


@requires_reference
def test_streaming_equals_batch_with_converted_weights():
    """`ZeggsStreamSampler` vs `ZeggsSampler.generate` with a REAL
    converted-weight MDM + WavLM pair (streaming elsewhere is equality-
    tested with toy models only). CPU: exact program semantics."""
    from diffusestylegesture_tpu.sample.streaming import ZeggsStreamSampler

    _, ref_mdm, ref_wavlm, jcfg = _build_reference_models()
    params = {"params": convert.convert_mdm_zeggs(
        ref_mdm.state_dict(), num_layers=MDM_KW["num_layers"])}
    wavlm_sd = {k: v.detach().numpy() for k, v in ref_wavlm.state_dict().items()}
    wavlm_params = {"params": convert_wavlm(wavlm_sd, jcfg)}
    model = MDM(MDMConfig(njoints=NJOINTS, window_size=11, **MDM_KW))

    def model_apply(p, xx, tt, cc, uncond=None):
        return model.apply(p, xx, tt, cc, uncond=uncond)

    sched = D.spaced_schedule(
        D.named_beta_schedule("cosine", BASE_STEPS),
        D.space_timesteps(BASE_STEPS, DDIM_SECTIONS),
    )
    cfg = ZeggsEngineConfig(njoints=NJOINTS, sampler="ddim")
    sampler = ZeggsSampler(
        model_apply, make_zeggs_wavlm_fn(WavLM(jcfg), N_POSES), sched, cfg)

    rng = np.random.default_rng(3)
    audio = rng.standard_normal(cfg.samples_per_stride * 2).astype(np.float32) * 0.05
    style = zf.style_onehot("Happy")
    mean = rng.standard_normal(NJOINTS).astype(np.float32)
    std = (0.5 + rng.random(NJOINTS)).astype(np.float32)
    key = jax.random.PRNGKey(11)

    batch_out = sampler.generate(
        params, wavlm_params, audio, style[None], key, mean=mean, std=std)

    stream = ZeggsStreamSampler(sampler, params, wavlm_params, style[None],
                                key, mean=mean, std=std)
    chunks = []
    for piece in np.array_split(audio, 5):
        chunks += stream.push(piece)
    streamed = np.concatenate(chunks, axis=1)
    assert streamed.shape == batch_out.shape
    scale = np.abs(batch_out).mean()
    err = np.abs(streamed - batch_out).max()
    assert err < 1e-3 * max(scale, 1.0), f"stream-vs-batch max err {err}"
