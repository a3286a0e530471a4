"""Whole-pipeline cross-framework inference parity — BEAT/TWH variants.

Runs the reference's windowed generation
(`BEAT-TWH-main/mydiffusion_beat_twh/sample.py:44-201`: textaudio padding +
reshape, per-variant audio slicing, real-clip seed with vel/acc channels,
denoise loop, crossfade quirk, position-third extraction, un-normalize)
with a random-weight torch MDM+ for all three conditioning variants
(DiffuseStyleGesture → attention3, + → attention4, ++ → attention5), then
the same inputs through the converted-weight `BeatTwhSampler`, asserting
the final un-normalized pose arrays match.

Determinism as in the ZEGGS harness: DDIM eta=0 + injected per-window x_T.
"""
import os

import numpy as np
import pytest

from conftest import requires_reference

import jax
import jax.numpy as jnp

from diffusestylegesture_tpu import diffusion as D
from diffusestylegesture_tpu.models import convert
from diffusestylegesture_tpu.models.mdm_plus import MDMPlus, MDMPlusConfig
from diffusestylegesture_tpu.sample.engine_beat import (
    BeatEngineConfig,
    BeatTwhSampler,
    prepare_seed_gesture,
)

MOTION_DIM = 12
NJ = MOTION_DIM * 3  # pos + vel + acc channels
N_POSES, N_SEED = 30, 5  # window 15 divides n_poses
AUDIO_DIM = 40
STYLE_DIM = 17  # TWH speakers
BASE_STEPS, DDIM_SECTIONS = 100, "ddim10"

NAME_TO_VARIANT = {
    "DiffuseStyleGesture": ("cross_local_attention3_style1", "attention3"),
    "DiffuseStyleGesture+": ("cross_local_attention4_style1", "attention4"),
    "DiffuseStyleGesture++": ("cross_local_attention5_style1", "attention5"),
}

MDM_KW = dict(latent_dim=128, ff_size=96, num_layers=2, n_seed=N_SEED)


def _make_ref_spaced():
    from ref_compat import import_ref_diffusion

    gd, respace = import_ref_diffusion()
    betas = gd.get_named_beta_schedule("cosine", BASE_STEPS)
    return respace.SpacedDiffusion(
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


def _fake_data_layout(tmp_path, rng):
    """Create the CWD-relative npy layout the reference hardcodes
    (`sample.py:77-90,100-130`)."""
    root = tmp_path / "fake"
    cwd_dir = root / "BEAT-TWH-main" / "mydiffusion_beat_twh"
    process = root / "BEAT-TWH-main" / "process"
    twh = root / "TWH_dataset" / "processed" / "gesture_TWH"
    beat = root / "BEAT_dataset" / "processed" / "gesture_BEAT"
    for d in (cwd_dir, process, twh, beat):
        d.mkdir(parents=True, exist_ok=True)

    mean = rng.standard_normal(MOTION_DIM).astype(np.float32)
    std = (0.5 + rng.random(MOTION_DIM)).astype(np.float32)
    np.save(process / "gesture_TWH_mean_v0.npy", mean)
    np.save(process / "gesture_TWH_std_v0.npy", std)

    seed_clip = rng.standard_normal((N_SEED + 2, MOTION_DIM)).astype(np.float32)
    np.save(twh / "val_2023_v0_014_main-agent.npy", seed_clip)
    # '++' loads its seed_last flag clip from the BEAT tree even for TWH
    # (`sample.py:86`)
    flag_clip = rng.standard_normal((N_SEED + 2, MOTION_DIM)).astype(np.float32)
    np.save(beat / "2_scott_0_1_1.npy", flag_clip)
    return cwd_dir, mean, std, seed_clip, flag_clip


def _run_reference(sample_mod, ref_mdm, name, textaudio, style, noise_np, cwd_dir, tmp_path):
    import argparse

    import torch

    spaced = _make_ref_spaced()
    windows = []

    def sample_fn(model, shape, **kw):
        i = len(windows)
        windows.append(i)
        return spaced.ddim_sample_loop(
            model, shape,
            noise=torch.as_tensor(noise_np[i]),
            clip_denoised=kw["clip_denoised"],
            model_kwargs=kw["model_kwargs"],
            progress=False,
            eta=0.0,
        )

    sample_mod.mydevice = torch.device("cpu")
    sample_mod.batch_size = 1

    captured = {}

    def capture_pose2bvh_twh(predicted_gesture, output_dir, prefix, pipeline_path=None):
        captured["poses"] = np.array(predicted_gesture)

    real = sample_mod.pose2bvh_twh
    sample_mod.pose2bvh_twh = capture_pose2bvh_twh
    args = argparse.Namespace(
        n_poses=N_POSES, n_seed=N_SEED, njoints=NJ,
        audio_feature_dim=AUDIO_DIM, name=name, version="v0",
    )
    save_dir = str(tmp_path / "ref_out")
    os.makedirs(save_dir, exist_ok=True)
    cwd = os.getcwd()
    os.chdir(cwd_dir)
    try:
        with torch.no_grad():
            sample_mod.inference(
                args, save_dir, "pfx", torch.as_tensor(textaudio), sample_fn,
                ref_mdm, n_frames=0, smoothing=True, skip_timesteps=0,
                style=style, seed=123456, dataset="TWH",
            )
    finally:
        os.chdir(cwd)
        sample_mod.pose2bvh_twh = real
    return captured["poses"]


@requires_reference
@pytest.mark.parametrize("name", list(NAME_TO_VARIANT))
def test_beat_twh_end_to_end_parity(name, tmp_path):
    import torch

    from ref_compat import import_ref_beat_mdm, import_ref_beat_sample

    cond_mode, variant = NAME_TO_VARIANT[name]
    sample_mod = import_ref_beat_sample()
    RefMDM = import_ref_beat_mdm()

    torch.manual_seed(11)
    ref = RefMDM(
        modeltype="", njoints=NJ, nfeats=1, cond_mode=cond_mode,
        audio_feat="wavlm", arch="trans_enc", cond_mask_prob=0.1,
        style_dim=STYLE_DIM, source_audio_dim=AUDIO_DIM,
        audio_feat_dim_latent=32, **MDM_KW,
    )
    ref.eval()

    rng = np.random.default_rng(17)
    cwd_dir, mean, std, seed_clip, flag_clip = _fake_data_layout(tmp_path, rng)

    stride = N_POSES - N_SEED
    real_n = 2 * stride - 3  # exercises the zero-pad tail (`sample.py:71-72`)
    textaudio = rng.standard_normal((real_n, AUDIO_DIM)).astype(np.float32)
    style = np.zeros(STYLE_DIM, np.float32)
    style[3] = 1.0
    num_windows = 2
    noise_np = rng.standard_normal((num_windows, 1, NJ, 1, N_POSES)).astype(np.float32)

    ref_poses = _run_reference(
        sample_mod, ref, name, textaudio, style, noise_np, cwd_dir, tmp_path
    )

    # ---- ours ----
    params = {
        "params": convert.convert_mdm_beat_twh(
            ref.state_dict(), num_layers=MDM_KW["num_layers"]
        )
    }
    mcfg = MDMPlusConfig(
        njoints=NJ, source_audio_dim=AUDIO_DIM, audio_feat_dim=32,
        style_dim_in=STYLE_DIM, cond_mode=cond_mode, window_size=15, **MDM_KW,
    )
    model = MDMPlus(mcfg)

    def model_apply(p, xx, tt, cc, uncond=None):
        return model.apply(p, xx, tt, cc, uncond=uncond)

    sched = D.spaced_schedule(
        D.named_beta_schedule("cosine", BASE_STEPS),
        D.space_timesteps(BASE_STEPS, DDIM_SECTIONS),
    )
    ecfg = BeatEngineConfig(
        n_poses=N_POSES, n_seed=N_SEED, njoints=NJ, audio_dim=AUDIO_DIM,
        variant=variant, motion_feature_division=3, sampler="ddim",
    )
    sampler = BeatTwhSampler(model_apply, sched, ecfg)

    seed_gesture = prepare_seed_gesture(seed_clip, mean, std)
    seed_last = (
        prepare_seed_gesture(flag_clip, mean, std) if variant == "attention5" else None
    )
    ours = sampler.generate(
        params, textaudio, seed_gesture, style[None], jax.random.PRNGKey(0),
        mean, std, seed_last=seed_last, noise_windows=noise_np,
    )[0]

    assert ref_poses.shape == ours.shape, (ref_poses.shape, ours.shape)
    scale = np.abs(ref_poses).mean()
    err = np.abs(ref_poses - ours).max()
    assert err < 2e-3 * max(scale, 1.0), f"{name}: max abs err {err} (scale {scale})"
    assert np.abs(ref_poses).max() > 0.1  # non-degenerate
