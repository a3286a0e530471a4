"""End-to-end integration: tiny MDM → windowed sampler → BVH file."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffusestylegesture_tpu import diffusion as D
from diffusestylegesture_tpu.models.mdm import MDM, MDMConfig
from diffusestylegesture_tpu.motion import bvh, zeggs_features as zf
from diffusestylegesture_tpu.sample import ZeggsEngineConfig, ZeggsSampler


def test_wav_to_bvh(tmp_path):
    """Full pipeline on CPU with a tiny random model: audio → BVH."""
    cfg = MDMConfig(njoints=zf.ZEGGS_FEATURE_DIM, latent_dim=128, ff_size=64,
                    num_layers=1, n_seed=8, window_size=11)
    model = MDM(cfg)
    ecfg = ZeggsEngineConfig(njoints=zf.ZEGGS_FEATURE_DIM)
    sched = D.Schedule.create(D.named_beta_schedule("cosine", 4))

    rng = np.random.default_rng(0)
    B, T = 1, ecfg.n_poses
    x = jnp.zeros((B, cfg.njoints, 1, T))
    cond = {
        "style": jnp.zeros((B, 6)),
        "seed": x[..., :8],
        "audio": jnp.zeros((B, T, 1024)),
        "mask_local": jnp.ones((B, T), bool),
    }
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((B,), jnp.int32), cond)

    def model_apply(p, xx, tt, cc, uncond=None):
        return model.apply(p, xx, tt, cc, uncond=uncond)

    def wavlm_stub(_p, windows):
        W = windows.shape[0]
        return jnp.zeros((W, T, 1024))

    sampler = ZeggsSampler(model_apply, wavlm_stub, sched, ecfg)
    audio = rng.standard_normal(ecfg.samples_per_stride * 2).astype(np.float32)
    mean = np.zeros(cfg.njoints, np.float32)
    std = np.ones(cfg.njoints, np.float32)
    out = sampler.generate(params, {}, audio, np.eye(6, dtype=np.float32)[:1],
                           jax.random.PRNGKey(0), mean=mean, std=std)

    path = str(tmp_path / "gen.bvh")
    zf.pose_features_to_bvh(out[0], path, smoothing=True)
    loaded = bvh.load(path)
    # 2 windows × 80 − 8 frames at 20fps, ×3 fps upsampling
    assert loaded["rotations"].shape[0] == out.shape[1] * 3
    assert loaded["rotations"].shape[1] == zf.ZEGGS_NJOINTS
    assert np.isfinite(loaded["rotations"]).all()


def test_respaced_ddim_through_engine():
    """ddim-respaced Schedule + sampler='ddim' runs through the engine."""
    cfg = MDMConfig(njoints=24, latent_dim=128, ff_size=64, num_layers=1,
                    n_seed=8, window_size=11)
    model = MDM(cfg)
    betas = D.named_beta_schedule("cosine", 20)
    sched = D.spaced_schedule(betas, D.space_timesteps(20, "ddim5"))
    assert sched.num_timesteps == 5
    ecfg = ZeggsEngineConfig(njoints=24, sampler="ddim")

    B, T = 1, ecfg.n_poses
    x = jnp.zeros((B, 24, 1, T))
    cond = {
        "style": jnp.zeros((B, 6)),
        "seed": x[..., :8],
        "audio": jnp.zeros((B, T, 1024)),
        "mask_local": jnp.ones((B, T), bool),
    }
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((B,), jnp.int32), cond)

    def model_apply(p, xx, tt, cc, uncond=None):
        # respaced: model receives ORIGINAL timesteps via timestep_map
        return model.apply(p, xx, tt, cc, uncond=uncond)

    def wavlm_stub(_p, windows):
        return jnp.zeros((windows.shape[0], T, 1024))

    sampler = ZeggsSampler(model_apply, wavlm_stub, sched, ecfg)
    audio = np.zeros(ecfg.samples_per_stride, np.float32)
    out = sampler.generate(params, {}, audio, np.eye(6, dtype=np.float32)[:1],
                           jax.random.PRNGKey(1))
    assert out.shape[1] == ecfg.stride - ecfg.n_seed
    assert np.isfinite(out).all()
