"""BEAT/TWH (DiffuseStyleGesture+/++) generation throughput on one chip.

The flagship bench (`bench.py`) measures the ZEGGS stack; this measures the
TWH configuration (njoints 2232, latent 512, attention4, 150-frame windows
@30 fps, DDPM-1000) through the compiled `BeatTwhSampler`.

  DSG_BEAT_BATCH=8 DSG_BEAT_FAST=1 python scripts/beat_bench.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from diffusestylegesture_tpu import diffusion as D
from diffusestylegesture_tpu.models.mdm_plus import MDMPlus, MDMPlusConfig
from diffusestylegesture_tpu.sample import (
    BeatEngineConfig, BeatTwhSampler, prepare_seed_gesture)
from diffusestylegesture_tpu.utils.compile_cache import enable_persistent_cache


def main():
    enable_persistent_cache()
    B = int(os.environ.get("DSG_BEAT_BATCH", "1"))
    fast = bool(int(os.environ.get("DSG_BEAT_FAST", "0")))
    steps = int(os.environ.get("DSG_BEAT_STEPS", "1000"))
    seconds = float(os.environ.get("DSG_BEAT_SECONDS", "20"))

    # TWH dims (`BEAT-TWH-main/mydiffusion_beat_twh/end2end.py:90-97`)
    motion_dim = 744
    mcfg = MDMPlusConfig(
        njoints=motion_dim * 3, latent_dim=512,
        cond_mode="cross_local_attention4_style1",
        n_seed=30, style_dim_in=17, source_audio_dim=1435, audio_feat_dim=128,
        dtype=jnp.bfloat16 if fast else jnp.float32,
        activation="gelu_tanh" if fast else "gelu",
    )
    ecfg = BeatEngineConfig(njoints=motion_dim * 3, audio_dim=1435,
                            variant="attention4")
    sched = D.Schedule.create(D.named_beta_schedule("cosine", steps))
    model = MDMPlus(mcfg)

    rng = np.random.default_rng(0)
    T = ecfg.n_poses
    x0 = jnp.zeros((1, mcfg.njoints, 1, T))
    cond0 = {"style": jnp.zeros((1, 17)), "seed": x0[..., : ecfg.n_seed],
             "audio": jnp.zeros((1, ecfg.stride, 1435)),
             "mask_local": jnp.ones((1, T), bool)}
    params = jax.jit(MDMPlus(MDMPlusConfig(
        njoints=mcfg.njoints, latent_dim=512,
        cond_mode=mcfg.cond_mode, n_seed=30, style_dim_in=17,
        source_audio_dim=1435, audio_feat_dim=128,
    )).init)(jax.random.PRNGKey(0), x0, jnp.zeros((1,), jnp.int32), cond0)
    if fast:
        from diffusestylegesture_tpu.utils.precision import bf16_cast

        params = bf16_cast(params)

    def apply(p, x, t, c, uncond=None):
        return model.apply(p, x, t, c, uncond=uncond)

    eng = BeatTwhSampler(apply, sched, ecfg)
    n_frames = int(seconds * 30)
    ta = rng.standard_normal((n_frames, 1435)).astype(np.float32) * 0.1
    raw_seed = rng.standard_normal((32, motion_dim)).astype(np.float32)
    mean = np.zeros(motion_dim, np.float32)
    std = np.ones(motion_dim, np.float32)
    seed = prepare_seed_gesture(raw_seed, mean, std)
    styles = np.eye(17, dtype=np.float32)[np.arange(B) % 17]

    out = eng.generate(params, ta, seed, styles, jax.random.PRNGKey(7), mean, std)
    reps = 3
    t0 = time.perf_counter()
    for i in range(reps):
        out = eng.generate(params, ta, seed, styles,
                           jax.random.PRNGKey(8 + i), mean, std)
    dt = (time.perf_counter() - t0) / reps
    frames = out.shape[0] * out.shape[1]
    dev = jax.devices()[0]
    print({
        "config": f"TWH attention4 latent512 DDPM-{steps}",
        "dtype": "bf16+gelu_tanh" if fast else "f32",
        "batch": B, "device": getattr(dev, "device_kind", dev.platform),
        "wall_s": round(dt, 2),
        "frames_per_sec": round(frames / dt, 1),
        "rt_factor": round(frames / dt / 30.0, 1),
        "finite": bool(np.isfinite(out).all()),
    })


if __name__ == "__main__":
    main()
