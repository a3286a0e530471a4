"""Streaming generation latency on the real chip.

Measures what a live client sees with `sample/streaming.ZeggsStreamSampler`:
after each 4 s of audio (one stride) arrives, how long until that window's
motion frames are ready. Full DDPM-1000 + WavLM-Large at batch 1.

  DSG_STREAM_DTYPE=bf16 python scripts/streaming_bench.py   # serving mode
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from diffusestylegesture_tpu import diffusion as D
from diffusestylegesture_tpu.models.mdm import MDM, MDMConfig
from diffusestylegesture_tpu.models.wavlm import WavLM, WavLMConfig, make_zeggs_wavlm_fn
from diffusestylegesture_tpu.sample import ZeggsEngineConfig, ZeggsSampler
from diffusestylegesture_tpu.sample.streaming import ZeggsStreamSampler
from diffusestylegesture_tpu.utils.compile_cache import enable_persistent_cache


def main():
    enable_persistent_cache()
    dtype = os.environ.get("DSG_STREAM_DTYPE", "f32")
    steps = int(os.environ.get("DSG_STREAM_STEPS", "1000"))
    n_windows = int(os.environ.get("DSG_STREAM_WINDOWS", "4"))

    ecfg = ZeggsEngineConfig()
    sched = D.Schedule.create(D.named_beta_schedule("cosine", steps))
    cdt = jnp.bfloat16 if dtype == "bf16" else jnp.float32
    act = "gelu_tanh" if dtype == "bf16" else "gelu"
    mcfg = MDMConfig(dtype=cdt, activation=act)
    model = MDM(mcfg)

    T = ecfg.n_poses
    x0 = jnp.zeros((1, mcfg.njoints, 1, T))
    cond0 = {
        "style": jnp.asarray(np.eye(6, dtype=np.float32)[:1]),
        "seed": x0[..., : mcfg.n_seed],
        "audio": jnp.zeros((1, T, 1024)),
        "mask_local": jnp.ones((1, T), bool),
    }
    params = jax.jit(MDM(MDMConfig()).init)(
        jax.random.PRNGKey(0), x0, jnp.zeros((1,), jnp.int32), cond0)
    wavlm = WavLM(WavLMConfig())
    wparams = jax.jit(wavlm.init)(
        jax.random.PRNGKey(1),
        jnp.zeros((1, ecfg.samples_per_seed + ecfg.samples_per_stride)))
    if dtype == "bf16":
        from diffusestylegesture_tpu.utils.precision import bf16_cast as cast
        params, wparams = cast(params), cast(wparams)

    def model_apply(p, x, t, cond, uncond=None):
        return model.apply(p, x, t, cond, uncond=uncond)

    sampler = ZeggsSampler(model_apply, make_zeggs_wavlm_fn(wavlm, T), sched, ecfg)
    style = np.eye(6, dtype=np.float32)[:1]

    rng = np.random.default_rng(0)
    sps = ecfg.samples_per_stride

    # warm-up stream (compiles the window step once)
    warm = ZeggsStreamSampler(sampler, params, wparams, style, jax.random.PRNGKey(9))
    t0 = time.perf_counter()
    warm.push(rng.standard_normal(sps).astype(np.float32) * 0.1)
    compile_s = time.perf_counter() - t0

    stream = ZeggsStreamSampler(sampler, params, wparams, style, jax.random.PRNGKey(7))
    t0 = time.perf_counter()
    stream.push(rng.standard_normal(sps).astype(np.float32) * 0.1)
    session_start_s = time.perf_counter() - t0  # new session, shared program
    lat = []
    frames = 0
    for i in range(n_windows):
        chunk = rng.standard_normal(sps).astype(np.float32) * 0.1
        t0 = time.perf_counter()
        outs = stream.push(chunk)
        lat.append(time.perf_counter() - t0)
        frames += sum(o.shape[1] for o in outs)
    dev = jax.devices()[0]
    print({
        "dtype": dtype, "steps": steps,
        "device": getattr(dev, "device_kind", dev.platform),
        "first_push_incl_compile_s": round(compile_s, 2),
        "new_session_first_push_s": round(session_start_s, 3),
        "per_window_latency_s": [round(x, 3) for x in lat],
        "median_latency_s": round(float(np.median(lat)), 3),
        "motion_seconds_per_window": ecfg.stride / ecfg.fps,
        "frames_emitted": frames,
    })


if __name__ == "__main__":
    main()
