"""End-to-end serving throughput through GestureServer on real hardware.

Submits N concurrent 8 s requests (random styles) to the micro-batching
server over the full DDPM-1000 + WavLM-Large stack and reports aggregate
frames/s and requests/min at steady state.

Usage: python scripts/serving_bench.py [n_requests] [max_batch]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_requests = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    max_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import jax
    import jax.numpy as jnp

    from diffusestylegesture_tpu import diffusion as D
    from diffusestylegesture_tpu.models.mdm import MDM, MDMConfig
    from diffusestylegesture_tpu.models.wavlm import WavLM, WavLMConfig, make_zeggs_wavlm_fn
    from diffusestylegesture_tpu.sample import (
        GestureServer,
        ServerConfig,
        ZeggsEngineConfig,
        ZeggsSampler,
    )
    from diffusestylegesture_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    ecfg = ZeggsEngineConfig()
    sched = D.Schedule.create(D.named_beta_schedule("cosine", 1000))
    mcfg = MDMConfig(dtype=jnp.bfloat16)
    model = MDM(mcfg)
    wavlm = WavLM(WavLMConfig())
    T = ecfg.n_poses
    x = jnp.zeros((1, mcfg.njoints, 1, T))
    cond = {"style": jnp.asarray(np.eye(6, dtype=np.float32)[:1]), "seed": x[..., :8],
            "audio": jnp.zeros((1, T, 1024)), "mask_local": jnp.ones((1, T), bool)}
    params32 = jax.jit(MDM(MDMConfig()).init)(
        jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32), cond
    )
    S = ecfg.samples_per_seed + ecfg.samples_per_stride
    wparams32 = jax.jit(wavlm.init)(jax.random.PRNGKey(1), jnp.zeros((1, S)))
    from diffusestylegesture_tpu.utils.precision import bf16_cast as cast
    params, wparams = cast(params32), cast(wparams32)

    def model_apply(p, xx, tt, cc, uncond=None):
        return model.apply(p, xx, tt, cc, uncond=uncond)

    sampler = ZeggsSampler(model_apply, make_zeggs_wavlm_fn(wavlm, T), sched, ecfg)
    server = GestureServer(
        sampler, params, wparams,
        cfg=ServerConfig(max_batch=max_batch, max_delay_ms=100.0,
                         window_buckets=(2,)),
    ).start()

    rng = np.random.default_rng(0)
    clip = rng.standard_normal(2 * ecfg.samples_per_stride).astype(np.float32) * 0.1
    eye = np.eye(6, dtype=np.float32)

    # warm-up batch (compile)
    server.submit(clip, eye[0]).result()

    t0 = time.perf_counter()
    futs = [server.submit(clip, eye[i % 6]) for i in range(n_requests)]
    outs = [f.result() for f in futs]
    dt = time.perf_counter() - t0
    server.stop()

    frames = sum(o.shape[0] for o in outs)
    print(
        f"served {n_requests} x 8s clips (batch<= {max_batch}) in {dt:.2f}s: "
        f"{frames / dt:.0f} frames/s aggregate, {n_requests / dt * 60:.1f} req/min, "
        f"{server.batches_served} batches"
    )


if __name__ == "__main__":
    main()
