"""Measure engine cold-start: AOT snapshot vs persistent-cache vs fresh.

Run twice in separate processes; the second run loads the snapshot and
reports time-to-first-output without tracing/lowering/compiling.

Usage: python scripts/aot_coldstart.py [snapshot_path]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

t_start = time.time()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from diffusestylegesture_tpu import diffusion as D  # noqa: E402
from diffusestylegesture_tpu.models.mdm import MDM, MDMConfig  # noqa: E402
from diffusestylegesture_tpu.models.wavlm import (  # noqa: E402
    WavLM,
    WavLMConfig,
    make_zeggs_wavlm_fn,
)
from diffusestylegesture_tpu.sample import ZeggsEngineConfig, ZeggsSampler  # noqa: E402
from diffusestylegesture_tpu.utils.aot import aot_compile  # noqa: E402
from diffusestylegesture_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dsg_engine.aotx"
    enable_persistent_cache()

    ecfg = ZeggsEngineConfig()
    sched = D.Schedule.create(D.named_beta_schedule("cosine", 1000))
    mcfg = MDMConfig()
    model = MDM(mcfg)
    wavlm = WavLM(WavLMConfig())
    T = ecfg.n_poses
    x = jnp.zeros((1, mcfg.njoints, 1, T))
    cond = {
        "style": jnp.asarray(np.eye(6, dtype=np.float32)[:1]),
        "seed": x[..., :8],
        "audio": jnp.zeros((1, T, 1024)),
        "mask_local": jnp.ones((1, T), bool),
    }
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32), cond)
    S = ecfg.samples_per_seed + ecfg.samples_per_stride
    wparams = jax.jit(wavlm.init)(jax.random.PRNGKey(1), jnp.zeros((1, S)))
    t_init = time.time()

    def model_apply(p, xx, tt, cc, uncond=None):
        return model.apply(p, xx, tt, cc, uncond=uncond)

    sampler = ZeggsSampler(model_apply, make_zeggs_wavlm_fn(wavlm, T), sched, ecfg)
    W = 5  # 20 s clip

    def engine_fn(params, wparams, windows, style, key):
        return sampler._generate_impl(
            params, wparams, windows, style, key, None,
            num_windows=W, host_feats=False,
        )

    rng = np.random.default_rng(0)
    windows = jnp.asarray(rng.standard_normal((W, S)).astype(np.float32) * 0.1)
    style = jnp.asarray(np.eye(6, dtype=np.float32)[:1])
    key = jax.random.PRNGKey(0)

    existed = os.path.exists(path)
    run = aot_compile(engine_fn, (params, wparams, windows, style, key), path, verbose=True)
    t_ready = time.time()
    out = run(params, wparams, windows, style, key)
    jax.block_until_ready(out)
    t_first = time.time()
    print(
        f"mode={'LOAD' if existed else 'COMPILE+SAVE'} imports+init={t_init - t_start:.1f}s "
        f"ready={t_ready - t_init:.1f}s first_output={t_first - t_ready:.1f}s "
        f"TOTAL={t_first - t_start:.1f}s"
    )


if __name__ == "__main__":
    main()
