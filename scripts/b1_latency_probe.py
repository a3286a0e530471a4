"""Single-stream (batch-1) denoiser-step latency probe (VERDICT r2 weak #7).

The b1 serving number (573 fps f32 in BENCH_r02) implies ~1.6 ms per
denoiser step, while the batched ablation puts the b16 step at 729 µs —
so how much of the b1 step is real compute vs per-iteration scan
overhead (carry round-trip, RNG split, loop bookkeeping)?

This probe times the full 1000-step `p_sample_loop` over the flagship
ZEGGS MDM at batch 1 (and 16 for reference) with `SamplerConfig.unroll`
∈ {1, 2, 4} in f32 and bf16, isolating the denoiser chain (no WavLM, no
window stitching). If unrolling k steps per scan body meaningfully cuts
the per-step time, the scan carry is overhead worth keeping unrolled;
if not, b1 latency is genuinely compute/HBM-bound and the knob stays at
1 (decision recorded in ROADMAP.md either way, like the int8/Pallas
probes).

Run on the real chip: `timeout 1800 python scripts/b1_latency_probe.py`
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from diffusestylegesture_tpu import diffusion as D  # noqa: E402
from diffusestylegesture_tpu.diffusion.sampling import (  # noqa: E402
    SamplerConfig, p_sample_loop)
from diffusestylegesture_tpu.models.mdm import MDM, MDMConfig  # noqa: E402
from diffusestylegesture_tpu.utils.compile_cache import (  # noqa: E402
    enable_persistent_cache)


def main():
    enable_persistent_cache()
    steps = int(os.environ.get("PROBE_STEPS", "1000"))
    reps = int(os.environ.get("PROBE_REPS", "3"))
    T = 88
    sched = D.Schedule.create(D.named_beta_schedule("cosine", steps))

    mcfg32 = MDMConfig()
    x0 = jnp.zeros((1, mcfg32.njoints, 1, T))
    cond1 = {
        "style": jnp.asarray(np.eye(6, dtype=np.float32)[:1]),
        "seed": x0[..., : mcfg32.n_seed],
        "audio": jnp.zeros((1, T, 1024)),
        "mask_local": jnp.ones((1, T), bool),
    }
    params32 = jax.jit(MDM(mcfg32).init)(
        jax.random.PRNGKey(0), x0, jnp.zeros((1,), jnp.int32), cond1)

    from diffusestylegesture_tpu.utils.precision import bf16_cast as bf16

    results = []
    for dtype in ("f32", "bf16"):
        model = MDM(MDMConfig(dtype=jnp.bfloat16 if dtype == "bf16" else jnp.float32))
        params = bf16(params32) if dtype == "bf16" else params32
        for B in (1, 16):
            cond = jax.tree.map(
                lambda a: jnp.broadcast_to(a, (B,) + a.shape[1:]), cond1)
            shape = (B, mcfg32.njoints, 1, T)

            for unroll in (1, 2, 4):
                scfg = SamplerConfig(unroll=unroll)

                @jax.jit
                def run(p, key, _cond=cond, _shape=shape, _scfg=scfg, _m=model):
                    def model_fn(x, t):
                        return _m.apply(p, x, t, _cond)
                    return p_sample_loop(sched, model_fn, _shape, key, cfg=_scfg)

                out = run(params, jax.random.PRNGKey(0))
                jax.block_until_ready(out)
                dt = float("inf")
                for r in range(reps):
                    t0 = time.perf_counter()
                    out = run(params, jax.random.PRNGKey(1 + r))
                    jax.block_until_ready(out)
                    dt = min(dt, time.perf_counter() - t0)
                us_per_step = dt / steps * 1e6
                results.append({
                    "dtype": dtype, "batch": B, "unroll": unroll,
                    "wall_s": round(dt, 4),
                    "us_per_step": round(us_per_step, 1),
                })
                print(json.dumps(results[-1]))

    # summary: unroll speedup at b1
    def find(d, b, u):
        return next(r for r in results if r["dtype"] == d and r["batch"] == b
                    and r["unroll"] == u)

    for d in ("f32", "bf16"):
        base = find(d, 1, 1)["us_per_step"]
        best = min(find(d, 1, u)["us_per_step"] for u in (1, 2, 4))
        print(f"SUMMARY {d} b1: {base:.0f} us/step at unroll=1, "
              f"best {best:.0f} us/step ({(base - best) / base * 100:.1f}% gain)")
    with open(os.path.join(REPO, "B1_LATENCY_PROBE.jsonl"), "w") as f:
        for r in results:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
