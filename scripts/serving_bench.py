"""Serving SLO bench: latency percentiles under Poisson arrivals +
streaming time-to-first-motion, through GestureServer on real hardware.

Two workloads over the full DDPM (or respaced) + WavLM-Large stack:

  1. **Batch serving under Poisson arrivals** — requests for 8 s clips
     (random styles) arrive as a Poisson process at SERVE_RPS requests/s;
     each request's submit→result latency is recorded. Reports p50/p95/
     p99/mean latency, aggregate frames/s, requests/min (the round-3
     bench reported only the aggregate — VERDICT r3 item 5).
  2. **Streaming TTFM** — `ZeggsStreamSampler` at batch 1/4/16: wall time
     from pushing the first window's audio to its motion frames being on
     the host, median over trials (first trial = compile, excluded).

Writes one JSON line per workload AND `SERVING_SLO_<tag>.json`.

Env: SERVE_N (requests, default 32), SERVE_BATCH (max_batch, default 16),
SERVE_RPS (Poisson arrival rate, default 2.0), SERVE_STEPS (schedule,
default 1000), SERVE_RESPACE (e.g. "ddim15" to serve the quality-gated
few-step grid), SERVE_TAG (default "r04"), SERVE_TTFM_TRIALS (default 5).
"""
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_requests = int(os.environ.get("SERVE_N", sys.argv[1] if len(sys.argv) > 1 else 32))
    max_batch = int(os.environ.get("SERVE_BATCH", sys.argv[2] if len(sys.argv) > 2 else 16))
    rps = float(os.environ.get("SERVE_RPS", "2.0"))
    steps = int(os.environ.get("SERVE_STEPS", "1000"))
    respace = os.environ.get("SERVE_RESPACE", "")
    tag = os.environ.get("SERVE_TAG", "r04")
    ttfm_trials = int(os.environ.get("SERVE_TTFM_TRIALS", "5"))

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
    from diffusestylegesture_tpu.sample.streaming import ZeggsStreamSampler
    from diffusestylegesture_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    ecfg = ZeggsEngineConfig(sampler="dpmpp" if respace else "ddpm")
    betas = D.named_beta_schedule("cosine", steps)
    if respace:
        sched = D.spaced_schedule(betas, D.space_timesteps(steps, respace))
        sched_label = f"{steps}-respaced-{respace}-dpmpp"
    else:
        sched = D.Schedule.create(betas)
        sched_label = str(steps)
    mcfg = MDMConfig(dtype=jnp.bfloat16)
    model = MDM(mcfg)
    wavlm = WavLM(WavLMConfig(dtype=jnp.bfloat16))
    T = ecfg.n_poses
    x = jnp.zeros((1, mcfg.njoints, 1, T))
    cond = {"style": jnp.asarray(np.eye(6, dtype=np.float32)[:1]), "seed": x[..., :8],
            "audio": jnp.zeros((1, T, 1024)), "mask_local": jnp.ones((1, T), bool)}
    params32 = jax.jit(MDM(MDMConfig()).init)(
        jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32), cond
    )
    S = ecfg.samples_per_seed + ecfg.samples_per_stride
    wparams32 = jax.jit(WavLM(WavLMConfig()).init)(
        jax.random.PRNGKey(1), jnp.zeros((1, S)))
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

    # --- Poisson arrivals: submit from a timer thread, record latencies ---
    arrivals = np.cumsum(rng.exponential(1.0 / rps, n_requests))
    latencies = [None] * n_requests
    futs = [None] * n_requests
    t_submit = [None] * n_requests

    def submitter():
        t0 = time.perf_counter()
        for i, at in enumerate(arrivals):
            now = time.perf_counter() - t0
            if at > now:
                time.sleep(at - now)
            t_submit[i] = time.perf_counter()
            futs[i] = server.submit(clip, eye[i % 6])

    th = threading.Thread(target=submitter)
    t0 = time.perf_counter()
    th.start()
    th.join()
    outs = []
    for i in range(n_requests):
        outs.append(futs[i].result())
        latencies[i] = time.perf_counter() - t_submit[i]
    dt = time.perf_counter() - t0
    server.stop()

    frames = sum(o.shape[0] for o in outs)
    lat = np.array(latencies)
    poisson_row = {
        "workload": "poisson",
        "schedule": sched_label,
        "n_requests": n_requests,
        "arrival_rps": rps,
        "max_batch": max_batch,
        "clip_seconds": 8.0,
        "p50_s": round(float(np.percentile(lat, 50)), 3),
        "p95_s": round(float(np.percentile(lat, 95)), 3),
        "p99_s": round(float(np.percentile(lat, 99)), 3),
        "mean_s": round(float(lat.mean()), 3),
        "max_s": round(float(lat.max()), 3),
        "agg_frames_per_sec": round(frames / dt, 1),
        "req_per_min": round(n_requests / dt * 60, 1),
        "batches": server.batches_served,
        "wall_s": round(dt, 2),
    }
    print(json.dumps(poisson_row), flush=True)

    # --- streaming time-to-first-motion at batch 1 / 4 / 16 ---
    ttfm_rows = []
    win0 = rng.standard_normal(ecfg.samples_per_stride).astype(np.float32) * 0.1
    for B in (1, 4, 16):
        styles = eye[np.arange(B) % 6]
        trials = []
        for trial in range(ttfm_trials + 1):  # trial 0 pays the compile
            stream = ZeggsStreamSampler(
                sampler, params, wparams, styles, jax.random.PRNGKey(trial))
            t0 = time.perf_counter()
            out = stream.push(win0)
            dt0 = time.perf_counter() - t0
            assert out and out[0].shape[0] == B, "no first-window motion"
            if trial > 0:
                trials.append(dt0)
        ttfm_rows.append({
            "workload": "streaming_ttfm",
            "schedule": sched_label,
            "batch": B,
            "ttfm_median_s": round(float(np.median(trials)), 3),
            "ttfm_std_s": round(float(np.std(trials)), 3),
            "trials": len(trials),
            "first_chunk_frames": int(out[0].shape[1]),
        })
        print(json.dumps(ttfm_rows[-1]), flush=True)

    dev = jax.devices()[0]
    artifact = {
        "device": getattr(dev, "device_kind", dev.platform),
        "poisson": poisson_row,
        "streaming_ttfm": ttfm_rows,
    }
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"SERVING_SLO_{tag}.json")
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
