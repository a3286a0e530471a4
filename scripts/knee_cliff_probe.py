"""Attribute the batch-knee throughput cliffs in the windowed engine.

`scripts/batch_knee_sweep.py` (BATCH_KNEE_r04.jsonl) measures sharp
non-monotonic cliffs in end-to-end engine throughput — gated dpmpp5:
b96 5,026 fps → b128 1,707 → b192 3,168; parity ddpm1000 historically
b24 flat → b32 2× down (ROADMAP r3). WavLM cannot be the cause (the
encoder runs per-WINDOW, shared across the B noise streams), so the
cliff lives in the denoise trunk or the scan plumbing. This probe
separates, per batch size:

  * full engine wall time (same measurement as the sweep)
  * XLA `memory_analysis()` of the compiled engine program —
    temp-bytes jumps attribute a cliff to HBM pressure/spills,
    flat temps point at layout/fusion choices instead
  * the windowed-trunk-only time, obtained by swapping the WavLM for
    a compiled near-zero-cost stub with identical output shape

Writes one JSON line per (batch,) cell to stdout and
KNEE_CLIFF_PROBE.jsonl. Env: PROBE_BATCHES (default "96,112,128,160,192"),
PROBE_STEPS (default 1000), PROBE_NFE (default 5 → dpmpp5),
PROBE_SECONDS (default 20), PROBE_REPS (default 5).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    import jax.numpy as jnp

    from diffusestylegesture_tpu import diffusion as D
    from diffusestylegesture_tpu.models.mdm import MDM, MDMConfig
    from diffusestylegesture_tpu.models.wavlm import (
        WavLM,
        WavLMConfig,
        make_zeggs_wavlm_fn,
    )
    from diffusestylegesture_tpu.sample import ZeggsEngineConfig, ZeggsSampler
    from diffusestylegesture_tpu.sample.engine import slice_audio_windows
    from diffusestylegesture_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )
    from diffusestylegesture_tpu.utils.precision import bf16_cast

    enable_persistent_cache()
    batches = [int(b) for b in os.environ.get(
        "PROBE_BATCHES", "96,112,128,160,192").split(",")]
    steps = int(os.environ.get("PROBE_STEPS", "1000"))
    nfe = int(os.environ.get("PROBE_NFE", "5"))
    seconds = float(os.environ.get("PROBE_SECONDS", "20"))
    reps = int(os.environ.get("PROBE_REPS", "5"))

    betas = D.named_beta_schedule("cosine", steps)
    sched = D.spaced_schedule(betas, D.space_timesteps(steps, f"ddim{nfe}"))

    mcfg = MDMConfig(dtype=jnp.bfloat16, activation="gelu_tanh")
    model = MDM(mcfg)
    ecfg = ZeggsEngineConfig(sampler="dpmpp")
    T = ecfg.n_poses
    x0 = jnp.zeros((1, mcfg.njoints, 1, T))
    cond0 = {
        "style": jnp.asarray(np.eye(6, dtype=np.float32)[:1]),
        "seed": x0[..., : mcfg.n_seed],
        "audio": jnp.zeros((1, T, 1024)),
        "mask_local": jnp.ones((1, T), bool),
    }
    params = bf16_cast(jax.jit(MDM(MDMConfig()).init)(
        jax.random.PRNGKey(0), x0, jnp.zeros((1,), jnp.int32), cond0))
    win = ecfg.samples_per_seed + ecfg.samples_per_stride
    wavlm = WavLM(WavLMConfig())
    wparams = bf16_cast(jax.jit(wavlm.init)(
        jax.random.PRNGKey(1), jnp.zeros((1, win))))
    real_wavlm_fn = make_zeggs_wavlm_fn(
        WavLM(WavLMConfig(dtype=jnp.bfloat16)), T)

    def stub_wavlm_fn(wp, windows):
        # identical output shape/dtype at ~zero FLOPs: mean over samples
        # broadcast to (W, T, 1024); keeps the downstream program intact
        m = jnp.mean(windows, axis=-1, keepdims=True)  # (W, 1)
        return jnp.broadcast_to(
            m[:, :, None], (windows.shape[0], T, 1024)).astype(jnp.bfloat16)

    def model_apply(p, x, t, cond, uncond=None):
        return model.apply(p, x, t, cond, uncond=uncond)

    audio = np.random.default_rng(0).standard_normal(
        int(seconds * ecfg.sr)).astype(np.float32) * 0.1
    # pre-stage every argument on device ONCE: at few-step NFE the whole
    # generate is ~tens of ms, and re-uploading windows/style through the
    # dev tunnel inside the timed region was 30-40% noise (VERDICT r4
    # item 6 — negative wavlm_share with fps std up to 40% of median)
    windows_dev = jnp.asarray(slice_audio_windows(audio, ecfg))
    jax.block_until_ready(windows_dev)
    W = int(windows_dev.shape[0])
    eye = np.eye(6, dtype=np.float32)
    chain = int(os.environ.get("PROBE_CHAIN", "4"))

    out_path = os.path.join(REPO, "KNEE_CLIFF_PROBE.jsonl")
    # truncate up front (stale pre-fix rows must not mix into the
    # committed artifact — same discipline as train_microprobe.py)
    open(out_path, "w").close()
    with open(out_path, "a") as fout:
        for B in batches:
            style = jax.device_put(
                np.tile(eye, (max(1, -(-B // 6)), 1))[:B])
            jax.block_until_ready(style)
            row = {"batch": B, "nfe": nfe, "windows": W,
                   "reps": reps, "chain": chain}
            for label, wfn in (("full", real_wavlm_fn),
                               ("trunk_only", stub_wavlm_fn)):
                sampler = ZeggsSampler(model_apply, wfn, sched, ecfg)
                # compile explicitly so memory_analysis is available
                lowered = sampler._generate.lower(
                    params, wparams, windows_dev,
                    style, jax.random.PRNGKey(0), None,
                    num_windows=W, host_feats=False)
                t0 = time.perf_counter()
                compiled = lowered.compile()
                row[f"{label}_compile_s"] = round(time.perf_counter() - t0, 1)
                try:
                    ma = compiled.memory_analysis()
                    row[f"{label}_temp_mb"] = round(
                        ma.temp_size_in_bytes / 1e6, 1)
                    row[f"{label}_output_mb"] = round(
                        ma.output_size_in_bytes / 1e6, 1)
                    row[f"{label}_argument_mb"] = round(
                        ma.argument_size_in_bytes / 1e6, 1)
                except Exception as e:
                    row[f"{label}_memory_analysis"] = f"unavailable: {e}"[:120]
                # warmup once (first call pays transfers/allocations)
                out = compiled(params, wparams, windows_dev, style,
                               jax.random.PRNGKey(0), None)
                jax.block_until_ready(out)
                fps = []
                for r in range(reps):
                    # each timing window chains `chain` enqueued calls and
                    # syncs once: per-call dispatch+sync overhead through
                    # the tunnel amortizes 1/chain, stabilizing short runs
                    t0 = time.perf_counter()
                    for c in range(chain):
                        out = compiled(params, wparams, windows_dev, style,
                                       jax.random.PRNGKey(1 + r * chain + c),
                                       None)
                    jax.block_until_ready(out)
                    dt = (time.perf_counter() - t0) / chain
                    # engine output is (B, C, 1, frames) — generate()
                    # transposes host-side (engine.py:374)
                    fps.append(out.shape[0] * out.shape[-1] / dt)
                row[f"{label}_fps_median"] = round(float(np.median(fps)), 1)
                # MAD-derived robust sigma (×1.4826) — a single straggler
                # rep must not dominate the error bar
                med = float(np.median(fps))
                mad_sigma = 1.4826 * float(np.median(
                    [abs(f - med) for f in fps]))
                row[f"{label}_fps_mad_sigma"] = round(mad_sigma, 1)
                row[f"{label}_fps_std"] = round(float(np.std(fps)), 1)
            # WavLM share of wall time = 1 − t_trunk/t_full, with a
            # first-order error bar from the two medians' MAD sigmas; a
            # share whose ±2σ interval crosses 0 is reported but flagged
            f_med = row["full_fps_median"]
            t_med = max(row["trunk_only_fps_median"], 1e-9)
            share = 1.0 - f_med / t_med
            rel = ((row["full_fps_mad_sigma"] / max(f_med, 1e-9)) ** 2
                   + (row["trunk_only_fps_mad_sigma"] / t_med) ** 2) ** 0.5
            share_sigma = abs(f_med / t_med) * rel
            row["wavlm_share"] = round(share, 3)
            row["wavlm_share_sigma"] = round(share_sigma, 3)
            row["wavlm_share_resolved"] = bool(abs(share) > 2 * share_sigma)
            print(json.dumps(row), flush=True)
            fout.write(json.dumps(row) + "\n")
            fout.flush()
    print("wrote", out_path)


if __name__ == "__main__":
    main()
