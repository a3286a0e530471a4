"""Batch-knee sweep for few-step (gated) serving + the parity config.

VERDICT r3 item 3: the serving batch knee was only ever established at
the DDPM-1000 parity config (b16, with an unexplained 2× regression at
b32), and never re-swept for the few-step modes where per-window denoise
work is ~15/1000 of parity and fixed costs (WavLM, seed chaining)
dominate — at 1.7 % MFU the chip is mostly idle, so a larger batch may
multiply the gated headline on the same silicon.

For each (mode, batch) cell this script measures the full windowed
engine end to end (median ± std over reps, not min-of-reps) and records
XLA `memory_analysis` of the compiled engine (argument/output/temp/
generated-code bytes) so a throughput cliff can be attributed (HBM
pressure/spills show up as temp-bytes jumps) rather than guessed at.

Output: one JSON line per cell to stdout AND appended to
`BATCH_KNEE_<tag>.jsonl`.

Env: SWEEP_BATCHES (default "8,16,24,32,48,64,96,128,192,256"),
SWEEP_STEPS (base schedule, default 1000), SWEEP_MODES (default
"gated,parity": 'gated' = fewest-step ok mode from the quality manifest,
'parity' = full DDPM chain), SWEEP_REPS (default 5), SWEEP_SECONDS
(default 20), SWEEP_TAG (artifact suffix, default "r04").
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
    from diffusestylegesture_tpu.sample.quality_gate import load_manifest
    from diffusestylegesture_tpu.utils.compile_cache import enable_persistent_cache
    from diffusestylegesture_tpu.utils.precision import bf16_cast

    enable_persistent_cache()
    batches = [int(b) for b in os.environ.get(
        "SWEEP_BATCHES", "8,16,24,32,48,64,96,128,192,256").split(",")]
    steps = int(os.environ.get("SWEEP_STEPS", "1000"))
    reps = int(os.environ.get("SWEEP_REPS", "5"))
    seconds = float(os.environ.get("SWEEP_SECONDS", "20"))
    tag = os.environ.get("SWEEP_TAG", "r04")
    wanted = os.environ.get("SWEEP_MODES", "gated,parity").split(",")

    betas = D.named_beta_schedule("cosine", steps)
    modes = {}
    if "parity" in wanted:
        modes["parity-ddpm%d" % steps] = (D.Schedule.create(betas), "ddpm")
    if "gated" in wanted:
        man = load_manifest(family="zeggs")
        if man is not None and man.get("baseline") == f"ddpm{steps}":
            ok_modes = []
            for name, e in man.get("modes", {}).items():
                if not e.get("ok"):
                    continue
                for fam in ("ddim", "dpmpp", "distill"):
                    if name.startswith(fam) and name[len(fam):].isdigit():
                        n = int(name[len(fam):])
                        samp = "ddim" if fam == "distill" else fam
                        ok_modes.append((n, samp, name))
            if ok_modes:
                n, samp, name = min(ok_modes)
                modes[f"gated-{name}"] = (
                    D.spaced_schedule(
                        betas, D.space_timesteps(steps, f"ddim{n}")), samp)
        if not any(k.startswith("gated") for k in modes):
            print(json.dumps({"note": "no applicable gated mode in the "
                              "quality manifest; sweeping parity only"}))

    # model + WavLM at the serving configuration (bf16 + tanh GELU — the
    # bench-gated serving trunk; see bench.py's precision gates)
    mcfg = MDMConfig(dtype=jnp.bfloat16, activation="gelu_tanh")
    model = MDM(mcfg)
    wcfg = WavLMConfig()
    wavlm = WavLM(wcfg)
    ecfg0 = ZeggsEngineConfig()
    T = ecfg0.n_poses
    rng = np.random.default_rng(0)
    x0 = jnp.zeros((1, mcfg.njoints, 1, T))
    cond0 = {
        "style": jnp.asarray(np.eye(6, dtype=np.float32)[:1]),
        "seed": x0[..., : mcfg.n_seed],
        "audio": jnp.zeros((1, T, 1024)),
        "mask_local": jnp.ones((1, T), bool),
    }
    params = bf16_cast(jax.jit(MDM(MDMConfig()).init)(
        jax.random.PRNGKey(0), x0, jnp.zeros((1,), jnp.int32), cond0))
    win = ecfg0.samples_per_seed + ecfg0.samples_per_stride
    wparams = bf16_cast(jax.jit(wavlm.init)(
        jax.random.PRNGKey(1), jnp.zeros((1, win))))
    wavlm_fn = make_zeggs_wavlm_fn(
        WavLM(WavLMConfig(dtype=jnp.bfloat16)), T)
    audio = rng.standard_normal(int(seconds * ecfg0.sr)).astype(np.float32) * 0.1
    eye = np.eye(6, dtype=np.float32)

    def model_apply(p, x, t, cond, uncond=None):
        return model.apply(p, x, t, cond, uncond=uncond)

    out_path = os.path.join(REPO, f"BATCH_KNEE_{tag}.jsonl")
    dev = jax.devices()[0]
    with open(out_path, "a") as fout:
        for mode_name, (sched, samp) in modes.items():
            for B in batches:
                ecfg = ZeggsEngineConfig(sampler=samp)
                sampler = ZeggsSampler(model_apply, wavlm_fn, sched, ecfg)
                style = np.tile(eye, (max(1, -(-B // 6)), 1))[:B]
                try:
                    t0 = time.perf_counter()
                    out = sampler.generate(
                        params, wparams, audio, style, jax.random.PRNGKey(0))
                    compile_s = time.perf_counter() - t0
                    rep_fps = []
                    for r in range(reps):
                        t0 = time.perf_counter()
                        out = sampler.generate(
                            params, wparams, audio, style,
                            jax.random.PRNGKey(1 + r))
                        dt = time.perf_counter() - t0
                        rep_fps.append(out.shape[0] * out.shape[1] / dt)
                    # device-memory picture for cliff attribution: a
                    # throughput cliff driven by HBM pressure (spills /
                    # re-layouts) shows up as a peak-bytes jump
                    memstats = {}
                    try:
                        ms = dev.memory_stats() or {}
                        for k in ("bytes_in_use", "peak_bytes_in_use",
                                  "largest_alloc_size"):
                            if k in ms:
                                memstats[k] = int(ms[k])
                    except Exception:
                        pass
                    row = {
                        "mode": mode_name, "batch": B,
                        "steps": sched.num_timesteps,
                        "fps_median": round(float(np.median(rep_fps)), 1),
                        "fps_std": round(float(np.std(rep_fps)), 1),
                        "fps_best": round(float(np.max(rep_fps)), 1),
                        "fps_per_stream": round(
                            float(np.median(rep_fps)) / B, 1),
                        "reps": reps,
                        "compile_s": round(compile_s, 1),
                        "device": getattr(dev, "device_kind", dev.platform),
                        **memstats,
                    }
                except Exception as e:  # OOM at large batch: record + stop
                    row = {"mode": mode_name, "batch": B,
                           "error": f"{type(e).__name__}: {e}"[:300]}
                    print(json.dumps(row), flush=True)
                    fout.write(json.dumps(row) + "\n")
                    fout.flush()
                    break
                print(json.dumps(row), flush=True)
                fout.write(json.dumps(row) + "\n")
                fout.flush()
    print("wrote", out_path)


if __name__ == "__main__":
    main()
