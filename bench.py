"""Headline benchmark: ZEGGS long-form generation throughput on one chip.

Measures the BASELINE.json north-star — gesture frames/sec for the full
DDPM-1000 + WavLM-Large stack (20 s clip = 5 windows x 1000 denoiser evals
+ 1 batched WavLM pass) end to end through the compiled windowed sampler —
in three configs:

  1. f32, batch 1      (round-1 headline config; parity-validated path)
  2. bf16, batch 1     (serving trunk dtype; validated on-device vs f32)
  3. bf16, batch 16    (multi-clip serving throughput: 16 styles decoded
                        concurrently — the chip-saturating config)

The headline is the batched bf16 number IF the on-device bf16-vs-f32
normalized error stays under tolerance, else the best f32 config. The unit
string reports all three plus model FLOPs/frame and the MFU of the headline
run (XLA cost_analysis FLOPs / wall / chip peak).

`vs_baseline` is the real-time factor: the reference target is RTX-2080Ti
real-time, i.e. >= 20 generated frames/sec at 20 fps (`BASELINE.md`), so
vs_baseline = frames_per_sec / 20.

Prints exactly one JSON line.
"""
import json
import os
import sys
import time

import numpy as np

# bf16 accepted only if the f32-std-normalized RMS deviation of the
# generated pose features stays below this (max-abs also reported); the
# diffusion math itself is f32, only the transformer trunk runs bf16.
BF16_TOL = 2e-2


def _chip_peak_flops(device) -> float:
    """Best-effort bf16 peak FLOP/s for the local chip."""
    kind = getattr(device, "device_kind", "").lower()
    table = {
        "v6": 918e12,  # Trillium
        "v5p": 459e12,
        "v5 lite": 197e12,
        "v5litepod": 197e12,
        "v5e": 197e12,
        "v4": 275e12,
        "v3": 123e12,
        "v2": 45e12,
    }
    for k, v in table.items():
        if k in kind:
            return v
    return 197e12  # assume v5e


def _cost_flops(jitted, *args) -> float:
    try:
        an = jitted.lower(*args).compile().cost_analysis()
        if isinstance(an, (list, tuple)):
            an = an[0]
        return float(an.get("flops", 0.0))
    except Exception:
        return 0.0


def bench_train():
    """BENCH_MODE=train: flagship ZEGGS train step throughput at the
    reference configuration (batch 300 × (88, 1141), full MDM, AdamW) —
    the reference's released checkpoint took 450k of these steps.

    Measures BOTH precisions with full utilization accounting:
      * f32 end-to-end (round-2 configuration), and
      * bf16 mixed precision (f32 master weights + bf16 trunk — the
        TPU-native `MixedPrecisionTrainer`, fp16_util.py:148-232),
        gated by an on-device loss/grad agreement check vs f32.
    Reports XLA cost-analysis FLOPs per step and MFU for each. The
    headline steps/s is the bf16 number when the gate passes.
    """
    import jax
    import jax.numpy as jnp

    from diffusestylegesture_tpu import diffusion as D
    from diffusestylegesture_tpu.models.mdm import MDM, MDMConfig
    from diffusestylegesture_tpu.train import TrainConfig, create_train_state, make_train_step
    from diffusestylegesture_tpu.train.state import make_zeggs_cond_builder
    from diffusestylegesture_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    B = int(os.environ.get("BENCH_TRAIN_BATCH", "300"))
    T = 88
    rng = np.random.default_rng(0)
    # BENCH_TRAIN_MOE=E: measure the Switch-MoE trunk (E experts) at the
    # same reference batch — feasible on one 16 GB chip only because the
    # dispatch is scatter/gather O(E·C·D), not the one-hot-einsum O(G²)
    moe_e = int(os.environ.get("BENCH_TRAIN_MOE", "0"))
    mcfg = MDMConfig(moe_experts=moe_e)
    batch = {
        "motion": rng.standard_normal((B, T, mcfg.njoints)).astype(np.float32),
        "style": np.eye(6, dtype=np.float32)[rng.integers(0, 6, B)],
        "wavlm": rng.standard_normal((B, T, 1024)).astype(np.float32),
    }
    x = jnp.zeros((B, mcfg.njoints, 1, T))
    cond = {
        "seed": x[..., : mcfg.n_seed],
        "style": jnp.asarray(batch["style"]),
        "audio": jnp.asarray(batch["wavlm"]),
        "mask_local": jnp.ones((B, T), bool),
    }
    params = jax.jit(MDM(mcfg).init)(
        jax.random.PRNGKey(0), x, jnp.zeros((B,), jnp.int32), cond
    )
    if moe_e:
        # trainables only: MoE init also returns the sown 'losses' scalar,
        # which must not enter the TrainState (cli.train strips it too)
        params = {"params": params["params"]}

    # device-resident batch: steady-state training streams windows from the
    # on-device cache (`data/device_cache.py`), so the steady-state step must
    # not re-upload ~230 MB of host arrays per step (which dominates through
    # a remote-dispatch tunnel).
    batch = jax.device_put(batch)
    jax.block_until_ready(batch)

    sched = D.Schedule.create(D.named_beta_schedule("cosine", 1000))
    dev = jax.devices()[0]
    peak = _chip_peak_flops(dev)

    def run_precision(compute_dtype):
        model = MDM(MDMConfig(dtype=jnp.dtype(compute_dtype), moe_experts=moe_e))
        if moe_e:
            from diffusestylegesture_tpu.models.moe import make_moe_apply

            apply = make_moe_apply(model)
        else:
            def apply(p, xx, tt, cc, train=False, rngs=None, uncond=None):
                return model.apply(p, xx, tt, cc, train=train, rngs=rngs,
                                   uncond=uncond)

        tcfg = TrainConfig(lr=3e-5, compute_dtype=compute_dtype,
                           moe_aux_weight=0.01 if moe_e else 0.0)
        step = jax.jit(
            make_train_step(apply, sched, tcfg, make_zeggs_cond_builder(mcfg.n_seed)),
            donate_argnums=(0,),
        )
        # fresh buffers per precision: the donated step deletes its input
        # state, and both states alias the shared init params otherwise
        state = create_train_state(jax.tree.map(jnp.copy, params), tcfg, 1000)
        rng0 = jax.random.PRNGKey(1)
        flops = _cost_flops(step, state, batch, rng0)
        state, m0 = step(state, batch, rng0)  # compile
        jax.block_until_ready(state.params)
        n = 10
        t0 = time.perf_counter()
        for i in range(n):
            state, m = step(state, batch, jax.random.PRNGKey(2 + i))
        jax.block_until_ready(state.params)
        dt = (time.perf_counter() - t0) / n
        return dt, flops, float(m0["loss"]), float(m0["grad_norm"])

    dt32, flops32, loss32, gnorm32 = run_precision("float32")
    dt16, flops16, loss16, gnorm16 = run_precision("bfloat16")

    # on-device mixed-precision gate: same rng → same t/noise; the first
    # step's loss and grad norm must agree with f32 within tolerance
    loss_rel = abs(loss16 - loss32) / max(abs(loss32), 1e-9)
    gnorm_rel = abs(gnorm16 - gnorm32) / max(gnorm32, 1e-9)
    bf16_ok = np.isfinite(loss16) and loss_rel < 0.05 and gnorm_rel < 0.2

    dt = dt16 if bf16_ok else dt32
    sps = 1.0 / dt
    mfu32 = flops32 / dt32 / peak if flops32 else 0.0
    mfu16 = flops16 / dt16 / peak if flops16 else 0.0
    hours_450k = 450_000 * dt / 3600.0
    print(
        json.dumps(
            {
                "metric": "zeggs_train_steps_per_sec_per_chip",
                "value": round(sps, 3),
                "unit": (
                    "steps/s (batch %d x (88,1141) full MDM%s+AdamW on %s; "
                    "%s %.0f ms/step; f32 %.0f ms/step %.1f TFLOP/step MFU %.1f%%; "
                    "bf16 %.0f ms/step %.1f TFLOP/step MFU %.1f%% "
                    "loss/gnorm rel-dev %.3g/%.3g%s; 450k-step schedule = %.1f h)"
                )
                % (
                    B, f"+MoE-{moe_e}experts" if moe_e else "",
                    getattr(dev, "device_kind", dev.platform),
                    "bf16" if bf16_ok else "f32", dt * 1e3,
                    dt32 * 1e3, flops32 / 1e12, mfu32 * 100.0,
                    dt16 * 1e3, flops16 / 1e12, mfu16 * 100.0,
                    loss_rel, gnorm_rel, " OK" if bf16_ok else " REJECTED",
                    hours_450k,
                ),
                "vs_baseline": round(sps, 3),
            }
        )
    )


def main():
    # Real hardware path: do NOT force CPU. Allow override via env.
    import jax
    import jax.numpy as jnp

    if os.environ.get("BENCH_MODE", "") == "train":
        bench_train()
        return

    # persistent compilation cache: repeat bench invocations skip the
    # multi-minute engine compile (verified effective under axon)
    from diffusestylegesture_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from diffusestylegesture_tpu import diffusion as D
    from diffusestylegesture_tpu.models.mdm import MDM, MDMConfig
    from diffusestylegesture_tpu.models.wavlm import (
        WavLM,
        WavLMConfig,
        make_zeggs_wavlm_fn,
    )
    from diffusestylegesture_tpu.sample import ZeggsEngineConfig, ZeggsSampler

    seconds = float(os.environ.get("BENCH_SECONDS", "20"))
    steps = int(os.environ.get("BENCH_DIFFUSION_STEPS", "1000"))
    big_batch = int(os.environ.get("BENCH_BATCH", "16"))
    reps = int(os.environ.get("BENCH_REPS", "5"))
    # BENCH_RESPACE=ddimN: serve with an N-step respaced DDIM chain instead
    # of the full 1000-step ancestral chain (the reference supports ddimN
    # respacing but never uses it; quality/speed tradeoff documented in
    # ROADMAP.md).
    respace = os.environ.get("BENCH_RESPACE", "")
    # BENCH_SAMPLER=dpmpp: DPM-Solver++(2M) over the respaced grid (2nd-order
    # ODE solver — DDIM-quality trajectories at ~an order of magnitude fewer
    # steps; pair with BENCH_RESPACE=ddim20).
    sampler_name = os.environ.get("BENCH_SAMPLER", "ddim" if respace else "ddpm")

    ecfg = ZeggsEngineConfig(sampler=sampler_name)
    if respace:
        sched = D.spaced_schedule(
            D.named_beta_schedule("cosine", steps), D.space_timesteps(steps, respace)
        )
        steps_label = f"{steps}-respaced-{respace}-{sampler_name}"
    else:
        sched = D.Schedule.create(D.named_beta_schedule("cosine", steps))
        steps_label = str(steps)
    wcfg = WavLMConfig()  # Large: 24 layers, d=1024

    rng = np.random.default_rng(0)
    audio = rng.standard_normal(int(seconds * ecfg.sr)).astype(np.float32) * 0.1
    eye = np.eye(6, dtype=np.float32)

    # --- init f32 params once (random weights: identical FLOPs/memory to
    # the released checkpoint), cast per config ---
    mcfg32 = MDMConfig(dtype=jnp.float32)
    T = ecfg.n_poses
    x0 = jnp.zeros((1, mcfg32.njoints, 1, T))
    cond0 = {
        "style": jnp.asarray(eye[:1]),
        "seed": x0[..., : mcfg32.n_seed],
        "audio": jnp.zeros((1, T, 1024)),
        "mask_local": jnp.ones((1, T), bool),
    }
    # jit the inits: one compiled (and persistently cached) program instead
    # of thousands of eagerly dispatched ops through the remote tunnel
    params32 = jax.jit(MDM(mcfg32).init)(
        jax.random.PRNGKey(0), x0, jnp.zeros((1,), jnp.int32), cond0
    )
    wavlm = WavLM(wcfg)
    wav_window = jnp.zeros((1, ecfg.samples_per_seed + ecfg.samples_per_stride))
    wparams32 = jax.jit(wavlm.init)(jax.random.PRNGKey(1), wav_window)

    from diffusestylegesture_tpu.utils.precision import bf16_cast

    wavlm_fn = make_zeggs_wavlm_fn(wavlm, ecfg.n_poses)
    # bf16 configs run the encoder in bf16 COMPUTE (WavLMConfig.dtype casts
    # the activations; bf16 params alone would promote back to f32) — at the
    # few-step frontier WavLM-Large is ~10x the denoiser FLOPs, so this is
    # where the gated modes' wall time lives. Validated by the same
    # end-to-end rms gate as the denoiser's bf16.
    import dataclasses as _dc

    wavlm_fn_bf16 = make_zeggs_wavlm_fn(
        WavLM(_dc.replace(wcfg, dtype=jnp.bfloat16)), ecfg.n_poses)

    from diffusestylegesture_tpu.sample.engine import slice_audio_windows

    dev_reps = int(os.environ.get("BENCH_DEV_REPS", "8"))
    dev_chain = int(os.environ.get("BENCH_DEV_CHAIN", "4"))

    def run_config(dtype, batch, key_base, activation="gelu"):
        cdt = jnp.bfloat16 if dtype == "bf16" else jnp.float32
        model = MDM(MDMConfig(dtype=cdt, activation=activation))
        params = bf16_cast(params32) if dtype == "bf16" else params32
        wparams = bf16_cast(wparams32) if dtype == "bf16" else wparams32

        def model_apply(p, x, t, cond, uncond=None):
            return model.apply(p, x, t, cond, uncond=uncond)

        sampler = ZeggsSampler(
            model_apply, wavlm_fn_bf16 if dtype == "bf16" else wavlm_fn,
            sched, ecfg)
        style = np.tile(eye, (max(1, -(-batch // 6)), 1))[:batch]
        # warmup (compile)
        out = sampler.generate(params, wparams, audio, style, jax.random.PRNGKey(key_base))
        rep_dts = []
        for rep in range(reps):
            t0 = time.perf_counter()
            out = sampler.generate(
                params, wparams, audio, style, jax.random.PRNGKey(key_base + 1 + rep)
            )
            rep_dts.append(time.perf_counter() - t0)
        dt = min(rep_dts)
        frames = out.shape[0] * out.shape[1]
        rep_fps = sorted(frames / d for d in rep_dts)
        # device-side throughput: identical program, result left on device
        # (device_out=True) AND inputs pre-staged on device (pre-sliced
        # audio windows uploaded once) — so the timed region is the chip,
        # not the dev tunnel in either direction. The e2e numbers above
        # include pulling the f32 output through the tunnel (~23 MB/s ≈
        # 4.5 KB/frame → a ~5,000 fps ceiling regardless of compute) — a
        # dev-harness artifact; a production host pays PCIe (<2% of wall
        # time). Each timing window chains `dev_chain` enqueued calls and
        # syncs once, amortizing per-call dispatch overhead (at 5-step NFE
        # one call is ~tens of ms — per-call sync noise was ±17% in r4).
        windows_dev = jnp.asarray(slice_audio_windows(audio, ecfg))
        style_dev = jax.device_put(np.asarray(style, np.float32))
        jax.block_until_ready((windows_dev, style_dev))
        out_d = sampler.generate(
            params, wparams, windows_dev, style_dev,
            jax.random.PRNGKey(key_base), device_out=True)
        jax.block_until_ready(out_d)
        # At low NFE one call is a few ms, so a fixed short chain leaves
        # the timed window inside host/tunnel dispatch jitter (observed
        # ±10% run-to-run). Size the chain so every timed window is at
        # least ~0.25 s of enqueued device work.
        t0 = time.perf_counter()
        jax.block_until_ready(sampler.generate(
            params, wparams, windows_dev, style_dev,
            jax.random.PRNGKey(key_base), device_out=True))
        est_call_s = max(time.perf_counter() - t0, 1e-4)
        chain = max(dev_chain, int(np.ceil(0.25 / est_call_s)))
        dev_rep_fps = []
        for rep in range(dev_reps):
            t0 = time.perf_counter()
            for c in range(chain):
                out_d = sampler.generate(
                    params, wparams, windows_dev, style_dev,
                    jax.random.PRNGKey(key_base + 1 + rep * chain + c),
                    device_out=True)
            jax.block_until_ready(out_d)
            dt_d = (time.perf_counter() - t0) / chain
            dev_rep_fps.append(out_d.shape[0] * out_d.shape[1] / dt_d)
        # delivered fps with an f16 OUTPUT transfer (engine transfer_dtype):
        # same end-to-end path as the headline e2e reps (host audio in,
        # host array out) but the result crosses the tunnel/PCIe at half
        # the bytes — the production answer when the output link, not the
        # chip, is the bottleneck (values equal within f16 rounding,
        # tests/test_engine.py)
        f16_rep_fps = []
        for rep in range(reps):
            t0 = time.perf_counter()
            out_f = sampler.generate(
                params, wparams, audio, style,
                jax.random.PRNGKey(key_base + 1 + rep),
                transfer_dtype=jnp.float16)
            f16_rep_fps.append(
                out_f.shape[0] * out_f.shape[1] / (time.perf_counter() - t0))
        return (frames / dt, dt, out, model_apply, params, rep_fps,
                dev_rep_fps, f16_rep_fps)

    fps32, dt32, out32, apply32, p32, rep32, dev32, f16_32 = run_config("f32", 1, 0)
    fps16, dt16, out16, apply16, p16, rep16, dev16, f16_16 = run_config("bf16", 1, 0)
    # on-device bf16 validation: same seeds (key_base identical) → same
    # injected noise path, so the deviation is purely numeric
    scale = out32.std() + 1e-9
    err_rms = float(np.sqrt(np.mean((out32 - out16) ** 2)) / scale)
    err_max = float(np.abs(out32 - out16).max() / scale)
    bf16_ok = np.isfinite(err_rms) and err_rms < BF16_TOL

    # tanh-approx GELU serving path: the erf polynomial alone is ~30% of
    # the trunk time at these shapes (scripts/trunk_microprobe.py); gate
    # it with the same on-device output tolerance before using it. Only
    # worth measuring when bf16 itself passed — ft_ok can never be True
    # otherwise, and the run costs a full compile + generates on-chip
    if bf16_ok:
        fps_ft, _, out_ft, _, _, _, _, _ = run_config(
            "bf16", 1, 0, activation="gelu_tanh")
        ft_rms = float(np.sqrt(np.mean((out32 - out_ft) ** 2)) / scale)
        ft_max = float(np.abs(out32 - out_ft).max() / scale)
    else:
        ft_rms = ft_max = float("nan")
    ft_ok = bf16_ok and np.isfinite(ft_rms) and ft_rms < BF16_TOL

    big_act = "gelu_tanh" if ft_ok else "gelu"
    fps_big, dt_big, out_big, apply_big, p_big, big_rep_fps, big_dev_fps, big_f16_fps = run_config(
        "bf16" if bf16_ok else "f32", big_batch, 100, activation=big_act
    )

    b1_fps, b1_reps, b1_dev, b1_f16 = ((fps16, rep16, dev16, f16_16)
                                       if bf16_ok
                                       else (fps32, rep32, dev32, f16_32))
    headline_fps = max(fps_big, b1_fps)
    # replicate fps list of whichever config carries the headline —
    # reported as median ± std so run-to-run tunnel variance is visible in
    # the artifact instead of silently moving the headline (r3: the same
    # gated config published 6,360 and 8,512 fps in different runs)
    headline_rep_fps = big_rep_fps if fps_big >= b1_fps else b1_reps
    # device-side replicate list of the same config (result left on
    # device): separates chip throughput from the dev tunnel's ~23 MB/s
    # output-transfer ceiling (~5,000 fps at 4.5 KB f32/frame —
    # KNEE_CLIFF_PROBE.jsonl). A production host pays PCIe instead.
    headline_dev_fps = big_dev_fps if fps_big >= b1_fps else b1_dev
    # f16-output-transfer variant of the same config (engine
    # transfer_dtype): the delivered path with half the output bytes
    headline_f16_fps = big_f16_fps if fps_big >= b1_fps else b1_f16

    # --- quality-gated fast serving (round 3): if the motion-quality
    # harness validated a respaced mode (FGD/beat-align vs DDPM-1000,
    # `scripts/quality_harness.py` → resources/quality_gate.json), measure
    # it too and let it carry the headline — the numeric bf16 gate above
    # covers precision, the manifest covers motion quality, so the fast
    # mode is "free" in both senses. Without a manifest (or with the mode
    # flagged degraded) the DDPM-1000 parity number stands.
    gated_fps, gated_label, gated_steps = 0.0, "", 0
    if not respace:  # explicit BENCH_RESPACE runs stay as-asked
        from diffusestylegesture_tpu.sample.quality_gate import load_manifest

        manifest = load_manifest()
        # the manifest only covers modes respaced from the SAME base
        # schedule (and smoke harness runs never write the shipped
        # manifest) — a mismatched baseline means no gated claim
        if manifest is not None and manifest.get("baseline") != f"ddpm{steps}":
            manifest = None
        candidates = []
        for mode_name, entry in (manifest or {}).get("modes", {}).items():
            if not entry.get("ok"):
                continue
            # distillN = a progressively distilled student serving an
            # N-step DDIM chain — the student has the teacher's exact
            # architecture, so an N-step DDIM chain on this model is the
            # cycle-identical throughput proxy (only the weight VALUES
            # differ between teacher and student)
            for samp in ("ddim", "dpmpp", "distill"):
                if mode_name.startswith(samp) and mode_name[len(samp):].isdigit():
                    n = int(mode_name[len(samp):])
                    if n < steps:
                        candidates.append((n, samp, mode_name))
        if candidates:
            # fewest steps per SAMPLER FAMILY, then take the best measured
            # fps — at short chains the fixed per-window cost (WavLM,
            # seed chaining) flattens the steps→fps curve enough that
            # e.g. dpmpp-20 and ddim-15 trade places run to run, so
            # measure both rather than assume fewest-NFE wins
            best = {}
            for n, samp, mode_name in sorted(candidates):
                fam = "ddim" if samp == "distill" else samp
                if fam not in best:
                    best[fam] = (n, fam, mode_name)
            saved = sched, ecfg
            for n, fam, mode_name in best.values():
                sched = D.spaced_schedule(
                    D.named_beta_schedule("cosine", steps),
                    D.space_timesteps(steps, f"ddim{n}"))
                ecfg = ZeggsEngineConfig(sampler=fam)
                try:
                    fps_mode, _, _, _, _, mode_rep_fps, mode_dev_fps, mode_f16_fps = run_config(
                        "bf16" if bf16_ok else "f32", big_batch, 200,
                        activation=big_act)
                finally:
                    sched, ecfg = saved
                if fps_mode > gated_fps:
                    gated_fps, gated_label, gated_steps = fps_mode, mode_name, n
                    gated_rep_fps = mode_rep_fps
                    gated_dev_fps = mode_dev_fps
                    gated_f16_fps = mode_f16_fps
            if gated_fps > headline_fps:
                headline_fps = gated_fps
                headline_rep_fps = gated_rep_fps
                headline_dev_fps = gated_dev_fps
                headline_f16_fps = gated_f16_fps

    # --- FLOPs accounting for the headline (batched) config ---
    dev = jax.devices()[0]
    B = big_batch
    xs = jnp.zeros((B, mcfg32.njoints, 1, T), jnp.float32)
    ts = jnp.zeros((B,), jnp.int32)
    conds = {
        "style": jnp.asarray(np.tile(eye, (max(1, -(-B // 6)), 1))[:B]),
        "seed": xs[..., : mcfg32.n_seed],
        "audio": jnp.zeros((B, T, 1024), jnp.float32),
        "mask_local": jnp.ones((B, T), bool),
    }
    den_flops = _cost_flops(jax.jit(apply_big), p_big, xs, ts, conds)
    windows = len(audio) // ecfg.samples_per_stride
    wav_in = jnp.zeros(
        (windows, ecfg.samples_per_seed + ecfg.samples_per_stride), jnp.float32
    )
    wl_params = bf16_cast(wparams32) if bf16_ok else wparams32
    wavlm_flops = _cost_flops(jax.jit(wavlm_fn), wl_params, wav_in)
    total_flops = den_flops * sched.num_timesteps * windows + wavlm_flops
    frames_big = out_big.shape[0] * out_big.shape[1]
    mfu = (
        total_flops / dt_big / _chip_peak_flops(dev) if total_flops and dt_big else 0.0
    )
    gflops_per_frame = total_flops / frames_big / 1e9 if total_flops else 0.0

    gated_note = ""
    if gated_label:
        # efficiency of the GATED run itself (its own step count × its
        # own fps) — the inline GFLOP/MFU figures describe the parity
        # config, not the headline, and must not be conflated
        g_flops = den_flops * gated_steps * windows + wavlm_flops
        g_gpf = g_flops / frames_big / 1e9
        g_mfu = g_gpf * 1e9 * gated_fps / _chip_peak_flops(dev)
        gated_note = (
            "; quality-gated %s %.0f fps, %.2f GFLOP/frame, MFU %.1f%% "
            "(FGD+diversity-validated vs DDPM-1000, resources/quality_gate.json)"
            % (gated_label, gated_fps, g_gpf, g_mfu * 100.0)
        )
    med = float(np.median(headline_rep_fps))
    std = float(np.std(headline_rep_fps))
    dev_med = float(np.median(headline_dev_fps))
    # robust spread: MAD-sigma (1.4826*MAD), immune to the single-window
    # outliers a shared dev tunnel produces
    dev_std = float(1.4826 * np.median(
        np.abs(np.asarray(headline_dev_fps) - dev_med)))
    f16_med = float(np.median(headline_f16_fps))
    result = {
        "metric": "zeggs_gen_frames_per_sec_per_chip",
        "value": round(headline_fps, 3),
        "median": round(med, 3),
        "std": round(std, 3),
        "device_fps_median": round(dev_med, 3),
        "device_fps_std": round(dev_std, 3),
        "delivered_f16_fps_median": round(f16_med, 3),
        "reps": len(headline_rep_fps),
        "provenance": {
            "delivered": (
                "generate() end-to-end incl. host audio slicing, input "
                "upload and f32 output pull through the dev tunnel; "
                "min/median over %d single-call reps" % reps),
            "device": (
                "same compiled program, inputs pre-staged on device, "
                "result left on device (device_out=True); median over "
                "%d timing windows, each chaining >=%d calls sized to "
                ">=0.25 s of device work, one sync per window; spread is "
                "MAD-sigma" % (dev_reps, dev_chain)),
            "delivered_f16": (
                "same end-to-end path as 'delivered' but the output "
                "crosses to the host as float16 (engine transfer_dtype — "
                "half the bytes on the transfer-bound link; values equal "
                "within f16 rounding); median over %d reps" % reps),
        },
        "unit": (
            "frames/s (headline median %.0f±%.0f over %d reps, "
            "device-side %.0f±%.0f fps with the result left on device, "
            "f16-transfer delivered %.0f fps — "
            "the gap is the dev tunnel's f32 output transfer, not compute; "
            "DDPM-%s+WavLM-Large parity config %.0f fps, %s batch %d on %s; "
            "b1 f32 %.0f fps, b1 bf16 %.0f fps, bf16 rms/max-err %.3g/%.3g%s; "
            "gelu_tanh rms/max-err %.3g/%.3g%s; "
            "parity-config %.1f GFLOP/frame, MFU %.1f%%, wall %.2fs%s)"
            % (
                med, std, len(headline_rep_fps),
                dev_med, dev_std,
                f16_med,
                steps_label,
                fps_big,
                ("bf16+" + big_act) if bf16_ok else "f32",
                big_batch,
                getattr(dev, "device_kind", dev.platform),
                fps32,
                fps16,
                err_rms,
                err_max,
                " OK" if bf16_ok else " REJECTED",
                ft_rms,
                ft_max,
                " OK" if ft_ok else " REJECTED",
                gflops_per_frame,
                mfu * 100.0,
                dt_big,
                gated_note,
            )
        ),
        "vs_baseline": round(headline_fps / 20.0, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
