"""In-env motion-quality harness for the fast serving modes (VERDICT r2
items 1 + 6).

One command drives the ENTIRE product loop end to end and closes the
quality gap on fast serving:

  1. synthesize a structured, audio-synchronized ZEGGS-format corpus
     (wav + BVH pairs; gesture strokes locked to audio beats, two
     styles with distinct motion character);
  2. build the dataset with the real `data.build_zeggs_dataset`
     featurizer (wav→MFCC, BVH→1141-d) and cache pseudo-WavLM audio
     features (a fixed random spectral projection standing in for the
     frozen encoder, which has no released weights in this image);
  3. train a REAL full-architecture ZEGGS MDM on-chip for a few
     thousand steps through `cli.train` (loss curve → CSV, orbax
     checkpoint);
  4. generate held-out clips with every serving mode — DDPM-1000
     (reference configuration), ddim100, DPM-Solver++(2M) 20-step, and
     a progressively distilled student — through the compiled windowed
     sampler, writing pose-feature npys and a BVH;
  5. score each mode against ground truth with the product eval stack
     (`cli.eval`: FGD over a trained autoencoder embedding, diversity,
     beat alignment vs wav onsets);
  6. write `QUALITY_r03.json` (full results), the serving gate manifest
     `diffusestylegesture_tpu/resources/quality_gate.json` (consumed by
     `cli.sample` — a mode whose FGD degrades beyond tolerance is
     refused), and the convergence artifact `DEMO_r03.md`.

Env knobs: QH_STEPS (train steps, default 3000), QH_WORKDIR,
QH_DISTILL_STAGES (default 3 → 125-step student; with more stages every
student from the 3rd halving down becomes its own FGD-gated mode, so
e.g. stages=6 gates 125/62/31/15-step serving — QH_DISTILL_EVAL=3,6
narrows which stage indices are evaluated), QH_DISTILL_STEPS (distill
steps per stage, default 400), QH_SKIP_TRAIN=1 to reuse an existing
checkpoint, QH_EXTRA_MODES (comma-separated additional teacher-weight
modes like "dpmpp10,ddim25" — each is an FGD-gated candidate, letting
the gate, not an assumption, decide how few solver steps quality
tolerates).

Run: `timeout 3600 python scripts/quality_harness.py`
"""
from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Honor JAX_PLATFORMS=cpu even when the container's sitecustomize already
# imported jax and registered the remote-TPU (axon) plugin — the env var
# alone is too late at that point (same guard as __graft_entry__).
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

SR = 16000
FPS_BVH = 60  # ZEGGS source BVHs are 60 fps (featurizer decimates to 20)
FPS = 20
N_POSES, N_SEED = 88, 8
# QH_DIFFUSION_STEPS < 1000 is a smoke configuration (CI/dev); the real
# harness runs the reference's 1000-step schedule
DIFFUSION_STEPS = int(os.environ.get("QH_DIFFUSION_STEPS", "1000"))


def _env_flag(name: str) -> bool:
    """Boolean env knob: '', '0', 'false', 'no' are OFF (plain string
    truthiness would turn QH_SMALL=0 into the tiny trunk)."""
    return os.environ.get(name, "").strip().lower() not in (
        "", "0", "false", "no")


SMALL = _env_flag("QH_SMALL")  # tiny trunk for smoke runs
FGD_RATIO_TOL = 1.5  # fast mode accepted if FGD ≤ 1.5× the DDPM-1000 FGD
# ... AND it keeps a real fraction of the baseline's sample diversity: FGD
# compares distribution means/covariances against ground truth, so a
# mode-collapsed sampler (every clip the same plausible motion) can stay
# inside the FGD tolerance — measured: the 7-step distilled student hit
# FGD ratio 1.09 with diversity 0.04 vs the teacher's 4.45. Both axes gate.
DIVERSITY_RATIO_MIN = 0.25

STYLES = {  # style token → (tempo_hz, motion_freq_hz, amplitude_deg)
    "Happy": (2.0, 1.0, 18.0),
    "Sad": (1.25, 0.5, 8.0),
}
TRAIN_CLIPS = 8
EVAL_CLIPS = 3
CLIP_SECONDS = 30.0
EVAL_SECONDS = 24.0


# ---------------------------------------------------------------------------
# 1. structured audio-synchronized corpus
# ---------------------------------------------------------------------------


def synth_clip(style: str, seed: int, seconds: float):
    """Audio with click-train beats + motion whose strokes ride the beats.

    The point is learnability and metric sensitivity: gesture "strokes"
    (angular-velocity bumps) occur exactly on audio beats, amplitudes
    track the audio envelope, and each style has its own tempo/frequency/
    amplitude character — so a well-sampled model scores high beat
    alignment and style-consistent FGD, and a degraded sampler shows up.
    """
    from diffusestylegesture_tpu.motion import zeggs_features as zf

    tempo, mfreq, amp = STYLES[style]
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * SR)) / SR

    # --- audio: carrier + beat clicks + envelope ---
    env = 0.55 + 0.45 * np.sin(2 * np.pi * 0.11 * t + rng.uniform(0, 6.28))
    carrier = 0.25 * np.sin(2 * np.pi * (170 + 40 * np.sin(2 * np.pi * 0.07 * t)) * t)
    wav = carrier * env
    beat_times = np.arange(0.5, seconds - 0.3, 1.0 / tempo)
    beat_times = beat_times + rng.uniform(-0.02, 0.02, beat_times.shape)
    click = np.sin(2 * np.pi * 3000 * np.arange(240) / SR) * np.hanning(240)
    for bt in beat_times:
        i = int(bt * SR)
        wav[i: i + 240] += 0.8 * click[: len(wav) - i]
    wav = (wav / np.abs(wav).max() * 0.9).astype(np.float32)

    # --- motion: smooth oscillation + beat-locked strokes ---
    T = int(seconds * FPS_BVH)
    tf = np.arange(T) / FPS_BVH
    J = zf.ZEGGS_NJOINTS
    env_f = np.interp(tf, t, env)
    # stroke profile: gaussian angular-velocity bump at each beat
    stroke = np.zeros(T)
    for bt in beat_times:
        stroke += np.exp(-0.5 * ((tf - bt) / 0.09) ** 2)
    stroke_phase = np.cumsum(stroke) / FPS_BVH * 2.0 * np.pi * tempo

    base = rng.uniform(-12, 12, (J, 3)).astype(np.float32)
    freqs = mfreq * rng.uniform(0.6, 1.4, (J, 3))
    phases = rng.uniform(0, 2 * np.pi, (J, 3))
    ampj = amp * rng.uniform(0.4, 1.0, (J, 3))
    osc = np.sin(
        2 * np.pi * freqs[None] * tf[:, None, None]
        + phases[None]
        + 0.6 * stroke_phase[:, None, None]
    )
    rot = base[None] + (ampj[None] * env_f[:, None, None]) * osc
    # keep the root stable so root extraction is sane
    rot[:, 0, :] *= 0.15

    offsets = rng.uniform(-5, 5, (J, 3)).astype(np.float32)
    positions = np.broadcast_to(offsets, (T, J, 3)).copy()
    positions[:, 0, :] = np.array([0.0, 100.0, 0.0])
    anim = {
        "rotations": rot.astype(np.float32),
        "positions": positions,
        "offsets": offsets,
        "parents": zf.ZEGGS_PARENTS,
        "names": list(zf.ZEGGS_BONE_NAMES),
        "order": "zyx",
        "frametime": 1.0 / FPS_BVH,
    }
    return wav, anim


def write_corpus(src_dir: str, eval_dir: str) -> None:
    from scipy.io import wavfile

    from diffusestylegesture_tpu.motion import bvh

    os.makedirs(src_dir, exist_ok=True)
    os.makedirs(eval_dir, exist_ok=True)
    styles = list(STYLES)
    for i in range(TRAIN_CLIPS):
        style = styles[i % len(styles)]
        name = f"{i:03d}_{style}_0_x_1_0"
        wav, anim = synth_clip(style, seed=i, seconds=CLIP_SECONDS)
        wavfile.write(os.path.join(src_dir, name + ".wav"), SR,
                      (wav * 32767).astype(np.int16))
        bvh.save(os.path.join(src_dir, name + ".bvh"), anim)
    for i in range(EVAL_CLIPS):
        style = styles[i % len(styles)]
        name = f"9{i:02d}_{style}_0_x_1_0"
        wav, anim = synth_clip(style, seed=1000 + i, seconds=EVAL_SECONDS)
        wavfile.write(os.path.join(eval_dir, name + ".wav"), SR,
                      (wav * 32767).astype(np.int16))
        bvh.save(os.path.join(eval_dir, name + ".bvh"), anim)


def _nanf(v) -> float:
    """None-tolerant float for report formatting: cli.eval reports
    beat_alignment=None when every clip's score is NaN (e.g. a degraded
    mode emitting near-constant motion) — exactly the case the harness
    must record, not crash formatting."""
    return float("nan") if v is None else float(v)


def _featurize_worker(bvh_path: str) -> np.ndarray:
    """Module-level (picklable) per-clip featurization for CPU workers."""
    from diffusestylegesture_tpu.motion import zeggs_features as zf

    return zf.featurize_bvh_file(bvh_path, fps=FPS)["features"].astype(np.float32)


# ---------------------------------------------------------------------------
# 2. pseudo-WavLM (deterministic spectral projection; jit-able)
# ---------------------------------------------------------------------------


def make_pseudo_wavlm():
    """Stand-in for the frozen WavLM encoder (no released weights in this
    image): hann-windowed rfft magnitudes at a 320-sample hop →
    fixed-seed random projection to 1024 dims → tanh. Deterministic,
    audio-informative, traceable under jit (used both to cache training
    features and inside the compiled sampler)."""
    import jax
    import jax.numpy as jnp

    from diffusestylegesture_tpu.models.wavlm.adapters import interpolate_linear

    frame, hop, out_dim = 640, 320, 1024
    key = jax.random.PRNGKey(42)
    proj = jax.random.normal(key, (frame // 2 + 1, out_dim)) / np.sqrt(frame // 2 + 1)
    win = jnp.asarray(np.hanning(frame).astype(np.float32))

    def features(params, windows):  # (W, S) → (W, N_POSES, 1024)
        w = jnp.asarray(windows)
        n = (w.shape[1] - frame) // hop + 1
        idx = jnp.arange(frame)[None, :] + hop * jnp.arange(n)[:, None]
        frames = w[:, idx] * win[None, None, :]
        mag = jnp.abs(jnp.fft.rfft(frames, axis=-1))
        feats = jnp.tanh(jnp.log1p(mag) @ proj)
        return interpolate_linear(feats, N_POSES)

    jitted = jax.jit(lambda w: features(None, w))

    def features_np(windows):  # numpy wrapper for the dataset cache
        # jitted: ONE dispatch per batch — eager ops through a remote
        # (axon) backend pay a round trip each
        return np.asarray(jitted(np.asarray(windows, np.float32)))

    return features, features_np


# ---------------------------------------------------------------------------
# 3–6. train → sample per mode → eval → manifest
# ---------------------------------------------------------------------------


def run(workdir: str) -> dict:
    import yaml

    import jax

    from diffusestylegesture_tpu import diffusion as D
    from diffusestylegesture_tpu.cli.eval import main as eval_main
    from diffusestylegesture_tpu.cli.sample import load_orbax_params
    from diffusestylegesture_tpu.cli.train import main as train_main
    from diffusestylegesture_tpu.data import ZeggsWindowDataset, build_zeggs_dataset
    from diffusestylegesture_tpu.models.mdm import MDM, MDMConfig
    from diffusestylegesture_tpu.motion import zeggs_features as zf
    from diffusestylegesture_tpu.sample import ZeggsEngineConfig, ZeggsSampler
    from diffusestylegesture_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    steps = int(os.environ.get("QH_STEPS", "3000"))
    distill_stages = int(os.environ.get("QH_DISTILL_STAGES", "3"))
    src = os.path.join(workdir, "src")
    eval_src = os.path.join(workdir, "eval_src")
    data_dir = os.path.join(workdir, "prepared")
    ckpt_dir = os.path.join(workdir, "ckpt")
    log_dir = os.path.join(workdir, "logs")
    gen_root = os.path.join(workdir, "generated")
    report: dict = {"train_steps": steps, "modes": {},
                    # recorded so --rebuild can re-apply the real gate
                    "small_trunk": SMALL,
                    "ae_steps": int(os.environ.get("QH_AE_STEPS", "400"))}

    # -- corpus + dataset build (cached by the LAST artifact write_corpus
    # produces, so an interrupted first run re-synthesizes instead of
    # permanently skipping the held-out eval clips; synthesis is
    # deterministic by seed, so rerunning over a partial corpus is safe --
    styles = list(STYLES)
    last_eval = os.path.join(
        eval_src,
        f"9{EVAL_CLIPS - 1:02d}_{styles[(EVAL_CLIPS - 1) % len(styles)]}"
        "_0_x_1_0.bvh")
    if not os.path.exists(last_eval):
        print("== synthesizing corpus ==")
        write_corpus(src, eval_src)
    if not os.path.exists(os.path.join(data_dir, "mean.npz")):
        print("== building ZEGGS dataset (real featurizer) ==")
        # workers: CPU-pinned process pool — the serial path's math would
        # otherwise dispatch eagerly through a remote-TPU (axon) backend
        build_zeggs_dataset(src, data_dir, fps=FPS, workers=4)

    wavlm_jax, wavlm_np = make_pseudo_wavlm()
    # cache pseudo-WavLM features into the window cache (precompute→train
    # handoff, the reference's DataPreprocessor pattern)
    ZeggsWindowDataset(os.path.join(data_dir, "train"), wavlm_np,
                       n_poses=N_POSES, stride=10, fps=FPS)

    mean = np.load(os.path.join(data_dir, "mean.npz"))["mean"]
    std = np.load(os.path.join(data_dir, "std.npz"))["std"]

    # -- train through the product CLI --
    mcfg_kw = (dict(latent_dim=128, ff_size=128, num_layers=2) if SMALL
               else dict(latent_dim=256, ff_size=1024, num_layers=8))
    if not (_env_flag("QH_SKIP_TRAIN") and os.path.isdir(ckpt_dir)):
        print(f"== training MDM for {steps} steps (cli.train) ==")
        cfg = dict(
            dataset="ZEGGS", name="DiffuseStyleGesture", data_dir=data_dir,
            n_poses=N_POSES, motion_resampling_framerate=FPS,
            subdivision_stride=10, batch_size=48, n_seed=N_SEED, njoints=1141,
            latent_dim=mcfg_kw["latent_dim"], ff_size=mcfg_kw["ff_size"],
            num_layers=mcfg_kw["num_layers"], cond_mask_prob=0.1,
            cond_mode="cross_local_attention3_style1", audio_feat="wavlm",
            diffusion_steps=DIFFUSION_STEPS, noise_schedule="cosine",
            lr=1e-4, log_interval=50, save_interval=0, num_steps=steps,
            save_dir=ckpt_dir, log_dir=log_dir, log_formats=["stdout", "csv"],
            wavlm_path=os.path.join(workdir, "no-wavlm.pt"),
        )
        cfg_path = os.path.join(workdir, "train_cfg.yml")
        with open(cfg_path, "w") as f:
            yaml.safe_dump(cfg, f)
        t0 = time.time()
        train_main(["--config", cfg_path, "--device_cache"])
        report["train_wall_s"] = round(time.time() - t0, 1)

    params = load_orbax_params(ckpt_dir)
    # the report must label the checkpoint actually served, not QH_STEPS:
    # under QH_SKIP_TRAIN the reused checkpoint can be from a longer run
    # (load_orbax_params restores the LATEST step dir)
    saved_steps = [int(d) for d in os.listdir(ckpt_dir) if d.isdigit()]
    if saved_steps:
        report["train_steps"] = max(saved_steps)

    # -- loss curve summary from the CSV sink --
    curve = []
    csv_path = os.path.join(log_dir, "progress.csv")
    if os.path.exists(csv_path):
        import csv as _csv

        with open(csv_path) as f:
            rows = list(_csv.DictReader(f))
        for r in rows:
            if r.get("step") and r.get("loss"):
                curve.append((int(float(r["step"])), float(r["loss"])))
        # the CSV sink APPENDS across runs in the same workdir: keep only
        # the FINAL monotonic segment, or the demo table would interleave
        # two runs' curves ('loss fell run1-first → run2-last')
        start = 0
        for i in range(1, len(curve)):
            if curve[i][0] <= curve[i - 1][0]:
                start = i
        curve = curve[start:]
    report["loss_curve"] = curve

    # -- build serving modes --
    model = MDM(MDMConfig(n_seed=N_SEED, cond_mask_prob=0.1, **mcfg_kw))

    def model_apply(p, x, t, cond, uncond=None):
        return model.apply(p, x, t, cond, uncond=uncond)

    betas = D.named_beta_schedule("cosine", DIFFUSION_STEPS)
    full = D.Schedule.create(betas)
    n_ddim = max(DIFFUSION_STEPS // 10, 2)   # 100 at the real schedule
    n_dpmpp = max(DIFFUSION_STEPS // 50, 2)  # 20 at the real schedule
    modes = {
        f"ddpm{DIFFUSION_STEPS}": (model_apply, params, full, "ddpm"),
        f"ddim{n_ddim}": (
            model_apply, params,
            D.spaced_schedule(betas, D.space_timesteps(DIFFUSION_STEPS, f"ddim{n_ddim}")),
            "ddim"),
        f"dpmpp{n_dpmpp}": (
            model_apply, params,
            D.spaced_schedule(betas, D.space_timesteps(DIFFUSION_STEPS, f"ddim{n_dpmpp}")),
            "dpmpp"),
    }
    baseline_key = f"ddpm{DIFFUSION_STEPS}"

    # extra teacher-weight modes (QH_EXTRA_MODES="dpmpp10,ddim25"): push
    # the gated frontier below the defaults without assuming the answer —
    # a mode that degrades FGD past tolerance is written ok=false and
    # bench.py/cli.sample will not use it
    for extra in filter(None, os.environ.get("QH_EXTRA_MODES", "").split(",")):
        extra = extra.strip()
        for samp in ("dpmpp", "ddim"):
            if extra.startswith(samp) and extra[len(samp):].isdigit():
                n = int(extra[len(samp):])
                if not 2 <= n < DIFFUSION_STEPS:
                    # fail FAST — a silently dropped mode would surface
                    # only after the hour-long run as "not measured"
                    raise SystemExit(
                        f"QH_EXTRA_MODES: {extra!r} needs 2 <= n < "
                        f"{DIFFUSION_STEPS}")
                modes.setdefault(extra, (
                    model_apply, params,
                    D.spaced_schedule(
                        betas,
                        D.space_timesteps(DIFFUSION_STEPS, f"ddim{n}")),
                    samp))
                break
        else:
            raise SystemExit(f"QH_EXTRA_MODES: unrecognized mode {extra!r}")

    # -- progressive distillation: 1000 → 1000/2^stages DDIM students.
    # Every stage from the 3rd halving down (125-step at the real
    # schedule) is kept as its own serving mode and FGD-gated — deeper
    # students halve the serving cost again each stage, so the gate
    # decides how few steps quality actually tolerates rather than
    # assuming a fixed depth. QH_DISTILL_EVAL=1,3,6 overrides which
    # stage indices are evaluated (default: 3..stages; with the default
    # stages=3 that is exactly the single 125-step student). --
    if distill_stages > 0:
        print(f"== distilling {distill_stages} stages ==")
        depths_env = os.environ.get("QH_DISTILL_EVAL", "")
        if depths_env:
            eval_stages = {
                int(x) for x in depths_env.split(",") if x.strip()}
            bad = sorted(s for s in eval_stages
                         if not 1 <= s <= distill_stages)
            if bad or not eval_stages:
                # fail FAST, same contract as QH_EXTRA_MODES — a silently
                # dropped stage would surface only after the hour-long
                # run as "not measured"
                raise SystemExit(
                    f"QH_DISTILL_EVAL: stages {bad or '(none)'} outside "
                    f"1..{distill_stages} (QH_DISTILL_STAGES)")
        else:
            eval_stages = set(range(min(3, distill_stages),
                                    distill_stages + 1))
        modes.update(distill_student(
            model_apply, params, full, data_dir, distill_stages, report,
            eval_stages))

    # -- ground-truth eval features + audio (CPU-pinned workers: the
    # serial path would dispatch the quat/FK math eagerly through the
    # remote-TPU backend, same issue `build_zeggs_dataset(workers=)`
    # solves) --
    ref_dir = os.path.join(workdir, "ref_feats")
    os.makedirs(ref_dir, exist_ok=True)
    eval_wavs = sorted(f for f in os.listdir(eval_src) if f.endswith(".wav"))
    todo = [f[:-4] for f in eval_wavs
            if not os.path.exists(os.path.join(ref_dir, f[:-4] + ".npy"))]
    if todo:
        import multiprocessing as mp
        from concurrent.futures import ProcessPoolExecutor

        from diffusestylegesture_tpu.data.zeggs import _worker_init

        with ProcessPoolExecutor(
            max_workers=min(4, len(todo)), mp_context=mp.get_context("spawn"),
            initializer=_worker_init,
        ) as ex:
            paths = [os.path.join(eval_src, s + ".bvh") for s in todo]
            for stem, feats in zip(todo, ex.map(_featurize_worker, paths)):
                np.save(os.path.join(ref_dir, stem + ".npy"), feats)

    # -- generate + evaluate each mode --
    from diffusestylegesture_tpu.data import load_wav_16k

    for mode_name, (apply_fn, mparams, sched, sampler_name) in modes.items():
        gen_dir = os.path.join(gen_root, mode_name)
        os.makedirs(gen_dir, exist_ok=True)
        sampler = ZeggsSampler(
            apply_fn, wavlm_jax, sched,
            ZeggsEngineConfig(sampler=sampler_name),
        )
        frames = 0
        total_wall = 0.0
        demo_written = False
        warm_frames, warm_wall = 0, 0.0  # excluding the first (compiling) clip
        for ci, f in enumerate(eval_wavs):
            stem = f[:-4]
            audio = load_wav_16k(os.path.join(eval_src, f))
            style = zf.style_onehot(stem.split("_")[1])[None]
            tc = time.time()
            out = sampler.generate(
                mparams, None, audio, style, jax.random.PRNGKey(123456),
                mean=mean, std=std)
            clip_wall = time.time() - tc
            np.save(os.path.join(gen_dir, stem + ".npy"), out[0])
            print(f"   clip {stem}: {out.shape[1]} frames {clip_wall:.1f}s",
                  flush=True)
            frames += out.shape[1]
            total_wall += clip_wall
            if ci > 0:  # clip 0 pays the engine compile
                warm_frames += out.shape[1]
                warm_wall += clip_wall
            if (mode_name == baseline_key and "Happy" in stem
                    and not demo_written):
                # once: a second Happy clip would re-run the FK+smoothing
                # export only to clobber the first at the same path
                demo_written = True
                tb = time.time()
                zf.pose_features_to_bvh(
                    out[0], os.path.join(workdir, f"demo_{mode_name}.bvh"),
                    smoothing=True)
                print(f"   demo BVH {time.time() - tb:.1f}s", flush=True)
        # with a single eval clip there is no warm measurement — report
        # the compile-inclusive throughput rather than frames/1.0
        wall = warm_wall if warm_frames else max(total_wall, 1e-9)
        print(f"== mode {mode_name}: {frames} frames, warm "
              f"{(warm_frames or frames) / wall:.0f} fps ==")

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            eval_main([
                "--generated", gen_dir, "--reference", ref_dir,
                "--wav", eval_src, "--fps", str(FPS),
                "--embedding", "autoencoder",
                "--ae_steps", os.environ.get("QH_AE_STEPS", "400"),
                # one AE per harness run: every mode embeds in the SAME
                # latent space (trained on the reference set only), and
                # re-training per mode wasted minutes through the tunnel
                "--ae_cache", os.path.join(workdir, "ae_cache"),
            ])
        metrics = json.loads(buf.getvalue().strip().splitlines()[-1])
        metrics["gen_frames_per_sec"] = round((warm_frames or frames) / wall, 1)
        report["modes"][mode_name] = metrics
        print(f"   {mode_name}: fgd={metrics['fgd']:.3f} "
              f"beat={_nanf(metrics.get('beat_alignment')):.3f} "
              f"fps={metrics['gen_frames_per_sec']}")

    report["manifest"] = build_manifest(report)
    return report


def build_manifest(report: dict) -> dict:
    """Verdicts from a harness report: FGD ratio AND diversity retention
    vs the DDPM baseline (both axes must hold — see DIVERSITY_RATIO_MIN).

    Factored out so `--rebuild` can recompute verdicts from a committed
    QUALITY_*.json when the gate criteria change, without re-running the
    train/generate/eval pipeline."""
    baseline_key = next(k for k in report["modes"] if k.startswith("ddpm"))
    base = report["modes"][baseline_key]
    base_fgd = max(base["fgd"], 1e-9)
    base_div = max(base["diversity_generated"], 1e-9)
    manifest = {
        "generated_by": "scripts/quality_harness.py",
        "baseline": baseline_key,
        "baseline_fgd": base_fgd,
        "train_steps": report["train_steps"],
        "fgd_ratio_tolerance": FGD_RATIO_TOL,
        "diversity_ratio_min": DIVERSITY_RATIO_MIN,
        "modes": {},
    }
    for mode_name, m in report["modes"].items():
        if mode_name == baseline_key:
            continue
        ratio = m["fgd"] / base_fgd
        div_ratio = m["diversity_generated"] / base_div
        manifest["modes"][mode_name] = {
            "fgd": m["fgd"], "fgd_ratio": round(ratio, 3),
            "beat_alignment": m.get("beat_alignment"),
            "diversity_ratio_vs_baseline": round(div_ratio, 3),
            "ok": bool(ratio <= FGD_RATIO_TOL
                       and div_ratio >= DIVERSITY_RATIO_MIN),
        }
    return manifest


def distill_student(model_apply, params, full_sched, data_dir, stages, report,
                    eval_stages=()):
    """Progressive distillation on the trained teacher.

    Returns {mode_name: (apply, params, schedule, sampler_name)} with one
    entry per stage index in ``eval_stages`` (1-based; the final stage is
    always included), named ``distill<num_timesteps>`` from the student's
    actual halved grid."""
    import jax
    import jax.numpy as jnp
    import optax  # noqa: F401  (distill uses it internally)

    from diffusestylegesture_tpu import diffusion as D
    from diffusestylegesture_tpu.data import ZeggsWindowDataset
    from diffusestylegesture_tpu.train.distill import make_distill_step, student_schedule
    from diffusestylegesture_tpu.train.state import make_zeggs_cond_builder

    from diffusestylegesture_tpu.data.device_cache import DeviceWindowCache

    ds = ZeggsWindowDataset(os.path.join(data_dir, "train"), None)
    builder = make_zeggs_cond_builder(N_SEED)
    # device-resident windows: per-step host batches (~24 MB each) through
    # a tunneled backend dominated stage wall time (measured 18.6 min per
    # 400-step stage); the in-jit gather removes the transfer entirely
    cache = DeviceWindowCache.from_zeggs(ds)
    batch_size = 32
    steps_per_stage = int(os.environ.get("QH_DISTILL_STEPS", "400"))

    sched_t = full_sched
    teacher_params = params
    student_params = params
    out_modes = {}
    for stage in range(stages):
        def student_apply(p, x, t, cond):
            return model_apply(p, x, t, cond)

        def _make(tp, _sched=sched_t):
            return make_distill_step(
                lambda x, t, cond: model_apply(tp, x, t, cond),
                student_apply, _sched, lr=1e-4, conditioned=True)

        init_fn, _ = _make(teacher_params)

        # teacher params and the dataset arrays enter as jit ARGS, not
        # closure constants (same pattern as cli/distill.py and
        # data/device_cache.py — closure arrays become HLO literals:
        # compile bloat, and remote-compile transports reject them)
        @jax.jit
        def jstep(tp, p, opt_state, key, arrays):
            k_data, k_step = jax.random.split(key)
            batch = DeviceWindowCache.sample_batch(arrays, k_data, batch_size)
            x0, cond, _ = builder(batch)
            return _make(tp)[1](p, opt_state, x0, k_step, cond)

        student_params = jax.tree.map(jnp.copy, teacher_params)
        opt = init_fn(student_params)
        key = jax.random.PRNGKey(stage)
        t0 = time.time()
        m = {"loss": float("nan")}  # QH_DISTILL_STEPS=0 smoke runs
        for i in range(steps_per_stage):
            key, sub = jax.random.split(key)
            student_params, opt, m = jstep(
                teacher_params, student_params, opt, sub, cache.arrays)
        loss = float(m["loss"])
        nt = sched_t.num_timesteps
        print(f"   distill stage {stage + 1}/{stages}: {nt}→{nt // 2} steps, "
              f"loss {loss:.4f} ({time.time() - t0:.0f}s)")
        report.setdefault("distill", []).append(
            {"stage": stage + 1, "teacher_steps": nt, "loss": loss})
        sched_t = student_schedule(sched_t, D.named_beta_schedule("cosine", DIFFUSION_STEPS))
        teacher_params = student_params
        if (stage + 1) in eval_stages or stage == stages - 1:
            out_modes[f"distill{sched_t.num_timesteps}"] = (
                model_apply, student_params, sched_t, "ddim")

    return out_modes


def main():
    import faulthandler

    # periodic all-thread stack dumps: long axon compiles/transfers look
    # like hangs from outside; this shows exactly where the time goes
    faulthandler.dump_traceback_later(600, repeat=True, file=sys.stderr)
    workdir = os.environ.get("QH_WORKDIR", os.path.join(REPO, ".quality_harness"))
    os.makedirs(workdir, exist_ok=True)
    if "--rebuild" in sys.argv:
        # recompute verdicts from a committed report (gate-criteria
        # changes don't need the hour-long train/generate/eval rerun)
        src = sys.argv[sys.argv.index("--rebuild") + 1]
        with open(src) as f:
            report = json.load(f)
        report["manifest"] = build_manifest(report)
        # same real-configuration gate as the run path, from the report's
        # own recorded fields — rebuilding a smoke report must not rewrite
        # the shipped serving gate (baseline name alone is not enough: a
        # default QH_STEPS=3000 run is full-schedule but undertrained)
        real = (report["manifest"]["baseline"] == "ddpm1000"
                and report.get("train_steps", 0) >= 10_000
                and not report.get("small_trunk", False))
    else:
        report = run(workdir)
        # the shipped gate only comes from the real configuration: full
        # 1000-step schedule, full-size trunk, a substantively trained
        # checkpoint (report['train_steps'] reflects the ACTUAL restored
        # step — QH_STEPS smoke values and stale ckpt dirs both show up
        # here), and a real embedding-training budget. A quick
        # QH_STEPS=200 trial must not rewrite what cli.sample refuses.
        real = (DIFFUSION_STEPS == 1000 and not SMALL
                and report.get("train_steps", 0) >= 10_000
                and int(os.environ.get("QH_AE_STEPS", "400")) >= 400
                and int(os.environ.get("QH_DISTILL_STEPS", "400")) >= 400)
    # smoke configurations must not clobber the committed round
    # artifacts (QUALITY_r03.json / DEMO_r03.md) either
    out_path = os.path.join(
        REPO, "QUALITY_r03.json" if real else "QUALITY_smoke.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", out_path)

    if real:
        res_dir = os.path.join(REPO, "diffusestylegesture_tpu", "resources")
        os.makedirs(res_dir, exist_ok=True)
        gate_path = os.path.join(res_dir, "quality_gate.json")
        with open(gate_path, "w") as f:
            json.dump(report["manifest"], f, indent=1)
        print("wrote", gate_path)
        write_demo_md(report, workdir)
    else:
        print("smoke configuration — NOT writing the shipped quality gate "
              "manifest or DEMO_r03.md (toy models must not gate real "
              "serving)")


def write_demo_md(report: dict, workdir: str) -> None:
    """Render the convergence + quality artifact (VERDICT r2 item 6)."""
    import platform

    lines = [
        "# DEMO — full product loop, round 3",
        "",
        "Produced by `scripts/quality_harness.py` in one command: synthetic",
        "audio-synchronized ZEGGS corpus → real featurizer → `cli.train`",
        f"({report['train_steps']} on-chip steps, loss curve below) → orbax",
        "checkpoint → compiled windowed sampler in every serving mode →",
        "`cli.eval` (FGD on a trained autoencoder embedding, diversity,",
        "beat alignment vs wav onsets) → serving quality gate",
        "(`resources/quality_gate.json`, consumed by `cli.sample`).",
        "",
    ]
    if report.get("train_wall_s"):
        lines.append(f"Training wall time: {report['train_wall_s']} s "
                     f"on {platform.node() or 'this host'} "
                     f"(JAX backend: {_backend_name()}).")
        lines.append("")
    curve = report.get("loss_curve") or []
    if curve:
        lines += ["## Loss curve (from the CSV sink)", "", "| step | loss |", "|---|---|"]
        keep = curve if len(curve) <= 16 else (
            curve[:: max(1, len(curve) // 14)] + [curve[-1]])
        for s, l in keep:
            lines.append(f"| {s} | {l:.4f} |")
        first, last = curve[0][1], curve[-1][1]
        lines += ["", f"Loss fell {first:.4f} → {last:.4f} "
                  f"({(1 - last / first) * 100:.1f}% reduction).", ""]
    lines += ["## Serving modes vs ground truth", "",
              "| mode | FGD (AE embedding) | diversity (gen/ref) | "
              "beat align | gen fps |", "|---|---|---|---|---|"]
    for name, m in report.get("modes", {}).items():
        lines.append(
            f"| {name} | {m['fgd']:.3f} | "
            f"{m['diversity_generated']:.2f}/{m['diversity_reference']:.2f} | "
            f"{_nanf(m.get('beat_alignment')):.3f} | "
            f"{m.get('gen_frames_per_sec', 0)} |")
    man = report.get("manifest", {})
    lines += ["", f"Gate: baseline `{man.get('baseline')}`, FGD-ratio "
              f"tolerance {man.get('fgd_ratio_tolerance')}."]
    for name, v in man.get("modes", {}).items():
        lines.append(f"- `{name}`: ratio {v['fgd_ratio']} → "
                     f"{'OK' if v['ok'] else 'DEGRADED (refused by cli.sample)'}")
    if report.get("distill"):
        lines += ["", "Distillation stages: " + ", ".join(
            f"{d['teacher_steps']}→{d['teacher_steps'] // 2} (loss {d['loss']:.4f})"
            for d in report["distill"])]
    lines += ["", f"A generated BVH from the baseline mode is kept at "
              f"`{os.path.join(workdir, 'demo_' + str(man.get('baseline')) + '.bvh')}` "
              "(regenerate with the harness).", ""]
    path = os.path.join(REPO, "DEMO_r03.md")
    with open(path, "w") as f:
        f.write("\n".join(lines))
    print("wrote", path)


def _backend_name() -> str:
    try:
        import jax

        d = jax.devices()[0]
        return getattr(d, "device_kind", d.platform)
    except Exception:  # pragma: no cover
        return "unknown"


if __name__ == "__main__":
    main()
