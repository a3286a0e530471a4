"""In-env motion-quality harness for the fast serving modes.

One command drives the ENTIRE product loop end to end for BOTH model
families and closes the quality gap on fast serving:

  ZEGGS family (MDM, `cli.sample`):
  1. synthesize a structured, audio-synchronized ZEGGS-format corpus
     (wav + BVH pairs; gesture strokes locked to audio beats, two
     styles with distinct motion character);
  2. build the dataset with the real `data.build_zeggs_dataset`
     featurizer (wav→MFCC, BVH→1141-d) and cache pseudo-WavLM audio
     features (a fixed random spectral projection standing in for the
     frozen encoder, which has no released weights in this image);
  3. train a REAL full-architecture ZEGGS MDM on-chip through
     `cli.train` (loss curve → CSV, orbax checkpoint);
  4. generate held-out clips with every serving mode — DDPM-1000
     (reference configuration), ddim100, DPM-Solver++(2M), and
     progressively distilled students — through the compiled windowed
     sampler, with QH_SEED_REPS independent noise replicates per mode
     (batched: replicate r = batch row r of one compiled call);
  5. score each replicate against ground truth with the product eval
     stack (`cli.eval`: FGD over a trained autoencoder embedding,
     diversity, beat alignment vs wav onsets) and aggregate
     mean ± std ± CI per mode.

  BEAT/TWH family (MDM+, `cli.sample_beat`): the same loop at the TWH
  configuration — synthetic 62-bone TWH BVH corpus + tsv word
  alignments + 1133-d audio features (`data.beat_twh.load_audio_features`
  with pseudo-WavLM) → h5 via `data.build_h5_dataset` → `cli.train
  --dataset TWH --name DiffuseStyleGesture+` (latent 512, njoints 2232,
  attention4) → `BeatTwhSampler` per serving mode → `cli.eval` on the
  744-d position block at 30 fps.

  6. write `QUALITY_<round>.json` (full results incl. per-replicate
     metrics) and the FAMILY-KEYED serving gate manifest
     `diffusestylegesture_tpu/resources/quality_gate.json` (consumed by
     `cli.sample` and `cli.sample_beat` — a mode whose FGD degrades
     beyond the seed-noise-derived tolerance, or whose diversity
     collapses, is refused), and the demo artifact `DEMO_<round>.md`.

The gate's tolerance is DERIVED from measured seed noise (VERDICT r3
item 2): with R replicates of the DDPM baseline, the FGD ratio of a
mode with identical true quality has standard deviation
sigma_null ≈ sqrt(2)·(σ_base/μ_base)/sqrt(R); a mode is degraded when
its mean ratio exceeds 1 + max(3·sigma_null, 0.10) — the 0.10 floor is
the minimum practically-meaningful FGD degradation, guarding against a
hyper-stable metric refusing sub-percent differences (and is 15× tighter
than the round-2/3 fixed 1.5). Each mode also reports a 95% CI on its
ratio from per-replicate spread.

Frozen-draw census (r5 seed-stability fix): every (replicate × clip)
draw is additionally checked for velocity retention against its
stem-matched reference clip (cli.eval). Mid-ladder distilled students
emit a near-static pose (retention ~0.10) on ~10% of noise draws; the
235..1124 FGD those reps score averages INSIDE tolerance under one seed
and outside under another, flipping verdicts — while the census is
stable under both. A mode with ANY frozen draw is refused; a baseline
with one marks the family collapsed.

Env knobs: QH_FAMILIES (default "zeggs,twh"), QH_STEPS (ZEGGS train
steps, default 3000), QH_TWH_STEPS (default = QH_STEPS), QH_SEED_REPS
(default 8), QH_NOISE_SEED (master generation-noise seed, default
123456 — run twice with different values to demonstrate verdict
stability under independent noise; pair the replay with
QH_NO_GATE_WRITE=1 so it scores without replacing the shipped
quality_gate.json/DEMO), QH_WORKDIR, QH_DISTILL_STAGES
(default 3; with more stages every student from the 3rd halving down
becomes its own FGD-gated mode — QH_DISTILL_EVAL=3,6 narrows which
stage indices are evaluated), QH_DISTILL_STEPS (BASE distill steps per
stage, default 400; each stage trains `_stage_budget(nt, base)` steps),
QH_SKIP_TRAIN=1 to reuse existing checkpoints, QH_EXTRA_MODES
(comma-separated additional teacher-weight modes like "dpmpp10,ddim25"),
QH_TRAIN_CLIPS / QH_EVAL_CLIPS (corpus size, defaults 12 / 5).

Run: `timeout 14400 python scripts/quality_harness.py`
"""
from __future__ import annotations

import contextlib
import io
import json
import math
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

ROUND = os.environ.get("QH_ROUND", "r04")
SR = 16000
FPS_BVH = 60  # ZEGGS source BVHs are 60 fps (featurizer decimates to 20)
FPS = 20
N_POSES, N_SEED = 88, 8
TWH_FPS = 30
TWH_N_POSES, TWH_N_SEED = 150, 30
# QH_DIFFUSION_STEPS < 1000 is a smoke configuration (CI/dev); the real
# harness runs the reference's 1000-step schedule
DIFFUSION_STEPS = int(os.environ.get("QH_DIFFUSION_STEPS", "1000"))


def _env_flag(name: str) -> bool:
    """Boolean env knob: '', '0', 'false', 'no' are OFF (plain string
    truthiness would turn QH_SMALL=0 into the tiny trunk)."""
    return os.environ.get(name, "").strip().lower() not in (
        "", "0", "false", "no")


SMALL = _env_flag("QH_SMALL")  # tiny trunk for smoke runs
# 8 replicates (r4 used 5): generation is batched (replicate r = batch
# row r of ONE compiled call) so extra reps cost only per-rep eval, and
# the outlier-rejected gate statistics need headroom to drop a straggler
SEED_REPS = max(1, int(os.environ.get("QH_SEED_REPS", "8")))
# master noise seed for generation keys: running the harness twice with
# DIFFERENT values demonstrates verdict stability under independent
# noise (VERDICT r4 item 4's "done" bar) — with a fixed value the run is
# deterministic and a re-run is trivially identical
NOISE_SEED = int(os.environ.get("QH_NOISE_SEED", "123456"))
# minimum practically-meaningful FGD degradation — the tolerance floor
# when seed noise is tighter than this (see module docstring)
FGD_TOL_FLOOR = 0.10
# legacy fixed tolerance, used only when a report has <2 replicates
# (e.g. --rebuild over a round-3 single-seed report)
FGD_RATIO_TOL_LEGACY = 1.5
# a fast mode must also keep a real fraction of the baseline's sample
# diversity: FGD compares distribution means/covariances against ground
# truth, so a mode-collapsed sampler (every clip the same plausible
# motion) can stay inside the FGD tolerance — measured: the 7-step
# distilled student hit FGD ratio 1.09 with diversity 0.008× the
# teacher's. Both axes gate.
DIVERSITY_RATIO_MIN = 0.25
# ABSOLUTE baseline-health floors (VERDICT r4 item 1): a collapsed
# baseline makes every relative verdict vacuous — r4's TWH model
# generated diversity 0.90 vs reference 96.35 (0.9%) with FGD sd 0.7
# across independent-noise replicates, so ddim100/dpmpp20 "passed" at
# ratio 1.000 against a model that wasn't generating gestures. A family
# whose DDPM baseline fails either floor is marked collapsed and its
# manifest is REFUSED from the shipped gate.
BASELINE_DIV_VS_REF_MIN = 0.05   # baseline diversity / reference diversity
BASELINE_FGD_SPREAD_MIN = 5e-4   # sd/mean of baseline FGD over noise reps
# replicate-outlier rejection (VERDICT r4 item 4): 5-rep mean±sd gates
# were visibly fragile (diversity reps {13.6, 4.9, 13.6, 13.6, 12.3};
# FGD reps {1894, 2211, 2210, 2210, 2182}) — a single 3× straggler moves
# the mean AND the derived tolerance. Reps outside the Tukey "far out"
# fences [Q1 − k·IQR, Q3 + k·IQR] are dropped (count logged per mode)
# before the mean/sd gate statistics are computed. Tukey rather than
# median/MAD: with ≥half the reps tied (common for rounded metrics) MAD
# is 0 and either rejects nothing or everything.
OUTLIER_IQR_K = 3.0


def reject_outliers(reps):
    """(kept_reps, n_dropped) by the Tukey far-out rule above.

    Degenerate guards: <3 reps are never filtered (the gate needs a
    noise estimate), IQR=0 (mostly-tied reps) keeps everything, and the
    result never shrinks below 2 reps."""
    reps = [float(x) for x in reps]
    if len(reps) < 3:
        return reps, 0
    q1, q3 = np.percentile(reps, [25.0, 75.0])
    iqr = float(q3 - q1)
    if iqr <= 0:
        return reps, 0
    lo, hi = q1 - OUTLIER_IQR_K * iqr, q3 + OUTLIER_IQR_K * iqr
    kept = [x for x in reps if lo <= x <= hi]
    if len(kept) < 2:  # pathological spread: keep everything, gate wide
        return reps, 0
    return kept, len(reps) - len(kept)

STYLES = {  # style token → (tempo_hz, motion_freq_hz, amplitude_deg)
    "Happy": (2.0, 1.0, 18.0),
    "Sad": (1.25, 0.5, 8.0),
}
TRAIN_CLIPS = int(os.environ.get("QH_TRAIN_CLIPS", "12"))
EVAL_CLIPS = int(os.environ.get("QH_EVAL_CLIPS", "5"))
CLIP_SECONDS = 30.0
EVAL_SECONDS = 24.0


# ---------------------------------------------------------------------------
# 1. structured audio-synchronized corpora
# ---------------------------------------------------------------------------


def synth_audio(style: str, seed: int, seconds: float):
    """Audio with click-train beats; returns (wav, beat_times, env, t)."""
    tempo, _, _ = STYLES[style]
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * SR)) / SR
    env = 0.55 + 0.45 * np.sin(2 * np.pi * 0.11 * t + rng.uniform(0, 6.28))
    carrier = 0.25 * np.sin(
        2 * np.pi * (170 + 40 * np.sin(2 * np.pi * 0.07 * t)) * t)
    wav = carrier * env
    beat_times = np.arange(0.5, seconds - 0.3, 1.0 / tempo)
    beat_times = beat_times + rng.uniform(-0.02, 0.02, beat_times.shape)
    click = np.sin(2 * np.pi * 3000 * np.arange(240) / SR) * np.hanning(240)
    for bt in beat_times:
        i = int(bt * SR)
        wav[i: i + 240] += 0.8 * click[: len(wav) - i]
    wav = (wav / np.abs(wav).max() * 0.9).astype(np.float32)
    return wav, beat_times, env, t


def synth_rotations(style, seed, seconds, beat_times, env, t, fps, n_joints,
                    character_seed=None):
    """(T, J, 3) euler rotations: smooth oscillation + beat-locked strokes.

    The point is learnability and metric sensitivity: gesture "strokes"
    (angular-velocity bumps) occur exactly on audio beats, amplitudes
    track the audio envelope, and each style has its own tempo/frequency/
    amplitude character — so a well-sampled model scores high beat
    alignment and style-consistent FGD, and a degraded sampler shows up.

    The per-joint character (rest pose, frequencies, phases, amplitudes)
    is drawn from `character_seed` — STYLE/SPEAKER-deterministic, so it is
    predictable from the conditioning the model actually sees. Round 3's
    corpus drew it per clip, which put most cross-clip variance OUTSIDE
    p(motion | audio, style): a correctly trained conditional model then
    regresses toward the conditional mean on held-out audio and its
    sample diversity is structurally capped far below the ground truth's
    (measured 0.1–0.2×). Per-clip phase/amplitude/rest-pose jitter (from
    the CLIP seed) is the irreducible conditional entropy — round 5
    widens it (phase sd 0.25→0.8 rad, ±25% amplitude, ±2.5° rest pose)
    so a faithful sampler's achievable diversity_generated sits at a
    healthy fraction of the reference's instead of r4's 0.2× ceiling
    (VERDICT r4 item 7)."""
    tempo, mfreq, amp = STYLES[style]
    crng = np.random.default_rng(
        seed if character_seed is None else character_seed)
    rng = np.random.default_rng(seed)
    T = int(seconds * fps)
    tf = np.arange(T) / fps
    env_f = np.interp(tf, t, env)
    stroke = np.zeros(T)
    for bt in beat_times:
        stroke += np.exp(-0.5 * ((tf - bt) / 0.09) ** 2)
    stroke_phase = np.cumsum(stroke) / fps * 2.0 * np.pi * tempo

    base = crng.uniform(-12, 12, (n_joints, 3)).astype(np.float32)
    freqs = mfreq * crng.uniform(0.6, 1.4, (n_joints, 3))
    phases = crng.uniform(0, 2 * np.pi, (n_joints, 3))
    ampj = amp * crng.uniform(0.4, 1.0, (n_joints, 3))
    if character_seed is not None:
        # irreducible per-clip entropy (clip-seed `rng`, NOT the
        # character seed): within p(motion | audio, style), so a
        # correctly trained diffusion model samples it back
        phases = phases + rng.normal(0.0, 0.8, phases.shape)
        ampj = ampj * rng.uniform(0.75, 1.25, ampj.shape)
        base = base + rng.normal(0.0, 2.5, base.shape)
    osc = np.sin(
        2 * np.pi * freqs[None] * tf[:, None, None]
        + phases[None]
        + 0.6 * stroke_phase[:, None, None]
    )
    rot = base[None] + (ampj[None] * env_f[:, None, None]) * osc
    rot[:, 0, :] *= 0.15  # keep the root stable
    return rot.astype(np.float32)


def synth_clip(style: str, seed: int, seconds: float):
    """ZEGGS-format clip: wav + 75-joint anim dict."""
    from diffusestylegesture_tpu.motion import zeggs_features as zf

    wav, beat_times, env, t = synth_audio(style, seed, seconds)
    J = zf.ZEGGS_NJOINTS
    rot = synth_rotations(
        style, seed, seconds, beat_times, env, t, FPS_BVH, J,
        character_seed=500 + list(STYLES).index(style))
    T = rot.shape[0]
    # skeleton offsets style-deterministic (same reasoning as the motion
    # character: per-clip random bone lengths would put FK-position
    # variance outside p(motion | audio, style))
    offsets = np.random.default_rng(
        600 + list(STYLES).index(style)).uniform(
            -5, 5, (J, 3)).astype(np.float32)
    positions = np.broadcast_to(offsets, (T, J, 3)).copy()
    positions[:, 0, :] = np.array([0.0, 100.0, 0.0])
    anim = {
        "rotations": rot,
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
    features and inside the compiled sampler).

    Returns (zeggs_fn, zeggs_np, clip_np): the first two interpolate to
    N_POSES per audio window (ZEGGS adapter convention); `clip_np` maps a
    whole wav to raw ~50 Hz frames (the TWH `wav2wavlm` convention, which
    `data.beat_twh.load_audio_features` then interpolates itself)."""
    import jax
    import jax.numpy as jnp

    from diffusestylegesture_tpu.models.wavlm.adapters import interpolate_linear

    frame, hop, out_dim = 640, 320, 1024
    key = jax.random.PRNGKey(42)
    proj = jax.random.normal(key, (frame // 2 + 1, out_dim)) / np.sqrt(frame // 2 + 1)
    win = jnp.asarray(np.hanning(frame).astype(np.float32))

    def raw(windows):  # (W, S) → (W, n_frames, 1024)
        w = jnp.asarray(windows)
        n = (w.shape[1] - frame) // hop + 1
        idx = jnp.arange(frame)[None, :] + hop * jnp.arange(n)[:, None]
        frames = w[:, idx] * win[None, None, :]
        mag = jnp.abs(jnp.fft.rfft(frames, axis=-1))
        return jnp.tanh(jnp.log1p(mag) @ proj)

    def features(params, windows):  # (W, S) → (W, N_POSES, 1024)
        return interpolate_linear(raw(windows), N_POSES)

    jitted = jax.jit(lambda w: features(None, w))
    jraw = jax.jit(raw)

    def features_np(windows):  # numpy wrapper for the dataset cache
        # jitted: ONE dispatch per batch — eager ops through a remote
        # (axon) backend pay a round trip each
        return np.asarray(jitted(np.asarray(windows, np.float32)))

    def clip_np(wav):  # (S,) → (T', 1024) whole-clip features
        return np.asarray(jraw(np.asarray(wav, np.float32)[None]))[0]

    return features, features_np, clip_np


# ---------------------------------------------------------------------------
# shared eval helpers
# ---------------------------------------------------------------------------


def _ckpt_done(ckpt_dir: str, steps: int) -> bool:
    """True only when ckpt_dir holds a checkpoint at >= the requested
    step count. QH_SKIP_TRAIN previously keyed on the DIRECTORY existing,
    but orbax creates it at manager init — a run killed before the first
    save leaves an empty dir that silently skipped training on the next
    launch; a mid-train checkpoint (save_interval>0) must RESUME, not
    serve the undertrained weights."""
    if not os.path.isdir(ckpt_dir):
        return False
    saved = [int(d) for d in os.listdir(ckpt_dir) if d.isdigit()]
    return bool(saved) and max(saved) >= steps


def _gen_sidecar_path(gen_root: str, mode_name: str) -> str:
    return os.path.join(gen_root, mode_name, "done.json")


def _write_gen_sidecar(gen_root, mode_name, fps_val, frames, train_steps,
                       clips) -> None:
    """Record a completed mode generation so a crashed/hung harness run
    (r5: a 20-min tunnel stall inside one device_get killed an otherwise
    finished ZEGGS family) can resume without regenerating: the .npy
    replicates are already on disk; the only non-derivable facts are the
    measured warm fps and the checkpoint the arrays came from."""
    side = {"fps": fps_val, "frames": frames,
            "train_steps": train_steps, "seed_reps": SEED_REPS,
            "noise_seed": NOISE_SEED, "clips": sorted(clips)}
    if mode_name.startswith("distill"):
        # a distilled student's weights depend on the distillation budget
        # and LR — without these keys a re-run with different QH_DISTILL_*
        # would silently reuse the old students' generations
        side["distill_steps"] = int(os.environ.get("QH_DISTILL_STEPS", "400"))
        side["distill_lr"] = float(os.environ.get("QH_DISTILL_LR", "2e-4"))
    with open(_gen_sidecar_path(gen_root, mode_name), "w") as f:
        json.dump(side, f)


def _reusable_gen(gen_root, mode_name, train_steps, clips):
    """Return the sidecar dict when QH_REUSE_GEN=1 and the mode's
    generated replicates are complete AND come from the same checkpoint
    step / replicate count / clip set — else None (regenerate)."""
    if not _env_flag("QH_REUSE_GEN"):
        return None
    path = _gen_sidecar_path(gen_root, mode_name)
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            side = json.load(f)
    except (json.JSONDecodeError, OSError):
        return None
    if (side.get("train_steps") != train_steps
            or side.get("seed_reps") != SEED_REPS
            or side.get("noise_seed") != NOISE_SEED
            or side.get("clips") != sorted(clips)):
        return None
    if mode_name.startswith("distill") and (
            side.get("distill_steps") != int(
                os.environ.get("QH_DISTILL_STEPS", "400"))
            or side.get("distill_lr") != float(
                os.environ.get("QH_DISTILL_LR", "2e-4"))):
        return None
    for r in range(SEED_REPS):
        rd = os.path.join(gen_root, mode_name, f"rep{r}")
        if not all(os.path.exists(os.path.join(rd, s + ".npy"))
                   for s in clips):
            return None
    return side


def _eval_dir(gen_dir, ref_dir, wav_dir, fps, ae_cache) -> dict:
    from diffusestylegesture_tpu.cli.eval import main as eval_main

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        eval_main([
            "--generated", gen_dir, "--reference", ref_dir,
            "--wav", wav_dir, "--fps", str(fps),
            "--embedding", "autoencoder",
            "--ae_steps", os.environ.get("QH_AE_STEPS", "400"),
            # one AE per family per harness run: every mode and replicate
            # embeds in the SAME latent space (trained on the reference
            # set only), and re-training per mode wasted minutes
            "--ae_cache", ae_cache,
        ])
    return json.loads(buf.getvalue().strip().splitlines()[-1])


def _loss_curve(log_dir: str) -> list:
    """(step, loss) points from the CSV sink's FINAL monotonic segment —
    the sink APPENDS across runs in the same workdir, and an interleaved
    two-run curve would read 'loss fell run1-first → run2-last'."""
    curve = []
    csv_path = os.path.join(log_dir, "progress.csv")
    if os.path.exists(csv_path):
        import csv as _csv

        with open(csv_path) as f:
            rows = list(_csv.DictReader(f))
        for r in rows:
            if r.get("step") and r.get("loss"):
                curve.append((int(float(r["step"])), float(r["loss"])))
        start = 0
        for i in range(1, len(curve)):
            if curve[i][0] <= curve[i - 1][0]:
                start = i
        curve = curve[start:]
    return curve


def _parse_extra_modes(env_name: str, betas, diffusion_steps: int) -> dict:
    """QH_*_EXTRA_MODES="dpmpp10,ddim25" → {name: (schedule, sampler)}.

    Fails FAST on malformed entries — a silently dropped mode would
    surface only after the hour-long run as "not measured"."""
    from diffusestylegesture_tpu import diffusion as D

    out = {}
    for extra in filter(None, os.environ.get(env_name, "").split(",")):
        extra = extra.strip()
        for samp in ("dpmpp", "ddim"):
            if extra.startswith(samp) and extra[len(samp):].isdigit():
                n = int(extra[len(samp):])
                if not 2 <= n < diffusion_steps:
                    raise SystemExit(
                        f"{env_name}: {extra!r} needs 2 <= n < "
                        f"{diffusion_steps}")
                out[extra] = (
                    D.spaced_schedule(
                        betas,
                        D.space_timesteps(diffusion_steps, f"ddim{n}")),
                    samp)
                break
        else:
            raise SystemExit(f"{env_name}: unrecognized mode {extra!r}")
    return out


def _aggregate_reps(rep_metrics: list, fps_val: float, streams: int) -> dict:
    """Per-replicate cli.eval outputs → mode entry with mean/std/reps."""
    fgd = [m["fgd"] for m in rep_metrics]
    div = [m["diversity_generated"] for m in rep_metrics]
    beat = [_nanf(m.get("beat_alignment")) for m in rep_metrics]
    return {
        "fgd": float(np.mean(fgd)),
        "fgd_std": float(np.std(fgd, ddof=1)) if len(fgd) > 1 else 0.0,
        "fgd_reps": [float(x) for x in fgd],
        "diversity_generated": float(np.mean(div)),
        "diversity_generated_reps": [float(x) for x in div],
        "diversity_reference": rep_metrics[0]["diversity_reference"],
        "beat_alignment": (None if np.isnan(beat).all()
                           else float(np.nanmean(beat))),
        "beat_alignment_reps": [float(x) for x in beat],
        # ground-truth anchor for the beat column (same audio, REFERENCE
        # motion) — noise-independent, so rep 0 suffices
        "beat_alignment_reference": rep_metrics[0].get(
            "beat_alignment_reference"),
        # frozen-motion census (cli.eval velocity retention): total count
        # of (replicate, clip) draws that produced near-static motion.
        # None when re-aggregating a pre-metric report — build_manifest
        # then skips the frozen gate rather than silently passing it
        "frozen_draws": (
            None if any(m.get("frozen_clips") is None for m in rep_metrics)
            else int(sum(m["frozen_clips"] for m in rep_metrics))),
        "frozen_draws_total": int(sum(
            m.get("velocity_clips_matched") or 0 for m in rep_metrics)),
        "velocity_retention_min": (
            None if any(m.get("velocity_retention_min") is None
                        for m in rep_metrics)
            else float(min(m["velocity_retention_min"]
                           for m in rep_metrics))),
        "seed_reps": len(rep_metrics),
        # throughput of the R-replicate batched generation (all streams);
        # single-stream latency/throughput claims come from bench.py, not
        # from here — see the DEMO caveat
        "gen_frames_per_sec": round(fps_val, 1),
        "gen_streams": streams,
    }


# ---------------------------------------------------------------------------
# ZEGGS family: train → sample per mode × replicate → eval
# ---------------------------------------------------------------------------


def run_zeggs(workdir: str) -> dict:
    import yaml

    import jax

    from diffusestylegesture_tpu import diffusion as D
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
                    "seed_reps": SEED_REPS, "noise_seed": NOISE_SEED,
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
        print("== synthesizing ZEGGS corpus ==")
        write_corpus(src, eval_src)
    if not os.path.exists(os.path.join(data_dir, "mean.npz")):
        print("== building ZEGGS dataset (real featurizer) ==")
        # workers: CPU-pinned process pool — the serial path's math would
        # otherwise dispatch eagerly through a remote-TPU (axon) backend
        build_zeggs_dataset(src, data_dir, fps=FPS, workers=4)

    wavlm_jax, wavlm_np, _ = make_pseudo_wavlm()
    # cache pseudo-WavLM features into the window cache (precompute→train
    # handoff, the reference's DataPreprocessor pattern)
    ZeggsWindowDataset(os.path.join(data_dir, "train"), wavlm_np,
                       n_poses=N_POSES, stride=10, fps=FPS)

    mean = np.load(os.path.join(data_dir, "mean.npz"))["mean"]
    std = np.load(os.path.join(data_dir, "std.npz"))["std"]

    # -- train through the product CLI --
    mcfg_kw = (dict(latent_dim=128, ff_size=128, num_layers=2) if SMALL
               else dict(latent_dim=256, ff_size=1024, num_layers=8))
    if not (_env_flag("QH_SKIP_TRAIN") and _ckpt_done(ckpt_dir, steps)):
        print(f"== training MDM for {steps} steps (cli.train) ==")
        cfg = dict(
            dataset="ZEGGS", name="DiffuseStyleGesture", data_dir=data_dir,
            n_poses=N_POSES, motion_resampling_framerate=FPS,
            subdivision_stride=10, batch_size=48, n_seed=N_SEED, njoints=1141,
            latent_dim=mcfg_kw["latent_dim"], ff_size=mcfg_kw["ff_size"],
            num_layers=mcfg_kw["num_layers"], cond_mask_prob=0.1,
            cond_mode="cross_local_attention3_style1", audio_feat="wavlm",
            diffusion_steps=DIFFUSION_STEPS, noise_schedule="cosine",
            # save_interval: mid-train checkpoints make a tunnel-stall
            # kill resumable (train.loop auto-restores latest from
            # save_dir) — r5's first run lost 30k TWH steps to a hang
            lr=1e-4, log_interval=50,
            save_interval=max(2000, min(10_000, steps // 4)),
            num_steps=steps,
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

    report["loss_curve"] = _loss_curve(log_dir)

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
    for name, (sched_x, samp) in _parse_extra_modes(
            "QH_EXTRA_MODES", betas, DIFFUSION_STEPS).items():
        modes.setdefault(name, (model_apply, params, sched_x, samp))

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
        # resume: when every evaluated student's generated replicates are
        # already on disk from this checkpoint (QH_REUSE_GEN sidecars),
        # the student params are only needed to REgenerate — skip the
        # distillation entirely and register placeholder modes; the
        # per-mode reuse branch below never touches apply_fn/params
        nt_chain, _nt = [], DIFFUSION_STEPS
        for _ in range(distill_stages):
            _nt //= 2
            nt_chain.append(_nt)
        expected = [f"distill{nt_chain[s - 1]}"
                    for s in sorted(eval_stages | {distill_stages})]
        _stems = sorted(f[:-4] for f in os.listdir(eval_src)
                        if f.endswith(".wav"))
        if all(_reusable_gen(gen_root, m, report["train_steps"], _stems)
               is not None for m in expected):
            print(f"== reusing generated replicates for {expected} — "
                  "skipping distillation ==")
            for m in expected:
                modes[m] = (None, None, None, "ddim")
            stages_side = os.path.join(workdir, "distill_stages.json")
            if os.path.exists(stages_side):
                with open(stages_side) as f:
                    side = json.load(f)
                report["distill"] = side["stages"]
                report["distill_steps_per_stage"] = side["steps_per_stage"]
        else:
            modes.update(distill_student(
                model_apply, params, full, data_dir, distill_stages, report,
                eval_stages))
            with open(os.path.join(workdir, "distill_stages.json"),
                      "w") as f:
                json.dump({"steps_per_stage":
                           report.get("distill_steps_per_stage"),
                           "stages": report.get("distill", [])}, f)

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

    # -- generate (QH_SEED_REPS batched noise replicates) + evaluate --
    from diffusestylegesture_tpu.data import load_wav_16k

    clip_stems = [f[:-4] for f in eval_wavs]
    for mode_name, (apply_fn, mparams, sched, sampler_name) in modes.items():
        rep_dirs = [os.path.join(gen_root, mode_name, f"rep{r}")
                    for r in range(SEED_REPS)]
        for d in rep_dirs:
            os.makedirs(d, exist_ok=True)
        side = _reusable_gen(gen_root, mode_name, report["train_steps"],
                             clip_stems)
        if side is not None:
            frames, fps_val = side["frames"], side["fps"]
            print(f"== mode {mode_name}: reusing {frames} generated frames "
                  f"({SEED_REPS} reps, recorded warm {fps_val:.0f} fps) ==",
                  flush=True)
            rep_metrics = [
                _eval_dir(rd, ref_dir, eval_src, FPS,
                          os.path.join(workdir, "ae_cache"))
                for rd in rep_dirs
            ]
            entry = _aggregate_reps(rep_metrics, fps_val, SEED_REPS)
            report["modes"][mode_name] = entry
            print(f"   {mode_name}: fgd={entry['fgd']:.3f}"
                  f"±{entry['fgd_std']:.3f} "
                  f"beat={_nanf(entry.get('beat_alignment')):.3f} "
                  f"div={entry['diversity_generated']:.2f}")
            continue
        # regenerating: drop any stale sidecar so a crash mid-mode can't
        # later pass off mixed-run replicates as a completed generation
        if os.path.exists(_gen_sidecar_path(gen_root, mode_name)):
            os.remove(_gen_sidecar_path(gen_root, mode_name))
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
            # replicate r = batch row r: jax.random.normal over the
            # (R, ...) batch gives iid noise per row, so one compiled
            # call generates all independent replicates at once
            style = np.tile(zf.style_onehot(stem.split("_")[1])[None],
                            (SEED_REPS, 1))
            tc = time.time()
            # per-clip noise key: the reference seeds the RNG STREAM once
            # (torch.manual_seed(123456), sample.py:343) and each clip
            # consumes fresh draws — reusing one key for every clip would
            # correlate noise across clips and bias cross-clip diversity
            out = sampler.generate(
                mparams, None, audio, style,
                jax.random.fold_in(jax.random.PRNGKey(NOISE_SEED), ci),
                mean=mean, std=std)
            clip_wall = time.time() - tc
            for r in range(SEED_REPS):
                np.save(os.path.join(rep_dirs[r], stem + ".npy"), out[r])
            print(f"   clip {stem}: {out.shape[0]}x{out.shape[1]} frames "
                  f"{clip_wall:.1f}s", flush=True)
            frames += out.shape[0] * out.shape[1]
            total_wall += clip_wall
            if ci > 0:  # clip 0 pays the engine compile
                warm_frames += out.shape[0] * out.shape[1]
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
                # committed copy: the workdir is scratch (round 3's DEMO
                # pointed at a path that no longer existed by judging time).
                # Real configurations only — a smoke run's tiny-trunk ddpm8
                # demo must not clobber a file named ddpm1000
                if (baseline_key == "ddpm1000" and not SMALL
                        and report.get("train_steps", 0) >= 10_000):
                    import shutil

                    shutil.copyfile(
                        os.path.join(workdir, f"demo_{mode_name}.bvh"),
                        os.path.join(REPO, "docs",
                                     "demo_zeggs_ddpm1000.bvh"))
                    # browser-playable twin (motion/mocap_player.py — the
                    # reference's notebook player surface as one file)
                    from diffusestylegesture_tpu.motion import pipeline as MPp
                    from diffusestylegesture_tpu.motion.mocap_player import (
                        write_mocap_player_html,
                    )

                    dtrack = MPp.parse_bvh(
                        os.path.join(workdir, f"demo_{mode_name}.bvh"))
                    dpos = MPp.MocapParameterizer("position").transform(dtrack)
                    write_mocap_player_html(
                        dpos, os.path.join(REPO, "docs",
                                           "demo_zeggs_ddpm1000.html"),
                        frame_time=dtrack.framerate)
                print(f"   demo BVH {time.time() - tb:.1f}s", flush=True)
        # with a single eval clip there is no warm measurement — report
        # the compile-inclusive throughput rather than frames/1.0
        wall = warm_wall if warm_frames else max(total_wall, 1e-9)
        fps_val = (warm_frames or frames) / wall
        print(f"== mode {mode_name}: {frames} frames over {SEED_REPS} reps, "
              f"warm {fps_val:.0f} fps (all streams) ==")
        _write_gen_sidecar(gen_root, mode_name, fps_val, frames,
                           report["train_steps"], clip_stems)

        rep_metrics = [
            _eval_dir(rd, ref_dir, eval_src, FPS,
                      os.path.join(workdir, "ae_cache"))
            for rd in rep_dirs
        ]
        entry = _aggregate_reps(rep_metrics, fps_val, SEED_REPS)
        report["modes"][mode_name] = entry
        print(f"   {mode_name}: fgd={entry['fgd']:.3f}±{entry['fgd_std']:.3f} "
              f"beat={_nanf(entry.get('beat_alignment')):.3f} "
              f"div={entry['diversity_generated']:.2f}")

    report["manifest"] = build_manifest(report)
    return report


def build_manifest(report: dict) -> dict:
    """Verdicts from a family report: FGD ratio vs the DDPM baseline with
    a seed-noise-derived tolerance, AND diversity retention (both axes
    must hold — see DIVERSITY_RATIO_MIN and the module docstring).

    Factored out so `--rebuild` can recompute verdicts from a committed
    QUALITY_*.json when the gate criteria change, without re-running the
    train/generate/eval pipeline."""
    baseline_key = next(k for k in report["modes"] if k.startswith("ddpm"))
    base = report["modes"][baseline_key]
    base_reps, b_dropped = reject_outliers(
        base.get("fgd_reps") or [base["fgd"]])
    R = len(base_reps)
    b_mean = max(float(np.mean(base_reps)), 1e-9)
    b_std = float(np.std(base_reps, ddof=1)) if R > 1 else 0.0
    base_div_reps, bd_dropped = reject_outliers(
        base.get("diversity_generated_reps")
        or [base["diversity_generated"]])
    base_div = max(float(np.mean(base_div_reps)), 1e-9)

    # absolute baseline health (see BASELINE_* constants): relative
    # verdicts are only meaningful against a baseline that is actually
    # generating diverse, noise-dependent motion
    div_vs_ref = base_div / max(float(base["diversity_reference"]), 1e-9)
    fgd_spread = (b_std / b_mean) if R > 1 else None
    collapse_reasons = []
    if div_vs_ref < BASELINE_DIV_VS_REF_MIN:
        collapse_reasons.append(
            f"baseline diversity {base_div:.2f} is only {div_vs_ref:.4f}× "
            f"the reference's {base['diversity_reference']:.2f} "
            f"(floor {BASELINE_DIV_VS_REF_MIN})")
    if fgd_spread is not None and fgd_spread < BASELINE_FGD_SPREAD_MIN:
        collapse_reasons.append(
            f"baseline FGD sd/mean {fgd_spread:.2e} across {R} "
            f"independent-noise replicates (floor {BASELINE_FGD_SPREAD_MIN:g}"
            ") — output is noise-independent")
    if base.get("frozen_draws"):
        collapse_reasons.append(
            f"baseline produced {base['frozen_draws']} frozen-motion "
            f"draw(s) out of {base.get('frozen_draws_total')}")

    if R > 1:
        # the FGD ratio of a mode with IDENTICAL true quality to the
        # baseline still fluctuates with sampling noise: both numerator
        # and denominator are means of R replicate FGDs, so under the
        # null sigma_ratio ≈ sqrt(2) · (σ_b/μ_b) / sqrt(R)
        sigma_null = math.sqrt(2.0) * (b_std / b_mean) / math.sqrt(R)
        tol = 1.0 + max(3.0 * sigma_null, FGD_TOL_FLOOR)
        tol_note = (
            f"1 + max(3·sigma_null, {FGD_TOL_FLOOR}) with sigma_null = "
            f"sqrt(2)·(sd/mean of {R} baseline FGD replicates)/sqrt({R}) "
            f"= {sigma_null:.4f}")
    else:
        sigma_null = None
        tol = FGD_RATIO_TOL_LEGACY
        tol_note = "single-replicate report: legacy fixed tolerance"

    manifest = {
        "generated_by": "scripts/quality_harness.py",
        "baseline": baseline_key,
        "baseline_fgd": b_mean,
        "baseline_fgd_std": b_std,
        "baseline_diversity_vs_reference": round(div_vs_ref, 4),
        "baseline_outliers_dropped": b_dropped + bd_dropped,
        "collapsed": bool(collapse_reasons),
        "collapse_reasons": collapse_reasons,
        "seed_reps": R,
        "train_steps": report["train_steps"],
        "fgd_ratio_tolerance": round(tol, 4),
        "tolerance_derivation": tol_note,
        "diversity_ratio_min": DIVERSITY_RATIO_MIN,
        "modes": {},
    }
    for mode_name, m in report["modes"].items():
        if mode_name == baseline_key:
            continue
        m_reps, m_dropped = reject_outliers(m.get("fgd_reps") or [m["fgd"]])
        m_mean = float(np.mean(m_reps))
        m_std = float(np.std(m_reps, ddof=1)) if len(m_reps) > 1 else 0.0
        ratio = m_mean / b_mean
        if len(m_reps) > 1 and R > 1:
            # std of a ratio of independent means (first-order delta
            # method with standard errors of each mean)
            se = ratio * math.sqrt(
                (m_std ** 2 / len(m_reps)) / m_mean ** 2
                + (b_std ** 2 / R) / b_mean ** 2)
            ci = [round(ratio - 1.96 * se, 4), round(ratio + 1.96 * se, 4)]
        else:
            ci = None
        m_div_reps, md_dropped = reject_outliers(
            m.get("diversity_generated_reps")
            or [m["diversity_generated"]])
        div_ratio = float(np.mean(m_div_reps)) / base_div
        # zero tolerance for frozen draws: a mode that emits a static
        # pose on ANY of its (replicate × clip) draws is broken for
        # serving no matter how the FGD mean averages out — and because
        # mid-ladder distilled students freeze on ~10% of draws, an
        # 8-replicate FGD gate flips verdicts between seeds while this
        # census is stable (seed 123456 and 777 both catch them).
        # frozen_draws=None (pre-metric report) leaves the FGD gate in
        # charge, recorded as frozen_draws: null
        frozen = m.get("frozen_draws")
        manifest["modes"][mode_name] = {
            "fgd": m_mean, "fgd_std": m_std,
            "fgd_ratio": round(ratio, 3),
            "fgd_ratio_ci95": ci,
            "beat_alignment": m.get("beat_alignment"),
            "diversity_ratio_vs_baseline": round(div_ratio, 3),
            "outliers_dropped": m_dropped + md_dropped,
            "frozen_draws": frozen,
            "velocity_retention_min": m.get("velocity_retention_min"),
            # no mode of a collapsed family may certify fast serving
            "ok": bool(not collapse_reasons and ratio <= tol
                       and div_ratio >= DIVERSITY_RATIO_MIN
                       and not frozen),
        }
    return manifest


def _stage_budget(teacher_nt: int, base: int) -> int:
    """Per-stage distillation step budget scaled to where the quality is
    lost: the r4 run trained every stage 400 steps and ended 1000→500 at
    loss 6.01, 500→250 at 2.74, 250→125 at 2.65 (vs ≤0.35 from 125 down)
    — the early stages were badly undertrained and every descendant
    inherited the damage (all ≤62-step students refused by the r4 gate).
    Early/high-timestep stages get the largest multiple of the base."""
    if teacher_nt >= 250:
        return 6 * base
    if teacher_nt >= 62:
        return 4 * base
    return 3 * base


def distill_student(model_apply, params, full_sched, data_dir, stages, report,
                    eval_stages=()):
    """Progressive distillation on the trained teacher.

    Round-5 recipe (VERDICT r4 item 2): per-stage budgets via
    `_stage_budget`, an EMA student (decay 0.995) whose weights are both
    the served mode and the next stage's teacher, warmup+cosine LR per
    stage (peak 2e-4 → 1e-5), and the training batch size (48, was 32).

    Returns {mode_name: (apply, params, schedule, sampler_name)} with one
    entry per stage index in ``eval_stages`` (1-based; the final stage is
    always included), named ``distill<num_timesteps>`` from the student's
    actual halved grid."""
    import jax
    import jax.numpy as jnp
    import optax

    from diffusestylegesture_tpu import diffusion as D
    from diffusestylegesture_tpu.data import ZeggsWindowDataset
    from diffusestylegesture_tpu.train.distill import make_distill_step, student_schedule
    from diffusestylegesture_tpu.train.state import make_zeggs_cond_builder

    from diffusestylegesture_tpu.data.device_cache import DeviceWindowCache

    ds = ZeggsWindowDataset(os.path.join(data_dir, "train"), None)
    builder = make_zeggs_cond_builder(N_SEED)
    # per-stage student cache: the distillation chain is deterministic
    # given (teacher checkpoint step, budgets, LR, EMA decay) — PRNGKey
    # is fixed per stage — so a second-seed stability replay
    # (QH_NOISE_SEED + compare_quality_runs.py) must not pay the ~30 min
    # of chip time to re-derive bit-identical students
    students_dir = os.path.join(os.path.dirname(data_dir.rstrip("/")),
                                "distill_students")
    os.makedirs(students_dir, exist_ok=True)

    def _save_tree(path, tree):
        import numpy as _np
        leaves = jax.tree_util.tree_leaves(tree)
        _np.savez(path, **{f"a{i}": _np.asarray(v)
                           for i, v in enumerate(leaves)})

    def _load_tree(path, template):
        import numpy as _np
        data = _np.load(path)
        treedef = jax.tree_util.tree_structure(template)
        return jax.tree_util.tree_unflatten(
            treedef, [data[f"a{i}"] for i in range(len(data.files))])
    # device-resident windows: per-step host batches (~24 MB each) through
    # a tunneled backend dominated stage wall time (measured 18.6 min per
    # 400-step stage); the in-jit gather removes the transfer entirely
    cache = DeviceWindowCache.from_zeggs(ds)
    batch_size = 48
    base_steps = int(os.environ.get("QH_DISTILL_STEPS", "400"))
    # finetune-scale peak LR: the student starts AT the teacher's weights;
    # 2e-4 (r4/r5 default) measurably destabilized well-trained teachers
    peak_lr = float(os.environ.get("QH_DISTILL_LR", "2e-4"))
    ema_decay = 0.995

    report["distill_steps_per_stage"] = base_steps
    sched_t = full_sched
    teacher_params = params
    out_modes = {}
    for stage in range(stages):
        nt = sched_t.num_timesteps
        steps_this_stage = _stage_budget(nt, base_steps)

        stage_key = {"teacher_train_steps": report.get("train_steps"),
                     "stage": stage + 1, "teacher_steps": nt,
                     "opt_steps": steps_this_stage, "peak_lr": peak_lr,
                     "ema_decay": ema_decay, "batch_size": batch_size,
                     "diffusion_steps": DIFFUSION_STEPS}
        cache_npz = os.path.join(students_dir, f"stage{stage + 1}.npz")
        cache_meta = os.path.join(students_dir, f"stage{stage + 1}.json")
        cached = None
        if os.path.exists(cache_npz) and os.path.exists(cache_meta):
            try:
                with open(cache_meta) as f:
                    meta = json.load(f)
                if meta.get("key") == stage_key:
                    cached = meta
            except (json.JSONDecodeError, OSError):
                cached = None
        if cached is not None:
            ema_params = _load_tree(cache_npz, teacher_params)
            print(f"   distill stage {stage + 1}/{stages}: {nt}→{nt // 2} "
                  f"steps — cached student reused ({cache_npz})")
            report.setdefault("distill", []).append(
                {"stage": stage + 1, "teacher_steps": nt,
                 "loss": cached["loss"], "opt_steps": steps_this_stage,
                 "cached": True})
            sched_t = student_schedule(
                sched_t, D.named_beta_schedule("cosine", DIFFUSION_STEPS))
            teacher_params = ema_params
            if (stage + 1) in eval_stages or stage == stages - 1:
                out_modes[f"distill{sched_t.num_timesteps}"] = (
                    model_apply, ema_params, sched_t, "ddim")
            continue

        def student_apply(p, x, t, cond):
            return model_apply(p, x, t, cond)

        lr_sched = optax.warmup_cosine_decay_schedule(
            0.0, peak_lr,
            warmup_steps=min(100, max(steps_this_stage // 10, 1)),
            decay_steps=max(steps_this_stage, 1),
            end_value=min(1e-5, peak_lr / 10))

        def _make(tp, _sched=sched_t, _lr=lr_sched):
            return make_distill_step(
                lambda x, t, cond: model_apply(tp, x, t, cond),
                student_apply, _sched, lr=_lr, conditioned=True)

        init_fn, _ = _make(teacher_params)

        # teacher params and the dataset arrays enter as jit ARGS, not
        # closure constants (same pattern as cli/distill.py and
        # data/device_cache.py — closure arrays become HLO literals:
        # compile bloat, and remote-compile transports reject them).
        # The optimization loop itself is a lax.scan over CHUNK steps —
        # ONE dispatch per 100 steps: per-step host dispatch through the
        # tunneled backend measured ~1.4 steps/s (the r5 budgets would
        # have taken hours), stime-dominated relay traffic for 4 pytree
        # args per call; scanning on device runs the same math at
        # compiled speed with 1/CHUNK the dispatches.
        CHUNK = max(min(100, steps_this_stage), 1)

        @jax.jit
        def jchunk(tp, p, ema, opt_state, key, arrays):
            def body(carry, _):
                p, ema, opt_state, key = carry
                key, k_data, k_step = jax.random.split(key, 3)
                batch = DeviceWindowCache.sample_batch(
                    arrays, k_data, batch_size)
                x0, cond, _ = builder(batch)
                p2, opt2, m2 = _make(tp)[1](p, opt_state, x0, k_step, cond)
                ema2 = jax.tree.map(
                    lambda e, q: ema_decay * e + (1.0 - ema_decay) * q,
                    ema, p2)
                return (p2, ema2, opt2, key), m2["loss"]

            (p, ema, opt_state, key), losses = jax.lax.scan(
                body, (p, ema, opt_state, key), None, length=CHUNK)
            return p, ema, opt_state, key, losses[-1]

        student_params = jax.tree.map(jnp.copy, teacher_params)
        ema_params = jax.tree.map(jnp.copy, teacher_params)
        opt = init_fn(student_params)
        key = jax.random.PRNGKey(stage)
        t0 = time.time()
        loss = float("nan")  # QH_DISTILL_STEPS=0 smoke runs
        for i in range(-(-steps_this_stage // CHUNK) if steps_this_stage else 0):
            student_params, ema_params, opt, key, last_loss = jchunk(
                teacher_params, student_params, ema_params, opt, key,
                cache.arrays)
            # one sync per chunk: bounds the async queue (an uncapped
            # enqueue wedged the relay in the r04 re-run) and keeps the
            # loop observable
            loss = float(last_loss)
        print(f"   distill stage {stage + 1}/{stages}: {nt}→{nt // 2} steps, "
              f"{steps_this_stage} opt steps, loss {loss:.4f} "
              f"({time.time() - t0:.0f}s)")
        report.setdefault("distill", []).append(
            {"stage": stage + 1, "teacher_steps": nt, "loss": loss,
             "opt_steps": steps_this_stage})
        _save_tree(cache_npz, ema_params)
        with open(cache_meta, "w") as f:
            json.dump({"key": stage_key, "loss": loss}, f)
        sched_t = student_schedule(sched_t, D.named_beta_schedule("cosine", DIFFUSION_STEPS))
        # EMA weights serve AND teach the next stage (less last-batch
        # noise than the raw student — standard distillation practice)
        teacher_params = ema_params
        if (stage + 1) in eval_stages or stage == stages - 1:
            out_modes[f"distill{sched_t.num_timesteps}"] = (
                model_apply, ema_params, sched_t, "ddim")

    return out_modes


# ---------------------------------------------------------------------------
# BEAT/TWH family (MDM+): synthetic TWH corpus → h5 → cli.train → modes
# ---------------------------------------------------------------------------


def synth_twh_clip(speaker: int, seed: int, seconds: float, out_stem: str):
    """One TWH-format clip: 62-bone BVH @30 fps (6 channels per bone,
    [Xpos Ypos Zpos | Zrot Xrot Yrot] — the layout `twh_features`
    unpacks), wav with beat clicks, and a word-alignment tsv."""
    from scipy.io import wavfile

    from diffusestylegesture_tpu.motion import pipeline as MP

    style = list(STYLES)[speaker % len(STYLES)]
    wav, beat_times, env, t = synth_audio(style, seed, seconds)
    wavfile.write(out_stem + ".wav", SR, (wav * 32767).astype(np.int16))

    names = list(MP.TWH_BONE_NAMES)
    J = len(names)
    rng = np.random.default_rng(seed)
    rot = synth_rotations(style, seed, seconds, beat_times, env, t,
                          TWH_FPS, J,
                          character_seed=700 + speaker)  # (T, J, 3) degrees
    T = rot.shape[0]
    # per-bone rest position + small beat-synchronized translation so the
    # position block of the 744-d feature is informative, not constant;
    # SPEAKER-deterministic like the rotation character (a per-clip random
    # rest pose would be unpredictable-from-conditioning variance in 3 of
    # every joint's 12 feature dims)
    rest = np.random.default_rng(800 + speaker).uniform(
        -20, 20, (J, 3)).astype(np.float32)
    rest[0] = [0.0, 100.0, 0.0]
    pos = rest[None] + 0.02 * rot  # positions ride the same strokes
    # simple chain skeleton: featurization is per-joint channels only
    # (twh rotmat mode does no FK), parents only shape the BVH hierarchy
    parents = {names[0]: None}
    for i in range(1, J):
        parents[names[i]] = names[i - 1]
    channels = {n: ["Xposition", "Yposition", "Zposition",
                    "Zrotation", "Xrotation", "Yrotation"] for n in names}
    nub = names[-1] + "_Nub"
    full_names = names + [nub]
    parents[nub] = names[-1]
    channels[nub] = []
    offsets = {n: rng.uniform(-3, 3, 3).astype(np.float32)
               for n in full_names}
    columns = [f"{j}_{c}" for j in names for c in channels[j]]
    vals = np.empty((T, len(columns)), np.float32)
    per = np.concatenate([pos, rot[..., [2, 0, 1]]], axis=-1)  # Z X Y rot order
    vals[:] = per.reshape(T, -1)
    data = MP.ChannelData(full_names, parents, offsets, channels, columns,
                          vals, 1.0 / TWH_FPS, names[0])
    MP.write_bvh_channels(data, out_stem + ".bvh")

    # word alignments: one word per beat (plus fillers), simple vocab
    vocab = ["beat", "move", "hand", "wave", "nod", "point", "lift", "turn"]
    with open(out_stem + ".tsv", "w") as f:
        for i, bt in enumerate(beat_times):
            w = vocab[(seed + i) % len(vocab)]
            f.write(f"{bt:.3f}\t{bt + 0.3:.3f}\t{w}\n")
    return wav


def twh_word_vectors():
    """Deterministic synthetic fastText stand-in (crawl-300d-2M has no
    in-image artifact): each word gets a fixed seeded 300-d unit vector."""
    vocab = ["beat", "move", "hand", "wave", "nod", "point", "lift", "turn"]
    vecs = {}
    for i, w in enumerate(vocab):
        v = np.random.default_rng(7000 + i).standard_normal(300)
        vecs[w] = (v / np.linalg.norm(v)).astype(np.float32)
    return vecs


def run_twh(workdir: str) -> dict:
    import yaml

    import jax

    from diffusestylegesture_tpu import diffusion as D
    from diffusestylegesture_tpu.cli.sample import load_orbax_params
    from diffusestylegesture_tpu.cli.train import main as train_main
    from diffusestylegesture_tpu.data import load_wav_16k
    from diffusestylegesture_tpu.data.beat_twh import build_beat_twh_clip
    from diffusestylegesture_tpu.data.h5_loader import (
        build_h5_dataset,
        gesture_statistics,
    )
    from diffusestylegesture_tpu.models.mdm_plus import MDMPlus, MDMPlusConfig
    from diffusestylegesture_tpu.sample import (
        BeatEngineConfig,
        BeatTwhSampler,
        prepare_seed_gesture,
    )
    from diffusestylegesture_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    steps = int(os.environ.get("QH_TWH_STEPS",
                               os.environ.get("QH_STEPS", "3000")))
    src = os.path.join(workdir, "twh_src")
    eval_src = os.path.join(workdir, "twh_eval_src")
    ckpt_dir = os.path.join(workdir, "twh_ckpt")
    log_dir = os.path.join(workdir, "twh_logs")
    gen_root = os.path.join(workdir, "twh_generated")
    h5_path = os.path.join(workdir, "twh_train.h5")
    report: dict = {"train_steps": steps, "modes": {},
                    "seed_reps": SEED_REPS, "noise_seed": NOISE_SEED,
                    "small_trunk": SMALL,
                    "ae_steps": int(os.environ.get("QH_AE_STEPS", "400"))}
    os.makedirs(src, exist_ok=True)
    os.makedirs(eval_src, exist_ok=True)

    _, _, wavlm_clip = make_pseudo_wavlm()
    w2v = twh_word_vectors()
    n_speakers = 17  # TWH style_dim; corpus uses speakers 0/1

    # -- corpus --
    train_stems = [os.path.join(src, f"{i:03d}_twh") for i in range(TRAIN_CLIPS)]
    eval_stems = [os.path.join(eval_src, f"9{i:02d}_twh")
                  for i in range(EVAL_CLIPS)]
    if not os.path.exists(eval_stems[-1] + ".tsv"):
        print("== synthesizing TWH corpus ==")
        for i, stem in enumerate(train_stems):
            synth_twh_clip(i % 2, seed=2000 + i, seconds=CLIP_SECONDS,
                           out_stem=stem)
        for i, stem in enumerate(eval_stems):
            synth_twh_clip(i % 2, seed=3000 + i, seconds=EVAL_SECONDS,
                           out_stem=stem)

    # -- h5 build through the real featurizers (62-bone pipeline, 1133-d
    # audio with pseudo-WavLM, 302-d aligned text) --
    if not os.path.exists(h5_path):
        print("== building TWH h5 dataset (real featurizers) ==")
        clips = []
        for i, stem in enumerate(train_stems):
            wav = load_wav_16k(stem + ".wav")
            onehot = np.eye(n_speakers, dtype=np.float32)[i % 2]
            clips.append(build_beat_twh_clip(
                stem + ".bvh", wav, SR, stem + ".tsv", w2v, onehot,
                dataset="TWH", wavlm_features=wavlm_clip(wav)))
        build_h5_dataset(h5_path, clips)
    mean, std = gesture_statistics(h5_path)

    # -- train MDM+ through the product CLI (TWH derivations: latent 512,
    # njoints 2232, attention4) --
    mcfg_kw = dict(ff_size=128, num_layers=2) if SMALL else {}
    if not (_env_flag("QH_SKIP_TRAIN") and _ckpt_done(ckpt_dir, steps)):
        print(f"== training MDM+ (TWH) for {steps} steps (cli.train) ==")
        cfg = dict(
            dataset="TWH", name="DiffuseStyleGesture+", h5file=h5_path,
            n_poses=TWH_N_POSES, n_seed=TWH_N_SEED, batch_size=48,
            cond_mask_prob=0.1, audio_feat="wavlm",
            diffusion_steps=DIFFUSION_STEPS, noise_schedule="cosine",
            # save_interval: mid-train checkpoints make a tunnel-stall
            # kill resumable (train.loop auto-restores latest from
            # save_dir) — r5's first run lost 30k TWH steps to a hang
            lr=1e-4, log_interval=50,
            save_interval=max(2000, min(10_000, steps // 4)),
            num_steps=steps,
            save_dir=ckpt_dir, log_dir=log_dir, log_formats=["stdout", "csv"],
            **mcfg_kw,
        )
        cfg_path = os.path.join(workdir, "twh_train_cfg.yml")
        with open(cfg_path, "w") as f:
            yaml.safe_dump(cfg, f)
        t0 = time.time()
        train_main(["--config", cfg_path, "--device_cache"])
        report["train_wall_s"] = round(time.time() - t0, 1)

    params = load_orbax_params(ckpt_dir)
    saved_steps = [int(d) for d in os.listdir(ckpt_dir) if d.isdigit()]
    if saved_steps:
        report["train_steps"] = max(saved_steps)
    report["loss_curve"] = _loss_curve(log_dir)

    mcfg = MDMPlusConfig(cond_mask_prob=0.1, **mcfg_kw)
    model = MDMPlus(mcfg)

    def model_apply(p, x, t, cond, uncond=None):
        return model.apply(p, x, t, cond, uncond=uncond)

    betas = D.named_beta_schedule("cosine", DIFFUSION_STEPS)
    full = D.Schedule.create(betas)
    n_ddim = max(DIFFUSION_STEPS // 10, 2)
    n_dpmpp = max(DIFFUSION_STEPS // 50, 2)
    modes = {
        f"ddpm{DIFFUSION_STEPS}": (full, "ddpm"),
        f"ddim{n_ddim}": (
            D.spaced_schedule(betas, D.space_timesteps(
                DIFFUSION_STEPS, f"ddim{n_ddim}")), "ddim"),
        f"dpmpp{n_dpmpp}": (
            D.spaced_schedule(betas, D.space_timesteps(
                DIFFUSION_STEPS, f"ddim{n_dpmpp}")), "dpmpp"),
    }
    # extra modes for this family (e.g. a deliberately-aggressive ddim5 /
    # dpmpp3 sensitivity probe of the gate)
    for name, entry in _parse_extra_modes(
            "QH_TWH_EXTRA_MODES", betas, DIFFUSION_STEPS).items():
        modes.setdefault(name, entry)

    # -- eval features: GT 744-d gesture per eval clip + seed gesture
    # from a TRAIN clip (the reference seeds generation with a real clip,
    # `BEAT-TWH-main/.../sample.py:115-129` — never the held-out target) --
    ref_dir = os.path.join(workdir, "twh_ref_feats")
    os.makedirs(ref_dir, exist_ok=True)
    from diffusestylegesture_tpu.motion import pipeline as MP

    eval_feats = {}
    for stem in eval_stems:
        s = os.path.basename(stem)
        p = os.path.join(ref_dir, s + ".npy")
        if not os.path.exists(p):
            feats, _ = MP.twh_features(stem + ".bvh")
            np.save(p, feats)
        eval_feats[s] = np.load(p)
    # seed gesture per SPEAKER: the reference seeds generation with a real
    # clip of the speaker being generated (`BEAT-TWH-main/.../sample.py:
    # 115-129` pairs --tst_prefix with its own speaker id). Round 4's first
    # cut seeded every eval clip from train clip 0 (speaker 0); with
    # attention4's per-frame seed conditioning + cross-window seed chaining
    # the sampler then anchored BOTH speakers' output to speaker 0's rest
    # pose — measured generated diversity collapsed to 0.9 vs the
    # reference windows' 96 (most of which IS the inter-speaker rest-pose
    # gap) while beat alignment stayed at 0.92.
    seeds = {}
    for spk in (0, 1):
        seed_src, _ = MP.twh_features(train_stems[spk] + ".bvh")
        seeds[spk] = prepare_seed_gesture(seed_src[: TWH_N_SEED + 2],
                                          mean, std)

    # -- per-eval-clip fused textaudio (the live-feature path of
    # cli.sample_beat: 1133-d audio + 302-d aligned text) --
    from diffusestylegesture_tpu.data.text import load_tsv

    textaudio = {}
    for stem in eval_stems:
        s = os.path.basename(stem)
        wav = load_wav_16k(stem + ".wav")
        from diffusestylegesture_tpu.data.beat_twh import load_audio_features

        af = load_audio_features(wav, SR, wavlm_clip(wav))
        tx = load_tsv(stem + ".tsv", w2v, len(af), laughter_flag=True)
        textaudio[s] = np.concatenate([af, tx], axis=-1)

    clip_stems = [os.path.basename(stem) for stem in eval_stems]
    for mode_name, (sched, sampler_name) in modes.items():
        rep_dirs = [os.path.join(gen_root, mode_name, f"rep{r}")
                    for r in range(SEED_REPS)]
        for d in rep_dirs:
            os.makedirs(d, exist_ok=True)
        side = _reusable_gen(gen_root, mode_name, report["train_steps"],
                             clip_stems)
        if side is not None:
            frames, fps_val = side["frames"], side["fps"]
            print(f"== twh mode {mode_name}: reusing {frames} generated "
                  f"frames ({SEED_REPS} reps, recorded warm "
                  f"{fps_val:.0f} fps) ==", flush=True)
            rep_metrics = [
                _eval_dir(rd, ref_dir, eval_src, TWH_FPS,
                          os.path.join(workdir, "twh_ae_cache"))
                for rd in rep_dirs
            ]
            entry = _aggregate_reps(rep_metrics, fps_val, SEED_REPS)
            report["modes"][mode_name] = entry
            print(f"   {mode_name}: fgd={entry['fgd']:.3f}"
                  f"±{entry['fgd_std']:.3f} "
                  f"beat={_nanf(entry.get('beat_alignment')):.3f} "
                  f"div={entry['diversity_generated']:.2f}")
            continue
        if os.path.exists(_gen_sidecar_path(gen_root, mode_name)):
            os.remove(_gen_sidecar_path(gen_root, mode_name))
        sampler = BeatTwhSampler(
            model_apply, sched,
            BeatEngineConfig(variant="attention4", sampler=sampler_name),
        )
        frames, total_wall = 0, 0.0
        warm_frames, warm_wall = 0, 0.0
        for ci, stem in enumerate(eval_stems):
            s = os.path.basename(stem)
            speaker = ci % 2
            style = np.tile(
                np.eye(n_speakers, dtype=np.float32)[speaker][None],
                (SEED_REPS, 1))
            tc = time.time()
            out = sampler.generate(
                params, textaudio[s], seeds[speaker], style,
                jax.random.fold_in(jax.random.PRNGKey(NOISE_SEED), ci),
                mean, std)
            clip_wall = time.time() - tc
            for r in range(SEED_REPS):
                np.save(os.path.join(rep_dirs[r], s + ".npy"), out[r])
            print(f"   clip {s}: {out.shape[0]}x{out.shape[1]} frames "
                  f"{clip_wall:.1f}s", flush=True)
            frames += out.shape[0] * out.shape[1]
            total_wall += clip_wall
            if ci > 0:
                warm_frames += out.shape[0] * out.shape[1]
                warm_wall += clip_wall
        wall = warm_wall if warm_frames else max(total_wall, 1e-9)
        fps_val = (warm_frames or frames) / wall
        print(f"== twh mode {mode_name}: {frames} frames over {SEED_REPS} "
              f"reps, warm {fps_val:.0f} fps (all streams) ==")
        _write_gen_sidecar(gen_root, mode_name, fps_val, frames,
                           report["train_steps"], clip_stems)

        rep_metrics = [
            _eval_dir(rd, ref_dir, eval_src, TWH_FPS,
                      os.path.join(workdir, "twh_ae_cache"))
            for rd in rep_dirs
        ]
        entry = _aggregate_reps(rep_metrics, fps_val, SEED_REPS)
        report["modes"][mode_name] = entry
        print(f"   {mode_name}: fgd={entry['fgd']:.3f}±{entry['fgd_std']:.3f} "
              f"beat={_nanf(entry.get('beat_alignment')):.3f} "
              f"div={entry['diversity_generated']:.2f}")

    report["manifest"] = build_manifest(report)
    return report


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------


def _is_real(report: dict) -> bool:
    """Only a real-configuration family report may write the shipped
    serving gate: full 1000-step schedule, full-size trunk, a
    substantively trained checkpoint (report['train_steps'] reflects the
    ACTUAL restored step — QH_STEPS smoke values and stale ckpt dirs both
    show up here), real embedding/distill budgets, and >= 2 seed
    replicates (the statistical gate needs a noise estimate). A quick
    QH_STEPS=200 trial must not rewrite what cli.sample refuses.

    A COLLAPSED baseline (build_manifest's absolute health floors) is
    also excluded: its relative verdicts are vacuous."""
    baseline = next((k for k in report.get("modes", {})
                     if k.startswith("ddpm")), "")
    return (baseline == "ddpm1000"
            and not report.get("small_trunk", False)
            and not report.get("manifest", {}).get("collapsed", False)
            and report.get("train_steps", 0) >= 10_000
            and report.get("seed_reps", 1) >= 2
            and report.get("ae_steps", 400) >= 400
            # distilled students only gate serving when substantively
            # distilled — a 50-step smoke distill must not write distillN
            # verdicts into the shipped manifest
            and (not report.get("distill")
                 or report.get("distill_steps_per_stage", 0) >= 400))


def merge_gate_manifest(family_manifests: dict) -> str:
    """Update resources/quality_gate.json with the given family sections,
    PRESERVING other families' existing verdicts (an incremental
    single-family re-run must not clobber the other family's gate)."""
    res_dir = os.path.join(REPO, "diffusestylegesture_tpu", "resources")
    os.makedirs(res_dir, exist_ok=True)
    gate_path = os.path.join(res_dir, "quality_gate.json")
    existing = {}
    if os.path.exists(gate_path):
        with open(gate_path) as f:
            existing = json.load(f)
    if existing and "families" not in existing:
        existing = {"families": {"zeggs": existing}}
    base = existing or {"families": {}}
    base.setdefault("families", {}).update(family_manifests)
    base["generated_by"] = "scripts/quality_harness.py"
    with open(gate_path, "w") as f:
        json.dump(base, f, indent=1)
    return gate_path


RUNNERS = {"zeggs": run_zeggs, "twh": run_twh}


def main():
    import faulthandler

    # periodic all-thread stack dumps: long axon compiles/transfers look
    # like hangs from outside; this shows exactly where the time goes
    faulthandler.dump_traceback_later(600, repeat=True, file=sys.stderr)
    workdir = os.environ.get("QH_WORKDIR", os.path.join(REPO, ".quality_harness"))
    os.makedirs(workdir, exist_ok=True)
    if "--rebuild" in sys.argv:
        # recompute verdicts from a committed report (gate-criteria
        # changes don't need the hours-long train/generate/eval rerun)
        src = sys.argv[sys.argv.index("--rebuild") + 1]
        with open(src) as f:
            loaded = json.load(f)
        # v1 reports are a bare zeggs family; v2 are family-keyed
        families = (loaded["families"] if "families" in loaded
                    else {"zeggs": loaded})
        for fam, rep in families.items():
            rep["manifest"] = build_manifest(rep)
        report = {"families": families}
    else:
        wanted = [f.strip().lower() for f in
                  os.environ.get("QH_FAMILIES", "zeggs,twh").split(",")
                  if f.strip()]
        bad = [f for f in wanted if f not in RUNNERS]
        if bad:
            raise SystemExit(f"QH_FAMILIES: unknown families {bad} "
                             f"(known: {sorted(RUNNERS)})")
        report = {"families": {}}
        for fam in wanted:
            print(f"==== family {fam} ====")
            report["families"][fam] = RUNNERS[fam](workdir)

    real_manifests = {
        fam: rep["manifest"]
        for fam, rep in report["families"].items() if _is_real(rep)
    }
    # smoke configurations must not clobber the committed round artifacts
    out_path = os.path.join(
        REPO,
        f"QUALITY_{ROUND}.json" if real_manifests else "QUALITY_smoke.json")
    # merge over an existing report: an incremental single-family re-run
    # (e.g. QH_FAMILIES=twh with QH_SKIP_TRAIN) must not drop the other
    # family's section from the round artifact
    if os.path.exists(out_path):
        try:
            with open(out_path) as f:
                existing = json.load(f)
            if "families" in existing:
                merged = dict(existing["families"])
                merged.update(report["families"])
                report = {"families": merged}
        except (json.JSONDecodeError, KeyError):
            pass
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", out_path)

    if real_manifests:
        if os.environ.get("QH_NO_GATE_WRITE"):
            # stability/eval-only replays (e.g. a second run under a
            # different QH_NOISE_SEED for compare_quality_runs.py) score
            # and report but must not replace the SHIPPED gate or demo:
            # those stay tied to the committed round artifact
            print("QH_NO_GATE_WRITE set — shipped quality_gate.json and "
                  "DEMO left untouched")
        else:
            print("wrote", merge_gate_manifest(real_manifests))
            write_demo_md(report, workdir)
    for fam, rep in report["families"].items():
        reasons = rep.get("manifest", {}).get("collapse_reasons")
        if reasons:
            print(f"!! family {fam} baseline is COLLAPSED — manifest "
                  f"refused from the shipped gate: {'; '.join(reasons)}")
    skipped = sorted(set(report["families"]) - set(real_manifests))
    if skipped:
        print(f"families {skipped} ran in a smoke/collapsed configuration "
              "— NOT writing their shipped quality-gate sections (such "
              "models must not gate real serving)")


def write_demo_md(report: dict, workdir: str) -> None:
    """Render the convergence + quality artifact."""
    import platform

    lines = [
        f"# DEMO — full product loop, round {ROUND.lstrip('r').lstrip('0')}",
        "",
        "Produced by `scripts/quality_harness.py` in one command, for both",
        "model families: synthetic audio-synchronized corpus → real",
        "featurizers → `cli.train` (on-chip steps, loss curve below) →",
        "orbax checkpoint → compiled windowed sampler in every serving",
        f"mode × {SEED_REPS} independent noise replicates → `cli.eval`",
        "(FGD on a trained autoencoder embedding, diversity, beat",
        "alignment vs wav onsets) → family-keyed serving quality gate",
        "(`resources/quality_gate.json`, consumed by `cli.sample` and",
        "`cli.sample_beat`).",
        "",
        "FGD cells are mean ± sd over replicates. The fps column is the",
        f"ALL-STREAMS throughput of the {SEED_REPS}-replicate batched",
        "generation through the tunneled dev chip and is NOT a serving",
        "claim — headline serving numbers with variance come from",
        "`bench.py` (BENCH_*.json).",
        "",
    ]
    for fam, rep in report.get("families", {}).items():
        lines += [f"## Family `{fam}`", ""]
        if rep.get("train_wall_s"):
            lines.append(
                f"Training wall time: {rep['train_wall_s']} s for "
                f"{rep['train_steps']} steps on "
                f"{platform.node() or 'this host'} "
                f"(JAX backend: {_backend_name()}).")
            lines.append("")
        curve = rep.get("loss_curve") or []
        if curve:
            lines += ["### Loss curve (from the CSV sink)", "",
                      "| step | loss |", "|---|---|"]
            keep = curve if len(curve) <= 16 else (
                curve[:: max(1, len(curve) // 14)] + [curve[-1]])
            for s, l in keep:
                lines.append(f"| {s} | {l:.4f} |")
            first, last = curve[0][1], curve[-1][1]
            lines += ["", f"Loss fell {first:.4f} → {last:.4f} "
                      f"({(1 - last / first) * 100:.1f}% reduction).", ""]
        lines += ["### Serving modes vs ground truth", "",
                  "| mode | FGD (AE embedding) | diversity (gen/ref) | "
                  "beat align (gen/ref) | gen fps (all streams) |",
                  "|---|---|---|---|---|"]
        for name, m in rep.get("modes", {}).items():
            beat_ref = m.get("beat_alignment_reference")
            beat_ref_s = f"{beat_ref:.3f}" if beat_ref is not None else "—"
            lines.append(
                f"| {name} | {m['fgd']:.1f} ± {m.get('fgd_std', 0):.1f} | "
                f"{m['diversity_generated']:.2f}/"
                f"{m['diversity_reference']:.2f} | "
                f"{_nanf(m.get('beat_alignment')):.3f}/{beat_ref_s} | "
                f"{m.get('gen_frames_per_sec', 0)} |")
        man = rep.get("manifest", {})
        lines += ["", f"Gate: baseline `{man.get('baseline')}` "
                  f"(FGD {man.get('baseline_fgd', 0):.1f} ± "
                  f"{man.get('baseline_fgd_std', 0):.1f} over "
                  f"{man.get('seed_reps')} replicates), FGD-ratio "
                  f"tolerance {man.get('fgd_ratio_tolerance')} "
                  f"({man.get('tolerance_derivation', '')})."]
        if "baseline_diversity_vs_reference" in man:
            health = ("COLLAPSED — " + "; ".join(man["collapse_reasons"])
                      if man.get("collapsed") else "healthy")
            lines.append(
                f"Baseline health: diversity "
                f"{man['baseline_diversity_vs_reference']}× the reference "
                f"set's (floor {BASELINE_DIV_VS_REF_MIN}), "
                f"{man.get('baseline_outliers_dropped', 0)} baseline "
                f"outlier replicate(s) dropped → {health}.")
        for name, v in man.get("modes", {}).items():
            ci = v.get("fgd_ratio_ci95")
            ci_s = f" (95% CI {ci[0]}–{ci[1]})" if ci else ""
            drop_s = (f", {v['outliers_dropped']} outlier rep(s) dropped"
                      if v.get("outliers_dropped") else "")
            froz_s = (
                f", {v['frozen_draws']} FROZEN draw(s) (static pose, "
                f"min velocity retention "
                f"{v['velocity_retention_min']:.2f}×)"
                if v.get("frozen_draws") else "")
            lines.append(
                f"- `{name}`: ratio {v['fgd_ratio']}{ci_s}, diversity "
                f"{v['diversity_ratio_vs_baseline']}×{drop_s}{froz_s} → "
                f"{'OK' if v['ok'] else 'DEGRADED (refused by the CLI)'}")
        if rep.get("distill"):
            lines += ["", "Distillation stages: " + ", ".join(
                f"{d['teacher_steps']}→{d['teacher_steps'] // 2} "
                f"(loss {d['loss']:.4f})"
                for d in rep["distill"])]
        lines.append("")
    lines += ["A generated BVH from the ZEGGS baseline mode is committed "
              "at `docs/demo_zeggs_ddpm1000.bvh` (regenerated by the "
              "harness on every real run).", ""]
    path = os.path.join(REPO, f"DEMO_{ROUND}.md")
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
