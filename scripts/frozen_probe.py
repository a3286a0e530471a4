"""High-replicate frozen-draw stability probe for GATE-OK serving modes.

The r5 quality gate refuses any mode with a frozen (static-pose) draw;
the shipped-OK fast modes (distill3/distill7/dpmpp5) showed 0 frozen in
2 x 40 draws during the harness runs (seeds 123456 and 777). 80 draws
bounds the per-draw freeze probability only to <~4.5% at 95%; this
probe pushes the census to hundreds of draws per mode under a THIRD
independent noise seed, using only the cheap velocity-retention
detector (no FGD/AE embedding) so generation is the only cost.

Reads the quality-harness workdir: teacher checkpoint, the per-stage
distilled-student cache written by scripts/quality_harness.py
(distill_students/stage{N}.npz — verified bit-identical across both
harness runs: same fixed distillation PRNG), eval clips and reference
features. Replicates are generated in chunks of QH_SEED_REPS batch rows
so the engine shapes (and the persistent compile cache) match the
harness runs exactly.

Emits one JSON line per mode into FROZEN_PROBE.jsonl (truncated at
start — no stale-row mixing), plus a Clopper-Pearson 95% upper bound
on the per-draw freeze probability.

Env: FP_WORKDIR (default .quality_harness_seed2 — the workdir holding
distill_students/), FP_REPS (default 64, rounded up to a multiple of
QH_SEED_REPS=8), FP_SEED (default 4242), FP_MODES (default
"distill3,distill7,dpmpp5"), FP_FROZEN_RATIO (default 0.25 — matches
cli.eval --frozen_vel_ratio).
"""
from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_spec = importlib.util.spec_from_file_location(
    "quality_harness", os.path.join(REPO, "scripts", "quality_harness.py"))
qh = importlib.util.module_from_spec(_spec)
sys.modules.setdefault("quality_harness", qh)
_spec.loader.exec_module(qh)

WORKDIR = os.environ.get(
    "FP_WORKDIR", os.path.join(REPO, ".quality_harness_seed2"))
REPS = int(os.environ.get("FP_REPS", "64"))
SEED = int(os.environ.get("FP_SEED", "4242"))
MODES = [m.strip() for m in os.environ.get(
    "FP_MODES", "distill3,distill7,dpmpp5").split(",") if m.strip()]
FROZEN_RATIO = float(os.environ.get("FP_FROZEN_RATIO", "0.25"))
CHUNK = qh.SEED_REPS  # batch rows per compiled call — harness shapes


def _load_student(path: str, template):
    import jax

    data = np.load(path)
    treedef = jax.tree_util.tree_structure(template)
    return jax.tree_util.tree_unflatten(
        treedef, [data[f"a{i}"] for i in range(len(data.files))])


def _upper95(frozen: int, draws: int) -> float:
    """Clopper-Pearson one-sided 95% upper bound on the freeze rate."""
    from scipy.stats import beta

    if frozen >= draws:
        return 1.0
    return float(beta.ppf(0.95, frozen + 1, draws - frozen))


def main() -> int:
    import jax

    from diffusestylegesture_tpu import diffusion as D
    from diffusestylegesture_tpu.cli.sample import load_orbax_params
    from diffusestylegesture_tpu.data import load_wav_16k
    from diffusestylegesture_tpu.models.mdm import MDM, MDMConfig
    from diffusestylegesture_tpu.motion import zeggs_features as zf
    from diffusestylegesture_tpu.sample import ZeggsEngineConfig, ZeggsSampler
    from diffusestylegesture_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    eval_src = os.path.join(WORKDIR, "eval_src")
    data_dir = os.path.join(WORKDIR, "prepared")
    ref_dir = os.path.join(WORKDIR, "ref_feats")
    students_dir = os.path.join(WORKDIR, "distill_students")

    mean = np.load(os.path.join(data_dir, "mean.npz"))["mean"]
    std = np.load(os.path.join(data_dir, "std.npz"))["std"]
    teacher = load_orbax_params(os.path.join(WORKDIR, "ckpt"))
    wavlm_jax, _, _ = qh.make_pseudo_wavlm()

    mcfg = dict(latent_dim=128, ff_size=128, num_layers=2) if qh.SMALL \
        else dict(latent_dim=256, ff_size=1024, num_layers=8)
    model = MDM(MDMConfig(n_seed=qh.N_SEED, cond_mask_prob=0.1, **mcfg))

    def model_apply(p, x, t, cond, uncond=None):
        return model.apply(p, x, t, cond, uncond=uncond)

    betas = D.named_beta_schedule("cosine", qh.DIFFUSION_STEPS)

    # resolve each requested mode to (params, schedule, sampler)
    resolved = {}
    for mode in MODES:
        if mode.startswith("distill") and mode[len("distill"):].isdigit():
            from diffusestylegesture_tpu.train.distill import student_schedule

            target = int(mode[len("distill"):])
            sched, nt, stage = D.Schedule.create(betas), qh.DIFFUSION_STEPS, 0
            while nt > target:
                sched = student_schedule(sched, betas)
                nt //= 2
                stage += 1
            if nt != target:
                raise SystemExit(f"{mode}: {target} not on the halving chain")
            npz = os.path.join(students_dir, f"stage{stage}.npz")
            if not os.path.exists(npz):
                raise SystemExit(
                    f"{mode}: no cached student at {npz} — run the quality "
                    "harness (with the student cache) first")
            resolved[mode] = (_load_student(npz, teacher), sched, "ddim")
        else:
            for samp in ("dpmpp", "ddim"):
                if mode.startswith(samp) and mode[len(samp):].isdigit():
                    n = int(mode[len(samp):])
                    resolved[mode] = (
                        teacher,
                        D.spaced_schedule(
                            betas,
                            D.space_timesteps(qh.DIFFUSION_STEPS,
                                              f"ddim{n}")),
                        samp)
                    break
            else:
                raise SystemExit(f"unrecognized mode {mode!r}")

    eval_wavs = sorted(f for f in os.listdir(eval_src) if f.endswith(".wav"))
    ref_vel = {}
    for f in eval_wavs:
        stem = f[:-4]
        r = np.load(os.path.join(ref_dir, stem + ".npy"))
        ref_vel[stem] = float(np.abs(np.diff(r, axis=0)).mean())

    chunks = -(-REPS // CHUNK)
    draws_per_mode = chunks * CHUNK * len(eval_wavs)
    out_path = os.path.join(REPO, "FROZEN_PROBE.jsonl")
    open(out_path, "w").close()

    for mode, (params, sched, sampler_name) in resolved.items():
        sampler = ZeggsSampler(model_apply, wavlm_jax, sched,
                               ZeggsEngineConfig(sampler=sampler_name))
        frozen, retentions = [], []
        t0 = time.time()
        for ci, f in enumerate(eval_wavs):
            stem = f[:-4]
            audio = load_wav_16k(os.path.join(eval_src, f))
            style = np.tile(zf.style_onehot(stem.split("_")[1])[None],
                            (CHUNK, 1))
            for chunk in range(chunks):
                key = jax.random.fold_in(
                    jax.random.fold_in(jax.random.PRNGKey(SEED), ci), chunk)
                out = sampler.generate(params, None, audio, style, key,
                                       mean=mean, std=std)
                for r in range(CHUNK):
                    v = float(np.abs(np.diff(out[r], axis=0)).mean())
                    ratio = v / max(ref_vel[stem], 1e-12)
                    retentions.append(ratio)
                    if ratio < FROZEN_RATIO:
                        frozen.append(
                            {"clip": stem, "chunk": chunk, "rep": r,
                             "retention": round(ratio, 4)})
            print(f"  {mode} clip {stem}: {chunks * CHUNK} draws, "
                  f"{len(frozen)} frozen so far", flush=True)
        row = {
            "mode": mode, "sampler": sampler_name,
            "nfe": int(sched.num_timesteps),
            "noise_seed": SEED, "frozen_ratio_threshold": FROZEN_RATIO,
            "draws": draws_per_mode, "frozen": len(frozen),
            "frozen_detail": frozen,
            "min_retention": round(min(retentions), 4),
            "freeze_rate_upper95": round(
                _upper95(len(frozen), draws_per_mode), 5),
            "wall_s": round(time.time() - t0, 1),
        }
        with open(out_path, "a") as fh:
            fh.write(json.dumps(row) + "\n")
        print(json.dumps({k: row[k] for k in (
            "mode", "draws", "frozen", "min_retention",
            "freeze_rate_upper95")}), flush=True)
    print("wrote", out_path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
