"""Gesture evaluation CLI.

The reference evaluated gesture quality externally (GENEA human eval;
its in-repo FID suite targets text-to-motion only and is unwired,
`main/eval/eval_humanml.py`). This CLI makes checkpoint comparison
automatic with the framework-native metrics:

  python -m diffusestylegesture_tpu.cli.eval \
      --generated gen_dir/ --reference ref_dir/ [--wav audio_dir/] \
      [--fps 20] [--window 40]

`--generated` / `--reference` accept a directory of `.npy` pose-feature
clips (T, D) or a single `.npy`. Reported:
  * FGD between windowed feature distributions (Fréchet distance over
    flattened `--window`-frame windows — the raw-feature FGD variant used
    when no trained embedding network is available),
  * diversity of both sets,
  * beat-alignment vs audio onsets when `--wav` is given (matched by
    filename stem),
  * velocity retention per stem-matched clip pair: mean |frame delta| of
    the generated clip over the reference clip on the same stem. A
    near-zero ratio is frozen motion — a failure mode FGD-with-outlier-
    rejection can mask (measured: distilled students emitting a static
    pose on ~10% of noise draws still averaged within FGD tolerance).
Prints one JSON line.
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np

from ..eval.metrics import beat_alignment, diversity, frechet_distance


def load_clips(path: str):
    if os.path.isdir(path):
        files = sorted(f for f in os.listdir(path) if f.endswith(".npy"))
        return {f[:-4]: np.load(os.path.join(path, f)) for f in files}
    return {os.path.basename(path)[:-4]: np.load(path)}


def windowed_features(clips, window: int, stride: int):
    """{name: (T, D)} → (N, window*D) stacked windows."""
    rows = []
    for arr in clips.values():
        arr = np.asarray(arr, np.float32)
        for s in range(0, max(1, len(arr) - window + 1), stride):
            w = arr[s : s + window]
            if len(w) == window:
                rows.append(w.reshape(-1))
    if not rows:
        raise SystemExit(f"no complete {window}-frame windows found")
    return np.stack(rows)


def main(argv=None):
    p = argparse.ArgumentParser(description="gesture metrics (FGD etc.)")
    p.add_argument("--generated", required=True)
    p.add_argument("--reference", required=True)
    p.add_argument("--wav", default=None, help="dir of wavs matched by stem")
    p.add_argument("--fps", type=float, default=20.0)
    p.add_argument("--window", type=int, default=40)
    p.add_argument("--stride", type=int, default=20)
    p.add_argument("--sigma", type=float, default=0.1)
    p.add_argument("--embedding", choices=["raw", "autoencoder"], default="raw",
                   help="FGD feature space: raw windows, or the latent of an "
                        "autoencoder trained on the reference set (Yoon et "
                        "al. 2020 convention)")
    p.add_argument("--ae_steps", type=int, default=500)
    p.add_argument("--ae_latent", type=int, default=128)
    p.add_argument("--ae_cache", default=None,
                   help="directory to save/load the trained autoencoder "
                        "params: repeated evals against the SAME reference "
                        "set (e.g. the quality harness scoring many serving "
                        "modes) train the embedding once and share one "
                        "latent space. Do not reuse across different "
                        "reference sets/window sizes")
    p.add_argument("--frozen_vel_ratio", type=float, default=0.25,
                   help="a generated clip whose mean |frame delta| falls "
                        "below this fraction of its stem-matched reference "
                        "clip's counts as frozen motion (healthy samples "
                        "measure >=0.8, collapsed ones ~0.1)")
    p.add_argument("--kid", action="store_true",
                   help="also report KID (polynomial-MMD) and improved "
                        "precision/recall over the same feature space "
                        "(the reference's unconstrained-eval metrics)")
    args = p.parse_args(argv)

    gen = load_clips(args.generated)
    ref = load_clips(args.reference)

    gf = windowed_features(gen, args.window, args.stride)
    rf = windowed_features(ref, args.window, args.stride)

    if args.embedding == "raw" and rf.shape[1] > 8192:
        # raw windows of real gesture features (e.g. 40×1141 = 45,640-d)
        # exceed what covariance-based FGD can handle (`frechet_distance`
        # guard); train the embedding instead of dying on the default args
        import sys

        print(f"note: raw {rf.shape[1]}-d windows exceed the covariance-FGD "
              "limit — switching to --embedding autoencoder",
              file=sys.stderr)
        args.embedding = "autoencoder"

    if args.embedding == "autoencoder":
        from ..eval.embedding import AEConfig, embed_windows, train_autoencoder

        D = next(iter(ref.values())).shape[1]
        cfg = AEConfig(window=args.window, feat_dim=D, latent=args.ae_latent)
        rw = rf.reshape(-1, args.window, D)
        gw = gf.reshape(-1, args.window, D)
        params = None
        if args.ae_cache:
            import orbax.checkpoint as ocp

            # key the cache by the AE configuration: a smoke run's
            # 50-step AE must not be silently restored by a later real
            # run in the same directory (different training budget =
            # different latent space = different FGD scale)
            cache_path = os.path.abspath(os.path.join(
                args.ae_cache,
                f"ae_params_w{args.window}_l{args.ae_latent}"
                f"_s{args.ae_steps}"))
            if os.path.exists(cache_path):
                try:
                    params = ocp.StandardCheckpointer().restore(cache_path)
                except ValueError:
                    # cross-platform: a TPU-process-saved cache records
                    # TPU shardings that don't resolve under
                    # JAX_PLATFORMS=cpu — re-read as host numpy
                    import jax

                    ckptr = ocp.PyTreeCheckpointer()
                    meta = ckptr.metadata(cache_path)
                    meta_tree = getattr(meta, "item_metadata", meta)
                    restore_args = jax.tree_util.tree_map(
                        lambda _: ocp.RestoreArgs(restore_type=np.ndarray),
                        getattr(meta_tree, "tree", meta_tree))
                    params = ckptr.restore(cache_path,
                                           restore_args=restore_args)
        if params is None:
            params, _ = train_autoencoder(rw, cfg, num_steps=args.ae_steps)
            if args.ae_cache:
                ckptr = ocp.StandardCheckpointer()
                ckptr.save(cache_path, params)
                ckptr.wait_until_finished()
        gf = embed_windows(params, cfg, gw)
        rf = embed_windows(params, cfg, rw)

    # velocity retention over stem-matched pairs (independent of the
    # embedding space: computed on the raw pose features)
    vel_ratios = {}
    for name, motion in gen.items():
        if name not in ref or len(motion) < 2 or len(ref[name]) < 2:
            continue
        rv = float(np.abs(np.diff(np.asarray(ref[name], np.float64),
                                  axis=0)).mean())
        gv = float(np.abs(np.diff(np.asarray(motion, np.float64),
                                  axis=0)).mean())
        vel_ratios[name] = gv / max(rv, 1e-12)
    frozen = sorted(n for n, r in vel_ratios.items()
                    if r < args.frozen_vel_ratio)

    out = {
        "fgd": frechet_distance(gf, rf),
        "embedding": args.embedding,
        "diversity_generated": diversity(gf, min(300, len(gf) * 2)),
        "diversity_reference": diversity(rf, min(300, len(rf) * 2)),
        "n_windows_generated": int(len(gf)),
        "n_windows_reference": int(len(rf)),
        "velocity_retention_min": (min(vel_ratios.values())
                                   if vel_ratios else None),
        "velocity_retention_mean": (float(np.mean(list(vel_ratios.values())))
                                    if vel_ratios else None),
        "velocity_clips_matched": len(vel_ratios),
        "frozen_clips": len(frozen),
        "frozen_clip_stems": frozen,
    }

    if args.kid:
        from ..eval.unconstrained import kid, precision_and_recall

        n = min(len(gf), len(rf))
        kid_mean, kid_std = kid(rf, gf, n_subsets=100,
                                subset_size=min(1000, n))
        precision, recall = precision_and_recall(gf, rf)
        out.update(kid_mean=kid_mean, kid_std=kid_std,
                   precision=precision, recall=recall)

    if args.wav:
        from ..audio.features import detect_onsets
        from ..data.zeggs import load_wav_16k

        def _score_set(clips):
            scores = []
            for name, motion in clips.items():
                wav_path = os.path.join(args.wav, name + ".wav")
                if not os.path.exists(wav_path):
                    continue
                onsets = detect_onsets(load_wav_16k(wav_path))
                s = beat_alignment(motion, onsets, args.fps, sigma=args.sigma)
                if np.isfinite(s):
                    scores.append(s)
            return scores

        scores = _score_set(gen)
        out["beat_alignment"] = float(np.mean(scores)) if scores else None
        out["beat_alignment_clips"] = len(scores)
        # ground-truth anchor: the REFERENCE set's own beat alignment on
        # the same audio — without it the generated score has no absolute
        # scale (the metric's ceiling depends on corpus stroke sharpness)
        ref_scores = _score_set(ref)
        out["beat_alignment_reference"] = (
            float(np.mean(ref_scores)) if ref_scores else None)

    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
