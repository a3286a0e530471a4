"""Dataset preparation CLI.

  python -m diffusestylegesture_tpu.cli.prepare_data --dataset ZEGGS \
      --source ./zeggs_raw --target ./data/zeggs_processed

Parity: `main/mydiffusion_zeggs/zeggs_data_to_lmdb.py` (ZEGGS) and the
BEAT/TWH builders (`process_BEAT_bvh.py:355-441`, `process_TWH_bvh.py:271-355`).
Loudness normalization: the reference shells out to `ffmpeg-normalize`;
here `--normalize_loudness` runs a native EBU R128 (BS.1770-4) pass
(`audio/loudness.py`) — or keep normalizing externally and omit the flag.
"""
from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="DiffuseStyleGesture-TPU data prep")
    p.add_argument("--dataset", choices=["ZEGGS", "BEAT", "TWH"], required=True)
    p.add_argument("--source", required=True,
                   help="dir with paired .wav/.bvh (+ .tsv for BEAT/TWH)")
    p.add_argument("--target", required=True,
                   help="ZEGGS: output dir; BEAT/TWH: output .h5 path")
    p.add_argument("--fps", type=int, default=None)
    p.add_argument("--word_vectors", default=None,
                   help="fastText .vec path (BEAT/TWH); zeros used if absent")
    p.add_argument("--metadata", default=None, help="GENEA metadata csv (TWH)")
    p.add_argument("--num_speakers", type=int, default=17)
    p.add_argument("--wavlm_path", default=None)
    p.add_argument("--workers", type=int, default=0,
                   help="parallelize per-clip featurization over N processes "
                        "(identical output to serial; BEAT/TWH WavLM stays a "
                        "serial device pass in the parent)")
    p.add_argument("--normalize_loudness", action="store_true",
                   help="ZEGGS: native EBU R128 normalization to -23 LUFS "
                        "(replaces the reference's external ffmpeg-normalize "
                        "pre-step)")
    args = p.parse_args(argv)

    if args.dataset == "ZEGGS":
        from ..data import build_zeggs_dataset

        stats = build_zeggs_dataset(args.source, args.target, fps=args.fps or 20,
                                    workers=args.workers,
                                    loudnorm=args.normalize_loudness)
        print("mean/std written;", stats["mean"].shape)
        return

    prepare_beat_twh(args)


def prepare_beat_twh(args):
    """BEAT/TWH: (bvh, wav, tsv)+ → one .h5 + mean/std npys.

    Parity flow: `process_BEAT_bvh.make_gesture_dataset:355-441` /
    `process_TWH_bvh.prepare_data:271-355` + `calculate_gesture_statistics`.
    """
    import glob
    import os

    import numpy as np

    from ..data import build_h5_dataset, load_wav_16k
    from ..data.beat_twh import build_beat_twh_clip, load_metadata
    from ..data.h5_loader import gesture_statistics
    from ..data.text import load_word_vectors

    w2v = {}
    parallel = bool(args.workers and args.workers > 1)
    if args.word_vectors:
        # always touch the table once here so the npz cache exists; in
        # parallel mode free it again — each worker loads from the cache,
        # and keeping a parent copy would double the footprint
        w2v = load_word_vectors(args.word_vectors, cache=args.word_vectors + ".npz")
        if parallel:
            w2v = {}

    meta = None
    if args.metadata:
        _, meta, _ = load_metadata(args.metadata)

    wavlm_fn = None
    wparams = None
    if args.wavlm_path and os.path.exists(args.wavlm_path):
        import jax

        from ..models.wavlm import WavLM, load_wavlm_checkpoint, make_twh_wavlm_fn

        wcfg, wparams = load_wavlm_checkpoint(args.wavlm_path)
        raw_fn = make_twh_wavlm_fn(WavLM(wcfg))
        wavlm_fn = jax.jit(raw_fn)

    tasks = []
    for bvh_path in sorted(glob.glob(os.path.join(args.source, "*.bvh"))):
        name = os.path.splitext(os.path.basename(bvh_path))[0]
        wav_path = os.path.join(args.source, name + ".wav")
        tsv_path = os.path.join(args.source, name + ".tsv")
        if not (os.path.exists(wav_path) and os.path.exists(tsv_path)):
            print("skip (missing wav/tsv):", name)
            continue
        if args.dataset == "TWH" and meta is not None and name in meta:
            _, speaker_id = meta[name]
        elif args.dataset == "BEAT":
            # BEAT filenames are 1-based ('2_scott_...'); normalize to
            # 0-based slots like the reference's TWH metadata handling
            # (`process_TWH_bvh.py:250`, `int(id) - 1`) so
            # --num_speakers 30 covers speakers 1..30 exactly
            speaker_id = int(name.split("_")[0]) - 1
        else:
            speaker_id = 0
        if not 0 <= speaker_id < args.num_speakers:
            # fail with the real constraint: a silent `% num_speakers`
            # alias would merge different speakers' identity conditioning
            # (and an unvalidated TWH metadata id would IndexError later)
            raise SystemExit(
                f"{name}: speaker slot {speaker_id} outside "
                f"--num_speakers {args.num_speakers} (BEAT names are "
                "1-based) — raise --num_speakers to cover the corpus")
        onehot = np.zeros(args.num_speakers, np.float32)
        onehot[speaker_id] = 1
        wavlm_feats = None
        if wavlm_fn is not None:
            # device pass stays serial in the parent (one TPU client)
            import jax.numpy as jnp

            wavlm_feats = np.asarray(wavlm_fn(wparams, jnp.asarray(load_wav_16k(wav_path))))
        tasks.append((bvh_path, wav_path, tsv_path, onehot, args.dataset, wavlm_feats, name))

    if parallel and tasks:  # pool even for one task: the parent freed w2v
        import multiprocessing as mp
        from concurrent.futures import ProcessPoolExecutor

        with ProcessPoolExecutor(
            max_workers=args.workers, mp_context=mp.get_context("spawn"),
            initializer=_bt_worker_init, initargs=(args.word_vectors,),
        ) as ex:
            clips = list(ex.map(_bt_clip_worker, tasks))
    else:
        global _BT_W2V
        _BT_W2V = w2v
        clips = [_bt_clip_worker(t) for t in tasks]
    for t in tasks:
        print("processed:", t[-1])

    if not clips:
        raise SystemExit("no usable (bvh, wav, tsv) triples found")
    build_h5_dataset(args.target, clips)
    mean, std = gesture_statistics(args.target)
    root = os.path.splitext(args.target)[0]
    np.save(root + "_mean.npy", mean)
    np.save(root + "_std.npy", std)
    print(f"wrote {args.target} ({len(clips)} clips), mean/std {mean.shape}")


_BT_W2V = {}


def _bt_worker_init(word_vectors_path):
    """Spawn-worker init: pin JAX to CPU and load the (cached) word-vector
    table once per worker — it is far too large to pickle per task."""
    import os as _os

    _os.environ["JAX_PLATFORMS"] = "cpu"
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")
    global _BT_W2V
    if word_vectors_path:
        from ..data.text import load_word_vectors

        _BT_W2V = load_word_vectors(word_vectors_path,
                                    cache=word_vectors_path + ".npz")
    else:
        _BT_W2V = {}


def _bt_clip_worker(task):
    from ..data import load_wav_16k
    from ..data.beat_twh import build_beat_twh_clip

    bvh_path, wav_path, tsv_path, onehot, dataset, wavlm_feats, _name = task
    wav = load_wav_16k(wav_path)
    return build_beat_twh_clip(bvh_path, wav, 16000, tsv_path, _BT_W2V, onehot,
                               dataset=dataset, wavlm_features=wavlm_feats)


if __name__ == "__main__":
    main()
