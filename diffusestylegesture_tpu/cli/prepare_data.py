"""Dataset preparation CLI.

  python -m diffusestylegesture_tpu.cli.prepare_data --dataset ZEGGS \
      --source ./zeggs_raw --target ./data/zeggs_processed

Parity: `main/mydiffusion_zeggs/zeggs_data_to_lmdb.py` (ZEGGS) and the
BEAT/TWH builders (`process_BEAT_bvh.py:355-441`, `process_TWH_bvh.py:271-355`).
Loudness normalization (ffmpeg-normalize) stays an external pre-step as
in the reference.
"""
from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="DiffuseStyleGesture-TPU data prep")
    p.add_argument("--dataset", choices=["ZEGGS", "BEAT", "TWH"], required=True)
    p.add_argument("--source", required=True, help="dir with paired .wav/.bvh (+ .tsv)")
    p.add_argument("--target", required=True)
    p.add_argument("--fps", type=int, default=None)
    args = p.parse_args(argv)

    if args.dataset == "ZEGGS":
        from ..data import build_zeggs_dataset

        stats = build_zeggs_dataset(args.source, args.target, fps=args.fps or 20)
        print("mean/std written;", stats["mean"].shape)
    else:
        raise SystemExit(
            "BEAT/TWH preparation requires the dataset-specific BVH pipelines "
            "(pymo-style) — build the .h5 with "
            "diffusestylegesture_tpu.data.build_h5_dataset from your "
            "featurized clips; see data/h5_loader.py."
        )


if __name__ == "__main__":
    main()
