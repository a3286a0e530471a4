"""Checkpoint conversion CLI: reference .pt → orbax directory.

  python -m diffusestylegesture_tpu.cli.convert_ckpt --kind zeggs \
      --src model000450000.pt --dst ./checkpoints/zeggs_450k
  python -m diffusestylegesture_tpu.cli.convert_ckpt --kind wavlm \
      --src WavLM-Large.pt --dst ./checkpoints/wavlm_large
"""
from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser(description="torch → orbax checkpoint converter")
    p.add_argument("--kind", choices=["zeggs", "beat_twh", "wavlm"], required=True)
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    p.add_argument("--num_layers", type=int, default=8)
    args = p.parse_args(argv)

    import orbax.checkpoint as ocp

    from ..models import convert

    if args.kind == "wavlm":
        import dataclasses
        import json

        from ..models.wavlm import load_wavlm_checkpoint

        cfg, params = load_wavlm_checkpoint(args.src)
        # persist the architecture next to the params — without it the
        # orbax dir cannot be restored (defaults describe WavLM-Base, not
        # whatever this checkpoint is)
        os.makedirs(os.path.abspath(args.dst) + ".meta", exist_ok=True)
        with open(os.path.join(os.path.abspath(args.dst) + ".meta",
                               "wavlm_config.json"), "w") as f:
            json.dump(dataclasses.asdict(cfg), f, indent=1, default=str)
        print("WavLM config:", cfg)
    else:
        sd = convert.load_torch_checkpoint(args.src)
        fn = (
            convert.convert_mdm_zeggs
            if args.kind == "zeggs"
            else convert.convert_mdm_beat_twh
        )
        params = {"params": fn(sd, args.num_layers)}

    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.abspath(args.dst), params)
    ckpt.wait_until_finished()
    print("wrote", args.dst)


if __name__ == "__main__":
    main()
