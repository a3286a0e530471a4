"""Released-checkpoint validation, ready for the day the artifacts exist.

The real released weights (`model000450000.pt`, `WavLM-Large.pt` —
`/root/reference/README.md:51`) are not present in this image, so the
converter + e2e harness have only ever been proven on random-weight
reference modules.  This script is the one-command validation to run the
moment they arrive:

  python scripts/validate_real_ckpt.py \
      --ckpt model000450000.pt --wavlm WavLM-Large.pt \
      --wav 015_Happy_4_x_1_0.wav --data_dir <dir with mean.npz/std.npz> \
      [--ref_bvh reference_output.bvh] [--max_len 320]

It converts the torch checkpoints, runs the compiled windowed sampler
(the same path as `cli.sample`, i.e. the reference demo route
`main/mydiffusion_zeggs/sample.py:341-384`), writes a BVH, and — if a
reference-produced BVH is supplied — parses both and prints per-channel
comparison statistics (rotation RMSE in degrees, root-position RMSE,
frame-count match).  Exact RNG parity with torch is impossible (SURVEY
§7 hard-part 2), so treat the comparison as distributional: expect small
root drift and visually identical gestures, not bitwise equality.

Exits non-zero with a clear message when an artifact is missing, so CI
can gate on file existence (`tests/test_validate_real_ckpt.py`).
"""
from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def compare_bvh(ours_path: str, ref_path: str) -> dict:
    """Parse two BVH files and report comparison statistics."""
    import numpy as np

    from diffusestylegesture_tpu.motion import bvh

    ours, ref = bvh.load(ours_path), bvh.load(ref_path)
    stats: dict = {
        "frames_ours": int(ours["rotations"].shape[0]),
        "frames_ref": int(ref["rotations"].shape[0]),
        "joints_ours": int(ours["rotations"].shape[1]),
        "joints_ref": int(ref["rotations"].shape[1]),
    }
    n = min(stats["frames_ours"], stats["frames_ref"])
    j = min(stats["joints_ours"], stats["joints_ref"])
    if n and j:
        dr = ours["rotations"][:n, :j] - ref["rotations"][:n, :j]
        # euler channels wrap at 360
        dr = (dr + 180.0) % 360.0 - 180.0
        stats["rot_rmse_deg"] = float(np.sqrt(np.mean(dr**2)))
        stats["rot_max_deg"] = float(np.max(np.abs(dr)))
        dp = ours["positions"][:n, 0] - ref["positions"][:n, 0]
        stats["root_pos_rmse"] = float(np.sqrt(np.mean(dp**2)))
    return stats


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--ckpt", default="model000450000.pt",
                   help="released ZEGGS denoiser checkpoint (.pt)")
    p.add_argument("--wavlm", default="WavLM-Large.pt",
                   help="released WavLM-Large checkpoint (.pt)")
    p.add_argument("--wav", required=True, help="16 kHz input wav")
    p.add_argument("--data_dir", required=True,
                   help="directory containing mean.npz / std.npz")
    p.add_argument("--config", default=os.path.join(REPO, "configs", "zeggs.yml"))
    p.add_argument("--ref_bvh", default=None,
                   help="BVH produced by the torch reference on the same "
                        "wav, for comparison stats")
    p.add_argument("--max_len", type=int, default=320)
    p.add_argument("--style", default=None)
    p.add_argument("--save_dir", default="./validate_real_ckpt_out")
    p.add_argument("--seed", type=int, default=123456)
    p.add_argument("--sampler", default=None,
                   help="pass through to cli.sample (ddpm default)")
    p.add_argument("--respace", type=int, default=0,
                   help="pass through to cli.sample (few-step serving; "
                        "the dry-run CI test uses this to keep the "
                        "1000-step loop off the CPU backend)")
    p.add_argument("--allow_degraded", action="store_true",
                   help="pass through to cli.sample (ungated modes)")
    args = p.parse_args(argv)

    for path, what in [(args.ckpt, "denoiser checkpoint"),
                       (args.wavlm, "WavLM checkpoint"),
                       (args.wav, "input wav"),
                       (os.path.join(args.data_dir, "mean.npz"), "dataset mean"),
                       (os.path.join(args.data_dir, "std.npz"), "dataset std")]:
        if not os.path.exists(path):
            print(f"MISSING {what}: {path}", file=sys.stderr)
            print("This script validates the real released artifacts; place "
                  "them at the given paths and re-run.", file=sys.stderr)
            return 2

    # Reuse the product CLI end to end — this validation must exercise the
    # exact code path a user would run, not a parallel re-implementation.
    from diffusestylegesture_tpu.cli import sample as sample_cli
    from diffusestylegesture_tpu.config import load_yaml_config

    cfg = load_yaml_config(args.config)
    # Config is attribute-style (SimpleNamespace); item assignment raised
    # TypeError — caught by the full-size dry run this script had never
    # had until round 5 (tests/test_real_ckpt_dryrun.py)
    cfg.wavlm_path = args.wavlm
    cfg.data_dir = args.data_dir
    patched = os.path.join(args.save_dir, "_validate_cfg.yml")
    os.makedirs(args.save_dir, exist_ok=True)
    import yaml

    with open(patched, "w") as f:
        yaml.safe_dump(cfg.to_dict(), f)

    argv_cli = [
        "--config", patched, "--model_path", args.ckpt,
        "--audiowavlm_path", args.wav, "--max_len", str(args.max_len),
        "--seed", str(args.seed), "--save_dir", args.save_dir,
    ]
    if args.style:
        argv_cli += ["--style", args.style]
    if args.sampler:
        argv_cli += ["--sampler", args.sampler]
    if args.respace:
        argv_cli += ["--respace", str(args.respace)]
    if args.allow_degraded:
        argv_cli += ["--allow_degraded"]
    print("running cli.sample", " ".join(argv_cli))
    before = set(os.listdir(args.save_dir))
    sample_cli.main(argv_cli)
    new_bvh = [f for f in set(os.listdir(args.save_dir)) - before
               if f.endswith(".bvh")]
    if not new_bvh:
        print("FAIL: cli.sample produced no BVH", file=sys.stderr)
        return 1
    out_path = os.path.join(args.save_dir, sorted(new_bvh)[-1])
    print("generated", out_path)

    if args.ref_bvh:
        if not os.path.exists(args.ref_bvh):
            print(f"MISSING reference BVH: {args.ref_bvh}", file=sys.stderr)
            return 2
        stats = compare_bvh(out_path, args.ref_bvh)
        print("comparison vs reference BVH:")
        for k, v in stats.items():
            print(f"  {k}: {v}")
        ok = (stats["frames_ours"] == stats["frames_ref"]
              and stats["joints_ours"] == stats["joints_ref"])
        print("STRUCTURE", "OK" if ok else "MISMATCH")
        return 0 if ok else 1
    print("no --ref_bvh given; structural validation only: OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
