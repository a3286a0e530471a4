"""Compare serving-gate verdicts across two quality-harness runs.

VERDICT r4 item 4's "done" bar: run the harness twice and every mode's
verdict must be identical. Generation noise is keyed by QH_NOISE_SEED,
so two runs with DIFFERENT seeds draw fully independent sample sets —
identical verdicts then demonstrate the gate statistics are stable under
seed noise, not merely deterministic replay.

  python scripts/compare_quality_runs.py QUALITY_r05.json QUALITY_r05_seed2.json

Prints a per-family, per-mode verdict table and exits non-zero when any
verdict differs.
"""
from __future__ import annotations

import json
import sys


def verdicts(report: dict) -> dict:
    """{family: {mode: ok_bool}} from a QUALITY_*.json."""
    out = {}
    fams = report.get("families", {"zeggs": report})
    for fam, rep in fams.items():
        man = rep.get("manifest", {})
        out[fam] = {"__collapsed__": bool(man.get("collapsed", False))}
        for mode, v in man.get("modes", {}).items():
            out[fam][mode] = bool(v["ok"])
    return out


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 2:
        print(__doc__)
        return 2
    with open(argv[0]) as f:
        a = verdicts(json.load(f))
    with open(argv[1]) as f:
        b = verdicts(json.load(f))

    mismatches = 0
    for fam in sorted(set(a) | set(b)):
        va, vb = a.get(fam, {}), b.get(fam, {})
        print(f"family {fam}:")
        for mode in sorted(set(va) | set(vb)):
            x, y = va.get(mode), vb.get(mode)
            same = x == y
            mismatches += 0 if same else 1
            def s(v):
                if v is None:
                    return "(absent)"
                if mode == "__collapsed__":
                    return "COLLAPSED" if v else "healthy"
                return "OK" if v else "DEGRADED"
            tag = "==" if same else (
                "!! MISSING RUN" if x is None or y is None else "!! MISMATCH")
            print(f"  {mode:24s} {s(x):>9s}  {s(y):>9s}  {tag}")
    print(f"\n{'IDENTICAL VERDICTS' if mismatches == 0 else str(mismatches) + ' verdict mismatch(es)'}"
          f" across the two runs")
    return 0 if mismatches == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
