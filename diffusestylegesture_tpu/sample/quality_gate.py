"""Motion-quality gate for fast-serving modes.

The framework ships samplers far faster than the reference's DDPM-1000
(ddim100, DPM-Solver++ few-step, progressive distillation). Speed is
gated on *numeric* deviation at the bench (`bench.py` bf16 gates), but
the reference's entire value proposition is gesture quality
(`/root/reference/README.md:3`, human-eval ≈ ground truth) — so the
few-step modes additionally carry a MOTION-QUALITY gate: an in-env
harness (`scripts/quality_harness.py`) trains a real MDM on structured
audio-synchronized data, generates with each serving mode, and scores
FGD (autoencoder embedding, Yoon et al. 2020 convention), diversity and
beat alignment against ground truth, with DDPM-1000 as the baseline.

The harness writes its verdicts to `resources/quality_gate.json`; the
sampling CLI consults it and refuses a mode whose FGD degraded beyond
tolerance — or whose sample diversity collapsed below the retention
floor; FGD alone cannot see mode collapse (measured: a 7-step distilled
student at FGD ratio 1.09 with 0.8% of baseline diversity) — in the
harness (override with --allow_degraded). Modes the harness never
measured pass with a note — the gate protects against *measured*
regressions, it does not guess.
"""
from __future__ import annotations

import json
import os
from typing import Optional, Tuple

MANIFEST_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "resources", "quality_gate.json",
)


def mode_key(sampler: str, respace: int, diffusion_steps: int) -> Optional[str]:
    """Serving-mode key for the manifest; None = the ungated baseline
    (full-schedule ancestral sampling, the reference configuration)."""
    if sampler == "ddpm" and not respace:
        return None
    return f"{sampler}{respace or diffusion_steps}"


def load_manifest(path: Optional[str] = None,
                  family: str = "zeggs") -> Optional[dict]:
    """Family-resolved manifest section.

    v2 manifests are family-keyed (``{"families": {"zeggs": {...},
    "twh": {...}}}``) so the ZEGGS MDM and the BEAT/TWH MDM+ carry
    separate harness verdicts; a v1 (flat) manifest is the ZEGGS section
    by definition — the round-3 harness only ever measured that family."""
    path = path or MANIFEST_PATH
    if not os.path.exists(path):
        return None
    with open(path) as f:
        raw = json.load(f)
    if "families" in raw:
        return raw["families"].get(family.lower())
    return raw if family.lower() == "zeggs" else None


def check_mode(
    sampler: str,
    respace: int,
    diffusion_steps: int,
    manifest: Optional[dict] = None,
    family: str = "zeggs",
) -> Tuple[str, str]:
    """→ (status, message); status ∈ {"baseline", "ok", "degraded", "unknown"}."""
    key = mode_key(sampler, respace, diffusion_steps)
    if key is None:
        return "baseline", "full-schedule DDPM (reference configuration)"
    return check_key(key, manifest, diffusion_steps=diffusion_steps,
                     family=family)


def check_key(key: str, manifest: Optional[dict] = None, *,
              diffusion_steps: Optional[int] = None,
              family: str = "zeggs") -> Tuple[str, str]:
    """Gate an explicit manifest key (e.g. ``distill15`` for a
    progressively distilled student checkpoint, whose mode name is not
    derivable from sampler/respace flags alone).

    ``diffusion_steps`` (when known) must match the base schedule the
    manifest was measured against: mode keys like ``ddim100`` collide
    across base schedules (full-schedule DDIM on a 100-step config vs
    the 1000→100 respacing the harness measured), so a mismatched
    baseline means no verdict, not a borrowed one — the same guard
    bench.py applies before letting a gated mode carry the headline."""
    manifest = manifest if manifest is not None else load_manifest(
        family=family)
    if manifest is None:
        return "unknown", (
            f"serving mode {key!r} has no quality manifest for the "
            f"{family!r} family (run scripts/quality_harness.py to "
            "generate one)")
    base = manifest.get("baseline")
    if (diffusion_steps is not None and base is not None
            and base != f"ddpm{diffusion_steps}"):
        return "unknown", (
            f"quality manifest was measured against {base}, not this "
            f"config's ddpm{diffusion_steps} base schedule — mode "
            f"{key!r} has no applicable verdict (re-run "
            "scripts/quality_harness.py at this schedule)")
    entry = manifest.get("modes", {}).get(key)
    if entry is None:
        return "unknown", (
            f"serving mode {key!r} not measured by the quality harness "
            f"(measured: {sorted(manifest.get('modes', {}))})")
    if entry.get("ok", False):
        return "ok", (
            f"quality gate OK for {key}: FGD ratio vs DDPM-1000 "
            f"{entry.get('fgd_ratio', float('nan')):.2f} "
            f"(tolerance {manifest.get('fgd_ratio_tolerance')})")
    reasons = []
    fgd_tol = manifest.get("fgd_ratio_tolerance")
    fgd_ratio = entry.get("fgd_ratio")
    if fgd_tol is not None and fgd_ratio is not None and fgd_ratio > fgd_tol:
        reasons.append(
            f"FGD ratio vs DDPM-1000 {fgd_ratio:.2f} > tolerance {fgd_tol}")
    div_min = manifest.get("diversity_ratio_min")
    div_ratio = entry.get("diversity_ratio_vs_baseline")
    if div_min is not None and div_ratio is not None and div_ratio < div_min:
        reasons.append(
            f"sample diversity collapsed to {div_ratio:.3f}× the DDPM-1000 "
            f"baseline (floor {div_min})")
    detail = "; ".join(reasons) or (
        f"FGD ratio vs DDPM-1000 {fgd_ratio}")  # legacy manifest fallback
    return "degraded", (
        f"serving mode {key} DEGRADED motion quality in the harness: "
        f"{detail} (pass --allow_degraded to serve anyway)")
