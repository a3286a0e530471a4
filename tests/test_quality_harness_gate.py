"""Gate statistics of scripts/quality_harness.py (pure numpy, no jax).

The round-4 verdicts exposed two statistical failure modes the gate
itself must now catch (VERDICT r4 items 1 and 4):

  * a COLLAPSED baseline (TWH: diversity 0.90 vs reference 96.35, FGD
    sd 0.7 over independent-noise replicates) silently certifying fast
    modes at ratio 1.000 — build_manifest must mark the family collapsed
    and refuse every mode;
  * single outlier replicates (diversity reps {13.6, 4.9, 13.6, 13.6,
    12.3}) moving the mean AND the derived tolerance — reject_outliers
    must drop them with a logged count, leaving verdicts stable.
"""
from __future__ import annotations

import importlib.util
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "quality_harness", os.path.join(REPO, "scripts", "quality_harness.py"))
qh = importlib.util.module_from_spec(_spec)
sys.modules.setdefault("quality_harness", qh)
_spec.loader.exec_module(qh)


def _mode(fgd_reps, div_reps, div_ref=70.0):
    return {
        "fgd": float(np.mean(fgd_reps)),
        "fgd_reps": list(map(float, fgd_reps)),
        "diversity_generated": float(np.mean(div_reps)),
        "diversity_generated_reps": list(map(float, div_reps)),
        "diversity_reference": div_ref,
        "beat_alignment": 0.7,
    }


def _report(modes):
    return {"modes": modes, "train_steps": 40000, "seed_reps": 5,
            "ae_steps": 400}


class TestRejectOutliers:
    def test_no_outliers_keeps_all(self):
        kept, dropped = qh.reject_outliers([10.0, 11.0, 10.5, 10.2, 10.8])
        assert dropped == 0 and len(kept) == 5

    def test_r4_diversity_straggler_dropped(self):
        # the measured r4 case: one 4.9 among {13.6, 13.6, 13.6, 12.3}
        reps = [13.6, 4.9, 13.6, 13.6, 12.3]
        kept, dropped = qh.reject_outliers(reps)
        assert dropped == 1
        assert 4.9 not in kept
        assert len(kept) == 4

    def test_r4_fgd_straggler_dropped(self):
        reps = [1894.0, 2211.0, 2210.0, 2210.0, 2182.0]
        kept, dropped = qh.reject_outliers(reps)
        assert dropped == 1 and 1894.0 not in kept

    def test_identical_reps_mad_zero_keeps_all(self):
        kept, dropped = qh.reject_outliers([5.0] * 5)
        assert dropped == 0 and len(kept) == 5

    def test_two_reps_never_rejected(self):
        kept, dropped = qh.reject_outliers([1.0, 100.0])
        assert dropped == 0 and len(kept) == 2

    def test_never_drops_below_two(self):
        # bimodal spread where the rule would nuke everything but one
        kept, dropped = qh.reject_outliers([1.0, 1.0, 500.0])
        assert len(kept) >= 2


class TestCollapseDetection:
    def test_r4_twh_numbers_are_collapsed(self):
        # the exact r4 TWH failure: diversity 0.90/96.35, FGD sd 0.7
        base = _mode([7458.1, 7457.5, 7458.8, 7457.9, 7458.2],
                     [0.90, 0.91, 0.89, 0.90, 0.90], div_ref=96.35)
        fast = _mode([7453.7, 7453.2, 7454.1, 7453.5, 7454.0],
                     [0.95, 0.94, 0.96, 0.95, 0.95], div_ref=96.35)
        man = qh.build_manifest(_report({"ddpm1000": base, "ddim100": fast}))
        assert man["collapsed"] is True
        assert len(man["collapse_reasons"]) == 2  # both floors tripped
        # NO mode of a collapsed family may read ok — this is the exact
        # vacuous-pass the r4 gate emitted
        assert man["modes"]["ddim100"]["ok"] is False

    def test_healthy_baseline_not_collapsed(self):
        base = _mode([2141.0, 2200.0, 2100.0, 2180.0, 2090.0],
                     [13.8, 13.2, 14.1, 13.5, 13.9])
        fast = _mode([2205.0, 2260.0, 2150.0, 2230.0, 2140.0],
                     [13.3, 12.9, 13.7, 13.1, 13.4])
        man = qh.build_manifest(_report({"ddpm1000": base, "dpmpp20": fast}))
        assert man["collapsed"] is False
        assert man["modes"]["dpmpp20"]["ok"] is True

    def test_diversity_floor_alone_trips(self):
        # noisy FGD (healthy spread) but diversity 2% of reference
        base = _mode([2141.0, 2300.0, 2050.0, 2180.0, 2090.0],
                     [1.5, 1.4, 1.6, 1.5, 1.5])
        man = qh.build_manifest(_report({"ddpm1000": base}))
        assert man["collapsed"] is True
        assert "diversity" in man["collapse_reasons"][0]

    def test_collapsed_family_fails_is_real(self):
        base = _mode([7458.1, 7457.5, 7458.8, 7457.9, 7458.2],
                     [0.90, 0.91, 0.89, 0.90, 0.90], div_ref=96.35)
        rep = _report({"ddpm1000": base})
        rep["manifest"] = qh.build_manifest(rep)
        assert not qh._is_real(rep)
        # identical report with a healthy manifest IS real
        base2 = _mode([2141.0, 2200.0, 2100.0, 2180.0, 2090.0],
                      [13.8, 13.2, 14.1, 13.5, 13.9])
        rep2 = _report({"ddpm1000": base2})
        rep2["manifest"] = qh.build_manifest(rep2)
        assert qh._is_real(rep2)


class TestOutlierRobustVerdicts:
    def test_straggler_rep_does_not_flip_verdict(self):
        """The r4 fragility: one 3x-off diversity rep in an otherwise-OK
        mode must not drag its diversity ratio below the 0.25 floor, and
        a baseline FGD straggler must not widen the tolerance."""
        base = _mode([2211.0, 2210.0, 2210.0, 2182.0, 2195.0],
                     [13.6, 13.6, 13.6, 12.3, 13.0])
        good = _mode([2280.0, 2300.0, 2250.0, 2270.0, 2290.0],
                     [13.6, 4.9, 13.6, 13.6, 12.3])  # one straggler
        man = qh.build_manifest(_report({"ddpm1000": base, "ddim100": good}))
        entry = man["modes"]["ddim100"]
        assert entry["outliers_dropped"] == 1
        # ratio from the four healthy reps: ~13.3/13.2 ≈ 1.0, not 11.6/13.2
        assert entry["diversity_ratio_vs_baseline"] > 0.9
        assert entry["ok"] is True

    def test_verdicts_deterministic(self):
        base = _mode([2211.0, 2210.0, 2210.0, 2182.0, 2195.0],
                     [13.6, 13.6, 13.6, 12.3, 13.0])
        fast = _mode([2280.0, 2300.0, 2250.0, 2270.0, 2290.0],
                     [13.0, 13.1, 12.9, 13.2, 13.0])
        r1 = qh.build_manifest(_report({"ddpm1000": base, "ddim100": fast}))
        r2 = qh.build_manifest(_report({"ddpm1000": base, "ddim100": fast}))
        assert r1 == r2


def test_stage_budget_monotone_and_front_loaded():
    budgets = [qh._stage_budget(nt, 400)
               for nt in (1000, 500, 250, 125, 62, 31, 15, 7)]
    assert budgets == sorted(budgets, reverse=True)
    assert budgets[0] == 2400 and budgets[-1] == 1200


def test_rebuild_with_no_gate_write_leaves_shipped_gate_alone(tmp_path):
    """--rebuild on a REAL committed report under QH_NO_GATE_WRITE=1 must
    recompute verdicts into QUALITY_<round>.json without touching the
    shipped resources/quality_gate.json or DEMO — the contract the
    second-seed stability replay (compare_quality_runs.py) relies on."""
    import json
    import subprocess

    src = os.path.join(REPO, "QUALITY_r05.json")
    if not os.path.exists(src):
        pytest.skip("no committed round report to rebuild from")
    gate_path = os.path.join(
        REPO, "diffusestylegesture_tpu", "resources", "quality_gate.json")
    with open(gate_path) as f:
        gate_before = f.read()
    out = os.path.join(REPO, "QUALITY_test_rebuild_tmp.json")
    env = dict(os.environ, QH_ROUND="test_rebuild_tmp",
               QH_NO_GATE_WRITE="1", JAX_PLATFORMS="cpu")
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts",
                                          "quality_harness.py"),
             "--rebuild", src],
            capture_output=True, text=True, env=env, timeout=300)
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert "QH_NO_GATE_WRITE" in proc.stdout
        assert os.path.exists(out), proc.stdout[-2000:]
        with open(out) as f:
            rebuilt = json.load(f)
        # verdicts recomputed from the same reps match the shipped gate
        shipped = json.loads(gate_before)["families"]
        for fam, man in shipped.items():
            got = rebuilt["families"][fam]["manifest"]
            for mode, entry in man["modes"].items():
                assert got["modes"][mode]["ok"] == entry["ok"], (fam, mode)
        with open(gate_path) as f:
            assert f.read() == gate_before
    finally:
        if os.path.exists(out):
            os.remove(out)


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-q"]))


class TestFrozenDrawGate:
    """Zero tolerance for frozen-motion draws (the r5 seed-stability
    failure: mid-ladder distilled students emit a static pose on ~10% of
    noise draws; with 8 replicates the FGD gate's verdict flips between
    seeds while the frozen census catches them under both)."""

    def _healthy(self):
        return _mode([2141.0, 2200.0, 2100.0, 2180.0, 2090.0],
                     [13.8, 13.2, 14.1, 13.5, 13.9])

    def test_single_frozen_draw_refuses_mode(self):
        base = self._healthy()
        base.update(frozen_draws=0, frozen_draws_total=40,
                    velocity_retention_min=0.86)
        # FGD/diversity alone would pass — the seed-123456 r5 numbers
        fast = _mode([2105.0, 2160.0, 2080.0, 2150.0, 2060.0],
                     [13.7, 13.1, 14.0, 13.4, 13.8])
        fast.update(frozen_draws=1, frozen_draws_total=40,
                    velocity_retention_min=0.105)
        man = qh.build_manifest(_report({"ddpm1000": base,
                                         "distill31": fast}))
        entry = man["modes"]["distill31"]
        assert entry["frozen_draws"] == 1
        assert entry["ok"] is False

    def test_zero_frozen_draws_pass(self):
        base = self._healthy()
        base.update(frozen_draws=0, frozen_draws_total=40,
                    velocity_retention_min=0.86)
        fast = _mode([2105.0, 2160.0, 2080.0, 2150.0, 2060.0],
                     [13.7, 13.1, 14.0, 13.4, 13.8])
        fast.update(frozen_draws=0, frozen_draws_total=40,
                    velocity_retention_min=0.83)
        man = qh.build_manifest(_report({"ddpm1000": base,
                                         "distill3": fast}))
        assert man["modes"]["distill3"]["ok"] is True

    def test_pre_metric_report_leaves_fgd_gate_in_charge(self):
        # --rebuild over a report written before the velocity metric:
        # frozen_draws is absent -> None, verdicts unchanged
        man = qh.build_manifest(_report({"ddpm1000": self._healthy(),
                                         "ddim100": self._healthy()}))
        entry = man["modes"]["ddim100"]
        assert entry["frozen_draws"] is None
        assert entry["ok"] is True

    def test_frozen_baseline_collapses_family(self):
        base = self._healthy()
        base.update(frozen_draws=3, frozen_draws_total=40,
                    velocity_retention_min=0.09)
        man = qh.build_manifest(_report({"ddpm1000": base,
                                         "ddim100": self._healthy()}))
        assert man["collapsed"] is True
        assert any("frozen" in r for r in man["collapse_reasons"])
        assert man["modes"]["ddim100"]["ok"] is False

    def test_aggregate_reps_counts_frozen(self):
        reps = [
            {"fgd": 10.0, "diversity_generated": 13.0,
             "diversity_reference": 70.0, "beat_alignment": 0.6,
             "beat_alignment_reference": 0.4, "frozen_clips": 0,
             "velocity_clips_matched": 5, "velocity_retention_min": 0.9},
            {"fgd": 230.0, "diversity_generated": 9.0,
             "diversity_reference": 70.0, "beat_alignment": 0.6,
             "beat_alignment_reference": 0.4, "frozen_clips": 1,
             "velocity_clips_matched": 5, "velocity_retention_min": 0.11},
        ]
        entry = qh._aggregate_reps(reps, 1000.0, 2)
        assert entry["frozen_draws"] == 1
        assert entry["frozen_draws_total"] == 10
        assert entry["velocity_retention_min"] == pytest.approx(0.11)

    def test_aggregate_reps_pre_metric_is_none(self):
        reps = [{"fgd": 10.0, "diversity_generated": 13.0,
                 "diversity_reference": 70.0, "beat_alignment": 0.6,
                 "beat_alignment_reference": 0.4}] * 2
        entry = qh._aggregate_reps(reps, 1000.0, 2)
        assert entry["frozen_draws"] is None
        assert entry["velocity_retention_min"] is None
