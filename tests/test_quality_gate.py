"""Quality-gate manifest semantics (sample/quality_gate.py) + CLI refusal."""
import json

import pytest

from diffusestylegesture_tpu.sample import quality_gate as qg


MANIFEST = {
    "baseline": "ddpm1000",
    "fgd_ratio_tolerance": 1.5,
    "diversity_ratio_min": 0.25,
    "modes": {
        "ddim100": {"fgd_ratio": 1.1, "ok": True},
        "dpmpp20": {"fgd_ratio": 2.4, "ok": False},
        # FGD in tolerance but mode-collapsed (the distill7 signature)
        "ddim7": {"fgd_ratio": 1.09,
                  "diversity_ratio_vs_baseline": 0.008, "ok": False},
    },
}


def test_mode_key():
    assert qg.mode_key("ddpm", 0, 1000) is None  # baseline
    assert qg.mode_key("ddpm", 100, 1000) == "ddpm100"
    assert qg.mode_key("ddim", 100, 1000) == "ddim100"
    assert qg.mode_key("dpmpp", 0, 1000) == "dpmpp1000"


def test_check_mode_statuses():
    assert qg.check_mode("ddpm", 0, 1000, MANIFEST)[0] == "baseline"
    assert qg.check_mode("ddim", 100, 1000, MANIFEST)[0] == "ok"
    status, msg = qg.check_mode("dpmpp", 20, 1000, MANIFEST)
    assert status == "degraded" and "2.4" in msg
    assert qg.check_mode("plms", 50, 1000, MANIFEST)[0] == "unknown"
    # diversity collapse alone degrades, and the message names it
    status, msg = qg.check_mode("ddim", 7, 1000, MANIFEST)
    assert status == "degraded" and "diversity collapsed" in msg
    assert "FGD ratio" not in msg  # FGD was fine; don't blame it


def test_baseline_mismatch_is_unknown():
    """Mode keys collide across base schedules (full-schedule DDIM on a
    100-step config is 'ddim100', same key as the measured 1000→100
    respacing) — a manifest measured against a different baseline gives
    no verdict, matching bench.py's guard."""
    status, msg = qg.check_mode("ddim", 0, 100, MANIFEST)
    assert status == "unknown" and "ddpm100" in msg
    # same guard on explicit keys (distilled-student gating)
    assert qg.check_key("ddim100", MANIFEST, diffusion_steps=100)[0] == "unknown"
    # matching baseline still gates normally
    assert qg.check_key("ddim100", MANIFEST, diffusion_steps=1000)[0] == "ok"
    # unknown schedule (legacy caller) keeps the old behavior
    assert qg.check_key("ddim100", MANIFEST)[0] == "ok"


def test_no_manifest_is_unknown(tmp_path, monkeypatch):
    monkeypatch.setattr(qg, "MANIFEST_PATH", str(tmp_path / "missing.json"))
    status, msg = qg.check_mode("ddim", 100, 1000, None)
    assert status == "unknown" and "no quality manifest" in msg


def test_load_manifest_roundtrip(tmp_path):
    p = tmp_path / "m.json"
    p.write_text(json.dumps(MANIFEST))
    loaded = qg.load_manifest(str(p))
    assert loaded["modes"]["ddim100"]["ok"] is True


def test_cli_refuses_degraded(tmp_path, monkeypatch):
    """cli.sample must exit before any model work when the mode is
    flagged degraded (and proceed to the next failure point — the absent
    checkpoint — with --allow_degraded)."""
    import yaml

    from diffusestylegesture_tpu.cli import sample as sample_cli

    manifest_path = tmp_path / "gate.json"
    manifest_path.write_text(json.dumps(MANIFEST))
    monkeypatch.setattr(qg, "MANIFEST_PATH", str(manifest_path))

    cfg = dict(
        dataset="ZEGGS", njoints=1141, latent_dim=64, n_seed=8,
        cond_mode="cross_local_attention3_style1", cond_mask_prob=0.1,
        audio_feat="wavlm", diffusion_steps=1000, n_poses=88,
        motion_resampling_framerate=20, data_dir=str(tmp_path),
        wavlm_path=str(tmp_path / "missing.pt"),
    )
    cfg_path = tmp_path / "cfg.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    args = ["--config", str(cfg_path), "--model_path", str(tmp_path / "no.pt"),
            "--audiowavlm_path", str(tmp_path / "no.wav"),
            "--sampler", "dpmpp", "--respace", "20"]
    with pytest.raises(SystemExit) as e:
        sample_cli.main(args)
    assert "REFUSED" in str(e.value)

    # --allow_degraded gets past the gate (then fails on the missing ckpt)
    with pytest.raises(Exception) as e2:
        sample_cli.main(args + ["--allow_degraded"])
    assert "REFUSED" not in str(e2.value)


MANIFEST_D = {
    "baseline": "ddpm1000",
    "fgd_ratio_tolerance": 1.5,
    "modes": {
        "distill125": {"fgd_ratio": 1.0, "ok": True},
        "distill15": {"fgd_ratio": 3.1, "ok": False},
    },
}


def test_check_key_distill_entries():
    assert qg.check_key("distill125", MANIFEST_D)[0] == "ok"
    status, msg = qg.check_key("distill15", MANIFEST_D)
    assert status == "degraded" and "3.1" in msg
    assert qg.check_key("distill62", MANIFEST_D)[0] == "unknown"


def test_cli_distilled_stage_gate(tmp_path, monkeypatch):
    """A cli.distill stage dir (schedule.json) gates under its distillN
    key — refused when the harness flagged that depth as degraded."""
    import yaml

    from diffusestylegesture_tpu.cli import sample as sample_cli

    manifest_path = tmp_path / "gate.json"
    manifest_path.write_text(json.dumps(MANIFEST_D))
    monkeypatch.setattr(qg, "MANIFEST_PATH", str(manifest_path))

    stage = tmp_path / "stage5_steps15"
    stage.mkdir()
    (stage / "schedule.json").write_text(json.dumps(
        {"base_steps": 1000, "noise_schedule": "cosine",
         "use_timesteps": list(range(0, 1000, 67))[:15]}))

    cfg = dict(
        dataset="ZEGGS", njoints=1141, latent_dim=64, n_seed=8,
        cond_mode="cross_local_attention3_style1", cond_mask_prob=0.1,
        audio_feat="wavlm", diffusion_steps=1000, n_poses=88,
        motion_resampling_framerate=20, data_dir=str(tmp_path),
        wavlm_path=str(tmp_path / "missing.pt"),
    )
    cfg_path = tmp_path / "cfg.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    args = ["--config", str(cfg_path), "--model_path", str(stage),
            "--audiowavlm_path", str(tmp_path / "no.wav")]
    with pytest.raises(SystemExit) as e:
        sample_cli.main(args)
    assert "REFUSED" in str(e.value) and "distill15" in str(e.value)

    # an ok depth passes the gate (then fails later on the missing params)
    (stage / "schedule.json").write_text(json.dumps(
        {"base_steps": 1000, "noise_schedule": "cosine",
         "use_timesteps": list(range(0, 1000, 8))[:125]}))
    with pytest.raises(Exception) as e2:
        sample_cli.main(args)
    assert "REFUSED" not in str(e2.value)

    # the gate validates against schedule.json's RECORDED base schedule,
    # not the serving yaml: a 15-step student distilled from a 100-step
    # base must not borrow the ddpm1000 manifest's 'distill15 degraded'
    # verdict (it measured a different model family) — status becomes
    # unknown and serving proceeds
    (stage / "schedule.json").write_text(json.dumps(
        {"base_steps": 100, "noise_schedule": "cosine",
         "use_timesteps": list(range(0, 100, 7))[:15]}))
    with pytest.raises(Exception) as e3:
        sample_cli.main(args)
    assert "REFUSED" not in str(e3.value)


class TestFamilyManifest:
    """v2 family-keyed manifests (round 4): per-family sections resolve
    independently; a v1 flat manifest is the zeggs section by definition."""

    V2 = {"families": {
        "zeggs": {"baseline": "ddpm1000", "fgd_ratio_tolerance": 1.2,
                  "diversity_ratio_min": 0.25,
                  "modes": {"ddim100": {"fgd_ratio": 0.9,
                                        "diversity_ratio_vs_baseline": 1.0,
                                        "ok": True}}},
        "twh": {"baseline": "ddpm1000", "fgd_ratio_tolerance": 1.2,
                "diversity_ratio_min": 0.25,
                "modes": {"dpmpp20": {"fgd_ratio": 5.0,
                                      "diversity_ratio_vs_baseline": 1.0,
                                      "ok": False}}},
    }}

    def _write(self, tmp_path, data):
        import json

        p = tmp_path / "m.json"
        p.write_text(json.dumps(data))
        return str(p)

    def test_family_resolution(self, tmp_path):
        p = self._write(tmp_path, self.V2)
        z = qg.load_manifest(p, family="zeggs")
        t = qg.load_manifest(p, family="twh")
        assert "ddim100" in z["modes"] and "dpmpp20" in t["modes"]
        assert qg.load_manifest(p, family="beat") is None

    def test_families_gate_independently(self, tmp_path):
        p = self._write(tmp_path, self.V2)
        assert qg.check_mode("ddim", 100, 1000,
                             qg.load_manifest(p, family="zeggs"))[0] == "ok"
        status, msg = qg.check_mode("dpmpp", 20, 1000,
                                    qg.load_manifest(p, family="twh"))
        assert status == "degraded"
        # the zeggs verdicts must not leak into an unmeasured twh mode
        assert qg.check_mode("ddim", 100, 1000,
                             qg.load_manifest(p, family="twh"))[0] == "unknown"

    def test_v1_flat_is_zeggs_only(self, tmp_path):
        flat = self.V2["families"]["zeggs"]
        p = self._write(tmp_path, flat)
        assert qg.load_manifest(p, family="zeggs") == flat
        assert qg.load_manifest(p, family="twh") is None

    def test_missing_family_message_names_it(self, tmp_path):
        status, msg = qg.check_key("ddim100", None, family="beat")
        # no shipped manifest section for 'beat' in this repo state OR the
        # shipped one lacks it — either way the message names the family
        if status == "unknown":
            assert "beat" in msg or "not measured" in msg
