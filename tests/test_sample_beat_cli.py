"""BEAT/TWH sampling CLI integration: torch checkpoint → cli.sample_beat → motion npy.

Covers the precomputed-features path of the reference CLI
(`BEAT-TWH-main/mydiffusion_beat_twh/sample.py:239-244,271-344`) at the
real BEAT v0 dimensions (njoints 2052, audio 1434, latent 384) with a
random-weight converted checkpoint and a short diffusion schedule.
"""
import os

import numpy as np
import pytest
import yaml

from conftest import requires_reference

MOTION_DIM = 684  # BEAT v0


@requires_reference
@pytest.mark.parametrize("serve_fast", [False, True], ids=["f32", "fast"])
def test_sample_beat_cli_end_to_end(tmp_path, serve_fast):
    import torch

    from ref_compat import import_ref_beat_mdm

    from diffusestylegesture_tpu.cli import sample_beat as cli

    RefMDM = import_ref_beat_mdm()
    torch.manual_seed(3)
    ref = RefMDM(
        modeltype="", njoints=MOTION_DIM * 3, nfeats=1,
        cond_mode="cross_local_attention4_style1", audio_feat="wavlm",
        arch="trans_enc", latent_dim=384, n_seed=30, cond_mask_prob=0.1,
        style_dim=2, source_audio_dim=1434, audio_feat_dim_latent=64,
    )
    ref.eval()
    mdm_pt = str(tmp_path / "model.pt")
    torch.save(ref.state_dict(), mdm_pt)

    rng = np.random.default_rng(9)
    mean = rng.standard_normal(MOTION_DIM).astype(np.float32)
    std = (0.5 + rng.random(MOTION_DIM)).astype(np.float32)
    np.save(tmp_path / "mean.npy", mean)
    np.save(tmp_path / "std.npy", std)
    np.save(
        tmp_path / "seed.npy",
        rng.standard_normal((40, MOTION_DIM)).astype(np.float32),
    )
    real_n = 100  # < stride 120 → one window, crop exercised
    np.save(
        tmp_path / "textaudio.npy",
        rng.standard_normal((real_n, 1434)).astype(np.float32),
    )

    cfg = dict(
        dataset="BEAT", name="DiffuseStyleGesture+", version="v0",
        n_poses=150, n_seed=30, latent_dim=384, cond_mask_prob=0.1,
        audio_feat="wavlm", audio_feat_dim_latent=64,
        noise_schedule="cosine", diffusion_steps=3,
    )
    cfg_path = str(tmp_path / "cfg.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    save_dir = str(tmp_path / "out")
    cli.main([
        "--config", cfg_path,
        "--model_path", mdm_pt,
        "--textaudio_npy", str(tmp_path / "textaudio.npy"),
        "--seed_gesture_npy", str(tmp_path / "seed.npy"),
        "--mean_npy", str(tmp_path / "mean.npy"),
        "--std_npy", str(tmp_path / "std.npy"),
        "--speaker", "1",
        "--save_dir", save_dir,
    ] + (["--serve_fast"] if serve_fast else []))

    files = [f for f in os.listdir(save_dir) if f.endswith("_motion.npy")]
    assert len(files) == 1 and "spk1" in files[0]
    motion = np.load(os.path.join(save_dir, files[0]))
    assert motion.shape == (real_n, MOTION_DIM)
    assert np.isfinite(motion).all()

    # ---- live-feature path (ref `sample.py:248-266`): wav + tsv in ----
    from scipy.io import wavfile

    secs = 3.4  # ~102 frames at 30 fps
    t = np.arange(int(16000 * secs)) / 16000
    wav_path = str(tmp_path / "live.wav")
    wavfile.write(
        wav_path, 16000,
        (np.sin(2 * np.pi * 220 * t) * 8000).astype(np.int16),
    )
    tsv_path = str(tmp_path / "live.tsv")
    with open(tsv_path, "w") as f:
        f.write("0.10\t0.55\thello\n0.60\t1.20\tworld\n")

    save_dir2 = str(tmp_path / "out_live")
    cli.main([
        "--config", cfg_path,
        "--model_path", mdm_pt,
        "--wav", wav_path,
        "--tsv", tsv_path,
        "--seed_gesture_npy", str(tmp_path / "seed.npy"),
        "--mean_npy", str(tmp_path / "mean.npy"),
        "--std_npy", str(tmp_path / "std.npy"),
        "--speaker", "0",
        "--save_dir", save_dir2,
    ])
    files2 = [f for f in os.listdir(save_dir2) if f.endswith("_motion.npy")]
    assert len(files2) == 1
    motion2 = np.load(os.path.join(save_dir2, files2[0]))
    assert motion2.shape[1] == MOTION_DIM
    assert 95 <= motion2.shape[0] <= 105  # ~3.4 s at 30 fps (feature crop)
    assert np.isfinite(motion2).all()


def test_sample_beat_cli_quality_gate(tmp_path, monkeypatch):
    """Fast modes are family-gated (VERDICT r3 item 1): a harness-measured
    degraded BEAT mode is refused before any model loading; --allow_degraded
    gets past the gate."""
    import json

    from diffusestylegesture_tpu.cli import sample_beat as cli
    from diffusestylegesture_tpu.sample import quality_gate as qg

    man = {"families": {"beat": {
        "baseline": "ddpm3", "fgd_ratio_tolerance": 1.1,
        "diversity_ratio_min": 0.25,
        "modes": {"dpmpp2": {"fgd_ratio": 9.9,
                             "diversity_ratio_vs_baseline": 1.0,
                             "ok": False}},
    }}}
    mpath = tmp_path / "gate.json"
    mpath.write_text(json.dumps(man))
    monkeypatch.setattr(qg, "MANIFEST_PATH", str(mpath))

    cfg = dict(
        dataset="BEAT", name="DiffuseStyleGesture+", version="v0",
        n_poses=150, n_seed=30, latent_dim=384, cond_mask_prob=0.1,
        audio_feat="wavlm", audio_feat_dim_latent=64,
        noise_schedule="cosine", diffusion_steps=3,
    )
    cfg_path = str(tmp_path / "cfg.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    argv = [
        "--config", cfg_path,
        "--model_path", str(tmp_path / "missing.pt"),
        "--textaudio_npy", "x.npy",
        "--seed_gesture_npy", "y.npy",
        "--mean_npy", "m.npy", "--std_npy", "s.npy",
        "--sampler", "dpmpp", "--respace", "2",
        "--save_dir", str(tmp_path / "out"),
    ]
    with pytest.raises(SystemExit, match="REFUSED"):
        cli.main(argv)
    # the refusal is the GATE's, not a downstream failure: with
    # --allow_degraded the run proceeds past it (and dies later trying to
    # load the nonexistent checkpoint)
    with pytest.raises(Exception) as ei:
        cli.main(argv + ["--allow_degraded"])
    assert "REFUSED" not in str(ei.value)
