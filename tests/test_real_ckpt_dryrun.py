"""Full-size dry run of the released-checkpoint validation (VERDICT r4
item 8).

Fabricates layout-exact random-weight stand-ins for the released
artifacts — `WavLM-Large.pt` at the real Large architecture and
`model000450000.pt` at the flagship ZEGGS configuration, both produced
by the reference's own torch modules and saved the way the reference
saves them — then runs `scripts/validate_real_ckpt.py` END TO END
(torch load → converter → compiled windowed sampler → BVH → comparison
stats). After this, the only thing the real artifacts can change is the
weight VALUES.

Heavy by unit-test standards (~1.3 GB checkpoint on disk, WavLM-Large
forward on the CPU backend): set DSGT_SKIP_HEAVY=1 to skip locally; CI
and the round driver run it.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

from conftest import requires_reference

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

heavy = pytest.mark.skipif(
    os.environ.get("DSGT_SKIP_HEAVY", "") not in ("", "0"),
    reason="DSGT_SKIP_HEAVY set")


@requires_reference
@heavy
def test_validate_real_ckpt_dryrun_full_size(tmp_path):
    import fabricate_reference_artifacts as fab
    import validate_real_ckpt as v

    art = tmp_path / "artifacts"
    art.mkdir()
    fab.main(["--out_dir", str(art)])

    wavlm_pt = art / "WavLM-Large.pt"
    mdm_pt = art / "model000450000.pt"
    # the released WavLM-Large is ~1.26 GB of f32; a layout-exact
    # fabrication must be the same order of magnitude
    assert wavlm_pt.stat().st_size > 1.0e9
    # flagship MDM measures 10.3 M params (41 MB f32) from the reference
    # module itself (SURVEY's ≈17 M was an estimate)
    assert mdm_pt.stat().st_size > 3.5e7

    # the converter must accept the fabricated layouts EXACTLY as it
    # would the released files
    from diffusestylegesture_tpu.models.wavlm import load_wavlm_checkpoint

    cfg, params = load_wavlm_checkpoint(str(wavlm_pt))
    assert cfg.encoder_layers == 24 and cfg.encoder_embed_dim == 1024
    assert "layers_23" in params["params"]
    del params

    # dataset statistics + input wav
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    rng = np.random.default_rng(0)
    np.savez(data_dir / "mean.npz", mean=np.zeros(1141, np.float32))
    np.savez(data_dir / "std.npz", std=np.ones(1141, np.float32))
    from scipy.io import wavfile

    wav = (rng.standard_normal(16000 * 9) * 0.1 * 32767).astype(np.int16)
    wav_path = tmp_path / "001_Happy_0_x_1_0.wav"
    wavfile.write(wav_path, 16000, wav)

    # end to end through the actual script (NOT just its helpers):
    # cli.sample with the fabricated .pt files; ddim8 respacing keeps
    # the windowed loop tractable on the CPU backend while exercising
    # the same compiled engine the 1000-step path uses
    rc = v.main([
        "--ckpt", str(mdm_pt), "--wavlm", str(wavlm_pt),
        "--wav", str(wav_path), "--data_dir", str(data_dir),
        "--max_len", "160", "--save_dir", str(tmp_path / "out"),
        "--sampler", "ddim", "--respace", "8", "--allow_degraded",
    ])
    assert rc == 0
    bvhs = [f for f in os.listdir(tmp_path / "out") if f.endswith(".bvh")]
    assert bvhs, "validation run produced no BVH"

    # self-comparison exercises compare_bvh on real validator output
    out_bvh = os.path.join(tmp_path / "out", bvhs[0])
    stats = v.compare_bvh(out_bvh, out_bvh)
    assert stats["rot_rmse_deg"] == 0.0
    assert stats["frames_ours"] == stats["frames_ref"] > 0


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-q", "-s"]))
