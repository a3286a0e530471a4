"""Serving CLI integration: JSONL requests → batched generation → BVH files."""
import json
import threading

import pytest
import os

import numpy as np
import yaml

from conftest import requires_reference

from test_ref_e2e_parity import MDM_KW, NJOINTS, _build_reference_models


def _serve_setup(tmp_path):
    """Converted-weight MDM+WavLM checkpoints, stats dir, wavs, yaml —
    the full serving stack on tiny shapes (shared by the batch and
    interactive tests)."""
    import torch

    _, ref_mdm, ref_wavlm, jcfg = _build_reference_models()
    mdm_pt = str(tmp_path / "model.pt")
    torch.save(ref_mdm.state_dict(), mdm_pt)
    wavlm_pt = str(tmp_path / "wavlm.pt")
    cfg_dict = dict(
        extractor_mode=jcfg.extractor_mode,
        encoder_layers=jcfg.encoder_layers,
        encoder_embed_dim=jcfg.encoder_embed_dim,
        encoder_ffn_embed_dim=jcfg.encoder_ffn_embed_dim,
        encoder_attention_heads=jcfg.encoder_attention_heads,
        layer_norm_first=jcfg.layer_norm_first,
        conv_feature_layers=repr([tuple(t) for t in jcfg.conv_feature_layers]),
        conv_pos=jcfg.conv_pos,
        conv_pos_groups=jcfg.conv_pos_groups,
        relative_position_embedding=jcfg.relative_position_embedding,
        num_buckets=jcfg.num_buckets,
        max_distance=jcfg.max_distance,
        gru_rel_pos=jcfg.gru_rel_pos,
        normalize=jcfg.normalize,
    )
    torch.save({"cfg": cfg_dict, "model": ref_wavlm.state_dict()}, wavlm_pt)

    data_dir = tmp_path / "data"
    data_dir.mkdir()
    rng = np.random.default_rng(5)
    np.savez(data_dir / "mean.npz", mean=np.zeros(NJOINTS, np.float32))
    np.savez(data_dir / "std.npz", std=np.ones(NJOINTS, np.float32))

    from scipy.io import wavfile

    wavs = []
    for i, tok in enumerate(("Happy", "Sad")):
        path = str(tmp_path / f"{i:03d}_{tok}_0.wav")
        wavfile.write(path, 16000,
                      (rng.standard_normal(16000 * 4) * 1000).astype(np.int16))
        wavs.append(path)

    cfg = dict(
        njoints=NJOINTS, latent_dim=MDM_KW["latent_dim"],
        ff_size=MDM_KW["ff_size"], num_layers=MDM_KW["num_layers"],
        n_seed=MDM_KW["n_seed"], cond_mode="cross_local_attention3_style1",
        cond_mask_prob=0.1, audio_feat="wavlm", wavlm_path=wavlm_pt,
        noise_schedule="cosine", diffusion_steps=3, n_poses=88,
        motion_resampling_framerate=20, data_dir=str(data_dir),
    )
    cfg_path = str(tmp_path / "cfg.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    return mdm_pt, cfg_path, wavs


@requires_reference
@pytest.mark.parametrize("serve_fast", [False, True], ids=["f32", "fast"])
def test_serve_cli_batches_requests(tmp_path, capsys, serve_fast):
    from diffusestylegesture_tpu.cli import serve as serve_cli
    from diffusestylegesture_tpu.motion import bvh

    mdm_pt, cfg_path, wavs = _serve_setup(tmp_path)

    reqs = str(tmp_path / "reqs.jsonl")
    with open(reqs, "w") as f:
        f.write(json.dumps({"wav": wavs[0]}) + "\n")  # style from filename
        f.write(json.dumps({"wav": wavs[1], "style": "Neutral",
                            "out": str(tmp_path / "explicit.bvh")}) + "\n")
        f.write(json.dumps({"wav": wavs[1], "style": "NotAStyle"}) + "\n")
        f.write("{not valid json\n")  # must not abandon the run

    serve_cli.main([
        "--config", cfg_path, "--model_path", mdm_pt,
        "--requests", reqs, "--max_delay_ms", "500",
    ] + (["--serve_fast"] if serve_fast else []))

    lines = []
    for l in capsys.readouterr().out.strip().splitlines():
        try:
            lines.append(json.loads(l))
        except json.JSONDecodeError:
            pass  # non-JSON noise from the reference model constructors
    results = [l for l in lines if "wav" in l]
    summary = [l for l in lines if "served" in l][0]
    errors = [l for l in results if "error" in l]
    ok = [l for l in results if "out" in l]
    assert len(errors) == 1 and "NotAStyle" in errors[0]["error"]
    bad_line = [l for l in lines if "line" in l and "error" in l]
    assert len(bad_line) == 1  # malformed JSON reported, run continued
    assert len(ok) == 2
    assert summary["served"] == 2
    assert summary["batches"] == 1  # both valid requests rode one batch
    for l in ok:
        assert os.path.exists(l["out"])
        loaded = bvh.load(l["out"])
        assert np.isfinite(loaded["rotations"]).all()
    assert os.path.exists(tmp_path / "explicit.bvh")


@requires_reference
def test_serve_cli_interactive_request_response(tmp_path, capsys, monkeypatch):
    """A request/response client (write one request, block until its
    result arrives, then continue) must not deadlock: results are emitted
    by a dedicated consumer thread the moment each future resolves, not
    on the next input line / EOF (regression: the drain hook only ran
    inside the read loop, so a blocked reader withheld finished results
    forever)."""
    import sys

    import diffusestylegesture_tpu.motion.zeggs_features as zf_mod
    from diffusestylegesture_tpu.cli import serve as serve_cli

    mdm_pt, cfg_path, wavs = _serve_setup(tmp_path)

    first_result = threading.Event()
    real_to_bvh = zf_mod.pose_features_to_bvh

    def spy(*a, **kw):
        r = real_to_bvh(*a, **kw)
        first_result.set()
        return r

    monkeypatch.setattr(zf_mod, "pose_features_to_bvh", spy)

    class InteractiveStdin:
        """Yields request 1, then blocks like a client waiting for its
        result before sending request 2."""

        def __iter__(self):
            yield json.dumps({"wav": wavs[0]}) + "\n"
            assert first_result.wait(300), (
                "no result emitted while the client waits for it before "
                "sending more input — interactive serve deadlock")
            yield json.dumps({"wav": wavs[1]}) + "\n"

    monkeypatch.setattr(sys, "stdin", InteractiveStdin())
    serve_cli.main(["--config", cfg_path, "--model_path", mdm_pt,
                    "--max_delay_ms", "50"])

    lines = []
    for l in capsys.readouterr().out.strip().splitlines():
        try:
            lines.append(json.loads(l))
        except json.JSONDecodeError:
            pass
    ok = [l for l in lines if "out" in l]
    assert len(ok) == 2 and all(os.path.exists(l["out"]) for l in ok)
    assert [l for l in lines if "served" in l][0]["served"] == 2
