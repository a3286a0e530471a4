"""ZeroEGGS CLI end to end: prepare → train → generate on synthetic data.

Covers the vestigial-but-complete subsystem's user surface
(ref `ubisoft-laforge-ZeroEGGS-main/ZEGGS/main.py`, `generate.py`).
"""
import os

import numpy as np

from test_data_cli import write_synth_pair

from diffusestylegesture_tpu.motion import bvh


import pytest


@pytest.mark.parametrize("style_encoder", ["gru", "attn"])
def test_zeroeggs_prepare_train_generate(tmp_path, style_encoder):
    from diffusestylegesture_tpu.cli import zeroeggs as cli

    src = tmp_path / "raw"
    src.mkdir()
    write_synth_pair(str(src), "001_Happy_0_x_1_0", seconds=4.0, seed=0)
    write_synth_pair(str(src), "002_Sad_0_x_1_0", seconds=4.0, seed=1)

    data = str(tmp_path / "processed")
    cli.main(["prepare", "--source", str(src), "--target", data])
    assert os.path.exists(os.path.join(data, "features.npz"))
    stats = dict(np.load(os.path.join(data, "stats.npz")))
    assert stats["anim_input_mean"].shape == (1134,)
    assert stats["anim_output_mean"].shape == (1131,)

    net = str(tmp_path / "net")
    cli.main([
        "train", "--data", data, "--save_dir", net,
        "--num_steps", "3", "--batch_size", "2", "--window", "8",
        "--hidden_size", "32", "--speech_encoding_size", "8",
        "--style_embedding_size", "4", "--num_rnn_layers", "1",
        "--style_encoder", style_encoder,
    ])
    assert os.path.exists(os.path.join(net, "config.json"))

    out_dir = str(tmp_path / "gen")
    style_bvh = os.path.join(str(src), "001_Happy_0_x_1_0.bvh")
    style_bvh2 = os.path.join(str(src), "002_Sad_0_x_1_0.bvh")
    cli.main([
        "generate", "--network", net, "--stats", os.path.join(data, "stats.npz"),
        "--audio", os.path.join(str(src), "002_Sad_0_x_1_0.wav"),
        "--style", f"{style_bvh}:0:120", "--style", style_bvh2,
        "--blend", "stitch", "--blend_ratio", "0.4", "0.6",
        "--save_dir", out_dir,
    ])
    files = [f for f in os.listdir(out_dir) if f.endswith(".bvh")]
    assert len(files) == 1
    loaded = bvh.load(os.path.join(out_dir, files[0]))
    # 4 s of audio at 60 fps
    assert loaded["rotations"].shape == (240, 75, 3)
    assert np.isfinite(loaded["rotations"]).all()
    assert np.isfinite(loaded["positions"]).all()
