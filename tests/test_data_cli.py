"""Data pipeline + CLI smoke tests on synthetic data."""
import os
import sys

import numpy as np
import pytest

import jax

from diffusestylegesture_tpu.data import (
    SpeechGestureDataset,
    ZeggsWindowDataset,
    build_h5_dataset,
    build_zeggs_dataset,
    gesture_statistics,
    load_wav_16k,
)
from diffusestylegesture_tpu.motion import bvh, zeggs_features as zf


def write_synth_pair(dirpath, name, seconds=8.0, fps=60, seed=0):
    """Write a paired (wav, bvh) ZEGGS-style clip."""
    from scipy.io import wavfile

    rng = np.random.default_rng(seed)
    sr = 16000
    t = np.arange(int(seconds * sr)) / sr
    wav = (0.3 * np.sin(2 * np.pi * 200 * t)).astype(np.float32)
    wavfile.write(os.path.join(dirpath, name + ".wav"), sr, (wav * 32767).astype(np.int16))

    T = int(seconds * fps)
    J = zf.ZEGGS_NJOINTS
    anim = {
        "rotations": rng.uniform(-20, 20, (T, J, 3)).astype(np.float32),
        "positions": np.broadcast_to(
            rng.uniform(-5, 5, (J, 3)).astype(np.float32), (T, J, 3)
        ).copy(),
        "offsets": rng.uniform(-5, 5, (J, 3)).astype(np.float32),
        "parents": zf.ZEGGS_PARENTS,
        "names": list(zf.ZEGGS_BONE_NAMES),
        "order": "zyx",
        "frametime": 1.0 / fps,
    }
    anim["positions"][:, 0, 1] = 100
    bvh.save(os.path.join(dirpath, name + ".bvh"), anim)


class TestZeggsPipeline:
    def test_build_and_window(self, tmp_path):
        src = tmp_path / "src"
        src.mkdir()
        write_synth_pair(str(src), "001_Happy_0_x_1_0", seconds=9.0, seed=0)
        write_synth_pair(str(src), "002_Sad_0_x_1_0", seconds=9.0, seed=1)
        tgt = str(tmp_path / "out")
        stats = build_zeggs_dataset(str(src), tgt, fps=20)
        assert stats["mean"].shape == (1141,)
        assert os.path.exists(os.path.join(tgt, "mean.npz"))

        def fake_wavlm(windows):
            return np.zeros((len(windows), 88, 1024), np.float32)

        ds = ZeggsWindowDataset(os.path.join(tgt, "train"), fake_wavlm)
        assert len(ds) > 0
        batch = next(ds.batches(2))
        assert batch["motion"].shape == (2, 88, 1141)
        assert batch["style"].shape == (2, 6)
        assert batch["wavlm"].shape == (2, 88, 1024)

        # cache reload path
        ds2 = ZeggsWindowDataset(os.path.join(tgt, "train"))
        assert len(ds2) == len(ds)

    def test_wav_io(self, tmp_path):
        from scipy.io import wavfile

        sr = 48000
        t = np.arange(sr) / sr
        y = (0.5 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)
        path = str(tmp_path / "a.wav")
        wavfile.write(path, sr, y)
        out = load_wav_16k(path)
        assert abs(len(out) - 16000) < 10
        assert np.abs(out).max() <= 1.0


class TestH5Pipeline:
    def test_build_stats_load(self, tmp_path):
        rng = np.random.default_rng(0)
        motion_dim, audio_dim, text_dim = 12, 20, 7
        clips = []
        for i in range(3):
            T = 400 + 50 * i
            sid = np.zeros(4, np.float32)
            sid[i % 4] = 1
            clips.append(
                dict(
                    speaker_id=sid,
                    gesture=rng.standard_normal((T, motion_dim)).astype(np.float32),
                    audio=rng.standard_normal((T, audio_dim)).astype(np.float32),
                    text=rng.standard_normal((T, text_dim)).astype(np.float32),
                )
            )
        path = str(tmp_path / "d.h5")
        build_h5_dataset(path, clips)
        mean, std = gesture_statistics(path)
        assert mean.shape == (motion_dim,)

        ds = SpeechGestureDataset(path, mean, std, n_poses=150)
        batch = next(ds.batches(4, seed=0))
        assert batch["motion"].shape == (4, 150, motion_dim * 3)
        assert batch["audio"].shape == (4, 150, audio_dim + text_dim)
        assert batch["style"].shape == (4, 4)
        # z-normalized position block
        assert abs(batch["motion"][..., :motion_dim].mean()) < 0.5


class TestCLI:
    def test_prepare_data_cli(self, tmp_path):
        from diffusestylegesture_tpu.cli.prepare_data import main

        src = tmp_path / "src"
        src.mkdir()
        write_synth_pair(str(src), "001_Neutral_0_x_1_0", seconds=6.0)
        main(["--dataset", "ZEGGS", "--source", str(src), "--target", str(tmp_path / "o")])
        assert os.path.exists(tmp_path / "o" / "mean.npz")


class TestConvertCkptCLI:
    def test_zeggs_roundtrip(self, tmp_path):
        import torch

        from conftest import has_reference

        if not has_reference():
            pytest.skip("reference not mounted")
        # import via the helper: a raw `from model.mdm import ...` picks up
        # the BEAT tree's `model` package when a BEAT parity test ran first
        from ref_compat import import_ref_mdm

        RefMDM = import_ref_mdm()

        torch.manual_seed(0)
        ref = RefMDM(
            modeltype="", njoints=16, nfeats=1,
            cond_mode="cross_local_attention3_style1", audio_feat="wavlm",
            arch="trans_enc", latent_dim=128, ff_size=64, num_layers=1,
            n_seed=4, cond_mask_prob=0.1,
        )
        pt = str(tmp_path / "m.pt")
        torch.save(ref.state_dict(), pt)

        from diffusestylegesture_tpu.cli.convert_ckpt import main

        dst = str(tmp_path / "orbax")
        main(["--kind", "zeggs", "--src", pt, "--dst", dst, "--num_layers", "1"])
        import orbax.checkpoint as ocp

        restored = ocp.StandardCheckpointer().restore(dst)
        assert "params" in restored
        assert "seqTransEncoder" in restored["params"]


class TestPrepareBeatCLI:
    def test_beat_h5_build(self, tmp_path):
        from test_pipeline import synth_beat_bvh
        from scipy.io import wavfile
        from diffusestylegesture_tpu.cli.prepare_data import main

        src = tmp_path / "src"
        src.mkdir()
        name = "2_scott_0_1_1"
        synth_beat_bvh(str(src / f"{name}.bvh"), T=121, fps=120, seed=12)
        sr = 16000
        t = np.arange(sr) / sr
        wav = (0.3 * np.sin(2 * np.pi * 220 * t) * 32767).astype(np.int16)
        wavfile.write(str(src / f"{name}.wav"), sr, wav)
        (src / f"{name}.tsv").write_text("0.1\t0.5\thello\n")

        out = str(tmp_path / "beat.h5")
        main(["--dataset", "BEAT", "--source", str(src), "--target", out,
              "--num_speakers", "4"])
        import h5py

        with h5py.File(out) as h5:
            assert "0" in h5
            assert h5["0"]["audio"].shape[1] == 1133
            assert h5["0"]["text"].shape[1] == 301
        assert os.path.exists(str(tmp_path / "beat_mean.npy"))


class TestTrainCLI:
    def test_zeggs_train_smoke(self, tmp_path):
        """prepare-data → cli.train end to end on synthetic ZEGGS data."""
        import yaml

        from diffusestylegesture_tpu.cli.prepare_data import main as prep_main
        from diffusestylegesture_tpu.cli.train import main as train_main

        src = tmp_path / "src"
        src.mkdir()
        write_synth_pair(str(src), "001_Happy_0_x_1_0", seconds=9.0, seed=0)
        write_synth_pair(str(src), "002_Sad_0_x_1_0", seconds=9.0, seed=1)
        data_dir = str(tmp_path / "prepared")
        prep_main(["--dataset", "ZEGGS", "--source", str(src), "--target", data_dir])

        cfg = dict(
            dataset="ZEGGS",
            name="DiffuseStyleGesture",
            data_dir=data_dir,
            n_poses=88,
            motion_resampling_framerate=20,
            subdivision_stride=10,
            batch_size=2,
            n_seed=8,
            njoints=1141,
            latent_dim=128,
            ff_size=64,
            num_layers=1,
            cond_mask_prob=0.1,
            cond_mode="cross_local_attention3_style1",
            audio_feat="wavlm",
            diffusion_steps=8,
            noise_schedule="cosine",
            lr=0.0001,
            log_interval=1,
            save_interval=0,
            num_steps=2,
            save_dir=str(tmp_path / "ckpt"),
            wavlm_path=str(tmp_path / "missing-wavlm.pt"),
        )
        cfg_path = tmp_path / "cfg.yml"
        cfg_path.write_text(yaml.safe_dump(cfg))

        # dataset has no cached wavlm features (no ckpt) → loader yields
        # audio_raw; provide wavlm via zeros by monkeypatching the batches
        # No — builder requires 'wavlm'; patch the dataset cache with zeros:
        from diffusestylegesture_tpu.data import ZeggsWindowDataset

        ds = ZeggsWindowDataset(
            f"{data_dir}/train",
            lambda w: np.zeros((len(w), 88, 1024), np.float32),
        )
        assert ds.wavlm is not None  # cache now holds wavlm features

        # reference MINLEN includes len(mfcc) (`data_preprocessor.py:94`):
        # a wav SHORTER than its motion caps window generation at the end
        # of audio — without the mfcc term, 11 windows of real motion
        # would pair with zero-padded silence (regression)
        short_dir = tmp_path / "short_audio_train"
        short_dir.mkdir()
        np.savez(short_dir / "clip0.npz",
                 poses=np.zeros((200, 1141), np.float32),
                 audio_raw=np.zeros(16000 * 5, np.float32),  # 5 s @16 kHz
                 mfcc=np.zeros((101, 13), np.float32),       # 5 s @20 fps
                 style=np.eye(6, dtype=np.float32)[0])
        ds_short = ZeggsWindowDataset(str(short_dir), None,
                                      n_poses=88, stride=10)
        assert len(ds_short.poses) == 1  # floor((101-88)/10), not 11

        train_main(["--config", str(cfg_path)])
        assert os.path.isdir(tmp_path / "ckpt")

        # device-cache mode: same CLI with on-device batch gathers (resumes
        # from the checkpoint the first run saved); --bf16 covers the
        # flag→Config override path (regression: Config is attribute-style,
        # item assignment used to crash here)
        cfg["num_steps"] = 4
        cfg_path.write_text(yaml.safe_dump(cfg))
        train_main(["--config", str(cfg_path), "--device_cache", "--bf16"])

        # MoE trunk through the product CLI: the checkpoint must contain
        # ONLY trainables (regression: init's sown 'losses' scalar entered
        # the TrainState, was optimized and checkpointed)
        import orbax.checkpoint as ocp

        cfg["num_steps"] = 2
        cfg["save_dir"] = str(tmp_path / "ckpt_moe")
        cfg_path.write_text(yaml.safe_dump(cfg))
        train_main(["--config", str(cfg_path), "--moe_experts", "2"])
        mgr = ocp.CheckpointManager(cfg["save_dir"])
        tree = mgr.restore(mgr.latest_step())
        mgr.close()
        assert set(tree["params"].keys()) == {"params"}
        assert "moe" in tree["params"]["params"]["seqTransEncoder"]["layers_0"]


class TestParallelPrep:
    def test_workers_output_identical(self, tmp_path):
        src = tmp_path / "src"
        src.mkdir()
        for i, (name, seed) in enumerate([
            ("001_Happy_0_x_1_0", 0), ("002_Sad_0_x_1_0", 1),
            ("003_Neutral_0_x_1_0", 2),
        ]):
            write_synth_pair(str(src), name, seconds=6.0, seed=seed)
        t_serial = str(tmp_path / "serial")
        t_par = str(tmp_path / "par")
        s0 = build_zeggs_dataset(str(src), t_serial, fps=20, workers=0)
        s2 = build_zeggs_dataset(str(src), t_par, fps=20, workers=2)
        np.testing.assert_array_equal(s0["mean"], s2["mean"])
        np.testing.assert_array_equal(s0["std"], s2["std"])
        for split in ("train", "valid"):
            a = sorted(os.listdir(os.path.join(t_serial, split)))
            b = sorted(os.listdir(os.path.join(t_par, split)))
            assert a == b
            for f in a:
                da = np.load(os.path.join(t_serial, split, f))
                db = np.load(os.path.join(t_par, split, f))
                for k in da.files:
                    np.testing.assert_array_equal(da[k], db[k])


class TestParallelBeatPrep:
    def test_workers_output_identical(self, tmp_path):
        from test_pipeline import synth_beat_bvh
        from scipy.io import wavfile
        import h5py
        from diffusestylegesture_tpu.cli.prepare_data import main

        src = tmp_path / "src"
        src.mkdir()
        sr = 16000
        for i, name in enumerate(["2_scott_0_1_1", "3_anna_0_1_1"]):
            synth_beat_bvh(str(src / f"{name}.bvh"), T=121, fps=120, seed=20 + i)
            t = np.arange(sr) / sr
            wav = (0.3 * np.sin(2 * np.pi * (220 + 40 * i) * t) * 32767).astype(np.int16)
            wavfile.write(str(src / f"{name}.wav"), sr, wav)
            (src / f"{name}.tsv").write_text("0.1\t0.5\thello\n")

        out_s = str(tmp_path / "serial.h5")
        out_p = str(tmp_path / "par.h5")
        base = ["--dataset", "BEAT", "--source", str(src), "--num_speakers", "4"]
        main(base + ["--target", out_s])
        main(base + ["--target", out_p, "--workers", "2"])

        with h5py.File(out_s) as a, h5py.File(out_p) as b:
            assert sorted(a.keys()) == sorted(b.keys())
            for k in a.keys():
                for field in ("speaker_id", "gesture", "audio", "text"):
                    np.testing.assert_array_equal(a[k][field][...], b[k][field][...])
