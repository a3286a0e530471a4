"""Eval metrics + profiling utils tests."""
import numpy as np

from diffusestylegesture_tpu.eval import (
    beat_alignment,
    diversity,
    frechet_distance,
    multimodality,
)
from diffusestylegesture_tpu.utils import profile_kv, profile_means, reset_profile


class TestMetrics:
    def test_frechet_identical_zero(self):
        rng = np.random.default_rng(0)
        a = rng.standard_normal((500, 8))
        assert frechet_distance(a, a) < 1e-6
        b = a + 3.0
        assert frechet_distance(a, b) > 8.0

    def test_diversity(self):
        rng = np.random.default_rng(1)
        tight = rng.standard_normal((100, 4)) * 0.1
        wide = rng.standard_normal((100, 4)) * 5.0
        assert diversity(wide) > diversity(tight)

    def test_multimodality(self):
        rng = np.random.default_rng(2)
        f = rng.standard_normal((3, 50, 6))
        assert multimodality(f) > 0

    def test_beat_alignment(self):
        fps = 20.0
        t = np.arange(200) / fps
        motion = np.stack([np.sin(2 * np.pi * 1.0 * t), np.cos(2 * np.pi * 1.0 * t)], 1)
        # velocity minima occur periodically; onsets at those times score high
        good = beat_alignment(motion, np.array([1.0, 2.0, 3.0]), fps)
        assert 0 <= good <= 1


class TestProfiling:
    def test_profile_kv(self):
        reset_profile()
        with profile_kv("unit_scope", device_annotation=False):
            x = sum(range(1000))
        means = profile_means()
        assert "wait_unit_scope" in means and means["wait_unit_scope"] >= 0
        assert x == 499500


class TestStyles:
    def test_style_helpers(self):
        from diffusestylegesture_tpu.sample import blend_styles, style_grid, style_vector

        v = style_vector("Happy", 0.5)
        assert v[0] == 0.5 and v.sum() == 0.5
        b = blend_styles(["Happy", "Sad"], [0.7, 0.3])
        assert abs(b.sum() - 1.0) < 1e-6 and b[0] == np.float32(0.7)
        g = style_grid(["Happy", "Sad"], [0.5, 1.0])
        assert g.shape == (4, 6)


class TestMultiHost:
    def test_single_process_global_batch(self):
        import jax

        from diffusestylegesture_tpu.parallel import make_mesh
        from diffusestylegesture_tpu.parallel.multihost import (
            global_batch_from_host_local,
            global_mesh,
        )

        mesh = global_mesh(("data",))
        batch = {"x": np.arange(16, dtype=np.float32).reshape(8, 2)}
        out = global_batch_from_host_local(mesh, batch)
        assert out["x"].shape == (8, 2)
        np.testing.assert_array_equal(np.asarray(out["x"]), batch["x"])


class TestEvalCLI:
    def test_metrics_over_npy_dirs(self, tmp_path, capsys):
        import json

        from diffusestylegesture_tpu.cli.eval import main

        rng = np.random.default_rng(0)
        gen_dir, ref_dir, wav_dir = (tmp_path / d for d in ("g", "r", "w"))
        for d in (gen_dir, ref_dir, wav_dir):
            d.mkdir()
        for i in range(3):
            # generated drawn from a shifted distribution → positive FGD
            np.save(gen_dir / f"clip{i}.npy",
                    rng.standard_normal((120, 9)).astype(np.float32) + 0.5)
            np.save(ref_dir / f"clip{i}.npy",
                    rng.standard_normal((120, 9)).astype(np.float32))
            from scipy.io import wavfile

            t = np.arange(16000 * 2) / 16000
            sig = (np.sin(2 * np.pi * 440 * t) * ((t * 4) % 1 < 0.1) * 10000)
            wavfile.write(str(wav_dir / f"clip{i}.wav"), 16000, sig.astype(np.int16))

        out = main([
            "--generated", str(gen_dir), "--reference", str(ref_dir),
            "--wav", str(wav_dir), "--fps", "20",
            "--window", "20", "--stride", "10",
        ])
        printed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert printed == out
        assert out["fgd"] > 0
        assert out["n_windows_generated"] == out["n_windows_reference"] > 0
        assert out["diversity_generated"] > 0
        assert out["beat_alignment_clips"] == 3
        assert 0 <= out["beat_alignment"] <= 1
        # ground-truth anchor: the reference set scored on the same audio
        assert 0 <= out["beat_alignment_reference"] <= 1

    def test_raw_mode_autoswitches_on_huge_windows(self, tmp_path, capsys):
        """Default --embedding raw with window·D beyond the covariance-FGD
        limit must fall back to the autoencoder embedding instead of
        crashing (regression: ValueError on the docstring's own default
        invocation over 1141-d features)."""
        from diffusestylegesture_tpu.cli.eval import main

        rng = np.random.default_rng(1)
        gen_dir, ref_dir = tmp_path / "g3", tmp_path / "r3"
        gen_dir.mkdir(), ref_dir.mkdir()
        for i in range(2):
            np.save(gen_dir / f"c{i}.npy",
                    rng.standard_normal((90, 300)).astype(np.float32))
            np.save(ref_dir / f"c{i}.npy",
                    rng.standard_normal((90, 300)).astype(np.float32))
        out = main([
            "--generated", str(gen_dir), "--reference", str(ref_dir),
            "--window", "40", "--stride", "20",  # 40·300 = 12,000-d raw
            "--ae_steps", "10", "--ae_latent", "8",
        ])
        assert out["embedding"] == "autoencoder"
        assert np.isfinite(out["fgd"])

    def test_kid_precision_recall_flag(self, tmp_path):
        from diffusestylegesture_tpu.cli.eval import main

        rng = np.random.default_rng(3)
        gen_dir, ref_dir = tmp_path / "g2", tmp_path / "r2"
        gen_dir.mkdir(), ref_dir.mkdir()
        for i in range(2):
            np.save(gen_dir / f"c{i}.npy",
                    rng.standard_normal((80, 6)).astype(np.float32) + 1.0)
            np.save(ref_dir / f"c{i}.npy",
                    rng.standard_normal((80, 6)).astype(np.float32))
        out = main([
            "--generated", str(gen_dir), "--reference", str(ref_dir),
            "--window", "10", "--stride", "5", "--kid",
        ])
        assert out["kid_mean"] > 0
        assert 0 <= out["precision"] <= 1 and 0 <= out["recall"] <= 1

    def test_autoencoder_embedding_fgd(self, tmp_path):
        """AE-latent FGD: ~0 for identical sets, positive for a clearly
        different motion distribution."""
        from diffusestylegesture_tpu.cli.eval import main

        rng = np.random.default_rng(7)
        ref_dir, gen_dir = tmp_path / "r", tmp_path / "g"
        ref_dir.mkdir(), gen_dir.mkdir()
        t = np.linspace(0, 8 * np.pi, 160)[:, None]
        for i in range(3):
            # reference: smooth sinusoidal motion; generated: noise
            np.save(ref_dir / f"c{i}.npy",
                    (np.sin(t + i) * np.ones((1, 6))).astype(np.float32))
            np.save(gen_dir / f"c{i}.npy",
                    rng.standard_normal((160, 6)).astype(np.float32))
        args = ["--window", "20", "--stride", "10",
                "--embedding", "autoencoder", "--ae_steps", "120",
                "--ae_latent", "8"]
        out_diff = main(["--generated", str(gen_dir), "--reference", str(ref_dir)] + args)
        out_same = main(["--generated", str(ref_dir), "--reference", str(ref_dir)] + args)
        assert out_diff["embedding"] == "autoencoder"
        assert out_same["fgd"] < 1e-3
        assert out_diff["fgd"] > 10 * max(out_same["fgd"], 1e-6)

    def test_identical_sets_have_zero_fgd(self, tmp_path):
        from diffusestylegesture_tpu.cli.eval import main

        rng = np.random.default_rng(1)
        d = tmp_path / "x"
        d.mkdir()
        np.save(d / "a.npy", rng.standard_normal((200, 6)).astype(np.float32))
        out = main([
            "--generated", str(d), "--reference", str(d),
            "--window", "10", "--stride", "5",
        ])
        assert abs(out["fgd"]) < 1e-3


class TestCLIImports:
    def test_all_cli_modules_import(self):
        import importlib

        for m in ("train", "sample", "sample_beat", "prepare_data", "convert_ckpt",
                  "zeroeggs", "eval", "serve", "distill"):
            importlib.import_module(f"diffusestylegesture_tpu.cli.{m}")


class TestVelocityRetention:
    def test_frozen_clip_detected(self, tmp_path):
        import json

        from diffusestylegesture_tpu.cli.eval import main

        rng = np.random.default_rng(3)
        gen_dir, ref_dir = tmp_path / "g", tmp_path / "r"
        gen_dir.mkdir(); ref_dir.mkdir()
        for i in range(3):
            ref = rng.standard_normal((120, 9)).astype(np.float32)
            np.save(ref_dir / f"clip{i}.npy", ref)
            if i == 1:  # frozen: one pose repeated for the whole clip
                np.save(gen_dir / f"clip{i}.npy",
                        np.tile(ref[:1], (120, 1)))
            else:
                np.save(gen_dir / f"clip{i}.npy",
                        rng.standard_normal((120, 9)).astype(np.float32))
        out = main(["--generated", str(gen_dir), "--reference",
                    str(ref_dir), "--window", "20", "--stride", "10"])
        assert out["velocity_clips_matched"] == 3
        assert out["frozen_clips"] == 1
        assert out["frozen_clip_stems"] == ["clip1"]
        assert out["velocity_retention_min"] < 0.01
        # healthy iid-noise clips retain ~1x the reference velocity
        assert out["velocity_retention_mean"] < 1.5
        assert json.dumps(out)  # JSON-serializable

    def test_unmatched_stems_report_none(self, tmp_path):
        from diffusestylegesture_tpu.cli.eval import main

        rng = np.random.default_rng(4)
        gen_dir, ref_dir = tmp_path / "g", tmp_path / "r"
        gen_dir.mkdir(); ref_dir.mkdir()
        np.save(gen_dir / "a.npy", rng.standard_normal((60, 5)).astype(np.float32))
        np.save(ref_dir / "b.npy", rng.standard_normal((60, 5)).astype(np.float32))
        out = main(["--generated", str(gen_dir), "--reference",
                    str(ref_dir), "--window", "20", "--stride", "10"])
        assert out["velocity_clips_matched"] == 0
        assert out["velocity_retention_min"] is None
        assert out["frozen_clips"] == 0
