"""Readiness tests for scripts/validate_real_ckpt.py (VERDICT r2 item 8).

The real released checkpoints are absent from this image, so the full
validation auto-skips; what always runs is the harness itself: the
missing-artifact gate and the BVH comparison statistics.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "validate_real_ckpt.py")

sys.path.insert(0, os.path.join(REPO, "scripts"))


def _tiny_bvh(path, rot_offset=0.0, n_frames=6):
    from diffusestylegesture_tpu.motion import bvh

    n_j = 3
    data = {
        "rotations": np.full((n_frames, n_j, 3), 10.0 + rot_offset, np.float32),
        "positions": np.zeros((n_frames, n_j, 3), np.float32),
        "offsets": np.array([[0, 0, 0], [0, 1, 0], [0, 1, 0]], np.float32),
        "parents": np.array([-1, 0, 1]),
        "names": ["Hips", "Spine", "Head"],
        "order": "zyx",
        "frametime": 1 / 20,
    }
    bvh.save(path, data, translations=False)


def test_compare_bvh_identical(tmp_path):
    import validate_real_ckpt as v

    p = str(tmp_path / "a.bvh")
    _tiny_bvh(p)
    stats = v.compare_bvh(p, p)
    assert stats["frames_ours"] == stats["frames_ref"] == 6
    assert stats["rot_rmse_deg"] == 0.0
    assert stats["root_pos_rmse"] == 0.0


def test_compare_bvh_offset_and_wraparound(tmp_path):
    import validate_real_ckpt as v

    a, b = str(tmp_path / "a.bvh"), str(tmp_path / "b.bvh")
    _tiny_bvh(a, rot_offset=0.0)
    _tiny_bvh(b, rot_offset=5.0)
    stats = v.compare_bvh(a, b)
    assert stats["rot_rmse_deg"] == pytest.approx(5.0, abs=1e-4)
    # 350° vs -10° must compare as 0, not 360
    _tiny_bvh(a, rot_offset=340.0)  # 350°
    _tiny_bvh(b, rot_offset=-20.0)  # -10°
    stats = v.compare_bvh(a, b)
    assert stats["rot_rmse_deg"] == pytest.approx(0.0, abs=1e-4)


def test_missing_artifacts_exit_2(tmp_path):
    proc = subprocess.run(
        [sys.executable, SCRIPT, "--ckpt", "/nonexistent/model.pt",
         "--wavlm", "/nonexistent/wavlm.pt", "--wav", "/nonexistent/a.wav",
         "--data_dir", str(tmp_path)],
        capture_output=True, text=True, timeout=120,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert proc.returncode == 2
    assert "MISSING" in proc.stderr


@pytest.mark.skipif(
    not (os.path.exists("model000450000.pt") and os.path.exists("WavLM-Large.pt")),
    reason="released checkpoints not present in this image (VERDICT r2 Missing #1)",
)
def test_real_checkpoint_validation():  # pragma: no cover - needs artifacts
    import validate_real_ckpt as v

    assert v.main(["--wav", "015_Happy_4_x_1_0.wav", "--data_dir", "."]) == 0
