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
