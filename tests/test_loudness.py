"""EBU R128 / BS.1770-4 loudness: spec-table coefficients, reference sine
levels, gating, normalization targets."""
import numpy as np
import pytest

from diffusestylegesture_tpu.audio.loudness import (
    integrated_loudness,
    k_weighting_coeffs,
    normalize_loudness,
    true_peak_db,
)

FS = 48000.0

# ITU-R BS.1770-4 Table 1 (stage-1 shelf) and Table 2 (stage-2 high-pass),
# specified at 48 kHz
TABLE1_B = [1.53512485958697, -2.69169618940638, 1.19839281085285]
TABLE1_A = [1.0, -1.69065929318241, 0.73248077421585]
TABLE2_B = [1.0, -2.0, 1.0]
TABLE2_A = [1.0, -1.99004745483398, 0.99007225036621]


class TestCoefficients:
    def test_matches_spec_tables_at_48k(self):
        (b1, a1), (b2, a2) = k_weighting_coeffs(FS)
        np.testing.assert_allclose(b1, TABLE1_B, atol=1e-6)
        np.testing.assert_allclose(a1, TABLE1_A, atol=1e-6)
        np.testing.assert_allclose(b2, TABLE2_B, atol=1e-5)
        np.testing.assert_allclose(a2, TABLE2_A, atol=1e-5)


class TestIntegratedLoudness:
    def test_fullscale_997hz_sine_is_minus_3_lufs(self):
        """BS.1770: a 0 dBFS 997 Hz sine reads −3.01 LUFS (the shelf gain
        region starts above ~2 kHz; 997 Hz passes at unity)."""
        t = np.arange(int(10 * FS)) / FS
        y = np.sin(2 * np.pi * 997.0 * t)
        loud = integrated_loudness(y, FS)
        assert abs(loud - (-3.01)) < 0.1, loud

    def test_level_shift_tracks_gain(self):
        t = np.arange(int(5 * FS)) / FS
        y = np.sin(2 * np.pi * 997.0 * t)
        a = integrated_loudness(y, FS)
        b = integrated_loudness(0.1 * y, FS)
        assert abs((a - b) - 20.0) < 0.05

    def test_works_at_16k(self):
        fs = 16000.0
        t = np.arange(int(5 * fs)) / fs
        loud = integrated_loudness(np.sin(2 * np.pi * 997.0 * t), fs)
        assert abs(loud - (-3.01)) < 0.15, loud

    def test_gating_ignores_silence_padding(self):
        """Appending silence must not drag integrated loudness down
        (the −70 LUFS absolute gate drops silent blocks)."""
        fs = 16000.0
        t = np.arange(int(4 * fs)) / fs
        tone = 0.25 * np.sin(2 * np.pi * 997.0 * t)
        padded = np.concatenate([tone, np.zeros(int(8 * fs))])
        a = integrated_loudness(tone, fs)
        b = integrated_loudness(padded, fs)
        assert abs(a - b) < 0.3, (a, b)

    def test_silence_is_neg_inf(self):
        assert integrated_loudness(np.zeros(48000), FS) == float("-inf")


class TestTruePeak:
    def test_intersample_peak_detected(self):
        """A sine near fs/4 with samples straddling its crest has an
        inter-sample peak above the sample peak; 4× oversampling sees it."""
        fs = 16000.0
        t = np.arange(int(1 * fs)) / fs
        y = 0.5 * np.sin(2 * np.pi * (fs / 4.0) * t + np.pi / 4)
        sample_peak_db = 20 * np.log10(np.max(np.abs(y)))
        tp = true_peak_db(y, fs)
        assert tp >= sample_peak_db - 0.01
        assert tp - sample_peak_db > 0.5  # genuinely inter-sample


class TestNormalize:
    def test_hits_target(self):
        fs = 16000.0
        t = np.arange(int(6 * fs)) / fs
        y = 0.03 * np.sin(2 * np.pi * 440.0 * t)
        out = normalize_loudness(y, fs, target_lufs=-23.0)
        assert abs(integrated_loudness(out, fs) - (-23.0)) < 0.1

    def test_true_peak_ceiling_respected(self):
        fs = 16000.0
        t = np.arange(int(6 * fs)) / fs
        y = 0.001 * np.sin(2 * np.pi * 440.0 * t)  # needs huge gain
        out = normalize_loudness(y, fs, target_lufs=-1.0, true_peak_ceiling_db=-2.0)
        assert true_peak_db(out, fs) <= -2.0 + 0.05

    def test_silence_passthrough(self):
        y = np.zeros(16000, np.float32)
        np.testing.assert_array_equal(normalize_loudness(y, 16000.0), y)

    @pytest.mark.parametrize("target", [-23.0, -16.0])
    def test_targets(self, target):
        fs = 16000.0
        t = np.arange(int(5 * fs)) / fs
        y = 0.2 * np.sin(2 * np.pi * 300.0 * t)
        out = normalize_loudness(y, fs, target_lufs=target)
        assert abs(integrated_loudness(out, fs) - target) < 0.1
