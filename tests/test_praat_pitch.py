"""Accuracy tests for the Boersma-1993 / praat pitch+intensity port.

parselmouth is not installed in this environment, so correctness is
established against analytically known signals: pure/harmonic tones with
exact f0 (tracker must recover it to sub-percent accuracy), silence and
noise (must be classified unvoiced), octave-jump robustness from the
Viterbi costs, and intensity of a sine with a closed-form dB value.
"""
import numpy as np
import pytest

from diffusestylegesture_tpu.audio.praat_pitch import (
    PitchConfig,
    intensity_value_at_time,
    pitch_value_at_time,
    sound_to_intensity,
    sound_to_pitch_ac,
)

SR = 16000


def harmonic_tone(f0, duration, sr=SR, nharm=5, amp=0.3, seed=0):
    t = np.arange(int(duration * sr)) / sr
    rng = np.random.default_rng(seed)
    phases = rng.uniform(0, 2 * np.pi, nharm)
    y = sum(
        (amp / (k + 1)) * np.sin(2 * np.pi * f0 * (k + 1) * t + phases[k])
        for k in range(nharm)
    )
    return y.astype(np.float64)


class TestPitch:
    @pytest.mark.parametrize("f0", [110.0, 220.0, 330.5, 440.0])
    def test_recovers_f0(self, f0):
        y = harmonic_tone(f0, 0.8)
        times, freqs = sound_to_pitch_ac(y, SR, 1.0 / 300.0)
        voiced = freqs[freqs > 0]
        assert len(voiced) > 0.9 * len(freqs)
        rel_err = np.abs(voiced - f0) / f0
        assert np.median(rel_err) < 2e-3, f"median rel err {np.median(rel_err)}"
        assert rel_err.max() < 1e-2

    def test_silence_unvoiced(self):
        y = np.zeros(SR // 2)
        _, freqs = sound_to_pitch_ac(y, SR, 1.0 / 300.0)
        assert (freqs == 0).all()

    def test_white_noise_mostly_unvoiced(self):
        rng = np.random.default_rng(3)
        y = rng.standard_normal(SR) * 0.1
        _, freqs = sound_to_pitch_ac(y, SR, 1.0 / 300.0)
        assert (freqs == 0).mean() > 0.8

    def test_vibrato_tracked(self):
        # 200 Hz with ±3% vibrato at 5 Hz
        t = np.arange(int(0.8 * SR)) / SR
        f_inst = 200.0 * (1 + 0.03 * np.sin(2 * np.pi * 5 * t))
        phase = 2 * np.pi * np.cumsum(f_inst) / SR
        y = 0.3 * np.sin(phase)
        times, freqs = sound_to_pitch_ac(y, SR, 1.0 / 300.0)
        m = freqs > 0
        assert m.mean() > 0.9
        assert freqs[m].min() > 185 and freqs[m].max() < 215
        assert freqs[m].std() > 1.0  # actually follows the modulation

    def test_no_octave_errors_on_strong_second_harmonic(self):
        # second harmonic stronger than the fundamental: naive peak-picking
        # would report 300 Hz; the octave cost + candidate search must not.
        t = np.arange(int(0.6 * SR)) / SR
        y = 0.15 * np.sin(2 * np.pi * 150 * t) + 0.3 * np.sin(2 * np.pi * 300 * t)
        _, freqs = sound_to_pitch_ac(y, SR, 1.0 / 300.0)
        voiced = freqs[freqs > 0]
        assert len(voiced) > 0
        assert np.median(np.abs(voiced - 150.0)) < 3.0

    def test_voiced_unvoiced_transition(self):
        y = np.concatenate([
            harmonic_tone(220.0, 0.4),
            np.zeros(int(0.4 * SR)),
        ])
        times, freqs = sound_to_pitch_ac(y, SR, 1.0 / 300.0)
        first = freqs[times < 0.35]
        second = freqs[times > 0.45]
        assert (first > 0).mean() > 0.9
        assert (second == 0).mean() > 0.9

    def test_value_at_time_interpolation(self):
        times = np.array([0.1, 0.2, 0.3])
        freqs = np.array([100.0, 110.0, 0.0])
        v = pitch_value_at_time(times, freqs, [0.15, 0.1, 0.05, 0.21])
        assert abs(v[0] - 105.0) < 1e-9  # linear midpoint
        assert abs(v[1] - 100.0) < 1e-9
        assert abs(v[2] - 100.0) < 1e-9  # edge extrapolation
        # bracketing an unvoiced frame → nearest voiced neighbor
        assert abs(v[3] - 110.0) < 1e-9
        v2 = pitch_value_at_time(times, freqs, [0.29])
        assert np.isnan(v2[0])  # nearest frame unvoiced → undefined


class TestIntensity:
    def test_sine_db_closed_form(self):
        # A=0.1 sine: mean p² = A²/2 = 5e-3 → 10·log10(5e-3/4e-10) ≈ 70.969 dB
        t = np.arange(SR) / SR
        y = 0.1 * np.sin(2 * np.pi * 1000 * t)
        times, vals = sound_to_intensity(y, SR, 1.0 / 300.0)
        expect = 10 * np.log10((0.1**2 / 2) / 4e-10)
        mid = vals[(times > 0.2) & (times < 0.8)]
        assert np.abs(mid - expect).max() < 0.05, (mid.mean(), expect)

    def test_dc_removed(self):
        # praat subtracts the window-weighted mean pressure: DC offset must
        # not change the intensity of the superposed sine
        t = np.arange(SR) / SR
        y = 0.1 * np.sin(2 * np.pi * 440 * t)
        t1, v1 = sound_to_intensity(y, SR, 1.0 / 300.0)
        t2, v2 = sound_to_intensity(y + 0.5, SR, 1.0 / 300.0)
        sel = (t1 > 0.2) & (t1 < 0.8)
        np.testing.assert_allclose(v1[sel], v2[sel], atol=1e-6)

    def test_value_cubic_interp(self):
        times = np.array([0.0, 0.1, 0.2, 0.3])
        vals = np.array([1.0, 2.0, 3.0, 4.0])  # linear data → cubic is exact
        v = intensity_value_at_time(times, vals, [0.05, 0.15, 0.25, -1.0, 9.0])
        np.testing.assert_allclose(v[:3], [1.5, 2.5, 3.5], atol=1e-12)
        assert v[3] == 1.0 and v[4] == 4.0  # clamped edges


class TestProsodyIntegration:
    def test_prosodic_features_through_praat_port(self):
        from diffusestylegesture_tpu.audio.features import prosodic_features

        y = np.concatenate([
            harmonic_tone(180.0, 0.7, amp=0.2),
            np.zeros(int(0.3 * SR)),
        ]).astype(np.float32)
        feats = prosodic_features(y, SR)
        assert feats.shape[1] == 4
        assert np.isfinite(feats).all()
        energy, energy_der, pitch, pitch_der = feats.T
        # voiced region carries pitch ≈ clip(log(180+1)-4, 0) ≈ 1.198
        assert pitch[:10].mean() == pytest.approx(np.log(181.0) - 4, abs=0.15)
        # trailing silence: pitch channel decays to 0
        assert pitch[-3:].max() < 0.3
        assert energy[:10].mean() > 0
