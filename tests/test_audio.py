"""Audio feature tests: Sphinx MFCC parity + librosa-compatible features."""
import sys
import types
import ref_compat

import numpy as np
import pytest

from conftest import requires_reference, REFERENCE_ROOT

from diffusestylegesture_tpu.audio import features as F
from diffusestylegesture_tpu.audio import sphinx_mfcc_energy


def synth_wav(seconds=2.0, sr=16000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    y = (
        0.4 * np.sin(2 * np.pi * 220 * t)
        + 0.2 * np.sin(2 * np.pi * 440 * t * (1 + 0.1 * np.sin(2 * np.pi * 0.5 * t)))
        + 0.05 * rng.standard_normal(len(t))
    )
    # amplitude bursts to give onsets/energy structure
    env = 0.3 + 0.7 * (np.sin(2 * np.pi * 1.5 * t) > 0)
    return (y * env).astype(np.float32)


@requires_reference
class TestSphinxParity:
    def test_sig2s2mfc_energy(self):
        if "librosa" not in sys.modules:
            sys.modules["librosa"] = ref_compat.stub_module("librosa")  # import-only stub
        sys.path.insert(0, f"{REFERENCE_ROOT}/main/mydiffusion_zeggs")
        import mfcc as ref_mfcc  # type: ignore

        y = synth_wav(1.3)
        obj = ref_mfcc.MFCC(frate=20)
        theirs = obj.sig2s2mfc_energy(y.astype("d"), None)
        ours = sphinx_mfcc_energy(y, frate=20)
        assert ours.shape == theirs.shape
        np.testing.assert_allclose(ours, theirs, atol=1e-8)

    def test_tail_resize_quirk(self):
        if "librosa" not in sys.modules:
            sys.modules["librosa"] = ref_compat.stub_module("librosa")
        sys.path.insert(0, f"{REFERENCE_ROOT}/main/mydiffusion_zeggs")
        import mfcc as ref_mfcc  # type: ignore

        # length chosen so last frame is partial
        y = synth_wav(1.0)[: 16000 - 250]
        obj = ref_mfcc.MFCC(frate=20)
        theirs = obj.sig2s2mfc_energy(y.astype("d"), None)
        ours = sphinx_mfcc_energy(y, frate=20)
        np.testing.assert_allclose(ours, theirs, atol=1e-8)

    def test_derivative_average_parity(self):
        sys.path.insert(0, f"{REFERENCE_ROOT}/BEAT-TWH-main/process")
        # tool.py imports librosa/essentia/pydub/parselmouth — compare
        # against a hand-run of the same formulas instead.
        t = np.arange(0, 3.0, 0.01)
        f = np.sin(t * 3)
        der = F.derivative(t, f)
        x = 1000 * t
        dx = x[1] - x[0]
        cf = np.convolve(f, [1, -1]) / dx
        expected = cf[:-1].copy()
        expected[0] = 0
        np.testing.assert_allclose(der, expected)
        np.testing.assert_allclose(F.average(f, 10), f[:300].reshape(-1, 10).mean(1))


class TestLibrosaCompat:
    def test_melspectrogram_shape_and_energy(self):
        y = synth_wav(2.0)
        S = F.melspectrogram(y, 16000)
        assert S.shape[0] == 64
        # 220 Hz fundamental should put energy in low mel bands
        band_energy = S.mean(axis=1)
        assert band_energy[:16].sum() > band_energy[32:].sum()

    def test_mfcc_shape(self):
        y = synth_wav(2.0)
        m = F.mfcc(y, 16000)
        assert m.shape[1] == 40
        logm = F.log_melspectrogram(y, 16000)
        assert logm.shape[1] == 64
        assert m.shape[0] == logm.shape[0]

    @pytest.mark.skipif(
        not pytest.importorskip("importlib.util").find_spec("librosa"),
        reason="librosa not installed",
    )
    def test_exact_librosa(self):  # pragma: no cover - env without librosa
        import librosa

        y = synth_wav(1.0)
        S_ref = librosa.feature.melspectrogram(
            y=y, sr=16000, n_fft=4096, hop_length=533, n_mels=64
        )
        S = F.melspectrogram(y, 16000, 4096, 533, 64)
        np.testing.assert_allclose(S, S_ref, rtol=1e-4, atol=1e-6)


class TestGoldenFixtures:
    """Committed golden npz so the mel/MFCC/prosody/onset checks ALWAYS run
    (the exact-librosa test env-skips when librosa is absent). Goldens were
    generated from this implementation at the commit introducing them —
    they pin regressions; absolute librosa agreement is covered by
    `test_exact_librosa` (when librosa exists) plus the analytic invariants
    below."""

    @pytest.fixture(scope="class")
    def golden(self):
        import os

        path = os.path.join(os.path.dirname(__file__), "fixtures", "audio_golden.npz")
        return np.load(path)

    def test_mel_mfcc_logmel(self, golden):
        y, sr = golden["y"], int(golden["sr"])
        np.testing.assert_allclose(F.melspectrogram(y, sr), golden["mel"], atol=1e-5)
        np.testing.assert_allclose(F.mfcc(y, sr), golden["mfcc"], atol=1e-4)
        np.testing.assert_allclose(
            F.log_melspectrogram(y, sr), golden["logmel"], atol=1e-4
        )

    def test_prosody_onsets(self, golden):
        y, sr = golden["y"], int(golden["sr"])
        np.testing.assert_allclose(
            F.prosodic_features(y, sr), golden["prosody"], atol=1e-5
        )
        np.testing.assert_array_equal(F.onset_flags(y, sr, 60), golden["onsets"])


class TestAnalyticInvariants:
    """Librosa-independent correctness anchors for the mel/MFCC path."""

    def test_sine_lands_in_correct_mel_band(self):
        sr = 16000
        t = np.arange(sr) / sr
        f = 1000.0
        y = np.sin(2 * np.pi * f * t).astype(np.float32)
        mel = F.melspectrogram(y, sr)
        fb = F.mel_filterbank(sr, F.NFFT, F.DIM)
        centers = []
        freqs = np.linspace(0, sr / 2, 1 + F.NFFT // 2)
        for row in fb:
            centers.append(freqs[np.argmax(row)])
        band = int(np.argmax(mel.mean(axis=1)))
        assert abs(centers[band] - f) < 150.0  # within one band width at 1 kHz

    def test_filterbank_slaney_normalization(self):
        # each Slaney-normalized triangle integrates to ~2/(f_hi-f_lo):
        # peak value * half base * 2 ... == area 1 after enorm ⇒ row sums
        # scale like 2*df_bin/(f_hi-f_lo). Check a mid filter numerically.
        sr, n_fft, n_mels = 16000, F.NFFT, F.DIM
        fb = F.mel_filterbank(sr, n_fft, n_mels)
        freqs = np.linspace(0, sr / 2, 1 + n_fft // 2)
        mel_pts = F.mel_to_hz_slaney(
            np.linspace(F.hz_to_mel_slaney(0), F.hz_to_mel_slaney(sr / 2), n_mels + 2)
        )
        i = n_mels // 2
        df = freqs[1] - freqs[0]
        area = fb[i].sum() * df
        assert area == pytest.approx(1.0, rel=0.05)  # Slaney: unit area

    def test_dct_orthonormal(self):
        # constant log-mel spectrum → only the DC cepstral coefficient
        sr = 16000
        y = np.zeros(sr, np.float32)
        m = F.mfcc(y, sr)
        assert np.abs(m[:, 1:]).max() < 1e-3 * max(1.0, np.abs(m[:, 0]).max())

    def test_stft_impulse_is_window(self):
        # |STFT|² of a unit impulse at a frame center = hann(n)² at that lag
        n_fft, hop = 256, 64
        y = np.zeros(1024, np.float32)
        y[256] = 1.0
        S = F.stft_power(y, n_fft, hop)
        k = 256 // hop  # frame centered on the impulse (centered stft)
        # total power in that frame = w[center]^2 summed over rfft bins via
        # Parseval: sum |X|^2 = n * sum |x|^2 with x = w·δ = w[c]·δ
        wc = F._hann_periodic(n_fft)[n_fft // 2]
        col = S[:, k]
        full = np.concatenate([col, col[-2:0:-1]])  # hermitian double
        assert full.sum() == pytest.approx(n_fft * wc**2, rel=1e-4)


class TestProsodyOnsets:
    def test_prosody_shapes_and_voicing(self):
        y = synth_wav(3.0)
        p = F.prosodic_features(y, 16000)
        assert p.shape[1] == 4
        assert p.shape[0] >= 80  # ~30 fps over 3 s
        # pitched signal → nonzero pitch channel somewhere
        assert (p[:, 2] > 0).any()
        assert np.isfinite(p).all()

    def test_onset_flags(self):
        y = synth_wav(3.0)
        flags = F.onset_flags(y, 16000, 90)
        assert flags.shape == (90,)
        assert set(np.unique(flags)).issubset({0.0, 1.0})
        assert flags.sum() >= 1  # bursty envelope → at least one onset


class TestEssentiaOnsetPort:
    """Analytic pins for the essentia `Onsets`/aubio peak-picker port
    (VERDICT r2 item 5). essentia itself is absent from this image, so
    these are ground-truth-by-construction signals: click trains at
    known positions, silence, steady tones."""

    def _clicks(self, times, seconds=2.0, sr=16000, amp=1.0):
        y = 0.001 * np.random.default_rng(0).standard_normal(
            int(seconds * sr)).astype(np.float32)
        for t in times:
            i = int(t * sr)
            y[i:i + 160] += amp * np.sin(
                2 * np.pi * 4000 * np.arange(160) / sr).astype(np.float32)
        return y

    def test_click_train_positions(self):
        sr = 16000
        truth = [0.5, 1.0, 1.5]
        y = self._clicks(truth, sr=sr)
        onsets = F.detect_onsets(y, sr)
        assert len(onsets) == 3
        # the biquad smoother delays a sharp attack by ~1 ODF frame
        # (32 ms @ hop 512); allow 2 frames
        for t, o in zip(truth, onsets):
            assert abs(o - t) <= 2 * 512 / sr + 1e-9

    def test_silence_and_dc(self):
        assert len(F.detect_onsets(np.zeros(16000, np.float32), 16000)) == 0
        # a DC step has exactly two spectral events: turn-on and cut-off
        onsets = F.detect_onsets(np.full(16000, 0.5, np.float32), 16000)
        assert all(o < 0.2 or o > 0.9 for o in onsets)

    def test_steady_tone_only_attack(self):
        sr = 16000
        t = np.arange(2 * sr) / sr
        y = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        onsets = F.detect_onsets(y, sr)
        # the signal turning on is a legitimate onset; nothing after
        assert all(o < 0.2 for o in onsets)

    def test_quiet_clicks_below_silence_gate(self):
        # clicks whose normalized ODF stays under silenceThreshold next
        # to one loud click are gated out (essentia silenceThreshold
        # semantics on the max-normalized ODF)
        sr = 16000
        y = self._clicks([0.5], sr=sr, amp=1.0)
        y += self._clicks([1.2], sr=sr, amp=0.01) - self._clicks([], sr=sr)
        onsets = F.detect_onsets(y, sr)
        assert len(onsets) == 1 and abs(onsets[0] - 0.5) < 0.1

    def test_essentia_onsets_weighted_sum(self):
        # two ODFs, weights [1, 3] — a peak present only in the heavier
        # function dominates
        n = 50
        odf_a = np.zeros(n); odf_a[10] = 1.0
        odf_b = np.zeros(n); odf_b[30] = 1.0
        times = F.essentia_onsets(
            np.stack([odf_a, odf_b]), [1.0, 3.0], frame_rate=1.0,
            silence_threshold=0.04)
        assert any(abs(t - 30) <= 2 for t in times)

    def test_biquad_dc_gain_unity(self):
        # aubio low-pass: unity DC gain, so the adaptive threshold's
        # median/mean operate at the ODF's own scale
        b0, b1, b2 = F._AUBIO_B
        a1, a2 = F._AUBIO_A
        assert (b0 + b1 + b2) / (1 + a1 + a2) == pytest.approx(1.0, abs=1e-6)

    def test_frame_centering(self):
        # essentia FrameGenerator startFromZero=false: frame j is
        # centered at j·hop — an impulse at sample 512 peaks the ODF at
        # frame 1, not frame 0
        y = np.zeros(4096, np.float32)
        y[512] = 1.0
        odf = F.hfc_odf(y, 16000)
        assert int(np.argmax(odf)) == 1
