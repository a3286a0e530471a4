"""A/B-validate the essentia `Onsets` port the moment essentia exists.

essentia is not importable in this image, so the port in
`audio/features.py` (Masri HFC + aubio/Brossier peak-picker with
essentia framing) is pinned by analytic click-train tests and goldens
rather than a live A/B (see PARITY.md row 26). This script closes that
loop on any machine that has essentia installed:

  python scripts/validate_essentia_onsets.py [wav ...]

With no arguments it synthesizes the deterministic probe set (click
trains, bursty speech-like signals, tones). For each signal it runs
essentia's own pipeline exactly as the reference does
(`BEAT-TWH-main/process/tool.py:219-244`: FrameGenerator 1024/512,
hann, FFT→CartesianToPolar, OnsetDetection(hfc), Onsets at
frameRate 16000/512 silenceThreshold 0.04) and our `detect_onsets`,
then reports per-signal onset matches within a stated tolerance
(default 2 ODF frames = 64 ms) and the end-to-end flag agreement on the
30 fps onset-flag dim. Exits non-zero if agreement is below 90%.
"""
from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SR = 16000
TOL_FRAMES = 2  # ODF frames (32 ms each)


def probe_signals():
    rng = np.random.default_rng(0)
    out = {}
    y = 0.001 * rng.standard_normal(2 * SR).astype(np.float32)
    for t in (0.5, 1.0, 1.5):
        i = int(t * SR)
        y[i:i + 160] += np.sin(2 * np.pi * 4000 * np.arange(160) / SR).astype(np.float32)
    out["clicks"] = y
    t = np.arange(3 * SR) / SR
    w = (0.4 * np.sin(2 * np.pi * 220 * t)
         + 0.2 * np.sin(2 * np.pi * 440 * t * (1 + 0.1 * np.sin(2 * np.pi * 0.5 * t)))
         + 0.05 * rng.standard_normal(len(t)))
    env = 0.3 + 0.7 * (np.sin(2 * np.pi * 1.5 * t) > 0)
    out["bursty"] = (w * env).astype(np.float32)
    out["tone"] = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    return out


def essentia_reference_onsets(y: np.ndarray) -> np.ndarray:
    """The reference's exact essentia pipeline (`tool.py:219-244`)."""
    import essentia
    from essentia.standard import (CartesianToPolar, FFT, FrameGenerator,
                                   OnsetDetection, Onsets, Windowing)

    od_hfc = OnsetDetection(method="hfc", sampleRate=SR)
    w = Windowing(type="hann")
    fft = FFT()
    c2p = CartesianToPolar()
    pool = essentia.Pool()
    for frame in FrameGenerator(y.astype(np.float32), frameSize=1024, hopSize=512):
        mag, phase = c2p(fft(w(frame)))
        pool.add("odf.hfc", od_hfc(mag, phase))
    onsets = Onsets(frameRate=SR / 512.0, silenceThreshold=0.04)
    return np.asarray(onsets(essentia.array([pool["odf.hfc"]]), [1]))


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    try:
        import essentia  # noqa: F401
    except ImportError:
        print("essentia not importable in this environment — nothing to "
              "validate (the port stays pinned by the analytic tests).",
              file=sys.stderr)
        return 2

    from diffusestylegesture_tpu.audio.features import detect_onsets, onset_flags

    signals = {}
    if argv:
        from diffusestylegesture_tpu.data import load_wav_16k

        for p in argv:
            signals[os.path.basename(p)] = load_wav_16k(p)
    else:
        signals = probe_signals()

    tol_s = TOL_FRAMES * 512 / SR
    total_match = total = 0
    flag_agrees = []
    for name, y in signals.items():
        theirs = essentia_reference_onsets(y)
        ours = detect_onsets(y, SR)
        matched = sum(1 for t in theirs if len(ours) and np.abs(ours - t).min() <= tol_s)
        spurious = sum(1 for o in ours if not len(theirs) or np.abs(theirs - o).min() > tol_s)
        n_frames = int(len(y) / SR * 30)
        flags = onset_flags(y, SR, n_frames)
        # their flags, reference downstream (`process_TWH_bvh.py:124-131`)
        silence = np.zeros(len(y))
        if len(theirs):
            silence[np.clip(theirs * SR, 0, len(y) - 1).astype(np.int64)] = 1
        xp = np.linspace(0, len(y) - 1, num=n_frames + 1)
        tflags = np.array([
            float(len(silence[int(xp[i - 1]):int(xp[i])]) and
                  silence[int(xp[i - 1]):int(xp[i])].max() == 1)
            for i in range(1, n_frames + 1)])
        flag_agree = float((flags == tflags).mean())
        print(f"{name}: essentia {len(theirs)} onsets, ours {len(ours)}; "
              f"matched {matched}/{len(theirs)} (±{tol_s * 1000:.0f} ms), "
              f"{spurious} spurious; flag agreement {flag_agree:.1%}")
        # symmetric score: misses AND spurious detections both count
        # against — a recall-only rate would pass a port that fires on
        # every frame (all of essentia's onsets matched, plus hundreds
        # of spurious ones)
        total += max(len(theirs), len(ours), 1)
        total_match += (matched if (len(theirs) or len(ours))
                        else 1)  # both silent = perfect agreement
        flag_agrees.append(flag_agree)

    rate = total_match / total
    flag_rate = float(np.mean(flag_agrees)) if flag_agrees else 1.0
    print(f"overall onset match rate: {rate:.1%}; "
          f"mean flag agreement: {flag_rate:.1%}")
    # both axes gate (the docstring's 90% contract covers the FLAG, the
    # dimension the BEAT/TWH models actually consume)
    return 0 if rate >= 0.9 and flag_rate >= 0.9 else 1


if __name__ == "__main__":
    raise SystemExit(main())
