"""BEAT/TWH end-to-end feature assembly.

Parity targets:
  * `load_audio` (`process_TWH_bvh.py:100-132`): per-frame 1133-d audio =
    [MFCC-40 | mel-64 | prosody-4 | WavLM-1024 (interpolated) | onset-1],
    cropped to the shortest modality;
  * `load_metadata` (`process_TWH_bvh.py:228-268`): GENEA metadata CSV →
    (num_speakers, by-fname and by-index dicts of (has_finger, speaker_id));
  * `Grid2tsv` (`process_BEAT_bvh.py:213-220`): Praat TextGrid word tier →
    tab-separated (start, end, word) — implemented with a small built-in
    TextGrid reader (the reference depends on the `textgrid` package);
  * `make_gesture_dataset` / `prepare_data` step — `build_beat_twh_clip`
    fuses gesture + audio + text into the h5-builder clip dict.
"""
from __future__ import annotations

import csv
import re
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..audio import features as AF
from ..motion import pipeline as MP
from .text import load_tsv


def load_audio_features(
    wav: np.ndarray,
    sr: int,
    wavlm_features: Optional[np.ndarray] = None,
) -> np.ndarray:
    """(T, 1133) fused per-frame audio features (parity: `load_audio`).

    `wavlm_features` is the (T', 1024) WavLM output from
    `models.wavlm.make_twh_wavlm_fn`; zeros are substituted when absent so
    offline tests can run without the 317 M-param encoder.
    """
    mfcc_f = AF.mfcc(wav, sr)
    melspec_f = AF.log_melspectrogram(wav, sr)
    prosody = AF.prosodic_features(wav, sr)
    crop = min(mfcc_f.shape[0], melspec_f.shape[0], prosody.shape[0])

    if wavlm_features is None:
        wavlm_i = np.zeros((crop, 1024), np.float32)
    else:
        from ..models.wavlm.model import interpolate_linear
        import jax.numpy as jnp

        wavlm_i = np.asarray(
            interpolate_linear(jnp.asarray(wavlm_features)[None], crop)[0]
        )

    onsets = AF.onset_flags(wav, sr, crop)
    return np.concatenate(
        [
            mfcc_f[:crop],
            melspec_f[:crop],
            prosody[:crop],
            wavlm_i,
            onsets.reshape(-1, 1).astype(np.float32),
        ],
        axis=1,
    )


def load_metadata(metadata_csv: str, participant: str = "main-agent"):
    """GENEA-2023 metadata (parity: `load_metadata:228-268`)."""
    assert participant in ("main-agent", "interloctr")
    metadict_byfname: Dict[str, Tuple[bool, int]] = {}
    metadict_byindex: Dict[int, Tuple[bool, int]] = {}
    speaker_ids: List[int] = []
    with open(metadata_csv) as f:
        for i, line in enumerate(f.readlines()[1:]):
            fname, main_id, main_finger, iloc_id, iloc_finger = line.strip().split(",")
            if participant == "main-agent":
                has_finger = main_finger == "finger_incl"
                speaker_id = int(main_id) - 1
            else:
                has_finger = iloc_finger == "finger_incl"
                speaker_id = int(iloc_id) - 1
            speaker_ids.append(speaker_id)
            metadict_byindex[i] = (has_finger, speaker_id)
            metadict_byfname[f"{fname}_{participant}"] = (has_finger, speaker_id)
    num_speakers = int(np.unique(np.array(speaker_ids)).shape[0])
    return num_speakers, metadict_byfname, metadict_byindex


def textgrid_to_tsv(textgrid_path: str, tsv_path: Optional[str] = None) -> str:
    """Word tier of a Praat TextGrid → tsv (parity: `Grid2tsv:213-220`)."""
    intervals = _read_textgrid_first_tier(textgrid_path)
    tsv_path = tsv_path or textgrid_path.replace(".TextGrid", ".tsv")
    with open(tsv_path, "w", newline="") as f:
        w = csv.writer(f, delimiter="\t")
        for xmin, xmax, mark in intervals:
            if mark == "":
                continue
            w.writerow([xmin, xmax, mark])
    return tsv_path


def _read_textgrid_first_tier(path: str) -> List[Tuple[float, float, str]]:
    """Minimal long/short-format TextGrid interval reader (first tier)."""
    text = open(path, encoding="utf-8", errors="ignore").read()
    out: List[Tuple[float, float, str]] = []
    # long format: intervals [k]: xmin = .. xmax = .. text = ".."
    pattern = re.compile(
        r"intervals\s*\[\d+\]\s*:?\s*xmin\s*=\s*([\d.eE+-]+)\s*xmax\s*=\s*([\d.eE+-]+)\s*text\s*=\s*\"(.*?)\"",
        re.S,
    )
    # first tier only (reference: `tg.tiers[0]`, Grid2tsv:214): split at
    # the long-format per-tier headers and take EXACTLY the first tier's
    # chunk — scanning further tiers for "the first one with intervals"
    # would leak a phones tier whenever tier 1 is a PointTier or empty,
    # and an xmin-restarts-at-zero heuristic leaks on trimmed TextGrids
    tier_chunks = re.split(r"item\s*\[\d+\]\s*:", text)
    if len(tier_chunks) > 1:
        return [(float(a), float(b), m)
                for a, b, m in pattern.findall(tier_chunks[1])]
    matches = pattern.findall(text)
    if matches:
        # degenerate long format without item headers: single tier assumed
        return [(float(a), float(b), m) for a, b, m in matches]
    # short format: after the per-tier header ("IntervalTier", name, xmin,
    # xmax, count) the intervals follow as bare (xmin, xmax, "text") triples
    lines = [ln.strip() for ln in text.splitlines() if ln.strip()]
    try:
        ti = next(i for i, ln in enumerate(lines) if "IntervalTier" in ln)
        n = int(float(lines[ti + 4]))
        pos = ti + 5
        for _ in range(n):
            xmin = float(lines[pos])
            xmax = float(lines[pos + 1])
            mark = lines[pos + 2].strip().strip('"')
            out.append((xmin, xmax, mark))
            pos += 3
        return out
    except (StopIteration, ValueError, IndexError):
        raise ValueError(f"unrecognized TextGrid format: {path}")


def build_beat_twh_clip(
    bvh_path: str,
    wav: np.ndarray,
    sr: int,
    tsv_path: str,
    word2vector: Dict[str, np.ndarray],
    speaker_onehot: np.ndarray,
    dataset: str = "TWH",
    wavlm_features: Optional[np.ndarray] = None,
) -> Dict[str, np.ndarray]:
    """One clip → h5-builder dict {'speaker_id','gesture','audio','text'}."""
    if dataset == "BEAT":
        gesture, _ = MP.beat_features(bvh_path)
        laughter = False
    else:
        gesture, _ = MP.twh_features(bvh_path)
        laughter = True
    audio = load_audio_features(wav, sr, wavlm_features)
    clip_len = min(len(gesture), len(audio))
    text = load_tsv(tsv_path, word2vector, clip_len, laughter_flag=laughter)
    return dict(
        speaker_id=speaker_onehot.astype(np.float32),
        gesture=gesture[:clip_len],
        audio=audio[:clip_len].astype(np.float32),
        text=text.astype(np.float32),
    )
