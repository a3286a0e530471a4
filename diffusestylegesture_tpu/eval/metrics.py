"""Gesture evaluation metrics.

The reference ships a text-to-motion eval suite not wired to the gesture
path (`main/eval/eval_humanml.py:19-138`,
`main/data_loaders/humanml/utils/metrics.py:37-95`); gesture quality was
judged externally (GENEA human eval). Here the core numeric metrics are
provided framework-natively so gesture checkpoints can be compared
automatically:

  * `frechet_distance` — FID/FGD between feature-set Gaussians (same math
    as `calculate_frechet_distance`, `utils/metrics.py:37-95`);
  * `diversity` — mean pairwise distance between random sample pairs
    (`calculate_diversity`);
  * `multimodality` — per-condition pairwise distance
    (`calculate_multimodality`);
  * `beat_alignment` — audio-onset ↔ motion-kinematic-peak alignment
    score, standard in the gesture literature.
"""
from __future__ import annotations

import numpy as np
from scipy import linalg


def sqrtm(a: np.ndarray) -> np.ndarray:
    """Matrix square root without scipy's deprecated `disp` plumbing."""
    try:
        out = linalg.sqrtm(a)
    except TypeError:  # pragma: no cover - older scipy returns tuples only
        out = linalg.sqrtm(a, disp=False)[0]
    return out[0] if isinstance(out, tuple) else out


def activation_statistics(feats: np.ndarray):
    mu = np.mean(feats, axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, sigma


def frechet_distance(feats1: np.ndarray, feats2: np.ndarray, eps: float = 1e-6) -> float:
    """Fréchet distance between Gaussians fit to two feature sets.

    Guarded against runaway dimensionality: raw-mode callers flattening
    whole windows (window·D can reach ~45k dims for 1141-d gesture clips)
    would allocate two ~16 GB covariance matrices and an O(n³) sqrtm —
    use the autoencoder embedding (`eval/embedding.py`) instead."""
    if feats1.shape[1] > 8192:
        raise ValueError(
            f"feature dim {feats1.shape[1]} too large for covariance-based "
            "FGD; embed first (cli.eval --embedding autoencoder)")
    mu1, sigma1 = activation_statistics(feats1)
    mu2, sigma2 = activation_statistics(feats2)
    diff = mu1 - mu2
    covmean = sqrtm(sigma1.dot(sigma2))
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        # reference guard (`main/eval/a2m/action2motion/fid.py:53-57`,
        # same in stgcn/fid.py and humanml utils/metrics.py:137-141):
        # non-trivial imaginary parts on the sqrtm diagonal mean the
        # covariance pair is too ill-conditioned to trust — taking .real
        # silently would report a wrong-but-plausible FGD
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            raise ValueError(
                "FGD covariance sqrtm has imaginary component "
                f"{np.max(np.abs(covmean.imag)):.2e} (ill-conditioned "
                "covariances — too few windows?)")
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


def diversity(feats: np.ndarray, diversity_times: int = 300, seed: int = 0) -> float:
    """Mean pairwise L2 over random index pairs (ref `calculate_diversity`,
    `main/data_loaders/humanml/utils/metrics.py:78-79`): each index set is
    drawn WITHOUT replacement (capped at n, which the reference assumes) —
    with replacement, first[i]==second[i] collisions contribute zero
    distances and bias the estimate low on small sets."""
    n = feats.shape[0]
    times = min(diversity_times, n)
    rng = np.random.default_rng(seed)
    first = rng.choice(n, times, replace=False)
    second = rng.choice(n, times, replace=False)
    return float(np.linalg.norm(feats[first] - feats[second], axis=1).mean())


def multimodality(feats_per_cond: np.ndarray, times: int = 20, seed: int = 0) -> float:
    """feats_per_cond: (n_cond, n_samples, D). Ref `calculate_multimodality`
    (`metrics.py:89-90`): per-condition index sets drawn without
    replacement (capped at n_samples)."""
    c, n, _ = feats_per_cond.shape
    times = min(times, n)
    rng = np.random.default_rng(seed)
    first = rng.choice(n, times, replace=False)
    second = rng.choice(n, times, replace=False)
    d = np.linalg.norm(
        feats_per_cond[:, first] - feats_per_cond[:, second], axis=2
    )
    return float(d.mean())


def beat_alignment(
    motion: np.ndarray,
    onset_times: np.ndarray,
    fps: float,
    sigma: float = 0.1,
) -> float:
    """Beat-consistency: mean Gaussian score of nearest kinematic beat to
    each audio onset. motion: (T, D) positions; onsets in seconds."""
    if len(onset_times) == 0 or len(motion) < 3:
        return float("nan")
    vel = np.linalg.norm(np.diff(motion, axis=0), axis=1)
    # kinematic beats = local minima of velocity (direction changes)
    beats = [i for i in range(1, len(vel) - 1) if vel[i] < vel[i - 1] and vel[i] <= vel[i + 1]]
    if not beats:
        return float("nan")
    beat_times = np.array(beats) / fps
    scores = [
        np.exp(-((np.min(np.abs(beat_times - t))) ** 2) / (2 * sigma**2))
        for t in onset_times
    ]
    return float(np.mean(scores))
