"""Text-to-motion retrieval metrics (R-precision / matching score).

Ports the remaining numeric surface of the reference's humanml eval suite
(`/root/reference/main/data_loaders/humanml/utils/metrics.py:6-57`):

  * `euclidean_distance_matrix` — pairwise L2 via the expanded quadratic
    form (matmul-friendly: one GEMM + two row/col norms);
  * `top_k_hits` — cumulative "ground-truth index within the first k
    nearest neighbours" boolean matrix (`calculate_top_k:22-34`);
  * `r_precision` — retrieval accuracy of motion embeddings against their
    paired text embeddings (`calculate_R_precision:37-44`);
  * `matching_score` — mean/summed L2 between paired embeddings
    (`calculate_matching_score:47-57`).

FID / diversity / multimodality live in `eval.metrics` (shared with the
gesture-native path); KID and precision/recall in `eval.unconstrained`.
"""
from __future__ import annotations

import numpy as np


def euclidean_distance_matrix(matrix1: np.ndarray, matrix2: np.ndarray) -> np.ndarray:
    """dist[i, j] = ||matrix1[i] - matrix2[j]||₂ for (N1,D) × (N2,D)."""
    assert matrix1.shape[1] == matrix2.shape[1]
    d1 = -2 * matrix1 @ matrix2.T
    d2 = np.sum(np.square(matrix1), axis=1, keepdims=True)
    d3 = np.sum(np.square(matrix2), axis=1)
    return np.sqrt(np.maximum(d1 + d2 + d3, 0.0))


def top_k_hits(argsorted: np.ndarray, top_k: int) -> np.ndarray:
    """(N, N) argsort of a distance matrix -> (N, top_k) bool, column k
    true iff the ground-truth index (the row number) appears among the
    first k+1 neighbours. Matches the reference's cumulative-OR loop."""
    n = argsorted.shape[0]
    gt = np.arange(n)[:, None]
    hits = argsorted[:, :top_k] == gt
    return np.cumsum(hits, axis=1).astype(bool)


def r_precision(
    embedding1: np.ndarray,
    embedding2: np.ndarray,
    top_k: int,
    sum_all: bool = False,
) -> np.ndarray:
    """R-precision of embedding2 retrieved by embedding1 (row i's true
    match is row i). Returns the (N, top_k) hit matrix, or its column
    sums when ``sum_all``."""
    dist = euclidean_distance_matrix(embedding1, embedding2)
    order = np.argsort(dist, axis=1)
    hits = top_k_hits(order, top_k)
    return hits.sum(axis=0) if sum_all else hits


def matching_score(
    embedding1: np.ndarray, embedding2: np.ndarray, sum_all: bool = False
):
    """L2 between paired rows of two equal-shape embedding sets."""
    assert embedding1.ndim == 2 and embedding1.shape == embedding2.shape
    dist = np.linalg.norm(embedding1 - embedding2, axis=1)
    return dist.sum(axis=0) if sum_all else dist
