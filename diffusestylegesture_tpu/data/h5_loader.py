"""BEAT/TWH HDF5 dataset + in-RAM training loader.

Parity with `BEAT-TWH-main/mydiffusion_beat_twh/data_loader/h5_data_loader.py:15-107`
and the H5 builders (`process_BEAT_bvh.py:355-441`, `process_TWH_bvh.py:271-355`):
  * file layout: group per clip i with datasets {speaker_id one-hot,
    gesture (T, motion_dim), audio (T, audio_dim), text (T, text_dim)}
    clipped to a common length;
  * loader: whole file into RAM, z-normalize gesture, derive velocity and
    acceleration channels → njoints = 3·motion_dim (`:34-35,58-60`),
    fuse audio+text per frame, random `n_poses`-frame crop per access,
    infinite shuffled sampling (`:71-77`).
"""
from __future__ import annotations

from typing import Dict, Iterator, List, Optional

import h5py
import numpy as np


def build_h5_dataset(
    path: str,
    clips: List[Dict[str, np.ndarray]],
) -> None:
    """Write clips [{'speaker_id','gesture','audio','text'}] → one .h5,
    cropping each modality to the common length (ref builders)."""
    with h5py.File(path, "w") as h5:
        for i, c in enumerate(clips):
            n = min(len(c["gesture"]), len(c["audio"]), len(c["text"]))
            g = h5.create_group(str(i))
            g.create_dataset("speaker_id", data=c["speaker_id"])
            g.create_dataset("gesture", data=c["gesture"][:n])
            g.create_dataset("audio", data=c["audio"][:n])
            g.create_dataset("text", data=c["text"][:n])


def gesture_statistics(h5_path: str, eps: float = 1e-6):
    """Global mean/std over all gesture frames
    (parity: `calculate_gesture_statistics.py:7-16`)."""
    frames = []
    with h5py.File(h5_path, "r") as h5:
        for k in h5.keys():
            frames.append(h5[k]["gesture"][:])
    stacked = np.concatenate(frames, axis=0)
    return stacked.mean(axis=0), stacked.std(axis=0) + eps


class SpeechGestureDataset:
    def __init__(
        self,
        h5_path: str,
        mean: np.ndarray,
        std: np.ndarray,
        n_poses: int = 150,
    ):
        self.n_poses = n_poses
        self.textaudio: List[np.ndarray] = []
        self.gesture: List[np.ndarray] = []
        self.speaker: List[np.ndarray] = []
        with h5py.File(h5_path, "r") as h5:
            for k in sorted(h5.keys(), key=int):
                g = (h5[k]["gesture"][:] - mean) / std
                vel = np.diff(g, axis=0, prepend=g[:1])
                acc = np.diff(vel, axis=0, prepend=vel[:1])
                # reference derives vel/acc over the WHOLE clip (zero first
                # row) and crops afterwards (`h5_data_loader.py:34-35`,
                # crop at `:58-60`) — matching this order matters: a
                # window's frame 0 keeps the true cross-boundary
                # derivative. Layout [pos | vel | acc] per frame
                self.gesture.append(
                    np.concatenate([g, vel, acc], axis=1).astype(np.float32)
                )
                self.textaudio.append(
                    np.concatenate([h5[k]["audio"][:], h5[k]["text"][:]], axis=1).astype(np.float32)
                )
                self.speaker.append(np.asarray(h5[k]["speaker_id"], np.float32))

    def __len__(self) -> int:
        return len(self.gesture)

    def sample(self, rng: np.random.Generator, idx: int):
        T = len(self.gesture[idx])
        n = self.n_poses
        # reference quirk kept: np.random.randint's EXCLUSIVE high
        # (`h5_data_loader.py:44`) means the start T-n is never drawn, so
        # each clip's final frame has zero sampling probability
        start = int(rng.integers(0, max(1, T - n)))
        g = self.gesture[idx][start: start + n]
        a = self.textaudio[idx][start: start + n]
        if len(g) < n:  # short clip: pad by repetition
            reps = -(-n // len(g))
            g = np.tile(g, (reps, 1))[:n]
            a = np.tile(a, (reps, 1))[:n]
        return a, g, self.speaker[idx]

    def batches(
        self, batch_size: int, seed: int = 0, num_batches: Optional[int] = None
    ) -> Iterator[Dict[str, np.ndarray]]:
        """Infinite random sampler (ref `RandomSampler:71-77`)."""
        rng = np.random.default_rng(seed)
        produced = 0
        while num_batches is None or produced < num_batches:
            idx = rng.integers(0, len(self), batch_size)
            items = [self.sample(rng, int(i)) for i in idx]
            yield {
                "audio": np.stack([i[0] for i in items]),
                "motion": np.stack([i[1] for i in items]),
                "style": np.stack([i[2] for i in items]),
            }
            produced += 1
