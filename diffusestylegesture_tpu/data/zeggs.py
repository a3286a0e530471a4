"""ZEGGS dataset building and training input pipeline.

Replaces the reference's LMDB/pyarrow chain with npz shards + an
in-memory window cache (TPU-native input pipeline; storage format is an
implementation detail — the tensors match):

  * `build_zeggs_dataset` ↔ `make_zeggs_dataset` + `make_lmdb_gesture_dataset`
    (`main/mydiffusion_zeggs/zeggs_data_to_lmdb.py:24-176`): per clip wav
    16 kHz + Sphinx-MFCC + 1141-d BVH features, global mean/std with the
    reference's std clip at 0.01, style one-hot from the filename token.
    (The reference shells out to `ffmpeg-normalize` for EBU-R128 loudness
    first, `zeggs_data_to_lmdb.py:133` — pass `loudnorm=True` for the
    native BS.1770-4 equivalent, or feed pre-normalized wavs.)
  * `ZeggsWindowDataset` ↔ `DataPreprocessor` + `TrinityDataset`
    (`data_loader/data_preprocessor.py:38-153`, `lmdb_data_loader.py:13-67`):
    88-frame windows, stride 10, per-window raw-audio slice of
    n_poses/fps seconds, WavLM features computed ONCE as a batched
    device pass and cached; `__getitem__` → (poses, style, wavlm).
"""
from __future__ import annotations

import glob
import math
import os
from typing import Callable, Dict, Iterator, List, Optional

import numpy as np

from ..audio import sphinx_mfcc_energy
from ..motion import zeggs_features as zf


def load_wav_16k(path: str) -> np.ndarray:
    """Read a wav file as float32 mono 16 kHz (scipy backend)."""
    from scipy.io import wavfile
    from scipy.signal import resample_poly

    sr, data = wavfile.read(path)
    if data.dtype.kind == "i":
        data = data.astype(np.float32) / np.iinfo(data.dtype).max
    elif data.dtype.kind == "u":
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    if data.ndim == 2:
        data = data.mean(axis=1)
    if sr != 16000:
        g = math.gcd(int(sr), 16000)
        data = resample_poly(data, 16000 // g, sr // g).astype(np.float32)
    return data


def _worker_init():
    os.environ["JAX_PLATFORMS"] = "cpu"
    # a container sitecustomize may have imported jax (and registered a
    # remote-TPU client) before this runs — force the CPU client explicitly
    import jax

    jax.config.update("jax_platforms", "cpu")


def _zeggs_clip_worker(task) -> dict:
    """Per-clip CPU featurization (module-level: picklable for workers)."""
    wav_path, bvh_path, name, style, fps, loudnorm = task
    audio = load_wav_16k(wav_path)
    if loudnorm:
        # native EBU R128 pass replacing the reference's external
        # `ffmpeg-normalize` pre-step (`zeggs_data_to_lmdb.py:133`)
        from ..audio.loudness import normalize_loudness

        audio = normalize_loudness(audio, 16000.0)
    mfcc = sphinx_mfcc_energy(audio, frate=fps)[:, :-2]
    feats = zf.featurize_bvh_file(bvh_path, fps=fps)["features"]
    return dict(name=name, audio=audio, mfcc=mfcc, poses=feats, style=style)


def build_zeggs_dataset(
    source_dir: str,
    target_dir: str,
    fps: int = 20,
    valid_fraction: float = 0.1,
    workers: int = 0,
    loudnorm: bool = False,
) -> Dict[str, np.ndarray]:
    """(source_dir/*.wav + *.bvh) → target_dir/{train,valid}/*.npz + mean/std.

    Each shard holds {poses (normalized), audio_raw, mfcc, style}.

    `workers` > 1 farms per-clip featurization (wav decode, Sphinx MFCC,
    BVH→1141-d) over a process pool — the work is pure CPU NumPy with no
    shared state, and clip order (hence mean/std and the train/valid
    split) is preserved, so the output is identical to the serial build
    (bitwise when the parent also runs the JAX CPU backend; on a TPU host
    the serial path's device math can differ from the workers' pinned-CPU
    math at float32 rounding). The reference's builder is strictly serial
    (`zeggs_data_to_lmdb.py:107-165`).
    """
    os.makedirs(target_dir, exist_ok=True)
    wavs = sorted(glob.glob(os.path.join(source_dir, "*.wav")))
    tasks = []
    for wav_path in wavs:
        name = os.path.splitext(os.path.basename(wav_path))[0]
        tokens = name.split("_")
        style = zf.style_onehot(tokens[1]) if len(tokens) > 1 else None
        if style is None:
            continue
        bvh_path = os.path.join(source_dir, name + ".bvh")
        if not os.path.exists(bvh_path):
            continue
        tasks.append((wav_path, bvh_path, name, style, fps, loudnorm))

    if workers and workers > 1 and len(tasks) > 1:
        import multiprocessing as mp
        from concurrent.futures import ProcessPoolExecutor

        # spawn, not fork: the parent may hold a live TPU client whose
        # threads deadlock forked children. Workers are pure-CPU NumPy, so
        # pin them to the JAX CPU backend before anything imports jax.
        with ProcessPoolExecutor(
            max_workers=workers,
            mp_context=mp.get_context("spawn"),
            initializer=_worker_init,
        ) as ex:
            clips = list(ex.map(_zeggs_clip_worker, tasks))
    else:
        clips = [_zeggs_clip_worker(t) for t in tasks]
    all_poses = [c["poses"] for c in clips]

    if not clips:
        raise ValueError(f"no usable (wav, bvh) pairs in {source_dir}")

    stacked = np.concatenate(all_poses, axis=0)
    mean = stacked.mean(axis=0)
    std = stacked.std(axis=0)
    np.savez(os.path.join(target_dir, "mean.npz"), mean=mean)
    np.savez(os.path.join(target_dir, "std.npz"), std=std)
    std_c = np.clip(std, 0.01, None)

    n_valid = max(1, int(len(clips) * valid_fraction)) if len(clips) > 1 else 0
    for split, items in (("valid", clips[:n_valid]), ("train", clips[n_valid:])):
        out = os.path.join(target_dir, split)
        os.makedirs(out, exist_ok=True)
        for c in items:
            np.savez_compressed(
                os.path.join(out, c["name"] + ".npz"),
                poses=((c["poses"] - mean) / std_c).astype(np.float32),
                audio_raw=c["audio"],
                mfcc=c["mfcc"].astype(np.float32),
                style=c["style"],
            )
    return {"mean": mean, "std": std}


class ZeggsWindowDataset:
    """Window cache + batch iterator over built ZEGGS shards."""

    def __init__(
        self,
        shard_dir: str,
        wavlm_fn: Optional[Callable[[np.ndarray], np.ndarray]] = None,
        n_poses: int = 88,
        stride: int = 10,
        fps: int = 20,
        sr: int = 16000,
        cache_path: Optional[str] = None,
    ):
        self.n_poses = n_poses
        self.stride = stride
        self.fps = fps
        self.sr = sr
        self.audio_len = int(n_poses / fps * sr)
        if cache_path is None:
            # fingerprint the shard set so rebuilding the shards (new clips,
            # loudness normalization, ...) invalidates the window cache
            import hashlib

            shards = sorted(
                p for p in glob.glob(os.path.join(shard_dir, "*.npz"))
                if not os.path.basename(p).startswith("_cache"))
            sig = hashlib.sha1(repr([
                (os.path.basename(p), os.path.getmtime(p), os.path.getsize(p))
                for p in shards
            ]).encode()).hexdigest()[:10]
            cache_path = os.path.join(
                shard_dir, f"_cache_{n_poses}_{stride}_{sig}.npz")

        if os.path.exists(cache_path):
            blob = np.load(cache_path)
            # a cache built WITHOUT WavLM features cannot serve a caller
            # that supplies a wavlm_fn — rebuild instead of silently
            # training without audio features. (The reverse — cached
            # features, no fn — is the intended precompute→train handoff.)
            if not (wavlm_fn is not None and "wavlm" not in blob):
                self.poses = blob["poses"]
                self.styles = blob["styles"]
                self.wavlm = blob["wavlm"] if "wavlm" in blob else None
                self.audio = blob["audio"] if "audio" in blob else None
                return

        poses_w, styles_w, audio_w = [], [], []
        for shard in sorted(glob.glob(os.path.join(shard_dir, "*.npz"))):
            if os.path.basename(shard).startswith("_cache"):
                continue
            blob = np.load(shard)
            poses, audio, style = blob["poses"], blob["audio_raw"], blob["style"]
            # reference MINLEN (`data_preprocessor.py:94`):
            # min(len(poses), int(len(audio)*60/sr), len(mfcc)). The 60/sr
            # audio term is a reference quirk (hardcoded raw-BVH 60 fps, 3x
            # lenient); the EFFECTIVE audio cap is the mfcc term — mfcc
            # frames run at the pose fps, so a wav shorter than its motion
            # stops window generation at the end of audio instead of
            # pairing real motion with zero-padded silence
            mfcc_len = (len(blob["mfcc"]) if "mfcc" in blob
                        else int(len(audio) * self.fps / sr + 1))
            minlen = min(len(poses), int(len(audio) * 60 / sr), mfcc_len)
            num = math.floor((minlen - n_poses) / stride)
            for i in range(max(0, num)):
                s = i * stride
                poses_w.append(poses[s: s + n_poses])
                a0 = math.floor(s / len(poses) * len(audio))
                seg = audio[a0: a0 + self.audio_len]
                if len(seg) < self.audio_len:
                    seg = np.pad(seg, (0, self.audio_len - len(seg)))
                audio_w.append(seg)
                styles_w.append(style)

        self.poses = np.stack(poses_w).astype(np.float32) if poses_w else np.zeros((0, n_poses, 1141), np.float32)
        self.styles = np.stack(styles_w).astype(np.float32) if styles_w else np.zeros((0, 6), np.float32)
        self.audio = np.stack(audio_w).astype(np.float32) if audio_w else None

        self.wavlm = None
        if wavlm_fn is not None and self.audio is not None and len(self.audio):
            # one batched device pass over all windows (vs the reference's
            # per-window GPU calls inside the loader, `data_preprocessor.py:113`)
            feats = []
            B = 16
            for i in range(0, len(self.audio), B):
                feats.append(np.asarray(wavlm_fn(self.audio[i: i + B])))
            self.wavlm = np.concatenate(feats, axis=0).astype(np.float32)

        save = dict(poses=self.poses, styles=self.styles)
        if self.audio is not None:
            save["audio"] = self.audio
        if self.wavlm is not None:
            save["wavlm"] = self.wavlm
        np.savez(cache_path, **save)

    def __len__(self) -> int:
        return len(self.poses)

    def batches(
        self, batch_size: int, seed: int = 0, epochs: Optional[int] = None
    ) -> Iterator[Dict[str, np.ndarray]]:
        """Shuffled batch iterator; epochs=None → infinite."""
        rng = np.random.default_rng(seed)
        ep = 0
        while epochs is None or ep < epochs:
            order = rng.permutation(len(self))
            for i in range(0, len(order) - batch_size + 1, batch_size):
                idx = order[i: i + batch_size]
                batch = {
                    "motion": self.poses[idx],
                    "style": self.styles[idx],
                }
                if self.wavlm is not None:
                    batch["wavlm"] = self.wavlm[idx]
                elif self.audio is not None:
                    batch["audio_raw"] = self.audio[idx]
                yield batch
            ep += 1
