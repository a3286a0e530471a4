"""Production serving harness: micro-batching gesture generation server.

The reference has no serving story — its `sample.py` is a one-shot CLI
(`main/mydiffusion_zeggs/sample.py:341-420`). On TPU the chip only pays
for itself when the denoiser runs batched (bench: 574 fps at batch 1 vs
1771 fps aggregate at batch 16 on v5e), so the serving layer's job is to
pack concurrent requests into one compiled engine call:

  * requests (audio, style) are queued; a dispatcher thread drains up to
    `max_batch` of them, waiting at most `max_delay_ms` past the first;
  * audio lengths are padded up to a small set of window-count BUCKETS so
    the engine compiles once per (bucket, batch) pair instead of per
    length — XLA static shapes without per-request recompiles;
  * every request in a batch shares the window scan; per-request styles
    ride the batch axis; outputs are cropped back to true lengths;
  * results are delivered through per-request futures
    (`concurrent.futures.Future` — blocking or callback consumption).

Pure-Python micro-batcher (stdlib threading only) around the jitted
`ZeggsSampler`; the TPU work itself stays one XLA program per call.
"""
from __future__ import annotations

import dataclasses
import queue
import threading
import time
from collections import deque
from concurrent.futures import Future
from typing import Deque, List, Optional, Sequence

import jax
import numpy as np

from .engine import ZeggsSampler, slice_audio_windows


@dataclasses.dataclass(frozen=True)
class ServerConfig:
    max_batch: int = 16
    max_delay_ms: float = 50.0
    # window-count buckets (ascending); requests pad up to the nearest.
    # 5 windows = 20 s of audio under the ZEGGS geometry.
    window_buckets: Sequence[int] = (1, 2, 5, 10, 20)
    # style-vector dimensionality; requests are validated against it at
    # submit() so one malformed request cannot fail its co-batched peers
    style_dim: int = 6
    # Pad every batch to max_batch with dummy requests so the engine
    # compiles ONE batch shape per bucket. Without this each distinct
    # batch size is a new XLA program — measured 60s+ recompiles per
    # ragged batch on v5e vs ~2s steady-state execution. NB with the
    # reference crossfade quirk (engine crossfade_n=None, weights use the
    # batch size) padding fixes the quirk's n at max_batch; set an explicit
    # crossfade_n for batch-size-independent blending in serving.
    pad_to_max_batch: bool = True


@dataclasses.dataclass
class _Request:
    audio: np.ndarray
    style: np.ndarray
    key: jax.Array
    num_windows: int
    future: Future


class GestureServer:
    """Micro-batching front end over a `ZeggsSampler`.

    Usage:
        server = GestureServer(sampler, params, wavlm_params, mean, std)
        server.start()
        fut = server.submit(audio, style)      # from any thread
        poses = fut.result()                   # (T, njoints) un-normalized
        server.stop()
    """

    def __init__(
        self,
        sampler: ZeggsSampler,
        params,
        wavlm_params,
        mean: Optional[np.ndarray] = None,
        std: Optional[np.ndarray] = None,
        cfg: ServerConfig = ServerConfig(),
        seed: int = 0,
    ):
        self.sampler = sampler
        self.params = params
        self.wavlm_params = wavlm_params
        self.mean = mean
        self.std = std
        self.cfg = cfg
        self._style_dim = cfg.style_dim
        self._queue: "queue.Queue[_Request]" = queue.Queue()
        # dispatcher-thread-owned staging area for requests whose bucket
        # didn't match the batch being built; pending[0] is always the
        # OLDEST unserved request and seeds the next batch's bucket
        self._pending: Deque[_Request] = deque()
        self._thread: Optional[threading.Thread] = None
        self._stop = threading.Event()
        # makes submit's running-check + enqueue atomic with stop's final
        # drain — without it a submit could pass the check, lose the CPU,
        # and enqueue into an already-drained queue (orphaned Future)
        self._submit_lock = threading.Lock()
        self._rng_lock = threading.Lock()
        self._key = jax.random.PRNGKey(seed)
        self.batches_served = 0
        self.requests_served = 0

    # -- client API ---------------------------------------------------------

    def submit(self, audio: np.ndarray, style: np.ndarray) -> Future:
        """Enqueue one clip; returns a Future of (T, njoints) poses."""
        audio = np.asarray(audio, np.float32)
        ecfg = self.sampler.cfg
        num = len(audio) // ecfg.samples_per_stride
        if num == 0:
            # match ZeggsSampler.generate: refuse instead of fabricating
            # motion from an all-zero padded window
            raise ValueError(
                f"audio too short: {len(audio)} samples < one "
                f"{ecfg.samples_per_stride}-sample window")
        style = np.asarray(style, np.float32).reshape(-1)
        if style.shape[0] != self._style_dim:
            # validate HERE so a bad request cannot fail its whole batch
            raise ValueError(
                f"style has {style.shape[0]} dims, expected {self._style_dim}")
        bucket = self._bucket_for(num)
        if bucket is None:
            raise ValueError(
                f"clip needs {num} windows > max bucket {max(self.cfg.window_buckets)}"
            )
        with self._rng_lock:
            self._key, sub = jax.random.split(self._key)
        fut: Future = Future()
        with self._submit_lock:
            if self._stop.is_set() or self._thread is None:
                # a submit racing stop() (or before start()) would
                # otherwise return a Future that never resolves
                raise RuntimeError(
                    "server is not running (submit before start() or "
                    "after stop())")
            self._queue.put(
                _Request(audio=audio, style=style, key=sub,
                         num_windows=num, future=fut)
            )
        return fut

    def start(self) -> "GestureServer":
        self._stop.clear()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def stop(self, timeout: float = 30.0) -> None:
        self._stop.set()
        t = self._thread
        if t is not None:
            t.join(timeout)
            if t.is_alive():
                # a long batch is still in flight past the join timeout:
                # do NOT touch _pending/_queue (the dispatcher owns them
                # and keeps serving until drained) — clearing here would
                # race _collect_batch and double-resolve futures
                return
            self._thread = None
        # a request that slipped past the dispatcher's final drain (the
        # submit/stop race) must not leave its client blocked forever;
        # the submit lock orders us after any in-flight enqueue
        with self._submit_lock:
            leftovers: List[_Request] = list(self._pending)
            self._pending.clear()
            while True:
                try:
                    leftovers.append(self._queue.get_nowait())
                except queue.Empty:
                    break
        for req in leftovers:
            if not req.future.done():
                req.future.set_exception(
                    RuntimeError("server stopped before serving this request"))

    # -- internals ----------------------------------------------------------

    def _bucket_for(self, num_windows: int) -> Optional[int]:
        for b in self.cfg.window_buckets:
            if num_windows <= b:
                return b
        return None

    def _collect_batch(self) -> List[_Request]:
        """Drain up to max_batch requests sharing the OLDEST unserved
        request's bucket, waiting at most max_delay_ms past its arrival.

        Requests of a different bucket stage in `_pending` (FIFO), and the
        next batch's bucket always comes from `pending[0]` — re-queueing
        spills at the queue TAIL would let a continuous stream of
        one-bucket traffic starve a minority-bucket request forever."""
        if not self._pending:
            try:
                self._pending.append(self._queue.get(timeout=0.1))
            except queue.Empty:
                return []
        batch = [self._pending.popleft()]
        bucket = self._bucket_for(batch[0].num_windows)
        deadline = time.monotonic() + self.cfg.max_delay_ms / 1000.0
        # sweep already-staged same-bucket requests first (order kept)
        keep: Deque[_Request] = deque()
        while self._pending and len(batch) < self.cfg.max_batch:
            req = self._pending.popleft()
            if self._bucket_for(req.num_windows) == bucket:
                batch.append(req)
            else:
                keep.append(req)
        keep.extend(self._pending)
        self._pending = keep
        # then wait for new arrivals up to the deadline
        while len(batch) < self.cfg.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                req = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            if self._bucket_for(req.num_windows) == bucket:
                batch.append(req)
            else:
                self._pending.append(req)  # next batch, FIFO order
        return batch

    def _loop(self) -> None:
        """Two-stage pipeline: dispatch batch k+1's device programs
        (audio encoder + windowed denoiser — both async under JAX's
        dispatch model) BEFORE blocking on batch k's results, so the
        device queue stays full while the host assembles/delivers the
        previous batch. On a tunneled backend the host↔device round trip
        is the dominant fixed cost — without the overlap the chip idles
        for it between every pair of batches."""
        inflight = None
        while (not self._stop.is_set() or not self._queue.empty()
               or self._pending or inflight is not None):
            batch = self._collect_batch()
            dispatched = None
            if batch:
                try:
                    dispatched = (batch, self._dispatch_batch(batch))
                except Exception as e:  # deliver the failure, keep serving
                    for req in batch:
                        if not req.future.done():
                            req.future.set_exception(e)
            if inflight is not None:
                prev_batch, prev_out = inflight
                try:
                    self._finalize_batch(prev_batch, prev_out)
                except Exception as e:
                    for req in prev_batch:
                        if not req.future.done():
                            req.future.set_exception(e)
            inflight = dispatched

    def _run_batch(self, batch: List[_Request]) -> None:
        """Synchronous convenience path (dispatch + finalize)."""
        self._finalize_batch(batch, self._dispatch_batch(batch))

    def _dispatch_batch(self, batch: List[_Request]):
        """Enqueue the batch's device programs; returns the (async)
        device output array without blocking on it."""
        import jax.numpy as jnp

        ecfg = self.sampler.cfg
        bucket = self._bucket_for(batch[0].num_windows)
        S = ecfg.samples_per_seed + ecfg.samples_per_stride
        B = self.cfg.max_batch if self.cfg.pad_to_max_batch else len(batch)

        # slice each clip, zero-pad to the bucket's window count (dummy
        # rows beyond len(batch) stay zero and their outputs are dropped)
        feats_in = np.zeros((B, bucket, S), np.float32)
        for i, req in enumerate(batch):
            win = slice_audio_windows(req.audio, ecfg)[:bucket]
            feats_in[i, : win.shape[0]] = win

        # one batched audio-encoder pass over clips×windows; the features
        # stay ON DEVICE into the denoiser (np.asarray here used to force
        # a device→host→device round trip of the (B·W·88·1024) buffer —
        # a full host sync mid-batch, ~tens of MB through a tunnel)
        flat = feats_in.reshape(B * bucket, S)
        feats = self.sampler.wavlm_apply(self.wavlm_params, jnp.asarray(flat))
        feats = jnp.reshape(feats, (B, bucket, ecfg.n_poses, feats.shape[-1]))

        styles = np.zeros((B, self._style_dim), np.float32)
        for i, req in enumerate(batch):
            styles[i] = req.style.reshape(-1)
        from .engine import _generate_multi

        # RNG: the batch runs under the FIRST request's key; each clip still
        # draws independent noise through the batch axis. A solo request is
        # therefore bit-reproducible from its own key (pinned by tests);
        # co-batched requests are stochastic in their companions.
        return _generate_multi(
            self.sampler, self.params, feats,
            jnp.asarray(styles), batch[0].key, bucket,
        )

    def _finalize_batch(self, batch: List[_Request], out) -> None:
        """Block on the device output, assemble and deliver results."""
        ecfg = self.sampler.cfg
        from .engine import unnormalize_poses

        seq = np.asarray(out)[:, :, 0].transpose(0, 2, 1)  # (B, T_max, C)
        seq = unnormalize_poses(seq, self.mean, self.std)

        for i, req in enumerate(batch):
            T_i = req.num_windows * ecfg.stride - ecfg.n_seed
            req.future.set_result(seq[i, :T_i])
        self.batches_served += 1
        self.requests_served += len(batch)
