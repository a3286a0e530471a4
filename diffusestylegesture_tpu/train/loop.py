"""Training loop driver.

Parity surface with `TrainLoop` (`main/train/training_loop.py:26-356`,
BEAT variant `BEAT-TWH-main/train/training_loop.py`): epoch×batch
iteration bounded by `lr_anneal_steps`/`num_steps`, loss-quartile
logging, periodic checkpointing, and the `DIFFUSION_TRAINING_TEST`
smoke-mode early return (`training_loop.py:229-230`).

TPU-first: the step itself is one donated jit (see `train/state.py`);
under a mesh the loop shards each host batch over the `data` axis and
the gradient all-reduce rides ICI.
"""
from __future__ import annotations

import contextlib
import dataclasses
import os
import time
from typing import Any, Callable, Iterable, Optional

import jax
import numpy as np

from ..parallel import make_mesh, replicate, shard_batch
from .checkpoint import CheckpointManager
from .logger import KVLogger
from .state import TrainConfig, TrainState, create_train_state, make_train_step


@dataclasses.dataclass
class LoopConfig:
    num_steps: int = 100_000
    log_interval: int = 50
    save_interval: int = 50_000
    checkpoint_dir: Optional[str] = None
    # KVLogger sinks (ref `format_strs`, `main/diffusion/logger.py:442-472`):
    # any of "stdout", "csv", "json", "tensorboard"; file sinks need log_dir
    log_dir: Optional[str] = None
    log_formats: tuple = ("stdout",)
    use_mesh: bool = False
    # tensor-parallel degree over the 'model' mesh axis (0/1 = pure DP).
    # Requires use_mesh; the trunk's matmuls shard Megatron-style via
    # `parallel.tp.mdm_param_specs` and GSPMD inserts the psums over ICI.
    tensor_parallel: int = 0
    # ZeRO-3: shard params + AdamW moments + EMA along the 'data' axis
    # (`parallel/fsdp.py`); XLA derives the all-gather/reduce-scatter
    # schedule from the annotations. Composes with tensor_parallel.
    fsdp: bool = False
    # Externally built Mesh (must contain a 'data' axis). Used when the
    # model itself needs the mesh at construction time (seq-parallel
    # attention / pipelined trunk — `cli.train --sp/--pp` builds one mesh
    # shared by model and loop). Overrides the internally built mesh;
    # tensor_parallel>1 then expects a 'model' axis to be present.
    mesh: Any = None
    # Preemption safety: catch SIGTERM during `run()` and, instead of
    # dying mid-step, flush metrics, write a checkpoint and return — the
    # tested orbax resume then continues from that step. The reference has
    # no notion of this (its resume machinery is commented out,
    # `main/train/training_loop.py:109-131`); on TPU pods preemption is a
    # normal lifecycle event, so the loop treats it as a clean stop.
    # Ignored when no checkpoint_dir is configured (nothing to save).
    save_on_preemption: bool = True


class _PreemptionGuard:
    """Converts SIGTERM into a checked flag for the step loop.

    Installed only for the duration of `TrainLoop.run()`; the previous
    handler is restored on exit and re-invoked after the clean shutdown
    completes if the signal arrived (so process supervisors still see
    their handler run). Signal handlers can only be installed from the
    main thread — anywhere else the guard degrades to a no-op flag, which
    keeps threaded test harnesses working.
    """

    def __init__(self, signals=(None,)):
        import signal as _signal

        self._signal = _signal
        self._signals = [s for s in signals if s is not None] or [
            _signal.SIGTERM]
        self._prev: dict = {}
        self.requested: Optional[int] = None  # signum once seen

    def _handler(self, signum, frame):
        self.requested = signum

    def __enter__(self):
        for s in self._signals:
            try:
                self._prev[s] = self._signal.signal(s, self._handler)
            except ValueError:  # not the main thread
                pass
        return self

    def __exit__(self, *exc):
        for s, prev in self._prev.items():
            self._signal.signal(s, prev)
        if self.requested is not None:
            # chain a caller-installed Python handler (a supervisor hook)
            # so it still observes the signal after the clean shutdown;
            # SIG_DFL is NOT re-delivered — run() returning the saved
            # state IS the clean preemption exit, and supervisors that
            # insist escalate to SIGKILL on their own schedule
            prev = self._prev.get(self.requested)
            if callable(prev):
                prev(self.requested, None)
        return False


class TrainLoop:
    def __init__(
        self,
        model_apply: Callable,
        schedule,
        params: Any,
        data: Iterable,
        train_cfg: TrainConfig = TrainConfig(),
        loop_cfg: LoopConfig = LoopConfig(),
        cond_builder: Optional[Callable] = None,
        seed: int = 0,
        device_cache=None,  # data.device_cache.DeviceWindowCache
        batch_size: int = 0,  # required with device_cache
    ):
        self.loop_cfg = loop_cfg
        self.schedule = schedule
        self.data = data
        self.logger = KVLogger(loop_cfg.log_dir, loop_cfg.log_formats)
        tp = max(1, loop_cfg.tensor_parallel)
        if tp > 1 and not (loop_cfg.use_mesh or loop_cfg.mesh is not None):
            raise ValueError("tensor_parallel > 1 requires use_mesh=True")
        if loop_cfg.fsdp and not (loop_cfg.use_mesh or loop_cfg.mesh is not None):
            # without a mesh the sharding block below is skipped entirely;
            # silently training replicated would defeat the point of ZeRO-3
            raise ValueError("fsdp=True requires use_mesh=True or mesh=")
        if loop_cfg.mesh is not None:
            if "data" not in loop_cfg.mesh.axis_names:
                raise ValueError("external mesh must have a 'data' axis")
            if tp > 1 and "model" not in loop_cfg.mesh.axis_names:
                raise ValueError(
                    "tensor_parallel > 1 with an external mesh needs a "
                    "'model' axis")
            self.mesh = loop_cfg.mesh
        elif loop_cfg.use_mesh and tp > 1:
            n = len(jax.devices())
            if n % tp:
                raise ValueError(f"tensor_parallel={tp} does not divide {n} devices")
            self.mesh = make_mesh(axes=("data", "model"), shape=(n // tp, tp))
        else:
            self.mesh = make_mesh() if loop_cfg.use_mesh else None

        if device_cache is not None:
            # zero host traffic per step: the batch gather happens on device
            # inside the compiled step (`data/device_cache.py`)
            from ..data.device_cache import make_device_data_train_step

            assert batch_size > 0, "batch_size required with device_cache"
            batch_sharding = None
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                batch_sharding = NamedSharding(self.mesh, P("data"))
            cached = make_device_data_train_step(
                model_apply, schedule, train_cfg,
                cond_builder, batch_size, batch_sharding=batch_sharding,
                sample_fn=device_cache.sample_fn,
            )
            self.cached_step = jax.jit(cached, donate_argnums=(0,))
            self._cache_arrays = device_cache.arrays
            self.train_step = None
        else:
            self.cached_step = None
            step_fn = make_train_step(model_apply, schedule, train_cfg, cond_builder)
            self.train_step = jax.jit(step_fn, donate_argnums=(0,))

        self.state = create_train_state(params, train_cfg, schedule.num_timesteps)
        if self.mesh is not None:
            self.state = replicate(self.mesh, self.state)
            if tp > 1 or loop_cfg.fsdp:
                from ..parallel import mdm_param_specs, shard_train_state

                # specs for the whole variables dict: TP specs for the
                # 'params' collection, replicated for any other collection.
                # A BARE param tree (no flax {'params': ...} wrapper) is
                # the trainable collection itself — keying on 'params'
                # alone would silently replicate every weight under tp>1
                from jax.sharding import PartitionSpec as _P

                pt = self.state.params
                is_vars = isinstance(pt, dict) and "params" in pt
                if is_vars:
                    specs = {
                        k: (mdm_param_specs(v) if k == "params" and tp > 1
                            else jax.tree.map(lambda _: _P(), v))
                        for k, v in pt.items()
                    }
                else:
                    specs = (mdm_param_specs(pt) if tp > 1
                             else jax.tree.map(lambda _: _P(), pt))
                if loop_cfg.fsdp:
                    # ZeRO-3 on top: shard the dims TP left free along
                    # 'data' (`parallel/fsdp.py`)
                    from ..parallel import fsdp_param_specs

                    data_size = self.mesh.shape["data"]
                    if is_vars:
                        specs = {
                            k: fsdp_param_specs(
                                pt[k], data_size, base_specs=v)
                            for k, v in specs.items()
                        }
                    else:
                        specs = fsdp_param_specs(
                            pt, data_size, base_specs=specs)
                # shard params AND the optimizer moments / EMA — otherwise
                # opt_state stays replicated (2x param memory) and the
                # donated step recompiles on the sharding mismatch
                self.state = shard_train_state(self.mesh, self.state, specs)

        self.ckpt = (
            CheckpointManager(loop_cfg.checkpoint_dir)
            if loop_cfg.checkpoint_dir
            else None
        )
        self.rng = jax.random.PRNGKey(seed)
        self.resume_step = 0
        if self.ckpt is not None and self.ckpt.latest_step() is not None:
            try:
                restored = self.ckpt.restore(self.state)
            except ValueError:
                # attention-layout mismatch: the checkpoint was written by
                # a run with the other qkv layout (packed in_proj vs split
                # q/k/v — e.g. resuming a --tp/--split_qkv run without the
                # flag). The layouts are numerically interchangeable, so
                # restore through a converted template and convert back.
                from ..parallel import merge_qkv_params, split_qkv_params

                restored = None
                for conv, inv in ((split_qkv_params, merge_qkv_params),
                                  (merge_qkv_params, split_qkv_params)):
                    try:
                        restored = inv(self.ckpt.restore(conv(self.state)))
                        self.logger.log(
                            "restored checkpoint via qkv layout conversion")
                        break
                    except ValueError:
                        continue
                if restored is None:
                    raise
            if restored is not None:
                self.state = restored
                self.resume_step = int(np.asarray(self.state.step))
                # fresh randomness after resume: without this the resumed
                # run replays the exact t/noise/dropout stream from step 0
                self.rng = jax.random.fold_in(self.rng, self.resume_step)
                self.logger.log(f"resumed from step {self.resume_step}")

    def _batches(self):
        if self.cached_step is not None:
            while True:
                yield None  # batch gathered on device inside the step
        else:
            yield from self.data

    def _flush_metrics(self, pending) -> None:
        """Materialize buffered device metrics in one transfer and feed the
        logger. Deferring the host sync to logging boundaries keeps the
        step loop async — a per-step np.asarray would serialize every
        iteration on a device→host copy, defeating device_cache's
        zero-host-traffic design."""
        if not pending:
            return
        for metrics in jax.device_get(pending):
            ts = np.asarray(metrics.pop("t"))
            host_metrics = {
                k: np.asarray(v) for k, v in metrics.items()
                if np.asarray(v).ndim <= 1
            }
            self.logger.log_loss_dict(
                ts,
                self.schedule.num_timesteps,
                {k: v for k, v in host_metrics.items() if v.ndim == 1},
            )
            for k, v in host_metrics.items():
                if v.ndim == 0:
                    self.logger.logkv_mean(k, float(v))
        pending.clear()

    def run(self) -> TrainState:
        cfg = self.loop_cfg
        step = self.resume_step
        t0 = time.time()
        pending = []
        guard_wanted = cfg.save_on_preemption and self.ckpt is not None
        guard = _PreemptionGuard()
        with guard if guard_wanted else contextlib.nullcontext(guard):
            for batch in self._batches():
                if step >= cfg.num_steps:
                    break
                if guard.requested is not None:
                    self._flush_metrics(pending)
                    self.save(step)
                    self.logger.log(
                        f"preemption (signal {guard.requested}): checkpoint "
                        f"written at step {step}, stopping cleanly")
                    return self.state
                self.rng, sub = jax.random.split(self.rng)
                if self.cached_step is not None:
                    self.state, metrics = self.cached_step(
                        self.state, sub, self._cache_arrays)
                else:
                    if self.mesh is not None:
                        batch = shard_batch(self.mesh, batch)
                    self.state, metrics = self.train_step(
                        self.state, batch, sub)

                pending.append(metrics)
                # `step` now counts COMPLETED steps and equals state.step,
                # so checkpoint directory labels match their contents (a
                # periodic save at step N holds state.step == N, same
                # convention as the preemption and final saves)
                step += 1

                if step % cfg.log_interval == 0:
                    self._flush_metrics(pending)
                    self.logger.logkv("step", step)
                    self.logger.logkv(
                        "steps_per_sec",
                        (step - self.resume_step) / (time.time() - t0))
                    self.logger.dumpkvs()

                if cfg.save_interval and step % cfg.save_interval == 0:
                    self._flush_metrics(pending)
                    self.save(step)
                    if os.environ.get("DIFFUSION_TRAINING_TEST", ""):
                        return self.state
            self._flush_metrics(pending)
            if self.ckpt is not None:
                self.save(step)
        return self.state

    def save(self, step: int) -> None:
        if self.ckpt is None:
            return
        if self.ckpt.latest_step() == step:
            # already on disk — a relaunch after a completed run (or a
            # SIGTERM right after a periodic save) would otherwise crash
            # with orbax's StepAlreadyExistsError instead of no-oping
            self.logger.log(f"checkpoint for step {step} already exists")
            return
        self.ckpt.save(step, jax.device_get(self.state), wait=True)
        self.logger.log(f"saved checkpoint at step {step}")
