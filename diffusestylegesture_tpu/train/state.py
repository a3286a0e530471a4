"""Train state and the jit/pjit-compiled train step.

Functional equivalent of the reference's `TrainLoop.forward_backward` +
`MixedPrecisionTrainer.optimize` (`main/train/training_loop.py:246-281`,
`main/diffusion/fp16_util.py:183-214`): AdamW (lr 3e-5, wd 0 on the live
config), uniform (or loss-aware) timestep sampling, masked-SmoothL1
diffusion loss, linear lr anneal (`training_loop.py:283-289`), grad/param
norm logging (`fp16_util.py:199-212`), optional EMA (the reference ships
`update_ema`, `diffusion/nn.py:56-66`, but never checkpoints it — here it
is first-class).

TPU-first: one `jit` with donated state; under a `Mesh` the batch enters
shard-by-batch and XLA inserts the gradient all-reduce over ICI — the DDP
machinery the reference stubs out (`training_loop.py:100-101`) is free.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..diffusion import Schedule
from ..diffusion import gaussian as G
from ..diffusion import resample
from ..utils import rng as tpu_rng


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    ema_params: Any  # None or pytree
    loss_aware: Any  # None or resample.LossAwareState


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr: float = 3e-5
    weight_decay: float = 0.0
    lr_anneal_steps: int = 0
    ema_rate: float = 0.0  # 0 → disabled
    schedule_sampler: str = "uniform"  # "uniform" | "loss-second-moment"
    lambda_vel: float = 0.0
    mean_type: G.MeanType = G.MeanType.START_X
    var_type: G.VarType = G.VarType.FIXED_SMALL
    loss_kind: G.LossKind = G.LossKind.MSE
    # Skip non-finite updates (TPU-native analog of the reference fp16
    # trainer's NaN-overflow backoff, `fp16_util.py:193-197`). 0 disables.
    skip_nonfinite_updates: int = 0
    # Mixed-precision training — the TPU-native completion of the
    # reference's `MixedPrecisionTrainer` (`main/diffusion/fp16_util.py:
    # 148-232`): "bfloat16" keeps f32 master weights / optimizer moments /
    # EMA and casts params to bf16 inside the loss so the trunk matmuls
    # run on the MXU at bf16 rate; gradients flow back through the cast
    # as f32. bf16 shares f32's exponent range, so the reference's
    # fp16 loss-scaling + overflow backoff is unnecessary —
    # `skip_nonfinite_updates` already covers pathological batches.
    # The model should be built with a matching compute dtype
    # (`MDMConfig(dtype=jnp.bfloat16)`) so activations cast too; the
    # param cast alone would be promoted back to f32 by flax.
    compute_dtype: str = "float32"  # "float32" | "bfloat16"
    # Weight on the MoE load-balance auxiliary loss (`models/moe.py`;
    # Switch Transformer uses 0.01). Takes effect when `model_apply`
    # returns (prediction, aux) — build one with `moe.make_moe_apply`.
    moe_aux_weight: float = 0.0
    # PRNG implementation for the dropout stream only. threefry (jax's
    # default) generates mask bits in plain ALU ops and costs ~88 ms/step
    # at the flagship config on a v5e — "rbg" lowers bulk bit generation
    # to the TPU hardware RngBitGenerator (f32 train-mode forward
    # 104.8 → 17.8 ms, see utils/rng.py). Mask values change (and are
    # not guaranteed identical across mesh layouts), which no
    # correctness property depends on; parity-relevant draws (noise, t,
    # cond_mask) stay on threefry either way.
    dropout_rng_impl: str = "rbg"  # "rbg" | "threefry"


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    def lr_schedule(step):
        if cfg.lr_anneal_steps:
            frac = 1.0 - jnp.minimum(step / cfg.lr_anneal_steps, 1.0)
            return cfg.lr * frac
        return cfg.lr

    tx = optax.adamw(lr_schedule, weight_decay=cfg.weight_decay)
    if cfg.skip_nonfinite_updates:
        tx = optax.apply_if_finite(tx, max_consecutive_errors=cfg.skip_nonfinite_updates)
    return tx


def create_train_state(
    params, cfg: TrainConfig, num_timesteps: int = 1000
) -> TrainState:
    tx = make_optimizer(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.copy, params) if cfg.ema_rate else None,
        loss_aware=(
            resample.LossAwareState.create(num_timesteps)
            if cfg.schedule_sampler == "loss-second-moment"
            else None
        ),
    )


def make_train_step(
    model_apply: Callable,
    sched: Schedule,
    cfg: TrainConfig,
    cond_builder: Optional[Callable] = None,
    axis_name: Optional[str] = None,
) -> Callable:
    """Build the jittable train step.

    model_apply(params, x, t, cond, train, rngs) → x0 prediction.
    cond_builder(batch) → (x_start (B,C,1,T), cond dict, mask (B,1,1,T));
      defaults to the ZEGGS assembly (`training_loop.py:142-166`).
    """
    tx = make_optimizer(cfg)
    if cond_builder is None:
        cond_builder = zeggs_cond_builder
    loss_aware = cfg.schedule_sampler == "loss-second-moment"
    compute_dtype = jnp.dtype(cfg.compute_dtype)

    def loss_fn(params, batch, rng, la_state):
        if compute_dtype != jnp.float32:
            # master weights stay f32 in `state.params`; the model sees a
            # bf16 view, and d(cast)/dp routes the gradient back as f32
            params = jax.tree.map(
                lambda p: p.astype(compute_dtype)
                if p.dtype == jnp.float32 else p,
                params,
            )
        x_start, cond, mask = cond_builder(batch)
        B = x_start.shape[0]
        rng_t, rng_noise, rng_cm, rng_do = jax.random.split(rng, 4)
        if cfg.dropout_rng_impl == "rbg":
            rng_do = tpu_rng.rbg_key(rng_do)

        if loss_aware:
            # LossSecondMomentResampler (ref `resample.py:124-154`): t drawn
            # from the running sqrt-second-moment distribution, weighted by
            # 1/(T·p_t). la_state is data, not a differentiable input.
            t, weights = resample.loss_aware_sample_t(rng_t, la_state, B)
        else:
            t, weights = resample.uniform_sample_t(rng_t, B, sched.num_timesteps)

        noise = jax.random.normal(rng_noise, x_start.shape, jnp.float32)

        aux_acc = []

        def model_fn(x, tt):
            out = model_apply(
                params, x, tt, cond, train=True,
                rngs={"cond_mask": rng_cm, "dropout": rng_do},
            )
            if isinstance(out, tuple):
                # (prediction, moe_aux) convention — `moe.make_moe_apply`
                out, aux = out
                aux_acc.append(aux)
            # diffusion loss math always in f32, whatever the trunk dtype
            return out.astype(jnp.float32)

        terms, _ = G.training_losses(
            sched, model_fn, x_start, t, noise, mask,
            mean_type=cfg.mean_type, var_type=cfg.var_type,
            loss_kind=cfg.loss_kind, lambda_vel=cfg.lambda_vel,
        )
        loss = jnp.mean(terms["loss"] * weights)
        terms = dict(terms)
        if aux_acc and cfg.moe_aux_weight:
            aux_mean = sum(aux_acc) / len(aux_acc)
            loss = loss + cfg.moe_aux_weight * aux_mean
            terms["moe_aux"] = aux_mean
        return loss, (terms, t)

    def train_step(state: TrainState, batch: Dict, rng: jax.Array):
        (loss, (terms, t)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng, state.loss_aware
        )
        new_loss_aware = state.loss_aware
        if loss_aware:
            # ref `TrainLoop.forward_backward`
            # (`main/train/training_loop.py:256-259`): feed the *unweighted*
            # per-example losses into the history before the next draw. Under
            # jit-over-mesh the batch is already global, matching the
            # reference's all_gather in `update_with_local_losses`; pass
            # axis_name only inside shard_map/pmap.
            new_loss_aware = resample.update_with_losses(
                state.loss_aware, t, jax.lax.stop_gradient(terms["loss"]),
                axis_name=axis_name,
            )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        ema = state.ema_params
        if ema is not None:
            r = cfg.ema_rate
            ema = jax.tree.map(lambda e, p: e * r + p * (1 - r), ema, new_params)

        gnorm = optax.global_norm(grads)
        pnorm = optax.global_norm(new_params)
        # per-example loss vectors (for quartile logging) + scalars
        metrics = dict(terms)
        metrics.update(loss=loss, grad_norm=gnorm, param_norm=pnorm, t=t)
        metrics["loss_per_example"] = terms["loss"]
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt,
            ema_params=ema,
            loss_aware=new_loss_aware,
        )
        return new_state, metrics

    return train_step


def make_zeggs_cond_builder(n_seed: int = 8) -> Callable:
    """ZEGGS batch {'motion' (B,T,C), 'style' (B,6), 'wavlm' (B,T,1024)} →
    (x_start, cond, mask). Parity: `main/train/training_loop.py:142-166`.
    `n_seed` is static (baked into the compiled step)."""

    def builder(batch: Dict) -> Tuple[jax.Array, Dict, jax.Array]:
        motion = batch["motion"].transpose(0, 2, 1)[:, :, None, :]  # (B,C,1,T)
        B, _, _, T = motion.shape
        cond = {
            "seed": motion[..., :n_seed],
            "style": batch["style"],
            "audio": batch["wavlm"],
            "mask_local": jnp.ones((B, T), bool),
        }
        mask = jnp.ones((B, 1, 1, T), jnp.float32)
        return motion, cond, mask

    return builder


zeggs_cond_builder = make_zeggs_cond_builder(8)


def make_beat_cond_builder(variant: str, n_seed: int) -> Callable:
    """BEAT/TWH assembly (`BEAT-TWH-main/train/training_loop.py:100-130`):
    attention4 feeds audio[:, n_seed:], attention5 trims both ends and
    passes seed_last = final n_seed motion frames."""

    def builder(batch: Dict):
        motion = batch["motion"].transpose(0, 2, 1)[:, :, None, :]
        B, C, _, T = motion.shape
        audio = batch["audio"]
        cond = {
            "seed": motion[..., :n_seed],
            "style": batch["style"],
            "mask_local": jnp.ones((B, T), bool),
        }
        if "attention4" in variant:
            cond["audio"] = audio[:, n_seed:]
        elif "attention5" in variant:
            if n_seed <= 0:
                # [:-0] would be the EMPTY slice and [-0:] the FULL motion
                # (the ground truth leaked as conditioning)
                raise ValueError("attention5 requires n_seed > 0")
            cond["audio"] = audio[:, n_seed:-n_seed]
            cond["seed_last"] = motion[..., -n_seed:]
        else:
            cond["audio"] = audio
        mask = jnp.ones((B, 1, 1, T), jnp.float32)
        return motion, cond, mask

    return builder
