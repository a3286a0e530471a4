"""Timestep schedule samplers (uniform + loss-second-moment importance).

Functional re-design of `main/diffusion/resample.py:8-154`. The loss-aware
resampler's history is an explicit pytree state updated per step; the
reference's `torch.distributed.all_gather` sync (`resample.py:87-99`)
becomes a `jax.lax.all_gather` inside the pjit'd train step when a mesh
axis is given, so multi-chip loss-aware sampling works out of the box
(the reference never activates its distributed path).
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp


def uniform_sample_t(key: jax.Array, batch: int, num_timesteps: int) -> Tuple[jax.Array, jax.Array]:
    """UniformSampler (ref `:42-58`): t ~ U{0..T-1}, weights = 1/p."""
    t = jax.random.randint(key, (batch,), 0, num_timesteps)
    weights = jnp.ones((batch,), dtype=jnp.float32)
    return t, weights


@flax.struct.dataclass
class LossAwareState:
    """Running per-timestep squared-loss history (ref `:124-154`)."""

    history: jax.Array  # (T, history_per_term)
    counts: jax.Array  # (T,) int32

    @classmethod
    def create(cls, num_timesteps: int, history_per_term: int = 10) -> "LossAwareState":
        return cls(
            history=jnp.zeros((num_timesteps, history_per_term), jnp.float32),
            counts=jnp.zeros((num_timesteps,), jnp.int32),
        )


def loss_aware_weights(state: LossAwareState, uniform_prob: float = 0.001) -> jax.Array:
    """Sampling distribution over t (ref `LossSecondMomentResampler.weights:137-144`)."""
    warmed = jnp.all(state.counts == state.history.shape[1])
    w = jnp.sqrt(jnp.mean(state.history**2, axis=-1))
    w = w / jnp.sum(w)
    w = w * (1 - uniform_prob) + uniform_prob / w.shape[0]
    uniform = jnp.full_like(w, 1.0 / w.shape[0])
    return jnp.where(warmed, w, uniform)


def loss_aware_sample_t(
    key: jax.Array, state: LossAwareState, batch: int
) -> Tuple[jax.Array, jax.Array]:
    """Importance-sample t and return (t, 1/(T·p_t)) weights (ref `:42-58`)."""
    p = loss_aware_weights(state)
    t = jax.random.choice(key, p.shape[0], (batch,), p=p)
    weights = 1.0 / (p.shape[0] * p[t])
    return t, weights


def update_with_losses(
    state: LossAwareState,
    ts: jax.Array,
    losses: jax.Array,
    axis_name: Optional[str] = None,
) -> LossAwareState:
    """Insert per-example losses into the ring history (ref `:145-153`).

    With `axis_name`, gathers (t, loss) pairs across the mesh axis first —
    the TPU equivalent of `update_with_local_losses`' all_gather
    (ref `:71-104`).
    """
    if axis_name is not None:
        ts = jax.lax.all_gather(ts, axis_name).reshape(-1)
        losses = jax.lax.all_gather(losses, axis_name).reshape(-1)
        # under shard_map's varying-axes typing the gathered operands are
        # marked varying; cast the carried state to match (the gathered
        # values are identical on every shard, so the result is too)
        try:
            state = jax.tree.map(
                lambda a: jax.lax.pcast(a, axis_name, to="varying"), state
            )
        except (AttributeError, TypeError, ValueError):
            pass  # pmap / older jax: no varying-type system

    def body(st, tl):
        t, loss = tl
        hist, counts = st
        cnt = counts[t]
        hpt = hist.shape[1]

        def warmed(h):
            # shift left, append
            row = jnp.concatenate([h[t, 1:], jnp.array([loss])])
            return h.at[t].set(row)

        def filling(h):
            return h.at[t, cnt].set(loss)

        def write(st2):
            hist2, counts2 = st2
            hist2 = jax.lax.cond(cnt == hpt, warmed, filling, hist2)
            counts2 = counts2.at[t].set(jnp.minimum(cnt + 1, hpt))
            return (hist2, counts2)

        # a non-finite loss must never enter the ring history: one NaN
        # makes every importance weight NaN forever (the optimizer's
        # NaN-skip protects params but not this state)
        return jax.lax.cond(jnp.isfinite(loss), write, lambda s: s,
                            (hist, counts)), None

    (hist, counts), _ = jax.lax.scan(body, (state.history, state.counts), (ts, losses))
    return LossAwareState(history=hist, counts=counts)
