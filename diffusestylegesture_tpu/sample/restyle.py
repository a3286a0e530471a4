"""Motion re-styling via DDIM inversion.

A capability the reference cannot express: take an EXISTING pose window
(ground truth or previously generated), invert it to the diffusion
latent along the deterministic DDIM ODE under its original conditioning
(`diffusion.ddim_reverse_sample_loop`), then decode with a DIFFERENT
style — content (timing, audio sync) is carried by the latent + audio
conditioning, style by the new condition. Standard image-editing
recipe (SDEdit/DDIM-inversion) applied to the gesture denoiser.

`strength` ∈ (0, 1] selects how far up the chain to invert: 1.0 runs the
full ODE to x_T (maximal re-style freedom), smaller values keep more of
the source motion.
"""
from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

from ..diffusion import Schedule, SamplerConfig
from ..diffusion.sampling import _model_and_stats, ddim_reverse_sample
from ..diffusion import gaussian as G


def restyle_window(
    sched: Schedule,
    model_apply: Callable,  # (x, t, cond) → x0 prediction
    motion: jax.Array,  # (B, C, 1, T) normalized pose window
    cond_src: Dict,
    cond_tgt: Dict,
    *,
    strength: float = 1.0,
    cfg: SamplerConfig = SamplerConfig(),
) -> jax.Array:
    """Invert `motion` under `cond_src`, decode under `cond_tgt`.

    Level bookkeeping: the encode scan over i = 0 … t_hi−1 walks
    ab[0] → ab[t_hi] (the clean input stands in for level ab[0] — the
    standard head fudge, error (1−ab[0]) → 0 with step count); the decode
    scan over j = t_hi … 0 walks back ab[t_hi] → ab[0] → clean
    (ab_prev[0] = 1), each step evaluated at the level the state is
    actually at — a one-index-lower decode loop leaves a non-vanishing
    O(1) drift.
    """
    assert 0.0 < strength <= 1.0
    t_hi = min(max(1, int(round(sched.num_timesteps * strength))),
               sched.num_timesteps - 1)
    B = motion.shape[0]

    def invert_step(x, i):
        t = jnp.full((B,), i, dtype=jnp.int32)
        return (
            ddim_reverse_sample(
                sched, lambda xx, tt: model_apply(xx, tt, cond_src), x, t, cfg=cfg
            ),
            None,
        )

    latent, _ = jax.lax.scan(invert_step, motion, jnp.arange(t_hi))

    def decode_step(x, j):
        t = jnp.full((B,), j, dtype=jnp.int32)
        out = _model_and_stats(
            sched, lambda xx, tt: model_apply(xx, tt, cond_tgt), x, t, cfg
        )
        # shared deterministic DDIM update (one definition,
        # train/distill.ddim_step)
        from ..train.distill import ddim_step

        return ddim_step(sched, x, t, out.pred_xstart), None

    out, _ = jax.lax.scan(decode_step, latent, jnp.arange(t_hi, -1, -1))
    return out
