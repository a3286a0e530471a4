"""Progressive distillation for few-step sampling (Salimans & Ho 2022).

The reference serves with 1000 sequential denoiser evals per window; the
single-stream ceiling is therefore set by step count. This module
implements the standard step-halving distillation: a student is trained
so that ONE of its DDIM steps reproduces TWO consecutive DDIM steps of
the teacher, halving the chain per stage (1000 → 500 → … → 4) with the
student of each stage becoming the next teacher. No reference analog —
this is a TPU-serving capability on top of the parity surface
(`diffusion/` provides the exact DDIM math both sides use).

Usage:
    sched_s = student_schedule(sched_t)           # half the timesteps
    step = make_distill_step(teacher_apply, student_apply, sched_t, lr)
    params_s, opt, metrics = step(params_s, opt, params_t, batch, key)

Teacher/student are both x0-predictors (the framework's live
configuration, START_X). The distillation target is derived in closed
form: run the teacher two DDIM(eta=0) steps from x_t to x_{t-2}, then
solve for the x0 the student must predict at t so its single DDIM step
from x_t lands exactly on x_{t-2}:

    x_{t-2} = sqrt(ab2) * x0* + sqrt(1-ab2) * eps*(x_t, x0*)
    eps*(x_t, x0) = (x_t - sqrt(ab_t) x0) / sqrt(1-ab_t)
    → x0* = (x_{t-2} - sqrt((1-ab2)/(1-ab_t)) x_t)
            / (sqrt(ab2) - sqrt((1-ab2)/(1-ab_t)) sqrt(ab_t))

(Salimans & Ho eq. 9 specialized to eta=0, x0-parameterization.)
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from ..diffusion import Schedule
from ..diffusion import gaussian as G
from ..diffusion.schedule import spaced_schedule


def student_schedule(teacher: Schedule, base_betas=None) -> Schedule:
    """Half-step schedule: keeps every second of the teacher's timesteps.

    `base_betas` are the ORIGINAL (unspaced) betas; when None the teacher
    is assumed unspaced and its betas are reconstructed from
    alphas_cumprod.
    """
    import numpy as np

    if base_betas is None:
        ac = np.asarray(teacher.alphas_cumprod, np.float64)
        prev = np.concatenate([[1.0], ac[:-1]])
        base_betas = 1.0 - ac / prev
        base_map = np.asarray(teacher.timestep_map)
        assert (base_map == np.arange(len(base_map))).all(), (
            "pass base_betas for an already-respaced teacher"
        )
    use = set(np.asarray(teacher.timestep_map)[1::2].tolist())
    return spaced_schedule(base_betas, use)


def ddim_step(sched: Schedule, x, t, x0_pred):
    """One deterministic DDIM (eta=0) step x_t → x_{t-1} given pred x0."""
    nd = x.ndim
    eps = G.predict_eps_from_xstart(sched, x, t, x0_pred)
    ab_prev = G._bcast(sched.alphas_cumprod_prev, t, nd)
    return x0_pred * jnp.sqrt(ab_prev) + jnp.sqrt(1.0 - ab_prev) * eps


def two_step_target(sched_t: Schedule, teacher_fn: Callable, x, t):
    """Teacher runs x_t → x_{t-1} → x_{t-2}; returns the x0* the student
    must predict at (x_t, t) so one student step lands on x_{t-2}.

    `t` indexes the (possibly respaced) schedule; the network sees the
    ORIGINAL timesteps via `timestep_map` (same convention as the
    samplers' `_model_and_stats`), so staged distillation keeps one
    consistent timestep vocabulary across stages."""
    nd = x.ndim
    x0_a = teacher_fn(x, sched_t.timestep_map[t])
    x_mid = ddim_step(sched_t, x, t, x0_a)
    t_mid = jnp.maximum(t - 1, 0)
    x0_b = teacher_fn(x_mid, sched_t.timestep_map[t_mid])
    x_tgt = ddim_step(sched_t, x_mid, t_mid, x0_b)

    ab_t = G._bcast(sched_t.alphas_cumprod, t, nd)
    ab_2 = G._bcast(sched_t.alphas_cumprod_prev, t_mid, nd)
    frac = jnp.sqrt((1.0 - ab_2) / (1.0 - ab_t))
    denom = jnp.sqrt(ab_2) - frac * jnp.sqrt(ab_t)
    # at the final step ab_2 → 1, denom stays > 0 for any usable schedule
    x0_star = (x_tgt - frac * x) / denom
    return x0_star, x_tgt


def make_distill_step(
    teacher_fn: Callable,  # (x, t[, cond]) → x0 prediction (teacher, frozen)
    student_apply: Callable,  # (params, x, t[, cond]) → x0 prediction
    sched_teacher: Schedule,
    lr: float = 1e-4,
    conditioned: bool = False,
) -> Tuple[Callable, Callable]:
    """Returns (init_fn(params) → opt_state, step_fn).

    step_fn(params, opt_state, x0_batch, key[, cond]) draws t over the
    teacher's odd indices (the student's grid), forms x_t by q_sample,
    computes the closed-form two-step target, and regresses the student's
    x0 prediction onto it (SNR-truncated weighting per the paper:
    max(1, ab/(1-ab)) in x0-space).

    With `conditioned=True` both networks take a conditioning pytree
    (the gesture denoisers' `cond` dict) as a third argument and
    step_fn grows a trailing `cond` parameter — the teacher and student
    see the SAME conditioning, as in conditional distillation.
    """
    import optax

    tx = optax.adam(lr)
    nt = sched_teacher.num_timesteps

    def loss_fn(params, x0, key, cond):
        B = x0.shape[0]
        k_t, k_n = jax.random.split(key)
        # student timesteps ↔ teacher odd indices t (two teacher steps
        # t, t-1 collapse into one student step); sample t ∈ {1,3,5,…}
        i = jax.random.randint(k_t, (B,), 0, nt // 2)
        t = 2 * i + 1
        noise = jax.random.normal(k_n, x0.shape, x0.dtype)
        x_t = G.q_sample(sched_teacher, x0, t, noise)
        t_model = sched_teacher.timestep_map[t]  # original-timestep vocab
        if conditioned:
            t_fn = lambda x, tt: teacher_fn(x, tt, cond)  # noqa: E731
            pred = student_apply(params, x_t, t_model, cond)
        else:
            t_fn = teacher_fn
            pred = student_apply(params, x_t, t_model)
        target, _ = two_step_target(sched_teacher, t_fn, x_t, t)
        target = jax.lax.stop_gradient(target)
        ab = G._bcast(sched_teacher.alphas_cumprod, t, x0.ndim)
        w = jnp.maximum(1.0, ab / (1.0 - ab))  # truncated-SNR weight
        return jnp.mean(w * (pred - target) ** 2)

    def init_fn(params):
        return tx.init(params)

    def step_fn(params, opt_state, x0_batch, key, cond=None):
        loss, grads = jax.value_and_grad(loss_fn)(params, x0_batch, key, cond)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss}

    return init_fn, step_fn
