"""Reverse-process samplers compiled to single `lax.scan` loops.

The reference iterates t = T-1 … 0 in a Python for-loop with one model
eval per step (`gaussian_diffusion.py:673-740`) — ~1000 dispatches per
sampled window. Here each sampler is one `lax.scan` over the timestep
axis, so the whole 1000-step chain compiles to one XLA program with zero
host round-trips; long-form generation then jits the window loop around
it.

Parity surface:
  * `p_sample_loop`  ↔ ancestral DDPM (`p_sample`, ref `:506-558`),
    incl. `const_noise`, `skip_timesteps`/`init_image` warm-start, and the
    inpainting hook applied to the model output (ref `:317-324`).
  * `ddim_sample_loop` ↔ DDIM with eta (ref `:742-792`).
  * `plms_sample_loop` ↔ PLMS/Adams–Bashforth order 1–4 with the pseudo
    improved-Euler first step (ref `:1005-1087`).
  * `cfg_combine` ↔ ClassifierFreeSampleModel (`main/model/cfg_sampler.py:8-31`).

Randomness: explicit `jax.random` keys, folded per step — deterministic
given a key, mirroring the reference's `torch.manual_seed` determinism.
Tests can inject exact noise via `training`-style hooks (`noise` arg).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from . import gaussian as G
from .schedule import Schedule

ModelFn = Callable[[jax.Array, jax.Array], jax.Array]


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    """Static sampler options (hashable → usable as jit static arg)."""

    mean_type: G.MeanType = G.MeanType.START_X
    var_type: G.VarType = G.VarType.FIXED_SMALL
    clip_denoised: bool = False
    const_noise: bool = False
    eta: float = 0.0  # DDIM
    order: int = 2  # PLMS
    # lax.scan unroll factor for the timestep loop: k denoiser steps per
    # scan body. Probes whether per-iteration scan overhead (carry
    # round-trip, loop bookkeeping) matters at batch-1 single-stream
    # latency; measured by scripts/b1_latency_probe.py — see ROADMAP.
    unroll: int = 1


def _nonzero_mask(t: jax.Array, ndim: int) -> jax.Array:
    return (t != 0).astype(jnp.float32).reshape((-1,) + (1,) * (ndim - 1))


def _model_and_stats(
    sched: Schedule,
    model_fn: ModelFn,
    x: jax.Array,
    t: jax.Array,
    cfg: SamplerConfig,
    inpaint: Optional[tuple] = None,
) -> G.PMeanVariance:
    model_output = model_fn(x, sched.timestep_map[t])
    if inpaint is not None:
        # Inpainting hook: overwrite predicted x0 where mask=1
        # (ref `gaussian_diffusion.py:317-324`, START_X only — the
        # reference asserts the same; with EPSILON the x0-space motion
        # would be misread as a noise prediction).
        assert cfg.mean_type == G.MeanType.START_X, (
            "inpainting requires mean_type=START_X (ref :318)")
        inpainting_mask, inpainted_motion = inpaint
        model_output = jnp.where(inpainting_mask, inpainted_motion, model_output)
    return G.p_mean_variance(
        sched,
        model_output,
        x,
        t,
        mean_type=cfg.mean_type,
        var_type=cfg.var_type,
        clip_denoised=cfg.clip_denoised,
    )


def _init_img(
    sched: Schedule,
    key: jax.Array,
    shape,
    noise: Optional[jax.Array],
    skip_timesteps: int,
    init_image: Optional[jax.Array],
):
    """Initial x_T (+ warm-start), parity with ref `:700-713`."""
    img = jax.random.normal(key, shape, dtype=jnp.float32) if noise is None else noise
    t0 = sched.num_timesteps - skip_timesteps - 1
    if skip_timesteps and init_image is None:
        init_image = jnp.zeros(shape, dtype=jnp.float32)
    if init_image is not None:
        t_arr = jnp.full((shape[0],), t0, dtype=jnp.int32)
        img = G.q_sample(sched, init_image, t_arr, img)
    return img, t0


def p_sample_loop(
    sched: Schedule,
    model_fn: ModelFn,
    shape,
    key: jax.Array,
    *,
    cfg: SamplerConfig = SamplerConfig(),
    noise: Optional[jax.Array] = None,
    skip_timesteps: int = 0,
    init_image: Optional[jax.Array] = None,
    inpaint: Optional[tuple] = None,
    return_trajectory: bool = False,
) -> jax.Array:
    """Ancestral DDPM sampling as one `lax.scan` (ref `p_sample_loop:608`).

    `return_trajectory=True` additionally returns the (T, *shape) stack of
    intermediate samples, t = t0 … 0 (ref's `dump_steps` /
    `p_sample_loop_progressive` surface).
    """
    key, init_key = jax.random.split(key)
    img, t0 = _init_img(sched, init_key, shape, noise, skip_timesteps, init_image)

    def step(carry, i):
        img, key = carry
        key, nkey = jax.random.split(key)
        t = jnp.full((shape[0],), i, dtype=jnp.int32)
        out = _model_and_stats(sched, model_fn, img, t, cfg, inpaint)
        noise = jax.random.normal(nkey, shape, dtype=jnp.float32)
        if cfg.const_noise:
            noise = jnp.broadcast_to(noise[:1], shape)
        sample = out.mean + _nonzero_mask(t, img.ndim) * jnp.exp(0.5 * out.log_variance) * noise
        return (sample, key), (sample if return_trajectory else None)

    ts = jnp.arange(t0, -1, -1)
    (img, _), traj = jax.lax.scan(step, (img, key), ts, unroll=cfg.unroll)
    if return_trajectory:
        return img, traj
    return img


def ddim_sample_loop(
    sched: Schedule,
    model_fn: ModelFn,
    shape,
    key: jax.Array,
    *,
    cfg: SamplerConfig = SamplerConfig(),
    noise: Optional[jax.Array] = None,
    skip_timesteps: int = 0,
    init_image: Optional[jax.Array] = None,
    inpaint: Optional[tuple] = None,
) -> jax.Array:
    """DDIM sampling scan (ref `ddim_sample:742`, `ddim_sample_loop:889`)."""
    key, init_key = jax.random.split(key)
    img, t0 = _init_img(sched, init_key, shape, noise, skip_timesteps, init_image)
    nd = len(shape)

    def step(carry, i):
        img, key = carry
        key, nkey = jax.random.split(key)
        t = jnp.full((shape[0],), i, dtype=jnp.int32)
        out = _model_and_stats(sched, model_fn, img, t, cfg, inpaint)
        eps = G.predict_eps_from_xstart(sched, img, t, out.pred_xstart)
        alpha_bar = G._bcast(sched.alphas_cumprod, t, nd)
        alpha_bar_prev = G._bcast(sched.alphas_cumprod_prev, t, nd)
        sigma = (
            cfg.eta
            * jnp.sqrt((1 - alpha_bar_prev) / (1 - alpha_bar))
            * jnp.sqrt(1 - alpha_bar / alpha_bar_prev)
        )
        z = jax.random.normal(nkey, shape, dtype=jnp.float32)
        mean_pred = (
            out.pred_xstart * jnp.sqrt(alpha_bar_prev)
            + jnp.sqrt(1 - alpha_bar_prev - sigma**2) * eps
        )
        sample = mean_pred + _nonzero_mask(t, nd) * sigma * z
        return (sample, key), None

    ts = jnp.arange(t0, -1, -1)
    (img, _), _ = jax.lax.scan(step, (img, key), ts, unroll=cfg.unroll)
    return img


def ddim_reverse_sample(
    sched: Schedule,
    model_fn: ModelFn,
    x: jax.Array,
    t: jax.Array,
    *,
    cfg: SamplerConfig = SamplerConfig(),
) -> jax.Array:
    """One DDIM reverse-ODE step x_t → x_{t+1} (ref
    `gaussian_diffusion.py:851-888`; deterministic encoding direction)."""
    out = _model_and_stats(sched, model_fn, x, t, cfg)
    eps = G.predict_eps_from_xstart(sched, x, t, out.pred_xstart)
    nd = x.ndim
    alpha_bar_next = G._bcast(sched.alphas_cumprod_next, t, nd)
    return out.pred_xstart * jnp.sqrt(alpha_bar_next) + jnp.sqrt(1 - alpha_bar_next) * eps


def ddim_reverse_sample_loop(
    sched: Schedule,
    model_fn: ModelFn,
    x0: jax.Array,
    *,
    cfg: SamplerConfig = SamplerConfig(),
) -> jax.Array:
    """Encode x_0 → x_T along the deterministic DDIM ODE (the inversion
    used for editing/latent-space round trips), as one `lax.scan` over
    t = 0 … T−1."""
    B = x0.shape[0]

    def step(img, i):
        t = jnp.full((B,), i, dtype=jnp.int32)
        return ddim_reverse_sample(sched, model_fn, img, t, cfg=cfg), None

    out, _ = jax.lax.scan(step, x0, jnp.arange(sched.num_timesteps))
    return out


def plms_sample_loop(
    sched: Schedule,
    model_fn: ModelFn,
    shape,
    key: jax.Array,
    *,
    cfg: SamplerConfig = SamplerConfig(),
    noise: Optional[jax.Array] = None,
    skip_timesteps: int = 0,
    init_image: Optional[jax.Array] = None,
    inpaint: Optional[tuple] = None,
) -> jax.Array:
    """PLMS (Adams–Bashforth) sampling scan (ref `plms_sample:1005-1087`).

    The eps history lives in a fixed (order-1, *shape) ring inside the
    scan carry — sized to what Adams–Bashforth actually reads, not a
    hardcoded 4 (at serving shapes a 4-slot ring is ~26 MB copied every
    one of 1000 steps). The order ramps 1→`cfg.order` as history fills,
    and the order>1 cold start uses the reference's pseudo improved-Euler
    double evaluation.
    """
    order = int(cfg.order)
    if not 1 <= order <= 4:
        raise ValueError("order must be in [1, 4]")
    nh = max(order - 1, 1)  # history slots the method can ever read
    key, init_key = jax.random.split(key)
    img, t0 = _init_img(sched, init_key, shape, noise, skip_timesteps, init_image)
    nd = len(shape)

    # Adams-Bashforth coefficient table, rows = cur_order-1, newest eps first.
    ab = jnp.array(
        [
            [1.0, 0.0, 0.0, 0.0],
            [3.0 / 2.0, -1.0 / 2.0, 0.0, 0.0],
            [23.0 / 12.0, -16.0 / 12.0, 5.0 / 12.0, 0.0],
            [55.0 / 24.0, -59.0 / 24.0, 37.0 / 24.0, -9.0 / 24.0],
        ],
        dtype=jnp.float32,
    )

    def get_eps(x, t):
        out = _model_and_stats(sched, model_fn, x, t, cfg, inpaint)
        return G.predict_eps_from_xstart(sched, x, t, out.pred_xstart), out

    def step(carry, si):
        img, hist, count = carry
        i = si
        t = jnp.full((shape[0],), i, dtype=jnp.int32)
        alpha_bar_prev = G._bcast(sched.alphas_cumprod_prev, t, nd)
        eps, out = get_eps(img, t)

        def euler_start(_):
            # pseudo improved Euler first step (ref `:1055-1062`)
            mean_pred = out.pred_xstart * jnp.sqrt(alpha_bar_prev) + jnp.sqrt(1 - alpha_bar_prev) * eps
            eps2, _ = get_eps(mean_pred, jnp.maximum(t - 1, 0))
            return (eps + eps2) / 2.0

        def adams(_):
            # newest-first history with current eps prepended (order rows)
            h = jnp.concatenate([eps[None], hist], axis=0)[:order]
            cur = jnp.minimum(count + 1, order)
            coef = ab[cur - 1, : h.shape[0]]
            return jnp.tensordot(coef, h, axes=1)

        if order > 1:
            eps_prime = jax.lax.cond(count == 0, euler_start, adams, None)
        else:
            eps_prime = eps

        pred_prime = G.predict_xstart_from_eps(sched, img, t, eps_prime)
        mean_pred = pred_prime * jnp.sqrt(alpha_bar_prev) + jnp.sqrt(1 - alpha_bar_prev) * eps_prime
        nz = _nonzero_mask(t, nd)
        sample = mean_pred * nz + out.pred_xstart * (1 - nz)
        new_hist = jnp.concatenate([eps[None], hist], axis=0)[:nh]
        return (sample, new_hist, count + 1), None

    hist0 = jnp.zeros((nh,) + tuple(shape), dtype=jnp.float32)
    ts = jnp.arange(t0, -1, -1)
    (img, _, _), _ = jax.lax.scan(step, (img, hist0, jnp.int32(0)), ts, unroll=cfg.unroll)
    return img


def dpmpp2m_sample_loop(
    sched: Schedule,
    model_fn: ModelFn,
    shape,
    key: jax.Array,
    *,
    cfg: SamplerConfig = SamplerConfig(),
    noise: Optional[jax.Array] = None,
    skip_timesteps: int = 0,
    init_image: Optional[jax.Array] = None,
    inpaint: Optional[tuple] = None,
) -> jax.Array:
    """DPM-Solver++(2M) — beyond-parity fast deterministic sampler (Lu et
    al. 2022, arXiv:2211.01095), data-prediction multistep form: exact
    exponential integrator for the probability-flow ODE in λ = log(α/σ)
    with a 2nd-order multistep correction of the x₀ prediction. Matches
    DDIM's ODE limit but converges ~an order of magnitude faster in steps;
    run it over a respaced `Schedule` (e.g. `space_timesteps(1000,
    "ddim20")`) for few-step serving.

    Grid semantics match `ddim_sample_loop`: steps walk the schedule's own
    timestep grid t0 → 0, and the final update takes σ → 0 with a 1st-order
    step (diffusers' `lower_order_final`), returning the model's denoised
    prediction at the last grid point.
    """
    key, init_key = jax.random.split(key)
    img, t0 = _init_img(sched, init_key, shape, noise, skip_timesteps, init_image)
    nd = len(shape)

    alpha = jnp.sqrt(sched.alphas_cumprod)
    sigma = jnp.sqrt(1.0 - sched.alphas_cumprod)
    lam = jnp.log(alpha) - jnp.log(sigma)

    def x0_at(x, i):
        t = jnp.full((shape[0],), i, dtype=jnp.int32)
        return _model_and_stats(sched, model_fn, x, t, cfg, inpaint).pred_xstart

    def step(carry, i):
        x, x0_prev, h_prev, is_first = carry
        j = i - 1
        h = lam[j] - lam[i]
        x0 = x0_at(x, i)
        r = h_prev / h
        d_2m = (1.0 + 1.0 / (2.0 * r)) * x0 - (1.0 / (2.0 * r)) * x0_prev
        d = jnp.where(is_first, x0, d_2m)
        x_next = (sigma[j] / sigma[i]) * x - alpha[j] * (jnp.exp(-h) - 1.0) * d
        return (x_next, x0, h, jnp.zeros((), bool)), None

    if t0 > 0:
        ts = jnp.arange(t0, 0, -1)
        carry0 = (img, jnp.zeros_like(img), jnp.ones(()), jnp.ones((), bool))
        (img, _, _, _), _ = jax.lax.scan(step, carry0, ts, unroll=cfg.unroll)
    # final step to σ=0: x = D, taken 1st-order for stability
    return x0_at(img, 0)


def cfg_combine(out_cond: jax.Array, out_uncond: jax.Array, scale) -> jax.Array:
    """Classifier-free guidance mix (parity: `main/model/cfg_sampler.py:25-31`)."""
    return out_uncond + scale * (out_cond - out_uncond)


def make_cfg_model_fn(model_apply, scale, batch_size: int, *,
                      params=None, cond=None) -> Callable:
    """Wrap a conditioned model apply into a CFG model_fn.

    On TPU the cond/uncond passes run as one doubled batch (one
    MXU-saturating call instead of two half-empty ones). Two call
    conventions — the ONE shared implementation for every engine (ZEGGS
    batch/multi-clip, BEAT/TWH), so guidance semantics cannot drift
    between them:

      * bare: ``model_apply(x, t, uncond_mask)``;
      * engine (pass ``params`` and ``cond``): ``model_apply(params, x,
        t, cond, uncond=mask)`` with the conditioning dict doubled along
        the batch axis.
    """
    B = batch_size

    def fn(x, t):
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        uncond = jnp.concatenate(
            [jnp.zeros((B,), bool), jnp.ones((B,), bool)], axis=0)
        if cond is None:
            out = model_apply(x2, t2, uncond)
        else:
            cond2 = jax.tree.map(lambda c: jnp.concatenate([c, c], 0), cond)
            out = model_apply(params, x2, t2, cond2, uncond=uncond)
        return cfg_combine(out[:B], out[B:], scale)

    return fn
