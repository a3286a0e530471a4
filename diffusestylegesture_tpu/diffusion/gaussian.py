"""Gaussian diffusion processes as pure functions over a `Schedule` pytree.

Functional re-design of the reference's `GaussianDiffusion` class
(`main/diffusion/gaussian_diffusion.py:104-1620`): identical math for
q_sample, the posterior, p_mean_variance (all mean/variance modes), the
masked SmoothL1 training loss, and the VLB terms — but stateless,
jit-compatible, and with the per-step model call abstracted as
``model_fn(x, t) -> prediction`` so samplers can `lax.scan` over it.

The ``model_fn`` passed in is responsible for conditioning (the reference
threads ``model_kwargs['y']`` through; here the caller closes over its
conditioning dict). Timestep remapping on respaced schedules (the
reference's `_WrappedModel`, `respace.py:117-129`) is done by the
FRAMEWORK: every sampler loop and `calc_bpd_loop` call
``model_fn(x, schedule.timestep_map[t])``, so model_fn always receives
ORIGINAL-schedule timesteps and must not remap again.
"""
from __future__ import annotations

import enum
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .schedule import Schedule

ModelFn = Callable[[jax.Array, jax.Array], jax.Array]


class MeanType(enum.Enum):
    PREVIOUS_X = "previous_x"
    START_X = "start_x"
    EPSILON = "epsilon"
    # v-parameterization (Salimans & Ho 2022, "Progressive Distillation").
    # Not in the reference's guided-diffusion core; needed by the
    # `Generator_diff` baseline port (`main/mydiffusion_zeggs/generate/
    # generate.py:368-374` constructs `myGaussianDiffusion1D(...,
    # objective='pred_v')`) and by the consistency/progressive
    # distillation recipes.
    VELOCITY = "velocity"


class VarType(enum.Enum):
    LEARNED = "learned"
    FIXED_SMALL = "fixed_small"
    FIXED_LARGE = "fixed_large"
    LEARNED_RANGE = "learned_range"


class LossKind(enum.Enum):
    MSE = "mse"
    RESCALED_MSE = "rescaled_mse"
    KL = "kl"
    RESCALED_KL = "rescaled_kl"


def _bcast(table: jax.Array, t: jax.Array, ndim: int) -> jax.Array:
    """Gather per-timestep coefficients and broadcast to an x-shaped rank.

    Parity with `_extract_into_tensor` (`gaussian_diffusion.py:1607-1619`).
    """
    out = table[t].astype(jnp.float32)
    return out.reshape(out.shape + (1,) * (ndim - out.ndim))


def q_mean_variance(sched: Schedule, x_start: jax.Array, t: jax.Array):
    """q(x_t | x_0) (ref `:219-234`)."""
    nd = x_start.ndim
    mean = _bcast(sched.sqrt_alphas_cumprod, t, nd) * x_start
    variance = _bcast(1.0 - sched.alphas_cumprod, t, nd)
    log_variance = _bcast(sched.log_one_minus_alphas_cumprod, t, nd)
    return mean, variance, log_variance


def q_sample(sched: Schedule, x_start: jax.Array, t: jax.Array, noise: jax.Array) -> jax.Array:
    """Sample from q(x_t | x_0) (ref `:236-254`). `noise` is explicit for
    reproducibility/test-injection parity (ref's ``noise=`` parameter)."""
    nd = x_start.ndim
    return (
        _bcast(sched.sqrt_alphas_cumprod, t, nd) * x_start
        + _bcast(sched.sqrt_one_minus_alphas_cumprod, t, nd) * noise
    )


def q_posterior_mean_variance(sched: Schedule, x_start: jax.Array, x_t: jax.Array, t: jax.Array):
    """q(x_{t-1} | x_t, x_0) (ref `:256-278`)."""
    nd = x_t.ndim
    posterior_mean = (
        _bcast(sched.posterior_mean_coef1, t, nd) * x_start
        + _bcast(sched.posterior_mean_coef2, t, nd) * x_t
    )
    posterior_variance = _bcast(sched.posterior_variance, t, nd)
    posterior_log_variance = _bcast(sched.posterior_log_variance_clipped, t, nd)
    return posterior_mean, posterior_variance, posterior_log_variance


def predict_xstart_from_eps(sched: Schedule, x_t: jax.Array, t: jax.Array, eps: jax.Array):
    nd = x_t.ndim
    return (
        _bcast(sched.sqrt_recip_alphas_cumprod, t, nd) * x_t
        - _bcast(sched.sqrt_recipm1_alphas_cumprod, t, nd) * eps
    )


def predict_xstart_from_xprev(sched: Schedule, x_t: jax.Array, t: jax.Array, xprev: jax.Array):
    nd = x_t.ndim
    return (
        _bcast(1.0 / sched.posterior_mean_coef1, t, nd) * xprev
        - _bcast(sched.posterior_mean_coef2 / sched.posterior_mean_coef1, t, nd) * x_t
    )


def predict_eps_from_xstart(sched: Schedule, x_t: jax.Array, t: jax.Array, pred_xstart: jax.Array):
    nd = x_t.ndim
    return (
        _bcast(sched.sqrt_recip_alphas_cumprod, t, nd) * x_t - pred_xstart
    ) / _bcast(sched.sqrt_recipm1_alphas_cumprod, t, nd)


def predict_v(sched: Schedule, x_start: jax.Array, t: jax.Array, noise: jax.Array):
    """v = sqrt(a-bar_t) eps - sqrt(1 - a-bar_t) x_0  (Salimans & Ho 2022, eq. 11)."""
    nd = x_start.ndim
    return (
        _bcast(sched.sqrt_alphas_cumprod, t, nd) * noise
        - _bcast(sched.sqrt_one_minus_alphas_cumprod, t, nd) * x_start
    )


def predict_xstart_from_v(sched: Schedule, x_t: jax.Array, t: jax.Array, v: jax.Array):
    """x_0 = sqrt(a-bar_t) x_t - sqrt(1 - a-bar_t) v — inverse of `predict_v`."""
    nd = x_t.ndim
    return (
        _bcast(sched.sqrt_alphas_cumprod, t, nd) * x_t
        - _bcast(sched.sqrt_one_minus_alphas_cumprod, t, nd) * v
    )


class PMeanVariance(NamedTuple):
    mean: jax.Array
    variance: jax.Array
    log_variance: jax.Array
    pred_xstart: jax.Array


def p_mean_variance(
    sched: Schedule,
    model_output: jax.Array,
    x: jax.Array,
    t: jax.Array,
    *,
    mean_type: MeanType = MeanType.START_X,
    var_type: VarType = VarType.FIXED_SMALL,
    clip_denoised: bool = False,
    denoised_fn: Optional[Callable[[jax.Array], jax.Array]] = None,
) -> PMeanVariance:
    """Compute p(x_{t-1} | x_t) statistics from a model prediction.

    Parity with `gaussian_diffusion.py:280-398`, with the model already
    evaluated (callers evaluate once and may reuse the output, e.g. for
    classifier-free guidance mixing before this call).
    """
    nd = x.ndim

    if var_type in (VarType.LEARNED, VarType.LEARNED_RANGE):
        C = x.shape[1]
        model_output, model_var_values = jnp.split(model_output, [C], axis=1)
        if var_type == VarType.LEARNED:
            model_log_variance = model_var_values
            model_variance = jnp.exp(model_log_variance)
        else:
            min_log = _bcast(sched.posterior_log_variance_clipped, t, nd)
            max_log = _bcast(sched.log_betas, t, nd)
            frac = (model_var_values + 1) / 2
            model_log_variance = frac * max_log + (1 - frac) * min_log
            model_variance = jnp.exp(model_log_variance)
    elif var_type == VarType.FIXED_LARGE:
        model_variance = _bcast(sched.fixed_large_variance, t, nd)
        model_log_variance = _bcast(sched.fixed_large_log_variance, t, nd)
    else:  # FIXED_SMALL
        model_variance = _bcast(sched.posterior_variance, t, nd)
        model_log_variance = _bcast(sched.posterior_log_variance_clipped, t, nd)

    def process_xstart(xs):
        if denoised_fn is not None:
            xs = denoised_fn(xs)
        if clip_denoised:
            xs = jnp.clip(xs, -1.0, 1.0)
        return xs

    if mean_type == MeanType.PREVIOUS_X:
        pred_xstart = process_xstart(predict_xstart_from_xprev(sched, x, t, model_output))
        model_mean = model_output
    elif mean_type == MeanType.START_X:
        pred_xstart = process_xstart(model_output)
        model_mean, _, _ = q_posterior_mean_variance(sched, pred_xstart, x, t)
    elif mean_type == MeanType.EPSILON:
        pred_xstart = process_xstart(predict_xstart_from_eps(sched, x, t, model_output))
        model_mean, _, _ = q_posterior_mean_variance(sched, pred_xstart, x, t)
    elif mean_type == MeanType.VELOCITY:
        pred_xstart = process_xstart(predict_xstart_from_v(sched, x, t, model_output))
        model_mean, _, _ = q_posterior_mean_variance(sched, pred_xstart, x, t)
    else:
        raise NotImplementedError(mean_type)

    return PMeanVariance(model_mean, model_variance, model_log_variance, pred_xstart)


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------


def smooth_l1(a: jax.Array, b: jax.Array) -> jax.Array:
    """Elementwise SmoothL1 (Huber beta=1), parity with
    ``th.nn.SmoothL1Loss(reduction='none')`` used by `masked_l2`
    (`gaussian_diffusion.py:201-207`)."""
    d = a - b
    ad = jnp.abs(d)
    return jnp.where(ad < 1.0, 0.5 * d * d, ad - 0.5)


def sum_flat(x: jax.Array) -> jax.Array:
    return jnp.sum(x, axis=tuple(range(1, x.ndim)))


def mean_flat(x: jax.Array) -> jax.Array:
    return jnp.mean(x, axis=tuple(range(1, x.ndim)))


def masked_l2(a: jax.Array, b: jax.Array, mask: jax.Array) -> jax.Array:
    """Masked SmoothL1 averaged over unmasked elements (ref `:203-216`).

    a, b: [bs, J, F, T]; mask: [bs, 1, 1, T] (1 = keep).
    """
    loss = smooth_l1(a, b)
    loss = sum_flat(loss * mask.astype(jnp.float32))
    n_entries = a.shape[1] * a.shape[2]
    non_zero = sum_flat(mask.astype(jnp.float32)) * n_entries
    return loss / non_zero


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL between two gaussians (parity: `main/diffusion/losses.py:12-36`)."""
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def approx_standard_normal_cdf(x):
    return 0.5 * (1.0 + jnp.tanh(jnp.sqrt(2.0 / jnp.pi) * (x + 0.044715 * x**3)))


def discretized_gaussian_log_likelihood(x, *, means, log_scales):
    """Log-likelihood of a discretized Gaussian on [-1,1] 255-bin data
    (parity: `main/diffusion/losses.py:50-77`)."""
    centered_x = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered_x + 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    min_in = inv_stdv * (centered_x - 1.0 / 255.0)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, min=1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, min=1e-12))
    cdf_delta = cdf_plus - cdf_min
    log_probs = jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min, jnp.log(jnp.clip(cdf_delta, min=1e-12))),
    )
    return log_probs


def vb_terms_bpd(
    sched: Schedule,
    model_output: jax.Array,
    x_start: jax.Array,
    x_t: jax.Array,
    t: jax.Array,
    *,
    mean_type: MeanType,
    var_type: VarType,
    clip_denoised: bool = False,
):
    """Variational-bound term in bits-per-dim (ref `:1189-1235`)."""
    true_mean, _, true_log_var = q_posterior_mean_variance(sched, x_start, x_t, t)
    out = p_mean_variance(
        sched, model_output, x_t, t, mean_type=mean_type, var_type=var_type,
        clip_denoised=clip_denoised,
    )
    kl = normal_kl(true_mean, true_log_var, out.mean, out.log_variance)
    kl = mean_flat(kl) / jnp.log(2.0)
    decoder_nll = -discretized_gaussian_log_likelihood(
        x_start, means=out.mean, log_scales=0.5 * out.log_variance
    )
    decoder_nll = mean_flat(decoder_nll) / jnp.log(2.0)
    output = jnp.where(t == 0, decoder_nll, kl)
    return output, out.pred_xstart


def training_losses(
    sched: Schedule,
    model_fn: ModelFn,
    x_start: jax.Array,
    t: jax.Array,
    noise: jax.Array,
    mask: jax.Array,
    *,
    mean_type: MeanType = MeanType.START_X,
    var_type: VarType = VarType.FIXED_SMALL,
    loss_kind: LossKind = LossKind.MSE,
    lambda_vel: float = 0.0,
):
    """Per-example training loss dict (ref `:1237-1364`, live config:
    MSE + START_X + FIXED_SMALL, masked SmoothL1, all geometric λ = 0).

    `lambda_vel` reproduces the optional frame-difference velocity term
    (ref `:1349-1354`).
    """
    x_t = q_sample(sched, x_start, t, noise)
    terms = {}

    if loss_kind in (LossKind.KL, LossKind.RESCALED_KL):
        model_output = model_fn(x_t, t)
        out, _ = vb_terms_bpd(
            sched, model_output, x_start, x_t, t, mean_type=mean_type, var_type=var_type
        )
        terms["loss"] = out * (sched.num_timesteps if loss_kind == LossKind.RESCALED_KL else 1.0)
        return terms, x_t

    model_output = model_fn(x_t, t)

    if var_type in (VarType.LEARNED, VarType.LEARNED_RANGE):
        C = x_t.shape[1]
        mean_pred, var_values = jnp.split(model_output, [C], axis=1)
        frozen = jnp.concatenate([jax.lax.stop_gradient(mean_pred), var_values], axis=1)
        vb, _ = vb_terms_bpd(
            sched, frozen, x_start, x_t, t, mean_type=mean_type, var_type=var_type
        )
        if loss_kind == LossKind.RESCALED_MSE:
            vb = vb * (sched.num_timesteps / 1000.0)
        terms["vb"] = vb
        model_output = mean_pred

    if mean_type == MeanType.PREVIOUS_X:
        target = q_posterior_mean_variance(sched, x_start, x_t, t)[0]
    elif mean_type == MeanType.START_X:
        target = x_start
    elif mean_type == MeanType.VELOCITY:
        target = predict_v(sched, x_start, t, noise)
    else:
        target = noise

    terms["rot_mse"] = masked_l2(target, model_output, mask)

    if lambda_vel > 0.0:
        target_vel = target[..., 1:] - target[..., :-1]
        model_vel = model_output[..., 1:] - model_output[..., :-1]
        terms["vel_mse"] = masked_l2(
            target_vel[:, :-1], model_vel[:, :-1], mask[..., 1:]
        )

    terms["loss"] = (
        terms["rot_mse"]
        + terms.get("vb", 0.0)
        + lambda_vel * terms.get("vel_mse", 0.0)
    )
    return terms, x_t


def prior_bpd(sched: Schedule, x_start: jax.Array) -> jax.Array:
    """Prior KL term in bits/dim (ref `_prior_bpd:1531-1547`)."""
    B = x_start.shape[0]
    t = jnp.full((B,), sched.num_timesteps - 1, jnp.int32)
    qt_mean, _, qt_log_var = q_mean_variance(sched, x_start, t)
    kl = normal_kl(qt_mean, qt_log_var, 0.0, 0.0)
    return mean_flat(kl) / jnp.log(2.0)


def calc_bpd_loop(
    sched: Schedule,
    model_fn: ModelFn,
    x_start: jax.Array,
    key: jax.Array,
    *,
    mean_type: MeanType = MeanType.START_X,
    var_type: VarType = VarType.FIXED_SMALL,
    clip_denoised: bool = False,
):
    """Full VLB in bits/dim as one `lax.scan` over t = T-1…0
    (ref `calc_bpd_loop:1549-1604`, which loops in Python).

    Returns dict(total_bpd, prior_bpd, vb[N,T], xstart_mse[N,T], mse[N,T]);
    the [N, T] axes are ordered t = T-1 … 0 like the reference's append order.
    """
    B = x_start.shape[0]

    def step(key, t_scalar):
        key, nk = jax.random.split(key)
        t = jnp.full((B,), t_scalar, jnp.int32)
        noise = jax.random.normal(nk, x_start.shape, jnp.float32)
        x_t = q_sample(sched, x_start, t, noise)
        # same remap convention as every sampler loop
        # (`sampling._model_and_stats`): the framework maps the internal
        # index to the original-schedule timestep, so the engines'
        # non-remapping model_fns evaluate correctly on respaced schedules
        model_output = model_fn(x_t, sched.timestep_map[t])
        vb, pred_xstart = vb_terms_bpd(
            sched, model_output, x_start, x_t, t,
            mean_type=mean_type, var_type=var_type, clip_denoised=clip_denoised,
        )
        xstart_mse = mean_flat((pred_xstart - x_start) ** 2)
        eps = predict_eps_from_xstart(sched, x_t, t, pred_xstart)
        mse = mean_flat((eps - noise) ** 2)
        return key, (vb, xstart_mse, mse)

    ts = jnp.arange(sched.num_timesteps - 1, -1, -1)
    _, (vb, xstart_mse, mse) = jax.lax.scan(step, key, ts)
    vb = vb.T  # (N, T)
    pb = prior_bpd(sched, x_start)
    return {
        "total_bpd": vb.sum(axis=1) + pb,
        "prior_bpd": pb,
        "vb": vb,
        "xstart_mse": xstart_mse.T,
        "mse": mse.T,
    }
