"""Noise schedules and precomputed diffusion coefficient tables.

Behavioral parity with the reference's guided-diffusion port
(`main/diffusion/gaussian_diffusion.py:21-65,161-199`): the linear and
cosine (`betas_for_alpha_bar`) schedules, and all derived coefficient
arrays, computed in float64 then stored as float32 device arrays.

TPU-first design: the reference's `GaussianDiffusion.__init__` holds the
tables as NumPy arrays and indexes them per Python-loop step
(`_extract_into_tensor:1607`). Here they live in a single `Schedule`
pytree, so gathers like ``schedule.sqrt_alphas_cumprod[t]`` trace into the
compiled graph and the whole sampling loop can be one `lax.scan`.
"""
from __future__ import annotations

import math

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np


def linear_betas(num_timesteps: int, scale_betas: float = 1.0) -> np.ndarray:
    """Ho et al. linear schedule scaled to any step count (ref `:30-38`)."""
    scale = scale_betas * 1000 / num_timesteps
    return np.linspace(scale * 0.0001, scale * 0.02, num_timesteps, dtype=np.float64)


def cosine_betas(num_timesteps: int, max_beta: float = 0.999) -> np.ndarray:
    """Nichol & Dhariwal cosine schedule (ref `:39-65`), float64."""

    def alpha_bar(t: float) -> float:
        return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

    betas = []
    for i in range(num_timesteps):
        t1 = i / num_timesteps
        t2 = (i + 1) / num_timesteps
        betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), max_beta))
    return np.array(betas, dtype=np.float64)


def named_beta_schedule(name: str, num_timesteps: int, scale_betas: float = 1.0) -> np.ndarray:
    if name == "linear":
        return linear_betas(num_timesteps, scale_betas)
    if name == "cosine":
        return cosine_betas(num_timesteps)
    raise NotImplementedError(f"unknown beta schedule: {name}")


@flax.struct.dataclass
class Schedule:
    """All per-timestep diffusion coefficients as one jit-traceable pytree.

    Field-for-field parity with the reference's derived arrays
    (`gaussian_diffusion.py:161-199`).
    """

    betas: jax.Array
    alphas_cumprod: jax.Array
    alphas_cumprod_prev: jax.Array
    alphas_cumprod_next: jax.Array
    sqrt_alphas_cumprod: jax.Array
    sqrt_one_minus_alphas_cumprod: jax.Array
    log_one_minus_alphas_cumprod: jax.Array
    sqrt_recip_alphas_cumprod: jax.Array
    sqrt_recipm1_alphas_cumprod: jax.Array
    posterior_variance: jax.Array
    posterior_log_variance_clipped: jax.Array
    posterior_mean_coef1: jax.Array
    posterior_mean_coef2: jax.Array
    # FIXED_LARGE variance table (posterior_var[1] prepended to betas[1:]),
    # precomputed so p_mean_variance is branch-free under jit.
    fixed_large_variance: jax.Array
    fixed_large_log_variance: jax.Array
    log_betas: jax.Array
    # For respaced (SpacedDiffusion) schedules: map from position in this
    # schedule to the original timestep index fed to the model
    # (parity: `respace.py:64-129`). Identity when not respaced.
    timestep_map: jax.Array

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]

    @classmethod
    def create(cls, betas: np.ndarray, timestep_map: np.ndarray | None = None) -> "Schedule":
        betas = np.asarray(betas, dtype=np.float64)
        assert betas.ndim == 1 and (betas > 0).all() and (betas <= 1).all()
        T = betas.shape[0]

        alphas = 1.0 - betas
        alphas_cumprod = np.cumprod(alphas, axis=0)
        alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
        alphas_cumprod_next = np.append(alphas_cumprod[1:], 0.0)

        posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        # single-step schedules have no posterior_variance[1] (the
        # reference guards with `if len(...) > 1`): fall back to beta_0
        pv1 = posterior_variance[1] if len(posterior_variance) > 1 else betas[0]
        posterior_log_variance_clipped = np.log(
            np.append(pv1, posterior_variance[1:])
        )
        fixed_large_variance = np.append(pv1, betas[1:])

        if timestep_map is None:
            timestep_map = np.arange(T)

        f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)  # noqa: E731
        return cls(
            betas=f32(betas),
            alphas_cumprod=f32(alphas_cumprod),
            alphas_cumprod_prev=f32(alphas_cumprod_prev),
            alphas_cumprod_next=f32(alphas_cumprod_next),
            sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
            sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
            log_one_minus_alphas_cumprod=f32(np.log(1.0 - alphas_cumprod)),
            sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
            sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1)),
            posterior_variance=f32(posterior_variance),
            posterior_log_variance_clipped=f32(posterior_log_variance_clipped),
            posterior_mean_coef1=f32(
                betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
            ),
            posterior_mean_coef2=f32(
                (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
            ),
            fixed_large_variance=f32(fixed_large_variance),
            fixed_large_log_variance=f32(np.log(fixed_large_variance)),
            log_betas=f32(np.log(betas)),
            timestep_map=jnp.asarray(timestep_map, dtype=jnp.int32),
        )


def space_timesteps(num_timesteps: int, section_counts) -> set:
    """Select a subset of original timesteps for respaced sampling.

    Parity with `main/diffusion/respace.py:8-61`, including the ``ddimN``
    string form (fixed striding) and per-section even spreading.
    """
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired_count = int(section_counts[len("ddim"):])
            for i in range(1, num_timesteps):
                if len(range(0, num_timesteps, i)) == desired_count:
                    return set(range(0, num_timesteps, i))
            raise ValueError(f"cannot create exactly {num_timesteps} steps with an integer stride")
        section_counts = [int(x) for x in section_counts.split(",")]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx = 0
    all_steps = []
    for i, section_count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < section_count:
            raise ValueError(f"cannot divide section of {size} steps into {section_count}")
        if section_count <= 1:
            frac_stride = 1
        else:
            frac_stride = (size - 1) / (section_count - 1)
        cur_idx = 0.0
        taken_steps = []
        for _ in range(section_count):
            taken_steps.append(start_idx + round(cur_idx))
            cur_idx += frac_stride
        all_steps += taken_steps
        start_idx += size
    return set(all_steps)


def spaced_schedule(betas: np.ndarray, use_timesteps) -> Schedule:
    """Build a respaced `Schedule` (parity: `respace.py:64-116`).

    The new betas are recomputed so that the respaced chain's
    ``alphas_cumprod`` hits exactly the kept original values; the
    `timestep_map` remaps positions back to original model timesteps.
    """
    betas = np.asarray(betas, dtype=np.float64)
    alphas_cumprod = np.cumprod(1.0 - betas)
    use_timesteps = set(use_timesteps)
    last_alpha_cumprod = 1.0
    new_betas = []
    timestep_map = []
    for i, acp in enumerate(alphas_cumprod):
        if i in use_timesteps:
            new_betas.append(1 - acp / last_alpha_cumprod)
            last_alpha_cumprod = acp
            timestep_map.append(i)
    return Schedule.create(np.array(new_betas), np.array(timestep_map))
