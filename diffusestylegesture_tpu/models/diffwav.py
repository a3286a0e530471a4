"""DiffWave-conditioned pose diffusion baseline (`diffwav_model`).

TPU-native realization of the reference's `generate/diffwav.py:17-63`.
The reference file is DEAD CODE THAT CANNOT IMPORT: it does
``from mydiffwave.src.diffwave.model import DiffWave`` against a
`mydiffwave` package that exists nowhere in the repository
(`tests/test_baselines.py` pins the ImportError on the reference's own
copy). What the file *declares* — and what this module builds — is:

  * the shared raw-audio `WavEncoder` producing a (B, 240, 32)
    same-rate conditioner (`diffwav.py:20,25`);
  * a DiffWave denoiser over (B, 240, 135) pose sequences driven by
    that conditioner (`diffwav.py:26-33`: channels 135, 240 frames,
    conditioner fed as `wav_feature`, no audio upsampler — conditioner
    and signal are already frame-aligned);
  * the DiffWave fast-sampling loop: caller-supplied ``beta`` /
    aligned-timestep ``T`` arrays, x = (x - c2*eps)/sqrt(alpha_n) with
    c2 = beta_n/sqrt(1-alpha_cum_n), sigma noise for n>0, and a
    [-1, 1] clamp each step (`diffwav.py:24-38`); the `__main__` uses
    beta = linspace(1e-4, 0.05, 50) (`diffwav.py:66`);
  * SmoothL1 between the prediction and the injected noise under the
    continuous noise-level q_sample (`diffwav.py:40-43,70-77`). (The
    reference `__main__` passes the clean pose as the `noise` argument
    at `:77` — a smoke-test bug we do not reproduce; the loss here is
    standard epsilon-prediction as `forward`'s signature intends.)

The denoiser follows the published DiffWave architecture (Kong et al.
2021, arXiv 2009.09761; lmnt-com/diffwave): input 1x1 conv + ReLU,
128-d sinusoidal diffusion-step embedding with two swish FCs to 512,
residual layers of dilated k3 convs (dilation cycling 2^(i mod c))
gated tanh*sigmoid, per-layer step-embedding bias and 1x1 conditioner
projection, skip accumulation scaled by 1/sqrt(L), and a two-conv
output head with a zero-initialized final projection.

TPU notes: NTC layout throughout (`lax.conv_general_dilated` handles
the dilations natively), static 240-frame windows, the whole sampler is
one `lax.scan`, and the gated activations fuse into the surrounding
convs under XLA.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .baselines import WavEncoder


class DiffusionStepEmbedding(nn.Module):
    """DiffWave step embedding: 128-d sin/cos table over t * 10^(j*4/63),
    then two swish-activated FCs to `out_dim` (lmnt diffwave
    `DiffusionEmbedding`)."""

    out_dim: int = 512

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:  # (B,) int/float
        j = jnp.arange(64, dtype=jnp.float32)
        ang = t.astype(jnp.float32)[:, None] * 10.0 ** (j[None, :] * 4.0 / 63.0)
        emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)  # (B, 128)
        emb = nn.Dense(self.out_dim, name="fc1")(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(self.out_dim, name="fc2")(emb)
        return nn.silu(emb)


class DiffWaveResidualLayer(nn.Module):
    """One DiffWave residual layer: dilated k3 conv to 2C, + step bias,
    + 1x1 conditioner projection, gated tanh*sigmoid, 1x1 out conv split
    into residual and skip halves."""

    residual_channels: int
    dilation: int

    @nn.compact
    def __call__(self, x, temb, cond):
        # x: (B, T, C); temb: (B, E); cond: (B, T, A)
        C = self.residual_channels
        y = nn.Conv(2 * C, (3,), kernel_dilation=(self.dilation,),
                    padding="SAME", name="dilated_conv")(x)
        y = y + nn.Dense(2 * C, name="step_proj")(temb)[:, None, :]
        y = y + nn.Conv(2 * C, (1,), name="cond_proj")(cond)
        gate, filt = jnp.split(y, 2, axis=-1)
        y = jnp.tanh(filt) * jax.nn.sigmoid(gate)
        y = nn.Conv(2 * C, (1,), name="out_proj")(y)
        residual, skip = jnp.split(y, 2, axis=-1)
        return (x + residual) / jnp.sqrt(2.0), skip


class DiffWave1D(nn.Module):
    """DiffWave denoiser adapted to frame-aligned pose sequences.

    `__call__(x, t, cond)`: x (B, T, channels) noisy poses, t (B,)
    timesteps, cond (B, T, cond_channels) conditioner -> (B, T,
    channels) epsilon prediction."""

    channels: int = 135
    cond_channels: int = 32
    residual_channels: int = 64
    residual_layers: int = 30
    dilation_cycle: int = 10

    @nn.compact
    def __call__(self, x: jax.Array, t: jax.Array, cond: jax.Array) -> jax.Array:
        h = nn.Conv(self.residual_channels, (1,), name="input_proj")(x)
        h = jax.nn.relu(h)
        temb = DiffusionStepEmbedding(name="step_embed")(t)
        skip_sum = jnp.zeros_like(h)
        for i in range(self.residual_layers):
            h, skip = DiffWaveResidualLayer(
                self.residual_channels,
                dilation=2 ** (i % self.dilation_cycle),
                name=f"layer{i}",
            )(h, temb, cond)
            skip_sum = skip_sum + skip
        out = skip_sum / jnp.sqrt(float(self.residual_layers))
        out = nn.Conv(self.residual_channels, (1,), name="skip_proj")(out)
        out = jax.nn.relu(out)
        return nn.Conv(self.channels, (1,),
                       kernel_init=nn.initializers.zeros,
                       name="output_proj")(out)


class DiffWavModel(nn.Module):
    """`diffwav_model` (`diffwav.py:17-43`): shared `WavEncoder` +
    DiffWave denoiser over 240x135 pose windows."""

    seq_len: int = 240
    channels: int = 135
    audio_dim: int = 32
    residual_channels: int = 64
    residual_layers: int = 30
    dilation_cycle: int = 10

    def setup(self):
        self.wav_encoder = WavEncoder(name="WavEncoder")
        self.denoiser = DiffWave1D(
            channels=self.channels,
            cond_channels=self.audio_dim,
            residual_channels=self.residual_channels,
            residual_layers=self.residual_layers,
            dilation_cycle=self.dilation_cycle,
            name="diffwav_model",
        )

    def encode_audio(self, wav: jax.Array) -> jax.Array:
        """(B, 64000) raw 16 kHz audio -> (B, 240, 32) (`diffwav.py:25`)."""
        return self.wav_encoder(wav)

    def denoise(self, x, t, cond):
        return self.denoiser(x, t, cond)

    def __call__(self, x, t, cond):
        # A 2-D conditioner is raw (B, 64000) audio; encode it here so
        # `init` through __call__ creates the WavEncoder params too.
        if cond.ndim == 2:
            cond = self.encode_audio(cond)
        return self.denoise(x, t, cond)


def diffwav_beta_schedule(steps: int = 50, beta_end: float = 0.05) -> np.ndarray:
    """The reference smoke schedule: linspace(1e-4, beta_end, steps)
    (`diffwav.py:66`; diffwave's training schedule uses beta_end 0.05
    over 50 steps, its fast-inference variant fewer)."""
    return np.linspace(1e-4, beta_end, steps)


def diffwav_aligned_T(train_beta: np.ndarray, infer_beta: np.ndarray) -> np.ndarray:
    """DiffWave fast-sampling timestep alignment (Kong et al. 2021,
    App. B; the `talpha` block the reference `__main__` copies at
    `diffwav.py:80-96`): map each inference noise level onto a
    fractional position in the training schedule by matching
    sqrt(alpha_cum)."""
    talpha_cum = np.sqrt(np.cumprod(1.0 - np.asarray(train_beta, np.float64)))
    alpha_cum = np.sqrt(np.cumprod(1.0 - np.asarray(infer_beta, np.float64)))
    T = np.zeros(len(infer_beta))
    for s in range(len(infer_beta)):
        for t in range(len(train_beta) - 1):
            if talpha_cum[t + 1] <= alpha_cum[s] <= talpha_cum[t]:
                twiddle = (talpha_cum[t] - alpha_cum[s]) / (
                    talpha_cum[t] - talpha_cum[t + 1]
                )
                T[s] = t + twiddle
                break
    return T.astype(np.float32)


def diffwav_training_loss(
    model: DiffWavModel,
    params,
    pose: jax.Array,   # (B, T, C)
    wav: jax.Array,    # (B, 64000)
    key: jax.Array,
    beta: Optional[np.ndarray] = None,
) -> jax.Array:
    """Continuous-noise-level epsilon-prediction SmoothL1
    (`diffwav.py:40-43` + the q_sample at `:70-77`)."""
    if beta is None:
        beta = diffwav_beta_schedule()
    noise_level = jnp.asarray(np.cumprod(1.0 - beta), jnp.float32)
    B = pose.shape[0]
    tkey, nkey = jax.random.split(key)
    t = jax.random.randint(tkey, (B,), 0, len(beta))
    scale = noise_level[t][:, None, None]
    noise = jax.random.normal(nkey, pose.shape)
    noisy = jnp.sqrt(scale) * pose + jnp.sqrt(1.0 - scale) * noise
    # a 2-D wav is raw audio; 3-D is an already-encoded conditioner
    if wav.ndim == 3:
        cond = wav
    else:
        cond = model.apply(params, wav, method=DiffWavModel.encode_audio)
    pred = model.apply(params, noisy, t.astype(jnp.float32), cond,
                       method=DiffWavModel.denoise)
    d = pred - noise
    ad = jnp.abs(d)
    return jnp.mean(jnp.where(ad < 1.0, 0.5 * d * d, ad - 0.5))


def diffwav_sample(
    model: DiffWavModel,
    params,
    wav: jax.Array,    # (B, 64000)
    key: jax.Array,
    beta: Optional[np.ndarray] = None,
    T: Optional[np.ndarray] = None,
    *,
    clamp: bool = True,
) -> jax.Array:
    """The `diffwav_model.sample` loop (`diffwav.py:24-38`) as one
    `lax.scan`: x <- (x - c2*eps)/sqrt(alpha_n), + sigma*noise for n>0,
    clamp to [-1, 1] each step. Returns (B, seq_len, channels)."""
    if beta is None:
        beta = diffwav_beta_schedule()
    if T is None:
        T = diffwav_aligned_T(beta, beta)
    beta = np.asarray(beta, np.float64)
    alpha = 1.0 - beta
    alpha_cum = np.cumprod(alpha)
    c1 = jnp.asarray(1.0 / np.sqrt(alpha), jnp.float32)
    c2 = jnp.asarray(beta / np.sqrt(1.0 - alpha_cum), jnp.float32)
    sigma = jnp.asarray(
        np.concatenate([
            [0.0],
            np.sqrt((1.0 - alpha_cum[:-1]) / (1.0 - alpha_cum[1:]) * beta[1:]),
        ]),
        jnp.float32,
    )
    T = jnp.asarray(T, jnp.float32)

    B = wav.shape[0]
    shape = (B, model.seq_len, model.channels)
    if wav.ndim == 3:
        cond = wav
    else:
        cond = model.apply(params, wav, method=DiffWavModel.encode_audio)
    key, ikey = jax.random.split(key)
    x = jax.random.normal(ikey, shape, dtype=jnp.float32)

    def step(carry, n):
        x, key = carry
        key, nkey = jax.random.split(key)
        t = jnp.full((B,), T[n], dtype=jnp.float32)
        eps = model.apply(params, x, t, cond, method=DiffWavModel.denoise)
        x = c1[n] * (x - c2[n] * eps)
        noise = jax.random.normal(nkey, shape, dtype=jnp.float32)
        x = x + jnp.where(n > 0, sigma[n], 0.0) * noise
        if clamp:
            x = jnp.clip(x, -1.0, 1.0)
        return (x, key), None

    ns = jnp.arange(len(beta) - 1, -1, -1)
    (x, _), _ = jax.lax.scan(step, (x, key), ns)
    return x
