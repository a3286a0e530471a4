"""Gesture feature-embedding network for FGD.

The gesture literature computes the Fréchet Gesture Distance over the
latent space of a motion autoencoder trained on ground-truth gestures
(Yoon et al. 2020), not over raw pose vectors; the reference repo has no
such network (its FID suite targets text-to-motion and is unwired), so
`cli/eval.py` defaults to raw windowed features. This module supplies the
standard embedding path:

  * `GestureAutoencoder` — 1-D conv encoder over fixed-length pose
    windows → latent, mirrored transposed-conv decoder;
  * `train_autoencoder` — jit-compiled MSE reconstruction training over a
    window array;
  * `embed_windows` — (N, W, D) → (N, latent) features for
    `eval.metrics.frechet_distance`.

TPU-first: windows are batched through one jit; training is a donated
scan-of-steps program.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class AEConfig:
    window: int = 40
    feat_dim: int = 1141
    hidden: int = 256
    latent: int = 128


class Encoder(nn.Module):
    cfg: AEConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, W, D)
        h = nn.Conv(self.cfg.hidden, (5,), strides=(2,), name="conv1")(x)
        h = nn.gelu(h)
        h = nn.Conv(self.cfg.hidden, (5,), strides=(2,), name="conv2")(h)
        h = nn.gelu(h)
        h = h.reshape(h.shape[0], -1)
        return nn.Dense(self.cfg.latent, name="proj")(h)


class Decoder(nn.Module):
    cfg: AEConfig

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        w4 = -(-self.cfg.window // 4)
        h = nn.Dense(w4 * self.cfg.hidden, name="proj")(z)
        h = nn.gelu(h).reshape(z.shape[0], w4, self.cfg.hidden)
        h = nn.ConvTranspose(self.cfg.hidden, (5,), strides=(2,), name="deconv1")(h)
        h = nn.gelu(h)
        h = nn.ConvTranspose(self.cfg.feat_dim, (5,), strides=(2,), name="deconv2")(h)
        return h[:, : self.cfg.window]


class GestureAutoencoder(nn.Module):
    cfg: AEConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        z = Encoder(self.cfg, name="encoder")(x)
        return Decoder(self.cfg, name="decoder")(z), z


def encode_fn(cfg: AEConfig, params, x) -> jax.Array:
    """Apply only the encoder half of trained autoencoder params."""
    return Encoder(cfg).apply({"params": params["params"]["encoder"]}, x)


def train_autoencoder(
    windows: np.ndarray,
    cfg: AEConfig,
    num_steps: int = 500,
    batch_size: int = 32,
    lr: float = 1e-3,
    seed: int = 0,
) -> Tuple[Dict, float]:
    """Train on (N, W, D) ground-truth windows; returns (params, final_loss)."""
    import optax

    model = GestureAutoencoder(cfg)
    key = jax.random.PRNGKey(seed)
    x0 = jnp.asarray(windows[: min(len(windows), batch_size)])
    params = model.init(key, x0)
    tx = optax.adam(lr)
    opt = tx.init(params)
    # the dataset enters the jitted program as an ARGUMENT — a closure
    # capture would bake it into the HLO as a literal constant (compile
    # bloat, transient 2× HBM, HTTP 413 on remote-compile transports —
    # the exact failure data/device_cache.py documents)
    data = jnp.asarray(windows)

    # the WHOLE training run is one donated lax.scan program: a Python
    # loop of per-step jits would pay num_steps dispatch round trips
    # (dominant through a remote/tunneled TPU backend) and copy
    # params/opt buffers every step instead of updating in place
    @functools.partial(jax.jit, static_argnums=3, donate_argnums=(0, 1))
    def train_all(params, opt, key, n_steps, data):
        def body(carry, k):
            params, opt = carry
            idx = jax.random.randint(k, (batch_size,), 0, data.shape[0])
            batch = data[idx]

            def loss_fn(p):
                recon, _ = model.apply(p, batch)
                return jnp.mean((recon - batch) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt2 = tx.update(grads, opt, params)
            return (optax.apply_updates(params, updates), opt2), loss

        (params, opt), losses = jax.lax.scan(
            body, (params, opt), jax.random.split(key, n_steps))
        return params, opt, losses[-1]

    if num_steps <= 0:  # smoke runs: untrained params, no scan to build
        return params, float("inf")
    params, opt, loss = train_all(params, opt, key, num_steps, data)
    return params, float(loss)


@functools.partial(jax.jit, static_argnums=0)
def _encode_jit(cfg: AEConfig, params, x):
    # one compiled encoder per AEConfig (hashable dataclass): repeated
    # embed_windows calls (generated set, then reference set) reuse it
    return encode_fn(cfg, params, x)


def embed_windows(params, cfg: AEConfig, windows: np.ndarray, batch: int = 256) -> np.ndarray:
    """(N, W, D) → (N, latent) embedding features."""
    out = []
    for s in range(0, len(windows), batch):
        out.append(np.asarray(_encode_jit(cfg, params, jnp.asarray(windows[s : s + batch]))))
    return np.concatenate(out, 0)
