"""ZeroEGGS RNN gesture generator (the reference's third sub-project).

Flax port of `ubisoft-laforge-ZeroEGGS-main/ZEGGS/modules.py`:
  * `SpeechEncoder` (`modules.py:237-260`): 1×1 conv → 31-wide replicate-
    padded conv → linear, ELU + dropout;
  * `StyleEncoderGRU` (`modules.py:295-331`): two 3-wide convs + ReLU →
    bidirectional GRU → last-step projection; `StyleEncoder` VAE head
    (`modules.py:266-292`) with temperature-scaled reparameterization;
  * `CellStateEncoder` (`modules.py:218-231`) and
    `RecurrentDecoderNormal` (`modules.py:153-173`): torch-parameterized
    GRU stack (double-bias gates) so checkpoints convert 1:1;
  * `vectorize_input` / `devectorize_output` (`modules.py:666-730`):
    pose-state flattening and velocity integration;
  * `decoder_rollout` ↔ `Decoder.forward` (`modules.py:49-150`): the
    reference's frame-by-frame Python loop becomes one `lax.scan`.

KL schedule helpers (`compute_KL_div`, `modules.py:752-777`) included for
training parity.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..motion import quat


def _elu(x):
    return jax.nn.elu(x)


class TorchGRUCell(nn.Module):
    """torch nn.GRU cell parameterization: separate input/hidden biases."""

    hidden_size: int

    @nn.compact
    def __call__(self, h: jax.Array, x: jax.Array) -> jax.Array:
        H = self.hidden_size
        gi = nn.Dense(3 * H, name="ih")(x)
        gh = nn.Dense(3 * H, name="hh")(h)
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        return (1.0 - z) * n + z * h


class TorchGRU(nn.Module):
    """Multi-layer (optionally bidirectional) GRU over (B, T, D)."""

    hidden_size: int
    num_layers: int = 1
    bidirectional: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, h0: jax.Array = None):
        B, T, _ = x.shape
        H = self.hidden_size

        def run(cell, seq, h_init, reverse=False):
            if reverse:
                seq = seq[:, ::-1]

            if self.is_initializing():
                cell(h_init, seq[:, 0])  # create params outside the scan

            def step(h, xt):
                h2 = cell(h, xt)
                return h2, h2

            h_last, ys = jax.lax.scan(
                step, h_init, jnp.swapaxes(seq, 0, 1)
            )
            ys = jnp.swapaxes(ys, 0, 1)
            if reverse:
                ys = ys[:, ::-1]
            return ys, h_last

        out = x
        h_finals = []
        ndir = 2 if self.bidirectional else 1
        for layer in range(self.num_layers):
            # torch h0 layout: (num_layers * num_directions, B, H) with the
            # backward direction at 2*layer+1
            hi = jnp.zeros((B, H)) if h0 is None else h0[ndir * layer]
            fwd_cell = TorchGRUCell(H, name=f"l{layer}_fwd")
            ys_f, hf = run(fwd_cell, out, hi)
            if self.bidirectional:
                hi_b = jnp.zeros((B, H)) if h0 is None else h0[ndir * layer + 1]
                bwd_cell = TorchGRUCell(H, name=f"l{layer}_bwd")
                ys_b, hb = run(bwd_cell, out, hi_b, reverse=True)
                out = jnp.concatenate([ys_f, ys_b], axis=-1)
                h_finals.extend([hf, hb])
            else:
                out = ys_f
                h_finals.append(hf)
        return out, jnp.stack(h_finals)


class SpeechEncoder(nn.Module):
    hidden_size: int
    output_size: int

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # replicate ("edge") padding, torch padding_mode='replicate'
        h = nn.Conv(self.hidden_size, (1,), padding="VALID", name="layer0")(x)
        h = nn.Dropout(0.2)(_elu(h), deterministic=not train)
        pad = 15
        hp = jnp.pad(h, ((0, 0), (pad, pad), (0, 0)), mode="edge")
        h = nn.Conv(self.output_size, (31,), padding="VALID", name="layer1")(hp)
        h = nn.Dropout(0.2)(_elu(h), deterministic=not train)
        return _elu(nn.Dense(self.output_size, name="layer2")(h))


class StyleEncoderGRU(nn.Module):
    hidden_size: int
    out_size: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = jax.nn.relu(nn.Conv(self.hidden_size, (3,), padding=1, name="conv0")(x))
        h = jax.nn.relu(nn.Conv(self.hidden_size, (3,), padding=1, name="conv1")(h))
        ys, _ = TorchGRU(self.hidden_size, 1, bidirectional=True, name="rnn")(h)
        return nn.Dense(self.out_size, name="projection")(ys[:, -1])


class StyleEncoderVAE(nn.Module):
    """StyleEncoder(use_vae=True) (`modules.py:266-292`); the inner
    encoder is the reference's `type` option: 'gru' (`modules.py:295-331`)
    or 'attn' (`modules.py:334-408`, FFT-block attention)."""

    hidden_size: int
    style_embedding_size: int
    encoder_type: str = "gru"

    @nn.compact
    def __call__(self, x: jax.Array, key=None, temperature: float = 1.0):
        if self.encoder_type == "gru":
            enc_cls = StyleEncoderGRU
        elif self.encoder_type == "attn":
            enc_cls = StyleEncoderAttn
        else:
            raise ValueError(f"unknown style encoder type {self.encoder_type!r}")
        enc = enc_cls(
            self.hidden_size, 2 * self.style_embedding_size, name="encoder"
        )(x)
        mu = enc[:, : self.style_embedding_size]
        logvar = enc[:, self.style_embedding_size:]
        if key is None:
            return mu, mu, logvar
        std = jnp.exp(0.5 * logvar) / temperature
        eps = jax.random.normal(key, std.shape)
        return mu + eps * std, mu, logvar


class CellStateEncoder(nn.Module):
    hidden_size: int
    num_rnn_layers: int

    @nn.compact
    def __call__(self, pose: jax.Array, style: jax.Array) -> jax.Array:
        h = _elu(nn.Dense(self.hidden_size, name="layer0")(jnp.concatenate([pose, style], -1)))
        h = _elu(nn.Dense(self.hidden_size, name="layer1")(h))
        out = nn.Dense(self.hidden_size * self.num_rnn_layers, name="layer2")(h)
        B = pose.shape[0]
        return out.reshape(B, self.num_rnn_layers, -1).swapaxes(0, 1)


class RecurrentDecoderNormal(nn.Module):
    hidden_size: int
    output_size: int
    num_rnn_layers: int

    @nn.compact
    def __call__(self, pose, speech, style, cell_state):
        cat = jnp.concatenate([pose, speech, style], axis=-1)
        hidden = _elu(nn.Dense(self.hidden_size, name="layer0")(cat))
        x = jnp.concatenate([hidden, pose, speech, style], axis=-1)
        new_states = []
        for layer in range(self.num_rnn_layers):
            cell = TorchGRUCell(self.hidden_size, name=f"gru_l{layer}")
            h = cell(cell_state[layer], x)
            new_states.append(h)
            x = h
        out = nn.Dense(self.output_size, name="layer2")(x)
        return out, jnp.stack(new_states)


def vectorize_input(
    root_pos, root_rot, root_vel, root_vrt, lpos, ltxy, lvel, lvrt, gaze_pos,
    anim_input_mean, anim_input_std,
):
    """(parity: `modules.py:666-701`)."""
    B = lpos.shape[0]
    gaze_dir = quat.mul_vec(quat.inv(root_rot), gaze_pos - root_pos)
    enc = jnp.concatenate(
        [
            root_vel.reshape(B, -1),
            root_vrt.reshape(B, -1),
            lpos.reshape(B, -1),
            ltxy.reshape(B, -1),
            lvel.reshape(B, -1),
            lvrt.reshape(B, -1),
            gaze_dir.reshape(B, -1),
        ],
        axis=1,
    )
    return (enc - anim_input_mean) / anim_input_std


def devectorize_output(
    predicted, root_pos, root_rot, njoints, dt, anim_output_mean, anim_output_std
):
    """(parity: `modules.py:704-730`)."""
    B = predicted.shape[0]
    p = predicted * anim_output_std + anim_output_mean
    P_root_vel = p[:, 0:3]
    P_root_vrt = p[:, 3:6]
    P_lpos = p[:, 6: 6 + njoints * 3].reshape(B, njoints, 3)
    P_ltxy = p[:, 6 + njoints * 3: 6 + njoints * 9].reshape(B, njoints, 2, 3)
    P_lvel = p[:, 6 + njoints * 9: 6 + njoints * 12].reshape(B, njoints, 3)
    P_lvrt = p[:, 6 + njoints * 12: 6 + njoints * 15].reshape(B, njoints, 3)
    P_root_pos = quat.mul_vec(root_rot, P_root_vel * dt) + root_pos
    P_root_rot = quat.mul(
        quat.from_helical(quat.mul_vec(root_rot, P_root_vrt * dt)), root_rot
    )
    return P_root_pos, P_root_rot, P_root_vel, P_root_vrt, P_lpos, P_ltxy, P_lvel, P_lvrt


@dataclasses.dataclass(frozen=True)
class ZeroEGGSConfig:
    njoints: int = 75
    pose_input_size: int = 75 * 15 + 9  # vectorized pose + root vel/vrt + gaze
    pose_output_size: int = 75 * 15 + 6
    speech_encoding_size: int = 128
    style_embedding_size: int = 64
    hidden_size: int = 512
    num_rnn_layers: int = 2
    dt: float = 1.0 / 60.0
    style_encoder_type: str = "gru"  # 'gru' | 'attn' (ref StyleEncoder type)


class ZeroEGGSDecoder(nn.Module):
    """Autoregressive decoder rollout as a `lax.scan`
    (↔ `Decoder.forward`, `modules.py:49-150`)."""

    cfg: ZeroEGGSConfig

    @nn.compact
    def __call__(
        self,
        initial_state: Tuple,  # (root_pos, root_rot, root_vel, root_vrt, lpos, ltxy, lvel, lvrt) at t=0
        gaze_pos: jax.Array,  # (B, T, 3)
        speech_encoding: jax.Array,  # (B, T, S)
        style_encoding: jax.Array,  # (B, T, E)
        anim_input_mean: jax.Array,
        anim_input_std: jax.Array,
        anim_output_mean: jax.Array,
        anim_output_std: jax.Array,
    ):
        cfg = self.cfg
        root_pos, root_rot, root_vel, root_vrt, lpos, ltxy, lvel, lvrt = initial_state

        cell_enc = CellStateEncoder(cfg.hidden_size, cfg.num_rnn_layers, name="cell_state_encoder")
        dec = RecurrentDecoderNormal(
            cfg.hidden_size, cfg.pose_output_size, cfg.num_rnn_layers,
            name="recurrent_decoder",
        )

        pose0 = vectorize_input(
            root_pos, root_rot, root_vel, root_vrt, lpos, ltxy, lvel, lvrt,
            gaze_pos[:, 0], anim_input_mean, anim_input_std,
        )
        state0 = cell_enc(pose0, style_encoding[:, 0])

        if self.is_initializing():
            # materialize decoder params outside the scan (flax init can't
            # create params inside lax.scan)
            dec(pose0, speech_encoding[:, 0], style_encoding[:, 0], state0)

        def step(carry, xs):
            (rp, rr, rv, rt, lp, lt, lv, lr, cell) = carry
            speech_i, style_i, gaze_i = xs
            pose_enc = vectorize_input(
                rp, rr, rv, rt, lp, lt, lv, lr, gaze_i, anim_input_mean, anim_input_std
            )
            pred, cell = dec(pose_enc, speech_i, style_i, cell)
            rp, rr, rv, rt, lp, lt, lv, lr = devectorize_output(
                pred, rp, rr, cfg.njoints, cfg.dt, anim_output_mean, anim_output_std
            )
            return (rp, rr, rv, rt, lp, lt, lv, lr, cell), (rp, rr, lp, lt)

        xs = (
            jnp.swapaxes(speech_encoding[:, 1:], 0, 1),
            jnp.swapaxes(style_encoding[:, 1:], 0, 1),
            jnp.swapaxes(gaze_pos[:, 1:], 0, 1),
        )
        carry0 = (root_pos, root_rot, root_vel, root_vrt, lpos, ltxy, lvel, lvrt, state0)
        _, (rp_seq, rr_seq, lp_seq, lt_seq) = jax.lax.scan(step, carry0, xs)

        # prepend the initial frame (the reference keeps frame 0 as GT)
        rp_all = jnp.concatenate([root_pos[None], rp_seq], axis=0).swapaxes(0, 1)
        rr_all = jnp.concatenate([root_rot[None], rr_seq], axis=0).swapaxes(0, 1)
        lp_all = jnp.concatenate([lpos[None], lp_seq], axis=0).swapaxes(0, 1)
        lt_all = jnp.concatenate([ltxy[None], lt_seq], axis=0).swapaxes(0, 1)
        return rp_all, rr_all, lp_all, lt_all


def kl_divergence(mu, logvar):
    """(parity: `compute_KL_div` core, `modules.py:766-767`)."""
    kl = -0.5 * jnp.mean(1 + logvar - mu**2 - jnp.exp(logvar), axis=1)
    return jnp.mean(kl)


def kl_weight(iteration, center=7500.0, growth=0.005, threshold=0.2):
    """KL annealing weight (`modules.py:733-777`). jit-compatible."""
    it = jnp.asarray(iteration, jnp.float32)
    w = 1.0 / (1.0 + jnp.exp(-growth * (it - center)))
    return jnp.minimum(w, threshold)


def make_zeroeggs_train_step(
    speech_encoder: SpeechEncoder,
    style_encoder: StyleEncoderVAE,
    decoder: ZeroEGGSDecoder,
    stats: dict,
    lr: float = 1e-4,
):
    """Teacher-style training step for the ported ZeroEGGS system.

    Functional equivalent of the reference trainer's core
    (`ubisoft-laforge-ZeroEGGS-main/ZEGGS/train.py:30-770`): autoregressive
    rollout from the window's first frame, position/rotation reconstruction
    losses against ground truth, VAE KL with the annealing schedule
    (`compute_KL_div`, `modules.py:752-777`), RAdam ↔ optax.radam.
    Returns (init_fn, step_fn) where step_fn(state, batch, key, iteration)
    expects batch = dict(initial_state, gaze, audio_features, style_example,
    target_root_pos/rot, target_lpos, target_ltxy).
    """
    import optax

    tx = optax.radam(lr)

    def loss_fn(params, batch, key, iteration):
        sp, st, dp = params["speech"], params["style"], params["decoder"]
        af = (batch["audio_features"] - stats["audio_input_mean"]) / stats["audio_input_std"]
        speech = speech_encoder.apply(sp, af)
        z, mu, logvar = style_encoder.apply(st, batch["style_example"], key=key)
        T = speech.shape[1]
        style_seq = jnp.broadcast_to(z[:, None, :], (z.shape[0], T, z.shape[1]))
        rp, rr, lp, lt = decoder.apply(
            dp, batch["initial_state"], batch["gaze"], speech, style_seq,
            stats["anim_input_mean"], stats["anim_input_std"],
            stats["anim_output_mean"], stats["anim_output_std"],
        )
        rec = (
            jnp.mean(jnp.abs(rp - batch["target_root_pos"]))
            + jnp.mean(jnp.abs(rr - batch["target_root_rot"]))
            + jnp.mean(jnp.abs(lp - batch["target_lpos"]))
            + jnp.mean(jnp.abs(lt - batch["target_ltxy"]))
        )
        kl = kl_divergence(mu, logvar)
        w = kl_weight(iteration)
        return rec + w * kl, {"rec": rec, "kl": kl, "kl_weight": w}

    def init_fn(params):
        return tx.init(params)

    def step_fn(params, opt_state, batch, key, iteration):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, key, iteration
        )
        updates, opt_state = tx.update(grads, opt_state, params)

        params = optax.apply_updates(params, updates)
        aux["loss"] = loss
        return params, opt_state, aux

    return init_fn, step_fn


class PositionWiseConvFF(nn.Module):
    """(`modules.py:548-601`): two 3-wide convs + ReLU, residual + LN."""

    hidden_size: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = jax.nn.relu(nn.Conv(self.hidden_size, (3,), padding=1, name="conv0")(x))
        h = nn.Conv(self.hidden_size, (3,), padding=1, name="conv1")(h)
        return nn.LayerNorm(epsilon=1e-5, name="layer_norm")(h + x)


class FFTBlock(nn.Module):
    """(`modules.py:472-501`): post-LN MHA + conv feed-forward.

    The live generate path runs full-length sequences (the padding mask is
    all-False, `modules.py:387-399`), so key-padding masking is omitted.
    """

    hidden_size: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from .transformer import TorchMultiheadAttention

        attn = TorchMultiheadAttention(self.hidden_size, 4, 0.0, name="mha")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="attn_norm")(attn + x)
        return PositionWiseConvFF(self.hidden_size, name="ff")(x)


class StyleEncoderAttn(nn.Module):
    """StyleEncoder(type='attn') (`modules.py:334-408`): convs + LN +
    positional encoding + FFT block + mean pooling."""

    hidden_size: int
    out_size: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from .embeddings import sinusoidal_pe

        h = jax.nn.relu(nn.Conv(self.hidden_size, (3,), padding=1, name="conv0")(x))
        h = nn.LayerNorm(epsilon=1e-5, name="ln0")(h)
        h = jax.nn.relu(nn.Conv(self.out_size, (3,), padding=1, name="conv1")(h))
        h = nn.LayerNorm(epsilon=1e-5, name="ln1")(h)
        T = h.shape[1]
        pos = jnp.asarray(sinusoidal_pe(max(T, 64), self.out_size))[:T]
        h = h + pos[None]
        h = FFTBlock(self.out_size, name="block0")(h)
        return jnp.mean(h, axis=1)
