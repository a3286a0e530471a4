"""Baseline (non-diffusion) gesture generators.

Ports of the reference's `main/mydiffusion_zeggs/generate/generate.py`
baseline suite — raw-audio conv encoder + codebook predictors and the
Bahdanau-attention seq2seq net the project compared against:

  * `WavEncoder` ↔ `generate.py:9-28`: 4-layer strided Conv1d stack
    (BatchNorm, LeakyReLU 0.3), (B, 64000) → (B, 240, 32);
  * `GeneratorLinear` ↔ `generate.py:31-57`: LayerNorm → Linear(32→512,
    no bias) codebook logits + cross-entropy / argmax `sample`;
  * `GeneratorGRU` ↔ `generate.py:311-347`: 2-layer bidirectional GRU
    (sum of directions) → LayerNorm → Linear(200→512);
  * `Seq2SeqNet` ↔ `generate.py:64-307`: embedding + bidirectional GRU
    encoder (summed directions), Bahdanau additive attention, pre-linear
    with BatchNorm, GRU decoder, teacher-forced `n_pre_poses` rollout.

The two diffusion baselines are unexecutable dead code in the reference
(`Generator_diff`, `generate.py:350-385`, uses `myUnet1D`/
`myGaussianDiffusion1D` whose import is commented out — NameError on
construction; `generate/diffwav.py` imports the external `mydiffwave`
package that is not part of the repository — `tests/test_baselines.py`
pins both). They are nevertheless ported as intent-repaired TPU-native
modules: `models/unet1d.py` (`GeneratorDiff`: audio-conditioned 1-D
U-Net under pred-v/huber diffusion) and `models/diffwav.py`
(`DiffWavModel`: DiffWave denoiser + the fast-sampling loop).

Inference-mode modules (BatchNorm uses converted running stats; dropout
off): the baselines exist for comparison sampling, not re-training.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .zeroeggs import TorchGRU


def _leaky(x):
    return jax.nn.leaky_relu(x, 0.3)


class _ConvBN(nn.Module):
    features: int
    kernel: int
    stride: int
    pad: int
    final: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, T, C)
        x = nn.Conv(
            self.features, (self.kernel,), strides=(self.stride,),
            padding=[(self.pad, self.pad)], name="conv",
        )(x)
        if not self.final:
            # torch BatchNorm1d in eval mode: running stats
            mean = self.param("bn_mean", nn.initializers.zeros, (self.features,))
            var = self.param("bn_var", nn.initializers.ones, (self.features,))
            scale = self.param("bn_scale", nn.initializers.ones, (self.features,))
            bias = self.param("bn_bias", nn.initializers.zeros, (self.features,))
            x = (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
            x = _leaky(x)
        return x


class WavEncoder(nn.Module):
    """(B, 64000) raw audio → (B, 240, 32) features (`generate.py:9-28`)."""

    @nn.compact
    def __call__(self, wav: jax.Array) -> jax.Array:
        x = wav[..., None]  # (B, S, 1)
        x = _ConvBN(16, 15, 3, 800, name="l0")(x)
        x = _ConvBN(32, 15, 3, 0, name="l1")(x)
        x = _ConvBN(64, 15, 5, 0, name="l2")(x)
        x = _ConvBN(32, 15, 6, 0, final=True, name="l3")(x)
        return x


class GeneratorLinear(nn.Module):
    """Codebook-logit baseline (`generate.py:31-57`)."""

    codebook_size: int = 512

    @nn.compact
    def __call__(self, wav: jax.Array, target: Optional[jax.Array] = None):
        feat = WavEncoder(name="WavEncoder")(wav)
        feat = nn.LayerNorm(epsilon=1e-5, name="norm")(feat)
        logits = nn.Dense(self.codebook_size, use_bias=False, name="project")(feat)
        loss = None
        if target is not None:
            logp = jax.nn.log_softmax(logits.reshape(-1, self.codebook_size))
            loss = -jnp.mean(
                jnp.take_along_axis(logp, target.reshape(-1, 1), axis=1)
            )
        return logits, loss

    def sample(self, params, wav: jax.Array) -> jax.Array:
        logits, _ = self.apply(params, wav)
        return jnp.argmax(logits, axis=-1)


class GeneratorGRU(nn.Module):
    """Bidirectional-GRU codebook baseline (`generate.py:311-347`)."""

    hidden_size: int = 200
    codebook_size: int = 512

    @nn.compact
    def __call__(self, wav: jax.Array, target: Optional[jax.Array] = None):
        feat = WavEncoder(name="WavEncoder")(wav)
        ys, _ = TorchGRU(self.hidden_size, num_layers=2, bidirectional=True,
                         name="project")(feat)
        ys = ys[..., : self.hidden_size] + ys[..., self.hidden_size :]
        ys = nn.LayerNorm(epsilon=1e-5, name="norm")(ys)
        logits = nn.Dense(self.codebook_size, name="out")(ys)
        loss = None
        if target is not None:
            logp = jax.nn.log_softmax(logits.reshape(-1, self.codebook_size))
            loss = -jnp.mean(
                jnp.take_along_axis(logp, target.reshape(-1, 1), axis=1)
            )
        return logits, loss


class EncoderRNN(nn.Module):
    """Embedding + bidirectional GRU, summed directions (`generate.py:64-108`)."""

    vocab: int
    embed_size: int
    hidden_size: int

    @nn.compact
    def __call__(self, tokens: jax.Array):  # (B, T) int
        emb = nn.Embed(self.vocab, self.embed_size, name="embedding")(tokens)
        ys, h_last = TorchGRU(self.hidden_size, num_layers=1, bidirectional=True,
                              name="gru")(emb)
        out = ys[..., : self.hidden_size] + ys[..., self.hidden_size :]
        return out, h_last  # (B, T, H), (2, B, H) fwd/bwd finals


class BahdanauAttn(nn.Module):
    """Additive attention (`generate.py:111-142`)."""

    hidden_size: int

    @nn.compact
    def __call__(self, hidden: jax.Array, enc: jax.Array) -> jax.Array:
        # hidden: (B, H) decoder state; enc: (B, T, H)
        T = enc.shape[1]
        H = jnp.broadcast_to(hidden[:, None, :], enc.shape)
        energy = jnp.tanh(
            nn.Dense(self.hidden_size, name="attn")(jnp.concatenate([H, enc], -1))
        )  # (B, T, H)
        v = self.param("v", nn.initializers.normal(1.0), (self.hidden_size,))
        scores = jnp.einsum("h,bth->bt", v, energy)
        return jax.nn.softmax(scores, axis=1)[:, None, :]  # (B, 1, T)


class BahdanauAttnDecoderCell(nn.Module):
    """One decoder step (`generate.py:145-240`, continuous representation)."""

    input_size: int
    hidden_size: int
    output_size: int

    @nn.compact
    def __call__(self, motion_in: jax.Array, last_hidden: jax.Array, enc: jax.Array):
        # motion_in: (B, D); last_hidden: (L=1, B, H); enc: (B, T, H)
        attn_w = BahdanauAttn(self.hidden_size, name="attn")(last_hidden[-1], enc)
        context = jnp.einsum("bot,bth->boh", attn_w, enc)[:, 0]  # (B, H)
        rnn_in = jnp.concatenate([motion_in, context], axis=-1)
        h = nn.Dense(self.hidden_size, name="pre_linear_fc")(rnn_in)
        # torch pre_linear includes BatchNorm1d (eval: running stats)
        mean = self.param("bn_mean", nn.initializers.zeros, (self.hidden_size,))
        var = self.param("bn_var", nn.initializers.ones, (self.hidden_size,))
        scale = self.param("bn_scale", nn.initializers.ones, (self.hidden_size,))
        bias = self.param("bn_bias", nn.initializers.zeros, (self.hidden_size,))
        h = (h - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
        h = jax.nn.relu(h)

        from .zeroeggs import TorchGRUCell

        new_h = TorchGRUCell(self.hidden_size, name="gru_cell")(last_hidden[-1], h)
        out = nn.Dense(self.output_size, name="out")(new_h)
        return out, new_h[None], attn_w


class Seq2SeqNet(nn.Module):
    """Teacher-forced seq2seq baseline (`generate.py:272-307`)."""

    vocab: int
    embed_size: int
    hidden_size: int
    pose_dim: int
    n_frames: int
    n_pre_poses: int = 2

    @nn.compact
    def __call__(self, tokens: jax.Array, poses: jax.Array):
        # tokens: (B, T_text); poses: (B, n_frames, pose_dim) teacher frames
        enc, h_last = EncoderRNN(self.vocab, self.embed_size, self.hidden_size,
                                 name="encoder")(tokens)
        dec_hidden = h_last[:1]  # forward-direction final (ref `:295`)
        cell = BahdanauAttnDecoderCell(
            self.pose_dim, self.hidden_size, self.pose_dim, name="decoder"
        )
        outputs = [poses[:, 0]]
        dec_in = poses[:, 0]
        # deliberate Python unroll (vs the lax.scan used in zeroeggs.py):
        # the attention + BatchNorm (mutable state) per step make nn.scan
        # awkward, and this baseline is vestigial — short n_frames only
        for t in range(1, self.n_frames):
            out, dec_hidden, _ = cell(dec_in, dec_hidden, enc)
            outputs.append(out)
            dec_in = poses[:, t] if t < self.n_pre_poses else out
        return jnp.stack(outputs, axis=1)


# ---------------------------------------------------------------------------
# torch → flax converters
# ---------------------------------------------------------------------------


def _np(x) -> np.ndarray:
    return np.asarray(getattr(x, "detach", lambda: x)().cpu() if hasattr(x, "cpu") else x)


def _conv_bn(sd: Mapping[str, Any], idx: int, final: bool = False) -> Dict:
    base = f"WavEncoder.feat_extractor.{idx}"
    out = {"conv": {
        "kernel": _np(sd[f"{base}.weight"]).transpose(2, 1, 0),
        "bias": _np(sd[f"{base}.bias"]),
    }}
    if not final:
        bn = f"WavEncoder.feat_extractor.{idx + 1}"
        out.update(
            bn_mean=_np(sd[f"{bn}.running_mean"]),
            bn_var=_np(sd[f"{bn}.running_var"]),
            bn_scale=_np(sd[f"{bn}.weight"]),
            bn_bias=_np(sd[f"{bn}.bias"]),
        )
    return out


def convert_wav_encoder(sd: Mapping[str, Any]) -> Dict:
    return {
        "l0": _conv_bn(sd, 0),
        "l1": _conv_bn(sd, 3),
        "l2": _conv_bn(sd, 6),
        "l3": _conv_bn(sd, 9, final=True),
    }


def _gru(sd: Mapping[str, Any], prefix: str, layers: int, bidirectional: bool) -> Dict:
    out = {}
    for layer in range(layers):
        for rev, tag in ((False, "fwd"), (True, "bwd"))[: 2 if bidirectional else 1]:
            sfx = f"_l{layer}" + ("_reverse" if rev else "")
            out[f"l{layer}_{tag}"] = {
                "ih": {
                    "kernel": _np(sd[f"{prefix}.weight_ih{sfx}"]).T,
                    "bias": _np(sd[f"{prefix}.bias_ih{sfx}"]),
                },
                "hh": {
                    "kernel": _np(sd[f"{prefix}.weight_hh{sfx}"]).T,
                    "bias": _np(sd[f"{prefix}.bias_hh{sfx}"]),
                },
            }
    return out


def convert_generator_linear(sd: Mapping[str, Any]) -> Dict:
    return {
        "WavEncoder": convert_wav_encoder(sd),
        "norm": {"scale": _np(sd["norm.weight"]), "bias": _np(sd["norm.bias"])},
        "project": {"kernel": _np(sd["project.weight"]).T},
    }


def convert_generator_gru(sd: Mapping[str, Any]) -> Dict:
    return {
        "WavEncoder": convert_wav_encoder(sd),
        "project": _gru(sd, "project", 2, True),
        "norm": {"scale": _np(sd["norm.weight"]), "bias": _np(sd["norm.bias"])},
        "out": {"kernel": _np(sd["out.weight"]).T, "bias": _np(sd["out.bias"])},
    }


def convert_seq2seq(sd: Mapping[str, Any]) -> Dict:
    dec = "decoder.decoder"
    return {
        "encoder": {
            "embedding": {"embedding": _np(sd["encoder.embedding.weight"])},
            "gru": _gru(sd, "encoder.gru", 1, True),
        },
        "decoder": {
            "attn": {
                "attn": {
                    "kernel": _np(sd[f"{dec}.attn.attn.weight"]).T,
                    "bias": _np(sd[f"{dec}.attn.attn.bias"]),
                },
                "v": _np(sd[f"{dec}.attn.v"]),
            },
            "pre_linear_fc": {
                "kernel": _np(sd[f"{dec}.pre_linear.0.weight"]).T,
                "bias": _np(sd[f"{dec}.pre_linear.0.bias"]),
            },
            "bn_mean": _np(sd[f"{dec}.pre_linear.1.running_mean"]),
            "bn_var": _np(sd[f"{dec}.pre_linear.1.running_var"]),
            "bn_scale": _np(sd[f"{dec}.pre_linear.1.weight"]),
            "bn_bias": _np(sd[f"{dec}.pre_linear.1.bias"]),
            "gru_cell": {
                "ih": {
                    "kernel": _np(sd[f"{dec}.gru.weight_ih_l0"]).T,
                    "bias": _np(sd[f"{dec}.gru.bias_ih_l0"]),
                },
                "hh": {
                    "kernel": _np(sd[f"{dec}.gru.weight_hh_l0"]).T,
                    "bias": _np(sd[f"{dec}.gru.bias_hh_l0"]),
                },
            },
            "out": {
                "kernel": _np(sd[f"{dec}.out.weight"]).T,
                "bias": _np(sd[f"{dec}.out.bias"]),
            },
        },
    }
