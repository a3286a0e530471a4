"""action2motion GRU motion classifier + the unconstrained eval harness.

Ports `main/eval/a2m/action2motion/models.py` and the metric wiring of
`main/eval/unconstrained/evaluate.py:57-150`:

  * `MotionDiscriminator` — 2-layer GRU over flattened joints, last
    *valid* step (per-sequence length) → tanh(Linear 30) → Linear
    logits; `for_fid=True` returns the 30-d tanh features instead
    (`MotionDiscriminatorForFID`, models.py:45-62).  The torch version
    draws a random initial hidden state at every call (`initHidden`,
    models.py:41 — evaluation noise!); here h0 defaults to zeros and can
    be passed explicitly.
  * `convert_motion_discriminator` — torch `humanact12_gru.tar` state
    dict -> Flax params.
  * `unconstrained_metrics` — FID + KID + precision/recall + diversity
    over classifier features, as `evaluate_unconstrained_metrics`.
"""
from __future__ import annotations

from typing import Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .metrics import diversity as _diversity, frechet_distance
from .t2m_evaluator import TorchGRUCell
from .unconstrained import kid, precision_and_recall


class MotionDiscriminator(nn.Module):
    hidden_size: int = 128
    hidden_layers: int = 2
    output_size: int = 12
    for_fid: bool = False

    @nn.compact
    def __call__(self, motion: jax.Array, lengths: jax.Array,
                 h0: jax.Array = None) -> jax.Array:
        """motion (B, J, F, T), lengths (B,) -> logits (B, output) or
        30-d features when `for_fid`."""
        b, nj, nf, t = motion.shape
        x = motion.reshape(b, nj * nf, t).transpose(0, 2, 1)  # (B, T, D)
        if h0 is None:
            h0 = jnp.zeros((self.hidden_layers, b, self.hidden_size))
        out = x
        for layer in range(self.hidden_layers):
            cell = TorchGRUCell(self.hidden_size, name=f"gru_l{layer}")
            if self.is_initializing():
                cell(h0[layer], out[:, 0])

            def step(h, xt, cell=cell):
                h2 = cell(h, xt)
                return h2, h2

            _, ys = jax.lax.scan(step, h0[layer], jnp.swapaxes(out, 0, 1))
            out = jnp.swapaxes(ys, 0, 1)
        last = out[jnp.arange(b), lengths - 1]  # last valid step per row
        lin1 = jnp.tanh(nn.Dense(30, name="linear1")(last))
        if self.for_fid:
            return lin1
        return nn.Dense(self.output_size, name="linear2")(lin1)


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def convert_motion_discriminator(sd: Mapping, hidden_layers: int = 2) -> dict:
    params = {}
    for layer in range(hidden_layers):
        params[f"gru_l{layer}"] = {
            "ih": {"kernel": _t(sd[f"recurrent.weight_ih_l{layer}"]).T,
                   "bias": _t(sd[f"recurrent.bias_ih_l{layer}"])},
            "hh": {"kernel": _t(sd[f"recurrent.weight_hh_l{layer}"]).T,
                   "bias": _t(sd[f"recurrent.bias_hh_l{layer}"])},
        }
    for name in ("linear1", "linear2"):
        if f"{name}.weight" in sd:
            params[name] = {"kernel": _t(sd[f"{name}.weight"]).T,
                            "bias": _t(sd[f"{name}.bias"])}
    return params


def unconstrained_metrics(gt_features: np.ndarray, gen_features: np.ndarray,
                          diversity_times: int = 300, kid_subsets: int = 100,
                          seed: int = 0) -> dict:
    """FID/KID/precision-recall/diversity over classifier features
    (evaluate_unconstrained_metrics, unconstrained/evaluate.py:57-150)."""
    fid = frechet_distance(gt_features, gen_features)
    kid_mean, kid_std = kid(gt_features, gen_features,
                            n_subsets=kid_subsets, seed=seed)
    precision, recall = precision_and_recall(gen_features, gt_features)
    return {
        "fid": fid,
        "kid_mean": kid_mean,
        "kid_std": kid_std,
        "precision": precision,
        "recall": recall,
        "diversity_gt": _diversity(gt_features, min(diversity_times, len(gt_features)), seed),
        "diversity_gen": _diversity(gen_features, min(diversity_times, len(gen_features)), seed),
    }
