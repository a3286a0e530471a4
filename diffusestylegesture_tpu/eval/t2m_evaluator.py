"""Text-to-motion evaluator networks + evaluation harness.

Ports the reference's humanml evaluation stack (the only piece of
`main/eval/eval_humanml.py` that needs neural nets):

  * `MovementConvEncoder` / `TextEncoderBiGRUCo` / `MotionEncoderBiGRUCo`
    (`main/data_loaders/humanml/networks/modules.py:79-387`) as Flax
    modules. The torch encoders use `pack_padded_sequence` to stop the
    GRU at each sequence's true length; here a masked `lax.scan` carries
    the hidden state through padding unchanged — identical final states,
    no sorting requirement, static shapes under jit.
  * `convert_evaluator_ckpt` — maps the `finest.tar` torch state dicts
    (`networks/evaluator_wrapper.py:95-118`) onto the Flax params.
  * `T2MEvaluator` — the `EvaluatorMDMWrapper` analog
    (`evaluator_wrapper.py:121-186`): co-embeddings for text/motion
    pairs and motion-only embeddings.  Unlike the reference, outputs are
    returned in *input* order (the torch version returns them sorted by
    descending length — a footgun its callers must undo).
  * `evaluate_*` / `evaluation` — the metric harness of
    `eval/eval_humanml.py:19-138` over embedding batches (matching
    score, R-precision, FID, diversity, multimodality, with
    mean/95%-CI summaries across replications).
"""
from __future__ import annotations

from collections import OrderedDict
from typing import Callable, Dict, Iterable, Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .metrics import activation_statistics, frechet_distance, sqrtm
from .t2m import euclidean_distance_matrix, top_k_hits

# dim_pos_ohot in the reference = len(POS_enumerator)
# (data_loaders/humanml/utils/word_vectorizer.py:1-29)
POS_DIM = 15
UNIT_LENGTH = 4


class TorchGRUCell(nn.Module):
    """torch GRU gate order (r, z, n) with separate input/hidden biases."""

    hidden_size: int

    @nn.compact
    def __call__(self, h: jax.Array, x: jax.Array) -> jax.Array:
        gi = nn.Dense(3 * self.hidden_size, name="ih")(x)
        gh = nn.Dense(3 * self.hidden_size, name="hh")(h)
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        return (1.0 - z) * n + z * h


class MaskedBiGRU(nn.Module):
    """Bidirectional GRU over (B, T, D) with per-sequence lengths.

    Equivalent to torch `pack_padded_sequence` + `nn.GRU`: frames at
    t >= length leave the carry untouched, so the final forward state is
    the state at t = length-1 and the final backward state has consumed
    exactly frames length-1 … 0."""

    hidden_size: int

    @nn.compact
    def __call__(self, x: jax.Array, lengths: jax.Array, h0: jax.Array):
        T = x.shape[1]
        mask = jnp.arange(T)[None, :] < lengths[:, None]
        fwd = TorchGRUCell(self.hidden_size, name="fwd")
        bwd = TorchGRUCell(self.hidden_size, name="bwd")
        if self.is_initializing():
            fwd(h0[0], x[:, 0])
            bwd(h0[1], x[:, 0])

        def make_step(cell):
            def step(h, inp):
                xt, mt = inp
                h2 = cell(h, xt)
                h = jnp.where(mt[:, None], h2, h)
                return h, h

            return step

        xs = jnp.swapaxes(x, 0, 1)
        ms = jnp.swapaxes(mask, 0, 1)
        h_f, ys_f = jax.lax.scan(make_step(fwd), h0[0], (xs, ms))
        h_b, ys_b = jax.lax.scan(make_step(bwd), h0[1], (xs[::-1], ms[::-1]))
        outs = jnp.concatenate(
            [jnp.swapaxes(ys_f, 0, 1), jnp.swapaxes(ys_b, 0, 1)[:, ::-1]], axis=-1
        )
        return outs, (h_f, h_b)


def _leaky(x):
    return nn.leaky_relu(x, negative_slope=0.2)


class MovementConvEncoder(nn.Module):
    """Two stride-2 convs (k=4, pad 1) + linear head (modules.py:79-99).
    Dropout layers are inference no-ops and carry no parameters."""

    hidden_size: int
    output_size: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Conv(self.hidden_size, (4,), strides=(2,), padding=[(1, 1)], name="conv0")(x)
        x = _leaky(x)
        x = nn.Conv(self.output_size, (4,), strides=(2,), padding=[(1, 1)], name="conv1")(x)
        x = _leaky(x)
        return nn.Dense(self.output_size, name="out_net")(x)


class _BiGRUCoHead(nn.Module):
    hidden_size: int
    output_size: int

    @nn.compact
    def __call__(self, gru_last: jax.Array) -> jax.Array:
        x = nn.Dense(self.hidden_size, name="dense0")(gru_last)
        x = nn.LayerNorm(name="norm", epsilon=1e-5)(x)  # torch default
        x = _leaky(x)
        return nn.Dense(self.output_size, name="dense1")(x)


class TextEncoderBiGRUCo(nn.Module):
    """(word embeddings, POS one-hots, lengths) -> co-embedding
    (modules.py:311-349)."""

    word_size: int = 300
    pos_size: int = POS_DIM
    hidden_size: int = 512
    output_size: int = 512

    @nn.compact
    def __call__(self, word_embs, pos_onehot, cap_lens):
        pos = nn.Dense(self.word_size, name="pos_emb")(pos_onehot)
        inputs = nn.Dense(self.hidden_size, name="input_emb")(word_embs + pos)
        h_init = self.param(
            "hidden", nn.initializers.normal(1.0), (2, 1, self.hidden_size)
        )
        h0 = jnp.repeat(h_init, word_embs.shape[0], axis=1)
        _, (h_f, h_b) = MaskedBiGRU(self.hidden_size, name="gru")(inputs, cap_lens, h0)
        return _BiGRUCoHead(self.hidden_size, self.output_size, name="output_net")(
            jnp.concatenate([h_f, h_b], axis=-1)
        )


class MotionEncoderBiGRUCo(nn.Module):
    """(movement features, lengths) -> co-embedding (modules.py:353-387)."""

    input_size: int = 512
    hidden_size: int = 1024
    output_size: int = 512

    @nn.compact
    def __call__(self, inputs, m_lens):
        x = nn.Dense(self.hidden_size, name="input_emb")(inputs)
        h_init = self.param(
            "hidden", nn.initializers.normal(1.0), (2, 1, self.hidden_size)
        )
        h0 = jnp.repeat(h_init, inputs.shape[0], axis=1)
        _, (h_f, h_b) = MaskedBiGRU(self.hidden_size, name="gru")(x, m_lens, h0)
        return _BiGRUCoHead(self.hidden_size, self.output_size, name="output_net")(
            jnp.concatenate([h_f, h_b], axis=-1)
        )


# --- torch checkpoint conversion ---------------------------------------------


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def _dense(sd: Mapping, prefix: str) -> dict:
    return {"kernel": _t(sd[f"{prefix}.weight"]).T, "bias": _t(sd[f"{prefix}.bias"])}


def _gru(sd: Mapping, prefix: str) -> dict:
    out = {}
    for direction, suffix in (("fwd", ""), ("bwd", "_reverse")):
        out[direction] = {
            "ih": {
                "kernel": _t(sd[f"{prefix}.weight_ih_l0{suffix}"]).T,
                "bias": _t(sd[f"{prefix}.bias_ih_l0{suffix}"]),
            },
            "hh": {
                "kernel": _t(sd[f"{prefix}.weight_hh_l0{suffix}"]).T,
                "bias": _t(sd[f"{prefix}.bias_hh_l0{suffix}"]),
            },
        }
    return out


def _head(sd: Mapping, prefix: str) -> dict:
    return {
        "dense0": _dense(sd, f"{prefix}.0"),
        "norm": {
            "scale": _t(sd[f"{prefix}.1.weight"]),
            "bias": _t(sd[f"{prefix}.1.bias"]),
        },
        "dense1": _dense(sd, f"{prefix}.3"),
    }


def convert_movement_encoder(sd: Mapping) -> dict:
    def conv(prefix):
        return {
            # torch conv1d weight (out, in, k) -> flax (k, in, out)
            "kernel": _t(sd[f"{prefix}.weight"]).transpose(2, 1, 0),
            "bias": _t(sd[f"{prefix}.bias"]),
        }

    return {
        "conv0": conv("main.0"),
        "conv1": conv("main.3"),
        "out_net": _dense(sd, "out_net"),
    }


def convert_bigru_co(sd: Mapping, with_pos: bool) -> dict:
    params = {
        "input_emb": _dense(sd, "input_emb"),
        "gru": _gru(sd, "gru"),
        "hidden": _t(sd["hidden"]),
        "output_net": _head(sd, "output_net"),
    }
    if with_pos:
        params["pos_emb"] = _dense(sd, "pos_emb")
    return params


def convert_evaluator_ckpt(checkpoint: Mapping) -> dict:
    """`finest.tar` dict (movement_encoder/text_encoder/motion_encoder
    state dicts) -> params for the three Flax evaluators."""
    return {
        "movement": convert_movement_encoder(checkpoint["movement_encoder"]),
        "text": convert_bigru_co(checkpoint["text_encoder"], with_pos=True),
        "motion": convert_bigru_co(checkpoint["motion_encoder"], with_pos=False),
    }


# --- wrapper ------------------------------------------------------------------


class T2MEvaluator:
    """EvaluatorMDMWrapper analog (evaluator_wrapper.py:121-186).

    dataset: 'humanml' (dim_pose 263) or 'kit' (251). Embeddings come
    back in input order."""

    def __init__(self, params: dict, dataset: str = "humanml"):
        self.dim_pose = 263 if dataset == "humanml" else 251
        self.params = params
        self._movement = MovementConvEncoder(512, 512)
        self._text = TextEncoderBiGRUCo()
        self._motion = MotionEncoderBiGRUCo()

        @jax.jit
        def motion_fn(params, motions, m_lens):
            movements = self._movement.apply(
                {"params": params["movement"]}, motions[..., :-4]
            )
            return self._motion.apply(
                {"params": params["motion"]}, movements, m_lens // UNIT_LENGTH
            )

        @jax.jit
        def text_fn(params, word_embs, pos_ohot, cap_lens):
            return self._text.apply(
                {"params": params["text"]}, word_embs, pos_ohot, cap_lens
            )

        self._motion_fn = motion_fn
        self._text_fn = text_fn

    @staticmethod
    def init_params(rng, dataset: str = "humanml") -> dict:
        dim_pose = 263 if dataset == "humanml" else 251
        k1, k2, k3 = jax.random.split(rng, 3)
        movement = MovementConvEncoder(512, 512).init(
            k1, jnp.zeros((1, 8, dim_pose - 4))
        )["params"]
        text = TextEncoderBiGRUCo().init(
            k2, jnp.zeros((1, 4, 300)), jnp.zeros((1, 4, POS_DIM)), jnp.array([4])
        )["params"]
        motion = MotionEncoderBiGRUCo().init(
            k3, jnp.zeros((1, 2, 512)), jnp.array([2])
        )["params"]
        return {"movement": movement, "text": text, "motion": motion}

    def get_motion_embeddings(self, motions, m_lens) -> np.ndarray:
        out = self._motion_fn(
            self.params, jnp.asarray(motions, jnp.float32), jnp.asarray(m_lens)
        )
        return np.asarray(out)

    def get_co_embeddings(self, word_embs, pos_ohot, cap_lens, motions, m_lens):
        text = self._text_fn(
            self.params,
            jnp.asarray(word_embs, jnp.float32),
            jnp.asarray(pos_ohot, jnp.float32),
            jnp.asarray(cap_lens),
        )
        return np.asarray(text), self.get_motion_embeddings(motions, m_lens)


# --- metric harness (eval_humanml.py:19-138) ----------------------------------


def evaluate_matching_score(eval_wrapper: T2MEvaluator, motion_loaders: Dict[str, Iterable]):
    """Each loader yields dicts with word_embs/pos_ohot/cap_lens/motions/
    m_lens. Returns (matching score, R-precision, activations) per loader."""
    match_scores, r_precisions, activations = OrderedDict(), OrderedDict(), OrderedDict()
    for name, loader in motion_loaders.items():
        all_emb, match_sum, top_k_count, size = [], 0.0, np.zeros(3), 0
        for batch in loader:
            text_emb, motion_emb = eval_wrapper.get_co_embeddings(
                batch["word_embs"], batch["pos_ohot"], batch["cap_lens"],
                batch["motions"], batch["m_lens"],
            )
            dist = euclidean_distance_matrix(text_emb, motion_emb)
            match_sum += dist.trace()
            top_k_count = top_k_count + top_k_hits(np.argsort(dist, axis=1), 3).sum(axis=0)
            size += text_emb.shape[0]
            all_emb.append(motion_emb)
        match_scores[name] = match_sum / size
        r_precisions[name] = top_k_count / size
        activations[name] = np.concatenate(all_emb, axis=0)
    return match_scores, r_precisions, activations


def evaluate_fid(eval_wrapper: T2MEvaluator, gt_loader: Iterable, activations: Dict[str, np.ndarray]):
    gt_emb = np.concatenate(
        [
            eval_wrapper.get_motion_embeddings(b["motions"], b["m_lens"])
            for b in gt_loader
        ],
        axis=0,
    )
    out = OrderedDict()
    for name, emb in activations.items():
        # shared helper carries the reference's non-finite eps fallback
        # (`calculate_frechet_distance` retries with sigma + eps*I)
        out[name] = frechet_distance(gt_emb, emb)
    return out


def evaluate_diversity(activations: Dict[str, np.ndarray], diversity_times: int, seed: int = 0):
    out = OrderedDict()
    rng = np.random.default_rng(seed)
    for name, emb in activations.items():
        first = rng.choice(len(emb), diversity_times, replace=False)
        second = rng.choice(len(emb), diversity_times, replace=False)
        out[name] = float(np.linalg.norm(emb[first] - emb[second], axis=1).mean())
    return out


def evaluate_multimodality(eval_wrapper: T2MEvaluator, mm_loaders: Dict[str, Iterable],
                           mm_num_times: int, seed: int = 0):
    out = OrderedDict()
    rng = np.random.default_rng(seed)
    for name, loader in mm_loaders.items():
        embs = [
            eval_wrapper.get_motion_embeddings(b["motions"], b["m_lens"])[None]
            for b in loader
        ]
        if not embs:
            out[name] = 0.0
            continue
        emb = np.concatenate(embs, axis=0)  # (n_prompts, reps, D)
        first = rng.choice(emb.shape[1], mm_num_times, replace=False)
        second = rng.choice(emb.shape[1], mm_num_times, replace=False)
        out[name] = float(np.linalg.norm(emb[:, first] - emb[:, second], axis=2).mean())
    return out


def get_metric_statistics(values: np.ndarray, replication_times: int):
    mean = np.mean(values, axis=0)
    std = np.std(values, axis=0)
    return mean, 1.96 * std / np.sqrt(replication_times)


def evaluation(
    eval_wrapper: T2MEvaluator,
    gt_loader_fn: Callable[[], Iterable],
    eval_loader_fns: Dict[str, Callable[[], Iterable]],
    replication_times: int = 1,
    diversity_times: int = 300,
    mm_num_times: int = 10,
    mm_loader_fns: Dict[str, Callable[[], Iterable]] | None = None,
):
    """The reference's `evaluation` loop (eval_humanml.py:122-201) over
    loader factories; returns {metric: {model: (mean, 95% CI)}}."""
    all_metrics: Dict[str, Dict[str, list]] = {
        "Matching Score": {}, "R_precision": {}, "FID": {},
        "Diversity": {}, "MultiModality": {},
    }
    for rep in range(replication_times):
        loaders = {name: fn() for name, fn in eval_loader_fns.items()}
        loaders["ground truth"] = gt_loader_fn()
        match, rprec, acts = evaluate_matching_score(eval_wrapper, loaders)
        fids = evaluate_fid(eval_wrapper, gt_loader_fn(), acts)
        divs = evaluate_diversity(acts, diversity_times, seed=rep)
        mms = (
            evaluate_multimodality(
                eval_wrapper, {n: fn() for n, fn in mm_loader_fns.items()},
                mm_num_times, seed=rep)
            if mm_loader_fns
            else {}
        )
        for metric, values in (
            ("Matching Score", match), ("R_precision", rprec), ("FID", fids),
            ("Diversity", divs), ("MultiModality", mms),
        ):
            for name, v in values.items():
                all_metrics[metric].setdefault(name, []).append(v)
    return {
        metric: {
            name: get_metric_statistics(np.stack(vals), replication_times)
            for name, vals in models.items()
        }
        for metric, models in all_metrics.items()
    }
