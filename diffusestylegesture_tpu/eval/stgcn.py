"""Action-to-motion (a2m) evaluation: ST-GCN action recognizer + metrics.

Ports the reference's MDM-legacy a2m eval suite:

  * `Graph` — skeleton adjacency with uniform/distance/spatial partition
    strategies (`main/eval/a2m/recognition/models/stgcnutils/graph.py`).
    The smpl/smpl_noglobal layouts take the parent table directly
    (constant below) instead of reading the SMPL kintree pickle.
  * `STGCN` — the 10-block spatial-temporal graph convnet
    (`.../models/stgcn.py:11-131`) in Flax (NHWC: (N, T, V, C)), with
    learnable edge-importance masks and a converter for the released
    `uestc_rot6d_stgcn.tar` torch checkpoint.
  * `calculate_accuracy` (`eval/a2m/stgcn/accuracy.py`),
    `calculate_diversity_multimodality` (`stgcn/diversity.py` — same
    MT19937 draw sequence, so seeded runs reproduce the reference
    exactly), FID via `eval.metrics`, and an `Evaluation` wrapper
    mirroring `stgcn/evaluate.py:10-108`.
"""
from __future__ import annotations

from typing import Dict, Iterable, Mapping, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .metrics import frechet_distance

# SMPL kinematic-tree parents (kintree_table row 0) — the constant the
# reference deserializes from `smpl_kintree_path` (graph.py:56-71).
SMPL_PARENTS = [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9,
                12, 13, 14, 16, 17, 18, 19, 20, 21]


def get_hop_distance(num_node: int, edge, max_hop: int = 1) -> np.ndarray:
    a = np.zeros((num_node, num_node))
    for i, j in edge:
        a[j, i] = 1
        a[i, j] = 1
    hop_dis = np.full((num_node, num_node), np.inf)
    transfer = np.stack([np.linalg.matrix_power(a, d) for d in range(max_hop + 1)]) > 0
    for d in range(max_hop, -1, -1):
        hop_dis[transfer[d]] = d
    return hop_dis


def normalize_digraph(a: np.ndarray) -> np.ndarray:
    degree = a.sum(axis=0)
    dn = np.where(degree > 0, 1.0 / np.where(degree > 0, degree, 1.0), 0.0)
    return a @ np.diag(dn)


def normalize_undigraph(a: np.ndarray) -> np.ndarray:
    degree = a.sum(axis=0)
    dn = np.where(degree > 0, degree ** -0.5, 0.0)
    return np.diag(dn) @ a @ np.diag(dn)


class Graph:
    """Skeleton graph + partitioned adjacency stack A (K, V, V)."""

    def __init__(self, layout: str = "openpose", strategy: str = "uniform",
                 max_hop: int = 1, dilation: int = 1,
                 parents: Sequence[int] | None = None):
        self.max_hop = max_hop
        self.dilation = dilation
        self._get_edge(layout, parents)
        self.hop_dis = get_hop_distance(self.num_node, self.edge, max_hop)
        self._get_adjacency(strategy)

    def _get_edge(self, layout: str, parents) -> None:
        if layout == "openpose":
            self.num_node = 18
            neighbor = [(4, 3), (3, 2), (7, 6), (6, 5), (13, 12), (12, 11),
                        (10, 9), (9, 8), (11, 5), (8, 2), (5, 1), (2, 1),
                        (0, 1), (15, 0), (14, 0), (17, 15), (16, 14)]
            self.center = 1
        elif layout == "openpose15":
            # the unconstrained-eval graph redefines 'openpose' as this
            # 15-joint MoDi skeleton (eval/unconstrained/models/
            # stgcnutils/graph.py:47-60)
            self.num_node = 15
            neighbor = [(4, 3), (3, 2), (2, 1), (7, 6), (6, 5), (5, 1),
                        (1, 0), (14, 13), (13, 12), (12, 8), (11, 10),
                        (10, 9), (9, 8), (8, 1)]
            self.center = 1
        elif layout in ("smpl", "smpl_noglobal"):
            par = list(parents) if parents is not None else SMPL_PARENTS
            neighbor = [(par[j], j) for j in range(1, len(par))]
            if layout == "smpl_noglobal":
                neighbor = [(i - 1, j - 1) for i, j in neighbor if i != 0 and j != 0]
                self.num_node = len(par) - 1
            else:
                self.num_node = len(par)
            self.center = 0
        elif layout == "ntu-rgb+d":
            self.num_node = 25
            base = [(1, 2), (2, 21), (3, 21), (4, 3), (5, 21), (6, 5), (7, 6),
                    (8, 7), (9, 21), (10, 9), (11, 10), (12, 11), (13, 1),
                    (14, 13), (15, 14), (16, 15), (17, 1), (18, 17), (19, 18),
                    (20, 19), (22, 23), (23, 8), (24, 25), (25, 12)]
            neighbor = [(i - 1, j - 1) for i, j in base]
            self.center = 20
        else:
            raise NotImplementedError(f"layout {layout!r} not supported")
        self.edge = [(i, i) for i in range(self.num_node)] + neighbor

    def _get_adjacency(self, strategy: str) -> None:
        valid_hop = range(0, self.max_hop + 1, self.dilation)
        adjacency = np.zeros((self.num_node, self.num_node))
        for hop in valid_hop:
            adjacency[self.hop_dis == hop] = 1
        norm = normalize_digraph(adjacency)

        if strategy == "uniform":
            self.A = norm[None]
        elif strategy == "distance":
            a = np.zeros((len(valid_hop), self.num_node, self.num_node))
            for i, hop in enumerate(valid_hop):
                a[i][self.hop_dis == hop] = norm[self.hop_dis == hop]
            self.A = a
        elif strategy == "spatial":
            parts = []
            dc = self.hop_dis[:, self.center]
            for hop in valid_hop:
                on_hop = self.hop_dis == hop
                root = on_hop & (dc[:, None] == dc[None, :])
                close = on_hop & (dc[:, None] > dc[None, :])
                further = on_hop & (dc[:, None] < dc[None, :])
                if hop == 0:
                    parts.append(np.where(root, norm, 0.0))
                else:
                    parts.append(np.where(root | close, norm, 0.0))
                    parts.append(np.where(further, norm, 0.0))
            self.A = np.stack(parts)
        else:
            raise NotImplementedError(f"strategy {strategy!r} not supported")


# --- Flax network --------------------------------------------------------------


class _GraphConv(nn.Module):
    """ConvTemporalGraphical (tgcn.py:7-63): 1×1 conv to K·C then einsum
    with the K partitioned adjacencies."""

    out_channels: int
    spatial_kernel: int

    @nn.compact
    def __call__(self, x: jax.Array, a: jax.Array) -> jax.Array:
        # x: (N, T, V, C); a: (K, V, V)
        x = nn.Conv(self.out_channels * self.spatial_kernel, (1, 1), name="conv")(x)
        n, t, v, _ = x.shape
        x = x.reshape(n, t, v, self.spatial_kernel, self.out_channels)
        return jnp.einsum("ntvkc,kvw->ntwc", x, a)


class _BN(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(use_running_average=True, momentum=0.9,
                            epsilon=1e-5, name="bn")(x)


class _STGCNBlock(nn.Module):
    """st_gcn (stgcn.py:133-207): graph conv → BN/ReLU/temporal-conv/BN
    (+ residual) → ReLU. Dropout is an inference no-op."""

    in_channels: int
    out_channels: int
    temporal_kernel: int
    spatial_kernel: int
    stride: int = 1
    residual: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, a: jax.Array) -> jax.Array:
        pad = (self.temporal_kernel - 1) // 2
        if not self.residual:
            res = 0.0
        elif self.in_channels == self.out_channels and self.stride == 1:
            res = x
        else:
            res = nn.Conv(self.out_channels, (1, 1), strides=(self.stride, 1),
                          name="res_conv")(x)
            res = nn.BatchNorm(use_running_average=True, name="res_bn")(res)
        x = _GraphConv(self.out_channels, self.spatial_kernel, name="gcn")(x, a)
        x = nn.BatchNorm(use_running_average=True, name="tcn_bn0")(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (self.temporal_kernel, 1),
                    strides=(self.stride, 1), padding=[(pad, pad), (0, 0)],
                    name="tcn_conv")(x)
        x = nn.BatchNorm(use_running_average=True, name="tcn_bn1")(x)
        return nn.relu(x + res)


_CHANNELS = ((64, 1, False), (64, 1, True), (64, 1, True), (64, 1, True),
             (128, 2, True), (128, 1, True), (128, 1, True),
             (256, 2, True), (256, 1, True), (256, 1, True))

# the unconstrained-eval variant drops 3 blocks
# (main/eval/unconstrained/models/stgcn.py:52-63)
UNCONSTRAINED_CHANNELS = ((64, 1, False), (64, 1, True), (64, 1, True),
                          (128, 2, True), (128, 1, True), (256, 2, True))


class STGCN(nn.Module):
    """stgcn.py:11-131. Input motion (N, V, C, T); returns (features
    (N, 256), logits (N, num_class))."""

    in_channels: int
    num_class: int
    graph: Graph
    edge_importance_weighting: bool = True
    channels: tuple = _CHANNELS

    @nn.compact
    def __call__(self, motion: jax.Array):
        a = jnp.asarray(self.graph.A, jnp.float32)
        k, v, _ = a.shape
        # (N, V, C, T) -> (N, T, V, C)
        x = jnp.transpose(motion, (0, 3, 1, 2))
        n, t, _, c = x.shape

        # data_bn: BatchNorm1d over V*C flattened channels (stgcn.py:87-92)
        x = x.reshape(n, t, v * c)
        x = nn.BatchNorm(use_running_average=True, name="data_bn")(x)
        x = x.reshape(n, t, v, c)

        prev = self.in_channels
        for i, (out, stride, residual) in enumerate(self.channels):
            if self.edge_importance_weighting:
                imp = self.param(f"edge_importance_{i}",
                                 nn.initializers.ones, (k, v, v))
            else:
                imp = 1.0
            x = _STGCNBlock(prev, out, 9, k, stride, residual,
                            name=f"block{i}")(x, a * imp)
            prev = out

        features = x.mean(axis=(1, 2))  # global avg pool over (T, V)
        logits = nn.Dense(self.num_class, name="fcn")(features)
        return features, logits


# --- torch checkpoint conversion ------------------------------------------------


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def _conv(sd: Mapping, prefix: str) -> dict:
    return {"kernel": _t(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0),
            "bias": _t(sd[f"{prefix}.bias"])}


def _bn(sd: Mapping, prefix: str):
    params = {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}
    stats = {"mean": _t(sd[f"{prefix}.running_mean"]),
             "var": _t(sd[f"{prefix}.running_var"])}
    return params, stats


def convert_stgcn_ckpt(sd: Mapping, channels: tuple = _CHANNELS) -> dict:
    """torch `STGCN.state_dict()` -> {'params': ..., 'batch_stats': ...}."""
    params: dict = {}
    stats: dict = {}
    p, s = _bn(sd, "data_bn")
    params["data_bn"] = p
    stats["data_bn"] = s
    for i in range(len(channels)):
        bp: dict = {}
        bs: dict = {}
        bp["gcn"] = {"conv": _conv(sd, f"st_gcn_networks.{i}.gcn.conv")}
        p, s = _bn(sd, f"st_gcn_networks.{i}.tcn.0")
        bp["tcn_bn0"], bs["tcn_bn0"] = p, s
        bp["tcn_conv"] = _conv(sd, f"st_gcn_networks.{i}.tcn.2")
        p, s = _bn(sd, f"st_gcn_networks.{i}.tcn.3")
        bp["tcn_bn1"], bs["tcn_bn1"] = p, s
        if f"st_gcn_networks.{i}.residual.0.weight" in sd:
            bp["res_conv"] = _conv(sd, f"st_gcn_networks.{i}.residual.0")
            p, s = _bn(sd, f"st_gcn_networks.{i}.residual.1")
            bp["res_bn"], bs["res_bn"] = p, s
        params[f"block{i}"] = bp
        stats[f"block{i}"] = bs
        if f"edge_importance.{i}" in sd:
            params[f"edge_importance_{i}"] = _t(sd[f"edge_importance.{i}"])
    # torch fcn is a 1x1 Conv2d applied post-pool == a Dense layer
    params["fcn"] = {"kernel": _t(sd["fcn.weight"])[:, :, 0, 0].T,
                     "bias": _t(sd["fcn.bias"])}
    return {"params": params, "batch_stats": stats}


# --- metrics (stgcn/{accuracy,diversity}.py) ------------------------------------


def calculate_accuracy(yhat: np.ndarray, y: np.ndarray, num_labels: int):
    """Logits (N, L) + labels (N,) -> (accuracy, confusion matrix)."""
    confusion = np.zeros((num_labels, num_labels), dtype=np.int64)
    pred = np.argmax(yhat, axis=1)
    np.add.at(confusion, (np.asarray(y), pred), 1)
    return float(np.trace(confusion) / confusion.sum()), confusion


def calculate_diversity_multimodality(activations: np.ndarray,
                                      labels: np.ndarray, num_labels: int,
                                      seed: int | None = None,
                                      unconstrained: bool = False):
    """Same estimator AND same MT19937 draw sequence as the reference
    (stgcn/diversity.py:6-53), so seeded values reproduce it exactly."""
    diversity_times = 200
    multimodality_times = 20
    num_motions = activations.shape[0]
    rng = np.random.RandomState(seed) if seed is not None else np.random

    first = rng.randint(0, num_motions, diversity_times)
    second = rng.randint(0, num_motions, diversity_times)
    diversity = float(np.mean(
        np.linalg.norm(activations[first] - activations[second], axis=1)))

    if unconstrained:
        return diversity, float("nan")

    labels = np.asarray(labels)
    multimodality = 0.0
    quotas = np.zeros(num_labels)
    quotas[np.unique(labels)] = multimodality_times
    while np.any(quotas > 0):
        first_idx = rng.randint(0, num_motions)
        first_label = labels[first_idx]
        if not quotas[first_label]:
            continue
        second_idx = rng.randint(0, num_motions)
        while first_label != labels[second_idx]:
            second_idx = rng.randint(0, num_motions)
        quotas[first_label] -= 1
        multimodality += np.linalg.norm(
            activations[first_idx] - activations[second_idx])
    multimodality /= multimodality_times * num_labels
    return diversity, float(multimodality)


# --- evaluation wrapper (stgcn/evaluate.py) -------------------------------------


class A2MEvaluation:
    """Drives a converted/initialized STGCN over motion loaders and
    computes accuracy / FID / diversity / multimodality.

    Loaders yield dicts with 'output' (N, V, C, T) motions and 'y' labels."""

    def __init__(self, variables: dict, in_channels: int, num_classes: int,
                 layout: str = "smpl", seed: int | None = None):
        self.graph = Graph(layout=layout, strategy="spatial")
        self.model = STGCN(in_channels, num_classes, self.graph)
        self.variables = variables
        self.num_classes = num_classes
        self.seed = seed
        self._apply = jax.jit(
            lambda vars_, m: self.model.apply(vars_, m))

    @staticmethod
    def init_variables(rng, in_channels: int, num_classes: int,
                       layout: str = "smpl"):
        # node count always comes from the graph layout — any other value
        # would crash STGCN's data_bn reshape
        graph = Graph(layout=layout, strategy="spatial")
        model = STGCN(in_channels, num_classes, graph)
        return model.init(rng, jnp.zeros((1, graph.num_node, in_channels, 8)))

    def compute_features(self, loader: Iterable[dict]):
        feats, logits, labels = [], [], []
        for batch in loader:
            f, yh = self._apply(self.variables, jnp.asarray(batch["output"], jnp.float32))
            feats.append(np.asarray(f))
            logits.append(np.asarray(yh))
            if "y" in batch:
                labels.append(np.asarray(batch["y"]))
        return (np.concatenate(feats), np.concatenate(logits),
                np.concatenate(labels) if labels else None)

    def evaluate(self, loaders: Dict[str, Iterable[dict]]) -> dict:
        computed = {name: self.compute_features(loader)
                    for name, loader in loaders.items()}
        gt_feats = computed["gt"][0]
        metrics: dict = {}
        for name, (feats, logits, labels) in computed.items():
            if labels is not None:
                acc, _ = calculate_accuracy(logits, labels, self.num_classes)
                metrics[f"{name}_accuracy"] = acc
            metrics[f"{name}_fid"] = frechet_distance(gt_feats, feats)
            div, mm = calculate_diversity_multimodality(
                feats, labels, self.num_classes, seed=self.seed,
                unconstrained=labels is None)
            metrics[f"{name}_diversity"] = div
            metrics[f"{name}_multimodality"] = mm
        return metrics
