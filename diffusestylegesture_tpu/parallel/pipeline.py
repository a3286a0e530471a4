"""Pipeline parallelism for the transformer trunk (GPipe schedule).

The reference has no model parallelism of any kind (`SURVEY §2.4`:
single-process, single-GPU; the denoiser trunk is
`nn.TransformerEncoder`, `main/model/mdm.py:77-86`). This module adds
layer-pipelining as a first-class mesh layout, the TPU-native way: the
trunk's L homogeneous layers are stacked into one `[L, ...]` parameter
pytree and sharded over a `pipe` mesh axis; inside `shard_map` each stage
runs its local `L/P` layers and hands activations to the next stage with
a single `lax.ppermute` hop over ICI per tick. Microbatches stream
through the classic GPipe schedule (M + P - 1 ticks, bubble fraction
(P-1)/(M+P-1)); XLA sees a static `lax.scan`, so the whole pipeline is
one compiled program — no host-side stage orchestration, no NCCL-style
send/recv code (the reference has none to port; its DDP scaffolding is
dead code).

Everything is differentiable (`ppermute`/`psum` have exact transposes),
so the same function serves forward inference and the training step;
equality with the sequential layer loop is pinned in
`tests/test_pipeline_parallel.py`. Composes with data parallelism: the
batch axis shards over `data` while layers shard over `pipe`.

At the flagship's 17 M-param scale pipelining is a capability
demonstration (DP is faster); it exists so the framework's parallelism
matrix (dp / tp / fsdp / seq / pipe) is complete for models that DO need
it — the schedule is model-size-agnostic.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.6 canonical location

    _SHARD_MAP_KW = {"check_vma": False}
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

    _SHARD_MAP_KW = {"check_rep": False}  # pre-0.6 spelling


def stack_layer_params(layers: Any, num_layers: int, prefix: str = "layers_") -> Any:
    """Stack per-layer param subtrees `layers_0..layers_{L-1}` → [L, ...] leaves.

    The named-layer layout is kept in checkpoints for torch parity
    (`models/transformer.py`); stacking happens at apply time so the same
    weights drive both the sequential loop and the pipeline.
    """
    subs = [layers[f"{prefix}{i}"] for i in range(num_layers)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *subs)


def unstack_layer_params(stacked: Any, num_layers: int, prefix: str = "layers_") -> Any:
    """Inverse of `stack_layer_params` (checkpoint round-trips in tests)."""
    return {
        f"{prefix}{i}": jax.tree.map(lambda x, i=i: x[i], stacked)
        for i in range(num_layers)
    }


def pipeline_apply(
    stacked_params: Any,
    x: jax.Array,
    layer_fn: Callable[[Any, jax.Array, Optional[jax.Array]], jax.Array],
    mesh: Mesh,
    axis: str = "pipe",
    num_microbatches: Optional[int] = None,
    batch_axis: Optional[str] = "auto",
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Run x through the stacked layer pytree, pipelined over `axis`.

    stacked_params: pytree with leading layer dim L (L % pipe_size == 0).
    x: (B, T, D); B must divide by data_shards * num_microbatches.
    layer_fn(layer_params, h, key) -> h applies ONE layer; `key` is a
    per-(layer, microbatch) dropout key derived from `rng`, or None when
    `rng` is None (deterministic).
    batch_axis: "auto" shards B over 'data' when the mesh has it (DP × PP
    composition — same convention as `seq_parallel`).
    """
    pipe = mesh.shape[axis]
    L = jax.tree.leaves(stacked_params)[0].shape[0]
    if L % pipe != 0:
        raise ValueError(f"{L} layers not divisible by pipe={pipe}")
    if batch_axis == "auto":
        batch_axis = "data" if "data" in mesh.axis_names else None
    data_shards = mesh.shape[batch_axis] if batch_axis else 1
    B, T, D = x.shape
    M = num_microbatches or pipe
    if B % (data_shards * M) != 0:
        raise ValueError(
            f"batch {B} not divisible by data={data_shards} × microbatches={M}")
    l_per = L // pipe
    perm = [(i, (i + 1) % pipe) for i in range(pipe)]
    # rng as raw key-data so shard_map sees a plain replicated array
    # (typed PRNG keys don't cross the shard_map boundary); legacy
    # uint32 PRNGKeys pass through as-is
    has_rng = rng is not None
    typed = has_rng and jnp.issubdtype(rng.dtype, jax.dtypes.prng_key)
    rng_data = (jax.random.key_data(rng) if typed
                else rng if has_rng else jnp.zeros((2,), jnp.uint32))
    # the re-wrap inside shard_fn must name the ORIGINAL impl: the train
    # step's dropout stream is an `rbg` key (4-word data, utils/rng.py)
    # and wrap_key_data's default impl is threefry (2-word) — shape error
    rng_impl = jax.random.key_impl(rng) if typed else None

    def shard_fn(stk, x_s, rng_d):
        stage = jax.lax.axis_index(axis)
        b_local = x_s.shape[0]
        mb = b_local // M
        x_mb = x_s.reshape(M, mb, T, D)

        def run_stage(h, m_idx):
            def body(hc, xs):
                lp, j = xs
                if not has_rng:
                    return layer_fn(lp, hc, None), None
                key = (jax.random.wrap_key_data(rng_d, impl=rng_impl)
                       if typed else rng_d)
                # unique stream per (global layer, microbatch)
                key = jax.random.fold_in(key, stage * l_per + j)
                key = jax.random.fold_in(key, m_idx)
                return layer_fn(lp, hc, key), None

            h, _ = jax.lax.scan(body, h, (stk, jnp.arange(l_per)))
            return h

        def tick(carry, t):
            cur, outbuf = carry
            # stage s works on microbatch (t - s); stage 0 feeds fresh input
            inp = jnp.where(stage == 0, x_mb[jnp.clip(t, 0, M - 1)], cur)
            y = run_stage(inp, jnp.clip(t - stage, 0, M - 1))
            recv = jax.lax.ppermute(y, axis, perm)
            oidx = jnp.clip(t - (pipe - 1), 0, M - 1)
            write = jnp.logical_and(stage == pipe - 1, t >= pipe - 1)
            prev = jax.lax.dynamic_index_in_dim(outbuf, oidx, keepdims=False)
            outbuf = jax.lax.dynamic_update_index_in_dim(
                outbuf, jnp.where(write, y, prev), oidx, axis=0)
            return (recv, outbuf), None

        init = (jnp.zeros_like(x_mb[0]), jnp.zeros_like(x_mb))
        (_, outbuf), _ = jax.lax.scan(tick, init, jnp.arange(M + pipe - 1))
        # result lives on the last stage; replicate it across the pipe
        # axis (psum of a one-hot-masked buffer — one collective at the
        # end, transposable for the backward pass)
        out = jax.lax.psum(
            jnp.where(stage == pipe - 1, outbuf, jnp.zeros_like(outbuf)), axis)
        return out.reshape(b_local, T, D)

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis), P(batch_axis), P()),
        out_specs=P(batch_axis),
        **_SHARD_MAP_KW,
    )
    return fn(stacked_params, x, rng_data)
