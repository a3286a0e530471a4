"""Sequence-parallel windowed local attention (context parallelism).

The reference bounds attention cost algorithmically (window 11/15 local
attention) but has no distributed sequence sharding (`SURVEY §2.4`). The
local-attention dependency structure — each window attends only to
itself and the previous window — makes sequence sharding over chips
essentially free: shard the time axis over a mesh axis, `ppermute` a
one-window halo from the left neighbor over ICI, and run the normal
kernel per shard. This is NEW capability beyond reference parity: it
scales window counts (very long clips / big training windows) across
chips with one neighbor exchange per layer.

Constraints: T % (n_shards · window) == 0 (every shard holds whole
windows), matching the reference's own seqlen-divisibility requirement.
Rows whose every key is masked (a fully-False window in `mask_local`)
are undefined here: the all-NEG_INF softmax degrades to uniform weights
over whatever values are resident, which on shard 0 includes the
wrap-around halo — numerically diverging from the XLA/Pallas kernels'
equally-arbitrary constant-pad convention. Every shipped cond builder
passes all-True masks; if real padding masks are introduced, zero those
rows (or their gradient) explicitly before relying on cross-impl
equality.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map  # jax >= 0.6 canonical location

    _SHARD_MAP_KW = {"check_vma": False}
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

    _SHARD_MAP_KW = {"check_rep": False}  # pre-0.6 spelling

from ..models.local_attention import NEG_INF


def _local_attn_shard(q, k, v, mask, k_halo, v_halo, m_halo, pos0, window):
    """Per-shard windowed attention with an explicit left halo window.

    q/k/v: (BH, Ts, D) local shard; *_halo: (BH, window, D) from the left
    neighbor (invalid on shard 0 — masked via m_halo); pos0: global
    position of this shard's first frame.
    """
    bh, ts, d = q.shape
    w = window
    W = ts // w
    scale = d**-0.5

    bq = q.reshape(bh, W, w, d)
    kw = k.reshape(bh, W, w, d)
    vw = v.reshape(bh, W, w, d)

    prev_k = jnp.concatenate([k_halo[:, None], kw[:, :-1]], axis=1)
    prev_v = jnp.concatenate([v_halo[:, None], vw[:, :-1]], axis=1)
    bk = jnp.concatenate([prev_k, kw], axis=2)  # (BH, W, 2w, D)
    bv = jnp.concatenate([prev_v, vw], axis=2)

    # global positions
    pos = pos0 + jnp.arange(ts, dtype=jnp.int32).reshape(1, W, w)
    bq_t = pos[..., :, None]
    kpos_own = pos
    kpos_prev = jnp.concatenate(
        [pos[:, :1] - w, pos[:, :-1]], axis=1
    )  # halo window positions (negative for shard 0's halo)
    bq_k = jnp.concatenate([kpos_prev, kpos_own], axis=2)[..., None, :]

    sim = jnp.einsum("bwie,bwje->bwij", bq, bk, preferred_element_type=jnp.float32) * scale
    sim = jnp.where(bq_t < bq_k, NEG_INF, sim)

    mw = mask.reshape(bh, W, w)
    m_prev = jnp.concatenate([m_halo[:, None], mw[:, :-1]], axis=1)
    key_mask = jnp.concatenate([m_prev, mw], axis=2)[:, :, None, :] > 0.5
    sim = jnp.where(key_mask, sim, NEG_INF)

    attn = jax.nn.softmax(sim, axis=-1)
    out = jnp.einsum("bwij,bwje->bwie", attn, bv, preferred_element_type=jnp.float32)
    return out.reshape(bh, ts, d).astype(q.dtype)


def sequence_parallel_local_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    window_size: int,
    mesh: Mesh,
    axis: str = "seq",
    mask: Optional[jax.Array] = None,
    heads: int = 1,
    batch_axis: Optional[str] = "auto",
) -> jax.Array:
    """Local attention with the TIME axis sharded over `axis`.

    Same semantics as `models.local_attention.local_attention` (with a
    user mask; window-0 pads masked). q/v/v: (B·H, N, D).

    `batch_axis`: mesh axis the packed B·H axis is sharded over (data
    parallelism composed with sequence parallelism). "auto" uses "data"
    when the mesh has that axis — without it, a (data × seq) mesh would
    silently all-gather the batch into every data group and recompute
    redundantly (the DP-lost failure mode); None forces replication for
    seq-only meshes.
    """
    bh, n, d = q.shape
    if batch_axis == "auto":
        batch_axis = "data" if "data" in mesh.axis_names else None
    if batch_axis is not None and bh % mesh.shape[batch_axis] != 0:
        raise ValueError(
            f"packed batch·heads {bh} not divisible by "
            f"{batch_axis}={mesh.shape[batch_axis]}")
    n_shards = mesh.shape[axis]
    assert n % (n_shards * window_size) == 0, (
        f"T={n} must divide into {n_shards} shards of whole windows"
    )
    if mask is None:
        mask_full = jnp.ones((bh, n), jnp.float32)
    else:
        b = mask.shape[0]
        mask_full = jnp.broadcast_to(
            mask.astype(jnp.float32)[:, None, :], (b, heads, n)
        ).reshape(bh, n)

    w = window_size

    def shard_fn(q_s, k_s, v_s, m_s):
        idx = jax.lax.axis_index(axis)
        ts = q_s.shape[1]
        pos0 = idx * ts
        # halo: last window of the LEFT neighbor (ppermute right-shift)
        perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
        k_halo = jax.lax.ppermute(k_s[:, -w:], axis, perm)
        v_halo = jax.lax.ppermute(v_s[:, -w:], axis, perm)
        m_halo = jax.lax.ppermute(m_s[:, -w:], axis, perm)
        # shard 0's halo is the (invalid) wrap-around — mask it out
        m_halo = jnp.where(idx == 0, jnp.zeros_like(m_halo), m_halo)
        return _local_attn_shard(q_s, k_s, v_s, m_s, k_halo, v_halo, m_halo, pos0, w)

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            P(batch_axis, axis, None), P(batch_axis, axis, None),
            P(batch_axis, axis, None), P(batch_axis, axis),
        ),
        out_specs=P(batch_axis, axis, None),
        **_SHARD_MAP_KW,
    )
    return fn(q, k, v, mask_full)
