"""Causal sliding-window (local) attention.

Behavioral parity with the vendored lucidrains `LocalAttention`
(`main/model/local_attention/local_attention.py:52-199`) under the
configuration the denoisers use: ``causal=True, look_backward=1,
look_forward=0, exact_windowsize=False``, sequence length divisible by
the window size (88 = 8·11 ZEGGS, 150 = 10·15 BEAT/TWH).

Semantics reproduced exactly:
  * fold the sequence into W windows of w tokens; each query window
    attends to its own + the previous window's keys (`look_around`,
    ref `:43-48,126-143`);
  * window 0's "previous" keys are *pad values of -1.0* (the reference
    pads the key/value tensors themselves with ``pad_value=-1``), with
    pad positions tagged position ``-1`` so the causal test
    ``q_pos < k_pos`` never masks them — they are only removed by the
    user mask (padded with False, ref `:169-183`). The live paths always
    pass ``mask_local`` so pads never leak; we keep the same contract.
  * scale = head_dim ** -0.5, additive −maxfloat masking, f32 softmax.

This is the XLA version: the fold/gather pattern lowers to cheap
reshapes + one concat, and the (w × 2w) score blocks are MXU-friendly.
A fused Pallas kernel with identical semantics lives in
`ops/local_attention_pallas.py`; `local_attention(..., impl=)` selects.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = float(jnp.finfo(jnp.float32).max) * -1.0


def _look_around_tokens(x: jax.Array, pad_value: float) -> jax.Array:
    """(B, W, w, ...) → (B, W, 2w, ...): prev window tokens ++ own tokens."""
    prev = jnp.pad(
        x[:, :-1],
        ((0, 0), (1, 0)) + ((0, 0),) * (x.ndim - 2),
        constant_values=pad_value,
    )
    return jnp.concatenate([prev, x], axis=2)


def local_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    window_size: int,
    mask: Optional[jax.Array] = None,
    *,
    heads: int = 1,
    impl: str = "xla",
    exact_windowsize: bool = False,
    seq_mesh=None,
    seq_axis: str = "seq",
) -> jax.Array:
    """Windowed causal attention.

    Args:
      q, k, v: (B·H, N, D) packed batch-of-heads layout (the reference's
        calling convention from MDM, `main/model/mdm.py:210-214`).
      window_size: tokens per window; N % window_size == 0.
      mask: optional (B, N) boolean key-validity mask (True = attend).
      heads: H, needed to expand `mask` over the packed head axis.
      impl: "xla" | "pallas" | "seq_parallel" (time axis sharded over
        `seq_axis` of `seq_mesh`, one halo ppermute per call — see
        `parallel/seq_parallel.py`; requires a mask, as the live paths
        always pass one).
      exact_windowsize: additionally mask keys further back than
        window_size·look_backward from the query (ref `:154-157`;
        used by the LocalTransformer wrapper, not the denoisers).
    """
    if impl == "pallas":
        assert not exact_windowsize, "pallas path implements the denoiser config"
        from ..ops.local_attention_pallas import local_attention_pallas

        return local_attention_pallas(q, k, v, window_size, mask, heads=heads)
    if impl == "seq_parallel":
        assert not exact_windowsize, "seq_parallel implements the denoiser config"
        assert seq_mesh is not None, "impl='seq_parallel' requires seq_mesh"
        assert mask is not None, (
            "seq_parallel needs the key mask (window-0 halo removal)")
        from ..parallel.seq_parallel import sequence_parallel_local_attention

        return sequence_parallel_local_attention(
            q, k, v, window_size, seq_mesh, seq_axis, mask, heads=heads)

    bh, n, d = q.shape
    w = window_size
    assert n % w == 0, f"sequence length {n} not divisible by window {w}"
    W = n // w
    scale = d**-0.5

    bq = q.reshape(bh, W, w, d)
    bk = _look_around_tokens(k.reshape(bh, W, w, d), -1.0)
    bv = _look_around_tokens(v.reshape(bh, W, w, d), -1.0)

    # global positions; pads → -1 (ref `:123-141`)
    pos = jnp.arange(n, dtype=jnp.int32).reshape(1, W, w)
    bq_t = pos[..., :, None]  # (1, W, w, 1)
    bq_k = _look_around_tokens(pos.astype(jnp.float32), -1.0).astype(jnp.int32)
    bq_k = bq_k[..., None, :]  # (1, W, 1, 2w)

    sim = jnp.einsum("bwie,bwje->bwij", bq, bk, preferred_element_type=jnp.float32) * scale

    causal_mask = bq_t < bq_k
    if exact_windowsize:
        causal_mask = causal_mask | (bq_t > (bq_k + window_size))
    sim = jnp.where(causal_mask, NEG_INF, sim)

    if mask is not None:
        b = mask.shape[0]
        mw = mask.reshape(b, W, w)
        mw = _look_around_tokens(mw.astype(jnp.float32), 0.0) > 0.5  # pad False
        mw = mw[:, None, :, None, :]  # (b, 1, W, 1, 2w)
        mw = jnp.broadcast_to(mw, (b, heads, W, 1, 2 * w)).reshape(bh, W, 1, 2 * w)
        sim = jnp.where(mw, sim, NEG_INF)

    attn = jax.nn.softmax(sim, axis=-1)
    out = jnp.einsum("bwij,bwje->bwie", attn, bv, preferred_element_type=jnp.float32)
    return out.reshape(bh, n, d).astype(q.dtype)
