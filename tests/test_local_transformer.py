"""LocalTransformer wrapper (SURVEY §2.1 #12) parity vs the vendored
lucidrains `main/model/local_attention/transformer.py`.

The vendored wrapper is broken as shipped — `LocalMHA.forward` omits the
`packed_shape` positional argument its own `LocalAttention.forward`
requires — so the reference tests pin that breakage and parity runs
against a minimally repaired reference (head-axis packing restored, the
upstream call convention).
"""
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import requires_reference

from diffusestylegesture_tpu.models import convert
from diffusestylegesture_tpu.models.local_transformer import (
    LocalTransformer, cross_entropy_ignore, generate, top_k_filter)

VOCAB, MAX_LEN, DIM, DEPTH, WINDOW = 37, 44, 32, 2, 11
HEADS, DIM_HEAD = 4, 8


def _build_ref():
    import torch

    sys.path.insert(0, "/root/reference/main/model")
    from local_attention.transformer import LocalTransformer as RefLT  # type: ignore

    torch.manual_seed(11)
    ref = RefLT(num_tokens=VOCAB, max_seq_len=MAX_LEN, dim=DIM, depth=DEPTH,
                causal=True, local_attn_window_size=WINDOW,
                dim_head=DIM_HEAD, heads=HEADS)
    ref.eval()
    return ref


def _repair(ref):
    """Restore the upstream call convention: pack heads into the batch and
    pass `packed_shape` so the vendored LocalAttention can unpack."""
    import torch
    from einops import pack, rearrange, unpack

    for attn, _ in ref.layers:
        inner = attn.attn_fn

        def fixed(q, k, v, mask=None, _inner=inner):
            (q, ps), (k, _), (v, _) = map(lambda t: pack([t], "* n d"), (q, k, v))
            return _inner(q, k, v, ps, mask=mask)

        # instance __dict__ shadows nn.Module child lookup; plain setattr
        # refuses to replace a registered child module with a function
        object.__setattr__(attn, "attn_fn", fixed)
    return ref


def _ours():
    return LocalTransformer(num_tokens=VOCAB, max_seq_len=MAX_LEN, dim=DIM,
                            depth=DEPTH, causal=True,
                            local_attn_window_size=WINDOW,
                            dim_head=DIM_HEAD, heads=HEADS)


@requires_reference
class TestRefParity:
    def test_vendored_wrapper_is_broken(self):
        import torch

        ref = _build_ref()
        tokens = torch.zeros((1, 22), dtype=torch.long)
        with pytest.raises(TypeError):
            ref(tokens)

    def test_logits_parity(self):
        import torch

        ref = _repair(_build_ref())
        params = {"params": convert.convert_local_transformer(ref.state_dict(), DEPTH)}
        rng = np.random.default_rng(0)
        # divisible length (the vendored attention autopads only upstream)
        tokens = rng.integers(0, VOCAB, (2, 33))
        with torch.no_grad():
            theirs = ref(torch.as_tensor(tokens)).numpy()
        ours = np.asarray(_ours().apply(params, jnp.asarray(tokens)))
        np.testing.assert_allclose(ours, theirs, atol=2e-5)

    def test_loss_parity_with_ignore_index(self):
        import torch

        ref = _repair(_build_ref())
        params = {"params": convert.convert_local_transformer(ref.state_dict(), DEPTH)}
        rng = np.random.default_rng(1)
        tokens = rng.integers(0, VOCAB, (2, 34))
        # only the final position lands exclusively in the shifted labels,
        # so it is the one spot ignore_index can occupy without the
        # reference embedding a -1 token
        tokens[0, -1] = -1
        with torch.no_grad():
            theirs = ref(torch.as_tensor(tokens), return_loss=True).item()
        ours = float(_ours().apply(params, jnp.asarray(tokens), return_loss=True))
        assert abs(ours - theirs) < 2e-5

    def test_cross_entropy_ignore_matches_torch(self):
        import torch

        rng = np.random.default_rng(4)
        logits = rng.standard_normal((3, 9, VOCAB)).astype(np.float32)
        labels = rng.integers(0, VOCAB, (3, 9))
        labels[0, :4] = -1
        labels[2, -1] = -1
        theirs = torch.nn.functional.cross_entropy(
            torch.as_tensor(logits).permute(0, 2, 1), torch.as_tensor(labels),
            ignore_index=-1).item()
        ours = float(cross_entropy_ignore(
            jnp.asarray(logits), jnp.asarray(labels), -1))
        assert abs(ours - theirs) < 2e-6


class TestStandalone:
    def test_autopad_matches_masked_divisible(self):
        """A non-divisible length must equal the divisible computation on
        the same prefix (autopad repairs the vendored dead branch)."""
        model = _ours()
        rng = np.random.default_rng(2)
        tokens = jnp.asarray(rng.integers(0, VOCAB, (2, 33)))
        params = model.init(jax.random.key(0), tokens)
        full = model.apply(params, tokens)
        # causal → logits for the first 26 positions are unaffected by the tail
        short = model.apply(params, tokens[:, :26])  # 26 % 11 != 0
        np.testing.assert_allclose(np.asarray(short), np.asarray(full[:, :26]),
                                   atol=2e-5)

    def test_top_k_filter(self):
        logits = jnp.asarray(np.arange(20, dtype=np.float32)[None])
        out = np.asarray(top_k_filter(logits, thres=0.9))
        # reference float math: int((1 - 0.9) * 20) == 1, not 2
        k = int((1 - 0.9) * logits.shape[-1])
        assert np.isfinite(out).sum() == k
        assert np.isfinite(out[0, -k:]).all()

    def test_cross_entropy_all_ignored_is_finite(self):
        logits = jnp.zeros((1, 3, 5))
        labels = jnp.full((1, 3), -1)
        assert float(cross_entropy_ignore(logits, labels)) == 0.0

    def test_generate_shapes_and_range(self):
        model = _ours()
        rng = np.random.default_rng(3)
        prime = jnp.asarray(rng.integers(0, VOCAB, (2, 7)))
        params = model.init(jax.random.key(1), prime)
        out = generate(model, params, prime, seq_len=9, key=jax.random.key(2),
                       temperature=0.8)
        assert out.shape == (2, 9)
        assert (np.asarray(out) >= 0).all() and (np.asarray(out) < VOCAB).all()
