"""Pallas kernel correctness (interpret mode on CPU) vs the XLA path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from diffusestylegesture_tpu.models.local_attention import local_attention


@pytest.mark.parametrize("n,w,d,heads", [(22, 11, 32, 8), (30, 15, 48, 8), (88, 11, 32, 8)])
def test_local_attention_pallas_matches_xla(n, w, d, heads):
    from diffusestylegesture_tpu.ops.local_attention_pallas import local_attention_pallas

    rng = np.random.default_rng(0)
    b = 2
    bh = b * heads
    q = jnp.asarray(rng.standard_normal((bh, n, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((bh, n, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((bh, n, d)).astype(np.float32))
    mask = np.ones((b, n), bool)
    mask[1, -7:] = False
    mask = jnp.asarray(mask)

    ref = local_attention(q, k, v, w, mask, heads=heads)
    with pltpu.force_tpu_interpret_mode():
        out = local_attention_pallas(q, k, v, w, mask, heads=heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_local_attention_pallas_no_mask():
    from diffusestylegesture_tpu.ops.local_attention_pallas import local_attention_pallas

    rng = np.random.default_rng(1)
    bh, n, d = 8, 22, 32
    q = jnp.asarray(rng.standard_normal((bh, n, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((bh, n, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((bh, n, d)).astype(np.float32))
    ref = local_attention(q, k, v, 11, None, heads=8)
    with pltpu.force_tpu_interpret_mode():
        out = local_attention_pallas(q, k, v, 11, None, heads=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
