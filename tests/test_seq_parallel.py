"""Sequence-parallel local attention == single-device local attention."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffusestylegesture_tpu.models.local_attention import local_attention
from diffusestylegesture_tpu.parallel import make_mesh


@pytest.mark.parametrize("n,w,shards", [(88, 11, 4), (88, 11, 8), (120, 15, 4)])
def test_matches_single_device(n, w, shards):
    from diffusestylegesture_tpu.parallel.seq_parallel import (
        sequence_parallel_local_attention,
    )

    rng = np.random.default_rng(0)
    b, heads, d = 2, 8, 32
    bh = b * heads
    q = jnp.asarray(rng.standard_normal((bh, n, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((bh, n, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((bh, n, d)).astype(np.float32))
    mask = np.ones((b, n), bool)
    mask[1, -9:] = False
    mask = jnp.asarray(mask)

    ref = local_attention(q, k, v, w, mask, heads=heads)

    mesh = make_mesh(axes=("seq",), shape=(shards,), devices=jax.devices()[:shards])
    out = sequence_parallel_local_attention(q, k, v, w, mesh, "seq", mask, heads=heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
