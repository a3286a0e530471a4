"""Fused serving forward == flax MDM forward."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from diffusestylegesture_tpu.models.fused_mdm import make_fused_zeggs_apply
from diffusestylegesture_tpu.models.mdm import MDM, MDMConfig

B, NJ, T = 2, 32, 22


def test_fused_matches_flax():
    cfg = MDMConfig(njoints=NJ, latent_dim=128, ff_size=96, num_layers=2,
                    window_size=11, n_seed=8)
    model = MDM(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, NJ, 1, T)).astype(np.float32))
    t = jnp.array([999, 3])
    cond = {
        "style": jnp.asarray(rng.standard_normal((B, 6)).astype(np.float32)),
        "seed": jnp.asarray(rng.standard_normal((B, NJ, 1, 8)).astype(np.float32)),
        "audio": jnp.asarray(rng.standard_normal((B, T, 1024)).astype(np.float32)),
        "mask_local": jnp.ones((B, T), bool),
    }
    params = model.init(jax.random.PRNGKey(0), x, t, cond)
    ref = model.apply(params, x, t, cond)

    # full-f32 MXU for exactness in interpret mode; bf16 is the TPU-speed mode
    fused = make_fused_zeggs_apply(cfg, mxu_bf16=False)
    with pltpu.force_tpu_interpret_mode():
        out = fused(params, x, t, cond)
        out_u = fused(params, x, t, cond, uncond=jnp.ones((B,), bool))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    ref_u = model.apply(params, x, t, cond, uncond=jnp.ones((B,), bool))
    np.testing.assert_allclose(np.asarray(out_u), np.asarray(ref_u), atol=2e-5)
