"""MDM+/++ (BEAT/TWH) tests: shapes + torch reference parity for all variants."""
import numpy as np
import pytest

from conftest import requires_reference

import jax
import jax.numpy as jnp

from diffusestylegesture_tpu.models.mdm_plus import MDMPlus, MDMPlusConfig
from diffusestylegesture_tpu.models import convert

B, NJ, T, NSEED = 2, 36, 30, 5  # T divisible by window 15
AUDIO_DIM = 40
STYLE = 4


def small_cfg(cond_mode):
    return MDMPlusConfig(
        njoints=NJ,
        latent_dim=128,
        ff_size=96,
        num_layers=2,
        source_audio_dim=AUDIO_DIM,
        audio_feat_dim=32,
        style_dim_in=STYLE,
        n_seed=NSEED,
        cond_mode=cond_mode,
        window_size=15,
    )


def audio_len(mode):
    if "attention3" in mode:
        return T
    if "attention4" in mode:
        return T - NSEED
    return T - 2 * NSEED


def make_inputs(rng, mode):
    cond = {
        "style": rng.standard_normal((B, STYLE)).astype(np.float32),
        "seed": rng.standard_normal((B, NJ, 1, NSEED)).astype(np.float32),
        "audio": rng.standard_normal((B, audio_len(mode), AUDIO_DIM)).astype(np.float32),
        "mask_local": np.ones((B, T), dtype=bool),
    }
    if "attention5" in mode:
        cond["seed_last"] = rng.standard_normal((B, NJ, 1, NSEED)).astype(np.float32)
    x = rng.standard_normal((B, NJ, 1, T)).astype(np.float32)
    t = np.array([11, 29])
    return x, t, cond


MODES = [
    "cross_local_attention3_style1",
    "cross_local_attention4_style1",
    "cross_local_attention5_style1",
]


class TestShapes:
    @pytest.mark.parametrize("mode", MODES)
    def test_forward(self, mode):
        rng = np.random.default_rng(0)
        x, t, cond = make_inputs(rng, mode)
        model = MDMPlus(small_cfg(mode))
        jcond = {k: jnp.asarray(v) for k, v in cond.items()}
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t), jcond)
        out = model.apply(params, jnp.asarray(x), jnp.asarray(t), jcond)
        assert out.shape == (B, NJ, 1, T)
        assert np.isfinite(np.asarray(out)).all()


@requires_reference
class TestParity:
    @classmethod
    def setup_class(cls):
        import sys

        model_dir = "/root/reference/BEAT-TWH-main/model"
        # the BEAT model dir shadows main/model; make sure it wins
        sys.path.insert(0, model_dir)
        import importlib

        if "mdm" in sys.modules:
            del sys.modules["mdm"]
        import mdm as beat_mdm_mod  # type: ignore

        if "BEAT-TWH-main" not in beat_mdm_mod.__file__:
            beat_mdm_mod = importlib.reload(beat_mdm_mod)
        assert "BEAT-TWH-main" in beat_mdm_mod.__file__
        cls.RefMDM = beat_mdm_mod.MDM

    @pytest.mark.parametrize("mode", MODES)
    def test_parity(self, mode):
        import torch

        torch.manual_seed(0)
        ref = self.RefMDM(
            modeltype="", njoints=NJ, nfeats=1, cond_mode=mode, audio_feat="wavlm",
            arch="trans_enc", latent_dim=128, ff_size=96, num_layers=2,
            n_seed=NSEED, cond_mask_prob=0.1, style_dim=STYLE,
            source_audio_dim=AUDIO_DIM, audio_feat_dim_latent=32,
        )
        ref.eval()
        rng = np.random.default_rng(1)
        x, t, cond = make_inputs(rng, mode)
        y = {k: torch.as_tensor(v) for k, v in cond.items()}
        with torch.no_grad():
            theirs = ref(torch.as_tensor(x), torch.as_tensor(t), y=y).numpy()

        params = {"params": convert.convert_mdm_beat_twh(ref.state_dict(), num_layers=2)}
        model = MDMPlus(small_cfg(mode))
        jcond = {k: jnp.asarray(v) for k, v in cond.items()}
        ours = np.asarray(model.apply(params, jnp.asarray(x), jnp.asarray(t), jcond))
        np.testing.assert_allclose(ours, theirs, atol=5e-4)
