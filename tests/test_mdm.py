"""MDM denoiser tests: shapes, CFG masking, and torch reference parity."""
import numpy as np
import pytest

from conftest import requires_reference

import jax
import jax.numpy as jnp

from diffusestylegesture_tpu.models.mdm import MDM, MDMConfig
from diffusestylegesture_tpu.models import convert
from diffusestylegesture_tpu.models.local_attention import local_attention

B, NJ, T = 2, 48, 22  # T divisible by window 11


def small_cfg(**kw):
    base = dict(
        njoints=NJ,
        latent_dim=128,
        ff_size=128,
        num_layers=2,
        window_size=11,
        n_seed=8,
        local_heads=8,
        num_heads=4,
    )
    base.update(kw)
    return MDMConfig(**base)


def make_cond(rng, audio_dim=1024):
    return {
        "style": jnp.asarray(rng.standard_normal((B, 6)).astype(np.float32)),
        "seed": jnp.asarray(rng.standard_normal((B, NJ, 1, 8)).astype(np.float32)),
        "audio": jnp.asarray(rng.standard_normal((B, T, audio_dim)).astype(np.float32)),
        "mask_local": jnp.ones((B, T), bool),
    }


class TestShapes:
    @pytest.mark.parametrize(
        "cond_mode",
        [
            "cross_local_attention3_style1",
            "cross_local_attention5_style1",
            "cross_local_attention_style1",
        ],
    )
    def test_forward_shapes(self, cond_mode):
        rng = np.random.default_rng(0)
        model = MDM(small_cfg(cond_mode=cond_mode))
        x = jnp.asarray(rng.standard_normal((B, NJ, 1, T)).astype(np.float32))
        t = jnp.array([3, 17])
        cond = make_cond(rng)
        params = model.init(jax.random.PRNGKey(0), x, t, cond)
        out = model.apply(params, x, t, cond)
        assert out.shape == (B, NJ, 1, T)
        assert np.isfinite(np.asarray(out)).all()

    def test_uncond_masks_conditioning(self):
        rng = np.random.default_rng(1)
        model = MDM(small_cfg())
        x = jnp.asarray(rng.standard_normal((B, NJ, 1, T)).astype(np.float32))
        t = jnp.array([3, 17])
        cond = make_cond(rng)
        params = model.init(jax.random.PRNGKey(0), x, t, cond)
        out_u1 = model.apply(params, x, t, cond, uncond=jnp.ones((B,), bool))
        cond2 = dict(cond)
        cond2["style"] = cond["style"] * 0 + 5.0
        cond2["seed"] = cond["seed"] * 0 - 3.0
        out_u2 = model.apply(params, x, t, cond2, uncond=jnp.ones((B,), bool))
        np.testing.assert_allclose(np.asarray(out_u1), np.asarray(out_u2), atol=1e-6)
        out_c = model.apply(params, x, t, cond2)
        assert np.abs(np.asarray(out_c) - np.asarray(out_u2)).max() > 1e-4

    def test_train_mode_cond_dropout_stochastic(self):
        rng = np.random.default_rng(2)
        model = MDM(small_cfg(cond_mask_prob=0.5, dropout=0.0))
        x = jnp.asarray(rng.standard_normal((B, NJ, 1, T)).astype(np.float32))
        t = jnp.array([3, 17])
        cond = make_cond(rng)
        params = model.init(jax.random.PRNGKey(0), x, t, cond)
        outs = [
            np.asarray(
                model.apply(
                    params, x, t, cond, train=True,
                    rngs={"cond_mask": jax.random.PRNGKey(i), "dropout": jax.random.PRNGKey(99)},
                )
            )
            for i in range(4)
        ]
        diffs = max(np.abs(outs[0] - o).max() for o in outs[1:])
        assert diffs > 1e-5


@requires_reference
class TestLocalAttentionParity:
    def test_vs_reference(self):
        import sys
        import torch

        sys.path.insert(0, "/root/reference/main/model")
        from local_attention.local_attention import LocalAttention  # type: ignore

        rng = np.random.default_rng(3)
        bh, n, d = 16, 22, 32
        q = rng.standard_normal((bh, n, d)).astype(np.float32)
        k = rng.standard_normal((bh, n, d)).astype(np.float32)
        v = rng.standard_normal((bh, n, d)).astype(np.float32)
        mask = np.ones((2, n), dtype=bool)
        mask[1, -5:] = False

        ref = LocalAttention(dim=d, window_size=11, causal=True, look_backward=1,
                             look_forward=0, dropout=0.0, exact_windowsize=False)
        ref.eval()
        with torch.no_grad():
            theirs = ref(
                torch.as_tensor(q), torch.as_tensor(k), torch.as_tensor(v),
                packed_shape=[torch.Size([2, 8])], mask=torch.as_tensor(mask),
            ).numpy().reshape(bh, n, d)

        ours = np.asarray(
            local_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), 11,
                            jnp.asarray(mask), heads=8)
        )
        np.testing.assert_allclose(ours, theirs, atol=2e-5)


@requires_reference
class TestMDMParity:
    def test_forward_parity_attention3(self):
        import torch

        from ref_compat import import_ref_mdm

        RefMDM = import_ref_mdm()
        torch.manual_seed(0)
        ref = RefMDM(
            modeltype="", njoints=NJ, nfeats=1,
            cond_mode="cross_local_attention3_style1", audio_feat="wavlm",
            arch="trans_enc", latent_dim=128, ff_size=128, num_layers=2,
            n_seed=8, cond_mask_prob=0.1,
        )
        ref.eval()

        cfg = small_cfg()
        model = MDM(cfg)
        rng = np.random.default_rng(4)
        x = rng.standard_normal((B, NJ, 1, T)).astype(np.float32)
        t = np.array([12, 45])
        style = rng.standard_normal((B, 6)).astype(np.float32)
        seed = rng.standard_normal((B, NJ, 1, 8)).astype(np.float32)
        audio = rng.standard_normal((B, T, 1024)).astype(np.float32)
        mask_local = np.ones((B, T), dtype=bool)

        with torch.no_grad():
            theirs = ref(
                torch.as_tensor(x),
                torch.as_tensor(t),
                y={
                    "style": torch.as_tensor(style),
                    "seed": torch.as_tensor(seed),
                    "audio": torch.as_tensor(audio),
                    "mask_local": torch.as_tensor(mask_local),
                },
            ).numpy()

        params = {"params": convert.convert_mdm_zeggs(ref.state_dict(), num_layers=2)}
        cond = {
            "style": jnp.asarray(style),
            "seed": jnp.asarray(seed),
            "audio": jnp.asarray(audio),
            "mask_local": jnp.asarray(mask_local),
        }
        ours = np.asarray(model.apply(params, jnp.asarray(x), jnp.asarray(t), cond))
        np.testing.assert_allclose(ours, theirs, atol=5e-4)

    def test_uncond_parity(self):
        import torch

        from ref_compat import import_ref_mdm

        RefMDM = import_ref_mdm()
        torch.manual_seed(1)
        ref = RefMDM(
            modeltype="", njoints=NJ, nfeats=1,
            cond_mode="cross_local_attention3_style1", audio_feat="wavlm",
            arch="trans_enc", latent_dim=128, ff_size=128, num_layers=2,
            n_seed=8, cond_mask_prob=0.1,
        )
        ref.eval()
        rng = np.random.default_rng(5)
        x = rng.standard_normal((B, NJ, 1, T)).astype(np.float32)
        t = np.array([2, 9])
        style = rng.standard_normal((B, 6)).astype(np.float32)
        seed = rng.standard_normal((B, NJ, 1, 8)).astype(np.float32)
        audio = rng.standard_normal((B, T, 1024)).astype(np.float32)
        mask_local = np.ones((B, T), dtype=bool)
        with torch.no_grad():
            theirs = ref(
                torch.as_tensor(x), torch.as_tensor(t),
                y={
                    "style": torch.as_tensor(style),
                    "seed": torch.as_tensor(seed),
                    "audio": torch.as_tensor(audio),
                    "mask_local": torch.as_tensor(mask_local),
                },
                uncond_info=True,
            ).numpy()
        params = {"params": convert.convert_mdm_zeggs(ref.state_dict(), num_layers=2)}
        model = MDM(small_cfg())
        cond = {
            "style": jnp.asarray(style),
            "seed": jnp.asarray(seed),
            "audio": jnp.asarray(audio),
            "mask_local": jnp.asarray(mask_local),
        }
        ours = np.asarray(
            model.apply(
                params, jnp.asarray(x), jnp.asarray(t), cond, uncond=jnp.ones((B,), bool)
            )
        )
        np.testing.assert_allclose(ours, theirs, atol=5e-4)


class TestArchVariants:
    """MDM arch options trans_dec / gru (ref `main/model/mdm.py:87-100`).

    The reference forward branches for both archs reference an undefined
    `emb` (`mdm.py:325,331-345`) and raise NameError — pinned below — so
    numeric parity is impossible; these ports use the evident intent
    (emb := style/seed + timestep token) and are covered by shape/
    behavior tests."""

    def _inputs(self, seed=9):
        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.standard_normal((B, NJ, 1, T)).astype(np.float32))
        t = jnp.array([3, 17])
        cond = {
            "style": jnp.asarray(rng.standard_normal((B, 6)).astype(np.float32)),
            "seed": jnp.asarray(rng.standard_normal((B, NJ, 1, 8)).astype(np.float32)),
            "audio": jnp.asarray(rng.standard_normal((B, T, 13)).astype(np.float32)),
            "mask_local": jnp.ones((B, T), bool),
        }
        return x, t, cond

    @pytest.mark.parametrize("arch", ["trans_dec", "gru", "mytrans_enc"])
    def test_forward(self, arch):
        model = MDM(small_cfg(cond_mode="style1", audio_feat="mfcc", arch=arch))
        x, t, cond = self._inputs()
        params = model.init(jax.random.PRNGKey(0), x, t, cond)
        out = model.apply(params, x, t, cond)
        assert out.shape == (B, NJ, 1, T)
        assert np.isfinite(np.asarray(out)).all()

    @pytest.mark.parametrize("arch", ["trans_dec", "gru", "mytrans_enc"])
    def test_conditioning_token_used(self, arch):
        """Changing the style must change the output (the repaired `emb`
        is actually wired into the trunk)."""
        model = MDM(small_cfg(cond_mode="style1", audio_feat="mfcc", arch=arch))
        x, t, cond = self._inputs()
        params = model.init(jax.random.PRNGKey(0), x, t, cond)
        out1 = np.asarray(model.apply(params, x, t, cond))
        cond2 = dict(cond)
        cond2["style"] = cond["style"] + 1.0
        out2 = np.asarray(model.apply(params, x, t, cond2))
        assert np.abs(out1 - out2).max() > 1e-5

    def test_gru_is_causal(self):
        """A GRU trunk cannot see the future: perturbing late frames must
        not change early outputs (sanity that this really is a GRU scan)."""
        model = MDM(small_cfg(cond_mode="style1", audio_feat="mfcc", arch="gru"))
        x, t, cond = self._inputs()
        params = model.init(jax.random.PRNGKey(0), x, t, cond)
        out1 = np.asarray(model.apply(params, x, t, cond))
        x2 = x.at[..., -5:].add(10.0)
        out2 = np.asarray(model.apply(params, x2, t, cond))
        np.testing.assert_allclose(out1[..., :5], out2[..., :5], atol=1e-5)
        assert np.abs(out1[..., -5:] - out2[..., -5:]).max() > 1e-3

    @requires_reference
    @pytest.mark.parametrize("arch", ["trans_dec", "gru"])
    def test_reference_branch_is_broken(self, arch):
        """Pin the claim that the reference archs are unexecutable."""
        import torch

        from ref_compat import import_ref_mdm

        RefMDM = import_ref_mdm()
        ref = RefMDM(
            modeltype="", njoints=NJ, nfeats=1, cond_mode="style1",
            audio_feat="mfcc", arch=arch, latent_dim=128, ff_size=128,
            num_layers=1, n_seed=8, cond_mask_prob=0.1,
        )
        ref.eval()
        rng = np.random.default_rng(1)
        y = {
            "style": torch.zeros(B, 6),
            "seed": torch.zeros(B, NJ, 1, 8),
            "audio": torch.as_tensor(
                rng.standard_normal((B, T, 13)).astype(np.float32)
            ),
            "mask_local": torch.ones(B, T, dtype=torch.bool),
        }
        with pytest.raises(NameError), torch.no_grad():
            ref(torch.zeros(B, NJ, 1, T), torch.tensor([1, 2]), y=y)


class TestPlainBranch:
    def test_plain_trans_enc_style2(self):
        rng = np.random.default_rng(9)
        model = MDM(small_cfg(cond_mode="style2", audio_feat="mfcc"))
        x = jnp.asarray(rng.standard_normal((B, NJ, 1, T)).astype(np.float32))
        t = jnp.array([3, 17])
        cond = {
            "style": jnp.asarray(rng.standard_normal((B, 6)).astype(np.float32)),
            "seed": jnp.asarray(rng.standard_normal((B, NJ, 1, 8)).astype(np.float32)),
            "audio": jnp.asarray(rng.standard_normal((B, T, 13)).astype(np.float32)),
            "mask_local": jnp.ones((B, T), bool),
        }
        params = model.init(jax.random.PRNGKey(0), x, t, cond)
        out = model.apply(params, x, t, cond)
        assert out.shape == (B, NJ, 1, T)
        assert np.isfinite(np.asarray(out)).all()


class TestGeluTanhServing:
    def test_close_to_erf_but_distinct(self):
        """'gelu_tanh' is the fast serving activation: same params, output
        within ~1e-3 of the exact-erf form (bench.py gates it on-device
        before it is ever the headline path)."""
        rng = np.random.default_rng(0)
        cfg = small_cfg()
        cfg_fast = small_cfg(activation="gelu_tanh")
        model, fast = MDM(cfg), MDM(cfg_fast)
        x = jnp.asarray(rng.standard_normal((B, NJ, 1, T)).astype(np.float32))
        t = jnp.asarray([3, 7])
        cond = make_cond(rng)
        params = model.init(jax.random.PRNGKey(0), x, t, cond)
        out = model.apply(params, x, t, cond)
        out_fast = fast.apply(params, x, t, cond)  # same params, new program
        err = float(jnp.abs(out - out_fast).max())
        assert 0 < err < 2e-3


class TestRematTraining:
    """remat=True must work under training (deterministic=False reaches
    nn.remat as a STATIC argument — as a traced kwarg it raises
    TracerBoolConversionError; r3 regression) and match the plain
    forward exactly."""

    def test_remat_train_step_and_forward_parity(self):
        from diffusestylegesture_tpu import diffusion as D
        from diffusestylegesture_tpu.train import (
            TrainConfig, create_train_state, make_train_step)
        from diffusestylegesture_tpu.train.state import make_zeggs_cond_builder

        B, NJ, T = 4, 16, 22
        kw = dict(njoints=NJ, latent_dim=128, ff_size=64, num_layers=2,
                  window_size=11, n_seed=4)
        model_r = MDM(MDMConfig(remat=True, **kw))
        model_p = MDM(MDMConfig(remat=False, **kw))
        rng = np.random.default_rng(0)
        batch = {
            "motion": rng.standard_normal((B, T, NJ)).astype(np.float32),
            "style": rng.standard_normal((B, 6)).astype(np.float32),
            "wavlm": rng.standard_normal((B, T, 1024)).astype(np.float32),
        }
        x = jnp.zeros((B, NJ, 1, T))
        cond = {"seed": x[..., :4], "style": jnp.asarray(batch["style"]),
                "audio": jnp.asarray(batch["wavlm"]),
                "mask_local": jnp.ones((B, T), bool)}
        params = model_p.init(jax.random.PRNGKey(0), x,
                              jnp.zeros((B,), jnp.int32), cond)

        o_r = model_r.apply(params, x, jnp.zeros((B,), jnp.int32), cond)
        o_p = model_p.apply(params, x, jnp.zeros((B,), jnp.int32), cond)
        np.testing.assert_allclose(np.asarray(o_r), np.asarray(o_p), atol=1e-6)

        def apply(p, xx, tt, cc, train=False, rngs=None, uncond=None):
            return model_r.apply(p, xx, tt, cc, train=train, rngs=rngs,
                                 uncond=uncond)

        sched = D.Schedule.create(D.named_beta_schedule("cosine", 10))
        cfg = TrainConfig(lr=1e-3)
        step = jax.jit(make_train_step(apply, sched, cfg, make_zeggs_cond_builder(4)))
        state = create_train_state(params, cfg, 10)
        state, m = step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(m["loss"]))
