"""Cross-framework TRAINING parity: loss and gradients match torch.

The inference side is proven end to end (`test_ref_e2e_parity*`); this
closes the training side: one reference training step's loss
(`SpacedDiffusion.training_losses` → masked SmoothL1 on the x0 target,
`gaussian_diffusion.py:1237-1364`) and its backward gradients are
compared against `diffusion.gaussian.training_losses` + `jax.grad` on
the converted parameters — the torch gradient state_dict is mapped into
the flax layout with the SAME converter used for weights, so every
parameter's gradient is compared leaf-for-leaf.
"""
import numpy as np
import pytest

from conftest import requires_reference

import jax
import jax.numpy as jnp

from diffusestylegesture_tpu.diffusion import Schedule, named_beta_schedule
from diffusestylegesture_tpu.diffusion import gaussian as G
from diffusestylegesture_tpu.models import convert
from diffusestylegesture_tpu.models.mdm import MDM, MDMConfig

B, NJ, T, NSEED = 2, 48, 22, 8
NT = 20


@requires_reference
def test_training_loss_and_gradients_match():
    import torch

    from ref_compat import import_ref_diffusion, import_ref_mdm

    gd, respace = import_ref_diffusion()
    RefMDM = import_ref_mdm()

    torch.manual_seed(0)
    ref = RefMDM(
        modeltype="", njoints=NJ, nfeats=1,
        cond_mode="cross_local_attention3_style1", audio_feat="wavlm",
        arch="trans_enc", latent_dim=128, ff_size=128, num_layers=2,
        n_seed=NSEED, cond_mask_prob=0.1,
    )
    ref.eval()  # no dropout / cond masking: deterministic forward+backward

    betas = gd.get_named_beta_schedule("cosine", NT)
    spaced = respace.SpacedDiffusion(
        use_timesteps=respace.space_timesteps(NT, [NT]),
        betas=betas,
        model_mean_type=gd.ModelMeanType.START_X,
        model_var_type=gd.ModelVarType.FIXED_SMALL,
        loss_type=gd.LossType.MSE,
        rescale_timesteps=False,
        lambda_vel=0.0, lambda_rcxyz=0.0, lambda_fc=0.0,
    )

    rng = np.random.default_rng(3)
    x_start = rng.standard_normal((B, NJ, 1, T)).astype(np.float32)
    noise = rng.standard_normal((B, NJ, 1, T)).astype(np.float32)
    t = np.array([4, 17])
    style = rng.standard_normal((B, 6)).astype(np.float32)
    seed = rng.standard_normal((B, NJ, 1, NSEED)).astype(np.float32)
    audio = rng.standard_normal((B, T, 1024)).astype(np.float32)
    mask = np.ones((B, 1, 1, T), np.float32)
    mask[1, ..., -4:] = 0.0  # exercise the masked-loss normalization

    # ---- torch loss + backward ----
    y = {
        "style": torch.as_tensor(style),
        "seed": torch.as_tensor(seed),
        "audio": torch.as_tensor(audio),
        "mask_local": torch.ones(B, T, dtype=torch.bool),
        "mask": torch.as_tensor(mask) > 0,
    }
    terms = spaced.training_losses(
        ref, torch.as_tensor(x_start), torch.as_tensor(t),
        model_kwargs={"y": y}, noise=torch.as_tensor(noise),
    )
    ref_loss_vec = terms["loss"].detach().numpy()
    loss = terms["loss"].mean()
    loss.backward()
    grad_sd = {
        k: p.grad.detach().numpy() for k, p in ref.named_parameters()
        if p.grad is not None
    }
    # the converter maps any state_dict-shaped mapping; map the GRADIENTS
    ref_grads = convert.convert_mdm_zeggs(grad_sd, num_layers=2)

    # ---- jax loss + grad on converted params ----
    model = MDM(MDMConfig(njoints=NJ, latent_dim=128, ff_size=128,
                          num_layers=2, window_size=11, n_seed=NSEED))
    params = {"params": convert.convert_mdm_zeggs(ref.state_dict(), num_layers=2)}
    sched = Schedule.create(named_beta_schedule("cosine", NT))
    cond = {
        "style": jnp.asarray(style),
        "seed": jnp.asarray(seed),
        "audio": jnp.asarray(audio),
        "mask_local": jnp.ones((B, T), bool),
    }

    def loss_fn(params):
        def model_fn(x, tt):
            return model.apply(params, x, tt, cond)

        terms, _ = G.training_losses(
            sched, model_fn, jnp.asarray(x_start), jnp.asarray(t),
            jnp.asarray(noise), jnp.asarray(mask),
        )
        return terms["loss"].mean(), terms["loss"]

    (our_loss, our_vec), our_grads = jax.value_and_grad(loss_fn, has_aux=True)(params)

    # per-example losses and the scalar agree
    np.testing.assert_allclose(np.asarray(our_vec), ref_loss_vec, atol=1e-5)
    np.testing.assert_allclose(float(our_loss), float(loss.detach()), atol=1e-5)

    # every converted gradient leaf agrees
    flat_ref = jax.tree_util.tree_flatten_with_path(ref_grads)[0]
    flat_ours = dict(jax.tree_util.tree_flatten_with_path(our_grads["params"])[0])
    assert len(flat_ref) >= 20  # the whole network, not a corner
    checked = 0
    for path, ref_g in flat_ref:
        ours_g = flat_ours[path]
        np.testing.assert_allclose(
            np.asarray(ours_g), np.asarray(ref_g), atol=2e-5,
            err_msg=jax.tree_util.keystr(path),
        )
        checked += 1
    assert checked == len(flat_ref)


@requires_reference
def test_training_gradients_match_mdm_plus_attention4():
    """Same proof for the BEAT/TWH denoiser in its '+' configuration
    (audio window trimmed by n_seed, `BEAT train/training_loop.py:120`)."""
    import torch

    from ref_compat import import_ref_beat_mdm, import_ref_diffusion

    from diffusestylegesture_tpu.models.mdm_plus import MDMPlus, MDMPlusConfig

    gd, respace = import_ref_diffusion()
    RefMDM = import_ref_beat_mdm()

    nj, tt, nseed, audio_dim, style_dim = 36, 30, 5, 40, 4
    torch.manual_seed(1)
    ref = RefMDM(
        modeltype="", njoints=nj, nfeats=1,
        cond_mode="cross_local_attention4_style1", audio_feat="wavlm",
        arch="trans_enc", latent_dim=128, ff_size=96, num_layers=2,
        n_seed=nseed, cond_mask_prob=0.1, style_dim=style_dim,
        source_audio_dim=audio_dim, audio_feat_dim_latent=32,
    )
    ref.eval()

    spaced = respace.SpacedDiffusion(
        use_timesteps=respace.space_timesteps(NT, [NT]),
        betas=gd.get_named_beta_schedule("cosine", NT),
        model_mean_type=gd.ModelMeanType.START_X,
        model_var_type=gd.ModelVarType.FIXED_SMALL,
        loss_type=gd.LossType.MSE,
        rescale_timesteps=False,
        lambda_vel=0.0, lambda_rcxyz=0.0, lambda_fc=0.0,
    )

    rng = np.random.default_rng(5)
    x_start = rng.standard_normal((B, nj, 1, tt)).astype(np.float32)
    noise = rng.standard_normal((B, nj, 1, tt)).astype(np.float32)
    t = np.array([2, 15])
    style = rng.standard_normal((B, style_dim)).astype(np.float32)
    seed = rng.standard_normal((B, nj, 1, nseed)).astype(np.float32)
    audio = rng.standard_normal((B, tt - nseed, audio_dim)).astype(np.float32)
    mask = np.ones((B, 1, 1, tt), np.float32)

    y = {
        "style": torch.as_tensor(style),
        "seed": torch.as_tensor(seed),
        "audio": torch.as_tensor(audio),
        "mask_local": torch.ones(B, tt, dtype=torch.bool),
        "mask": torch.as_tensor(mask) > 0,
    }
    terms = spaced.training_losses(
        ref, torch.as_tensor(x_start), torch.as_tensor(t),
        model_kwargs={"y": y}, noise=torch.as_tensor(noise),
    )
    terms["loss"].mean().backward()
    grad_sd = {
        k: p.grad.detach().numpy() for k, p in ref.named_parameters()
        if p.grad is not None
    }
    ref_grads = convert.convert_mdm_beat_twh(grad_sd, num_layers=2)

    model = MDMPlus(MDMPlusConfig(
        njoints=nj, latent_dim=128, ff_size=96, num_layers=2,
        source_audio_dim=audio_dim, audio_feat_dim=32, style_dim_in=style_dim,
        n_seed=nseed, cond_mode="cross_local_attention4_style1", window_size=15,
    ))
    params = {"params": convert.convert_mdm_beat_twh(ref.state_dict(), num_layers=2)}
    sched = Schedule.create(named_beta_schedule("cosine", NT))
    cond = {
        "style": jnp.asarray(style),
        "seed": jnp.asarray(seed),
        "audio": jnp.asarray(audio),
        "mask_local": jnp.ones((B, tt), bool),
    }

    def loss_fn(params):
        terms, _ = G.training_losses(
            sched, lambda x, ts: model.apply(params, x, ts, cond),
            jnp.asarray(x_start), jnp.asarray(t), jnp.asarray(noise),
            jnp.asarray(mask),
        )
        return terms["loss"].mean()

    our_loss, our_grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(
        float(our_loss), float(terms["loss"].mean().detach()), atol=1e-5
    )
    flat_ref = jax.tree_util.tree_flatten_with_path(ref_grads)[0]
    flat_ours = dict(jax.tree_util.tree_flatten_with_path(our_grads["params"])[0])
    assert len(flat_ref) >= 20
    for path, ref_g in flat_ref:
        np.testing.assert_allclose(
            np.asarray(flat_ours[path]), np.asarray(ref_g), atol=2e-5,
            err_msg=jax.tree_util.keystr(path),
        )
