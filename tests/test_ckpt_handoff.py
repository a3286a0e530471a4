"""TrainLoop checkpoint → sampling-CLI loader handoff.

A user who trains with `cli.train` must be able to point `cli.sample`'s
loader at the checkpoint directory directly (the reference's
`model{step}.pt` → `--model_path` flow).
"""
import numpy as np

import jax
import jax.numpy as jnp

from diffusestylegesture_tpu import diffusion as D
from diffusestylegesture_tpu.cli.sample import load_denoiser_params
from diffusestylegesture_tpu.models.mdm import MDM, MDMConfig
from diffusestylegesture_tpu.train import LoopConfig, TrainConfig, TrainLoop
from diffusestylegesture_tpu.train.state import make_zeggs_cond_builder

B, NJ, T = 4, 16, 22


def test_trainloop_checkpoint_loads_into_sampler(tmp_path):
    cfg = MDMConfig(njoints=NJ, latent_dim=128, ff_size=64, num_layers=1,
                    window_size=11, n_seed=4)
    model = MDM(cfg)
    rng = np.random.default_rng(0)
    batch = {
        "motion": rng.standard_normal((B, T, NJ)).astype(np.float32),
        "style": rng.standard_normal((B, 6)).astype(np.float32),
        "wavlm": rng.standard_normal((B, T, 1024)).astype(np.float32),
    }
    x = jnp.zeros((B, NJ, 1, T))
    cond = {
        "seed": x[..., :4], "style": jnp.asarray(batch["style"]),
        "audio": jnp.asarray(batch["wavlm"]), "mask_local": jnp.ones((B, T), bool),
    }
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((B,), jnp.int32), cond)

    def apply(p, xx, tt, cc, train=False, rngs=None, uncond=None):
        return model.apply(p, xx, tt, cc, train=train, rngs=rngs, uncond=uncond)

    ckpt_dir = str(tmp_path / "ckpts")
    loop = TrainLoop(
        apply, D.Schedule.create(D.named_beta_schedule("cosine", 6)),
        params, iter([batch] * 3),
        train_cfg=TrainConfig(lr=1e-3, ema_rate=0.9),
        loop_cfg=LoopConfig(num_steps=2, log_interval=100, save_interval=0,
                            checkpoint_dir=ckpt_dir),
        cond_builder=make_zeggs_cond_builder(4),
    )
    trained = loop.run()

    loaded = load_denoiser_params(ckpt_dir)
    want = jax.tree_util.tree_leaves(trained.params)
    got = jax.tree_util.tree_leaves(loaded)
    assert len(want) == len(got)
    for w, g in zip(want, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-6)

    # loaded params drive a forward pass
    out = model.apply(loaded, x, jnp.zeros((B,), jnp.int32), cond)
    assert np.isfinite(np.asarray(out)).all()

    # EMA variant differs from the raw params (ema_rate 0.9, 2 steps)
    ema = load_denoiser_params(ckpt_dir, use_ema=True)
    le = jax.tree_util.tree_leaves(ema)[0]
    lp = jax.tree_util.tree_leaves(loaded)[0]
    assert np.abs(np.asarray(le) - np.asarray(lp)).max() > 0


def test_npz_interchange_export(tmp_path):
    """save_params_npz flattens params to a portable npz (the analog of
    the reference's bare .pt weight dumps)."""
    from diffusestylegesture_tpu.train.checkpoint import save_params_npz

    params = {"params": {"layer": {"kernel": np.arange(6.0).reshape(2, 3),
                                   "bias": np.zeros(3)}}}
    path = str(tmp_path / "weights.npz")
    save_params_npz(path, params)
    blob = np.load(path)
    keys = set(blob.files)
    assert any("kernel" in k for k in keys)
    kernel_key = next(k for k in keys if k.endswith("kernel"))
    np.testing.assert_array_equal(blob[kernel_key], np.arange(6.0).reshape(2, 3))
