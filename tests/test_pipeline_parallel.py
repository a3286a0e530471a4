"""Pipeline-parallel trunk tests (`parallel/pipeline.py`).

The reference has no model parallelism (`SURVEY §2.4`); pipelining is a
beyond-parity scaling feature, so correctness is defined by equality
with the sequential layer loop: forward, gradients, and the full
MDM(trunk_impl="pipeline") forward and train step on the virtual mesh.
"""
import numpy as np

import jax
import jax.numpy as jnp

from diffusestylegesture_tpu import diffusion as D
from diffusestylegesture_tpu.models.mdm import MDM, MDMConfig
from diffusestylegesture_tpu.models.transformer import (
    TorchEncoderLayer,
    TorchTransformerEncoder,
)
from diffusestylegesture_tpu.parallel import (
    make_mesh,
    pipeline_apply,
    stack_layer_params,
    unstack_layer_params,
)
from diffusestylegesture_tpu.train import TrainConfig, create_train_state, make_train_step
from diffusestylegesture_tpu.train.state import make_zeggs_cond_builder

L, Dm, H, FF = 4, 64, 4, 96
B, T = 8, 12


def _encoder():
    return TorchTransformerEncoder(
        num_layers=L, d_model=Dm, nhead=H, dim_feedforward=FF, dropout=0.0)


def _setup(seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((B, T, Dm)).astype(np.float32))
    enc = _encoder()
    params = enc.init(jax.random.PRNGKey(0), x)
    return enc, params, x


def _layer_fn(lp, h, key):
    layer = TorchEncoderLayer(Dm, H, FF, 0.0)
    return layer.apply({"params": lp}, h, True)


class TestStacking:
    def test_roundtrip(self):
        _, params, _ = _setup()
        stacked = stack_layer_params(params["params"], L)
        assert jax.tree.leaves(stacked)[0].shape[0] == L
        back = unstack_layer_params(stacked, L)
        for a, b in zip(jax.tree.leaves(back), jax.tree.leaves(params["params"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestPipelineApply:
    def test_matches_sequential(self):
        enc, params, x = _setup()
        ref = enc.apply(params, x)
        stacked = stack_layer_params(params["params"], L)
        for pipe, data in ((2, 1), (4, 1), (2, 4)):
            axes = ("pipe",) if data == 1 else ("data", "pipe")
            shape = (pipe,) if data == 1 else (data, pipe)
            mesh = make_mesh(axes=axes, shape=shape,
                             devices=jax.devices()[: pipe * data])
            out = pipeline_apply(stacked, x, _layer_fn, mesh)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), atol=2e-5,
                err_msg=f"pipe={pipe} data={data}")

    def test_more_microbatches(self):
        enc, params, x = _setup()
        ref = enc.apply(params, x)
        stacked = stack_layer_params(params["params"], L)
        mesh = make_mesh(axes=("pipe",), shape=(2,), devices=jax.devices()[:2])
        out = pipeline_apply(stacked, x, _layer_fn, mesh, num_microbatches=4)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_gradients_match(self):
        """d loss/d params through the pipeline == through the loop
        (ppermute/psum transposes carry the backward schedule)."""
        enc, params, x = _setup()
        mesh = make_mesh(axes=("pipe",), shape=(4,), devices=jax.devices()[:4])

        def loss_seq(p):
            return jnp.sum(enc.apply(p, x) ** 2)

        def loss_pipe(p):
            stacked = stack_layer_params(p["params"], L)
            return jnp.sum(pipeline_apply(stacked, x, _layer_fn, mesh) ** 2)

        g_seq = jax.grad(loss_seq)(params)
        g_pipe = jax.grad(loss_pipe)(params)
        for a, b, in zip(jax.tree.leaves(g_pipe), jax.tree.leaves(g_seq)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3)

    def test_rejects_bad_shapes(self):
        _, params, x = _setup()
        stacked = stack_layer_params(params["params"], L)
        mesh = make_mesh(axes=("pipe",), shape=(3,), devices=jax.devices()[:3])
        try:
            pipeline_apply(stacked, x, _layer_fn, mesh)
            assert False, "expected ValueError for L % pipe != 0"
        except ValueError:
            pass


class TestMDMPipelineTrunk:
    def _cfg(self, **kw):
        base = dict(
            njoints=16, latent_dim=128, ff_size=96, num_layers=4,
            window_size=11, n_seed=4, cond_mask_prob=0.0, dropout=0.0)
        base.update(kw)
        return MDMConfig(**base)

    def _inputs(self, seed=3):
        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.standard_normal((B, 16, 1, 22)).astype(np.float32))
        cond = {
            "seed": x[..., :4],
            "style": jnp.asarray(rng.standard_normal((B, 6)).astype(np.float32)),
            "audio": jnp.asarray(
                rng.standard_normal((B, 22, 1024)).astype(np.float32)),
            "mask_local": jnp.ones((B, 22), bool),
        }
        return x, jnp.zeros((B,), jnp.int32), cond

    def test_forward_matches_loop(self):
        x, t, cond = self._inputs()
        base = MDM(self._cfg())
        params = base.init(jax.random.PRNGKey(0), x, t, cond)
        ref = base.apply(params, x, t, cond)
        mesh = make_mesh(axes=("data", "pipe"), shape=(2, 4),
                         devices=jax.devices()[:8])
        pp = MDM(self._cfg(trunk_impl="pipeline", pipe_mesh=mesh))
        out = pp.apply(params, x, t, cond)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_train_step_matches_loop(self):
        """One full train step (loss + grads + AdamW) with the pipelined
        trunk equals the sequential trunk on the same batch."""
        x, t, cond = self._inputs()
        base = MDM(self._cfg())
        params = base.init(jax.random.PRNGKey(0), x, t, cond)
        mesh = make_mesh(axes=("pipe",), shape=(4,), devices=jax.devices()[:4])
        pp = MDM(self._cfg(trunk_impl="pipeline", pipe_mesh=mesh))

        rng = np.random.default_rng(11)
        batch = {
            "motion": rng.standard_normal((B, 22, 16)).astype(np.float32),
            "style": rng.standard_normal((B, 6)).astype(np.float32),
            "wavlm": rng.standard_normal((B, 22, 1024)).astype(np.float32),
        }
        sched = D.Schedule.create(D.named_beta_schedule("cosine", 10))
        tcfg = TrainConfig(lr=1e-3)

        def run(model):
            def apply(p, xx, tt, cc, train=False, rngs=None, uncond=None):
                return model.apply(p, xx, tt, cc, train=train, rngs=rngs,
                                   uncond=uncond)

            step = make_train_step(
                apply, sched, tcfg, make_zeggs_cond_builder(4))
            state = create_train_state(params, tcfg, sched.num_timesteps)
            state, metrics = jax.jit(step)(state, batch, jax.random.PRNGKey(1))
            return state, float(metrics["loss"])

        state_pp, loss_pp = run(pp)
        state_ref, loss_ref = run(base)
        assert abs(loss_pp - loss_ref) < 1e-5
        # grads reduce in a different order through the pipeline's
        # psum/ppermute transposes, and Adam's g/(sqrt(v)+eps) amplifies
        # that for near-zero grads — same bound as the FSDP loop test
        for a, b in zip(jax.tree.leaves(state_pp.params),
                        jax.tree.leaves(state_ref.params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4)

    def test_mdmplus_pipeline_matches_loop(self):
        """Same dispatch for the BEAT/TWH family (`mdm_plus.py` routes
        through `transformer.encoder_trunk` too)."""
        from diffusestylegesture_tpu.models.mdm_plus import MDMPlus, MDMPlusConfig

        def cfgp(**kw):
            base = dict(
                njoints=24, latent_dim=128, ff_size=96, num_layers=2,
                source_audio_dim=40, audio_feat_dim=32, style_dim_in=4,
                n_seed=5, cond_mode="cross_local_attention4_style1",
                window_size=15, cond_mask_prob=0.0, dropout=0.0)
            base.update(kw)
            return MDMPlusConfig(**base)

        rng = np.random.default_rng(9)
        Tp = 30
        x = jnp.asarray(rng.standard_normal((B, 24, 1, Tp)).astype(np.float32))
        cond = {
            "style": jnp.asarray(rng.standard_normal((B, 4)).astype(np.float32)),
            "seed": x[..., :5],
            "audio": jnp.asarray(
                rng.standard_normal((B, Tp - 5, 40)).astype(np.float32)),
            "mask_local": jnp.ones((B, Tp), bool),
        }
        t = jnp.zeros((B,), jnp.int32)
        base = MDMPlus(cfgp())
        params = base.init(jax.random.PRNGKey(0), x, t, cond)
        ref = base.apply(params, x, t, cond)
        mesh = make_mesh(axes=("pipe",), shape=(2,), devices=jax.devices()[:2])
        pp = MDMPlus(cfgp(trunk_impl="pipeline", pipe_mesh=mesh))
        out = pp.apply(params, x, t, cond)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_remat_pipeline_matches_loop(self):
        """cfg.remat is honored by the pipelined trunk (jax.checkpoint
        around the stage body; round-3 review fix: --pp silently dropped
        rematerialization) — numerically identical, grads finite."""
        x, t, cond = self._inputs()
        base = MDM(self._cfg())
        params = base.init(jax.random.PRNGKey(0), x, t, cond)
        ref = base.apply(params, x, t, cond)
        mesh = make_mesh(axes=("pipe",), shape=(2,), devices=jax.devices()[:2])
        pp = MDM(self._cfg(remat=True, trunk_impl="pipeline",
                           pipe_mesh=mesh))
        out = pp.apply(params, x, t, cond)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)

        def loss(p):
            return jnp.sum(pp.apply(p, x, t, cond) ** 2)

        g = jax.grad(loss)(params)
        assert all(np.isfinite(np.asarray(l)).all()
                   for l in jax.tree.leaves(g))

    def test_train_dropout_runs(self):
        """With dropout on, pipelined training still runs (per-layer ×
        per-microbatch folded keys); only finiteness is asserted — the
        rng streams legitimately differ from the loop trunk's."""
        x, t, cond = self._inputs()
        cfg = self._cfg(dropout=0.1)
        base = MDM(cfg)
        params = base.init(jax.random.PRNGKey(0), x, t, cond)
        mesh = make_mesh(axes=("pipe",), shape=(2,), devices=jax.devices()[:2])
        pp = MDM(self._cfg(dropout=0.1, trunk_impl="pipeline", pipe_mesh=mesh))
        out = pp.apply(
            params, x, t, cond, train=True,
            rngs={"dropout": jax.random.PRNGKey(5),
                  "cond_mask": jax.random.PRNGKey(6)})
        assert np.isfinite(np.asarray(out)).all()


class TestRngImpls:
    def test_typed_keys_any_impl_cross_the_shard_map(self):
        """pipeline_apply strips typed keys to raw data at the shard_map
        boundary and re-wraps inside; the re-wrap must name the ORIGINAL
        impl — the train step's dropout stream is an `rbg` key (4-word
        data, utils/rng.py) and wrap_key_data defaults to threefry
        (2-word). Regression: the r04 multichip dryrun crashed on this."""
        from diffusestylegesture_tpu.utils.rng import rbg_key

        _, params, x = _setup()
        stacked = stack_layer_params(params["params"], L)
        mesh = make_mesh(axes=("pipe",), shape=(2,),
                         devices=jax.devices()[:2])

        def layer_fn(lp, h, key):
            layer = TorchEncoderLayer(Dm, H, FF, 0.0)
            out = layer.apply({"params": lp}, h, True)
            if key is not None:  # consume the key like a dropout layer
                out = out + 0.0 * jax.random.uniform(key, out.shape)
            return out

        for key in (jax.random.PRNGKey(3),          # legacy uint32
                    jax.random.key(3),              # typed threefry
                    rbg_key(jax.random.PRNGKey(3))):  # typed rbg (4-word)
            out = pipeline_apply(stacked, x, layer_fn, mesh, rng=key)
            assert np.isfinite(np.asarray(out)).all(), key
