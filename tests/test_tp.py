"""Tensor-parallel layout tests: packed-vs-split QKV equivalence,
checkpoint layout converters, head-aligned partition specs, and the
TrainLoop TP path with the split layout.

The split layout is the Megatron pairing (column-parallel q/k/v +
row-parallel out_proj) the packed torch `in_proj` cannot express —
see `diffusestylegesture_tpu/parallel/tp.py` module docstring.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from diffusestylegesture_tpu import diffusion as D
from diffusestylegesture_tpu.models.mdm import MDM, MDMConfig
from diffusestylegesture_tpu.models.transformer import TorchMultiheadAttention
from diffusestylegesture_tpu.parallel import (
    mdm_param_specs,
    merge_qkv_params,
    split_qkv_params,
)
from diffusestylegesture_tpu.train import LoopConfig, TrainConfig, TrainLoop
from diffusestylegesture_tpu.train.state import make_zeggs_cond_builder

B, NJ, T = 4, 16, 22


def _mdm_cfg(split_qkv=False):
    return MDMConfig(
        njoints=NJ, latent_dim=128, ff_size=64, num_layers=2, window_size=11,
        n_seed=4, cond_mask_prob=0.0, dropout=0.0, split_qkv=split_qkv,
    )


def _inputs(rng):
    x = jnp.asarray(rng.standard_normal((B, NJ, 1, T)).astype(np.float32))
    cond = {
        "seed": x[..., :4],
        "style": jnp.asarray(rng.standard_normal((B, 6)).astype(np.float32)),
        "audio": jnp.asarray(
            rng.standard_normal((B, T, 1024)).astype(np.float32)),
        "mask_local": jnp.ones((B, T), bool),
    }
    return x, jnp.zeros((B,), jnp.int32), cond


class TestSplitQKV:
    def test_attention_module_split_matches_packed(self):
        """Self- and cross-attention: the split q/k/v layout on converted
        params reproduces the packed in_proj output."""
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, 9, 32)).astype(np.float32))
        kv = jnp.asarray(rng.standard_normal((2, 13, 32)).astype(np.float32))
        packed = TorchMultiheadAttention(32, 4)
        split = TorchMultiheadAttention(32, 4, split_qkv=True)
        p = packed.init(jax.random.PRNGKey(1), x)
        p_split = split_qkv_params(p, scope="")  # bare module: no scope gate
        for kv_arg in (None, kv):
            y0 = packed.apply(p, x, kv=kv_arg)
            y1 = split.apply(p_split, x, kv=kv_arg)
            np.testing.assert_allclose(
                np.asarray(y0), np.asarray(y1), atol=1e-6)

    def test_mdm_split_matches_packed(self):
        """Whole-model forward: MDM(split_qkv=True) on converted params
        equals the packed-layout forward."""
        rng = np.random.default_rng(1)
        x, t, cond = _inputs(rng)
        m_packed = MDM(_mdm_cfg(False))
        m_split = MDM(_mdm_cfg(True))
        params = m_packed.init(jax.random.PRNGKey(0), x, t, cond)
        params_split = split_qkv_params(params)
        y0 = m_packed.apply(params, x, t, cond)
        y1 = m_split.apply(params_split, x, t, cond)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=2e-5)

    def test_merge_round_trips(self):
        rng = np.random.default_rng(2)
        x, t, cond = _inputs(rng)
        params = MDM(_mdm_cfg(False)).init(jax.random.PRNGKey(0), x, t, cond)
        back = merge_qkv_params(split_qkv_params(params))
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            params, back)

    def test_init_layout_matches_converted_structure(self):
        """Initializing the model with split_qkv=True yields the same tree
        structure as converting a packed init — checkpoints are exchangeable
        both ways."""
        rng = np.random.default_rng(3)
        x, t, cond = _inputs(rng)
        p_native = MDM(_mdm_cfg(True)).init(jax.random.PRNGKey(0), x, t, cond)
        p_conv = split_qkv_params(
            MDM(_mdm_cfg(False)).init(jax.random.PRNGKey(0), x, t, cond))
        assert (jax.tree_util.tree_structure(p_native)
                == jax.tree_util.tree_structure(p_conv))

    def test_specs_head_aligned(self):
        """Split q/k/v kernels column-shard (head-aligned) and their biases
        live on the sharded dim; out_proj stays row-parallel."""
        rng = np.random.default_rng(4)
        x, t, cond = _inputs(rng)
        params = MDM(_mdm_cfg(True)).init(jax.random.PRNGKey(0), x, t, cond)
        specs = mdm_param_specs(params["params"])
        flat = {
            "/".join(str(getattr(p, "key", "")) for p in path): s
            for path, s in jax.tree_util.tree_flatten_with_path(specs)[0]
        }
        qk = [k for k in flat if "q_proj" in k and k.endswith("kernel")]
        qb = [k for k in flat if "q_proj" in k and k.endswith("bias")]
        ok = [k for k in flat if "out_proj" in k and k.endswith("kernel")]
        assert qk and qb and ok
        for k in qk:
            assert flat[k] == P(None, "model")
        for k in qb:
            assert flat[k] == P("model")
        for k in ok:
            assert flat[k] == P("model", None)


def _make_batch(rng):
    return {
        "motion": rng.standard_normal((8, T, NJ)).astype(np.float32),
        "style": rng.standard_normal((8, 6)).astype(np.float32),
        "wavlm": rng.standard_normal((8, T, 1024)).astype(np.float32),
    }


def _data_iter(n):
    rng = np.random.default_rng(7)
    for _ in range(n):
        yield _make_batch(rng)


class TestLoopSplitQKVTP:
    def test_tp_split_qkv_matches_single_device(self):
        """TrainLoop(tensor_parallel=2) over a split-qkv model reproduces
        single-device numerics — the head-aligned layout is a pure
        sharding change."""
        sched = D.Schedule.create(D.named_beta_schedule("cosine", 20))
        cfg8 = MDMConfig(
            njoints=NJ, latent_dim=128, ff_size=64, num_layers=1,
            window_size=11, n_seed=4, cond_mask_prob=0.1, split_qkv=True,
        )
        model = MDM(cfg8)
        rng = np.random.default_rng(8)
        batch = _make_batch(rng)
        x = jnp.zeros((8, NJ, 1, T))
        cond = {
            "seed": x[..., :4],
            "style": jnp.asarray(batch["style"]),
            "audio": jnp.asarray(batch["wavlm"]),
            "mask_local": jnp.ones((8, T), bool),
        }
        params = model.init(
            jax.random.PRNGKey(0), x, jnp.zeros((8,), jnp.int32), cond)

        def apply(params, x, t, cond, train=False, rngs=None, uncond=None):
            return model.apply(
                params, x, t, cond, train=train, rngs=rngs, uncond=uncond)

        copy = lambda t: jax.tree.map(jnp.array, t)  # noqa: E731
        tcfg = TrainConfig(lr=1e-3)
        loop_tp = TrainLoop(
            apply, sched, copy(params), _data_iter(3),
            train_cfg=tcfg,
            loop_cfg=LoopConfig(num_steps=3, log_interval=100, save_interval=0,
                                use_mesh=True, tensor_parallel=2),
            cond_builder=make_zeggs_cond_builder(4),
            seed=5,
        )
        state_tp = loop_tp.run()
        loop_1 = TrainLoop(
            apply, sched, copy(params), _data_iter(3),
            train_cfg=tcfg,
            loop_cfg=LoopConfig(num_steps=3, log_interval=100, save_interval=0),
            cond_builder=make_zeggs_cond_builder(4),
            seed=5,
        )
        state_1 = loop_1.run()
        l_tp = jax.tree_util.tree_leaves(state_tp.params)[0]
        l_1 = jax.tree_util.tree_leaves(state_1.params)[0]
        np.testing.assert_allclose(np.asarray(l_tp), np.asarray(l_1),
                                   atol=2e-5)

    def test_cross_layout_resume(self, tmp_path):
        """A packed-layout run resumes from a split-qkv checkpoint (and
        vice versa): TrainLoop converts the layout on restore, so --tp
        runs and plain runs share checkpoint directories."""
        sched = D.Schedule.create(D.named_beta_schedule("cosine", 20))

        def make(split):
            model = MDM(_mdm_cfg(split))
            rng = np.random.default_rng(9)
            batch = _make_batch(rng)
            x = jnp.zeros((8, NJ, 1, T))
            cond = {
                "seed": x[..., :4],
                "style": jnp.asarray(batch["style"]),
                "audio": jnp.asarray(batch["wavlm"]),
                "mask_local": jnp.ones((8, T), bool),
            }
            params = model.init(
                jax.random.PRNGKey(0), x, jnp.zeros((8,), jnp.int32), cond)

            def apply(params, x, t, cond, train=False, rngs=None,
                      uncond=None):
                return model.apply(params, x, t, cond, train=train,
                                   rngs=rngs, uncond=uncond)

            return params, apply

        ckdir = str(tmp_path / "ck")
        p_s, a_s = make(True)
        loop = TrainLoop(
            a_s, sched, p_s, _data_iter(2),
            train_cfg=TrainConfig(lr=1e-3, ema_rate=0.99),
            loop_cfg=LoopConfig(num_steps=2, log_interval=100,
                                save_interval=0, checkpoint_dir=ckdir),
            cond_builder=make_zeggs_cond_builder(4), seed=5,
        )
        loop.run()

        p_p, a_p = make(False)
        loop2 = TrainLoop(
            a_p, sched, p_p, _data_iter(2),
            train_cfg=TrainConfig(lr=1e-3, ema_rate=0.99),
            loop_cfg=LoopConfig(num_steps=4, log_interval=100,
                                save_interval=0, checkpoint_dir=ckdir),
            cond_builder=make_zeggs_cond_builder(4), seed=5,
        )
        assert loop2.resume_step == 2
        st = str(jax.tree_util.tree_structure(loop2.state.params))
        assert "in_proj" in st and "q_proj" not in st
        state = loop2.run()
        assert int(np.asarray(state.step)) == 4
