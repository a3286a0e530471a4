"""Training stack tests: step semantics, loop, checkpoint resume, mesh sharding."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import requires_reference

from diffusestylegesture_tpu import diffusion as D
from diffusestylegesture_tpu.models.mdm import MDM, MDMConfig
from diffusestylegesture_tpu.parallel import make_mesh, shard_batch, replicate
from diffusestylegesture_tpu.train import (
    LoopConfig,
    TrainConfig,
    TrainLoop,
    create_train_state,
    make_train_step,
)
from diffusestylegesture_tpu.train.state import make_zeggs_cond_builder

B, NJ, T = 8, 16, 22
SCHED = D.Schedule.create(D.named_beta_schedule("cosine", 20))


def make_model_and_params():
    cfg = MDMConfig(
        njoints=NJ, latent_dim=128, ff_size=64, num_layers=1, window_size=11,
        n_seed=4, cond_mask_prob=0.1,
    )
    model = MDM(cfg)
    rng = np.random.default_rng(0)
    batch = make_batch(rng)
    x = jnp.zeros((B, NJ, 1, T))
    cond = {
        "seed": x[..., :4],
        "style": jnp.asarray(batch["style"]),
        "audio": jnp.asarray(batch["wavlm"]),
        "mask_local": jnp.ones((B, T), bool),
    }
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((B,), jnp.int32), cond)

    def apply(params, x, t, cond, train=False, rngs=None, uncond=None):
        return model.apply(params, x, t, cond, train=train, rngs=rngs, uncond=uncond)

    return model, params, apply


def make_batch(rng):
    return {
        "motion": rng.standard_normal((B, T, NJ)).astype(np.float32),
        "style": rng.standard_normal((B, 6)).astype(np.float32),
        "wavlm": rng.standard_normal((B, T, 1024)).astype(np.float32),
    }


def data_iter(n):
    rng = np.random.default_rng(1)
    for _ in range(n):
        yield make_batch(rng)


class TestTrainStep:
    def test_loss_decreases_params_change(self):
        _, params, apply = make_model_and_params()
        cfg = TrainConfig(lr=1e-3)
        step_fn = jax.jit(make_train_step(apply, SCHED, cfg, make_zeggs_cond_builder(4)))
        state = create_train_state(params, cfg, SCHED.num_timesteps)
        rng = np.random.default_rng(2)
        batch = make_batch(rng)
        losses = []
        for i in range(5):
            state, metrics = step_fn(state, batch, jax.random.PRNGKey(i))
            losses.append(float(metrics["loss"]))
        assert int(state.step) == 5
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]  # same batch → should overfit quickly
        assert float(metrics["grad_norm"]) > 0

    def test_ema(self):
        _, params, apply = make_model_and_params()
        cfg = TrainConfig(lr=1e-3, ema_rate=0.9)
        step_fn = jax.jit(make_train_step(apply, SCHED, cfg, make_zeggs_cond_builder(4)))
        state = create_train_state(params, cfg, SCHED.num_timesteps)
        batch = make_batch(np.random.default_rng(3))
        state, _ = step_fn(state, batch, jax.random.PRNGKey(0))
        # ema must differ from both the init and the new params
        leaf = lambda t: jax.tree_util.tree_leaves(t)[0]  # noqa: E731
        assert not np.allclose(np.asarray(leaf(state.ema_params)), np.asarray(leaf(state.params)))

    def test_lr_anneal(self):
        from diffusestylegesture_tpu.train.state import make_optimizer

        cfg = TrainConfig(lr=1e-2, lr_anneal_steps=10)
        tx = make_optimizer(cfg)
        params = {"w": jnp.ones((3,))}
        opt_state = tx.init(params)
        g = {"w": jnp.ones((3,))}
        u1, opt_state = tx.update(g, opt_state, params)
        # after many steps lr → 0
        for _ in range(12):
            u, opt_state = tx.update(g, opt_state, params)
        assert np.abs(np.asarray(u["w"])).max() < np.abs(np.asarray(u1["w"])).max() + 1e-8


class TestMesh:
    def test_eight_virtual_devices(self):
        assert jax.device_count() == 8

    def test_sharded_step_matches_single(self):
        _, params, apply = make_model_and_params()
        cfg = TrainConfig(lr=1e-3)
        step_fn = jax.jit(make_train_step(apply, SCHED, cfg, make_zeggs_cond_builder(4)))
        batch = make_batch(np.random.default_rng(4))
        rng = jax.random.PRNGKey(9)

        state1 = create_train_state(params, cfg, SCHED.num_timesteps)
        state1, m1 = step_fn(state1, batch, rng)

        mesh = make_mesh()
        state2 = create_train_state(params, cfg, SCHED.num_timesteps)
        state2 = replicate(mesh, state2)
        sbatch = shard_batch(mesh, batch)
        state2, m2 = step_fn(state2, sbatch, rng)
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
        l1 = jax.tree_util.tree_leaves(state1.params)[0]
        l2 = jax.tree_util.tree_leaves(state2.params)[0]
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)


class TestLoopAndCheckpoint:
    def test_loop_runs_and_resumes(self, tmp_path):
        _, params, apply = make_model_and_params()
        ckpt_dir = str(tmp_path / "ckpts")
        loop = TrainLoop(
            apply, SCHED, params, data_iter(6),
            train_cfg=TrainConfig(lr=1e-3),
            loop_cfg=LoopConfig(num_steps=5, log_interval=100, save_interval=0,
                                checkpoint_dir=ckpt_dir),
            cond_builder=make_zeggs_cond_builder(4),
        )
        state = loop.run()
        assert int(np.asarray(state.step)) == 5

        loop2 = TrainLoop(
            apply, SCHED, params, data_iter(6),
            train_cfg=TrainConfig(lr=1e-3),
            loop_cfg=LoopConfig(num_steps=8, log_interval=100, save_interval=0,
                                checkpoint_dir=ckpt_dir),
            cond_builder=make_zeggs_cond_builder(4),
        )
        assert loop2.resume_step == 5
        state2 = loop2.run()
        assert int(np.asarray(state2.step)) == 8

    def test_relaunch_after_completion_is_noop(self, tmp_path):
        """Restarting a COMPLETED run must not crash on the final re-save
        (orbax raises StepAlreadyExistsError without the guard)."""
        _, params, apply = make_model_and_params()
        ckpt_dir = str(tmp_path / "ckpts")
        for _ in range(2):  # second pass resumes at num_steps and exits
            loop = TrainLoop(
                apply, SCHED, params, data_iter(6),
                train_cfg=TrainConfig(lr=1e-3),
                loop_cfg=LoopConfig(num_steps=4, log_interval=100,
                                    save_interval=0, checkpoint_dir=ckpt_dir),
                cond_builder=make_zeggs_cond_builder(4),
            )
            state = loop.run()
            assert int(np.asarray(state.step)) == 4

    def test_periodic_checkpoint_label_matches_contents(self, tmp_path):
        """A periodic save labeled N holds state.step == N (was N+1)."""
        from diffusestylegesture_tpu.train.checkpoint import CheckpointManager

        _, params, apply = make_model_and_params()
        ckpt_dir = str(tmp_path / "ckpts")
        loop = TrainLoop(
            apply, SCHED, params, data_iter(6),
            train_cfg=TrainConfig(lr=1e-3),
            loop_cfg=LoopConfig(num_steps=5, log_interval=100,
                                save_interval=3, checkpoint_dir=ckpt_dir),
            cond_builder=make_zeggs_cond_builder(4),
        )
        loop.run()
        mgr = CheckpointManager(ckpt_dir)
        assert mgr.latest_step() == 5
        restored = mgr.restore(loop.state, step=3)
        assert int(np.asarray(restored.step)) == 3

    def test_fsdp_without_mesh_raises(self):
        _, params, apply = make_model_and_params()
        with pytest.raises(ValueError, match="fsdp"):
            TrainLoop(
                apply, SCHED, params, data_iter(2),
                train_cfg=TrainConfig(lr=1e-3),
                loop_cfg=LoopConfig(num_steps=2, fsdp=True),
                cond_builder=make_zeggs_cond_builder(4),
            )

    def test_sigterm_saves_checkpoint_and_resumes(self, tmp_path):
        """Preemption safety (LoopConfig.save_on_preemption): a SIGTERM
        mid-run makes the loop checkpoint the current step and return
        cleanly, and a fresh loop resumes from exactly that step."""
        import signal

        _, params, apply = make_model_and_params()
        ckpt_dir = str(tmp_path / "ckpts")

        def preempting_iter():
            rng = np.random.default_rng(1)
            for i in range(50):
                if i == 3:  # delivered in the main thread before yield 3
                    os.kill(os.getpid(), signal.SIGTERM)
                yield make_batch(rng)

        loop = TrainLoop(
            apply, SCHED, params, preempting_iter(),
            train_cfg=TrainConfig(lr=1e-3),
            loop_cfg=LoopConfig(num_steps=50, log_interval=100,
                                save_interval=0, checkpoint_dir=ckpt_dir),
            cond_builder=make_zeggs_cond_builder(4),
        )
        state = loop.run()
        stopped = int(np.asarray(state.step))
        assert 0 < stopped < 50  # stopped early, after a whole step
        # the previous handler is restored after run()
        assert signal.getsignal(signal.SIGTERM) == signal.SIG_DFL

        loop2 = TrainLoop(
            apply, SCHED, params, data_iter(50),
            train_cfg=TrainConfig(lr=1e-3),
            loop_cfg=LoopConfig(num_steps=stopped + 2, log_interval=100,
                                save_interval=0, checkpoint_dir=ckpt_dir),
            cond_builder=make_zeggs_cond_builder(4),
        )
        assert loop2.resume_step == stopped
        state2 = loop2.run()
        assert int(np.asarray(state2.step)) == stopped + 2

    def test_smoke_env(self, tmp_path):
        _, params, apply = make_model_and_params()
        os.environ["DIFFUSION_TRAINING_TEST"] = "1"
        try:
            loop = TrainLoop(
                apply, SCHED, params, data_iter(10),
                train_cfg=TrainConfig(lr=1e-3),
                loop_cfg=LoopConfig(num_steps=100, log_interval=100, save_interval=2,
                                    checkpoint_dir=str(tmp_path / "c")),
                cond_builder=make_zeggs_cond_builder(4),
            )
            state = loop.run()
            assert int(np.asarray(state.step)) <= 3
        finally:
            del os.environ["DIFFUSION_TRAINING_TEST"]


class TestNonFiniteSkip:
    def test_nan_batch_skipped(self):
        _, params, apply = make_model_and_params()
        cfg = TrainConfig(lr=1e-3, skip_nonfinite_updates=3)
        step_fn = jax.jit(make_train_step(apply, SCHED, cfg, make_zeggs_cond_builder(4)))
        state = create_train_state(params, cfg, SCHED.num_timesteps)
        bad = make_batch(np.random.default_rng(7))
        bad["motion"][:] = np.nan
        leaf = lambda t: np.asarray(jax.tree_util.tree_leaves(t)[0])  # noqa: E731
        before = leaf(state.params).copy()
        state, metrics = step_fn(state, bad, jax.random.PRNGKey(0))
        after = leaf(state.params)
        # params unchanged on a NaN batch
        np.testing.assert_array_equal(before, after)
        # and a good batch still updates
        good = make_batch(np.random.default_rng(8))
        state, _ = step_fn(state, good, jax.random.PRNGKey(1))
        assert np.abs(leaf(state.params) - before).max() > 0


class TestTensorParallel:
    def test_tp_matches_dp(self):
        from diffusestylegesture_tpu.parallel import (
            make_mesh, mdm_param_specs, replicate, shard_batch, shard_params,
        )

        _, params, apply = make_model_and_params()
        cfg = TrainConfig(lr=1e-3)
        step_fn = jax.jit(make_train_step(apply, SCHED, cfg, make_zeggs_cond_builder(4)))
        batch = make_batch(np.random.default_rng(11))
        rng = jax.random.PRNGKey(13)

        s1 = create_train_state(params, cfg, SCHED.num_timesteps)
        s1, m1 = step_fn(s1, batch, rng)

        mesh = make_mesh(axes=("data", "model"), shape=(4, 2))
        with mesh:
            s2 = replicate(mesh, create_train_state(params, cfg, SCHED.num_timesteps))
            specs = mdm_param_specs(s2.params["params"])
            s2 = s2.replace(
                params={"params": shard_params(mesh, s2.params["params"], specs)}
            )
            s2, m2 = step_fn(s2, shard_batch(mesh, batch), rng)
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
        l1 = jax.tree_util.tree_leaves(s1.params)[0]
        l2 = jax.tree_util.tree_leaves(s2.params)[0]
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)


class TestLossAwareSampler:
    """Integration of LossSecondMomentResampler into the train step
    (ref `main/diffusion/resample.py:124-154` + `training_loop.py:256-259`)."""

    def test_history_fills_and_loss_finite(self):
        _, params, apply = make_model_and_params()
        cfg = TrainConfig(lr=1e-3, schedule_sampler="loss-second-moment")
        step_fn = jax.jit(make_train_step(apply, SCHED, cfg, make_zeggs_cond_builder(4)))
        state = create_train_state(params, cfg, SCHED.num_timesteps)
        assert state.loss_aware is not None
        batch = make_batch(np.random.default_rng(31))
        for i in range(4):
            state, metrics = step_fn(state, batch, jax.random.PRNGKey(i))
            assert np.isfinite(float(metrics["loss"]))
        # 4 steps × B=8 examples inserted into the ring history
        assert int(np.asarray(state.loss_aware.counts).sum()) == 4 * B
        assert np.asarray(state.loss_aware.history).max() > 0

    def test_warmed_weights_nonuniform(self):
        """With a warmed history the train step draws non-uniform t and
        weights them by 1/(T·p_t) (ref `resample.py:42-58,137-144`)."""
        from diffusestylegesture_tpu.diffusion import resample

        nt = SCHED.num_timesteps
        state = resample.LossAwareState.create(nt)
        # deterministically warm every timestep: loss grows with t
        for k in range(10):
            ts = jnp.arange(nt)
            losses = (ts + 1).astype(jnp.float32) * (1.0 + 0.01 * k)
            state = resample.update_with_losses(state, ts, losses)
        assert (np.asarray(state.counts) == 10).all()
        w = np.asarray(resample.loss_aware_weights(state))
        np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-5)
        assert w[-1] > w[0]  # higher loss ⇒ sampled more often
        t, weights = resample.loss_aware_sample_t(
            jax.random.PRNGKey(0), state, 4096
        )
        # large-t draws dominate, and importance weights are inverted
        assert np.asarray(t).mean() > (nt - 1) / 2
        hi, lo = np.asarray(t).max(), np.asarray(t).min()
        wmap = {int(tt): float(ww) for tt, ww in zip(np.asarray(t), np.asarray(weights))}
        assert wmap[int(hi)] < wmap[int(lo)]

    def test_update_with_losses_axis_name_collective(self):
        """The distributed update path (ref `update_with_local_losses`
        all_gather, `resample.py:83-104`): each device sees its local
        (t, loss) pairs, gathers across the axis, and every device's
        resulting history equals the global single-device update."""
        from diffusestylegesture_tpu.diffusion import resample

        nd = jax.device_count()
        nt = 12
        rng = np.random.default_rng(44)
        ts = rng.integers(0, nt, 16).astype(np.int32)
        losses = rng.random(16).astype(np.float32)

        state0 = resample.LossAwareState.create(nt, history_per_term=4)

        def per_device(state, ts, losses):
            return resample.update_with_losses(state, ts, losses, axis_name="data")

        out = jax.pmap(per_device, axis_name="data", in_axes=(None, 0, 0))(
            state0, jnp.asarray(ts.reshape(nd, -1)), jnp.asarray(losses.reshape(nd, -1))
        )
        ref = resample.update_with_losses(state0, jnp.asarray(ts), jnp.asarray(losses))
        for d in range(nd):
            np.testing.assert_array_equal(
                np.asarray(out.counts[d]), np.asarray(ref.counts)
            )
            # same multiset of losses per timestep row (insertion order may
            # differ across gather layouts)
            np.testing.assert_allclose(
                np.sort(np.asarray(out.history[d]), axis=1),
                np.sort(np.asarray(ref.history), axis=1),
                atol=1e-6,
            )

    def test_loss_aware_on_mesh(self):
        _, params, apply = make_model_and_params()
        cfg = TrainConfig(lr=1e-3, schedule_sampler="loss-second-moment")
        step_fn = jax.jit(make_train_step(apply, SCHED, cfg, make_zeggs_cond_builder(4)))
        batch = make_batch(np.random.default_rng(33))
        rng = jax.random.PRNGKey(5)

        s1 = create_train_state(params, cfg, SCHED.num_timesteps)
        s1, m1 = step_fn(s1, batch, rng)

        mesh = make_mesh()
        s2 = replicate(mesh, create_train_state(params, cfg, SCHED.num_timesteps))
        s2, m2 = step_fn(s2, shard_batch(mesh, batch), rng)
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
        np.testing.assert_array_equal(
            np.asarray(s1.loss_aware.counts), np.asarray(s2.loss_aware.counts)
        )


class TestLoopTensorParallel:
    def test_loop_with_tp_matches_single_device(self):
        """TrainLoop(use_mesh, tensor_parallel=2) reproduces the
        single-device step numerics (DP×TP is a pure layout change)."""
        _, params, apply = make_model_and_params()
        cfg = TrainConfig(lr=1e-3)
        # the loop's jitted step donates its state — give each loop its own
        # copy of the initial params
        copy = lambda t: jax.tree.map(jnp.array, t)  # noqa: E731

        loop = TrainLoop(
            apply, SCHED, copy(params), data_iter(3),
            train_cfg=cfg,
            loop_cfg=LoopConfig(num_steps=3, log_interval=100, save_interval=0,
                                use_mesh=True, tensor_parallel=2),
            cond_builder=make_zeggs_cond_builder(4),
            seed=5,
        )
        state_tp = loop.run()
        assert int(np.asarray(state_tp.step)) == 3

        loop1 = TrainLoop(
            apply, SCHED, copy(params), data_iter(3),
            train_cfg=cfg,
            loop_cfg=LoopConfig(num_steps=3, log_interval=100, save_interval=0),
            cond_builder=make_zeggs_cond_builder(4),
            seed=5,
        )
        state_1 = loop1.run()
        l_tp = jax.tree_util.tree_leaves(state_tp.params)[0]
        l_1 = jax.tree_util.tree_leaves(state_1.params)[0]
        np.testing.assert_allclose(np.asarray(l_tp), np.asarray(l_1), atol=2e-5)

    def test_bad_tp_degree_raises(self):
        _, params, apply = make_model_and_params()
        with pytest.raises(ValueError):
            TrainLoop(
                apply, SCHED, params, data_iter(1),
                loop_cfg=LoopConfig(use_mesh=True, tensor_parallel=3),
                cond_builder=make_zeggs_cond_builder(4),
            )


class TestLoopDeviceCache:
    def test_loop_runs_with_device_cache_and_resumes(self, tmp_path):
        from diffusestylegesture_tpu.data.device_cache import DeviceWindowCache

        _, params, apply = make_model_and_params()
        rng = np.random.default_rng(41)
        cache = DeviceWindowCache({
            "motion": rng.standard_normal((24, T, NJ)).astype(np.float32),
            "style": rng.standard_normal((24, 6)).astype(np.float32),
            "wavlm": rng.standard_normal((24, T, 1024)).astype(np.float32),
        })
        ckpt_dir = str(tmp_path / "c")
        copy = lambda t: jax.tree.map(jnp.array, t)  # noqa: E731 (donated step)
        loop = TrainLoop(
            apply, SCHED, copy(params), data=None,
            train_cfg=TrainConfig(lr=1e-3),
            loop_cfg=LoopConfig(num_steps=4, log_interval=100, save_interval=0,
                                checkpoint_dir=ckpt_dir),
            cond_builder=make_zeggs_cond_builder(4),
            device_cache=cache, batch_size=B,
        )
        state = loop.run()
        assert int(np.asarray(state.step)) == 4
        # resume continues from the saved step
        loop2 = TrainLoop(
            apply, SCHED, copy(params), data=None,
            train_cfg=TrainConfig(lr=1e-3),
            loop_cfg=LoopConfig(num_steps=6, log_interval=100, save_interval=0,
                                checkpoint_dir=ckpt_dir),
            cond_builder=make_zeggs_cond_builder(4),
            device_cache=cache, batch_size=B,
        )
        assert loop2.resume_step == 4
        assert int(np.asarray(loop2.run().step)) == 6


class TestDeviceCache:
    def test_device_resident_training(self):
        from diffusestylegesture_tpu.data.device_cache import (
            DeviceWindowCache,
            make_device_data_train_step,
        )

        _, params, apply = make_model_and_params()
        rng = np.random.default_rng(21)
        N = 32
        cache = DeviceWindowCache({
            "motion": rng.standard_normal((N, T, NJ)).astype(np.float32),
            "style": rng.standard_normal((N, 6)).astype(np.float32),
            "wavlm": rng.standard_normal((N, T, 1024)).astype(np.float32),
        })
        cfg = TrainConfig(lr=1e-3)
        step = jax.jit(make_device_data_train_step(
            apply, SCHED, cfg, make_zeggs_cond_builder(4), batch_size=B,
        ))
        state = create_train_state(params, cfg, SCHED.num_timesteps)
        losses = []
        for i in range(3):
            state, m = step(state, jax.random.PRNGKey(i), cache.arrays)
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert int(state.step) == 3
        # the compiled step must NOT embed the dataset as HLO constants
        # (breaks remote-compile transports; r3 regression guard): the
        # lowered text stays small and references the arrays as params
        low = jax.jit(make_device_data_train_step(
            apply, SCHED, cfg, make_zeggs_cond_builder(4), batch_size=B,
        )).lower(state, jax.random.PRNGKey(0), cache.arrays)
        assert len(low.as_text()) < 20_000_000

    def test_beat_twh_clip_crop_sampler(self):
        """from_beat_twh: in-jit random crops match the host loader's
        semantics — contiguous n_poses slices inside each clip's real
        length, style row carried along."""
        from diffusestylegesture_tpu.data.device_cache import DeviceWindowCache

        rng = np.random.default_rng(5)
        n_poses, D, A = 12, 7, 5
        lens = [30, 12, 45]

        class DS:  # minimal SpeechGestureDataset surface
            gesture = [rng.standard_normal((l, D)).astype(np.float32)
                       for l in lens]
            textaudio = [rng.standard_normal((l, A)).astype(np.float32)
                         for l in lens]
            speaker = [np.eye(3, dtype=np.float32)[i] for i in range(3)]

        DS.n_poses = n_poses
        cache = DeviceWindowCache.from_beat_twh(DS())
        batch = jax.jit(cache.sample_fn, static_argnums=(2,))(
            cache.arrays, jax.random.PRNGKey(0), 16)
        assert batch["motion"].shape == (16, n_poses, D)
        assert batch["audio"].shape == (16, n_poses, A)
        assert batch["style"].shape == (16, 3)
        for m, a, s in zip(np.asarray(batch["motion"]),
                           np.asarray(batch["audio"]),
                           np.asarray(batch["style"])):
            ci = int(np.argmax(s))
            g, ta = DS.gesture[ci], DS.textaudio[ci]
            # locate the crop start by matching the first frame
            starts = [t for t in range(len(g) - n_poses + 1)
                      if np.allclose(g[t], m[0])]
            assert starts, "window frame 0 not found in the chosen clip"
            t0 = starts[0]
            np.testing.assert_allclose(g[t0: t0 + n_poses], m, rtol=1e-6)
            np.testing.assert_allclose(ta[t0: t0 + n_poses], a, rtol=1e-6)
            # reference exclusive-high quirk: start < max(1, T - n_poses)
            assert t0 < max(1, len(g) - n_poses)

    def test_beat_twh_rejects_short_clips(self):
        from diffusestylegesture_tpu.data.device_cache import DeviceWindowCache

        class DS:
            n_poses = 50
            gesture = [np.zeros((20, 4), np.float32)]
            textaudio = [np.zeros((20, 3), np.float32)]
            speaker = [np.ones(2, np.float32)]

        with pytest.raises(ValueError, match="n_poses"):
            DeviceWindowCache.from_beat_twh(DS())


@requires_reference
class TestAdamWEquivalence:
    """optax.adamw == torch.optim.AdamW step-for-step at the reference
    hyperparameters (lr 3e-5, wd 0, torch defaults b1/b2/eps): identical
    gradients must yield identical parameter trajectories. Catches lr/eps/
    weight-decay convention drift that gradient parity alone cannot."""

    def test_param_trajectories_match(self):
        import optax
        import torch

        rng = np.random.default_rng(0)
        p0 = rng.standard_normal((7, 5)).astype(np.float32)
        grads = [rng.standard_normal((7, 5)).astype(np.float32) for _ in range(5)]
        lr, wd = 3e-5, 0.0

        tp = torch.nn.Parameter(torch.as_tensor(p0.copy()))
        topt = torch.optim.AdamW([tp], lr=lr, weight_decay=wd)
        for g in grads:
            topt.zero_grad()
            tp.grad = torch.as_tensor(g)
            topt.step()

        tx = optax.adamw(lr, weight_decay=wd)
        params = jnp.asarray(p0)
        state = tx.init(params)
        for g in grads:
            updates, state = tx.update(jnp.asarray(g), state, params)
            params = optax.apply_updates(params, updates)

        np.testing.assert_allclose(
            np.asarray(params), tp.detach().numpy(), atol=2e-7)

    def test_weight_decay_convention_matches(self):
        """AdamW decoupled decay: torch multiplies by lr — so must optax."""
        import optax
        import torch

        p0 = np.full((4,), 2.0, np.float32)
        g = np.zeros((4,), np.float32)
        lr, wd = 1e-2, 0.1

        tp = torch.nn.Parameter(torch.as_tensor(p0.copy()))
        topt = torch.optim.AdamW([tp], lr=lr, weight_decay=wd)
        tp.grad = torch.as_tensor(g)
        topt.step()

        tx = optax.adamw(lr, weight_decay=wd)
        params = jnp.asarray(p0)
        updates, _ = tx.update(jnp.asarray(g), tx.init(params), params)
        params = optax.apply_updates(params, updates)
        np.testing.assert_allclose(np.asarray(params), tp.detach().numpy(),
                                   atol=1e-7)


class TestMixedPrecision:
    """bf16 mixed-precision training (VERDICT r2 item 2): f32 master
    weights + bf16 trunk compute, the TPU-native completion of the
    reference `MixedPrecisionTrainer` (`main/diffusion/fp16_util.py:
    148-232`)."""

    def _setup(self, dtype):
        cfg = MDMConfig(
            njoints=NJ, latent_dim=128, ff_size=64, num_layers=1,
            window_size=11, n_seed=4, cond_mask_prob=0.0, dropout=0.0,
            dtype=dtype,
        )
        model = MDM(cfg)
        rng = np.random.default_rng(0)
        batch = make_batch(rng)
        x = jnp.zeros((B, NJ, 1, T))
        cond = {
            "seed": x[..., :4],
            "style": jnp.asarray(batch["style"]),
            "audio": jnp.asarray(batch["wavlm"]),
            "mask_local": jnp.ones((B, T), bool),
        }
        params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((B,), jnp.int32), cond)

        def apply(params, x, t, cond, train=False, rngs=None, uncond=None):
            return model.apply(params, x, t, cond, train=train, rngs=rngs, uncond=uncond)

        return params, apply

    def test_bf16_step_matches_f32_within_tolerance(self):
        params, apply32 = self._setup(jnp.float32)
        _, apply16 = self._setup(jnp.bfloat16)
        batch = make_batch(np.random.default_rng(2))
        rng = jax.random.PRNGKey(7)

        cfg32 = TrainConfig(lr=1e-3)
        cfg16 = TrainConfig(lr=1e-3, compute_dtype="bfloat16")
        step32 = jax.jit(make_train_step(apply32, SCHED, cfg32, make_zeggs_cond_builder(4)))
        step16 = jax.jit(make_train_step(apply16, SCHED, cfg16, make_zeggs_cond_builder(4)))
        s32 = create_train_state(params, cfg32, SCHED.num_timesteps)
        s16 = create_train_state(params, cfg16, SCHED.num_timesteps)
        s32, m32 = step32(s32, batch, rng)
        s16, m16 = step16(s16, batch, rng)

        # same rng → same t/noise draw; only the trunk precision differs
        l32, l16 = float(m32["loss"]), float(m16["loss"])
        assert np.isfinite(l16)
        assert abs(l16 - l32) / max(abs(l32), 1e-9) < 0.05
        # gradient direction agrees
        g32 = float(m32["grad_norm"]); g16 = float(m16["grad_norm"])
        assert abs(g16 - g32) / max(g32, 1e-9) < 0.2

    def test_master_weights_stay_f32(self):
        params, apply16 = self._setup(jnp.bfloat16)
        cfg = TrainConfig(lr=1e-3, compute_dtype="bfloat16", ema_rate=0.99)
        step = jax.jit(make_train_step(apply16, SCHED, cfg, make_zeggs_cond_builder(4)))
        state = create_train_state(params, cfg, SCHED.num_timesteps)
        state, _ = step(state, make_batch(np.random.default_rng(3)), jax.random.PRNGKey(0))
        for leaf in jax.tree.leaves(state.params):
            assert leaf.dtype == jnp.float32
        for leaf in jax.tree.leaves(state.ema_params):
            assert leaf.dtype == jnp.float32
        # adam moments too
        for leaf in jax.tree.leaves(state.opt_state):
            if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
                assert leaf.dtype == jnp.float32

    def test_bf16_loss_decreases(self):
        params, apply16 = self._setup(jnp.bfloat16)
        cfg = TrainConfig(lr=1e-3, compute_dtype="bfloat16")
        step = jax.jit(make_train_step(apply16, SCHED, cfg, make_zeggs_cond_builder(4)))
        state = create_train_state(params, cfg, SCHED.num_timesteps)
        batch = make_batch(np.random.default_rng(4))
        losses = []
        for i in range(5):
            state, metrics = step(state, batch, jax.random.PRNGKey(i))
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]


class TestLoopLogSinks:
    def test_csv_sink_records_loss_curve(self, tmp_path):
        """LoopConfig.log_dir/log_formats wire the KVLogger CSV sink into
        the product loop (used by the quality harness's loss-curve
        artifact)."""
        import csv

        _, params, apply = make_model_and_params()
        log_dir = str(tmp_path / "logs")
        loop = TrainLoop(
            apply, SCHED, params, data_iter(4),
            train_cfg=TrainConfig(lr=1e-3),
            loop_cfg=LoopConfig(num_steps=3, log_interval=1, save_interval=0,
                                log_dir=log_dir, log_formats=("csv",)),
            cond_builder=make_zeggs_cond_builder(4),
        )
        loop.run()
        with open(f"{log_dir}/progress.csv") as f:
            rows = list(csv.DictReader(f))
        assert len(rows) >= 3
        assert all(float(r["loss"]) > 0 for r in rows if r.get("loss"))
        # steps count COMPLETED steps (1-based) since the checkpoint-label
        # fix — row "1" is the state after the first optimizer update
        assert {int(float(r["step"])) for r in rows} >= {1, 2, 3}


class TestDropoutRngImpl:
    """The train step's dropout stream runs on the TPU hardware RBG by
    default (utils/rng.py: threefry masks alone cost ~88 ms/step at the
    flagship config; full step 81.5→65.8 ms f32 / 68.8→57.2 ms bf16 on
    a v5e). Parity-relevant draws (noise, t, cond_mask) stay threefry."""

    def test_rbg_key_wraps_raw_and_typed(self):
        from diffusestylegesture_tpu.utils.rng import rbg_key

        raw = jax.random.PRNGKey(3)  # uint32[2] raw key
        typed = jax.random.key(3)    # typed threefry key
        for k in (raw, typed):
            rk = rbg_key(k)
            assert jnp.issubdtype(rk.dtype, jax.dtypes.prng_key)
            # usable: split/fold/bernoulli under jit
            mask = jax.jit(lambda kk: jax.random.bernoulli(
                jax.random.fold_in(kk, 1), 0.5, (16,)))(rk)
            assert mask.shape == (16,)

    def test_rbg_key_same_entropy_same_masks(self):
        from diffusestylegesture_tpu.utils.rng import rbg_key

        a = rbg_key(jax.random.PRNGKey(11))
        b = rbg_key(jax.random.PRNGKey(11))
        c = rbg_key(jax.random.PRNGKey(12))
        ma = jax.random.bernoulli(a, 0.5, (256,))
        mb = jax.random.bernoulli(b, 0.5, (256,))
        mc = jax.random.bernoulli(c, 0.5, (256,))
        assert bool(jnp.all(ma == mb))
        assert not bool(jnp.all(ma == mc))

    def test_step_trains_under_both_impls(self):
        _, params, apply = make_model_and_params()
        batch = make_batch(np.random.default_rng(9))
        for impl in ("rbg", "threefry"):
            cfg = TrainConfig(lr=1e-3, dropout_rng_impl=impl)
            step = jax.jit(make_train_step(apply, SCHED, cfg,
                                           make_zeggs_cond_builder(4)))
            state = create_train_state(
                jax.tree.map(jnp.copy, params), cfg, SCHED.num_timesteps)
            losses = []
            for i in range(4):
                state, m = step(state, batch, jax.random.PRNGKey(i))
                losses.append(float(m["loss"]))
            assert np.isfinite(losses).all(), impl
            assert losses[-1] < losses[0], impl
