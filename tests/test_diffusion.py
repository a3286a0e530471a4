"""Parity and behavior tests for the diffusion core."""
import numpy as np
import pytest

from conftest import requires_reference

import jax
import jax.numpy as jnp

from diffusestylegesture_tpu import diffusion as D
from diffusestylegesture_tpu.diffusion import gaussian as G

SHAPE = (2, 6, 1, 8)  # (bs, njoints, nfeats, nframes)


def toy_model_fn(x, t):
    """Deterministic 'denoiser': shrink + timestep-dependent shift."""
    tt = t.astype(jnp.float32).reshape((-1,) + (1,) * (x.ndim - 1))
    return 0.9 * x - 0.01 * tt * jnp.sign(x)


class TestSchedule:
    def test_cosine_values(self):
        betas = D.named_beta_schedule("cosine", 1000)
        assert betas.shape == (1000,)
        assert betas.max() <= 0.999 and betas.min() > 0
        s = D.Schedule.create(betas)
        assert s.num_timesteps == 1000
        np.testing.assert_allclose(
            np.asarray(s.alphas_cumprod), np.cumprod(1 - betas), rtol=1e-5
        )

    def test_respace_identity(self):
        betas = D.named_beta_schedule("cosine", 100)
        s = D.spaced_schedule(betas, D.space_timesteps(100, [100]))
        np.testing.assert_allclose(np.asarray(s.betas), betas, rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(s.timestep_map), np.arange(100))

    def test_respace_ddim(self):
        betas = D.named_beta_schedule("cosine", 100)
        steps = D.space_timesteps(100, "ddim25")
        s = D.spaced_schedule(betas, steps)
        assert s.num_timesteps == 25


class TestLoops:
    def setup_method(self):
        self.sched = D.Schedule.create(D.named_beta_schedule("cosine", 50))

    def test_p_sample_loop_deterministic(self):
        key = jax.random.PRNGKey(0)
        a = D.p_sample_loop(self.sched, toy_model_fn, SHAPE, key)
        b = D.p_sample_loop(self.sched, toy_model_fn, SHAPE, key)
        assert a.shape == SHAPE
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        c = D.p_sample_loop(self.sched, toy_model_fn, SHAPE, jax.random.PRNGKey(1))
        assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-4

    def test_loops_jit(self):
        import functools

        f = jax.jit(
            functools.partial(
                D.p_sample_loop, model_fn=toy_model_fn, shape=SHAPE, cfg=D.SamplerConfig()
            )
        )
        out = f(self.sched, key=jax.random.PRNGKey(2))
        assert out.shape == SHAPE

    def test_ddim_and_plms_run(self):
        key = jax.random.PRNGKey(3)
        d = D.ddim_sample_loop(self.sched, toy_model_fn, SHAPE, key)
        p = D.plms_sample_loop(self.sched, toy_model_fn, SHAPE, key)
        assert d.shape == SHAPE and p.shape == SHAPE
        assert np.isfinite(np.asarray(d)).all() and np.isfinite(np.asarray(p)).all()

    def test_ddim_reverse_roundtrip(self):
        """Encode x0 → x_T with the reverse ODE, decode back with DDIM
        eta=0: for a contractive toy denoiser the roundtrip returns close
        to the original (the ODE is the same path in both directions)."""
        rng = np.random.default_rng(4)
        x0 = jnp.asarray(rng.standard_normal(SHAPE).astype(np.float32) * 0.3)
        xT = D.ddim_reverse_sample_loop(self.sched, toy_model_fn, x0)
        assert np.isfinite(np.asarray(xT)).all()
        back = D.ddim_sample_loop(
            self.sched, toy_model_fn, SHAPE, jax.random.PRNGKey(0),
            noise=xT,
        )
        np.testing.assert_allclose(np.asarray(back), np.asarray(x0), atol=0.08)
        # and the encoding is non-trivial
        assert np.abs(np.asarray(xT) - np.asarray(x0)).max() > 0.05

    def test_cfg_combine(self):
        rng = np.random.default_rng(0)
        c = rng.standard_normal((2, 3)).astype(np.float32)
        u = rng.standard_normal((2, 3)).astype(np.float32)
        out = np.asarray(D.cfg_combine(c, u, 2.5))
        np.testing.assert_allclose(out, u + 2.5 * (c - u), atol=1e-6)

    def test_make_cfg_model_fn_both_conventions(self):
        """The ONE shared doubled-batch CFG wrapper used by every engine:
        bare `apply(x, t, uncond)` and engine `apply(params, x, t, cond,
        uncond=)` conventions both produce cfg_combine semantics."""
        B = 2
        x = jnp.ones((B, 3))
        t = jnp.zeros((B,), jnp.int32)

        def bare_apply(xx, tt, uncond):
            return jnp.where(uncond[:, None], xx * 0.0, xx)

        out = D.make_cfg_model_fn(bare_apply, 2.0, B)(x, t)
        # cond=x, uncond=0 → 0 + 2·(x − 0) = 2x
        np.testing.assert_allclose(np.asarray(out), 2.0 * np.asarray(x))

        def eng_apply(params, xx, tt, cond, uncond=None):
            base = xx + cond["bias"]
            return jnp.where(uncond[:, None], base * 0.0, base)

        out2 = D.make_cfg_model_fn(
            eng_apply, 0.5, B, params=None,
            cond={"bias": jnp.ones((B, 3))})(x, t)
        # cond=x+1, uncond=0 → 0.5·(x+1)
        np.testing.assert_allclose(
            np.asarray(out2), 0.5 * (np.asarray(x) + 1.0))


class TestLossAware:
    def test_update_and_weights(self):
        st = D.resample.LossAwareState.create(10, history_per_term=3)
        key = jax.random.PRNGKey(0)
        for i in range(5):
            ts = jnp.array([i % 10, (i + 3) % 10])
            losses = jnp.array([1.0 + i, 2.0 + i])
            st = D.resample.update_with_losses(st, ts, losses)
        w = np.asarray(D.resample.loss_aware_weights(st))
        np.testing.assert_allclose(w.sum(), 1.0, atol=1e-5)
        t, wt = D.resample.loss_aware_sample_t(key, st, 4)
        assert t.shape == (4,) and wt.shape == (4,)

    def test_nonfinite_losses_never_poison_history(self):
        """One NaN loss must not enter the ring — it would make every
        importance weight NaN permanently (the optimizer's NaN-skip only
        protects params, not this state)."""
        st = D.resample.LossAwareState.create(4, history_per_term=2)
        for i in range(6):  # warm up every term
            st = D.resample.update_with_losses(
                st, jnp.array([i % 4, (i + 1) % 4]), jnp.array([1.0, 2.0]))
        st = D.resample.update_with_losses(
            st, jnp.array([0, 1]), jnp.array([float("nan"), float("inf")]))
        assert np.isfinite(np.asarray(st.history)).all()
        w = np.asarray(D.resample.loss_aware_weights(st))
        assert np.isfinite(w).all()
        np.testing.assert_allclose(w.sum(), 1.0, atol=1e-5)
        # the finite companion losses in a mixed batch still get recorded
        st2 = D.resample.update_with_losses(
            st, jnp.array([2, 3]), jnp.array([9.0, float("nan")]))
        assert np.isfinite(np.asarray(st2.history)).all()
        assert (np.asarray(st2.history) == 9.0).any()


@requires_reference
class TestReferenceParity:
    @classmethod
    def setup_class(cls):
        from ref_compat import import_ref_diffusion

        cls.gd, cls.respace = import_ref_diffusion()
        cls.T = 50
        cls.betas = cls.gd.get_named_beta_schedule("cosine", cls.T)
        cls.ref = cls.gd.GaussianDiffusion(
            betas=cls.betas,
            model_mean_type=cls.gd.ModelMeanType.START_X,
            model_var_type=cls.gd.ModelVarType.FIXED_SMALL,
            loss_type=cls.gd.LossType.MSE,
        )
        cls.sched = D.Schedule.create(D.named_beta_schedule("cosine", cls.T))

    def test_schedule_tables(self):
        for name in (
            "sqrt_alphas_cumprod",
            "sqrt_one_minus_alphas_cumprod",
            "posterior_variance",
            "posterior_log_variance_clipped",
            "posterior_mean_coef1",
            "posterior_mean_coef2",
        ):
            np.testing.assert_allclose(
                np.asarray(getattr(self.sched, name)),
                getattr(self.ref, name).astype(np.float32),
                rtol=1e-6,
                err_msg=name,
            )

    def test_q_sample_parity(self):
        import torch

        rng = np.random.default_rng(0)
        x0 = rng.standard_normal(SHAPE).astype(np.float32)
        noise = rng.standard_normal(SHAPE).astype(np.float32)
        t = np.array([3, 47])
        ours = np.asarray(D.q_sample(self.sched, jnp.asarray(x0), jnp.asarray(t), jnp.asarray(noise)))
        theirs = self.ref.q_sample(
            torch.as_tensor(x0), torch.as_tensor(t), torch.as_tensor(noise)
        ).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_p_mean_variance_parity(self):
        import torch

        rng = np.random.default_rng(1)
        x = rng.standard_normal(SHAPE).astype(np.float32)
        pred = rng.standard_normal(SHAPE).astype(np.float32)
        t = np.array([5, 30])

        ours = G.p_mean_variance(
            self.sched, jnp.asarray(pred), jnp.asarray(x), jnp.asarray(t),
            mean_type=G.MeanType.START_X, var_type=G.VarType.FIXED_SMALL,
            clip_denoised=False,
        )
        model = lambda xx, tt, **kw: torch.as_tensor(pred)  # noqa: E731
        theirs = self.ref.p_mean_variance(
            model, torch.as_tensor(x), torch.as_tensor(t), clip_denoised=False,
            model_kwargs={"y": {}},
        )
        np.testing.assert_allclose(np.asarray(ours.mean), theirs["mean"].numpy(), atol=1e-5)
        np.testing.assert_allclose(
            np.broadcast_to(np.asarray(ours.log_variance), SHAPE),
            theirs["log_variance"].numpy(),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(ours.pred_xstart), theirs["pred_xstart"].numpy(), atol=1e-5
        )

    def test_ddim_reverse_sample_parity(self):
        import torch

        rng = np.random.default_rng(7)
        x = rng.standard_normal(SHAPE).astype(np.float32)
        pred = (0.8 * x).astype(np.float32)  # fixed x0 prediction
        t = np.array([5, 30])

        def model_fn(xx, tt):
            return jnp.asarray(pred)

        ours = np.asarray(
            D.ddim_reverse_sample(
                self.sched, model_fn, jnp.asarray(x), jnp.asarray(t),
                cfg=D.SamplerConfig(clip_denoised=False),
            )
        )
        model = lambda xx, tt, **kw: torch.as_tensor(pred)  # noqa: E731
        theirs = self.ref.ddim_reverse_sample(
            model, torch.as_tensor(x), torch.as_tensor(t), clip_denoised=False,
            model_kwargs={"y": {}},
        )["sample"].numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_masked_l2_parity(self):
        import torch

        rng = np.random.default_rng(2)
        a = rng.standard_normal(SHAPE).astype(np.float32)
        b = rng.standard_normal(SHAPE).astype(np.float32)
        mask = (rng.uniform(size=(SHAPE[0], 1, 1, SHAPE[3])) > 0.3).astype(np.float32)
        ours = np.asarray(D.masked_l2(jnp.asarray(a), jnp.asarray(b), jnp.asarray(mask)))
        theirs = self.ref.masked_l2(
            torch.as_tensor(a), torch.as_tensor(b), torch.as_tensor(mask)
        ).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_training_losses_parity(self):
        import torch

        rng = np.random.default_rng(3)
        x0 = rng.standard_normal(SHAPE).astype(np.float32)
        noise = rng.standard_normal(SHAPE).astype(np.float32)
        t = np.array([7, 22])
        mask = np.ones((SHAPE[0], 1, 1, SHAPE[3]), np.float32)

        def jmodel(x, tt):
            return 0.5 * x

        terms, _ = G.training_losses(
            self.sched, jmodel, jnp.asarray(x0), jnp.asarray(t), jnp.asarray(noise),
            jnp.asarray(mask),
        )

        class Wrap:
            model = None

            def __call__(self, x, tt, **kw):
                return 0.5 * x

        w = Wrap()
        w.model = w
        theirs = self.ref.training_losses(
            w,
            torch.as_tensor(x0),
            torch.as_tensor(t),
            model_kwargs={"y": {"mask": torch.as_tensor(mask)}},
            noise=torch.as_tensor(noise),
        )
        np.testing.assert_allclose(
            np.asarray(terms["loss"]), theirs["loss"].numpy(), atol=1e-5
        )

    def test_ddim_trajectory_parity(self):
        """DDIM eta=0 is deterministic → full-loop trajectory must match."""
        import torch

        rng = np.random.default_rng(4)
        x_T = rng.standard_normal(SHAPE).astype(np.float32)

        def jmodel(x, t):
            return toy_model_fn(x, t)

        ours = np.asarray(
            D.ddim_sample_loop(
                self.sched, jmodel, SHAPE, jax.random.PRNGKey(0), noise=jnp.asarray(x_T)
            )
        )

        def tmodel(x, t, **kw):
            tt = t.float().reshape((-1,) + (1,) * (x.ndim - 1))
            return 0.9 * x - 0.01 * tt * torch.sign(x)

        img = torch.as_tensor(x_T)
        with torch.no_grad():
            for i in reversed(range(self.T)):
                t = torch.tensor([i] * SHAPE[0])
                out = self.ref.ddim_sample(tmodel, img, t, clip_denoised=False, eta=0.0, model_kwargs={"y": {}})
                img = out["sample"]
        np.testing.assert_allclose(ours, img.numpy(), atol=2e-4)

    def test_plms_trajectory_parity(self):
        import torch

        rng = np.random.default_rng(5)
        x_T = rng.standard_normal(SHAPE).astype(np.float32)

        ours = np.asarray(
            D.plms_sample_loop(
                self.sched,
                toy_model_fn,
                SHAPE,
                jax.random.PRNGKey(0),
                noise=jnp.asarray(x_T),
                cfg=D.SamplerConfig(order=2),
            )
        )

        def tmodel(x, t, **kw):
            tt = t.float().reshape((-1,) + (1,) * (x.ndim - 1))
            return 0.9 * x - 0.01 * tt * torch.sign(x)

        img = torch.as_tensor(x_T)
        old_out = None
        with torch.no_grad():
            for i in reversed(range(self.T)):
                t = torch.tensor([i] * SHAPE[0])
                out = self.ref.plms_sample(
                    tmodel, img, t, clip_denoised=False, order=2, old_out=old_out,
                    model_kwargs={"y": {}},
                )
                img = out["sample"]
                old_out = out
        np.testing.assert_allclose(ours, img.numpy(), atol=2e-4)

    def test_spaced_schedule_parity(self):
        use = self.gd_space(self.T, "ddim10")
        s = D.spaced_schedule(self.betas, use)
        spaced_ref = self.respace.SpacedDiffusion(
            use_timesteps=use,
            betas=self.betas,
            model_mean_type=self.gd.ModelMeanType.START_X,
            model_var_type=self.gd.ModelVarType.FIXED_SMALL,
            loss_type=self.gd.LossType.MSE,
        )
        np.testing.assert_allclose(
            np.asarray(s.betas), spaced_ref.betas.astype(np.float32), rtol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(s.timestep_map), np.array(spaced_ref.timestep_map)
        )

    @classmethod
    def gd_space(cls, T, spec):
        return cls.respace.space_timesteps(T, spec)


class TestBpd:
    def test_calc_bpd_loop(self):
        import jax

        sched = D.Schedule.create(D.named_beta_schedule("cosine", 10))
        rng = np.random.default_rng(0)
        x0 = jnp.asarray(rng.standard_normal((2, 4, 1, 6)).astype(np.float32) * 0.1)
        out = G.calc_bpd_loop(sched, toy_model_fn, x0, jax.random.PRNGKey(0))
        assert out["vb"].shape == (2, 10)
        assert out["total_bpd"].shape == (2,)
        assert np.isfinite(np.asarray(out["total_bpd"])).all()
        # total = sum(vb) + prior
        np.testing.assert_allclose(
            np.asarray(out["total_bpd"]),
            np.asarray(out["vb"]).sum(1) + np.asarray(out["prior_bpd"]),
            rtol=1e-5,
        )


class TestTrajectory:
    def test_return_trajectory(self):
        import jax

        sched = D.Schedule.create(D.named_beta_schedule("cosine", 6))
        final, traj = D.p_sample_loop(
            sched, toy_model_fn, SHAPE, jax.random.PRNGKey(0), return_trajectory=True
        )
        assert traj.shape == (6,) + SHAPE
        np.testing.assert_array_equal(np.asarray(traj[-1]), np.asarray(final))
