"""DPM-Solver++(2M) sampler: ODE convergence, determinism, engine wiring.

Beyond-parity fast sampler (`diffusion/sampling.dpmpp2m_sample_loop`).
DDIM (eta=0) and DPM-Solver++ discretize the SAME probability-flow ODE, so
a many-step DDIM chain is the ground truth both few-step samplers
approximate — the 2nd-order multistep solver must land closer.
"""
import numpy as np

import jax
import jax.numpy as jnp

from diffusestylegesture_tpu import diffusion as D
from diffusestylegesture_tpu.diffusion.sampling import (
    ddim_sample_loop,
    dpmpp2m_sample_loop,
)

SHAPE = (2, 6, 1, 8)


def smooth_model(x, t):
    """Nonlinear but smooth x0-prediction (t folded in for variety)."""
    return jnp.tanh(0.7 * x) + 0.05 * jnp.sin(x) - 1e-4 * t[:, None, None, None]


def _spaced(n):
    return D.spaced_schedule(
        D.named_beta_schedule("cosine", 1000), D.space_timesteps(1000, f"ddim{n}")
    )


class TestConvergence:
    def test_second_order_beats_ddim_at_equal_steps(self):
        key = jax.random.PRNGKey(0)
        noise = jax.random.normal(jax.random.PRNGKey(5), SHAPE)
        ref = ddim_sample_loop(_spaced(1000), smooth_model, SHAPE, key, noise=noise)
        ddim20 = ddim_sample_loop(_spaced(20), smooth_model, SHAPE, key, noise=noise)
        dpmpp20 = dpmpp2m_sample_loop(_spaced(20), smooth_model, SHAPE, key, noise=noise)
        err_ddim = float(jnp.abs(ddim20 - ref).max())
        err_dpmpp = float(jnp.abs(dpmpp20 - ref).max())
        assert err_dpmpp < err_ddim, (err_dpmpp, err_ddim)
        assert err_dpmpp < 0.05

    def test_converges_with_steps(self):
        key = jax.random.PRNGKey(1)
        noise = jax.random.normal(jax.random.PRNGKey(6), SHAPE)
        ref = ddim_sample_loop(_spaced(1000), smooth_model, SHAPE, key, noise=noise)
        errs = []
        for n in (5, 10, 20, 40):
            out = dpmpp2m_sample_loop(_spaced(n), smooth_model, SHAPE, key, noise=noise)
            errs.append(float(jnp.abs(out - ref).max()))
        assert errs == sorted(errs, reverse=True), errs  # monotone improvement
        assert errs[-1] < 0.02


class TestBasics:
    def test_deterministic_given_key(self):
        sched = _spaced(10)
        a = dpmpp2m_sample_loop(sched, smooth_model, SHAPE, jax.random.PRNGKey(3))
        b = dpmpp2m_sample_loop(sched, smooth_model, SHAPE, jax.random.PRNGKey(3))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        c = dpmpp2m_sample_loop(sched, smooth_model, SHAPE, jax.random.PRNGKey(4))
        assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-4

    def test_full_unspaced_schedule_runs(self):
        sched = D.Schedule.create(D.named_beta_schedule("cosine", 16))
        out = dpmpp2m_sample_loop(sched, smooth_model, SHAPE, jax.random.PRNGKey(0))
        assert np.isfinite(np.asarray(out)).all()

    def test_skip_timesteps_warm_start(self):
        sched = _spaced(12)
        init = jnp.ones(SHAPE) * 0.3
        out = dpmpp2m_sample_loop(
            sched, smooth_model, SHAPE, jax.random.PRNGKey(2),
            skip_timesteps=6, init_image=init)
        assert np.isfinite(np.asarray(out)).all()

    def test_inpaint_hook(self):
        sched = _spaced(10)
        mask = jnp.zeros(SHAPE).at[:, :2].set(1.0)
        target = jnp.full(SHAPE, 0.5)
        out = dpmpp2m_sample_loop(
            sched, smooth_model, SHAPE, jax.random.PRNGKey(0),
            inpaint=(mask, target))
        # final output is the (inpainted) x0 prediction at the last grid point
        np.testing.assert_allclose(np.asarray(out)[:, :2], 0.5, atol=1e-6)


class TestEngine:
    def test_zeggs_engine_dpmpp(self):
        from test_engine import NJ, toy_model_apply, toy_wavlm_apply

        from diffusestylegesture_tpu.sample import ZeggsEngineConfig, ZeggsSampler

        cfg = ZeggsEngineConfig(njoints=NJ, sampler="dpmpp")
        sched = _spaced(8)
        eng = ZeggsSampler(toy_model_apply, toy_wavlm_apply, sched, cfg)
        audio = np.random.default_rng(0).standard_normal(
            cfg.samples_per_stride * 2).astype(np.float32)
        style = np.eye(6, dtype=np.float32)[:1]
        out = eng.generate({}, {}, audio, style, jax.random.PRNGKey(7))
        assert out.shape == (1, 2 * cfg.stride - cfg.n_seed, NJ)
        assert np.isfinite(out).all()
