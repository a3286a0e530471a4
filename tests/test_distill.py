"""Progressive distillation: schedule halving, closed-form target, learning."""
import numpy as np

import jax
import jax.numpy as jnp

from diffusestylegesture_tpu import diffusion as D
from diffusestylegesture_tpu.diffusion import gaussian as G
from diffusestylegesture_tpu.train.distill import (
    ddim_step,
    make_distill_step,
    student_schedule,
    two_step_target,
)

NT = 16
TEACHER_SCHED = D.Schedule.create(D.named_beta_schedule("cosine", NT))
DIM = 6


def mlp_fn(params, x, t):
    """Tiny x0-predictor: (B, D) with timestep embedding."""
    temb = jnp.stack([t / NT, jnp.sin(t / NT * 6.283)], axis=-1)
    h = jnp.concatenate([x, temb], axis=-1)
    h = jnp.tanh(h @ params["w1"] + params["b1"])
    return h @ params["w2"] + params["b2"]


def make_params(key, hidden=32):
    k1, k2 = jax.random.split(key)
    return {
        "w1": 0.5 * jax.random.normal(k1, (DIM + 2, hidden)),
        "b1": jnp.zeros(hidden),
        "w2": 0.5 * jax.random.normal(k2, (hidden, DIM)),
        "b2": jnp.zeros(DIM),
    }


class TestStudentSchedule:
    def test_halving_keeps_odd_teacher_steps(self):
        s = student_schedule(TEACHER_SCHED)
        assert s.num_timesteps == NT // 2
        np.testing.assert_array_equal(
            np.asarray(s.timestep_map), np.arange(NT)[1::2]
        )
        # student ac[i] == teacher ac[2i+1]
        np.testing.assert_allclose(
            np.asarray(s.alphas_cumprod),
            np.asarray(TEACHER_SCHED.alphas_cumprod)[1::2],
            rtol=1e-6,
        )


class TestClosedFormTarget:
    def test_student_one_step_lands_on_teacher_two_steps(self):
        """A student that predicts x0* exactly reproduces the teacher's
        two-step DDIM endpoint with ONE step on the halved schedule — the
        defining property of the distillation target."""
        t_params = make_params(jax.random.PRNGKey(0))
        teacher = lambda x, t: mlp_fn(t_params, x, t)  # noqa: E731
        stud_sched = student_schedule(TEACHER_SCHED)

        rng = np.random.default_rng(1)
        B = 4
        x = jnp.asarray(rng.standard_normal((B, DIM)).astype(np.float32))
        for i in [1, 3, 5, 7]:  # student indices
            t_teacher = jnp.full((B,), 2 * i + 1, jnp.int32)
            x0_star, x_tgt = two_step_target(TEACHER_SCHED, teacher, x, t_teacher)
            t_student = jnp.full((B,), i, jnp.int32)
            x_student = ddim_step(stud_sched, x, t_student, x0_star)
            np.testing.assert_allclose(
                np.asarray(x_student), np.asarray(x_tgt), atol=1e-4,
                err_msg=f"student step i={i}",
            )

    def test_q_sample_grids_align(self):
        """x_t formed on the teacher grid at t=2i+1 is exactly the student
        grid's x at index i (same alphas) — the training-time pairing."""
        s = student_schedule(TEACHER_SCHED)
        rng = np.random.default_rng(2)
        x0 = jnp.asarray(rng.standard_normal((3, DIM)).astype(np.float32))
        noise = jnp.asarray(rng.standard_normal((3, DIM)).astype(np.float32))
        i = jnp.array([2, 4, 6])
        a = G.q_sample(TEACHER_SCHED, x0, 2 * i + 1, noise)
        b = G.q_sample(s, x0, i, noise)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestConditionedMDMDistill:
    def test_mdm_teacher_student_plumbing(self):
        """The conditioned path drives a real (tiny) MDM as both teacher
        and student: steps run, loss is finite and decreases on a fixed
        batch."""
        from diffusestylegesture_tpu.models.mdm import MDM, MDMConfig

        NJ, T, B = 16, 22, 4
        cfg = MDMConfig(njoints=NJ, latent_dim=128, ff_size=64, num_layers=1,
                        window_size=11, n_seed=4)
        model = MDM(cfg)
        rng = np.random.default_rng(8)
        x = jnp.asarray(rng.standard_normal((B, NJ, 1, T)).astype(np.float32))
        cond = {
            "style": jnp.asarray(rng.standard_normal((B, 6)).astype(np.float32)),
            "seed": x[..., :4],
            "audio": jnp.asarray(rng.standard_normal((B, T, 1024)).astype(np.float32)),
            "mask_local": jnp.ones((B, T), bool),
        }
        t0 = jnp.zeros((B,), jnp.int32)
        teacher_params = model.init(jax.random.PRNGKey(0), x, t0, cond)
        student_params = model.init(jax.random.PRNGKey(1), x, t0, cond)

        def teacher(xx, tt, cc):
            return model.apply(teacher_params, xx, tt, cc)

        def student_apply(p, xx, tt, cc):
            return model.apply(p, xx, tt, cc)

        init_fn, step_fn = make_distill_step(
            teacher, student_apply, TEACHER_SCHED, lr=1e-3, conditioned=True
        )
        step_fn = jax.jit(step_fn)
        opt = init_fn(student_params)
        params = student_params
        losses = []
        for i in range(6):
            params, opt, m = step_fn(params, opt, x, jax.random.PRNGKey(i), cond)
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]


class TestDistillationLearns:
    def test_loss_decreases_and_student_tracks_teacher_chain(self):
        teacher_params = make_params(jax.random.PRNGKey(3))
        teacher = lambda x, t: mlp_fn(teacher_params, x, t)  # noqa: E731

        student_params = make_params(jax.random.PRNGKey(4))
        init_fn, step_fn = make_distill_step(
            teacher, mlp_fn, TEACHER_SCHED, lr=1e-2
        )
        step_fn = jax.jit(step_fn)
        opt = init_fn(student_params)

        rng = np.random.default_rng(5)
        x0_data = jnp.asarray(rng.standard_normal((64, DIM)).astype(np.float32) * 0.5)

        def chain(sched, fn, xT, n):
            # networks take ORIGINAL timesteps (sched.timestep_map), the
            # posterior math takes schedule indices — same convention as
            # the samplers
            x = xT
            for i in range(n - 1, -1, -1):
                t = jnp.full((xT.shape[0],), i, jnp.int32)
                x = ddim_step(sched, x, t, fn(x, sched.timestep_map[t]))
            return x

        stud_sched = student_schedule(TEACHER_SCHED)
        xT = jnp.asarray(rng.standard_normal((8, DIM)).astype(np.float32))
        ref = chain(TEACHER_SCHED, teacher, xT, NT)

        def student_chain(params):
            return chain(
                stud_sched, lambda x, t: mlp_fn(params, x, t), xT, NT // 2
            )

        err_before = float(jnp.abs(student_chain(student_params) - ref).mean())

        losses = []
        params = student_params
        for i in range(1200):
            k = jax.random.PRNGKey(i)
            idx = np.asarray(
                jax.random.randint(jax.random.PRNGKey(1000 + i), (16,), 0, 64)
            )
            params, opt, m = step_fn(params, opt, x0_data[idx], k)
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        # the truncated-SNR weight makes the absolute scale large; require
        # a strong relative drop and a materially closer half-step chain
        assert np.mean(losses[-50:]) < 0.25 * np.mean(losses[:20])

        err_after = float(jnp.abs(student_chain(params) - ref).mean())
        assert err_after < 0.6 * err_before, (err_before, err_after)
