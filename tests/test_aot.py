"""AOT executable serialization: save, reload without retracing, fallback."""
import numpy as np

import jax
import jax.numpy as jnp

from diffusestylegesture_tpu.utils.aot import aot_compile


def test_save_and_reload_skips_tracing(tmp_path):
    traces = []

    def fn(x, y):
        traces.append(1)
        return jnp.tanh(x) @ y + 1.0

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((16, 4)).astype(np.float32))

    path = str(tmp_path / "fn.aotx")
    run1 = aot_compile(fn, (x, y), path)
    out1 = np.asarray(run1(x, y))
    assert traces  # compiled → traced at least once
    n_traces = len(traces)

    run2 = aot_compile(fn, (x, y), path)
    out2 = np.asarray(run2(x, y))
    assert len(traces) == n_traces  # loaded executable: NO retracing
    np.testing.assert_allclose(out2, out1, atol=0)
    np.testing.assert_allclose(out1, np.tanh(np.asarray(x)) @ np.asarray(y) + 1.0,
                               atol=1e-5)


def test_corrupt_file_falls_back(tmp_path):
    def fn(x):
        return x * 2.0

    x = jnp.ones((4,))
    path = str(tmp_path / "bad.aotx")
    with open(path, "wb") as f:
        f.write(b"not a pickle")
    run = aot_compile(fn, (x,), path)
    np.testing.assert_allclose(np.asarray(run(x)), 2.0 * np.ones(4), atol=0)


def test_engine_window_sample_aot(tmp_path):
    """The sampler's compiled denoiser chain round-trips through AOT."""
    from diffusestylegesture_tpu import diffusion as D

    sched = D.Schedule.create(D.named_beta_schedule("cosine", 6))

    def chain(x0, key):
        return D.ddim_sample_loop(
            sched, lambda x, t: 0.5 * x, x0.shape, key, noise=x0
        )

    x0 = jnp.asarray(np.random.default_rng(1).standard_normal((1, 6, 1, 8)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    path = str(tmp_path / "chain.aotx")
    run1 = aot_compile(chain, (x0, key), path)
    run2 = aot_compile(chain, (x0, key), path)
    np.testing.assert_allclose(np.asarray(run1(x0, key)), np.asarray(run2(x0, key)), atol=0)
