"""Micro-batching gesture server: batching, bucketing, correctness."""
import threading
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffusestylegesture_tpu import diffusion as D
from diffusestylegesture_tpu.models.mdm import MDM, MDMConfig
from diffusestylegesture_tpu.sample import (
    GestureServer,
    ServerConfig,
    ZeggsEngineConfig,
    ZeggsSampler,
)

NJ = 16


def make_server(max_batch=4, max_delay_ms=80.0, buckets=(1, 2, 4)):
    cfg = MDMConfig(njoints=NJ, latent_dim=128, ff_size=64, num_layers=1,
                    n_seed=8, window_size=11)
    model = MDM(cfg)
    ecfg = ZeggsEngineConfig(njoints=NJ)
    sched = D.Schedule.create(D.named_beta_schedule("cosine", 3))

    B, T = 1, ecfg.n_poses
    x = jnp.zeros((B, NJ, 1, T))
    cond = {
        "style": jnp.zeros((B, 6)),
        "seed": x[..., :8],
        "audio": jnp.zeros((B, T, 1024)),
        "mask_local": jnp.ones((B, T), bool),
    }
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((B,), jnp.int32), cond)

    def model_apply(p, xx, tt, cc, uncond=None):
        return model.apply(p, xx, tt, cc, uncond=uncond)

    def wavlm_stub(_p, windows):
        return jnp.zeros((windows.shape[0], T, 1024))

    sampler = ZeggsSampler(model_apply, wavlm_stub, sched, ecfg)
    server = GestureServer(
        sampler, params, {},
        mean=np.zeros(NJ, np.float32), std=np.ones(NJ, np.float32),
        cfg=ServerConfig(max_batch=max_batch, max_delay_ms=max_delay_ms,
                         window_buckets=buckets),
    )
    return server, ecfg


class TestGestureServer:
    def test_single_request(self):
        server, ecfg = make_server()
        server.start()
        try:
            audio = np.random.default_rng(0).standard_normal(
                ecfg.samples_per_stride * 2
            ).astype(np.float32)
            fut = server.submit(audio, np.eye(6, dtype=np.float32)[0])
            poses = fut.result(timeout=120)
            assert poses.shape == (2 * ecfg.stride - ecfg.n_seed, NJ)
            assert np.isfinite(poses).all()
        finally:
            server.stop()

    def test_concurrent_requests_are_batched(self):
        server, ecfg = make_server(max_batch=4, max_delay_ms=300.0)
        server.start()
        try:
            rng = np.random.default_rng(1)
            audio = rng.standard_normal(ecfg.samples_per_stride).astype(np.float32)
            futs = [
                server.submit(audio, np.eye(6, dtype=np.float32)[i % 6])
                for i in range(4)
            ]
            outs = [f.result(timeout=180) for f in futs]
            for o in outs:
                assert o.shape == (ecfg.stride - ecfg.n_seed, NJ)
            # all four rode one engine call
            assert server.batches_served == 1
            assert server.requests_served == 4
        finally:
            server.stop()

    def test_mixed_lengths_bucketed_separately(self):
        server, ecfg = make_server(max_batch=8, max_delay_ms=150.0)
        server.start()
        try:
            rng = np.random.default_rng(2)
            short = rng.standard_normal(ecfg.samples_per_stride).astype(np.float32)
            long = rng.standard_normal(ecfg.samples_per_stride * 4).astype(np.float32)
            f1 = server.submit(short, np.eye(6, dtype=np.float32)[0])
            f2 = server.submit(long, np.eye(6, dtype=np.float32)[1])
            o1 = f1.result(timeout=180)
            o2 = f2.result(timeout=180)
            assert o1.shape[0] == ecfg.stride - ecfg.n_seed
            assert o2.shape[0] == 4 * ecfg.stride - ecfg.n_seed
            assert server.batches_served == 2  # different shape classes
        finally:
            server.stop()

    def test_minority_bucket_not_starved(self):
        """The next batch's bucket comes from the OLDEST unserved request
        (pending deque head) — re-queueing spilled requests at the queue
        tail let continuous majority-bucket traffic starve a minority
        request forever (regression). Exercised without the dispatcher
        thread: pre-fill the queue, drive _collect_batch directly."""
        server, ecfg = make_server(max_batch=2, max_delay_ms=50.0,
                                   buckets=(1, 2, 4))
        s1 = ecfg.samples_per_stride  # 1 window
        s4 = ecfg.samples_per_stride * 4  # 4 windows (minority bucket)

        def req(samples):
            from diffusestylegesture_tpu.sample.server import _Request
            from concurrent.futures import Future

            num = samples // ecfg.samples_per_stride
            return server._queue.put(_Request(
                audio=np.zeros(samples, np.float32),
                style=np.zeros(6, np.float32),
                key=jax.random.PRNGKey(0), num_windows=num, future=Future()))

        # majority 1-window stream with one 4-window request inside it
        req(s1), req(s4), req(s1), req(s1), req(s1)
        b1 = server._collect_batch()  # serves head bucket 1, spills b4
        assert [r.num_windows for r in b1] == [1, 1]
        b2 = server._collect_batch()  # pending[0] is the 4-window request
        assert [r.num_windows for r in b2] == [4]
        b3 = server._collect_batch()
        assert [r.num_windows for r in b3] == [1, 1]

    def test_submit_after_stop_raises(self):
        server, ecfg = make_server()
        server.start()
        server.stop()
        with pytest.raises(RuntimeError, match="not running"):
            server.submit(
                np.zeros(ecfg.samples_per_stride, np.float32),
                np.zeros(6, np.float32))

    def test_too_long_rejected(self):
        server, ecfg = make_server(buckets=(1, 2))
        audio = np.zeros(ecfg.samples_per_stride * 5, np.float32)
        with pytest.raises(ValueError):
            server.submit(audio, np.eye(6, dtype=np.float32)[0])

    def test_batch_failure_propagates_and_server_survives(self):
        """A failing batch delivers its exception to every waiting future
        and the dispatcher keeps serving subsequent requests."""
        server, ecfg = make_server(max_batch=2, max_delay_ms=100.0)

        real_wavlm = server.sampler.wavlm_apply
        calls = {"n": 0}

        def flaky_wavlm(p, w):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("injected featurizer failure")
            return real_wavlm(p, w)

        server.sampler.wavlm_apply = flaky_wavlm
        server.start()
        try:
            audio = np.zeros(ecfg.samples_per_stride, np.float32)
            bad = server.submit(audio, np.eye(6, dtype=np.float32)[0])
            with pytest.raises(RuntimeError, match="injected"):
                bad.result(timeout=120)
            good = server.submit(audio, np.eye(6, dtype=np.float32)[1])
            out = good.result(timeout=120)
            assert out.shape == (ecfg.stride - ecfg.n_seed, NJ)
        finally:
            server.stop()
            server.sampler.wavlm_apply = real_wavlm

    def test_matches_direct_sampler_output_shape_and_stats(self):
        """Server output equals a direct ZeggsSampler.generate call with the
        same key (the batching layer must not change the math)."""
        server, ecfg = make_server(max_batch=1, buckets=(2,))
        rng = np.random.default_rng(3)
        audio = rng.standard_normal(ecfg.samples_per_stride * 2).astype(np.float32)
        style = np.eye(6, dtype=np.float32)[0]

        server.start()
        try:
            fut = server.submit(audio, style)
            served = fut.result(timeout=180)
        finally:
            server.stop()

        # direct path with the identical per-request key (first split of seed 0)
        _, sub = jax.random.split(jax.random.PRNGKey(0))
        direct = server.sampler.generate(
            server.params, {}, audio, style[None], sub,
            mean=np.zeros(NJ, np.float32), std=np.ones(NJ, np.float32),
        )[0]
        np.testing.assert_allclose(served, direct, atol=2e-5)
